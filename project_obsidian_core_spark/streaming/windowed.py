"""Watermarked streaming rollup — the late-data extension (SURVEY T11).

The reference has *no* late/duplicate handling: rows carry wall-clock
emission timestamps and Druid ingests them as-is (rollup=false for qan_db).
That is correct for its single-collector topology but wrong at fleet scale,
where collectors lag. This module is the documented extension, not parity:
event-time windows + watermark bound the aggregation state and drop
straggler rows deterministically.

``withWatermark`` must precede the aggregation; Spark then (a) finalizes a
window once the watermark (max event time − delay) passes its end, emitting
it exactly once in append mode, and (b) evicts its state — so state size is
O(windows inside the watermark horizon × dims), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_metrics_rollup(
    metrics_stream: DataFrame,
    watermark: str = "10 minutes",
    granularity: str = "1 minute",
) -> DataFrame:
    """metrics_db rollup (S10: sum/max/min per window × dims) as a
    watermarked streaming aggregation.

    Output rows appear once their window is finalized; rows arriving later
    than ``watermark`` after their window closed are dropped (counted in
    the StreamingQueryProgress numDroppedRows metric, not silently lost).
    """
    # group on the window STRUCT: extracting .start inside the groupBy
    # severs the watermark→key linkage and Spark rejects append mode
    return (
        metrics_stream.withWatermark("time", watermark)
        .groupBy(
            F.window("time", granularity),
            "instance_id",
            "db_system",
            "metric_name",
        )
        .agg(
            F.sum("metric_value").alias("metric_value"),
            F.max("metric_max").alias("metric_max"),
            F.min("metric_min").alias("metric_min"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.col("window").getField("start").alias("window_start"),
            "instance_id",
            "db_system",
            "metric_name",
            "metric_value",
            "metric_max",
            "metric_min",
            "n_rows",
        )
    )


def dedup_event_stream(
    events_stream: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "10 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Streaming exact-once dedup: drop rows whose key was already seen
    within the watermark horizon (``dropDuplicatesWithinWatermark``).

    The reference dedups nothing (T11) — this is the extension that makes
    at-least-once collectors safe: re-delivered rows inside the horizon are
    dropped, and state is evicted as the watermark advances, so dedup state
    is bounded by (arrival rate × horizon), not history.
    """
    keys = key_cols or ["event_id"]
    return events_stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)
