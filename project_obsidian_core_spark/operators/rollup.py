"""Rollup materialization — the Druid-ingest equivalent (SURVEY §2.1 S9/S10,
§2.4 A1/A2).

qan_db (druid-specs/qan_db_ingestion.json:92-97): queryGranularity=SECOND,
segmentGranularity=HOUR, **rollup=false** — i.e. event rows are kept, their
timestamp truncated to the second, stored in hour-grained segments. Spark
mapping: truncate ``time``, write Parquet partitioned by (event_date,
event_hour) so every notebook query's ``__time BETWEEN`` predicate becomes
partition pruning at 100 TB.

metrics_db (druid-specs/metrics_db_ingestion.json:39-61): **rollup=true** with
longSum/doubleSum + doubleMax/doubleMin at SECOND granularity — a genuine
pre-aggregation. Spark mapping: groupBy(second-truncated time, dims) with
sum/max/min, a map-side-combinable hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_time_partitions(df: DataFrame, time_col: str = "time") -> DataFrame:
    """Add hour-grained partition columns (segmentGranularity=HOUR)."""
    return df.withColumn("event_date", F.to_date(time_col)).withColumn(
        "event_hour", F.hour(time_col)
    )


def qan_rollup(qan: DataFrame, time_col: str = "time") -> DataFrame:
    """qan_db ingest shaping: second-truncated time + partition columns.

    rollup=false (qan_db_ingestion.json:96) — no row merging happens; this is
    a projection, not an aggregation.
    """
    return with_time_partitions(
        qan.withColumn(time_col, F.date_trunc("second", F.col(time_col))), time_col
    )


def write_qan(qan: DataFrame, path: str, mode: str = "append") -> None:
    """Write the qan_db fact table hour-partitioned.

    Idempotency note (SURVEY §7.3): streaming foreachBatch retries would
    double-count with blind append; callers in the streaming path use
    batch-scoped overwrite instead
    (streaming/delta_stream.idempotent_parquet_sink).
    """
    (
        qan_rollup(qan)
        .write.mode(mode)
        .partitionBy("event_date", "event_hour")
        .parquet(path)
    )


def metrics_rollup(
    metrics: DataFrame,
    time_col: str = "time",
    granularity: str = "second",
) -> DataFrame:
    """metrics_db ingest rollup: sum/max/min per (second, instance, system,
    metric_name, labels) — metrics_db_ingestion.json:39-61, rollup=true.

    The groupBy is a hash aggregate with map-side partial aggregation, so at
    scale each executor pre-collapses its own rows before the shuffle; the
    shuffled key space is (seconds x instances x metric names), far smaller
    than the input.

    MapType is not a valid grouping key in Spark, so the labels map is keyed
    by its canonical (entry-sorted) JSON rendering and carried through with
    ``first`` — deterministic because all rows in a group share the key.
    """
    bucket = F.date_trunc(granularity, F.col(time_col)).alias("time")
    labels_key = F.to_json(
        F.map_from_entries(F.array_sort(F.map_entries(F.col("metric_labels"))))
    ).alias("__labels_key")
    return (
        metrics.groupBy(
            bucket,
            F.col("instance_id"),
            F.col("db_system"),
            F.col("metric_name"),
            labels_key,
        )
        .agg(
            F.first("metric_labels").alias("metric_labels"),
            F.sum("metric_value").alias("metric_value"),
            F.max("metric_max").alias("metric_max"),
            F.min("metric_min").alias("metric_min"),
        )
        .drop("__labels_key")
    )


def write_metrics(metrics: DataFrame, path: str, mode: str = "append") -> None:
    """Write the metrics_db fact table hour-partitioned."""
    (
        with_time_partitions(metrics_rollup(metrics))
        .write.mode(mode)
        .partitionBy("event_date", "event_hour")
        .parquet(path)
    )
