"""Streaming OTLP ingest — the S11 receiver as a Structured Streaming
source.

The reference's collector pushes OTLP batches continuously
(otel-config.yaml service pipeline: receivers → batch → exporter). The
Spark-native equivalent is a file/queue stream of OTLP/JSON payload
documents parsed by the same :func:`sources.otlp.parse_otlp_metrics` plan —
the parser is a pure column expression tree, so it applies unchanged to a
streaming DataFrame (Catalyst plans it inside each micro-batch; no
streaming-specific code path to diverge from the batch-tested one).

At scale the `text` file source is swapped for Kafka (`spark.readStream
.format("kafka")` — value column → payload) with no change to the parse or
rollup stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.sources import otlp


def read_otlp_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based OTLP/JSON stream: one payload document per line.

    Returns the parsed long metric rows (same schema as the batch
    receiver). ``maxFilesPerTrigger`` bounds micro-batch size for
    backpressure — the streaming analog of the reference collector's
    ``send_batch_size`` (otel-config.yaml:27-29).
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path).select(F.col("value").alias("payload"))
    return otlp.parse_otlp_metrics(raw)


def otlp_stream_rollup(
    parsed: DataFrame,
    watermark: str = "10 minutes",
    granularity: str = "1 minute",
) -> DataFrame:
    """Receiver stream → watermarked per-window metric rollup (the
    metrics_db ingest shape, S10 semantics: finalize once per window,
    bounded state)."""
    return (
        parsed.withWatermark("time", watermark)
        .groupBy(
            F.window("time", granularity),
            "instance_id",
            "db_system",
            "metric_name",
        )
        .agg(
            F.sum(
                F.coalesce(
                    F.col("metric_value_double"),
                    F.col("metric_value_int").cast("double"),
                )
            ).alias("metric_value"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(
            F.col("window").getField("start").alias("window_start"),
            "instance_id",
            "db_system",
            "metric_name",
            "metric_value",
            "n_points",
        )
    )
