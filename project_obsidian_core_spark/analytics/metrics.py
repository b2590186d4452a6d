"""metrics_db analytics (01-Connect_and_Metrics.ipynb; SURVEY A2/A5/A9/A10/J2).

The metrics_db table is long-format (time, instance, db_system, metric_name,
labels, value/max/min). The notebook queries are: distinct metric discovery
(cell-4), buffer-hit ratio via per-minute conditional aggregation (cell-8 —
a pivot-join of blocks_hit against blocks_read), and 5-minute AVG series per
metric (cell-10).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_obsidian_core_spark.functions.units import ratio_of_sums


def _time_filter(df: DataFrame, start, end) -> DataFrame:
    if start is not None:
        df = df.filter(F.col("time") >= F.lit(start).cast("timestamp"))
    if end is not None:
        df = df.filter(F.col("time") <= F.lit(end).cast("timestamp"))
    return df


def distinct_metrics(metrics: DataFrame) -> DataFrame:
    """A10: SELECT DISTINCT metric_name, db_system ORDER BY 1."""
    return metrics.select("metric_name", "db_system").distinct().orderBy(
        "metric_name", "db_system"
    )


def metric_series(
    metrics: DataFrame,
    metric_names: list[str],
    bucket: str = "5 minutes",
    start: datetime | str | None = None,
    end: datetime | str | None = None,
) -> DataFrame:
    """A9: AVG(metric_value) per bucket per metric name
    (01-Connect_and_Metrics.ipynb cell-10)."""
    df = _time_filter(metrics.filter(F.col("metric_name").isin(metric_names)), start, end)
    return (
        df.groupBy(
            F.window("time", bucket).getField("start").alias("time_bucket"),
            "metric_name",
        )
        .agg(F.avg("metric_value").alias("avg_value"))
        .orderBy("time_bucket", "metric_name")
    )


def buffer_hit_ratio(
    metrics: DataFrame,
    hit_metric: str = "postgresql.blocks_hit",
    read_metric: str = "postgresql.blocks_read",
    bucket: str = "1 minute",
    start: datetime | str | None = None,
    end: datetime | str | None = None,
) -> DataFrame:
    """J2+A5: per-(bucket, instance) buffer cache hit ratio
    hit/(hit+read), aligned via conditional aggregation — the reference's
    pivot-join (01-Connect_and_Metrics.ipynb cell-8).

    A single shuffle: the conditional sums compute both series in one
    aggregate rather than self-joining the long table.
    """
    df = _time_filter(
        metrics.filter(F.col("metric_name").isin([hit_metric, read_metric])), start, end
    )
    agg = df.groupBy(
        F.window("time", bucket).getField("start").alias("time_bucket"),
        "instance_id",
    ).agg(
        F.sum(F.when(F.col("metric_name") == hit_metric, F.col("metric_value"))).alias("blocks_hit"),
        F.sum(F.when(F.col("metric_name") == read_metric, F.col("metric_value"))).alias("blocks_read"),
    )
    return (
        agg.withColumn(
            "hit_ratio",
            ratio_of_sums(F.coalesce("blocks_hit", F.lit(0.0)), F.coalesce("blocks_read", F.lit(0.0))),
        )
        .orderBy("time_bucket", "instance_id")
    )
