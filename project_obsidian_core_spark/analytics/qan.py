"""QAN analytics query surface over the qan_db fact table.

Re-expresses the reference's notebook Druid SQL as a DataFrame API
(SURVEY §3.3): each function mirrors one notebook query shape —
jupyter-notebooks/02-Query_Analysis.ipynb (get_top_queries cell-4,
analyze_query_trend cell-4, multi-metric CTE+UNION cell-12) and
notebooks/qan_analysis_example.ipynb (MySQL/PG top-N cells,
metrics-comparison cell).

All functions are pure logical-plan constructors: filters go first (so
Catalyst pushes them into the parquet scan / hour partitions), aggregates use
built-in functions only (whole-stage codegen, map-side partials), and top-N is
orderBy+limit (planned as TakeOrderedAndProject — no global sort at scale).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from project_obsidian_core_spark.functions.units import guarded_div

#: metric column resolving the notebook's `{metric}` parameter per system
DEFAULT_METRIC = {"mysql": "total_timer_wait_delta", "postgresql": "total_exec_time_delta"}
ID_COLUMN = {"mysql": "statement_digest", "postgresql": "query_id"}


def _time_filter(df: DataFrame, start: datetime | str | None, end: datetime | str | None) -> DataFrame:
    """P5: `__time BETWEEN a AND b` — with hour partitioning this prunes
    partitions before the scan."""
    if start is not None:
        df = df.filter(F.col("time") >= F.lit(start).cast("timestamp"))
    if end is not None:
        df = df.filter(F.col("time") <= F.lit(end).cast("timestamp"))
    return df


def top_queries(
    qan: DataFrame,
    db_system: str = "mysql",
    metric: str | None = None,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
    limit: int = 10,
    sample_filter: str | None = None,
) -> DataFrame:
    """Top-N queries by total of ``metric`` — the signature QAN query
    (02-Query_Analysis.ipynb cell-4 get_top_queries; A3+A4+O1).

    Returns (identity, sample, total_calls, total_metric, avg_metric_per_call).
    """
    metric = metric or DEFAULT_METRIC[db_system]
    id_col = ID_COLUMN[db_system]
    df = _time_filter(qan.filter(F.col("db_system") == db_system), start, end)
    if sample_filter:
        df = df.filter(F.col("statement_sample").like(f"%{sample_filter}%"))  # P6
    return (
        df.groupBy(F.col(id_col).alias("query_identity"))
        .agg(
            F.max("statement_sample").alias("statement_sample"),
            F.sum("calls_delta").alias("total_calls"),
            F.sum(metric).alias("total_metric"),
        )
        .withColumn(
            # A4: CASE WHEN SUM(calls)>0 THEN SUM(x)/SUM(calls) ELSE 0 END
            "avg_metric_per_call",
            guarded_div(F.col("total_metric"), F.col("total_calls")),
        )
        .orderBy(F.desc("total_metric"), F.asc("query_identity"))
        .limit(limit)
    )


def query_trend(
    qan: DataFrame,
    query_identity: str,
    db_system: str = "mysql",
    metric: str | None = None,
    bucket: str = "5 minutes",
    start: datetime | str | None = None,
    end: datetime | str | None = None,
) -> DataFrame:
    """Per-query time-series trend (analyze_query_trend, A6+P7):
    TIME_FLOOR(__time, PT5M) buckets of calls and metric totals."""
    metric = metric or DEFAULT_METRIC[db_system]
    id_col = ID_COLUMN[db_system]
    df = _time_filter(
        qan.filter((F.col("db_system") == db_system) & (F.col(id_col) == query_identity)),
        start,
        end,
    )
    return (
        df.groupBy(F.window("time", bucket).getField("start").alias("time_bucket"))
        .agg(
            F.sum("calls_delta").alias("total_calls"),
            F.sum(metric).alias("total_metric"),
        )
        .withColumn("avg_metric_per_call", guarded_div("total_metric", "total_calls"))
        .orderBy("time_bucket")
    )


def top_by_multiple_metrics(
    qan: DataFrame,
    db_system: str = "mysql",
    limit: int = 5,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
) -> DataFrame:
    """Multi-metric ranked comparison (02-Query_Analysis.ipynb cell-12:
    three ranked CTEs UNION ALLed; W1+U1+O3+P9).

    Ranks the same aggregated relation by three metrics, tags each ranking
    with a literal label, unions, and sorts (metric, value desc). The
    aggregate is computed once and reused across the three rankings.
    """
    id_col = ID_COLUMN[db_system]
    df = _time_filter(qan.filter(F.col("db_system") == db_system), start, end)
    metric_for = {
        "mysql": {
            "exec_time": "total_timer_wait_delta",
            "rows_examined": "rows_examined_delta",
            "temp_disk_tables": "created_tmp_disk_tables_delta",
        },
        "postgresql": {
            "exec_time": "total_exec_time_delta",
            "rows_examined": "rows_examined_delta",
            "temp_blks_written": "temp_blks_written_delta",
        },
    }[db_system]

    agg = df.groupBy(F.col(id_col).alias("query_identity")).agg(
        *[F.sum(F.coalesce(F.col(c), F.lit(0))).alias(label) for label, c in metric_for.items()]
    )

    # Top-N via orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    # no global single-partition sort); the rank column (P9) is recovered on
    # the ≤ 3*limit-row union with a window PARTITIONed BY metric. The cast
    # to double is monotone, so ranking by `value` reproduces the per-label
    # ordering exactly.
    ranked = []
    for label in metric_for:
        ranked.append(
            agg.orderBy(F.desc(label), F.asc("query_identity"))
            .limit(limit)
            .select(
                F.lit(label).alias("metric"),
                F.col("query_identity"),
                F.col(label).cast("double").alias("value"),
            )
        )
    out = ranked[0]
    for r in ranked[1:]:
        out = out.unionByName(r)  # U1
    w = Window.partitionBy("metric").orderBy(F.desc("value"), F.asc("query_identity"))
    out = out.withColumn("rank", F.row_number().over(w))
    return out.orderBy("metric", F.desc("value"), "query_identity")  # O3


def compare_systems(
    qan: DataFrame,
    start: datetime | str | None = None,
    end: datetime | str | None = None,
) -> DataFrame:
    """Cross-system summary (qan_analysis_example.ipynb metrics-comparison
    cell; A7+A8): per db_system — record count, distinct queries, total
    calls, and an avg-latency-ms that dispatches on system (MySQL ps->ms,
    PG already ms)."""
    df = _time_filter(qan, start, end)
    latency_ms = F.when(
        F.col("db_system") == "mysql", F.col("total_timer_wait_delta") / F.lit(1e9)
    ).when(F.col("db_system") == "postgresql", F.col("total_exec_time_delta"))
    per_call = F.when(F.col("calls_delta") > 0, latency_ms / F.col("calls_delta"))
    return (
        df.groupBy("db_system")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.countDistinct(
                F.coalesce(F.col("statement_digest"), F.col("query_id"))
            ).alias("unique_queries"),
            F.sum("calls_delta").alias("total_calls"),
            F.avg(per_call).alias("avg_latency_ms"),
        )
        .orderBy("db_system")
    )
