"""Driver-gated wrapper for the S5 global-status pivot scrape.

No live MySQL exists in the test environment, so a deterministic
``(instance_id, VARIABLE_NAME, VARIABLE_VALUE)`` key-value relation — the
exact shape ``MYSQL_GLOBAL_STATUS_QUERY`` returns over JDBC
(adaptive/mysql_collector.go:168-196) — is synthesized from `events`
(per-instance aggregates rendered as strings, the way performance_schema
serves every counter). It is then fed through the REAL pivot operator
(:func:`sources.tables.status_kv_pivot`), and the oracle recomputes the
typed wide row directly: string-KV → typed-struct parsing must round-trip.

Determinism: every value is an exact integer (counts, scaled cents, epoch
seconds), string-rendered and parsed back — no float path anywhere.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.plans.common import cents, load
from project_obsidian_core_spark.sources import tables

#: fixed scrape tick for the synthesized sample (UTC) — epoch 1704153600
_SAMPLE_TS = datetime(2024, 1, 2)
_SAMPLE_EPOCH = 1704153600


def _synth_status_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → per-instance counters as string key-value rows (S5 input)."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy(F.col("user_id").cast("string").alias("instance_id")).agg(
        F.count(F.when(F.col("event_type") == "click", True)).alias("tr"),
        F.countDistinct("event_type").alias("tc"),
        F.count(F.lit(1)).alias("q"),
        F.count(F.when(F.col("event_type") == "error", True)).alias("sq"),
        F.sum(cents("value")).alias("lk"),
        F.max(F.expr("unix_micros(ts) div 1000000")).alias("up"),
    )
    return agg.select(
        "instance_id",
        F.expr(
            "stack(6, "
            "'Threads_running', CAST(tr AS STRING), "
            "'Threads_connected', CAST(tc AS STRING), "
            "'Questions', CAST(q AS STRING), "
            "'Slow_queries', CAST(sq AS STRING), "
            "'Innodb_row_lock_time', CAST(lk AS STRING), "
            "'Uptime', CAST(up AS STRING)"
            ") AS (variable_name, variable_value)"
        ),
    )


def global_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: string KV scrape rows → typed MYSQL_STATUS_SCHEMA rows via pivot."""
    kv = _synth_status_kv(spark, sf_dir)
    out = tables.status_kv_pivot(kv, sample_ts=_SAMPLE_TS)
    return out.select(
        "instance_id",
        F.col("sample_ts").cast("long").alias("sample_epoch_s"),
        "threads_running",
        "threads_connected",
        "questions",
        "slow_queries",
        "innodb_row_lock_time",
        "uptime",
    ).orderBy("instance_id")


ORACLE_global_status_pivot = f"""
SELECT CAST(user_id AS VARCHAR) AS instance_id,
       CAST({_SAMPLE_EPOCH} AS BIGINT) AS sample_epoch_s,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS INTEGER) AS threads_running,
       CAST(count(DISTINCT event_type) AS INTEGER) AS threads_connected,
       count(*) AS questions,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS slow_queries,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS innodb_row_lock_time,
       max(epoch_us(ts) // 1000000) AS uptime
FROM events
GROUP BY 1
ORDER BY instance_id
"""
