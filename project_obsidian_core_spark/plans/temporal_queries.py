"""Driver-facing wrappers for the temporal joins (as-of, binned range).

DuckDB has a native ``ASOF LEFT JOIN`` — the oracle for :func:`asof_join`
is therefore the engine-level primitive itself, the strongest possible
check for a re-derived operator. The range join oracles as a plain
inequality join + aggregate. Money sums use the scaled-integer ``cents``
recipe; timestamps compare as epoch microseconds (plans/common.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.operators import temporal_joins as TJ
from project_obsidian_core_spark.plans.common import cents, load

#: range-join window: probes within the hour ending at the anchor
RANGE_SPAN_US = 3_600_000_000


# --------------------------------------------------------------- as-of join
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's latest purchase at or before it."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", cents("value").alias("cents")
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(cents("value")).alias("pcents"))
    )
    out = TJ.asof_join(left, right, on="user_id", value_cols=("pcents",))
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "cents",
        F.unix_micros("asof_ts").alias("last_purchase_us"),
        F.col("asof_pcents").alias("last_purchase_cents"),
    ).orderBy("event_id")


ORACLE_events_asof_join = """
WITH l AS (
    SELECT event_id, user_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents
    FROM events WHERE event_type = 'click'
), r AS (
    SELECT user_id, ts,
           max(CAST(round(value * 100, 0) AS BIGINT)) AS pcents
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.cents,
       epoch_us(r.ts) AS last_purchase_us, r.pcents AS last_purchase_cents
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY event_id
"""


# --------------------------------------------------------------- range join
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: count + value of the same user's events in the
    preceding hour (window includes the purchase itself)."""
    ev = load(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    probes = ev.select("user_id", "ts", cents("value").alias("cents"))
    pairs = TJ.range_join(anchors, probes, on="user_id", span_us=RANGE_SPAN_US)
    return (
        pairs.groupBy("event_id", "_a_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("probe_cents").alias("sum_cents"),
        )
        .select(
            "event_id",
            F.col("_a_us").alias("anchor_us"),
            "n_events",
            "sum_cents",
        )
        .orderBy("event_id")
    )


ORACLE_events_range_join = f"""
WITH a AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), p AS (
    SELECT user_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents
    FROM events
)
SELECT a.event_id, epoch_us(a.ts) AS anchor_us,
       count(*) AS n_events,
       CAST(sum(p.cents) AS BIGINT) AS sum_cents
FROM a JOIN p
  ON p.user_id = a.user_id
 AND epoch_us(p.ts) > epoch_us(a.ts) - {RANGE_SPAN_US}
 AND epoch_us(p.ts) <= epoch_us(a.ts)
GROUP BY 1, 2
ORDER BY event_id
"""


def events_asof_join_presplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key-safe presplit as-of join, checked against the IDENTICAL
    DuckDB native ASOF oracle as events_asof_join — the mitigation cannot
    drift from the plain operator's semantics."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", cents("value").alias("cents")
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(cents("value")).alias("pcents"))
    )
    out = TJ.asof_join_presplit(left, right, on="user_id", value_cols=("pcents",))
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "cents",
        F.unix_micros("asof_ts").alias("last_purchase_us"),
        F.col("asof_pcents").alias("last_purchase_cents"),
    ).orderBy("event_id")
