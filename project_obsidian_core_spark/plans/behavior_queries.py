"""Driver-facing behavior-analytics queries: funnel + retention.

Both oracles are plain relational SQL over the events table, mirroring the
operators' join/aggregate chains exactly (int counts only — nothing
float-hashed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from project_obsidian_core_spark.analytics import behavior as B
from project_obsidian_core_spark.plans.common import load

_STAGES = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase closed-funnel conversion counts."""
    return B.funnel(load(spark, sf_dir, "events"), _STAGES).orderBy("stage_idx")


ORACLE_events_funnel = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = '{_STAGES[0]}' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
    WHERE e.event_type = '{_STAGES[1]}'
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
    WHERE e.event_type = '{_STAGES[2]}'
    GROUP BY e.user_id
)
SELECT 1 AS stage_idx, '{_STAGES[0]}' AS stage,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, '{_STAGES[1]}', CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, '{_STAGES[2]}', CAST((SELECT count(*) FROM s3) AS BIGINT)
ORDER BY stage_idx
"""


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention counts over the events month."""
    return B.retention(load(spark, sf_dir, "events")).orderBy(
        "cohort_date", "offset_days"
    )


ORACLE_events_retention = """
WITH cohorts AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
    FROM events GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT c.cohort_date,
       CAST(date_diff('day', c.cohort_date, a.d) AS BIGINT) AS offset_days,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN cohorts c USING (user_id)
WHERE date_diff('day', c.cohort_date, a.d) <= 30
GROUP BY c.cohort_date, offset_days
ORDER BY c.cohort_date, offset_days
"""
