"""Table/source loaders.

Two source families, mirroring the reference's split (SURVEY §2.1):

- **Fixture / fact tables**: parquet (the at-rest format, Druid-segment
  equivalent). Loaders here; all reads are schema-pruned and
  predicate-pushed by Catalyst automatically.
- **Live scrape sources**: JDBC against MySQL performance_schema /
  PostgreSQL pg_stat_statements (mysql/collector.go:123-143,
  postgresql/collector.go:110-133). No database is available in the test
  environment, so the JDBC path is config-gated; the SQL text and
  precondition probes (S2/S4) are kept faithful.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from project_obsidian_core_spark import schemas

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


# ---------------------------------------------------------------------------
# Live JDBC scrape (gated — requires a reachable database + JDBC driver jar)
# ---------------------------------------------------------------------------

#: The MySQL digest scrape (S1) — column list and NULL-schema predicate kept
#: identical in intent to mysql/collector.go:123-143.
MYSQL_DIGEST_QUERY = """
SELECT
    SCHEMA_NAME          AS schema_name,
    DIGEST               AS digest,
    DIGEST_TEXT          AS digest_text,
    COUNT_STAR           AS count_star,
    SUM_TIMER_WAIT       AS sum_timer_wait,
    SUM_LOCK_TIME        AS sum_lock_time,
    SUM_ERRORS           AS sum_errors,
    SUM_WARNINGS         AS sum_warnings,
    SUM_ROWS_AFFECTED    AS sum_rows_affected,
    SUM_ROWS_SENT        AS sum_rows_sent,
    SUM_ROWS_EXAMINED    AS sum_rows_examined,
    SUM_CREATED_TMP_TABLES      AS sum_created_tmp_tables,
    SUM_CREATED_TMP_DISK_TABLES AS sum_created_tmp_disk_tables,
    SUM_SORT_ROWS        AS sum_sort_rows,
    SUM_NO_INDEX_USED    AS sum_no_index_used,
    SUM_NO_GOOD_INDEX_USED      AS sum_no_good_index_used
FROM performance_schema.events_statements_summary_by_digest
WHERE SCHEMA_NAME IS NOT NULL
"""

#: The PG statement scrape (S3) — postgresql/collector.go:110-133.
PG_STATEMENTS_QUERY = """
SELECT
    queryid::text AS query_id,
    userid::text  AS user_id,
    dbid::text    AS db_id,
    query,
    calls,
    total_plan_time,
    total_exec_time,
    rows,
    shared_blks_hit, shared_blks_read, shared_blks_dirtied, shared_blks_written,
    local_blks_hit, local_blks_read, local_blks_dirtied, local_blks_written,
    temp_blks_read, temp_blks_written,
    blk_read_time, blk_write_time
FROM pg_stat_statements
"""

#: Precondition probes (S2/S4): mysql/collector.go:98-120,
#: postgresql/collector.go:96-107.
MYSQL_PRECONDITION_QUERY = (
    "SELECT @@performance_schema AS performance_schema_enabled"
)
PG_PRECONDITION_QUERY = (
    "SELECT EXISTS(SELECT 1 FROM pg_extension WHERE extname = 'pg_stat_statements')"
    " AS pg_stat_statements_enabled"
)


def jdbc_scrape(
    spark: SparkSession, url: str, query: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """Read one snapshot from a live database over JDBC.

    The scrape is a single-partition read by design: source tables are
    bounded (pg_stat_statements.max=10000; perf-schema digest cap), so no
    partitioning column is needed and the monitored DB sees exactly one
    cheap query per tick — matching the reference's load profile.
    """
    reader = spark.read.format("jdbc").option("url", url).option(
        "query", query.strip()
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def _conform_scrape(
    df: DataFrame, schema: T.StructType, instance_id: str, snapshot_ts: datetime
) -> DataFrame:
    """Map one scrape result set onto a snapshot schema.

    JDBC drivers disagree on identifier-case normalization (MySQL preserves
    alias case as written; Derby/Oracle uppercase unquoted aliases) and on
    integer widths for counters, so columns are matched case-insensitively
    and cast to their declared snapshot types. A missing contract column is
    a hard error — the scrape SQL and the snapshot schema must agree
    (mysql/collector.go:123-143 ↔ mysql/snapshot.go:12-63)."""
    by_lower = {c.lower(): c for c in df.columns}
    missing = [
        f.name
        for f in schema.fields[2:]  # instance_id/snapshot_ts are added here
        if f.name.lower() not in by_lower
    ]
    if missing:
        raise ValueError(f"scrape result missing contract columns: {missing}")
    cols = [
        F.lit(instance_id).cast("string").alias("instance_id"),
        F.lit(snapshot_ts).cast("timestamp").alias("snapshot_ts"),
    ] + [
        F.col(by_lower[f.name.lower()]).cast(f.dataType).alias(f.name)
        for f in schema.fields[2:]
    ]
    return df.select(*cols)


def mysql_scrape_to_snapshot(
    df: DataFrame, instance_id: str, snapshot_ts: datetime
) -> DataFrame:
    """S1 scrape result → MYSQL_SNAPSHOT_SCHEMA rows for one tick."""
    return _conform_scrape(df, schemas.MYSQL_SNAPSHOT_SCHEMA, instance_id, snapshot_ts)


def pg_scrape_to_snapshot(
    df: DataFrame, instance_id: str, snapshot_ts: datetime
) -> DataFrame:
    """S3 scrape result → PG_SNAPSHOT_SCHEMA rows for one tick."""
    return _conform_scrape(df, schemas.PG_SNAPSHOT_SCHEMA, instance_id, snapshot_ts)
