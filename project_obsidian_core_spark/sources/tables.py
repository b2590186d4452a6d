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

#: The adaptive sampler's global-status scrape (S5) — name list identical to
#: adaptive/mysql_collector.go:168-196.
MYSQL_GLOBAL_STATUS_QUERY = """
SELECT VARIABLE_NAME, VARIABLE_VALUE
FROM performance_schema.global_status
WHERE VARIABLE_NAME IN (
    'Threads_running',
    'Threads_connected',
    'Questions',
    'Slow_queries',
    'Innodb_row_lock_time',
    'Uptime'
)
"""

#: Pivot targets in MYSQL_STATUS_SCHEMA field order (after the two key cols).
STATUS_VARIABLES = (
    "Threads_running",
    "Threads_connected",
    "Questions",
    "Slow_queries",
    "Innodb_row_lock_time",
    "Uptime",
)


def status_kv_pivot(df: DataFrame, instance_id: str | None = None,
                    sample_ts: datetime | None = None) -> DataFrame:
    """S5: (VARIABLE_NAME, VARIABLE_VALUE) key-value rows → typed status rows.

    The reference walks the result set row-by-row and strconv-parses each
    value into a struct field (adaptive/mysql_collector.go:192-219); the
    Spark-first equivalent is a `pivot` with the variable names given
    up-front — no discovery pass, one narrow exchange — followed by typed
    casts onto MYSQL_STATUS_SCHEMA. Parse failures become 0, matching Go's
    ignored strconv error (`val, _ := strconv.Atoi`).

    Accepts a single-scrape relation (no instance column; pass
    ``instance_id``/``sample_ts``) or a multi-instance/multi-tick KV feed
    with ``instance_id`` / ``sample_ts`` columns, which become group keys.
    """
    from project_obsidian_core_spark import schemas

    by_lower = {c.lower(): c for c in df.columns}
    sel = [
        (F.col(by_lower["instance_id"]) if "instance_id" in by_lower
         else F.lit(instance_id)).cast("string").alias("instance_id"),
        (F.col(by_lower["sample_ts"]) if "sample_ts" in by_lower
         else F.lit(sample_ts)).cast("timestamp").alias("sample_ts"),
        F.col(by_lower["variable_name"]).alias("variable_name"),
        F.col(by_lower["variable_value"]).cast("string").alias("variable_value"),
    ]
    wide = (
        df.select(*sel)
        .groupBy("instance_id", "sample_ts")
        .pivot("variable_name", list(STATUS_VARIABLES))
        .agg(F.first("variable_value"))
    )
    fields = schemas.MYSQL_STATUS_SCHEMA.fields
    return wide.select(
        "instance_id",
        "sample_ts",
        *[
            # try_cast: ANSI mode would throw on malformed counter text; Go
            # ignores the strconv error and leaves 0 — coalesce matches that.
            F.coalesce(F.col(v).try_cast(f.dataType), F.lit(0).cast(f.dataType)).alias(f.name)
            for v, f in zip(STATUS_VARIABLES, fields[2:])
        ],
    )


def row_to_status_sample(row) -> "StatusSample":  # noqa: F821
    """One MYSQL_STATUS_SCHEMA row → the governor's StatusSample (T10 input)."""
    from project_obsidian_core_spark.streaming.governor import StatusSample

    return StatusSample(
        threads_running=row["threads_running"],
        threads_connected=row["threads_connected"],
        questions=row["questions"],
        slow_queries=row["slow_queries"],
        uptime=row["uptime"],
        ts=row["sample_ts"].timestamp(),
    )


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
