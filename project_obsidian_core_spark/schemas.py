"""Static schema declarations (SURVEY §1, FIXTURES.md).

The reference declares every dataset shape in code (Go structs at
mysql/snapshot.go:12-63, postgresql/snapshot.go:12-75; Druid dimensionsSpec at
druid-specs/qan_db_ingestion.json:28-91). We mirror that with StructType
constants. ``qan_db`` is the union of the MySQL-only and PG-only columns, each
nullable for the other system's rows, exactly as the merged Druid spec treats
them (druid/config/qan_ingestion_spec.json:10-39).

Types (SURVEY §1.3): counters are LongType (MySQL timer columns are cumulative
picoseconds -- 2^63 ps ≈ 106 days, safe per interval); PG time columns are
DoubleType milliseconds; `metric_labels` is the single dynamic-schema escape
hatch -> MapType(string, string).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Snapshot inputs (FIXTURES.md §A)
# --------------------------------------------------------------------------

#: MySQL digest metric columns, cumulative counters
#: (reference struct: mysql/snapshot.go:23-59; scrape SQL mysql/collector.go:124-141).
MYSQL_METRIC_COLS: tuple[str, ...] = (
    "count_star",
    "sum_timer_wait",
    "sum_lock_time",
    "sum_errors",
    "sum_warnings",
    "sum_rows_affected",
    "sum_rows_sent",
    "sum_rows_examined",
    "sum_created_tmp_tables",
    "sum_created_tmp_disk_tables",
    "sum_sort_rows",
    "sum_no_index_used",
    "sum_no_good_index_used",
)

MYSQL_SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("instance_id", T.StringType(), False),
        T.StructField("snapshot_ts", T.TimestampType(), False),
        T.StructField("schema_name", T.StringType(), True),
        # nullable: rows with invalid digest occur at scrape and are dropped
        # downstream (mysql/collector.go:184-186, operator P2)
        T.StructField("digest", T.StringType(), True),
        T.StructField("digest_text", T.StringType(), True),
    ]
    + [T.StructField(c, T.LongType(), True) for c in MYSQL_METRIC_COLS]
)

#: PostgreSQL statement metric columns (postgresql/snapshot.go:25-75).
#: `calls`, `rows` and block counts are long counters; time columns are double ms.
PG_LONG_METRIC_COLS: tuple[str, ...] = (
    "calls",
    "rows",
    "shared_blks_hit",
    "shared_blks_read",
    "shared_blks_dirtied",
    "shared_blks_written",
    "local_blks_hit",
    "local_blks_read",
    "local_blks_dirtied",
    "local_blks_written",
    "temp_blks_read",
    "temp_blks_written",
)

PG_DOUBLE_METRIC_COLS: tuple[str, ...] = (
    "total_plan_time",
    "total_exec_time",
    "blk_read_time",
    "blk_write_time",
)

PG_METRIC_COLS: tuple[str, ...] = PG_LONG_METRIC_COLS + PG_DOUBLE_METRIC_COLS

PG_SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("instance_id", T.StringType(), False),
        T.StructField("snapshot_ts", T.TimestampType(), False),
        T.StructField("query_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("db_id", T.StringType(), True),
        T.StructField("query", T.StringType(), True),
    ]
    + [T.StructField(c, T.LongType(), True) for c in PG_LONG_METRIC_COLS]
    + [T.StructField(c, T.DoubleType(), True) for c in PG_DOUBLE_METRIC_COLS]
)

#: MySQL global_status sample (adaptive/mysql_collector.go:14-23,168-227).
MYSQL_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("instance_id", T.StringType(), False),
        T.StructField("sample_ts", T.TimestampType(), False),
        T.StructField("threads_running", T.IntegerType(), True),
        T.StructField("threads_connected", T.IntegerType(), True),
        T.StructField("questions", T.LongType(), True),
        T.StructField("slow_queries", T.LongType(), True),
        T.StructField("innodb_row_lock_time", T.LongType(), True),
        T.StructField("uptime", T.LongType(), True),
    ]
)

# --------------------------------------------------------------------------
# Fact tables (FIXTURES.md §B)
# --------------------------------------------------------------------------

#: qan_db — wide union of MySQL + PG delta records
#: (mysql/collector.go:208-270, postgresql/collector.go:192-261,
#: druid/config/qan_ingestion_spec.json:10-39). MySQL-only columns are null
#: for postgresql rows and vice versa; rows_examined_delta is populated by
#: both (PG aliases it from rows_delta "for compatibility",
#: postgresql/collector.go:250-251).
QAN_DB_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("service_name", T.StringType(), False),
        T.StructField("db_system", T.StringType(), False),
        T.StructField("instance_id", T.StringType(), False),
        T.StructField("statement_digest", T.StringType(), True),
        T.StructField("query_id", T.StringType(), True),
        T.StructField("statement_sample", T.StringType(), True),
        T.StructField("db_schema", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("db_name_id", T.StringType(), True),
        T.StructField("calls_delta", T.LongType(), True),
        # MySQL-only deltas (picosecond timers, long counters)
        T.StructField("total_timer_wait_delta", T.LongType(), True),
        T.StructField("lock_time_delta", T.LongType(), True),
        T.StructField("errors_delta", T.LongType(), True),
        T.StructField("warnings_delta", T.LongType(), True),
        T.StructField("rows_affected_delta", T.LongType(), True),
        T.StructField("rows_sent_delta", T.LongType(), True),
        T.StructField("rows_examined_delta", T.LongType(), True),
        T.StructField("created_tmp_tables_delta", T.LongType(), True),
        T.StructField("created_tmp_disk_tables_delta", T.LongType(), True),
        T.StructField("sort_rows_delta", T.LongType(), True),
        T.StructField("no_index_used_delta", T.LongType(), True),
        T.StructField("no_good_index_used_delta", T.LongType(), True),
        # PG-only deltas (double ms timers, long counters)
        T.StructField("total_plan_time_delta", T.DoubleType(), True),
        T.StructField("total_exec_time_delta", T.DoubleType(), True),
        T.StructField("rows_delta", T.LongType(), True),
        T.StructField("shared_blks_hit_delta", T.LongType(), True),
        T.StructField("shared_blks_read_delta", T.LongType(), True),
        T.StructField("shared_blks_dirtied_delta", T.LongType(), True),
        T.StructField("shared_blks_written_delta", T.LongType(), True),
        T.StructField("local_blks_hit_delta", T.LongType(), True),
        T.StructField("local_blks_read_delta", T.LongType(), True),
        T.StructField("local_blks_dirtied_delta", T.LongType(), True),
        T.StructField("local_blks_written_delta", T.LongType(), True),
        T.StructField("temp_blks_read_delta", T.LongType(), True),
        T.StructField("temp_blks_written_delta", T.LongType(), True),
        T.StructField("blk_read_time_delta", T.DoubleType(), True),
        T.StructField("blk_write_time_delta", T.DoubleType(), True),
        T.StructField("time_period_seconds", T.DoubleType(), True),
    ]
)

#: metrics_db — long-format time series
#: (druid-specs/metrics_db_ingestion.json:22-62).
METRICS_DB_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("instance_id", T.StringType(), False),
        T.StructField("db_system", T.StringType(), False),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_labels", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("metric_value", T.DoubleType(), True),
        T.StructField("metric_max", T.DoubleType(), True),
        T.StructField("metric_min", T.DoubleType(), True),
    ]
)

SERVICE_NAME = "obsidian-core"
