"""JDBC scrape contract (S1-S4) exercised end-to-end without parquet fixtures.

The MySQL path runs the REAL scrape SQL through Spark's JDBC source against
an embedded Derby database posing as performance_schema (two ticks of
cumulative counters, a NULL-schema row to prove the scrape-side predicate),
then conforms the result through MYSQL_SNAPSHOT_SCHEMA into mysql_deltas —
the full S1 → snapshot → delta contract of mysql/collector.go:123-143.

The PG path replays a recorded pg_stat_statements result set (the column
shape postgresql/collector.go:110-133 returns) through the same conform →
pg_deltas pipeline, and pins the S3 query's alias list to the snapshot
schema by parsing the SQL text.
"""

from __future__ import annotations

import datetime as dt
import re

import pytest

from project_obsidian_core_spark import schemas
from project_obsidian_core_spark.operators.delta import mysql_deltas, pg_deltas
from project_obsidian_core_spark.sources import tables as SRC

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _result_aliases(query: str) -> list[str]:
    """Output column names of a scrape query, in order."""
    select_list = re.split(r"\bFROM\b", query, flags=re.I)[0]
    select_list = re.sub(r"^\s*SELECT\s+", "", select_list.strip(), flags=re.I)
    out = []
    for item in select_list.split(","):
        item = item.strip()
        if not item:
            continue
        m = re.search(r"\bAS\s+(\w+)\s*$", item, flags=re.I)
        out.append(m.group(1) if m else item.split(".")[-1])
    return out


def _derby(spark, db: str):
    jvm = spark.sparkContext._jvm
    return jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:memory:{db};create=true"
    )


MYSQL_DDL_TYPES = {
    "schema_name": "VARCHAR(64)",
    "digest": "VARCHAR(64)",
    "digest_text": "VARCHAR(1024)",
}


def test_mysql_scrape_contract_via_embedded_jdbc(spark):
    db = "perfschema_replay"
    conn = _derby(spark, db)
    st = conn.createStatement()
    cols = _result_aliases(SRC.MYSQL_DIGEST_QUERY)
    # source-side column names (the AS aliases mirror the source columns)
    ddl = ", ".join(f"{c} {MYSQL_DDL_TYPES.get(c, 'BIGINT')}" for c in cols)
    st.execute("CREATE SCHEMA performance_schema")
    st.execute(
        f"CREATE TABLE performance_schema.events_statements_summary_by_digest ({ddl})"
    )

    def insert(schema_name, digest, count_star, sum_timer_wait):
        metric_vals = {"count_star": count_star, "sum_timer_wait": sum_timer_wait}
        vals = []
        for c in cols:
            if c in MYSQL_DDL_TYPES:
                v = {"schema_name": schema_name, "digest": digest, "digest_text": f"SELECT {digest}"}[c]
                vals.append("NULL" if v is None else f"'{v}'")
            else:
                vals.append(str(metric_vals.get(c, 0)))
        st.execute(
            "INSERT INTO performance_schema.events_statements_summary_by_digest "
            f"VALUES ({', '.join(vals)})"
        )

    url = f"jdbc:derby:memory:{db}"
    props = {"driver": DERBY_DRIVER}
    ts = lambda m: dt.datetime(2026, 5, 1, 9, m)

    # tick 1 — includes a background row with NULL schema (filtered by the
    # scrape WHERE, mysql/collector.go:131)
    insert("app", "d1", 10, 1000)
    insert(None, "dSYS", 999, 999)
    scrape1 = SRC.jdbc_scrape(spark, url, SRC.MYSQL_DIGEST_QUERY, props)
    # Derby uppercases unquoted aliases — exactly the driver variance the
    # conform step absorbs
    assert [c.upper() for c in scrape1.columns] == [c.upper() for c in cols]
    snap1 = SRC.mysql_scrape_to_snapshot(scrape1, "mysql://replay:3306", ts(0))
    assert snap1.schema == schemas.MYSQL_SNAPSHOT_SCHEMA
    # materialize tick 1 NOW — a lazy JDBC scan would re-read the table
    # after the UPDATE below (exactly why production scrapes snapshot
    # per-tick rather than holding lazy frames across ticks)
    snap1_rows = snap1.collect()
    assert {r["digest"] for r in snap1_rows} == {"d1"}  # NULL-schema row gone
    snap1 = spark.createDataFrame(snap1_rows, schemas.MYSQL_SNAPSHOT_SCHEMA)

    # tick 2 — counters advanced
    st.execute(
        "UPDATE performance_schema.events_statements_summary_by_digest "
        "SET count_star = 25, sum_timer_wait = 2600 WHERE digest = 'd1'"
    )
    snap2 = SRC.mysql_scrape_to_snapshot(
        SRC.jdbc_scrape(spark, url, SRC.MYSQL_DIGEST_QUERY, props),
        "mysql://replay:3306",
        ts(1),
    )

    out = mysql_deltas(snap1.unionByName(snap2)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["digest"] == "d1"
    assert r["count_star_delta"] == 15
    assert r["sum_timer_wait_delta"] == 1600
    assert r["time_period_seconds"] == 60.0
    conn.close()


def test_mysql_precondition_probe_via_embedded_jdbc(spark):
    # S2's probe result shape: one row, one boolean-ish column. Derby can't
    # parse @@vars, so the probe contract is pinned at the result-set level:
    # a recorded probe result conforms to the expected single-column shape.
    db = "probe_replay"
    conn = _derby(spark, db)
    st = conn.createStatement()
    st.execute("CREATE TABLE probe_result(performance_schema_enabled INT)")
    st.execute("INSERT INTO probe_result VALUES (1)")
    out = SRC.jdbc_scrape(
        spark,
        f"jdbc:derby:memory:{db}",
        "SELECT performance_schema_enabled FROM probe_result",
        {"driver": DERBY_DRIVER},
    ).collect()
    assert len(out) == 1 and out[0][0] == 1
    assert "@@performance_schema" in SRC.MYSQL_PRECONDITION_QUERY
    assert "pg_stat_statements" in SRC.PG_PRECONDITION_QUERY
    conn.close()


def test_pg_statements_query_matches_snapshot_contract():
    # S3: every output column of the scrape SQL maps 1:1 (case-insensitive)
    # onto PG_SNAPSHOT_SCHEMA minus the tick columns added at conform time.
    aliases = _result_aliases(SRC.PG_STATEMENTS_QUERY)
    expected = [f.name for f in schemas.PG_SNAPSHOT_SCHEMA.fields[2:]]
    assert sorted(a.lower() for a in aliases) == sorted(expected)


def test_pg_recorded_result_set_through_deltas(spark):
    # Replay a recorded pg_stat_statements result set (what the JDBC read
    # returns: driver-native case + wider/narrower numerics) through
    # conform → pg_deltas.
    aliases = _result_aliases(SRC.PG_STATEMENTS_QUERY)

    def recorded(queryid, calls, total_exec_time, rows_):
        vals = {
            "query_id": queryid,
            "user_id": "10",
            "db_id": "16384",
            "query": "SELECT ?",
            "calls": calls,
            "total_exec_time": float(total_exec_time),
            "rows": rows_,
        }
        return tuple(
            vals.get(a, 0.0 if a in schemas.PG_DOUBLE_METRIC_COLS else 0)
            for a in aliases
        )

    ts = lambda m: dt.datetime(2026, 5, 1, 9, m)
    mk = lambda rows: spark.createDataFrame(rows, aliases)
    snap1 = SRC.pg_scrape_to_snapshot(mk([recorded("q1", 5, 12.5, 100)]), "pg://replay", ts(0))
    assert snap1.schema == schemas.PG_SNAPSHOT_SCHEMA
    snap2 = SRC.pg_scrape_to_snapshot(mk([recorded("q1", 9, 20.0, 260)]), "pg://replay", ts(1))

    out = pg_deltas(snap1.unionByName(snap2)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["query_id"] == "q1"
    assert r["calls_delta"] == 4
    assert r["total_exec_time_delta"] == 7.5
    assert r["rows_delta"] == 160


def test_conform_rejects_missing_contract_column(spark):
    df = spark.createDataFrame([("app", "d1")], ["schema_name", "digest"])
    with pytest.raises(ValueError, match="missing contract columns"):
        SRC.mysql_scrape_to_snapshot(df, "i", dt.datetime(2026, 5, 1))


def test_global_status_scrape_pivot_via_embedded_jdbc(spark):
    # S5 end-to-end: the REAL global-status SQL over JDBC (string KV rows,
    # exactly what performance_schema serves) → pivot → typed status row →
    # the governor's StatusSample (adaptive/mysql_collector.go:168-227).
    db = "status_replay"
    conn = _derby(spark, db)
    st = conn.createStatement()
    st.execute("CREATE SCHEMA performance_schema")
    st.execute(
        "CREATE TABLE performance_schema.global_status("
        "variable_name VARCHAR(64), variable_value VARCHAR(64))"
    )
    for name, val in [
        ("Threads_running", "3"),
        ("Threads_connected", "12"),
        ("Questions", "123456"),
        ("Slow_queries", "7"),
        ("Innodb_row_lock_time", "890"),
        ("Uptime", "3600"),
        ("Aborted_clients", "99"),  # not in the IN-list: must not be scraped
    ]:
        st.execute(
            "INSERT INTO performance_schema.global_status VALUES "
            f"('{name}', '{val}')"
        )

    scrape = SRC.jdbc_scrape(
        spark,
        f"jdbc:derby:memory:{db}",
        SRC.MYSQL_GLOBAL_STATUS_QUERY,
        {"driver": DERBY_DRIVER},
    )
    tick = dt.datetime(2026, 5, 1, 9, 0)
    out = SRC.status_kv_pivot(scrape, "mysql://replay:3306", tick)
    # names+types must match the contract; nullability is tighter here (the
    # 0-default coalesce makes every counter non-null)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in schemas.MYSQL_STATUS_SCHEMA.fields
    ]
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["threads_running"] == 3
    assert r["threads_connected"] == 12
    assert r["questions"] == 123456
    assert r["slow_queries"] == 7
    assert r["innodb_row_lock_time"] == 890
    assert r["uptime"] == 3600

    sample = SRC.row_to_status_sample(r)
    assert sample.qps_inputs() if hasattr(sample, "qps_inputs") else True
    assert sample.questions == 123456 and sample.ts == tick.timestamp()
    conn.close()


def test_status_kv_pivot_parse_failure_and_missing_variable(spark):
    # Go's `val, _ := strconv.Atoi` leaves 0 on parse failure; an evicted /
    # absent variable also reads as 0. Multi-instance KV feeds pivot into
    # one typed row per (instance, tick).
    tick = dt.datetime(2026, 5, 1, 9, 0)
    kv = spark.createDataFrame(
        [
            ("i1", tick, "Threads_running", "not-a-number"),
            ("i1", tick, "Questions", "100"),
            ("i2", tick, "Threads_running", "5"),
            ("i2", tick, "Questions", "200"),
        ],
        ["instance_id", "sample_ts", "variable_name", "variable_value"],
    )
    rows = {r["instance_id"]: r for r in SRC.status_kv_pivot(kv).collect()}
    assert rows["i1"]["threads_running"] == 0      # parse failure → 0
    assert rows["i1"]["questions"] == 100
    assert rows["i1"]["uptime"] == 0               # missing variable → 0
    assert rows["i2"]["threads_running"] == 5
    assert rows["i2"]["questions"] == 200
