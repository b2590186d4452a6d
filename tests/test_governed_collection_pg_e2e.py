"""End-to-end governed collection lifecycle — the PostgreSQL twin
(r14 verdict Next #5).

``test_governed_collection_e2e.py`` proves the composed loop for the
MySQL shape; this file closes the one asymmetry in the lifecycle proof:
an embedded Derby database poses as a live PostgreSQL
(``pg_stat_statements`` + a ``pg_stat_activity`` stand-in), and the same
AdaptiveCollectionLoop drives real ticks —

  scrape (S3 statements JDBC, the real PG_STATEMENTS_QUERY modulo the
  ``::text`` casts Derby cannot parse)
    → snapshot conform → reset-aware delta (J1/T2-T5, activity gate
      calls_delta > 0, postgresql/snapshot.go:183-279)
    → qan_db hour-partitioned append (S9, postgresql/collector.go:192-261)
    → activity scrape → composite load (T10/A11)
    → governor EMA/hysteresis (T6-T7) → next tick's interval

Reference note: the reference paces PostgreSQL on a FIXED ticker
(processor.go:216-245) — only MySQL has the adaptive sampler
(adaptive/mysql_collector.go).  The governed twin here is strictly
stronger: in the quiet regime the governor HOLDS the base interval
(= the reference's fixed cadence), and under saturation it backs off to
the 60 s maximum.  The load mapping is the A11 composite with PG-native
inputs: active/total backends from pg_stat_activity play the
threads_running/threads_connected ratio, and the slow-statement calls
share of total calls plays the slow-query ratio.
"""

from __future__ import annotations

import datetime as dt
import re

import pytest

from project_obsidian_core_spark import schemas
from project_obsidian_core_spark.operators.delta import (
    pg_deltas,
    pg_deltas_to_qan,
)
from project_obsidian_core_spark.operators.rollup import write_qan
from project_obsidian_core_spark.sources import tables as SRC
from project_obsidian_core_spark.streaming.collection_loop import (
    AdaptiveCollectionLoop,
)
from project_obsidian_core_spark.streaming.governor import (
    MAXIMUM_INTERVAL_S,
    AdaptiveGovernor,
    StatusSample,
    status_diff,
)

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

#: Derby cannot parse PostgreSQL's ``::text`` cast syntax and reserves
#: the word ``rows``; the scrape the test runs is the REAL S3 query with
#: only those two lexical fixes (the Derby columns are declared VARCHAR
#: so no cast is needed, and the quoted "rows" resolves to the same
#: column name).  A pin below asserts these are the only differences.
DERBY_PG_STATEMENTS_QUERY = re.sub(
    r"(\w+)::text", r"\1", SRC.PG_STATEMENTS_QUERY
).replace("\n    rows,", '\n    "rows",')

#: pg_stat_activity scrape (valid PostgreSQL and valid Derby): the
#: active/total backend ratio is the PG analogue of
#: threads_running/threads_connected.
#: quoted aliases because Derby uppercases bare identifiers (quoted
#: lowercase aliases are equally valid PostgreSQL)
PG_ACTIVITY_QUERY = """
SELECT
    SUM(CASE WHEN state = 'active' THEN 1 ELSE 0 END) AS "active_backends",
    COUNT(*) AS "total_backends"
FROM pg_stat_activity
"""

PG_DDL_TYPES = {
    "queryid": "VARCHAR(64)",
    "userid": "VARCHAR(64)",
    "dbid": "VARCHAR(64)",
    "query": "VARCHAR(1024)",
}

#: the simulated workload, per tick:
#: (q1 calls increment, q2 "slow statement" calls increment,
#:  active backends, total backends).
#: ticks 0-2 quiet (1/10 active, no slow calls → load 0.07 — below every
#: threshold); ticks 3+ saturated (every backend active + the slow
#: statement dominating → load ≈ 0.99), driving the fast EMA (α=0.3)
#: through the 0.7 backoff threshold and past the 0.9 critical jump —
#: the governor must step the cadence up and finish at the 60 s maximum.
RAMP = [(5, 0, 1, 10)] * 3 + [(40, 1000, 10, 10)] * 9


class _LivePG:
    """Mutable Derby stand-in for the monitored PostgreSQL."""

    def __init__(self, spark, db: str) -> None:
        jvm = spark.sparkContext._jvm
        self.conn = jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:memory:{db};create=true"
        )
        self.st = self.conn.createStatement()
        self.url = f"jdbc:derby:memory:{db}"
        # calls / rows / exec-time counters per statement key
        self.calls = {"q1": 100, "q2": 0}
        self.rows = {"q1": 300, "q2": 0}
        self.exec_ms = {"q1": 250.0, "q2": 0.0}

        # pg_stat_statements with PG-native column names: the scrape's
        # alias list (queryid AS query_id, ...) does the renaming exactly
        # as it does against a real server.
        long_cols = [c for c in schemas.PG_LONG_METRIC_COLS]
        dbl_cols = [c for c in schemas.PG_DOUBLE_METRIC_COLS]
        ddl = ", ".join(
            [f"{c} {t}" for c, t in PG_DDL_TYPES.items()]
            + [
                ('"rows" BIGINT' if c == "rows" else f"{c} BIGINT")
                for c in long_cols
            ]
            + [f"{c} DOUBLE" for c in dbl_cols]
        )
        self.st.execute(f"CREATE TABLE pg_stat_statements ({ddl})")
        for qid in ("q1", "q2"):
            vals = {
                "queryid": f"'{qid}'",
                "userid": "'10'",
                "dbid": "'16384'",
                "query": f"'SELECT * FROM t_{qid}'",
                "calls": str(self.calls[qid]),
                "rows": str(self.rows[qid]),
                "total_exec_time": str(self.exec_ms[qid]),
            }
            cols = list(PG_DDL_TYPES) + long_cols + dbl_cols
            self.st.execute(
                "INSERT INTO pg_stat_statements VALUES ("
                + ", ".join(vals.get(c, "0") for c in cols)
                + ")"
            )
        self.st.execute("CREATE TABLE pg_stat_activity (state VARCHAR(16))")
        self._set_activity(1, 10)

    def _set_activity(self, active: int, total: int) -> None:
        self.st.execute("DELETE FROM pg_stat_activity")
        for i in range(total):
            state = "active" if i < active else "idle"
            self.st.execute(f"INSERT INTO pg_stat_activity VALUES ('{state}')")

    def advance(self, d_q1: int, d_q2: int, active: int, total: int) -> None:
        """Simulate workload between ticks: counters only ever advance."""
        for qid, d in (("q1", d_q1), ("q2", d_q2)):
            if d == 0:
                continue
            self.calls[qid] += d
            self.rows[qid] += d * 3
            self.exec_ms[qid] += d * 2.5
            self.st.execute(
                "UPDATE pg_stat_statements SET "
                f'calls = {self.calls[qid]}, "rows" = {self.rows[qid]}, '
                f"total_exec_time = {self.exec_ms[qid]} "
                f"WHERE queryid = '{qid}'"
            )
        self._set_activity(active, total)


def test_scrape_query_translation_only_strips_casts():
    """The Derby rendition differs from the real S3 query ONLY by the
    ``::text`` casts and the quoted ``"rows"`` — same aliases, same
    column list, same FROM."""
    assert "::" not in DERBY_PG_STATEMENTS_QUERY
    assert DERBY_PG_STATEMENTS_QUERY.replace('"rows"', "rows") == (
        SRC.PG_STATEMENTS_QUERY.replace("::text", "")
    )


def test_governed_derby_pg_loop_backs_off_and_emits_qan(spark, tmp_path):
    db = _LivePG(spark, "governed_pg_loop")
    qan_dir = str(tmp_path / "qan_db")
    props = {"driver": DERBY_DRIVER}

    governor = AdaptiveGovernor(base_interval_s=1.0, jitter_percent=0.0)
    base = governor.get_raw_interval()

    t0 = dt.datetime(2026, 8, 16, 11, 0, 0)
    state = {"tick": 0, "prev_snap": None, "prev_status": None, "loads": []}

    def collect_once() -> float:
        """One full PG collection cycle (postgresql/collector.go:66-189)."""
        i = state["tick"]
        db.advance(*RAMP[i])
        now = t0 + dt.timedelta(seconds=10 * i)
        # S3: statements scrape → conformed snapshot, materialized per
        # tick (a lazy JDBC frame would re-read Derby after the UPDATE)
        snap_rows = SRC.pg_scrape_to_snapshot(
            SRC.jdbc_scrape(spark, db.url, DERBY_PG_STATEMENTS_QUERY, props),
            "pg://derby:5432",
            now,
        ).collect()
        snap = spark.createDataFrame(snap_rows, schemas.PG_SNAPSHOT_SCHEMA)
        # J1/T2-T5 → S9: delta against the held snapshot, append to qan_db
        if state["prev_snap"] is not None:
            deltas = pg_deltas(state["prev_snap"].unionByName(snap))
            write_qan(pg_deltas_to_qan(deltas), qan_dir)
        state["prev_snap"] = snap
        # activity scrape → A11 composite load: active/total backends as
        # the busy ratio, slow-statement calls share as the slow ratio
        act = SRC.jdbc_scrape(spark, db.url, PG_ACTIVITY_QUERY, props).collect()[0]
        total_calls = sum(
            r["calls"] for r in snap_rows if r["calls"] is not None
        )
        slow_calls = next(
            (r["calls"] for r in snap_rows if r["query_id"] == "q2"), 0
        )
        sample = StatusSample(
            threads_running=int(act["active_backends"]),
            threads_connected=int(act["total_backends"]),
            questions=int(total_calls),
            slow_queries=int(slow_calls),
            uptime=3600 + 10 * i,
            ts=now.timestamp(),
        )
        load = 0.0
        if state["prev_status"] is not None:
            load = status_diff(state["prev_status"], sample).load
        state["prev_status"] = sample
        state["loads"].append(load)
        state["tick"] += 1
        return load

    sleeps: list[float] = []
    loop = AdaptiveCollectionLoop(governor, collect_once, sleep=sleeps.append)
    loop.run(max_ticks=len(RAMP))

    # --- governor posture: quiet ticks hold base, the ramp backs off ----
    assert loop.ticks == len(RAMP)
    assert sleeps[:3] == [base] * 3, f"quiet ticks must hold base: {sleeps[:3]}"
    assert governor.get_raw_interval() > base, (
        f"saturated ramp never backed off: {sleeps}"
    )
    assert sleeps[-1] == MAXIMUM_INTERVAL_S, sleeps
    assert sleeps == sorted(sleeps), f"interval must never shrink mid-ramp: {sleeps}"
    # loads: first tick unmeasurable (0), quiet = 1/10 busy + no slow,
    # saturated = 0.7 + 0.3·(1000/1040)
    assert state["loads"][0] == 0.0
    assert state["loads"][1] == pytest.approx(0.07, abs=0.001)
    assert state["loads"][4] == pytest.approx(0.7 + 0.3 * 1000 / 1040, abs=1e-9)

    # --- the sink: every post-first tick appended its delta rows --------
    qan = spark.read.parquet(qan_dir)
    rows = sorted(qan.collect(), key=lambda r: (r["time"], r["query_id"]))
    assert all(r["db_system"] == "postgresql" for r in rows)
    q1 = [r for r in rows if r["query_id"] == "q1"]
    q2 = [r for r in rows if r["query_id"] == "q2"]
    # T2 first tick emits nothing; activity gate (calls_delta > 0,
    # postgresql/snapshot.go:235) drops q2 in the quiet ticks where only
    # q1 advanced
    assert [r["calls_delta"] for r in q1] == [d for d, *_ in RAMP[1:]]
    assert [r["calls_delta"] for r in q2] == [1000] * 9
    # rows_examined_delta is aliased from rows_delta (collector.go:250-251)
    assert all(r["rows_examined_delta"] == 3 * r["calls_delta"] for r in rows)
    # float metric deltas survive the pass exactly (2.5 ms per call)
    assert all(
        r["total_exec_time_delta"] == pytest.approx(2.5 * r["calls_delta"])
        for r in rows
    )
    # S9 layout: hour-grained partition columns survived the sink
    assert {"event_date", "event_hour"} <= set(qan.columns)
    assert rows[0]["event_hour"] == 11
