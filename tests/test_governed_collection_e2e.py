"""End-to-end governed collection lifecycle (r13 verdict Next #2).

The composed loop of processor.go:131-248 + adaptive/governor.go:191-260
as ONE artifact: an embedded Derby database poses as a live MySQL
(performance_schema digest table + global_status), and the
AdaptiveCollectionLoop drives real ticks —

  scrape (S1 digest JDBC + S5 status KV pivot)
    → snapshot conform → reset-aware delta (J1/T2-T5)
    → qan_db hour-partitioned append (S9)
    → status diff → composite load (T10/A11)
    → governor EMA/hysteresis (T6-T7) → next tick's interval

— under a load ramp: quiet ticks first (interval must HOLD at base),
then a saturated regime (threads_running ≈ threads_connected, slow-query
burst) that must back the cadence off toward the 60 s maximum.  The
existing suite exercised every stage as separate units plus a synthetic
load-ramp integration; this test is the full scrape→state→delta→sink
lifecycle under the governor against a real JDBC source.
"""

from __future__ import annotations

import datetime as dt
import re

import pytest

from project_obsidian_core_spark import schemas
from project_obsidian_core_spark.operators.delta import (
    mysql_deltas,
    mysql_deltas_to_qan,
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


def _result_aliases(query: str) -> list[str]:
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


MYSQL_DDL_TYPES = {
    "schema_name": "VARCHAR(64)",
    "digest": "VARCHAR(64)",
    "digest_text": "VARCHAR(1024)",
}

#: the simulated workload, per tick: (count_star increment for digest d1,
#: threads_running, threads_connected, questions increment, slow increment)
#: ticks 0-2 quiet (load ≈ 0.07 — below every threshold); ticks 3+
#: saturated (every connection running + all questions slow → load 1.0),
#: driving the fast EMA (α=0.3) through the 0.7 backoff threshold at the
#: ~5th saturated sample and past the 0.9 critical jump at the ~7th —
#: the governor must step the cadence up and finish at the 60 s maximum.
RAMP = [(5, 1, 10, 1000, 0)] * 3 + [(40, 10, 10, 1000, 1000)] * 9


class _LiveMySQL:
    """Mutable Derby stand-in for the monitored database."""

    def __init__(self, spark, db: str) -> None:
        jvm = spark.sparkContext._jvm
        self.conn = jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:memory:{db};create=true"
        )
        self.st = self.conn.createStatement()
        self.url = f"jdbc:derby:memory:{db}"
        self.digest_cols = _result_aliases(SRC.MYSQL_DIGEST_QUERY)
        self.count_star = 100
        self.sum_timer = 10_000
        self.status = {
            "Threads_running": 1,
            "Threads_connected": 10,
            "Questions": 50_000,
            "Slow_queries": 10,
            "Innodb_row_lock_time": 0,
            "Uptime": 3600,
        }
        st = self.st
        st.execute("CREATE SCHEMA performance_schema")
        ddl = ", ".join(
            f"{c} {MYSQL_DDL_TYPES.get(c, 'BIGINT')}" for c in self.digest_cols
        )
        st.execute(
            "CREATE TABLE performance_schema."
            f"events_statements_summary_by_digest ({ddl})"
        )
        vals = []
        for c in self.digest_cols:
            if c in MYSQL_DDL_TYPES:
                vals.append(
                    {"schema_name": "'app'", "digest": "'d1'",
                     "digest_text": "'SELECT 1'"}[c]
                )
            elif c == "count_star":
                vals.append(str(self.count_star))
            elif c == "sum_timer_wait":
                vals.append(str(self.sum_timer))
            else:
                vals.append("0")
        st.execute(
            "INSERT INTO performance_schema.events_statements_summary_by_digest"
            f" VALUES ({', '.join(vals)})"
        )
        st.execute(
            "CREATE TABLE performance_schema.global_status ("
            "VARIABLE_NAME VARCHAR(64), VARIABLE_VALUE VARCHAR(64))"
        )
        for k, v in self.status.items():
            st.execute(
                "INSERT INTO performance_schema.global_status VALUES "
                f"('{k}', '{v}')"
            )

    def advance(self, d_calls: int, tr: int, tc: int, d_q: int, d_slow: int):
        """Simulate workload between ticks: counters only ever advance."""
        self.count_star += d_calls
        self.sum_timer += d_calls * 120
        self.st.execute(
            "UPDATE performance_schema.events_statements_summary_by_digest "
            f"SET count_star = {self.count_star}, "
            f"sum_timer_wait = {self.sum_timer} WHERE digest = 'd1'"
        )
        self.status["Threads_running"] = tr
        self.status["Threads_connected"] = tc
        self.status["Questions"] += d_q
        self.status["Slow_queries"] += d_slow
        self.status["Uptime"] += 10
        for k, v in self.status.items():
            self.st.execute(
                "UPDATE performance_schema.global_status "
                f"SET VARIABLE_VALUE = '{v}' WHERE VARIABLE_NAME = '{k}'"
            )


def test_governed_derby_loop_backs_off_and_emits_qan(spark, tmp_path):
    db = _LiveMySQL(spark, "governed_loop")
    qan_dir = str(tmp_path / "qan_db")
    props = {"driver": DERBY_DRIVER}

    governor = AdaptiveGovernor(base_interval_s=1.0, jitter_percent=0.0)
    base = governor.get_raw_interval()

    t0 = dt.datetime(2026, 8, 16, 9, 0, 0)
    state = {"tick": 0, "prev_snap": None, "prev_status": None, "loads": []}

    def collect_once() -> float:
        """One full reference collection cycle (processor.go:131-248)."""
        i = state["tick"]
        db.advance(*RAMP[i])
        now = t0 + dt.timedelta(seconds=10 * i)
        # S1: digest scrape → conformed snapshot, materialized per tick
        # (a lazy JDBC frame would re-read Derby after the next UPDATE)
        snap_rows = SRC.mysql_scrape_to_snapshot(
            SRC.jdbc_scrape(spark, db.url, SRC.MYSQL_DIGEST_QUERY, props),
            "mysql://derby:3306",
            now,
        ).collect()
        snap = spark.createDataFrame(snap_rows, schemas.MYSQL_SNAPSHOT_SCHEMA)
        # J1/T2-T5 → S9: delta against the held snapshot, append to qan_db
        if state["prev_snap"] is not None:
            deltas = mysql_deltas(state["prev_snap"].unionByName(snap))
            write_qan(mysql_deltas_to_qan(deltas), qan_dir)
        state["prev_snap"] = snap
        # S5 → T10/A11: status scrape → pivot → diff → composite load
        kv = SRC.jdbc_scrape(spark, db.url, SRC.MYSQL_GLOBAL_STATUS_QUERY, props)
        srow = SRC.status_kv_pivot(kv, "mysql://derby:3306", now).collect()[0]
        sample = StatusSample(
            threads_running=srow["threads_running"],
            threads_connected=srow["threads_connected"],
            questions=srow["questions"],
            slow_queries=srow["slow_queries"],
            uptime=srow["uptime"],
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
    # the backoff must be progressive (hysteresis applies each >10% move)
    # and reach the critical 60 s jump once fast EMA crosses 0.9
    assert sleeps[-1] == MAXIMUM_INTERVAL_S, sleeps
    assert sleeps == sorted(sleeps), f"interval must never shrink mid-ramp: {sleeps}"
    # loads: first tick unmeasurable (0), quiet ≈ 0.07, saturated = 1.0
    assert state["loads"][0] == 0.0
    assert state["loads"][1] == pytest.approx(0.07, abs=0.02)
    assert state["loads"][4] == 1.0

    # --- the sink: every post-first tick appended its delta row ---------
    qan = spark.read.parquet(qan_dir)
    rows = sorted(qan.collect(), key=lambda r: r["time"])
    assert len(rows) == len(RAMP) - 1  # T2: first tick emits nothing
    assert all(r["statement_digest"] == "d1" for r in rows)
    # reset-aware deltas reproduce the simulated increments exactly
    assert [r["calls_delta"] for r in rows] == [d for d, *_ in RAMP[1:]]
    assert all(r["total_timer_wait_delta"] == r["calls_delta"] * 120 for r in rows)
    # S9 layout: hour-grained partition columns survived the sink
    assert {"event_date", "event_hour"} <= set(qan.columns)
    assert rows[0]["event_hour"] == 9
