"""End-to-end QAN pipeline: snapshots → deltas → qan_db rollup write →
read-back → every analytics entry point (SURVEY §3.1 + §3.3).

Mirrors the reference's e2e flow (test/integration/e2e_test.py:48-613):
two snapshot ticks with a known workload between them, then assert the
analytics surface sees exactly that workload.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark import schemas
from project_obsidian_core_spark.analytics import metrics as AM
from project_obsidian_core_spark.analytics import qan as AQ
from project_obsidian_core_spark.operators import delta as OD
from project_obsidian_core_spark.operators import rollup as OR

T0 = dt.datetime(2026, 3, 1, 10, 0, 0)
T1 = T0 + dt.timedelta(seconds=60)

PS = 1_000_000_000_000  # 1 second in picoseconds


def _mysql_snapshot(ts, digests):
    """digests: {digest: (count_star, timer_ps, rows_examined, tmp_disk)}"""
    rows = []
    for dg, (calls, timer, rex, tmpd) in digests.items():
        rows.append(
            (
                "my-1", ts, "shop", dg, f"SELECT /*{dg}*/ * FROM t",
                calls, timer, 0, 0, 0, 0, calls, rex, 0, tmpd, 0, 0, 0,
            )
        )
    return rows


@pytest.fixture(scope="module")
def qan_path(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("qan_db")
    snaps = spark.createDataFrame(
        _mysql_snapshot(T0, {"dA": (100, 50 * PS, 1000, 0), "dB": (10, 5 * PS, 50, 2)})
        + _mysql_snapshot(
            T1,
            {
                "dA": (160, 80 * PS, 1600, 0),   # +60 calls, +30s, +600 rows
                "dB": (10, 5 * PS, 50, 2),       # idle -> dropped (P3)
                "dC": (7, 14 * PS, 70, 1),       # new digest (T4)
            },
        ),
        schemas.MYSQL_SNAPSHOT_SCHEMA,
    )
    qan = OD.mysql_deltas_to_qan(OD.mysql_deltas(snaps))
    OR.write_qan(qan, str(tmp), mode="overwrite")
    return str(tmp)


@pytest.fixture(scope="module")
def qan(spark, qan_path):
    return spark.read.parquet(qan_path)


def test_rollup_written_hour_partitioned(qan_path, spark):
    # segmentGranularity=HOUR -> physical partition dirs exist
    import os
    assert any("event_date=" in d for d in os.listdir(qan_path))
    df = spark.read.parquet(qan_path)
    assert {r["event_hour"] for r in df.select("event_hour").distinct().collect()} == {10}


def test_delta_semantics_survive_roundtrip(qan):
    rows = {r["statement_digest"]: r for r in qan.collect()}
    assert set(rows) == {"dA", "dC"}            # dB idle -> dropped
    assert rows["dA"]["calls_delta"] == 60
    assert rows["dA"]["total_timer_wait_delta"] == 30 * PS
    assert rows["dC"]["calls_delta"] == 7       # new digest full value
    assert rows["dA"]["time_period_seconds"] == pytest.approx(60.0)
    assert rows["dA"]["db_system"] == "mysql"


def test_top_queries(qan):
    top = AQ.top_queries(qan, "mysql", limit=2).collect()
    assert [r["query_identity"] for r in top] == ["dA", "dC"]  # by timer desc
    a = top[0]
    assert a["total_calls"] == 60
    assert a["avg_metric_per_call"] == pytest.approx(30 * PS / 60)


def test_top_queries_sample_filter(qan):
    got = AQ.top_queries(qan, "mysql", sample_filter="dC").collect()
    assert [r["query_identity"] for r in got] == ["dC"]


def test_query_trend(qan):
    trend = AQ.query_trend(qan, "dA", "mysql").collect()
    assert len(trend) == 1
    assert trend[0]["total_calls"] == 60


def test_top_by_multiple_metrics(qan):
    out = AQ.top_by_multiple_metrics(qan, "mysql", limit=2).collect()
    by_metric = {}
    for r in out:
        by_metric.setdefault(r["metric"], []).append((r["rank"], r["query_identity"]))
    assert by_metric["exec_time"] == [(1, "dA"), (2, "dC")]
    assert by_metric["rows_examined"] == [(1, "dA"), (2, "dC")]
    # dA never created tmp disk tables; dC did
    assert by_metric["temp_disk_tables"][0] == (1, "dC")


def test_compare_systems(qan):
    out = {r["db_system"]: r for r in AQ.compare_systems(qan).collect()}
    assert out["mysql"]["record_count"] == 2
    assert out["mysql"]["unique_queries"] == 2
    assert out["mysql"]["total_calls"] == 67


def test_metrics_surface(spark):
    rows = []
    for minute in range(3):
        ts = T0 + dt.timedelta(minutes=minute)
        rows += [
            (ts, "pg-1", "postgresql", "postgresql.blocks_hit", {"db": "shop"}, 90.0, 90.0, 90.0),
            (ts, "pg-1", "postgresql", "postgresql.blocks_read", {"db": "shop"}, 10.0, 10.0, 10.0),
        ]
    m = spark.createDataFrame(rows, schemas.METRICS_DB_SCHEMA)

    disc = AM.distinct_metrics(m).collect()
    assert [r["metric_name"] for r in disc] == [
        "postgresql.blocks_hit", "postgresql.blocks_read"
    ]

    ratio = AM.buffer_hit_ratio(m).collect()
    assert all(r["hit_ratio"] == pytest.approx(0.9) for r in ratio)
    assert len(ratio) == 3  # one per minute bucket

    series = AM.metric_series(m, ["postgresql.blocks_hit"]).collect()
    assert all(r["avg_value"] == pytest.approx(90.0) for r in series)


def test_metrics_rollup_dedups_to_second(spark):
    ts = T0
    rows = [
        (ts, "i1", "mysql", "mysql.questions", {"a": "1"}, 5.0, 7.0, 3.0),
        (ts, "i1", "mysql", "mysql.questions", {"a": "1"}, 6.0, 9.0, 2.0),
        (ts, "i1", "mysql", "mysql.questions", {"a": "2"}, 1.0, 1.0, 1.0),
    ]
    m = spark.createDataFrame(rows, schemas.METRICS_DB_SCHEMA)
    out = OR.metrics_rollup(m).collect()
    assert len(out) == 2  # labels maps distinguish groups
    g = next(r for r in out if r["metric_labels"] == {"a": "1"})
    assert g["metric_value"] == 11.0 and g["metric_max"] == 9.0 and g["metric_min"] == 2.0


def test_approx_count_distinct_accuracy(spark):
    from project_obsidian_core_spark.plans.qan_queries import qan_unique_queries_hll
    from project_obsidian_core_spark.plans.common import load as _load

    sf = "/root/testdata/sf0.001"
    approx = {r["db_system"]: r["unique_queries_approx"]
              for r in qan_unique_queries_hll(spark, sf).collect()}
    ev = _load(spark, sf, "events")
    exact = {
        r["db_system"]: r["n"]
        for r in ev.withColumn(
            "db_system",
            F.when(F.col("user_id") % 2 == 0, F.lit("mysql")).otherwise(F.lit("postgresql")),
        )
        .groupBy("db_system")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    for sys_name, n in exact.items():
        assert abs(approx[sys_name] - n) <= max(1, 0.05 * n)


def test_approx_percentile_accuracy(spark):
    """The sketch quantile twin guarantees RANK error (not value error —
    a heavy tail can put adjacent ranks far apart in value space), so the
    pin is rank-based: each approx quantile must sit within 2 percentage
    points of its target rank in the exact per-group value distribution."""
    from project_obsidian_core_spark.plans.analytics_ext_queries import (
        qan_latency_quantiles_approx,
    )
    from project_obsidian_core_spark.plans.common import cents, load as _load

    sf = "/root/testdata/sf0.001"
    approx = {
        r["event_type"]: r for r in qan_latency_quantiles_approx(spark, sf).collect()
    }
    vals = {}
    for r in (
        _load(spark, sf, "events")
        .select("event_type", cents("value").alias("c"))
        .collect()
    ):
        vals.setdefault(r["event_type"], []).append(r["c"])
    assert set(vals) == set(approx)
    for et, a in approx.items():
        xs = sorted(vals[et])
        assert a["n"] == len(xs)
        for p, target in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            got = float(a[p])
            rank = sum(1 for x in xs if x <= got) / len(xs)
            assert abs(rank - target) <= 0.02, (et, p, got, rank, target)
