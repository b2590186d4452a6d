"""Golden tests for the snapshot-delta operator (SURVEY §5: delta branch
coverage — normal growth, counter reset, new digest, idle digest, first
snapshot emits nothing, multi-instance, Δt attachment).

Scenario matrix from FIXTURES.md §A1 / mysql/snapshot.go:159-239.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from project_obsidian_core_spark import schemas
from project_obsidian_core_spark.operators.delta import (
    compute_deltas,
    mysql_deltas,
    mysql_deltas_to_qan,
    pg_deltas,
)


def ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 12, minute, second)


def mysql_row(
    instance="mysql://db1:3306",
    snap=ts(0),
    digest="d1",
    count_star=0,
    sum_timer_wait=0,
    **over,
):
    base = {c: 0 for c in schemas.MYSQL_METRIC_COLS}
    base.update(count_star=count_star, sum_timer_wait=sum_timer_wait, **over)
    return {
        "instance_id": instance,
        "snapshot_ts": snap,
        "schema_name": "app",
        "digest": digest,
        "digest_text": f"SELECT {digest}",
        **base,
    }


def make_df(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.MYSQL_SNAPSHOT_SCHEMA)


def by_key(result):
    return {
        (r["instance_id"], r["digest"], r["snapshot_ts"]): r
        for r in (row.asDict() for row in result.collect())
    }


def test_normal_growth_delta(spark):
    rows = [
        mysql_row(snap=ts(0), count_star=10, sum_timer_wait=1000),
        mysql_row(snap=ts(1), count_star=15, sum_timer_wait=1800),
    ]
    out = by_key(mysql_deltas(make_df(spark, rows)))
    assert len(out) == 1
    r = out[("mysql://db1:3306", "d1", ts(1))]
    assert r["count_star_delta"] == 5
    assert r["sum_timer_wait_delta"] == 800
    assert r["time_period_seconds"] == 60.0


def test_first_snapshot_emits_nothing(spark):
    # T2: mysql/collector.go:82-85 — no previous snapshot -> no output
    rows = [mysql_row(snap=ts(0), count_star=100, sum_timer_wait=5000)]
    assert mysql_deltas(make_df(spark, rows)).count() == 0


def test_counter_reset_yields_current_value(spark):
    # T3: mysql/snapshot.go:199-214 — curr < prev -> delta = curr
    rows = [
        mysql_row(snap=ts(0), count_star=100, sum_timer_wait=9000),
        mysql_row(snap=ts(1), count_star=7, sum_timer_wait=300),
    ]
    out = by_key(mysql_deltas(make_df(spark, rows)))
    r = out[("mysql://db1:3306", "d1", ts(1))]
    assert r["count_star_delta"] == 7
    assert r["sum_timer_wait_delta"] == 300


def test_new_digest_emits_full_value(spark):
    # T4: mysql/snapshot.go:172-195 — absent from prev -> full value
    rows = [
        mysql_row(snap=ts(0), digest="d1", count_star=10),
        mysql_row(snap=ts(1), digest="d1", count_star=12),
        mysql_row(snap=ts(1), digest="dNEW", count_star=42, sum_timer_wait=777),
    ]
    out = by_key(mysql_deltas(make_df(spark, rows)))
    r = out[("mysql://db1:3306", "dNEW", ts(1))]
    assert r["count_star_delta"] == 42
    assert r["sum_timer_wait_delta"] == 777
    # Δt is the snapshot-level gap even for new digests (T5)
    assert r["time_period_seconds"] == 60.0


def test_gap_reappearance_is_new_key(spark):
    # T4 sparse history: a digest evicted from the scrape (absent at ts(1)
    # while the instance WAS scraped) then reappearing is a NEW key to the
    # reference SnapshotStore — full cumulative value, not a difference
    # across the gap (mysql/snapshot.go:172-195).
    rows = [
        mysql_row(snap=ts(0), digest="d1", count_star=10, sum_timer_wait=100),
        mysql_row(snap=ts(0), digest="d2", count_star=1),
        mysql_row(snap=ts(1), digest="d2", count_star=2),  # d1 evicted here
        mysql_row(snap=ts(2), digest="d1", count_star=50, sum_timer_wait=900),
        mysql_row(snap=ts(2), digest="d2", count_star=3),
    ]
    out = by_key(mysql_deltas(make_df(spark, rows)))
    r = out[("mysql://db1:3306", "d1", ts(2))]
    assert r["count_star_delta"] == 50  # NOT 40
    assert r["sum_timer_wait_delta"] == 900
    assert r["time_period_seconds"] == 60.0


def test_unscraped_instance_tick_is_not_a_gap(spark):
    # If the whole instance missed a tick, the previous scrape is simply
    # older — keys present in both scrapes still difference normally
    # (the SnapshotStore holds the last successful scrape, whenever it was).
    rows = [
        mysql_row(snap=ts(0), digest="d1", count_star=10),
        # instance entirely absent at ts(1)
        mysql_row(snap=ts(2), digest="d1", count_star=50),
    ]
    out = by_key(mysql_deltas(make_df(spark, rows)))
    r = out[("mysql://db1:3306", "d1", ts(2))]
    assert r["count_star_delta"] == 40
    assert r["time_period_seconds"] == 120.0


def test_batch_matches_reference_model_on_sparse_histories(spark):
    # Seeded-random sparse histories (evictions, resets, late digests,
    # multi-instance), all folded into ONE compute_deltas call and compared
    # to the Python reference model shared with the streaming property test.
    import datetime as dt
    import random

    from test_delta_equivalence import T0, _reference_model

    rng = random.Random(20260813)
    history = {}
    for case in range(40):
        inst = f"case{case}_i{rng.randint(1, 2)}"
        for dg in ["qa", "qb", "qc"][: rng.randint(1, 3)]:
            vals = [
                None if rng.random() < 0.35 else rng.randint(0, 1000)
                for _ in range(rng.randint(2, 6))
            ]
            history[(inst, dg)] = vals

    rows = [
        mysql_row(
            instance=inst,
            snap=T0 + dt.timedelta(minutes=t),
            digest=dg,
            count_star=v,
        )
        for (inst, dg), vals in history.items()
        for t, v in enumerate(vals)
        if v is not None
    ]
    got = {
        (r["instance_id"], r["digest"],
         int((r["snapshot_ts"] - T0).total_seconds() // 60),
         int(r["count_star_delta"]), float(r["time_period_seconds"]))
        for r in mysql_deltas(make_df(spark, rows)).collect()
    }
    assert got == _reference_model(history)


def test_idle_digest_dropped(spark):
    # P3: mysql/snapshot.go:207 — zero calls delta -> not emitted
    rows = [
        mysql_row(snap=ts(0), count_star=10, sum_timer_wait=100),
        mysql_row(snap=ts(1), count_star=10, sum_timer_wait=100),
    ]
    assert mysql_deltas(make_df(spark, rows)).count() == 0


def test_multi_instance_independent_state(spark):
    rows = [
        mysql_row(instance="i1", snap=ts(0), count_star=10),
        mysql_row(instance="i1", snap=ts(1), count_star=20),
        # i2's first snapshot arrives at ts(1): nothing emitted for it
        mysql_row(instance="i2", snap=ts(1), count_star=99),
    ]
    out = by_key(mysql_deltas(make_df(spark, rows)))
    assert set(out) == {("i1", "d1", ts(1))}
    assert out[("i1", "d1", ts(1))]["count_star_delta"] == 10


def test_varying_interval_metadata(spark):
    rows = [
        mysql_row(snap=ts(0), count_star=1),
        mysql_row(snap=ts(0, 30), count_star=2),
        mysql_row(snap=ts(2, 30), count_star=4),
    ]
    out = by_key(mysql_deltas(make_df(spark, rows)))
    assert out[("mysql://db1:3306", "d1", ts(0, 30))]["time_period_seconds"] == 30.0
    assert out[("mysql://db1:3306", "d1", ts(2, 30))]["time_period_seconds"] == 120.0


def test_null_digest_rows_dropped(spark):
    # P2: mysql/collector.go:184-186
    rows = [
        mysql_row(snap=ts(0), count_star=1),
        mysql_row(snap=ts(1), count_star=5),
        dict(mysql_row(snap=ts(1), count_star=3), digest=None),
    ]
    out = by_key(mysql_deltas(make_df(spark, rows)))
    assert set(k[1] for k in out) == {"d1"}


def test_pg_deltas_double_metrics(spark):
    rows = [
        {
            "instance_id": "pg://db:5432",
            "snapshot_ts": ts(0),
            "query_id": "q1",
            "user_id": "u",
            "db_id": "d",
            "query": "SELECT 1",
            **{c: 0 for c in schemas.PG_LONG_METRIC_COLS},
            **{c: 0.0 for c in schemas.PG_DOUBLE_METRIC_COLS},
            "calls": 10,
            "total_exec_time": 100.0,
        },
        {
            "instance_id": "pg://db:5432",
            "snapshot_ts": ts(1),
            "query_id": "q1",
            "user_id": "u",
            "db_id": "d",
            "query": "SELECT 1",
            **{c: 0 for c in schemas.PG_LONG_METRIC_COLS},
            **{c: 0.0 for c in schemas.PG_DOUBLE_METRIC_COLS},
            "calls": 25,
            "total_exec_time": 350.5,
        },
    ]
    from project_obsidian_core_spark.schemas import PG_SNAPSHOT_SCHEMA

    df = spark.createDataFrame(rows, schema=PG_SNAPSHOT_SCHEMA)
    out = [r.asDict() for r in pg_deltas(df).collect()]
    assert len(out) == 1
    assert out[0]["calls_delta"] == 15
    assert out[0]["total_exec_time_delta"] == pytest.approx(250.5)


def test_qan_shaping_wide_union_schema(spark):
    rows = [
        mysql_row(snap=ts(0), count_star=10, sum_timer_wait=1000),
        mysql_row(snap=ts(1), count_star=15, sum_timer_wait=1800),
    ]
    qan = mysql_deltas_to_qan(mysql_deltas(make_df(spark, rows)))
    assert [f.name for f in qan.schema.fields] == [
        f.name for f in schemas.QAN_DB_SCHEMA.fields
    ]
    row = qan.collect()[0].asDict()
    assert row["db_system"] == "mysql"
    assert row["calls_delta"] == 5
    assert row["total_timer_wait_delta"] == 800
    assert row["total_exec_time_delta"] is None  # PG-only column is null
    assert row["statement_sample"] == "SELECT d1"


def test_generic_compute_deltas_carry_and_keys(spark):
    # compute_deltas is the building block — check carry columns survive
    rows = [
        mysql_row(snap=ts(0), count_star=1),
        mysql_row(snap=ts(1), count_star=2),
    ]
    out = compute_deltas(
        make_df(spark, rows),
        key_cols=["digest"],
        metric_cols=["count_star"],
        carry_cols=["digest_text"],
    ).collect()
    assert out[0]["digest_text"] == "SELECT d1"
