"""A38 discovery timeline — hand-traced curves and tie rules."""

from __future__ import annotations

import datetime

from project_obsidian_core_spark.plans import behavior_queries as bq


def _run(spark, rows):
    """rows: (user_id, epoch_s, event_type, event_id)."""
    df = spark.createDataFrame(
        [
            (eid, datetime.datetime.utcfromtimestamp(t), u, et, 0.0, "{}")
            for u, t, et, eid in rows
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    real_load = bq.load
    bq.load = lambda s, d, t: df
    try:
        return bq.events_discovery_timeline(spark, "unused").collect()
    finally:
        bq.load = real_load


def test_ranks_follow_first_occurrence_order(spark):
    t0 = 1_700_000_000
    rows = [
        (1, t0 + 10, "view", 1),
        (1, t0 + 20, "click", 2),
        (1, t0 + 30, "view", 3),      # repeat: not a discovery
        (1, t0 + 40, "purchase", 4),
        (2, t0 + 5, "purchase", 5),
    ]
    out = {(r.user_id, r.event_type): r for r in _run(spark, rows)}
    assert out[(1, "view")].discovery_rank == 1
    assert out[(1, "click")].discovery_rank == 2
    assert out[(1, "purchase")].discovery_rank == 3
    assert out[(1, "view")].first_event_id == 1  # not the repeat's id
    assert out[(2, "purchase")].discovery_rank == 1


def test_same_timestamp_ties_break_by_event_id(spark):
    t0 = 1_700_000_000
    rows = [
        (1, t0, "b_type", 9),
        (1, t0, "a_type", 3),  # same instant, smaller event_id -> rank 1
    ]
    out = {r.event_type: r.discovery_rank for r in _run(spark, rows)}
    assert out == {"a_type": 1, "b_type": 2}


def test_breakpoints_are_one_per_user_type(spark):
    t0 = 1_700_000_000
    rows = [(1, t0 + i, "view", i) for i in range(50)]
    got = _run(spark, rows)
    assert len(got) == 1 and got[0].discovery_rank == 1
