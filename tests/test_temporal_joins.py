"""As-of / range join semantics on hand-built fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.operators import temporal_joins as TJ


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(5)),   # after the ts(3) ref -> picks 30
            (2, 10, _ts(3)),   # exactly at the ref -> <= includes it
            (3, 10, _ts(1)),   # before any ref -> nulls
            (4, 20, _ts(9)),   # other key -> that key's ref only
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, _ts(2), 20),
            (10, _ts(3), 30),
            (20, _ts(4), 77),
        ],
        ["user_id", "ts", "v"],
    )
    return left, right


def test_asof_semantics(sides):
    left, right = sides
    out = {
        r["event_id"]: r.asDict()
        for r in TJ.asof_join(left, right, on="user_id", value_cols=("v",)).collect()
    }
    assert out[1]["asof_v"] == 30 and out[1]["asof_ts"] == _ts(3)
    assert out[2]["asof_v"] == 30  # simultaneous reference is visible (<=)
    assert out[3]["asof_v"] is None and out[3]["asof_ts"] is None  # left outer
    assert out[4]["asof_v"] == 77  # keys never bleed across partitions
    assert len(out) == 4


def test_asof_join_plans_single_shuffle(sides):
    left, right = sides
    plan = (
        TJ.asof_join(left, right, on="user_id", value_cols=("v",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one window pass, no nested-loop join anywhere
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_bounds_and_binning(spark):
    # span 60s, bin 60s: anchor at :02:00 must see probes in (:01:00, :02:00]
    anchors = spark.createDataFrame(
        [(1, 10, _ts(2))], ["event_id", "user_id", "ts"]
    )
    probes = spark.createDataFrame(
        [
            (10, _ts(1), 100),                      # exactly span before -> excluded (>)
            (10, dt.datetime(2024, 1, 1, 0, 1, 1), 200),  # inside
            (10, _ts(2), 300),                      # at anchor -> included (<=)
            (10, _ts(3), 400),                      # after -> excluded
            (99, dt.datetime(2024, 1, 1, 0, 1, 30), 500),  # other key
        ],
        ["user_id", "ts", "v"],
    )
    pairs = TJ.range_join(anchors, probes, on="user_id", span_us=60_000_000)
    got = sorted(r["probe_v"] for r in pairs.collect())
    assert got == [200, 300]


def test_range_join_fanout_is_constant(spark):
    # bin = span -> every anchor explodes into exactly 2 bin rows
    anchors = spark.createDataFrame(
        [(i, 1, _ts(i % 50)) for i in range(20)], ["event_id", "user_id", "ts"]
    )
    probes = spark.createDataFrame([(1, _ts(0), 0)], ["user_id", "ts", "v"])
    pairs = TJ.range_join(anchors, probes, on="user_id", span_us=60_000_000)
    assert "CartesianProduct" not in pairs._jdf.queryExecution().executedPlan().toString()


def test_range_join_nondivisible_bin_width(spark):
    # span=5min, bin=2min: the per-anchor bin range must cover bin(a-span)
    # .. bin(a) inclusive (a fixed span//bin+1 count loses boundary pairs)
    anchors = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1, 0, 10, 0))], ["event_id", "user_id", "ts"]
    )
    probes = spark.createDataFrame(
        [(10, dt.datetime(2024, 1, 1, 0, 10, 0), 1),   # at anchor, bin 5
         (10, dt.datetime(2024, 1, 1, 0, 6, 0), 2),    # inside, bin 3
         (10, dt.datetime(2024, 1, 1, 0, 5, 1), 3)],   # just inside, bin 2
        ["user_id", "ts", "v"],
    )
    pairs = TJ.range_join(
        anchors, probes, on="user_id", span_us=300_000_000, bin_us=120_000_000
    )
    assert sorted(r["probe_v"] for r in pairs.collect()) == [1, 2, 3]


def test_asof_null_value_in_matched_row_not_substituted(spark):
    # the matched right row's NULL value must surface as NULL, not be
    # backfilled from an older row (DuckDB ASOF semantics)
    left = spark.createDataFrame([(1, 10, _ts(3))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(10, _ts(1), 5), (10, _ts(2), None)], ["user_id", "ts", "v"]
    )
    out = TJ.asof_join(left, right, on="user_id", value_cols=("v",)).collect()[0]
    assert out["asof_ts"] == _ts(2)
    assert out["asof_v"] is None  # the ts=2 row's actual (null) value
