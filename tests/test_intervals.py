"""Sweep-line interval concurrency semantics (operators/intervals.py):
end-exclusive ties, peer cumulative values, per-key isolation."""

from __future__ import annotations

from datetime import datetime

from project_obsidian_core_spark.operators.intervals import (
    interval_concurrency,
    interval_peaks,
)


def _iv(spark, rows):
    return spark.createDataFrame(
        [(k, datetime(2024, 1, 1, 0, s), datetime(2024, 1, 1, 0, e)) for k, s, e in rows],
        "k string, t0 timestamp, t1 timestamp",
    )


def test_peak_counts_overlaps(spark):
    # [0,10), [5,15), [12,20): first two overlap (peak 2), third only
    # touches the second -> never 3
    df = _iv(spark, [("a", 0, 10), ("a", 5, 15), ("a", 12, 20)])
    out = interval_peaks(df, ["k"], "t0", "t1").collect()
    assert [(r.k, r.n_intervals, r.peak_concurrent) for r in out] == [("a", 3, 2)]


def test_end_exclusive_tie_does_not_overlap(spark):
    # [0,5) and [5,10): the close at minute 5 applies BEFORE the open
    # ((t, delta) ordering), so back-to-back intervals never stack
    df = _iv(spark, [("a", 0, 5), ("a", 5, 10)])
    out = interval_peaks(df, ["k"], "t0", "t1").collect()
    assert out[0].peak_concurrent == 1


def test_keys_are_isolated_and_profile_is_cumulative(spark):
    df = _iv(spark, [("a", 0, 10), ("a", 2, 8), ("b", 0, 30)])
    prof = interval_concurrency(df, ["k"], "t0", "t1")
    a = sorted(
        ((r.t.minute, r.delta, r.concurrent) for r in prof.collect() if r.k == "a")
    )
    # opens at 0 (->1) and 2 (->2); closes at 8 (->1) and 10 (->0)
    assert a == [(0, 1, 1), (2, 1, 2), (8, -1, 1), (10, -1, 0)]
    b = [(r.n_intervals, r.peak_concurrent) for r in
         interval_peaks(df, ["k"], "t0", "t1").collect() if r.k == "b"]
    assert b == [(1, 1)]


def test_identical_intervals_share_one_peer_value(spark):
    # two identical intervals: the default RANGE frame gives both +1 peers
    # the same cumulative 2 — the peak is 2 in any engine's tie order
    df = _iv(spark, [("a", 0, 5), ("a", 0, 5)])
    out = interval_peaks(df, ["k"], "t0", "t1").collect()
    assert out[0].peak_concurrent == 2
