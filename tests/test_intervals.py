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


# ------------------------------------------------------- interval_merge ---
def _iv_df(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (k, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=e))
        for k, s, e in rows
    ]
    return spark.createDataFrame(data, "k string, s timestamp, e timestamp")


def test_interval_merge_overlap_touch_and_gap(spark):
    from project_obsidian_core_spark.operators.intervals import interval_merge

    rows = [
        ("a", 0, 10),
        ("a", 5, 12),    # overlaps -> same island
        ("a", 12, 20),   # touches island end -> NOT a new island (start !> max)
        ("a", 25, 30),   # gap -> new island
        ("b", 0, 1),     # other key isolated
    ]
    out = interval_merge(_iv_df(spark, rows), ["k"], "s", "e").collect()
    byk = {}
    for r in out:
        byk.setdefault(r["k"], []).append(r)
    a = sorted(byk["a"], key=lambda r: r["island_id"])
    assert len(a) == 2
    assert a[0]["n_intervals"] == 3
    assert a[0]["covered_us"] == 20 * 60 * 1_000_000
    assert a[1]["n_intervals"] == 1
    assert len(byk["b"]) == 1


def test_interval_merge_contained_interval(spark):
    from project_obsidian_core_spark.operators.intervals import interval_merge

    # an interval fully inside another must not split the island even
    # though its end is EARLIER than the running span end
    rows = [("a", 0, 100), ("a", 10, 20), ("a", 30, 40), ("a", 150, 160)]
    out = sorted(
        interval_merge(_iv_df(spark, rows), ["k"], "s", "e").collect(),
        key=lambda r: r["island_id"],
    )
    assert [r["n_intervals"] for r in out] == [3, 1]


def test_interval_merge_single_exchange(spark):
    from project_obsidian_core_spark.operators.intervals import interval_merge

    df = _iv_df(spark, [("a", 0, 1)])
    plan = (
        interval_merge(df, ["k"], "s", "e")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
