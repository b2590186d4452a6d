"""A36 exact OLS trend slope — golden vectors against numpy.polyfit."""

from __future__ import annotations

import datetime

import numpy as np

from project_obsidian_core_spark.plans import metrics_queries as mq


def _run(spark, rows):
    """rows: (metric_name, epoch_s, cents) -> {name: Row}."""
    df = spark.createDataFrame(
        [
            (
                datetime.datetime.utcfromtimestamp(t),
                str(1),
                "view" if name == "a" else "click",
                c / 100.0,
            )
            for name, t, c in rows
        ],
        ["ts", "_uid", "event_type", "value"],
    ).selectExpr(
        "ts", "cast(_uid as bigint) as user_id", "event_type", "value",
        "cast(1 as bigint) as event_id", "'{}' as props",
    )
    real_load = mq.load
    mq.load = lambda s, d, t: df
    try:
        out = mq.metric_trend_slope(spark, "unused").collect()
    finally:
        mq.load = real_load
    return {r.metric_name: r for r in out}


def test_slope_matches_numpy_polyfit(spark):
    # minute-spaced samples: the regression is defined on minute indices
    t0 = 1_700_000_000
    rows = [("a", t0 + i * 60, 1000 + 7 * i + (i % 3) * 11) for i in range(50)]
    got = _run(spark, rows)
    (r,) = got.values()
    x = np.array([t // 60 for _, t, _ in rows], dtype=float)
    y = np.array([c for _, _, c in rows], dtype=float)
    want = np.polyfit(x, y, 1)[0] * 60  # cents/minute -> cents/hour
    assert abs(r.slope_cents_per_hour - want) < 1e-6 * abs(want)
    assert r.n == 50


def test_exact_linear_series_is_exact(spark):
    # y = 120 cents/minute exactly -> 7200 cents/hour, num/den exact ints
    t0 = 1_700_000_000
    rows = [("a", t0 + i * 60, 500 + 120 * i) for i in range(10)]
    (r,) = _run(spark, rows).values()
    assert r.slope_num * 60 == 7200 * r.slope_den
    assert r.slope_cents_per_hour == 7200.0


def test_constant_time_group_yields_null_slope(spark):
    rows = [("a", 1_700_000_000, c) for c in (100, 200, 300)]
    (r,) = _run(spark, rows).values()
    assert r.slope_den == 0 and r.slope_cents_per_hour is None
