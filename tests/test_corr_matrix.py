"""A37 exact Pearson correlation — numpy golden and edge cases."""

from __future__ import annotations

import datetime

import numpy as np

from project_obsidian_core_spark.plans import metrics_queries as mq


def _run(spark, series):
    """series: {metric: [(epoch_s, cents), ...]} via the events mapping
    (view -> HIT metric, click -> READ metric)."""
    rows = []
    ev_type = {"a": "view", "b": "click"}
    for name, pts in series.items():
        for t, c in pts:
            rows.append(
                (datetime.datetime.utcfromtimestamp(t), 1, ev_type[name], c / 100.0)
            )
    df = spark.createDataFrame(rows, ["ts", "user_id", "event_type", "value"])
    df = df.selectExpr(
        "ts", "cast(user_id as bigint) as user_id", "event_type", "value"
    )
    real_load = mq.load
    mq.load = lambda s, d, t: df
    try:
        return mq.metric_corr_matrix(spark, "unused").collect()
    finally:
        mq.load = real_load


def test_corr_matches_numpy(spark):
    # the statistic is defined on dollar-quantized centered bucket sums:
    # mirror the (y - min) // 100 in the numpy reference
    t0 = 1_700_000_000
    a = [(t0 + i * 60, 100_000 + 1300 * i + (i % 5) * 700) for i in range(40)]
    b = [(t0 + i * 60, 500_000 - 900 * i + (i % 3) * 2100) for i in range(40)]
    (r,) = _run(spark, {"a": a, "b": b})
    q = lambda v: (v - v.min()) // 100  # noqa: E731
    ya = q(np.array([c for _, c in a], dtype=np.int64)).astype(float)
    yb = q(np.array([c for _, c in b], dtype=np.int64)).astype(float)
    want = np.corrcoef(ya, yb)[0, 1]
    assert abs(r.corr - want) < 1e-12
    assert r.n == 40


def test_perfectly_linear_gives_exact_pm_one(spark):
    # multiples of 100 cents: dollar quantization is lossless here
    t0 = 1_700_000_000
    a = [(t0 + i * 60, 10_000 + 200 * i) for i in range(10)]
    b_pos = [(t0 + i * 60, 50_000 + 600 * i) for i in range(10)]
    (r,) = _run(spark, {"a": a, "b": b_pos})
    # integer moments make the +-1 case exact: num^2 == dx*dy
    assert r.corr_num**2 == r.var_a_num * r.var_b_num
    assert abs(r.corr - 1.0) < 1e-15


def test_constant_series_yields_null_corr(spark):
    t0 = 1_700_000_000
    a = [(t0 + i * 60, 777) for i in range(5)]
    b = [(t0 + i * 60, 100 + i) for i in range(5)]
    (r,) = _run(spark, {"a": a, "b": b})
    assert r.var_a_num == 0 and r.corr is None
