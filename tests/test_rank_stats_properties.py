"""Rank-statistics invariance properties (A64–A66) on CONTROLLED inputs.

The r10c python-recompute units pin the arithmetic on real testdata; these
pin the DEFINING properties of rank statistics — invariance under strictly
monotone transforms, sign symmetry, planted-shift detection — by feeding
hand-built event frames through the real operators (the fake-load pattern
from test_plan_shapes).  One event per (type, hour) keeps the hour-grid
sum equal to the event's cents, so a monotone transform of values IS a
monotone transform of the grid."""

from __future__ import annotations

import datetime as dt


def _events_df(spark, series: dict[str, list[float]], t0=None):
    """One event per (event_type, hour): grid y == cents(value) exactly."""
    t0 = t0 or dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for ty, vals in series.items():
        for h, v in enumerate(vals):
            rows.append((eid, eid, t0 + dt.timedelta(hours=h), ty, float(v)))
            eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )


def _with_load(mod, df, build):
    real = mod.load
    mod.load = lambda s, d, t: df
    try:
        return build()
    finally:
        mod.load = real


def test_kendall_perfect_concordance_and_reversal(spark):
    from project_obsidian_core_spark.plans import metrics_queries as mq

    up = [1.0, 2.0, 5.0, 7.0, 11.0, 13.0]
    down = list(reversed(up))
    df = _events_df(spark, {"a_up": up, "b_up": [x * 3 for x in up], "c_down": down})
    rows = {
        (r["metric_a"], r["metric_b"]): r
        for r in _with_load(
            mq, df, lambda: mq.metric_kendall_tau(spark, "u")
        ).collect()
    }
    # names map through the postgresql. prefix; recover by suffix
    by_suffix = {
        tuple(k.split(".")[-1] for k in key): v for key, v in rows.items()
    }
    assert by_suffix[("a_up", "b_up")]["tau_b"] == 1.0
    assert by_suffix[("a_up", "c_down")]["tau_b"] == -1.0
    assert by_suffix[("b_up", "c_down")]["tau_b"] == -1.0


def test_kendall_invariant_under_monotone_transform(spark):
    from project_obsidian_core_spark.plans import metrics_queries as mq

    a = [3.0, 1.0, 4.0, 1.5, 9.0, 2.0, 6.0]
    b = [2.0, 7.0, 1.0, 8.0, 2.5, 8.5, 0.5]
    base = _events_df(spark, {"a": a, "b": b})
    # strictly increasing map on one series: v -> 5v + 100 (cents stay exact)
    warped = _events_df(spark, {"a": [5 * v + 100 for v in a], "b": b})
    cols = [
        "n",
        "n0",
        "concordant",
        "discordant",
        "ties_a",
        "ties_b",
        "ties_both",
        "tau_b",
    ]
    r0 = _with_load(mq, base, lambda: mq.metric_kendall_tau(spark, "u")).collect()
    r1 = _with_load(mq, warped, lambda: mq.metric_kendall_tau(spark, "u")).collect()
    assert [[r[c] for c in cols] for r in r0] == [[r[c] for c in cols] for r in r1]


def test_pettitt_finds_planted_step_and_is_scale_invariant(spark):
    from project_obsidian_core_spark.plans import metrics_queries as mq

    series = [10.0] * 8 + [50.0] * 8  # clean level shift after hour 7
    base = _events_df(spark, {"m": series})
    row = _with_load(mq, base, lambda: mq.metric_pettitt(spark, "u")).collect()[0]
    # K_t peaks exactly at the boundary: every (left, right) pair is a +1
    assert row["last_hour_of_seg1"] % 24 == 7  # hour index within the day grid
    assert row["k_stat"] == 8 * 8
    assert row["k_signed"] == 64  # upward shift
    # rank statistics ignore scale: y -> 7y leaves every K_t unchanged
    scaled = _events_df(spark, {"m": [7 * v for v in series]})
    row2 = _with_load(mq, scaled, lambda: mq.metric_pettitt(spark, "u")).collect()[0]
    assert (row["k_signed"], row["k_stat"], row["last_hour_of_seg1"]) == (
        row2["k_signed"],
        row2["k_stat"],
        row2["last_hour_of_seg1"],
    )
    # downward shift flips the sign, not the magnitude
    flipped = _events_df(spark, {"m": list(reversed(series))})
    row3 = _with_load(mq, flipped, lambda: mq.metric_pettitt(spark, "u")).collect()[0]
    assert row3["k_signed"] == -64 and row3["k_stat"] == 64


def test_mannwhitney_invariant_under_monotone_transform(spark):
    from project_obsidian_core_spark.plans import analytics_ext_queries as axq

    t0 = dt.datetime(2024, 1, 1)
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]

    def mk(transform):
        rows = [
            (i, i, t0 + dt.timedelta(minutes=i), "x", float(transform(v)))
            for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, ["event_id", "user_id", "ts", "event_type", "value"]
        )

    keep = ["n_a", "n_b", "r_a_x2", "u_a_x2", "tie_term", "z"]
    r0 = _with_load(
        axq, mk(lambda v: v), lambda: axq.events_mannwhitney(spark, "u")
    ).collect()[0]
    # U depends only on ranks: any strictly increasing map fixes it
    r1 = _with_load(
        axq, mk(lambda v: 3 * v + 11), lambda: axq.events_mannwhitney(spark, "u")
    ).collect()[0]
    assert [r0[c] for c in keep] == [r1[c] for c in keep]
    # cohort swap (parity flip via user_id+1): U_A' = n_a·n_b − U_A, z negates
    rows_sw = [
        (i, i + 1, t0 + dt.timedelta(minutes=i), "x", float(v))
        for i, v in enumerate(vals)
    ]
    df_sw = spark.createDataFrame(
        rows_sw, ["event_id", "user_id", "ts", "event_type", "value"]
    )
    r2 = _with_load(
        axq, df_sw, lambda: axq.events_mannwhitney(spark, "u")
    ).collect()[0]
    assert (r2["n_a"], r2["n_b"]) == (r0["n_b"], r0["n_a"])
    assert r0["u_a_x2"] + r2["u_a_x2"] == 2 * r0["n_a"] * r0["n_b"]
    assert r2["tie_term"] == r0["tie_term"]
    assert abs(r2["z"] + r0["z"]) < 1e-12


def test_mannwhitney_clean_separation_hits_extremes(spark):
    from project_obsidian_core_spark.plans import analytics_ext_queries as axq

    t0 = dt.datetime(2024, 1, 1)
    # even users (cohort A) all BELOW odd users (cohort B): U_A = 0
    rows = [
        (i, i, t0 + dt.timedelta(minutes=i), "x",
         float(i % 2 * 1000 + i))
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    )
    r = _with_load(axq, df, lambda: axq.events_mannwhitney(spark, "u")).collect()[0]
    assert r["u_a_x2"] == 0
    assert r["z"] < 0
