"""A35 exact KS two-sample statistic — golden vectors and invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ks(spark, rows):
    """Run the same plan as the gate query over explicit rows."""
    from project_obsidian_core_spark.plans import analytics_ext_queries as ax

    df = spark.createDataFrame(rows, ["event_type", "user_id", "value"])

    # reuse the query body by monkey-loading through a temp view is
    # overkill; the plan is small enough to re-derive with the module's
    # own helper expressions via a direct call path:
    import types

    fake_load = lambda s, d, t: df  # noqa: E731
    real_load = ax.load
    ax.load = fake_load
    try:
        out = ax.events_ks_test(spark, "unused").collect()
    finally:
        ax.load = real_load
    return {r.event_type: r for r in out}


def test_identical_cohorts_give_zero(spark):
    rows = []
    for v in [1.0, 2.0, 3.0, 4.0]:
        rows.append(("m", 0, v))  # cohort A (even user)
        rows.append(("m", 1, v))  # cohort B (odd user)
    r = _ks(spark, rows)["m"]
    assert (r.n_a, r.n_b, r.ks_num, r.ks_ppm) == (4, 4, 0, 0)


def test_disjoint_cohorts_give_full_separation(spark):
    rows = [("m", 0, float(v)) for v in (1, 2, 3)] + [
        ("m", 1, float(v)) for v in (10, 20, 30)
    ]
    r = _ks(spark, rows)["m"]
    # D = 1.0 exactly: at value 3 the A-CDF is 1, B-CDF is 0
    assert r.ks_num == r.n_a * r.n_b == 9
    assert r.ks_ppm == 1_000_000


def test_golden_mixed_vector(spark):
    # A = {1, 2, 4}, B = {2, 3}: steps over sorted distinct values
    #   v=1: Fa=1/3, Fb=0    -> |1*2 - 0*3| = 2
    #   v=2: Fa=2/3, Fb=1/2  -> |2*2 - 1*3| = 1
    #   v=3: Fa=2/3, Fb=1    -> |2*2 - 2*3| = 2
    #   v=4: Fa=1,   Fb=1    -> 0
    # D_num = 2, n_a*n_b = 6 -> ks_ppm = 333333
    rows = [("m", 0, 1.0), ("m", 0, 2.0), ("m", 0, 4.0), ("m", 1, 2.0), ("m", 1, 3.0)]
    r = _ks(spark, rows)["m"]
    assert (r.n_a, r.n_b, r.ks_num, r.ks_ppm) == (3, 2, 2, 333_333)


def test_types_are_isolated(spark):
    rows = [("x", 0, 1.0), ("x", 1, 9.0), ("y", 0, 5.0), ("y", 1, 5.0)]
    out = _ks(spark, rows)
    assert out["x"].ks_ppm == 1_000_000
    assert out["y"].ks_ppm == 0
