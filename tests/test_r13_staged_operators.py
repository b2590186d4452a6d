"""Units for the round-13 STAGED operators (A84/A85 — queued in
scripts/check_queued.py for r14 registration; the oracle gate at both
SFs is the primary proof, these pin the semantic invariants)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_seasonal_decompose_invariants(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_seasonal_decompose,
    )

    rows = metric_seasonal_decompose(spark, SF).collect()
    assert rows
    by_metric_hod = {}
    for r in rows:
        # detrended value exists exactly where the 25-row window is full,
        # and equals the exact-int identity
        if r["n_win"] == 25:
            assert r["detr25"] == 25 * r["v"] - r["trend_sum25"]
        else:
            assert r["detr25"] is None
        assert 0 <= r["hod"] < 24 and r["hod"] == r["bucket"] % 24
        by_metric_hod.setdefault((r["metric_name"], r["hod"]), []).append(r)
    # seasonal is the mean of detr25/25 over that (metric, hod)'s full
    # windows — recompute in python doubles (same one-division chain)
    checked = 0
    for (mname, hod), rs in by_metric_hod.items():
        detr = [r["detr25"] for r in rs if r["detr25"] is not None]
        seas = {r["seasonal"] for r in rs}
        assert len(seas) == 1  # constant per (metric, hod)
        s = seas.pop()
        if detr:
            assert s == float(sum(detr)) / (25.0 * len(detr))
            checked += 1
        else:
            assert s is None
    assert checked


def test_cohort_ltv_invariants(spark):
    from project_obsidian_core_spark.plans.relational_queries import (
        customer_cohort_ltv,
    )

    rows = customer_cohort_ltv(spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_ym"], []).append(r)
    for ym, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_months"])
        # age 0 exists (the cohort's first order IS age 0) and the
        # cumulative sum telescopes the period sums
        assert rs[0]["age_months"] == 0
        cum = 0
        for r in rs:
            cum += r["cents_sum"]
            assert r["cum_cents"] == cum
            assert 0 < r["n_active"] <= r["cohort_size"]
            # integer-division LTV brackets the exact ratio
            q = r["ltv_cents_per_cust"]
            assert q * r["cohort_size"] <= cum < (q + 1) * r["cohort_size"]
        # every cohort member is active at age 0
        assert rs[0]["n_active"] == rs[0]["cohort_size"]
