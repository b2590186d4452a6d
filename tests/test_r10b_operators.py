"""Round-10b operator units: independent python recomputation for the
Q19-bracket revenue, purchase-cadence gaps, Fano burstiness, Simpson
diversity, signed-lag cross-correlation and the days-to-threshold
forecast (oracle gates prove cross-engine exactness; these pin SEMANTICS
against references built from raw collected rows)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_disjunctive_revenue_matches_python(spark):
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.relational_queries import (
        lineitem_disjunctive_revenue,
    )

    part = {
        r["p_partkey"]: (r["p_brand"], r["p_size"])
        for r in load(spark, SF, "part").collect()
    }
    ref: dict[str, list[int]] = {}
    for r in load(spark, SF, "lineitem").collect():
        brand, size = part[r["l_partkey"]]
        q = r["l_quantity"]
        rev = round(r["l_extendedprice"] * 100) * (
            100 - round(r["l_discount"] * 100)
        )
        if brand == "Brand#5" and 1 <= size <= 10 and 1 <= q <= 11:
            lab = "B1"
        elif brand == "Brand#13" and 1 <= size <= 20 and 10 <= q <= 20:
            lab = "B2"
        elif brand == "Brand#19" and 1 <= size <= 35 and 20 <= q <= 30:
            lab = "B3"
        else:
            continue
        agg = ref.setdefault(lab, [0, 0])
        agg[0] += 1
        agg[1] += rev
    got = {r["bracket"]: r for r in lineitem_disjunctive_revenue(spark, SF).collect()}
    assert set(got) == set(ref)
    for lab, (n, rev) in ref.items():
        assert got[lab]["n_lines"] == n
        assert got[lab]["revenue_e4"] == rev
        assert got[lab]["revenue"] == rev / 10000.0


def test_order_gaps_matches_python(spark):
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.relational_queries import (
        customer_order_gaps,
    )

    rows = load(spark, SF, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    ).collect()
    by_cust: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append((r["day"], r["o_orderkey"]))
    ref: dict[int, list] = {}
    for cust, seq in by_cust.items():
        seq.sort()
        for (d0, _), (d1, _) in zip(seq, seq[1:]):
            gap = d1 - d0
            binned = gap // 7
            agg = ref.setdefault(binned, [0, set(), 0])
            agg[0] += 1
            agg[1].add(cust)
            agg[2] += gap
    got = {r["gap_weeks"]: r for r in customer_order_gaps(spark, SF).collect()}
    assert set(got) == set(ref)
    for b, (n, custs, sd) in ref.items():
        assert got[b]["n_gaps"] == n
        assert got[b]["n_customers"] == len(custs)
        assert got[b]["sum_gap_days"] == sd
        assert got[b]["mean_gap_days"] == sd / n


def test_burstiness_matches_explicit_zero_grid(spark):
    """Independent check of the span algebra: materialize the FULL minute
    grid with explicit zeros and compute var/mean directly."""
    from project_obsidian_core_spark.plans.behavior_queries import (
        events_burstiness,
    )
    from project_obsidian_core_spark.plans.common import load

    rows = load(spark, SF, "events").select(
        "event_type", F.expr("unix_micros(ts) div 60000000").alias("minute")
    ).collect()
    counts: dict[str, dict[int, int]] = {}
    for r in rows:
        counts.setdefault(r["event_type"], {})
        counts[r["event_type"]][r["minute"]] = (
            counts[r["event_type"]].get(r["minute"], 0) + 1
        )
    got = {r["event_type"]: r for r in events_burstiness(spark, SF).collect()}
    assert set(got) == set(counts)
    for t, per_min in counts.items():
        lo, hi = min(per_min), max(per_min)
        grid = [per_min.get(b, 0) for b in range(lo, hi + 1)]
        n = sum(grid)
        span = len(grid)
        mean = n / span
        var = sum(c * c for c in grid) / span - mean * mean
        r = got[t]
        assert r["n_events"] == n
        assert r["span_min"] == span
        assert r["n_active_min"] == sum(1 for c in grid if c)
        assert math.isclose(r["fano"], var / mean, rel_tol=1e-12)


def test_user_diversity_matches_python(spark):
    from project_obsidian_core_spark.plans.behavior_queries import (
        events_user_diversity,
    )
    from project_obsidian_core_spark.plans.common import load

    rows = load(spark, SF, "events").select("user_id", "event_type").collect()
    per: dict[int, dict[str, int]] = {}
    for r in rows:
        per.setdefault(r["user_id"], {})
        per[r["user_id"]][r["event_type"]] = (
            per[r["user_id"]].get(r["event_type"], 0) + 1
        )
    got = {r["user_id"]: r for r in events_user_diversity(spark, SF).collect()}
    assert set(got) == set(per)
    for u, d in per.items():
        n = sum(d.values())
        s2 = sum(c * c for c in d.values())
        r = got[u]
        assert r["n_events"] == n
        assert r["n_types"] == len(d)
        assert r["simpson_ppm"] == s2 * 1_000_000 // (n * n)
        assert r["effective_types"] == (n * n) / s2
        assert 1.0 <= r["effective_types"] <= len(d) + 1e-9


def test_xcorr_lag0_is_corr_matrix(spark):
    """Cross-operator consistency: the lag-0 slice of A62 must reproduce
    A37's Pearson matrix exactly (same centering, same moments)."""
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_corr_matrix,
        metric_xcorr,
    )

    corr = {
        (r["metric_a"], r["metric_b"]): r["corr"]
        for r in metric_corr_matrix(spark, SF).collect()
    }
    lag0 = {
        (r["metric_a"], r["metric_b"]): r["xcorr"]
        for r in metric_xcorr(spark, SF).collect()
        if r["lag"] == 0
    }
    assert corr == lag0


def test_xcorr_matches_python_reference(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_xcorr,
        synthesize_metrics,
    )

    rows = (
        synthesize_metrics(spark, SF)
        .select(
            "metric_name",
            F.expr("unix_micros(time) div 60000000").alias("bucket"),
            "metric_value",
        )
        .collect()
    )
    grid: dict[str, dict[int, int]] = {}
    for r in rows:
        grid.setdefault(r["metric_name"], {})
        grid[r["metric_name"]][r["bucket"]] = (
            grid[r["metric_name"]].get(r["bucket"], 0) + r["metric_value"]
        )
    cent = {
        m: {b: (y - min(d.values())) // 100 for b, y in d.items()}
        for m, d in grid.items()
    }
    got = metric_xcorr(spark, SF).collect()
    assert got, "no xcorr rows"
    for r in got:
        a, b, lag = r["metric_a"], r["metric_b"], r["lag"]
        pairs = [
            (ya, cent[b][bk + lag])
            for bk, ya in cent[a].items()
            if bk + lag in cent[b]
        ]
        n = len(pairs)
        assert r["n"] == n
        sa = sum(p[0] for p in pairs)
        sb = sum(p[1] for p in pairs)
        sab = sum(p[0] * p[1] for p in pairs)
        saa = sum(p[0] * p[0] for p in pairs)
        sbb = sum(p[1] * p[1] for p in pairs)
        assert r["xcorr_num"] == n * sab - sa * sb
        dx, dy = n * saa - sa * sa, n * sbb - sb * sb
        if dx > 0 and dy > 0:
            assert math.isclose(
                r["xcorr"],
                (n * sab - sa * sb) / math.sqrt(dx * dy),
                rel_tol=1e-12,
            )


def test_days_to_threshold_matches_python(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_days_to_threshold,
        synthesize_metrics,
    )

    rows = (
        synthesize_metrics(spark, SF)
        .select(
            "metric_name",
            F.expr("unix_micros(time) div 60000000").alias("x"),
            "metric_value",
        )
        .collect()
    )
    series: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        series.setdefault(r["metric_name"], []).append((r["x"], r["metric_value"]))
    got = {r["metric_name"]: r for r in metric_days_to_threshold(spark, SF).collect()}
    assert set(got) == set(series)
    for m, pts in series.items():
        x0 = min(x for x, _ in pts)
        y0 = min(y for _, y in pts)
        c = [(x - x0, y - y0) for x, y in pts]
        n = len(c)
        sx = sum(x for x, _ in c)
        sy = sum(y for _, y in c)
        sxy = sum(x * y for x, y in c)
        sxx = sum(x * x for x, _ in c)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        r = got[m]
        assert (r["slope_num"], r["slope_den"]) == (num, den)
        x_last = max(x for x, _ in c)
        span = max(y for _, y in c)
        assert r["x_last"] == x_last and r["span_cents"] == span
        if den != 0:
            slope = num / den
            yhat = (sy + slope * (n * x_last - sx)) / n
            assert math.isclose(r["yhat_last_cents"], yhat, rel_tol=1e-12)
            if num > 0:
                days = (2.0 * span - yhat) / slope / 1440.0
                assert math.isclose(r["days_to_threshold"], days, rel_tol=1e-12)
            else:
                assert r["days_to_threshold"] is None


def test_days_to_threshold_perfect_ramp_crosses_on_schedule():
    """Pure-python check of the closed form on an exact line: y = x cents
    per minute from 0..99 → slope 1, ŷ(99)=99=span, threshold 2·span →
    days = span/1440."""
    n = 100
    pts = [(x, x) for x in range(n)]
    sx = sum(x for x, _ in pts)
    sy = sx
    sxy = sum(x * y for x, y in pts)
    sxx = sxy
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    slope = num / den
    assert slope == 1.0
    x_last = n - 1
    span = n - 1
    yhat = (sy + slope * (n * x_last - sx)) / n
    assert yhat == x_last
    days = (2.0 * span - yhat) / slope / 1440.0
    assert math.isclose(days, span / 1440.0)
