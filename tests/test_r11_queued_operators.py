"""Units for the ROUND-11-QUEUED operators (implemented + oracle-twinned
in round 10 session 4; registration deferred because the r10 gate window
was exactly full at 40 new + the 10-row r05 refresh — see
scripts/check_queued.py, which gate-checks them against their DuckDB
oracles outside the registry)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_spearman_matches_python(spark):
    """Independent midrank + Pearson-on-ranks recomputation, and the
    triad consistency check: |rho| ≤ 1 and sign agrees with tau_b."""
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_kendall_tau,
        metric_spearman,
        synthesize_metrics,
    )

    rows = (
        synthesize_metrics(spark, SF)
        .select(
            "metric_name",
            F.expr("unix_micros(time) div 3600000000").alias("x"),
            F.col("metric_value").alias("v"),
        )
        .groupBy("metric_name", "x")
        .agg(F.sum("v").alias("y"))
        .collect()
    )
    grids: dict[str, dict[int, int]] = {}
    for r in rows:
        grids.setdefault(r["metric_name"], {})[r["x"]] = r["y"]

    def midranks2(vals):
        """value -> 2x midrank within this series (2*less + ties + 1)."""
        from collections import Counter

        cnt = Counter(vals)
        less, acc = {}, 0
        for v in sorted(cnt):
            less[v] = acc
            acc += cnt[v]
        return {v: 2 * less[v] + cnt[v] + 1 for v in cnt}

    got = {
        (r["metric_a"], r["metric_b"]): r
        for r in metric_spearman(spark, SF).collect()
    }
    tau = {
        (r["metric_a"], r["metric_b"]): r["tau_b"]
        for r in metric_kendall_tau(spark, SF).collect()
    }
    names = sorted(grids)
    checked = 0
    for ai in range(len(names)):
        for bi in range(ai + 1, len(names)):
            a, b = names[ai], names[bi]
            ra2 = midranks2(list(grids[a].values()))
            rb2 = midranks2(list(grids[b].values()))
            xs = sorted(set(grids[a]) & set(grids[b]))
            if len(xs) < 2:
                continue
            pa = [ra2[grids[a][x]] for x in xs]
            pb = [rb2[grids[b][x]] for x in xs]
            n = len(xs)
            sa, sb = sum(pa), sum(pb)
            sab = sum(x * y for x, y in zip(pa, pb))
            saa = sum(x * x for x in pa)
            sbb = sum(y * y for y in pb)
            num = n * sab - sa * sb
            dx = n * saa - sa * sa
            dy = n * sbb - sb * sb
            row = got[(a, b)]
            assert row["n"] == n
            assert row["rho_num"] == num
            assert row["var_a_num"] == dx and row["var_b_num"] == dy
            rho_ref = num / math.sqrt(dx * dy)
            assert math.isclose(row["rho"], rho_ref, rel_tol=1e-12)
            assert -1.0 <= row["rho"] <= 1.0
            # triad sanity: Spearman and Kendall agree on direction
            t = tau[(a, b)]
            if abs(t) > 0.05 and abs(row["rho"]) > 0.05:
                assert (t > 0) == (row["rho"] > 0)
            checked += 1
    assert checked == len(got)


def test_pettitt_from_series_matches_batch_bruteforce():
    """The T25 pure fold must equal the literal ΣΣ sgn pair sum (the same
    identity the batch A66 unit pins), including the tie rules."""
    from project_obsidian_core_spark.streaming.sequence_state import (
        pettitt_from_series,
    )

    cases = [
        [10, 10, 10, 50, 50, 50],
        [5, 1, 4, 1, 5, 9, 2, 6],
        [3, 3, 3, 3],
        [1, 2],
        [7, 6, 5, 4, 3, 2, 1],
    ]
    for ys in cases:
        n = len(ys)
        buckets = [100 + i for i in range(n)]
        best = None
        for t in range(1, n):
            k = 0
            for i in range(t):
                for j in range(t, n):
                    k += (ys[j] > ys[i]) - (ys[j] < ys[i])
            cand = (-abs(k), buckets[t - 1], k)
            if best is None or cand < best:
                best = cand
        got = pettitt_from_series(buckets, ys)
        assert got == (n, best[1], best[2], -best[0]), (ys, got, best)
    assert pettitt_from_series([1], [5]) is None
    assert pettitt_from_series([], []) is None


def test_stream_pettitt_drained_equals_batch(spark):
    """Drained max-version rows must equal the batch A66 operator exactly
    — the streaming↔batch equivalence the r11 driver gate will re-prove
    against the DuckDB oracle."""
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_pettitt,
    )
    from project_obsidian_core_spark.plans.streaming_queries import (
        stream_pettitt,
    )

    got = [tuple(r) for r in stream_pettitt(spark, SF).collect()]
    ref = [tuple(r) for r in metric_pettitt(spark, SF).collect()]
    assert got == ref
