"""PSI drift report: share exactness, smoothing, and the ln-term helper
pinned against Python's math.log (cross-engine ln is NOT hashable — the
reason psi_term sits outside the gated projection)."""

from __future__ import annotations

import math

from project_obsidian_core_spark.plans import analytics_ext_queries as AX


def test_psi_shares_and_term(spark):
    out = AX.orders_drift_psi(spark, "/root/testdata/sf0.001")
    rows = AX.psi_from_shares(out).collect()
    assert rows, "empty drift report"
    for r in rows:
        # Laplace smoothing keeps every share strictly positive
        assert r["ref_ppm"] > 0 and r["cur_ppm"] > 0
        expect = ((r["ref_ppm"] - r["cur_ppm"]) / 1_000_000.0) * (
            math.log(r["ref_ppm"]) - math.log(r["cur_ppm"])
        )
        assert abs(r["psi_term"] - expect) <= 1e-12 * max(1.0, abs(expect))
        # every per-bin PSI contribution is non-negative by construction:
        # (p-q) and ln(p/q) always share a sign
        assert r["psi_term"] >= 0.0
    total_psi = sum(r["psi_term"] for r in rows)
    assert total_psi >= 0.0
