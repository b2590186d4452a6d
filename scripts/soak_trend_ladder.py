"""Round-10 soak: the A51-A55 trend ladder at a LONG retention window.

The gate grids hold ~30-270 hour buckets/series; the ladder's scale
claim is that all per-series work (Theil-Sen's O(H²) pair build, the
change-point prefix scan, the Holt fold, the runs-test walk) rides
INSIDE the per-series row as higher-order functions — so the cost
that matters is H, the retention window, not the corpus. This soak
builds a synthetic (series × hour) grid at H = 267 (the sf0.1 shape)
and H = 720 (a 30-day window) across 1,000 series and times each
operator end-to-end on local[32].

At H=720, Theil-Sen evaluates 1000 × 258,840 ≈ 259M pairwise slopes —
the honest upper bound of the in-row strategy; if this were a
self-join it would SHUFFLE those rows instead of streaming them
through codegen.

Run: python scripts/soak_trend_ladder.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.session import build_session  # noqa: E402

N_SERIES = 1_000
HOURS = (267, 720)


def main() -> None:
    spark = build_session(app_name="soak-trend-ladder")
    from project_obsidian_core_spark.plans import metrics_queries as mq

    for h in HOURS:
        grid = (
            spark.range(N_SERIES)
            .selectExpr("concat('s', id) as metric_name")
            .crossJoin(spark.range(h).selectExpr("id as x"))
            .selectExpr(
                "metric_name",
                "x",
                # deterministic pseudo-values: trend + wrapped noise
                "cast(x * 7 + pmod(hash(metric_name, x), 997) as long) as v",
            )
        )
        # feed through the SAME plan bodies the gates use, monkeypatching
        # the substrate: synthesize+bucket collapses to the prepared grid
        real_syn = mq.synthesize_metrics

        def fake_syn(s, d, _g=grid):
            return _g.selectExpr(
                "metric_name",
                "timestamp_micros(x * 3600000000) as time",
                "v as metric_value",
            )

        mq.synthesize_metrics = fake_syn
        try:
            for name, fn in (
                ("theil_sen", mq.metric_theil_sen),
                ("changepoint", mq.metric_changepoint),
                ("holt", mq.metric_holt),
                ("runs_test", mq.metric_runs_test),
            ):
                t0 = time.time()
                n = fn(spark, "unused").count()
                dt = time.time() - t0
                assert n == N_SERIES, (name, n)
                print(
                    f"H={h:4d} {name:12s} {dt:7.1f} s "
                    f"({N_SERIES} series"
                    + (
                        f", {N_SERIES * h * (h - 1) // 2 / 1e6:.0f}M slopes"
                        if name == "theil_sen"
                        else ""
                    )
                    + ")"
                )
        finally:
            mq.synthesize_metrics = real_syn
    print("TREND LADDER SOAK COMPLETE")


if __name__ == "__main__":
    main()
