"""Round-10 soak: the rank-statistics ladder (A65 Kendall, A66 Pettitt)
past the gate shapes.

Two scale axes, soaked separately because they bound differently:

* Pettitt is LINEAR in #series (two windows per series partition on the
  reduced grid) — soak 1,000 series x 720 h = 720k grid rows.
* Kendall is QUADRATIC in #series (|pairs| = S(S-1)/2 series pairs, each
  carrying C(H,2) sign pairs inside its join group) — soak 40 series
  x 720 h = 780 series pairs x 258,840 sign pairs ≈ 202M codegen sign
  pairs. The production guidance this quantifies: an all-pairs tau
  matrix over S series costs S²/2 · H²/2 sign pairs, so at fleet scale
  (10⁴+ series) you pre-filter the pair set (same-host / same-dashboard
  blocking) exactly like the dedup family blocks candidate pairs —
  the operator itself stays window-bounded per pair.

Both run the exact gate plan BODIES (same expressions, synthetic grid
fed in place of the events-derived one). Run:
python scripts/soak_rank_ladder.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.session import build_session  # noqa: E402

H = 720
S_PETTITT = 1_000
S_KENDALL = 40


def synth_grid(spark, n_series: int):
    """(metric_name, x, y) hour grid: deterministic mixed-regime series
    (ramp + modular noise + a level shift at 2/3) — ties included."""
    return spark.range(n_series * H).select(
        F.concat(F.lit("m"), (F.col("id") % n_series)).alias("metric_name"),
        (F.col("id") / n_series).cast("long").alias("x"),
        (
            (F.col("id") * 2654435761) % 997
            + F.when((F.col("id") / n_series) >= (2 * H / 3), 5000).otherwise(0)
            + (F.col("id") / n_series).cast("long") % 200
        ).cast("long").alias("y"),
    )


def pettitt_body(grid):
    from pyspark.sql import Window

    wser = Window.partitionBy("metric_name")
    wval = wser.orderBy("y")
    wtie = Window.partitionBy("metric_name", "y")
    wx = wser.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    c = grid.select(
        "metric_name",
        "x",
        F.count(F.lit(1)).over(wser).alias("n"),
        (
            F.count(F.lit(1)).over(wser)
            - 2 * (F.rank().over(wval) - 1)
            - F.count(F.lit(1)).over(wtie)
        ).cast("long").alias("delta"),
    )
    walked = c.select(
        "metric_name",
        "x",
        "n",
        F.sum("delta").over(wx).alias("k_signed"),
        F.row_number().over(wser.orderBy("x")).alias("s"),
    ).filter(F.col("s") < F.col("n"))
    wbest = Window.partitionBy("metric_name").orderBy(
        F.abs(F.col("k_signed")).desc(), F.asc("x")
    )
    return (
        walked.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("metric_name", "x", "k_signed")
    )


def kendall_body(grid):
    al = (
        grid.select(
            F.col("metric_name").alias("metric_a"), "x", F.col("y").alias("ya")
        )
        .join(
            grid.select(
                F.col("metric_name").alias("metric_b"),
                "x",
                F.col("y").alias("yb"),
            ),
            "x",
        )
        .filter(F.col("metric_a") < F.col("metric_b"))
    )
    pr = al.alias("p").join(
        al.alias("q"),
        (F.col("p.metric_a") == F.col("q.metric_a"))
        & (F.col("p.metric_b") == F.col("q.metric_b"))
        & (F.col("q.x") > F.col("p.x")),
    )
    signs = pr.select(
        F.col("p.metric_a").alias("metric_a"),
        F.col("p.metric_b").alias("metric_b"),
        F.expr(
            "case when q.ya > p.ya then 1 when q.ya < p.ya then -1 else 0 end"
        ).alias("sa"),
        F.expr(
            "case when q.yb > p.yb then 1 when q.yb < p.yb then -1 else 0 end"
        ).alias("sb"),
    )
    return signs.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("sa") * F.col("sb")).alias("cd"),
    )


def main() -> None:
    spark = build_session(app_name="rank-ladder-soak")

    gp = synth_grid(spark, S_PETTITT).persist()
    gp.count()
    for tag in ("cold", "warm"):
        t0 = time.time()
        rows = pettitt_body(gp).collect()
        print(
            f"pettitt {tag}: {S_PETTITT} series x {H}h "
            f"({S_PETTITT * H:,} grid rows) -> {len(rows)} change points "
            f"in {time.time() - t0:.1f}s"
        )
    # the planted 2/3 shift must dominate: every split lands AT the
    # boundary or a few hours early (near-boundary noise pairs can
    # outweigh the ~240-pairs-per-step crossing loss, so the argmax may
    # sit 1-4 steps inside segment 1 — never far, never after)
    split_x = {r["x"] for r in rows}
    lo, hi = 2 * H // 3 - 8, 2 * H // 3 - 1
    assert all(lo <= x <= hi for x in split_x), sorted(split_x)[:5]
    gp.unpersist()

    gk = synth_grid(spark, S_KENDALL).persist()
    gk.count()
    n_pairs = S_KENDALL * (S_KENDALL - 1) // 2
    for tag in ("cold", "warm"):
        t0 = time.time()
        rows = kendall_body(gk).collect()
        dt = time.time() - t0
        total = sum(r["n0"] for r in rows)
        print(
            f"kendall {tag}: {S_KENDALL} series -> {n_pairs} series pairs, "
            f"{total:,} sign pairs in {dt:.1f}s "
            f"({total / dt / 1e6:.0f}M sign pairs/s)"
        )
    assert len(rows) == n_pairs
    assert all(r["n0"] == H * (H - 1) // 2 for r in rows)
    spark.stop()


if __name__ == "__main__":
    main()
