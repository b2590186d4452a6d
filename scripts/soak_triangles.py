"""Round-8 soak: degree-ordered triangle enumeration on a hub graph.

Constructs a 1M-node graph with 50 extreme hubs (every node links to a
hub, deg ~20k each) plus a chain + skip edges for triangle density. The
naive node-iterator wedge count is Σ deg·(deg−1)/2 — dominated by the
hubs at ~10^10 wedge rows (computed analytically; materializing it IS
the failure). The degree-ordered orientation bounds per-node fan-out by
out-degree, so the materialized wedge relation stays near the edge
count. Reports both numbers + the triangle_list wall time.

Usage: python scripts/soak_triangles.py [--nodes N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    args = ap.parse_args()
    n = args.nodes
    spark = build_session(app_name="soak_triangles")
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(1, n)
    hub = ids.select(F.col("id").alias("x"), (F.col("id") % 50).alias("y"))
    chain = ids.select(F.col("id").alias("x"), (F.col("id") - 1).alias("y"))
    skip = ids.filter(F.col("id") >= 2).select(
        F.col("id").alias("x"), (F.col("id") - 2).alias("y")
    )
    edges = (
        hub.union(chain)
        .union(skip)
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
        .persist()
    )
    m = edges.count()
    deg = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    naive_wedges = deg.select(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    print(f"[tri] edges={m}  naive wedge count (analytic)={naive_wedges:.3e}")

    from project_obsidian_core_spark.datapipe import similarity as S

    t0 = time.monotonic()
    tri = S.triangle_list(edges)
    n_tri = tri.count()
    wall = time.monotonic() - t0
    print(f"[tri] oriented triangle_list: {n_tri} triangles in {wall:.1f}s")

    # materialized oriented-wedge count (the relation the plan actually built)
    deg2 = deg
    rank = deg2.select("v", (F.col("d") * (1 << 31) + F.col("v")).alias("r"))
    e = (
        edges.join(rank.select(F.col("v").alias("a"), F.col("r").alias("ra")), "a")
        .join(rank.select(F.col("v").alias("b"), F.col("r").alias("rb")), "b")
    )
    flip = F.col("ra") < F.col("rb")
    oriented = e.select(
        F.when(flip, F.col("a")).otherwise(F.col("b")).alias("src")
    )
    out_deg = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    o_wedges = out_deg.select(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    print(
        f"[tri] oriented wedge count={o_wedges:.3e}  "
        f"reduction={naive_wedges / max(o_wedges, 1):.0f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
