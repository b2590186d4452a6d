"""Round-9 soak: k-core peel round count and wall on adversarial shapes.

The kcore loop terminates when a round removes nothing; the claim under
test is that REAL graph shapes converge in a handful of rounds (each
round removes every currently-under-supported node at once), while the
adversarial worst case — a pure chain, whose k=2 peel removes only the
two endpoints per round — needs O(n) rounds and is exactly what
``max_rounds`` guards.  Reports rounds-to-fixpoint (via a counting
re-run of the same loop) and wall for:

  1. a hub-and-spoke + clique graph (the near-dup/kNN shape),
  2. a random Erdos-Renyi-ish graph,
  3. a short chain (worst case, small n so it completes).

Usage: python scripts/soak_kcore.py [--nodes N]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.datapipe.similarity import kcore  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402


def peel_rounds(spark, edges, k: int) -> int:
    """Same loop as kcore, counting rounds to fixpoint."""
    und = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    live = und
    rounds = 0
    while True:
        deg = live.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        pruned = (
            live.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        rounds += 1
        if pruned.count() in (live.count(), 0):
            return rounds
        live = pruned


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=200_000)
    args = ap.parse_args()
    n = args.nodes
    spark = build_session(app_name="soak-kcore", shuffle_partitions=16)
    rng = random.Random(11)

    # 1. hub-and-spoke + cliques (near-dup family shape)
    hub_edges = [(i, i % 40) for i in range(40, n)]  # 40 hubs
    for c0 in range(0, 2000, 10):  # 200 10-cliques
        base = n + c0
        hub_edges += [
            (base + i, base + j) for i in range(10) for j in range(i + 1, 10)
        ]
    ed1 = spark.createDataFrame(hub_edges, "a long, b long")
    t0 = time.time()
    core = kcore(ed1, k=5)
    n_core = core.count()
    w1 = time.time() - t0
    r1 = peel_rounds(spark, ed1, 5)
    print(f"hub+clique: n_edges={len(hub_edges)} core5_nodes={n_core} "
          f"rounds={r1} wall={w1:.1f}s")

    # 2. sparse random graph, avg degree 6
    rand_edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(3 * n)
    ]
    ed2 = spark.createDataFrame(rand_edges, "a long, b long")
    t0 = time.time()
    n_core2 = kcore(ed2, k=4).count()
    w2 = time.time() - t0
    r2 = peel_rounds(spark, ed2, 4)
    print(f"random avg-deg-6: core4_nodes={n_core2} rounds={r2} wall={w2:.1f}s")

    # 3. chain worst case (small): k=2 removes 2 endpoints/round
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "a long, b long"
    )
    t0 = time.time()
    r3 = peel_rounds(spark, chain, 2)
    w3 = time.time() - t0
    print(f"chain-60 worst case: rounds={r3} wall={w3:.1f}s "
          f"(the max_rounds guard's reason to exist)")


if __name__ == "__main__":
    main()
