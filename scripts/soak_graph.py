"""Round-5 soak: integer PageRank at 10^6 edges + PQ/ADC at 10x vectors.

PageRank graphs: (a) Erdos-Renyi-ish random (hash-derived, balanced) and
(b) star-heavy (one hub touching 20% of nodes — the in-degree skew case);
both at ~1e6 edges. PQ: the full pipeline (codebooks -> encode -> ADC)
over 50k synthetic 64-dim vectors (10x the sf0.1 embeddings table).

Usage: python scripts/soak_graph.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.datapipe import similarity as S  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402


def main() -> None:
    spark = build_session(app_name="soak-graph")
    n_nodes, n_edges = 200_000, 1_000_000

    # (a) balanced pseudo-random graph: hash-derived endpoints, normalized
    # to the deduplicated a<b contract of knn_edges (least/greatest +
    # distinct) — raw random draws emit duplicate and mirrored pairs, which
    # pagerank_int's symmetrizing union would double-count in node degrees
    ed = (
        spark.range(n_edges)
        .select(
            (F.abs(F.xxhash64("id")) % n_nodes).alias("x"),
            (F.abs(F.xxhash64("id", F.lit(1))) % n_nodes).alias("y"),
        )
        .filter("x != y")
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    t0 = time.time()
    total = S.pagerank_int(ed, iters=2).agg(F.sum("score")).first()[0]
    t_rand = time.time() - t0

    # (b) star-heavy: hub 0 touches 20% of nodes + a random remainder —
    # same a<b + distinct normalization as (a)
    hub = spark.range(n_nodes // 5).select(
        F.lit(0).alias("a"), (F.col("id") + 1).alias("b")
    )
    rest = (
        spark.range(n_edges - n_nodes // 5)
        .select(
            (F.abs(F.xxhash64("id")) % n_nodes).alias("x"),
            (F.abs(F.xxhash64("id", F.lit(7))) % n_nodes).alias("y"),
        )
        .filter("x != y")
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
    )
    star = hub.unionByName(rest).distinct()
    t0 = time.time()
    hub_score = (
        S.pagerank_int(star, iters=2)
        .orderBy(F.desc("score"))
        .limit(1)
        .first()
    )
    t_star = time.time() - t0

    print(f"pagerank random 1e6 edges, 2 rounds: {t_rand:.2f}s (mass={total})")
    print(f"pagerank star-heavy 1e6 edges, 2 rounds: {t_star:.2f}s "
          f"(top node={hub_score.node} score={hub_score.score})")

    # PQ at 10x: 50k vectors, 64 dims, deterministic synthetic coords
    vecs = spark.range(50_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j -> "
            "cast(pmod(xxhash64(id, j), 2000) - 1000 as double) / 1000.0)"
        ).alias("embedding"),
    )
    queries = vecs.filter(F.col("vec_id") < 5)
    t0 = time.time()
    out = S.pq_adc_topk(vecs, queries, k=10).count()
    t_pq = time.time() - t0
    print(f"pq_adc 50k vectors (codebooks+encode+score): {t_pq:.2f}s rows={out}")


if __name__ == "__main__":
    main()
