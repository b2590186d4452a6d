"""Chain-heavy connected-components soak (VERDICT r2 item 4).

Builds a 1,000,000-edge graph whose worst case is DIAMETER, not volume:
100 disjoint paths of 10,000 edges each (diameter 10,000 — min-label
propagation would need 10,000 shuffle rounds) plus 1,000 star components
of fan-out 100 (the shallow shape near-dup graphs usually have). Runs
large-star/small-star CC and validates every path/star collapsed to its
minimum node, printing one JSON line with rounds + seconds.

Usage: python scripts/soak_cc.py [n_paths] [path_len] [n_stars] [fanout]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.datapipe import dedup as D  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402


def main() -> None:
    n_paths = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    path_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_stars = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    fanout = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    # paths: node ids p*STRIDE + i, edges (i, i+1)
    stride = 1_000_000
    paths = (
        spark.range(n_paths)
        .withColumnRenamed("id", "p")
        .crossJoin(spark.range(path_len).withColumnRenamed("id", "i"))
        .select(
            (F.col("p") * stride + F.col("i")).alias("doc_a"),
            (F.col("p") * stride + F.col("i") + 1).alias("doc_b"),
        )
    )
    # stars: center s*STRIDE, leaves center+1..fanout, offset well past paths
    star_base = (n_paths + 10) * stride
    stars = (
        spark.range(n_stars)
        .withColumnRenamed("id", "s")
        .crossJoin(spark.range(1, fanout + 1).withColumnRenamed("id", "l"))
        .select(
            (F.lit(star_base) + F.col("s") * stride).alias("doc_a"),
            (F.lit(star_base) + F.col("s") * stride + F.col("l")).alias("doc_b"),
        )
    )
    edges = paths.union(stars).repartition(32).persist()
    n_edges = edges.count()

    stats: dict = {}
    t0 = time.time()
    labels = D.connected_components_ls(edges, max_iter=40, stats=stats).persist()
    n_nodes = labels.count()
    secs = time.time() - t0

    # every node's cluster must be its component minimum
    bad = (
        labels.filter(
            (F.col("doc_id") < star_base)
            & (F.col("cluster") != (F.col("doc_id") - F.col("doc_id") % stride))
        )
        .union(
            labels.filter(
                (F.col("doc_id") >= star_base)
                & (F.col("cluster") != (F.col("doc_id") - F.col("doc_id") % stride))
            )
        )
        .count()
    )
    print(
        json.dumps(
            {
                "op": "connected_components_ls",
                "edges": n_edges,
                "nodes": n_nodes,
                "diameter": path_len,
                "rounds": stats.get("rounds"),
                "sec": round(secs, 1),
                "mislabeled": bad,
            }
        )
    )
    assert bad == 0, "component labels incorrect"


if __name__ == "__main__":
    main()
