"""Soak: prefix-filter EXACT join vs MinHash-LSH+verify on the same corpus.

The question this answers for SCALE.md: what does exactness COST?  The
prefix filter finds *every* pair >= t (provably complete); MinHash-LSH
finds pairs with S-curve probability (its misses are measured by
dedup_recall_report).  Both are bounded-blowup candidate generators; the
comparison is candidate volume + wall at several thresholds.

Usage: python scripts/soak_prefix_join.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.datapipe import dedup as D  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="soak-prefix-join", shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n = docs.count()
    print(f"corpus: {n} docs ({sf_dir})")
    all_pairs = n * (n - 1) // 2

    for t_ppm in (500_000, 600_000, 800_000):
        t0 = time.time()
        out = D.prefix_filter_pairs(docs, threshold_ppm=t_ppm)
        n_true = out.count()
        wall = time.time() - t0
        print(
            f"prefix t={t_ppm/1e6}: {n_true} true pairs, "
            f"wall {wall:.1f}s (complete; all-pairs would be {all_pairs})"
        )

    # LSH on the same shingle space: candidates + verified pairs + wall
    t0 = time.time()
    cand = D.minhash_candidates(docs).cache()
    n_cand = cand.count()
    wall = time.time() - t0
    for t in (0.5, 0.6, 0.8):
        k = cand.filter(F.col("jaccard") >= t).count()
        print(f"lsh t={t}: {k} verified pairs of {n_cand} candidates")
    print(f"lsh wall (candidates+verify, all thresholds share it): {wall:.1f}s")
    cand.unpersist()
    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
