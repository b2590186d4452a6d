"""Soak the span-dedup family at a replicated-corpus scale.

Replicates the sf0.1 documents table R times with distinct doc_ids
(text reused → heavy REAL cross-doc duplication, the worst case for the
dup-set size) and times D18/D19/D20 plus the hashed window count.
Evidence for SCALE.md: the hashed paths stay near-linear in corpus size
because every post-map relation is int64-keyed; the string-output report
stays bounded by its TakeOrdered cap.

Run: python scripts/soak_spans.py [R]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.datapipe import spans as SP  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402

R = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = 8


def timed(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {label:28s} {time.time() - t0:6.1f} s")


def main() -> None:
    spark = build_session(shuffle_partitions=32)
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(R).select(F.col("id").alias("rep"))
    corpus = (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text",
        )
        .repartition(32)
        .persist()
    )
    n = corpus.count()
    print(f"soak corpus: {n} docs (sf0.1 x {R})")
    timed("windows hashed (count)", SP.token_windows(corpus, k=K, hashed=True))
    timed(
        "D18 dup_spans top-200",
        SP.dup_spans(corpus, k=K).orderBy(F.desc("n_occ"), "gram").limit(200),
    )
    timed("D19 coverage (hashed)", SP.dup_span_coverage(corpus, k=K))
    timed("D20 excise rewrite", SP.excise_dup_spans(corpus, k=K))
    corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
