"""Soak: streaming ingest-dedup sink at sf0.1 — per-batch wall vs corpus
growth (the |new|-bounded claim made measurable).

The sink's promise is that batch cost tracks |batch|, not |corpus|: the
LSH band join's left side is the batch. This replays the sf0.1 documents
table in equal batches through the sink and prints per-batch wall + the
resulting chain, so SCALE.md records whether cost stays flat as the
corpus accumulates.

Usage: python scripts/soak_ingest_sink.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.operators import versioning as V  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402
from project_obsidian_core_spark.streaming.ingest_sink import (  # noqa: E402
    dedup_ingest_sink,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="soak-ingest-sink", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    per = n // n_batches
    root = tempfile.mkdtemp(prefix="soak_ingest_") + "/corpus"
    sink = dedup_ingest_sink(spark, root, threshold=0.9)
    print(f"{n} docs in {n_batches} batches of ~{per}")
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per if b < n_batches - 1 else n
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        t0 = time.time()
        sink(batch, epoch_id=b)
        wall = time.time() - t0
        v = V.latest_version(root)
        size = V.read_snapshot(spark, root).count()
        print(
            f"batch {b}: {hi - lo} in, corpus now {size} "
            f"(v{v}), wall {wall:.1f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
