"""End-to-end incremental-ingest loop: B6 append-chain snapshots feeding
D10 incremental dedup — the composition a daily 100 TB crawl actually
runs: read ONLY the new delta, dedup it against the accumulated corpus,
append the survivors, repeat.  Pins that the pieces compose: the corpus
after N incremental rounds equals what a from-scratch batch pipeline
would have kept.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe.dedup import (
    minhash_candidates_incremental,
)
from project_obsidian_core_spark.operators import versioning as V


def _batch(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _survivors(spark, corpus_df, batch_df, threshold=0.9):
    """New docs that near-dup nothing in the corpus (the ingest filter)."""
    union = corpus_df.withColumn("is_new", F.lit(False)).unionByName(
        batch_df.withColumn("is_new", F.lit(True))
    )
    dups = (
        minhash_candidates_incremental(union)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("doc_new").alias("doc_id"))
        .distinct()
    )
    return batch_df.join(dups, "doc_id", "left_anti")


def test_incremental_rounds_match_batch_pipeline(spark):
    root = tempfile.mkdtemp(prefix="incr_ingest_")
    seed = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "an entirely different document about spark pipelines here"),
    ]
    b2 = [
        (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
        (11, "novel content in the second batch never seen before now"),
    ]
    b3 = [
        (20, "novel content in the second batch never seen before now"),  # dup of 11
        (21, "yet another unique third batch document with fresh words"),
        (22, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
    ]

    # seed corpus = v1 (full)
    V.write_snapshot(_batch(spark, seed), root)

    # ingest loop: read corpus, filter batch, append survivors
    for rows in (b2, b3):
        corpus = V.read_snapshot(spark, root)
        keep = _survivors(spark, corpus, _batch(spark, rows))
        V.append_snapshot(keep, root)

    final = V.read_snapshot(spark, root)
    assert sorted(r.doc_id for r in final.collect()) == [1, 2, 11, 21]

    # the increment since the seed is exactly the two survivors
    inc = V.read_snapshot_increment(spark, root, since_version=1)
    assert sorted(r.doc_id for r in inc.collect()) == [11, 21]

    # each append wrote O(batch) files: v2/v3 dirs hold only survivors
    assert V.read_snapshot_increment(spark, root, 2, 3).count() == 1


def test_consumer_resumes_from_its_cursor(spark):
    root = tempfile.mkdtemp(prefix="incr_cursor_")
    V.write_snapshot(_batch(spark, [(1, "a b c")]), root)
    V.append_snapshot(_batch(spark, [(2, "d e f")]), root)
    cursor = V.latest_version(root)  # consumer processed up to v2
    V.append_snapshot(_batch(spark, [(3, "g h i")]), root)
    V.append_snapshot(_batch(spark, [(4, "j k l")]), root)
    delta = V.read_snapshot_increment(spark, root, since_version=cursor)
    assert sorted(r.doc_id for r in delta.collect()) == [3, 4]
