"""T16 streaming ingest-dedup sink: replay ≡ the batch incremental loop,
exactly-once on epoch re-delivery."""

from __future__ import annotations

import tempfile

from project_obsidian_core_spark.operators import versioning as V
from project_obsidian_core_spark.streaming import ingest_sink as IS


def _write_file(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_replay_equals_batch_loop(spark):
    tmp = tempfile.mkdtemp(prefix="ingest_sink_")
    src, root, ckpt = f"{tmp}/src", f"{tmp}/corpus", f"{tmp}/ckpt"

    b1 = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "an entirely different document about spark pipelines here"),
    ]
    b2 = [
        (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
        (11, "novel content in the second batch never seen before now"),
    ]
    b3 = [
        (20, "novel content in the second batch never seen before now"),  # dup 11
        (21, "yet another unique third batch document with fresh words"),
    ]
    for rows in (b1, b2, b3):
        _write_file(spark, src, rows)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    IS.run_ingest_dedup(stream, root, ckpt)

    final = V.read_snapshot(spark, root)
    assert sorted(r.doc_id for r in final.collect()) == [1, 2, 11, 21]
    # chain shape: one version per non-empty survivor batch
    assert V.latest_version(root) == 3


def test_within_batch_duplicates_collapse(spark):
    """Near-dups arriving in the SAME micro-batch keep only the min
    doc_id — including on the bootstrap batch, which previously bypassed
    dedup entirely (empty corpus => keep=batch)."""
    tmp = tempfile.mkdtemp(prefix="ingest_intra_")
    root = f"{tmp}/corpus"
    sink = IS.dedup_ingest_sink(spark, root)
    # bootstrap batch carries an internal near-dup pair (5, 9)
    b0 = spark.createDataFrame(
        [
            (9, "the quick brown fox jumps over the lazy dog today"),
            (5, "the quick brown fox jumps over the lazy dog today"),
            (7, "a totally unrelated document about streaming sinks"),
        ],
        ["doc_id", "text"],
    )
    sink(b0, epoch_id=0)
    got = sorted(r.doc_id for r in V.read_snapshot(spark, root).collect())
    assert got == [5, 7]
    # later batch: intra-batch pair (30, 31) collapses to 30, which is
    # itself novel vs the corpus and survives
    b1 = spark.createDataFrame(
        [
            (31, "completely fresh second batch text with new words"),
            (30, "completely fresh second batch text with new words"),
        ],
        ["doc_id", "text"],
    )
    sink(b1, epoch_id=1)
    got = sorted(r.doc_id for r in V.read_snapshot(spark, root).collect())
    assert got == [5, 7, 30]


def test_epoch_replay_is_skipped(spark):
    tmp = tempfile.mkdtemp(prefix="ingest_once_")
    root = f"{tmp}/corpus"
    sink = IS.dedup_ingest_sink(spark, root)
    batch = spark.createDataFrame(
        [(1, "some unique document text right here")], ["doc_id", "text"]
    )
    sink(batch, epoch_id=7)
    v_after_first = V.latest_version(root)
    sink(batch, epoch_id=7)  # foreachBatch re-delivery of a committed epoch
    assert V.latest_version(root) == v_after_first
    assert V.read_snapshot(spark, root).count() == 1


def test_all_duplicate_batch_publishes_nothing(spark):
    tmp = tempfile.mkdtemp(prefix="ingest_empty_")
    root = f"{tmp}/corpus"
    sink = IS.dedup_ingest_sink(spark, root)
    doc = [(1, "the very same document body appears twice in a row")]
    sink(spark.createDataFrame(doc, ["doc_id", "text"]), epoch_id=0)
    v1 = V.latest_version(root)
    dup = [(2, "the very same document body appears twice in a row")]
    sink(spark.createDataFrame(dup, ["doc_id", "text"]), epoch_id=1)
    assert V.latest_version(root) == v1  # no churn version
    assert V.read_snapshot(spark, root).count() == 1
