"""T16: streaming ingest-dedup sink — the LIVE form of the incremental
ingest loop (B6 append-chain + D10 incremental near-dup).

Each micro-batch of new documents is deduplicated FIRST within itself
(near-dups that arrive together would otherwise both clear the
new-vs-corpus join — including on the bootstrap batch, which has no
corpus to check against) and then against the ACCUMULATED corpus
(MinHash-LSH incremental candidates — the |new|-bounded join, never
corpus²); the survivors are appended as one O(batch) chain version.
Exactly-once across replays comes from the epoch marker in the snapshot
manifest (:func:`operators.versioning.append_snapshot_once`): a restarted
query re-delivering its last batch sees its own epoch on the latest
version and skips — the same idempotent-overwrite contract as the MOR
sink, expressed through the snapshot chain instead of delta files.

Scale: per batch this pays (a) one signature pass over new docs, (b) a
band join whose left side is the batch, (c) an O(batch) parquet write.
The corpus side's signatures are recomputed from the chain here for
simplicity; at 100 TB you stage them as their own append-chain "index"
table updated by the same sink (the staged-index note on
minhash_candidates_incremental) — the sink's contract does not change.

Empty survivor sets publish nothing: replaying an all-duplicates batch
re-derives the same empty set, so skipping the version keeps the chain
free of churn without breaking idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe.dedup import (
    minhash_candidates,
    minhash_candidates_incremental,
)
from project_obsidian_core_spark.operators import versioning as V


def dedup_within_batch(
    batch: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Near-dup collapse INSIDE one micro-batch: the min doc_id of each
    qualifying pair survives, the other side is dropped.

    Without this step, near-duplicates that ARRIVE TOGETHER both clear
    the new-vs-corpus anti-join (``minhash_candidates_incremental``
    pairs only new against existing) and enter the versioned corpus
    permanently — and the bootstrap batch (empty corpus) skipped dedup
    entirely. Batch-sized quadratic at worst, LSH-bounded like every
    other candidate join here.

    Deletion policy (documented over-removal, r9 ADVICE): a doc survives
    iff it is the MINIMUM id of every qualifying pair it appears in. On
    a similarity chain A~B, B~C (A not~ C) this keeps only A — C is
    removed even though its only qualifying partner B was itself removed.
    This sits between the two standard policies: strictly FEWER deletions
    than cluster-canonical (one representative per connected component —
    every pair-loser is a non-min of its component, so canonical would
    also drop C *and* any wedge sibling), and more than sequential-greedy
    ("drop only if a SURVIVING earlier doc matches"), which is an
    inherently iterative per-doc scan that does not distribute. Chosen
    because it is deterministic, idempotent under replay, and one
    anti-join; chain-shaped over-removal at threshold 0.9 means
    near-transitive resemblance in practice.

    ``release=True`` on the candidate pass: this runs once per
    micro-batch with a DISTINCT input plan each time, so the signature
    cache must be dropped per call or the streaming query leaks one
    cache entry per batch for its whole life (r9 ADVICE, medium)."""
    losers = (
        minhash_candidates(batch.select("doc_id", "text"), release=True)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return batch.join(losers, "doc_id", "left_anti")


def survivors_vs_corpus(
    corpus: DataFrame, batch: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """New docs that near-dup nothing in ``corpus`` (anti-join on the
    |new|-bounded LSH candidates)."""
    union = corpus.select("doc_id", "text").withColumn(
        "is_new", F.lit(False)
    ).unionByName(batch.select("doc_id", "text").withColumn("is_new", F.lit(True)))
    dups = (
        minhash_candidates_incremental(union)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("doc_new").alias("doc_id"))
        .distinct()
    )
    return batch.join(dups, "doc_id", "left_anti")


def dedup_ingest_sink(spark: SparkSession, root: str, threshold: float = 0.9):
    """foreachBatch function folding a document stream into the versioned
    corpus at ``root`` with corpus-dedup on the way in."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        batch = dedup_within_batch(batch, threshold)
        if V.latest_version(root, spark) > 0:
            corpus = V.read_snapshot(spark, root)
            keep = survivors_vs_corpus(corpus, batch, threshold)
        else:
            keep = batch
        # localCheckpoint: the anti-join must be resolved BEFORE the write
        # starts mutating the chain it reads from
        keep = keep.localCheckpoint(eager=True)
        if keep.count() > 0:
            V.append_snapshot_once(keep, root, epoch=epoch_id)

    return sink


def run_ingest_dedup(
    stream: DataFrame,
    root: str,
    ckpt: str,
    threshold: float = 0.9,
) -> None:
    """Drain an availableNow document stream through the dedup sink."""
    spark = stream.sparkSession
    q = (
        stream.writeStream.foreachBatch(dedup_ingest_sink(spark, root, threshold))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
