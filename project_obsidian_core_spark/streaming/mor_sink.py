"""Streaming merge-on-read sink — the MOR half of the CDC quadrant.

The repo's CDC surface now covers all four corners: batch CoW
(`orders_cdc_merge`), streaming CoW (`stream_cdc_merge`'s foreachBatch
MERGE), batch MOR (`orders_mor_merge`), and THIS — a foreachBatch sink
that lands each micro-batch as an O(|batch|) delta file and lets reads
fold (`operators.merge.read_mor`), with byte-threshold compaction
(`compact_mor`) folding the ledger back opportunistically.

Why this is the high-ingest shape at 100 TB: the CoW sink pays a
touched-partition rewrite EVERY micro-batch (write amplification ∝
batch rate), while this sink's per-batch write cost is the batch itself;
the deferred cost moves to readers (~constant fold multiplier, soak
r8) until compaction resets it — which this sink triggers by ledger
bytes, amortizing the rewrite over many batches instead of paying it
per batch.

Exactly-once: the delta file name is the epoch id, and a replayed epoch
OVERWRITES its own directory (mode=overwrite on ``seq=<epoch>``) — the
same idempotent-batch contract as ``idempotent_parquet_sink``. Folding
is keyed latest-wins per (key, seq), so a re-landed identical delta is
a no-op.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from project_obsidian_core_spark.operators.merge import (
    append_mor_delta,
    compact_mor,
)


def mor_delta_sink(
    path: str,
    keys: Sequence[str],
    compact_threshold_frac: float | None = 0.25,
):
    """foreachBatch writer: micro-batch (rows carry ``op`` ∈ I/U/D) →
    ``{path}/deltas/seq=<epoch>``; optionally compacts when the ledger
    passes ``compact_threshold_frac`` of base bytes (None = never)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        append_mor_delta(batch_df, path, seq=int(epoch_id))
        if compact_threshold_frac is not None:
            compact_mor(
                batch_df.sparkSession,
                path,
                keys,
                threshold_frac=compact_threshold_frac,
            )

    return write
