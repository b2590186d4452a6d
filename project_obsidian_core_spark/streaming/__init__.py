"""Structured Streaming layer (SURVEY §2.9 T1-T5, §3.1).

The reference's collection loop is a ticker that scrapes a cumulative-counter
table, probes the previous snapshot in an in-memory store, and emits deltas.
Here: ``readStream`` over snapshot files (or any streaming source) →
``applyInPandasWithState`` keyed by instance (the state value IS the previous
snapshot, exactly the reference's SnapshotStore) → ``foreachBatch`` idempotent
rollup append.
"""
