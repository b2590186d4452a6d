"""Stateful streaming snapshot-delta operator.

Reference semantics reproduced (mysql/snapshot.go:159-239,
mysql/collector.go:75-85, postgresql/snapshot.go:183-279):

- state per **instance** = the full previous snapshot (digest → cumulative
  metrics + snapshot ts) — the exact analogue of the reference's
  ``SnapshotStore{latestSnapshots map[string]*Snapshot}``;
- first snapshot of an instance emits nothing (T2);
- per-metric delta: ``curr - prev`` if monotone else ``curr`` (counter
  reset, T3); keys absent from the previous snapshot emit their full
  cumulative value (T4); keys that disappeared are dropped;
- ``time_period_seconds`` is the *snapshot-level* Δt attached to every
  delta row (T5) — including new keys, which per-key lag state could not
  reproduce;
- rows with non-positive activity delta are filtered (P3).

Scale notes
-----------
State cardinality = #instances; each state value is bounded by the
monitored DB's digest cap (pg_stat_statements.max = 10000,
performance_schema digest limits — BASELINE.md), so state size is
O(instances × 10k × metrics) — kilobytes per instance, safely inside the
state store even at fleet scale. Groups hash-partition by instance across
executors; the RocksDB/HDFS state store checkpoints per micro-batch, which
is the streaming equivalent of the reference's persisted snapshot store.

Multiple snapshots of one instance inside a single micro-batch are sorted
by ``snapshot_ts`` and folded in order, so replaying a whole history in one
``availableNow`` pass gives byte-identical output to tick-by-tick execution.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def state_schema(
    key_cols: Sequence[str], metric_fields: Sequence[tuple[str, T.DataType]]
) -> T.StructType:
    """Typed state struct per instance: previous tick + parallel arrays.

    ``keys[i]`` holds the i-th key tuple of the previous snapshot and
    ``m<j>[i]`` that key's j-th metric, in each metric's *native* Spark type
    — the state store serializes typed Arrow columns instead of one JSON
    string rebuilt row-by-row in Python per micro-batch (integer counters
    stay exact; no ser/de of field names per tick)."""
    return T.StructType(
        [
            T.StructField("ts_us", T.LongType()),
            T.StructField("keys", T.ArrayType(T.ArrayType(T.StringType()))),
            *[
                T.StructField(f"m{j}", T.ArrayType(dt))
                for j, (_, dt) in enumerate(metric_fields)
            ],
        ]
    )


def output_schema(
    key_cols: Sequence[str], metric_fields: Sequence[tuple[str, T.DataType]]
) -> T.StructType:
    fields = [
        T.StructField("instance_id", T.StringType()),
        T.StructField("snapshot_ts", T.TimestampType()),
        *[T.StructField(k, T.StringType()) for k in key_cols],
        *[T.StructField(f"{m}_delta", dt) for m, dt in metric_fields],
        T.StructField("time_period_seconds", T.DoubleType()),
    ]
    return T.StructType(fields)


def _delta(curr: float | None, prev: float | None):
    if curr is None:
        # a NULL metric in the incoming snapshot degrades to a null delta
        # (matching the batch path) instead of raising inside the stream
        return None
    if prev is None or curr < prev:
        return curr  # new key (T4) or counter reset (T3)
    return curr - prev


def make_delta_fn(
    key_cols: Sequence[str],
    metric_cols: Sequence[str],
    activity_col: str | None,
    metric_types: Sequence[T.DataType] | None = None,
):
    """Build the applyInPandasWithState group function.

    The pandas code only touches one instance's snapshots per call — the
    per-row work is dict probes, exactly the reference's map lookup; the
    heavy lifting (partitioning, state store, checkpointing) stays in Spark.

    ``metric_types`` (the declared state array types) drives coercion into
    the typed state columns: pandas silently promotes integer columns with
    any null to float64, so values are pinned back to int before they enter
    a long-typed state array.
    """
    integral = (
        [isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)) for dt in metric_types]
        if metric_types is not None
        else [False] * len(metric_cols)
    )
    n_metrics = len(metric_cols)

    def _coerce(j: int, v):
        if pd.isna(v):
            return None
        v = v.item() if hasattr(v, "item") else v
        return int(v) if integral[j] else v

    def _key(rec) -> tuple:
        # canonicalize key values to str at the boundary: the state schema
        # declares keys as array<array<string>>, so a non-string key column
        # (e.g. a bigint digest id) must be coerced BEFORE it enters the
        # state tuple — otherwise Arrow state serialization fails and
        # current-vs-previous dict probes compare str to int and never hit.
        # The output schema types key columns as string, so emitting the
        # canonicalized form is lossless.
        return tuple(
            None if (v := getattr(rec, k)) is None else str(v) for k in key_cols
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        instance_id = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values("snapshot_ts", kind="mergesort")

        if state.exists:
            st = state.get
            prev_ts_us: int | None = st[0]
            prev_digests: dict[tuple, list] = {
                tuple(k): [st[2 + j][i] for j in range(n_metrics)]
                for i, k in enumerate(st[1])
            }
        else:
            prev_ts_us, prev_digests = None, {}

        out: list[dict[str, Any]] = []
        for ts, snap in rows.groupby("snapshot_ts", sort=True):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            curr_digests: dict[tuple, list] = {}
            for rec in snap.itertuples(index=False):
                kc = _key(rec)
                curr_digests[kc] = [
                    _coerce(j, getattr(rec, m)) for j, m in enumerate(metric_cols)
                ]
            if prev_ts_us is not None:  # T2: first snapshot emits nothing
                dt = (ts_us - prev_ts_us) / 1_000_000.0
                for kc, curr_m in curr_digests.items():
                    prev_m = prev_digests.get(kc)
                    deltas = [
                        _delta(c, None if prev_m is None else prev_m[i])
                        for i, c in enumerate(curr_m)
                    ]
                    if activity_col is not None:
                        act = deltas[metric_cols.index(activity_col)]
                        if act is None or act <= 0:  # P3
                            continue
                    rec_out = {
                        "instance_id": instance_id,
                        "snapshot_ts": pd.Timestamp(ts),
                        **dict(zip(key_cols, kc)),
                        **{f"{m}_delta": d for m, d in zip(metric_cols, deltas)},
                        "time_period_seconds": dt,
                    }
                    out.append(rec_out)
            prev_ts_us, prev_digests = ts_us, curr_digests

        state.update(
            (
                prev_ts_us,
                [list(k) for k in prev_digests],
                *[
                    [vals[j] for vals in prev_digests.values()]
                    for j in range(n_metrics)
                ],
            )
        )
        if out:
            yield pd.DataFrame(out)

    return fn


def stateful_deltas(
    snapshots: DataFrame,
    key_cols: Sequence[str],
    metric_fields: Sequence[tuple[str, T.DataType]],
    activity_col: str | None = None,
) -> DataFrame:
    """Wire the stateful delta over a *streaming* snapshots DataFrame."""
    metric_cols = [m for m, _ in metric_fields]
    metric_types = [dt for _, dt in metric_fields]
    return snapshots.groupBy("instance_id").applyInPandasWithState(
        make_delta_fn(list(key_cols), metric_cols, activity_col, metric_types),
        outputStructType=output_schema(key_cols, metric_fields),
        stateStructType=state_schema(key_cols, metric_fields),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------- sinks ---
def idempotent_parquet_sink(path: str):
    """foreachBatch writer with exactly-once semantics via batch-scoped
    overwrite: each micro-batch lands in ``_batch=<epoch>`` and a retried
    epoch overwrites its own directory instead of appending twice
    (SURVEY §7.3 "rollup idempotency"). Readers just scan ``path``."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/_batch={epoch_id}")

    return write


def run_replay(
    stream_df: DataFrame,
    checkpoint_dir: str,
    sink_path: str | None = None,
    query_name: str = "qan_deltas",
):
    """Run a bounded (availableNow) pass of the stateful pipeline.

    With a sink path: idempotent parquet append. Without: in-memory table
    named ``query_name`` for inspection/tests.
    """
    writer = stream_df.writeStream.option("checkpointLocation", checkpoint_dir)
    if sink_path is None:
        q = writer.format("memory").queryName(query_name).outputMode("append").start()
    else:
        q = writer.foreachBatch(idempotent_parquet_sink(sink_path)).start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return q
