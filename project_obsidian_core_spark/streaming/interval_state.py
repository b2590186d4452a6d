"""Stateful streaming interval coalescing — live "islands" per key.

The streaming twin of :func:`operators.intervals.interval_merge`
(uptime/coverage accounting on a live feed): state per key is the
CURRENT disjoint island set, and every incoming interval folds into it
incrementally — no window over history, no reprocessing. The batch
operator is one sorted sweep; the streaming fold exploits that interval
union is associative and commutative, so ANY arrival order of the same
intervals converges to the same island set (pinned by the
shuffled-replay equivalence test against the batch operator).

Mechanics
---------
- state = three parallel arrays (island starts, ends, raw-interval
  counts), starts strictly increasing, islands pairwise non-touching —
  the canonical form; each incoming interval binary-searches its overlap
  span (touch-inclusive, matching the batch operator's
  ``start > prev_max`` rule) and splices in O(merged span).
- each micro-batch EMITS the full updated island set for keys it
  touched, stamped with ``version`` = total intervals absorbed by that
  key so far. Consumers (and the tests) read the per-key MAX-version
  rows — the same superseding contract a compacted changelog topic has;
  intermediate versions are the live dashboard's progressive view.
- state size = open islands per key, which telemetry-shaped data keeps
  orders of magnitude below interval count; a production deployment
  evicts islands whose end passed the watermark (they can never merge
  again) by emitting them as FINAL — the eviction hook is the same
  splice, not new machinery.

Scale: groups hash-partition by key across executors; per-batch work is
O(batch · log islands + merged spans). The state store checkpoints the
arrays as typed Arrow columns per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.ArrayType(T.LongType())),
        T.StructField("e", T.ArrayType(T.LongType())),
        T.StructField("n", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)


def output_schema(key_fields: Sequence[T.StructField]) -> T.StructType:
    """Emitted-row schema. Key field TYPES are taken from the input
    relation (``streaming_islands`` passes ``stream.schema[k]``): the
    fold copies key values through verbatim, so declaring them all as
    strings would fail Arrow conversion the moment a group key is, say,
    a long host_id."""
    return T.StructType(
        [
            *[T.StructField(f.name, f.dataType) for f in key_fields],
            T.StructField("island_start_us", T.LongType()),
            T.StructField("island_end_us", T.LongType()),
            T.StructField("n_intervals", T.LongType()),
            T.StructField("version", T.LongType()),
            T.StructField("is_final", T.BooleanType()),
        ]
    )


def fold_interval(
    s_arr: np.ndarray, e_arr: np.ndarray, n_arr: np.ndarray, s: int, e: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Splice one interval [s, e) into a canonical island set.

    Islands overlap-or-TOUCH the new interval iff ``end >= s`` and
    ``start <= e`` — binary search on the (strictly increasing) end and
    start arrays brackets the merge span.
    """
    lo = int(np.searchsorted(e_arr, s, side="left"))
    hi = int(np.searchsorted(s_arr, e, side="right"))
    if lo >= hi:  # disjoint from every island: insert at lo
        return (
            np.insert(s_arr, lo, s),
            np.insert(e_arr, lo, e),
            np.insert(n_arr, lo, 1),
        )
    new_s = min(int(s_arr[lo]), s)
    new_e = max(int(e_arr[hi - 1]), e)
    new_n = int(n_arr[lo:hi].sum()) + 1
    return (
        np.concatenate([s_arr[:lo], [new_s], s_arr[hi:]]),
        np.concatenate([e_arr[:lo], [new_e], e_arr[hi:]]),
        np.concatenate([n_arr[:lo], [new_n], n_arr[hi:]]),
    )


def make_islands_fn(key_cols: Sequence[str], evict: bool = False):
    """``evict=True`` enables watermark eviction: islands whose end is
    older than the group-state watermark can never merge again (the
    watermark bounds how late a new interval's start may be), so they
    are emitted once with ``is_final=True`` and DROPPED from state —
    this is what keeps state at "open islands", not "all islands", on
    an unbounded stream. Requires ``withWatermark`` on the source."""
    keys = list(key_cols)

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_l, e_l, n_l, version = state.get
            s_arr = np.asarray(s_l, dtype=np.int64)
            e_arr = np.asarray(e_l, dtype=np.int64)
            n_arr = np.asarray(n_l, dtype=np.int64)
        else:
            s_arr = np.empty(0, dtype=np.int64)
            e_arr = np.empty(0, dtype=np.int64)
            n_arr = np.empty(0, dtype=np.int64)
            version = 0
        absorbed = 0
        for pdf in pdfs:
            for s, e in zip(
                pdf["start_us"].to_numpy(), pdf["end_us"].to_numpy()
            ):
                s_arr, e_arr, n_arr = fold_interval(
                    s_arr, e_arr, n_arr, int(s), int(e)
                )
                absorbed += 1
        if not absorbed:
            return
        version += absorbed

        def emit(sa, ea, na, final):
            return pd.DataFrame(
                {
                    **{k: [key[i]] * len(sa) for i, k in enumerate(keys)},
                    "island_start_us": sa,
                    "island_end_us": ea,
                    "n_intervals": na,
                    "version": np.full(len(sa), version, dtype=np.int64),
                    "is_final": np.full(len(sa), final, dtype=bool),
                }
            )

        if evict:
            wm_us = state.getCurrentWatermarkMs() * 1000
            closed = e_arr < wm_us  # strictly: end < watermark never merges
            if closed.any():
                yield emit(s_arr[closed], e_arr[closed], n_arr[closed], True)
                s_arr, e_arr, n_arr = (
                    s_arr[~closed],
                    e_arr[~closed],
                    n_arr[~closed],
                )
        state.update((s_arr.tolist(), e_arr.tolist(), n_arr.tolist(), version))
        if len(s_arr):
            yield emit(s_arr, e_arr, n_arr, False)

    return fn


def streaming_islands(
    stream: DataFrame, key_cols: Sequence[str], evict: bool = False
) -> DataFrame:
    """Wire the stateful fold over a streaming DataFrame with columns
    ``(*key_cols, start_us, end_us)``. Emits superseding island-set
    versions per key; the current set = all ``is_final`` rows plus the
    max-version live rows. With ``evict=True`` (requires a watermarked
    source) closed islands leave state — the unbounded-stream mode."""
    return stream.groupBy(*key_cols).applyInPandasWithState(
        make_islands_fn(key_cols, evict=evict),
        outputStructType=output_schema([stream.schema[k] for k in key_cols]),
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
