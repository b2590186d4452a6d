"""Streaming top-k over an UNBOUNDED key space — Space-Saving in state.

`stream_top_digests` holds one state row per digest, which is correct
because perf-schema caps digest cardinality at ~10k. A stream whose key
space is unbounded (URLs, tokens, user agents) breaks that: exact
per-key state IS the corpus. Two-pass pruning (analytics/heavy_hitters)
needs a second pass a stream never gets — so the streaming answer is the
Space-Saving sketch (Metwally et al., ICDT'05), the summary with the
strongest known guarantees at this size:

- capacity-m summary per SHARD (keys hash-shard, so shard summaries
  cover disjoint key sets and never need cross-shard reconciliation);
- any key with true shard count > n_shard/m is IN the summary, and each
  estimate overshoots its true count by at most its recorded
  ``err_bound`` (the count the evicted predecessor bequeathed);
- folding a whole micro-batch: observed keys already in the summary add
  their counts; new keys evict the current minimum and inherit its
  count as error. Associative enough for batch-at-a-time folding; the
  guarantee holds for any arrival order.

Emission: per batch, each touched shard re-emits its full summary with
``version`` = rows absorbed so far (superseding contract — read the
max-version rows per shard, same as the islands operator). State is
EXACTLY 3·m scalars per shard regardless of stream length — the bound
that makes this deployable where the exact operator is not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("key", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("err_bound", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def fold_space_saving(
    summary: dict[str, tuple[int, int]], capacity: int, batch_counts
) -> dict[str, tuple[int, int]]:
    """Fold (key -> observed count) into a Space-Saving summary
    (key -> (est, err)). Pure function; unit-tested directly."""
    for key, c in batch_counts:
        c = int(c)
        if key in summary:
            est, err = summary[key]
            summary[key] = (est + c, err)
        elif len(summary) < capacity:
            summary[key] = (c, 0)
        else:
            evict_key = min(summary, key=lambda k: (summary[k][0], k))
            floor_est = summary[evict_key][0]
            del summary[evict_key]
            summary[key] = (floor_est + c, floor_est)
    return summary


def make_topk_fn(capacity: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.exists:
            keys_l, counts_l, errs_l, version = state.get
            summary = {
                k: (int(c), int(e))
                for k, c, e in zip(keys_l, counts_l, errs_l)
            }
        else:
            summary, version = {}, 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            counts = pdf["key"].value_counts()
            absorbed += int(counts.sum())
            fold_space_saving(summary, capacity, counts.items())
        if not absorbed:
            return
        version += absorbed
        ks = list(summary)
        state.update(
            (
                ks,
                [summary[k][0] for k in ks],
                [summary[k][1] for k in ks],
                version,
            )
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(ks),
                "key": ks,
                "est_count": [summary[k][0] for k in ks],
                "err_bound": [summary[k][1] for k in ks],
                "version": [version] * len(ks),
            }
        )

    return fn


def streaming_topk(
    stream: DataFrame,
    key_col: str = "key",
    n_shards: int = 8,
    capacity: int = 64,
) -> DataFrame:
    """Wire Space-Saving over a streaming DataFrame. ``capacity`` is per
    shard, and so is the guarantee: a key is guaranteed present in its
    shard's summary iff its count exceeds n_shard/capacity, where
    n_shard is the number of rows THAT SHARD received (the classic
    Space-Saving pigeonhole). Hash-sharding makes n_shard ≈ n/n_shards
    only when key mass is spread; a skewed shard weakens its own bound
    (never the other shards'), so size ``capacity`` for the largest
    shard you expect, not the average."""
    sharded = stream.select(
        (F.abs(F.xxhash64(F.col(key_col))) % n_shards)
        .cast("int")
        .alias("shard"),
        F.col(key_col).alias("key"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_topk_fn(capacity),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
