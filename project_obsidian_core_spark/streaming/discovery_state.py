"""T17: streaming per-user discovery timeline — the live twin of the A38
batch operator (plans/behavior_queries.events_discovery_timeline).

State per user is the min-(ts, event_id) first occurrence of every event
type seen so far — a commutative/associative MIN fold, so ANY arrival
order (late data, shuffled replay) converges to the batch answer.  The
subtlety a naive "emit on first sight" misses: an out-of-order batch can
carry an EARLIER occurrence of an already-discovered type, which can
reshuffle the user's whole rank order retroactively.  The emission
contract is therefore SUPERSEDING VERSIONED SETS (the islands/topk
contract): each batch that touches a user re-emits the user's full
discovery timeline with a monotonically increasing ``version``; readers
take each user's max-version rows.  Final max-version rows ≡ the batch
A38 output, pinned by a shuffled multi-batch replay test.

State bound: one (type, ts, id) triple per event type the user ever
used — the same |users|x|types| bound as the batch operator's output,
independent of event volume.
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
        T.StructField("types", T.ArrayType(T.StringType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("eids", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("first_ts_us", T.LongType()),
        T.StructField("first_event_id", T.LongType()),
        T.StructField("discovery_rank", T.IntegerType()),
        T.StructField("version", T.LongType()),
    ]
)


def fold_first_seen(
    seen: dict[str, tuple[int, int]], rows
) -> dict[str, tuple[int, int]]:
    """Fold (event_type, ts_us, event_id) rows into the per-type min
    (ts_us, event_id).  Pure, commutative in row order; unit-tested
    directly."""
    for et, ts, eid in rows:
        cur = seen.get(et)
        cand = (int(ts), int(eid))
        if cur is None or cand < cur:
            seen[et] = cand
    return seen


def _discovery_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user = int(key[0])
    if state.exists:
        types_l, ts_l, eid_l, version = state.get
        seen = {
            t: (int(ts), int(e)) for t, ts, e in zip(types_l, ts_l, eid_l)
        }
    else:
        seen, version = {}, 0
    absorbed = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        absorbed += len(pdf)
        fold_first_seen(
            seen,
            zip(pdf["event_type"], pdf["ts_us"], pdf["event_id"]),
        )
    if not absorbed:
        return
    version += absorbed
    types = list(seen)
    state.update(
        (
            types,
            [seen[t][0] for t in types],
            [seen[t][1] for t in types],
            version,
        )
    )
    ordered = sorted(seen.items(), key=lambda kv: kv[1])
    yield pd.DataFrame(
        {
            "user_id": [user] * len(ordered),
            "event_type": [t for t, _ in ordered],
            "first_ts_us": [v[0] for _, v in ordered],
            "first_event_id": [v[1] for _, v in ordered],
            "discovery_rank": list(range(1, len(ordered) + 1)),
            "version": [version] * len(ordered),
        }
    )


def streaming_discovery(stream: DataFrame) -> DataFrame:
    """Wire the discovery fold over a streaming DataFrame with columns
    (user_id, event_type, ts, event_id)."""
    rows = stream.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    return rows.groupBy("user_id").applyInPandasWithState(
        _discovery_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
