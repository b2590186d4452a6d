"""Stream-stream interval join: the streaming twin of
operators/temporal_joins.range_join.

Structured Streaming joins two watermarked streams with a time-interval
condition; Spark keeps each side buffered in state only as long as the
other side's watermark can still produce a match, then evicts — the
streaming analogue of the batch bin trick's bounded fan-out.

Cites the batch twin's semantics: pairs with equal keys and
``anchor_ts - span < probe_ts <= anchor_ts``. The driver-gated query
(plans/streaming_queries.stream_range_join) replays a bounded feed through
this join and must match the SAME oracle SQL as the batch operator —
streaming↔batch equivalence at the correctness gate, like
stream_snapshot_delta.

State sizing at fleet scale: per-key state holds ``span + watermark delay``
worth of both sides; the shuffle is on the join key (entity), so the skew
story is identical to the batch operator's (salting / AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    anchors: DataFrame,
    probes: DataFrame,
    on: str,
    span_seconds: int,
    watermark: str = "2 hours",
    anchor_ts: str = "ts",
    probe_ts: str = "ts",
) -> DataFrame:
    """Inner interval join of two streams on ``on`` with
    ``anchor_ts - span < probe_ts <= anchor_ts``.

    Both sides get the same watermark; the two-sided time bound is what
    lets Spark evict join state (an unbounded condition would buffer
    forever). Column names are prefixed ``a_`` / ``p_`` in the output.
    """
    a = anchors.withWatermark(anchor_ts, watermark).select(
        F.col(on).alias("a_key"),
        *[F.col(c).alias(f"a_{c}") for c in anchors.columns if c != on],
    )
    p = probes.withWatermark(probe_ts, watermark).select(
        F.col(on).alias("p_key"),
        *[F.col(c).alias(f"p_{c}") for c in probes.columns if c != on],
    )
    cond = (
        (F.col("a_key") == F.col("p_key"))
        & (
            F.col(f"p_{probe_ts}")
            > F.col(f"a_{anchor_ts}") - F.expr(f"INTERVAL {span_seconds} SECONDS")
        )
        & (F.col(f"p_{probe_ts}") <= F.col(f"a_{anchor_ts}"))
    )
    return a.join(p, cond, "inner")
