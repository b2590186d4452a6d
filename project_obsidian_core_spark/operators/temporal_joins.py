"""Temporal joins Spark lacks natively: as-of join and binned range join.

Time-series engines ship these as primitives (kdb ``aj``, DuckDB ``ASOF
JOIN``, QuestDB ``ASOF``/``LT`` joins); a metrics/QAN workload needs them to
align observations with the latest preceding reference point (as-of) and to
correlate events inside a time window around an anchor (range). Spark has
neither, and the naive formulations are scale-killers:

- as-of as a correlated subquery / inequality join → per-row probe,
  O(L·R) BroadcastNestedLoopJoin;
- range join as ``ON key = key AND ts BETWEEN …`` → same nested loop.

Both operators here re-express the semantics with equi-shuffles only:

- :func:`asof_join` unions the two sides, sorts once per key, and
  carries the right side's last non-null values forward with one window
  pass — one shuffle on the join key, O((L+R) log) per partition, the
  standard distributed as-of shape.
- :func:`range_join` bins time into fixed-width buckets; an anchor whose
  window spans b buckets explodes into b rows (b = span/bin + 1, constant),
  probes equi-join on (key, bin), and the exact bound filters after — the
  same binning trick engines expose as range-join hints.

Skew note: both shuffle on the entity key; a pathological hot key (one user
with 10⁸ events) follows the same salting escape hatch as
functions/skew.py. AQE skew-join splits oversized partitions automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same ``on`` key (left-outer: no match →
    nulls), without ever probing per-row.

    The right side must be unique per (key, ts) — pre-aggregate if not, or
    the carried value is engine-dependent (DuckDB's ASOF makes the same
    demand implicitly by picking an arbitrary row among equals).

    Plan: tag right rows 0 / left rows 1, union, and take
    ``last(value, ignorenulls)`` over (partition by key, order by ts, tag,
    rows unbounded-preceding..current): right rows sort before left rows at
    equal ts, so an exactly-simultaneous reference is visible (``<=``
    semantics). One exchange, one sort — nothing quadratic anywhere.
    """
    lcols = [c for c in left.columns if c != on]
    # the matched right row travels as ONE struct: carrying each value
    # column independently through last(ignorenulls) would substitute a
    # stale older value when the matched row's field is legitimately NULL,
    # yielding an (ts, value) combination that never existed
    ref = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    ref_type = right.select(ref.alias("_r")).schema["_r"].dataType.simpleString()
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        ref.alias("_ref"),
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_tag"),
        *lcols,
        F.lit(None).cast(ref_type).alias("_ref"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).withColumn(
        "_ref", F.last("_ref", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_tag") == 1).select(
        F.col(on),
        *lcols,
        F.col("_ref.ts").alias(f"{prefix}ts"),
        *[F.col(f"_ref.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )


def asof_join_presplit(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
    period: str = "1 day",
) -> DataFrame:
    """Hot-key-safe :func:`asof_join`: identical output, bounded tasks.

    The plain formulation sorts each key's full history in one task; a key
    with 10⁸ rows is a straggler AQE cannot split (window, not join). Here
    both sides are bucketed into ``period`` slices and the union-window
    carry runs per (key, period) — task size is bounded by rows per key per
    period. Left rows whose period holds no earlier right row take their
    value from a per-(key, period) CARRY relation: the last right struct of
    each period, carried forward across the (tiny, one row per bucket)
    period spine with a second window, then equi-joined back on
    (key, period).

    Cost: one extra shuffle of the events (the carry join reuses the
    (key, period) partitioning) plus a window over the bucket-level spine.
    Equivalence with :func:`asof_join` is pinned in tests across period
    boundaries.
    """
    period_us = F.expr(
        f"unix_micros(timestamp'1970-01-01 00:00:00' + INTERVAL {period})"
    )

    def bucket(ts: str) -> Column:
        return F.floor(F.unix_micros(F.col(ts)) / period_us).cast("long")

    lcols = [c for c in left.columns if c != on]
    ref = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    ref_type = right.select(ref.alias("_r")).schema["_r"].dataType.simpleString()
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        bucket(right_ts).alias("_p"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        ref.alias("_ref"),
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ats"),
        bucket(left_ts).alias("_p"),
        F.lit(1).alias("_tag"),
        *lcols,
        F.lit(None).cast(ref_type).alias("_ref"),
    )
    w = (
        Window.partitionBy(on, "_p")
        .orderBy("_ats", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = tagged_r.unionByName(tagged_l).withColumn(
        "_ref", F.last("_ref", ignorenulls=True).over(w)
    )

    # period spine: every (key, period) either side touches, with the last
    # right struct of the period (if any) carried forward across periods
    last_right = right.groupBy(F.col(on), bucket(right_ts).alias("_p")).agg(
        F.max_by(ref, F.col(right_ts)).alias("_period_ref")
    )
    spine = (
        tagged_l.select(on, "_p")
        .union(tagged_r.select(on, "_p"))
        .distinct()
        .join(last_right, [on, "_p"], "left")
    )
    ws = Window.partitionBy(on).orderBy("_p")
    carry = spine.select(
        on,
        "_p",
        F.last("_period_ref", ignorenulls=True)
        .over(ws.rowsBetween(Window.unboundedPreceding, -1))
        .alias("_carry_in"),
    )

    out = (
        within.filter(F.col("_tag") == 1)
        .join(carry, [on, "_p"])
        .withColumn("_ref", F.coalesce("_ref", "_carry_in"))
    )
    return out.select(
        F.col(on),
        *lcols,
        F.col("_ref.ts").alias(f"{prefix}ts"),
        *[F.col(f"_ref.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )


def range_join(
    anchors: DataFrame,
    probes: DataFrame,
    on: str,
    span_us: int,
    bin_us: int | None = None,
    anchor_ts: str = "ts",
    probe_ts: str = "ts",
) -> DataFrame:
    """All (anchor, probe) pairs with the same ``on`` key and
    ``anchor_ts - span < probe_ts <= anchor_ts``, via bucketed equi-join.

    ``bin_us`` defaults to ``span_us``: each anchor then covers exactly 2
    bins, so the explode fan-out is a constant 2 rows per anchor regardless
    of data volume; the (key, bin) equi-join hashes instead of
    nested-looping, and the precise interval filter runs on the joined
    pairs. Returns the pair relation (caller aggregates).
    """
    if bin_us is None:
        bin_us = span_us

    def _bin_of(us: Column) -> Column:
        # floor division via floor(): epoch µs (~1.7e15) is exact in double
        # (< 2^53), and floor keeps pre-epoch negatives correct
        return F.floor(us / F.lit(bin_us)).cast("long")

    a_us = F.unix_micros(F.col(anchor_ts))
    p_us = F.unix_micros(F.col(probe_ts))
    # per-anchor bin range [bin(a-span), bin(a)] — a fixed span//bin+1 count
    # is one bin short whenever bin_us doesn't divide the anchor's offset,
    # silently dropping pairs near the anchor timestamp
    a = anchors.select(
        F.col(on),
        *[c for c in anchors.columns if c != on],
        a_us.alias("_a_us"),
        F.explode(F.sequence(_bin_of(a_us - span_us), _bin_of(a_us))).alias("_a_bin"),
    )
    p = probes.select(
        F.col(on).alias("_p_key"),
        p_us.alias("_p_us"),
        _bin_of(p_us).alias("_p_bin"),
        *[
            F.col(c).alias(f"probe_{c}")
            for c in probes.columns
            if c not in (on, probe_ts)
        ],
    )
    return (
        a.join(p, (F.col(on) == F.col("_p_key")) & (F.col("_a_bin") == F.col("_p_bin")))
        .filter(
            (F.col("_p_us") > F.col("_a_us") - span_us)
            & (F.col("_p_us") <= F.col("_a_us"))
        )
        .drop("_p_key", "_a_bin", "_p_bin")
    )
