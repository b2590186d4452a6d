"""Interval concurrency via distributed sweep-line.

"How many intervals are active at once?" is the capacity question behind
connection-pool sizing, concurrent-session dashboards and overlap billing.
The classic answer is a sweep-line: explode each interval into a +1 point
at its start and a -1 point at its (exclusive) end, order by time, and the
running sum IS the concurrency profile. Re-expressed for Spark:

- the +1/-1 point relation is a narrow union of two projections (no
  shuffle beyond the window's);
- the running sum is one window per partition key — Spark shuffles on the
  key once and each partition sorts locally;
- ties are handled by ordering ``(t, delta)``: ends (-1) sort before
  starts (+1) at the same instant, giving end-EXCLUSIVE semantics, and the
  default RANGE frame makes every peer row see the same cumulative value
  in both Spark and the SQL oracle.

Scale: the window partitions by the caller's key columns, so the pattern
holds at 100 TB exactly when keys bound partition size. For one global
timeline (no key) or a multi-month key span, slice time into coarse chunks
and carry the open-interval count across boundaries — the same
presplit-twin pattern as ``sessionize_presplit_events`` and
``metric_gap_fill_presplit``.

Reference parity: the reference has no interval operator; this extends
the §2.11 analytics family (A-series) for workload-overlap questions its
dashboards answer with per-second gauge sampling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_concurrency(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key concurrency profile: one row per sweep point with the number
    of intervals active just after it (end-exclusive).

    Returns ``(*key_cols, t, delta, concurrent)`` where ``delta`` is +1
    (an interval opened) or -1 (one closed) and ``concurrent`` is the
    running active count including every peer at the same ``(t, delta)``.
    """
    keys = list(key_cols)
    opens = df.select(
        *keys, F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    closes = df.select(
        *keys, F.col(end_col).alias("t"), F.lit(-1).alias("delta")
    )
    pts = opens.unionByName(closes)
    # Default (unspecified) frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW:
    # peers share one cumulative value, identically in Spark and DuckDB.
    w = Window.partitionBy(*keys).orderBy("t", "delta")
    return pts.withColumn("concurrent", F.sum("delta").over(w))


def interval_peaks(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key peak concurrency summary: ``(*key_cols, n_intervals,
    peak_concurrent)``. One key-shuffle for the sweep window, then a
    map-side-combining aggregate over the already-partitioned points."""
    keys = list(key_cols)
    prof = interval_concurrency(df, keys, start_col, end_col)
    return prof.groupBy(*keys).agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        F.max("concurrent").alias("peak_concurrent"),
    )


def interval_merge(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-key interval coalescing ("islands"): overlapping-or-touching
    intervals merge into maximal covered spans — the timeline-union
    primitive behind uptime/coverage accounting, maintenance-window
    dedup, and "total active time" billing (the other half of the
    sweep-line family: concurrency asks how DEEP the overlap is, merge
    asks how WIDE the cover is).

    Plan: one hash partitioning on the key carries everything — a
    rows-frame running max of interval ends (excluding the current row)
    flags island starts (``start > max(prev ends)``), the default-RANGE
    running sum of flags numbers the islands, and the final
    groupBy(keys, island) reuses the SAME partitioning (keys is a prefix
    of the grouping — no second exchange, pinned by tests). Linear per
    key at 100 TB; long-span keys slice with the same boundary-carry
    presplit pattern as the concurrency operator.

    Tie safety: identical (start, end) twins order arbitrarily, but the
    first-ordered twin always carries the island-open flag and peers
    share the RANGE-frame cumulative id, so (island_id, bounds, count)
    are engine-invariant.

    Returns ``(*key_cols, island_id, island_start, island_end,
    n_intervals, covered_us)`` — covered_us the exact µs width of the
    merged span.
    """
    keys = list(key_cols)
    # weight_col: each input row counts as this many intervals in
    # n_intervals (the presplit twin passes level-1 island counts through)
    order = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max = (
        F.max(F.col(end_col))
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
    )
    weight = (
        F.col(weight_col) if weight_col is not None else F.lit(1)
    ).alias("_w")
    flagged = df.select(
        *keys,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        weight,
        F.when(
            prev_max.isNull() | (F.col(start_col) > prev_max), 1
        ).otherwise(0).alias("_new"),
    )
    order_f = Window.partitionBy(*keys).orderBy("_s", "_e")
    with_id = flagged.withColumn(
        "island_id", F.sum("_new").over(order_f)
    )
    return with_id.groupBy(*keys, "island_id").agg(
        F.min("_s").alias("island_start"),
        F.max("_e").alias("island_end"),
        F.sum("_w").cast("long").alias("n_intervals"),
        (
            F.max(F.unix_micros(F.col("_e")))
            - F.min(F.unix_micros(F.col("_s")))
        ).alias("covered_us"),
    )


def interval_merge_presplit(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    chunk: str = "1 day",
) -> DataFrame:
    """Hot-key-safe twin of :func:`interval_merge` — the boundary-carry
    presplit pattern the sessionize/gap-fill twins use, applied to
    islands: a key with 10⁹ intervals in one window partition is the
    scale failure mode of the plain operator, so the merge runs in two
    levels:

    1. intervals group by (key, start-time chunk) and merge WITHIN each
       chunk — window partitions are bounded by per-chunk density, never
       by key lifetime;
    2. the level-1 islands (already ≥10-10⁶× fewer rows than raw
       intervals on telemetry-shaped data) merge again per key, stitching
       islands that cross chunk boundaries; level-1 counts pass through
       the ``weight_col`` hook so ``n_intervals`` still counts RAW
       intervals.

    Level-2 is still a per-key window; its input is the island count,
    which is what makes the bound useful — islands ≪ intervals whenever
    overlap exists (the no-overlap worst case degenerates to the plain
    operator's partition size and needs coarser chunks, documented).
    Output is IDENTICAL to the plain operator for every chunking
    (pinned by the equivalence property test), because merging is
    associative over time-ordered fragments.
    """
    chunk_us = {
        "1 hour": 3_600_000_000,
        "1 day": 86_400_000_000,
        "7 days": 7 * 86_400_000_000,
    }.get(chunk)
    if chunk_us is None:
        raise ValueError(f"unsupported chunk: {chunk!r}")
    keys = list(key_cols)
    chunked = df.withColumn(
        "_chunk", F.expr(f"unix_micros({start_col}) div {chunk_us}")
    )
    lvl1 = interval_merge(
        chunked, keys + ["_chunk"], start_col, end_col
    ).select(
        *keys,
        F.col("island_start").alias("_s1"),
        F.col("island_end").alias("_e1"),
        F.col("n_intervals").alias("_n1"),
    )
    return interval_merge(lvl1, keys, "_s1", "_e1", weight_col="_n1")
