"""User-behavior analytics: ordered funnels and cohort retention.

The event-sequence queries every product-analytics surface ships (and the
reference's notebook workload implies over its events table): which users
progress through an ordered stage sequence, and how cohorts decay over
time. Both are expressible as chained equi-joins + aggregations — no
window over the whole user history, no nested loops — so they shuffle on
the user key only and scale with the (users × stages) relation, not the
raw event volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage i+1 iff they have a
    stage-i+1 event AT OR AFTER their earliest qualifying stage-i time
    (the strict-progression semantics analytics engines call a "closed"
    funnel).

    Returns (stage_idx, stage, n_users) — one row per stage.

    Plan shape: stage 1 is one groupBy(user); each later stage is an
    equi-join of the (shrinking) qualified-user relation against that
    stage's events + one groupBy(user). At 100 TB the per-stage relations
    are bounded by the user count; nothing rescans the full event table
    more than once per stage (filter pushdown prunes each scan to one
    event type).
    """
    qualified = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    counts = [qualified.agg(F.count(F.lit(1)).alias("n_users"))]
    for stage in stages[1:]:
        qualified = (
            events.filter(F.col(type_col) == stage)
            .join(qualified.select(user_col, "_t"), user_col)
            .filter(F.col(ts_col) >= F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        counts.append(qualified.agg(F.count(F.lit(1)).alias("n_users")))
    out = None
    for i, (stage, c) in enumerate(zip(stages, counts), start=1):
        row = c.select(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col("n_users").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int = 30,
) -> DataFrame:
    """Cohort retention: users grouped by first-activity date; for each
    (cohort_date, day offset) the count of cohort members active that day.

    Returns (cohort_date, offset_days, n_users).

    Plan shape: one groupBy(user) for cohort assignment, one distinct over
    (user, day), one equi-join on user, one final aggregation — every
    shuffle keys on user or (cohort, offset), both well-distributed.
    """
    cohorts = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("cohort_date")
    )
    active = events.select(user_col, F.to_date(ts_col).alias("_day")).distinct()
    return (
        active.join(cohorts, user_col)
        .select(
            "cohort_date",
            F.datediff(F.col("_day"), F.col("cohort_date")).cast("long").alias(
                "offset_days"
            ),
            F.col(user_col),
        )
        .filter(F.col("offset_days") <= max_offset_days)
        .groupBy("cohort_date", "offset_days")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def sequence_funnel(
    events: DataFrame,
    stages: Sequence[str],
    within_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """A44: TIME-BOUNDED (anchored-window) sequence funnel — "A then B
    then C, all within T of the user's first A" — the windowed
    conversion semantics of ClickHouse's windowFunnel, where the
    unbounded :func:`funnel` is the special case T = ∞.

    Anchor = the user's EARLIEST stage-1 event; every later stage must
    occur strictly after the previous stage's chosen time and at or
    before anchor + ``within_us``.  Under a FIXED global deadline,
    greedy-earliest per stage is provably optimal (induction: the
    minimal feasible t_i dominates any other choice, since later stages
    only need t > t_i and the deadline never moves), so this plan finds
    a completion iff one exists for that anchor.  Per-step deadlines or
    multi-anchor scans are deliberately NOT this operator: the former
    makes greedy incomplete, the latter multiplies the scan by the
    anchor count — both documented extensions, not silent behaviors.

    Returns (stage_idx, stage, n_users).  Plan: identical join topology
    to :func:`funnel` — per stage, one type-pruned scan equi-joined to
    the shrinking qualified-user relation (bounded by |users|), plus the
    window predicate; nothing quadratic, nothing rescanned.
    """
    qualified = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
        .withColumn("_deadline_us", F.unix_micros(F.col("_t")) + F.lit(within_us))
    )
    counts = [qualified.agg(F.count(F.lit(1)).alias("n_users"))]
    for stage in stages[1:]:
        qualified = (
            events.filter(F.col(type_col) == stage)
            .join(qualified.select(user_col, "_t", "_deadline_us"), user_col)
            .filter(
                (F.unix_micros(F.col(ts_col)) > F.unix_micros(F.col("_t")))
                & (F.unix_micros(F.col(ts_col)) <= F.col("_deadline_us"))
            )
            .groupBy(user_col, "_deadline_us")
            .agg(F.min(ts_col).alias("_t"))
        )
        counts.append(qualified.agg(F.count(F.lit(1)).alias("n_users")))
    out = None
    for i, (stage, c) in enumerate(zip(stages, counts), start=1):
        row = c.select(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.coalesce(F.col("n_users"), F.lit(0)).cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def sequence_funnel_times(
    events: DataFrame,
    stages: Sequence[str],
    within_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user greedy-earliest stage times for the anchored funnel —
    the per-user relation behind A44's counts (same loop, same proofs;
    see :func:`sequence_funnel`). Returns (user_col, stage_idx, t_us)
    for every stage the user reached."""
    qualified = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
        .withColumn("_deadline_us", F.unix_micros(F.col("_t")) + F.lit(within_us))
    )
    out = qualified.select(
        user_col, F.lit(1).alias("stage_idx"), F.unix_micros("_t").alias("t_us")
    )
    for i, stage in enumerate(stages[1:], start=2):
        qualified = (
            events.filter(F.col(type_col) == stage)
            .join(qualified.select(user_col, "_t", "_deadline_us"), user_col)
            .filter(
                (F.unix_micros(F.col(ts_col)) > F.unix_micros(F.col("_t")))
                & (F.unix_micros(F.col(ts_col)) <= F.col("_deadline_us"))
            )
            .groupBy(user_col, "_deadline_us")
            .agg(F.min(ts_col).alias("_t"))
        )
        out = out.unionByName(
            qualified.select(
                user_col, F.lit(i).alias("stage_idx"), F.unix_micros("_t").alias("t_us")
            )
        )
    return out


def sequence_funnel_latency(
    events: DataFrame,
    stages: Sequence[str],
    within_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """A50: how long each funnel transition takes — per consecutive
    stage pair, exact-int order statistics (lower median / lower p90 at
    rank ceil(q·n), the repo-wide quantile rule) and max of
    t_next − t_prev micros over users who completed the transition.
    The companion a conversion dashboard needs beside A44's counts:
    WHERE users stall, not just how many survive.

    Plan: the per-user stage-time relation (|users|-bounded), one
    self-join per consecutive pair on (user, stage_idx+1), then one
    window over each transition partition — the same |users|-bounded
    windowing contract as O5."""
    from pyspark.sql.window import Window

    times = sequence_funnel_times(
        events, stages, within_us, user_col=user_col, ts_col=ts_col, type_col=type_col
    )
    nxt = times.select(
        F.col(user_col),
        (F.col("stage_idx") - 1).alias("stage_idx"),
        F.col("t_us").alias("t_next_us"),
    )
    deltas = times.join(nxt, [user_col, "stage_idx"]).select(
        F.col("stage_idx").alias("transition_idx"),
        (F.col("t_next_us") - F.col("t_us")).alias("delta_us"),
    )
    w = Window.partitionBy("transition_idx").orderBy("delta_us")
    wall = Window.partitionBy("transition_idx")
    ranked = deltas.select(
        "transition_idx",
        "delta_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_users"),
    )
    stats = ranked.groupBy("transition_idx", "n_users").agg(
        F.min(
            F.when(F.col("rn") == F.ceil(F.col("n_users") * 0.5), F.col("delta_us"))
        ).alias("median_delta_us"),
        F.min(
            F.when(F.col("rn") == F.ceil(F.col("n_users") * 0.9), F.col("delta_us"))
        ).alias("p90_delta_us"),
        F.max("delta_us").alias("max_delta_us"),
    )
    labels = [
        (i, stages[i - 1], stages[i]) for i in range(1, len(stages))
    ]
    lab = events.sparkSession.createDataFrame(
        labels, "transition_idx int, from_stage string, to_stage string"
    )
    return stats.join(F.broadcast(lab), "transition_idx").select(
        "transition_idx",
        "from_stage",
        "to_stage",
        "n_users",
        "median_delta_us",
        "p90_delta_us",
        "max_delta_us",
    )
