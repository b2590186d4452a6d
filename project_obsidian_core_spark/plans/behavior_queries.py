"""Driver-facing behavior-analytics queries: funnel + retention.

Both oracles are plain relational SQL over the events table, mirroring the
operators' join/aggregate chains exactly (int counts only — nothing
float-hashed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_obsidian_core_spark.analytics import behavior as B
from project_obsidian_core_spark.plans.common import cents, load

_STAGES = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase closed-funnel conversion counts."""
    return B.funnel(load(spark, sf_dir, "events"), _STAGES).orderBy("stage_idx")


ORACLE_events_funnel = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = '{_STAGES[0]}' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
    WHERE e.event_type = '{_STAGES[1]}'
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
    WHERE e.event_type = '{_STAGES[2]}'
    GROUP BY e.user_id
)
SELECT 1 AS stage_idx, '{_STAGES[0]}' AS stage,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, '{_STAGES[1]}', CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, '{_STAGES[2]}', CAST((SELECT count(*) FROM s3) AS BIGINT)
ORDER BY stage_idx
"""


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention counts over the events month."""
    return B.retention(load(spark, sf_dir, "events")).orderBy(
        "cohort_date", "offset_days"
    )


ORACLE_events_retention = """
WITH cohorts AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
    FROM events GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT c.cohort_date,
       CAST(date_diff('day', c.cohort_date, a.d) AS BIGINT) AS offset_days,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN cohorts c USING (user_id)
WHERE date_diff('day', c.cohort_date, a.d) <= 30
GROUP BY c.cohort_date, offset_days
ORDER BY c.cohort_date, offset_days
"""


# ------------------------------------------------- last-touch attribution --
#: attribution lookback: a purchase credits its most recent touch within
#: this many seconds, else the 'direct' channel.
_ATTR_LOOKBACK_S = 7 * 24 * 3600


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A28: last-touch revenue attribution — every purchase credits the
    user's most recent preceding click/view touch (channel = touch type +
    JSON campaign bucket) within a 7-day lookback, else 'direct'; revenue
    then aggregates per channel.

    The carry-forward is ONE window over the (user) partitioning —
    ``last(touch, ignorenulls=True)`` ordered by (ts, event_id), the same
    union-then-carry shape as the as-of join — so attribution costs a
    single user-key shuffle regardless of the touch:purchase ratio. No
    per-purchase backward scan, no range self-join: at 100 TB the
    row-at-a-time formulation (for each purchase, scan back for a touch)
    is a skew-amplified range join, while this plan is linear in events
    per user and hot users parallelize across their window sort run.
    Deterministic: event_id breaks same-instant ties; exact cents ints.
    """
    ev = load(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    campaign = F.get_json_object(F.col("props"), "$.k").cast("long") % 4
    touch_ch = F.when(
        is_touch,
        F.concat(F.col("event_type"), F.lit("_c"), campaign.cast("string")),
    )
    rows = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        cents("value").alias("cents"),
        touch_ch.alias("touch_ch"),
        F.when(is_touch, F.col("ts")).alias("touch_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = rows.select(
        "*",
        F.last("touch_ch", ignorenulls=True).over(w).alias("last_ch"),
        F.last("touch_ts", ignorenulls=True).over(w).alias("last_ts"),
    )
    purchases = carried.filter(F.col("event_type") == "purchase")
    in_window = F.col("last_ts").isNotNull() & (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_ts"))
        <= _ATTR_LOOKBACK_S * 1_000_000
    )
    attributed = purchases.select(
        F.when(in_window, F.col("last_ch")).otherwise(F.lit("direct")).alias(
            "channel"
        ),
        "cents",
    )
    return (
        attributed.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
        .orderBy("channel")
    )


ORACLE_events_attribution = f"""
WITH rows_ AS (
    SELECT user_id, ts, event_id, event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS cents,
           CASE WHEN event_type IN ('click', 'view')
                THEN event_type || '_c' ||
                     CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
                          AS VARCHAR)
           END AS touch_ch,
           CASE WHEN event_type IN ('click', 'view') THEN ts END AS touch_ts
    FROM events
), carried AS (
    SELECT *,
           last_value(touch_ch IGNORE NULLS) OVER w AS last_ch,
           last_value(touch_ts IGNORE NULLS) OVER w AS last_ts
    FROM rows_
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), attributed AS (
    SELECT CASE WHEN last_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(last_ts)
                     <= {_ATTR_LOOKBACK_S * 1_000_000}
                THEN last_ch ELSE 'direct' END AS channel,
           cents
    FROM carried
    WHERE event_type = 'purchase'
)
SELECT channel,
       count(*) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM attributed
GROUP BY channel
ORDER BY channel
"""


# --------------------------------------- A38: discovery timeline --------
def events_discovery_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A38: per-user DISCOVERY order of event types — the running exact
    count-distinct curve ("how fast do users reach their Nth distinct
    action"), the activation metric behind feature-adoption funnels.

    Exact running distinct is usually an O(state) window nightmare; the
    fold here makes it two cheap exchanges: first occurrences collapse by
    groupBy(user, type) -> min(struct(ts, event_id)) (map-side combined;
    ties broken by event_id, so the fold is total-order deterministic),
    then one row_number over the user partition ranks discoveries.  Rows
    out = users x types they ever used — corpus-independent once the
    group-by reduces.  The running-distinct value AT any timestamp is the
    rank of the latest discovery <= t; emitting the curve's breakpoints
    IS the curve.
    """
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id", "event_type").agg(
        F.min(F.struct("ts", "event_id")).alias("f")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("f.ts"), F.col("f.event_id")
    )
    return first.select(
        "user_id",
        "event_type",
        F.col("f.ts").alias("first_ts"),
        F.col("f.event_id").alias("first_event_id"),
        F.row_number().over(w).alias("discovery_rank"),
    ).orderBy("user_id", "discovery_rank")


ORACLE_events_discovery_timeline = """
WITH f AS (
    SELECT user_id, event_type,
           min(struct_pack(ts := ts, event_id := event_id)) AS fr
    FROM events
    GROUP BY user_id, event_type
)
SELECT user_id, event_type,
       fr.ts AS first_ts,
       fr.event_id AS first_event_id,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY fr.ts, fr.event_id) AS INT)
           AS discovery_rank
FROM f
ORDER BY user_id, discovery_rank
"""


# --------------------------------------- A40: Markov transition matrix --
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A40: first-order behavior transition matrix — for each ordered
    pair of event types, how often does a user's next action follow the
    previous one, and with what conditional probability.  The empirical
    Markov chain behind next-action prediction, anomaly screens
    ("purchase→purchase loops"), and the user-path summaries A27 samples.

    Plan: one lag window over (user → ts, event_id) (total-order
    deterministic ties, the A38 rule), then a two-level aggregate:
    groupBy(prev, next) map-side combines to ≤|types|² rows, and the
    per-prev totals ride a broadcast-sized window over THAT reduced
    relation — no second pass over the corpus.  Probabilities are exact
    ppm integers (n·10⁶ div row_total), so the matrix hashes bit-exact;
    rows out are |types|² regardless of event volume.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    mat = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wrow = Window.partitionBy("prev_type")
    return mat.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.sum("n_transitions").over(wrow).alias("row_total"),
        F.expr("n_transitions * 1000000 div sum(n_transitions) over "
               "(partition by prev_type)").alias("prob_ppm"),
    ).orderBy("prev_type", "next_type")


ORACLE_events_markov_transitions = """
WITH s AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type
    FROM events
), m AS (
    SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)
           AS row_total,
       n_transitions * 1000000
           // CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)
           AS prob_ppm
FROM m
ORDER BY prev_type, next_type
"""


# ---------------------------------- A44: anchored-window sequence funnel --
_SEQ_WINDOW_US = 3 * 3600 * 1_000_000  # 3 h global deadline from the anchor


def events_sequence_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A44: view → click → purchase completed within 3 h of the user's
    first view (:func:`analytics.behavior.sequence_funnel`) — the
    windowed-conversion counterpart of ``events_funnel``, whose counts
    it must bound from below stage by stage."""
    return B.sequence_funnel(
        load(spark, sf_dir, "events"), _STAGES, within_us=_SEQ_WINDOW_US
    ).orderBy("stage_idx")


ORACLE_events_sequence_funnel = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t,
           epoch_us(min(ts)) + {_SEQ_WINDOW_US} AS deadline_us
    FROM events
    WHERE event_type = '{_STAGES[0]}' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t, s1.deadline_us
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = '{_STAGES[1]}'
      AND epoch_us(e.ts) > epoch_us(s1.t)
      AND epoch_us(e.ts) <= s1.deadline_us
    GROUP BY e.user_id, s1.deadline_us
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = '{_STAGES[2]}'
      AND epoch_us(e.ts) > epoch_us(s2.t)
      AND epoch_us(e.ts) <= s2.deadline_us
    GROUP BY e.user_id
)
SELECT 1 AS stage_idx, '{_STAGES[0]}' AS stage,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, '{_STAGES[1]}', CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, '{_STAGES[2]}', CAST((SELECT count(*) FROM s3) AS BIGINT)
ORDER BY stage_idx
"""


#: the latency gate uses a wider 24 h window than A44's 3 h: at gate SF
#: the 3 h funnel leaves stage 3 empty, and a latency report needs
#: completed transitions to measure (both gates stay independent knobs).
_LAT_WINDOW_US = 24 * 3600 * 1_000_000


def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A50: inter-stage latency order statistics for the A44 anchored
    funnel (lower median / lower p90 / max of t_next - t_prev per
    completed transition) — where users stall, not just how many
    survive."""
    from project_obsidian_core_spark.analytics.behavior import (
        sequence_funnel_latency,
    )

    return sequence_funnel_latency(
        load(spark, sf_dir, "events"), _STAGES, _LAT_WINDOW_US
    ).orderBy("transition_idx")


ORACLE_events_funnel_latency = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t,
           epoch_us(min(ts)) + {_LAT_WINDOW_US} AS deadline_us
    FROM events
    WHERE event_type = '{_STAGES[0]}' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t, s1.deadline_us
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = '{_STAGES[1]}'
      AND epoch_us(e.ts) > epoch_us(s1.t)
      AND epoch_us(e.ts) <= s1.deadline_us
    GROUP BY e.user_id, s1.deadline_us
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = '{_STAGES[2]}'
      AND epoch_us(e.ts) > epoch_us(s2.t)
      AND epoch_us(e.ts) <= s2.deadline_us
    GROUP BY e.user_id
), deltas AS (
    SELECT 1 AS transition_idx,
           epoch_us(s2.t) - epoch_us(s1.t) AS delta_us
    FROM s1 JOIN s2 USING (user_id)
    UNION ALL
    SELECT 2, epoch_us(s3.t) - epoch_us(s2.t)
    FROM s2 JOIN s3 USING (user_id)
), ranked AS (
    SELECT transition_idx, delta_us,
           row_number() OVER (PARTITION BY transition_idx ORDER BY delta_us) AS rn,
           count(*) OVER (PARTITION BY transition_idx) AS n_users
    FROM deltas
), stats AS (
    SELECT transition_idx, CAST(n_users AS BIGINT) AS n_users,
           min(CASE WHEN rn = ceil(n_users * 0.5) THEN delta_us END)
               AS median_delta_us,
           min(CASE WHEN rn = ceil(n_users * 0.9) THEN delta_us END)
               AS p90_delta_us,
           max(delta_us) AS max_delta_us
    FROM ranked
    GROUP BY transition_idx, n_users
)
SELECT stats.transition_idx,
       CASE stats.transition_idx WHEN 1 THEN '{_STAGES[0]}' ELSE '{_STAGES[1]}' END
           AS from_stage,
       CASE stats.transition_idx WHEN 1 THEN '{_STAGES[1]}' ELSE '{_STAGES[2]}' END
           AS to_stage,
       stats.n_users, stats.median_delta_us, stats.p90_delta_us,
       stats.max_delta_us
FROM stats
ORDER BY stats.transition_idx
"""


# ------------------------------------ A56: event-type affinity (lift) -----
def events_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A56: which event types CO-OCCUR in the same user's history beyond
    chance — per unordered type pair (t1 < t2), exact integer lift:
    lift_ppm = n_both · N_users · 10⁶ div (n_t1 · n_t2), the
    market-basket measure (X20's collocation lift applied to user
    baskets instead of token adjacency).  Above 10⁶ = attract (users
    who do one do the other), below = repel — the screen behind
    "purchase implies click" sanity checks and feature-cross pruning.

    Plan: ONE corpus scan reduces to the distinct (user, type) relation
    (≤ |users|·|types| rows); the pair join is per-user with t1 < t2
    (fan-out ≤ C(|types|,2) per user); everything after is ≤ |types|²
    rows with the per-type counts and the 1-row user total broadcast
    onto it.  All integers exact.
    """
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_users = ev.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    per_type = ut.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n_t")
    )
    pairs = (
        ut.select("user_id", F.col("event_type").alias("t1"))
        .join(ut.select("user_id", F.col("event_type").alias("t2")), "user_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(per_type.select(F.col("t").alias("t1"),
                                        F.col("n_t").alias("n_t1"))), "t1"
        )
        .join(
            F.broadcast(per_type.select(F.col("t").alias("t2"),
                                        F.col("n_t").alias("n_t2"))), "t2"
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "t1",
            "t2",
            "n_both",
            "n_t1",
            "n_t2",
            F.expr("n_both * n_users * 1000000 div (n_t1 * n_t2)").alias(
                "lift_ppm"
            ),
        )
        .orderBy("t1", "t2")
    )


ORACLE_events_type_affinity = """
WITH ut AS (
    SELECT DISTINCT user_id, event_type FROM events
), nu AS (
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events
), pt AS (
    SELECT event_type AS t, CAST(count(*) AS BIGINT) AS n_t
    FROM ut GROUP BY 1
), pairs AS (
    SELECT a.event_type AS t1, b.event_type AS t2,
           CAST(count(*) AS BIGINT) AS n_both
    FROM ut a JOIN ut b ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
    GROUP BY 1, 2
)
SELECT p.t1, p.t2, p.n_both,
       x.n_t AS n_t1, y.n_t AS n_t2,
       p.n_both * nu.n_users * 1000000 // (x.n_t * y.n_t) AS lift_ppm
FROM pairs p
JOIN pt x ON x.t = p.t1
JOIN pt y ON y.t = p.t2
CROSS JOIN nu
ORDER BY p.t1, p.t2
"""


# --------------------------------------- A58: DAU/MAU stickiness ratio ---
_STICKY_WINDOW_DAYS = 30


def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A58: per-day stickiness — DAU ÷ trailing-30-day MAU in exact ppm,
    the engagement ratio product analytics watches daily (40%+ = daily
    habit, <10% = monthly utility).  EXACT overlapping-window distinct
    via the A23 move: each distinct (user, day) row fans out to the ≤30
    target days whose trailing window contains it, then one distinct
    aggregate per target day — never an approximate sketch, never a
    per-day rescan.  Only days with events surface (the data's own
    calendar); DAU rides the same reduced relation.
    """
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    fan = (
        ud.select(
            "user_id",
            F.explode(
                F.expr(
                    f"sequence(day, day + {_STICKY_WINDOW_DAYS - 1})"
                )
            ).alias("target_day"),
        )
        .join(days.withColumnRenamed("day", "target_day"), "target_day")
        .groupBy("target_day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(fan, F.col("day") == F.col("target_day"))
        .select(
            "day",
            "dau",
            "mau",
            F.expr("dau * 1000000 div mau").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


ORACLE_events_stickiness = f"""
WITH ud AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), days AS (
    SELECT DISTINCT day FROM ud
), dau AS (
    SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
    FROM ud GROUP BY 1
), mau AS (
    SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
    FROM days d JOIN ud u
      ON u.day <= d.day AND u.day > d.day - {_STICKY_WINDOW_DAYS}
    GROUP BY 1
)
SELECT dau.day, dau.dau, mau.mau,
       dau.dau * 1000000 // mau.mau AS stickiness_ppm
FROM dau JOIN mau ON dau.day = mau.day
ORDER BY dau.day
"""


# ---------------------------------- A59: top length-3 behavior paths -----
_TRIGRAM_TOPK = 20


def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A59: the most common length-3 action paths — second-order
    sequence structure the A40 first-order matrix marginalizes away
    (a→b→a loops vs a→b→c progressions read identically to a Markov
    matrix, completely differently to a product flow).  Two lag windows
    over the same (user → ts, event_id) total order the A40 plan
    already pays, a ≤|types|³ aggregate, TakeOrdered top-k with
    count-desc/path-asc determinism.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.lag("event_type", 2).over(w).alias("s1"),
        F.lag("event_type", 1).over(w).alias("s2"),
        F.col("event_type").alias("s3"),
    ).filter(F.col("s1").isNotNull())
    return (
        tri.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "s1", "s2", "s3")
        .limit(_TRIGRAM_TOPK)
    )


ORACLE_events_trigram_paths = f"""
WITH tri AS (
    SELECT lag(event_type, 2) OVER w AS s1,
           lag(event_type, 1) OVER w AS s2,
           event_type AS s3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n_paths
FROM tri WHERE s1 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, s1, s2, s3
LIMIT {_TRIGRAM_TOPK}
"""


# ----------------------------------------------- A60: arrival burstiness
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A60: index of dispersion (Fano factor) of per-minute arrival
    counts, per event type — the bursty-vs-Poisson screen behind alert
    throttling and capacity head-room sizing (Fano ≈ 1 = memoryless
    arrivals; ≫ 1 = batched/bursty traffic that needs peak, not mean,
    provisioning).

    Empty minutes COUNT: the statistic is defined over every minute of
    the type's own [first, last] span.  They are never materialized —
    with span = max−min+1 buckets, N events and Σc² over the non-zero
    buckets only (zeros contribute nothing), var·span² = span·Σc² − N²,
    so fano = var/mean = (span·Σc² − N²) / (span·N): two group-bys on
    the SAME key (minute rollup, then type fold), one corpus shuffle,
    |types| output rows, all moments exact int64 (Σc² ≤ N² ≤ 10¹⁰ at
    sf0.1; span ≤ 10⁶ minutes keeps span·Σc² well inside int64 — the
    bound is span·N², ~10¹⁶ at sf0.1-scale corpora).  The only float is
    the final ratio chain per OUTPUT row.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_micros(ts) div 60000000").alias("minute")
    )
    per_min = ev.groupBy("event_type", "minute").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_min.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        (F.max("minute") - F.min("minute") + 1).alias("span_min"),
        F.count(F.lit(1)).alias("n_active_min"),
    )
    var_num = F.col("span_min") * F.col("sum_c2") - F.col(
        "n_events"
    ) * F.col("n_events")
    return agg.select(
        "event_type",
        "n_events",
        "span_min",
        "n_active_min",
        "sum_c2",
        var_num.alias("var_num"),
        (
            var_num.cast("double")
            / (F.col("span_min") * F.col("n_events")).cast("double")
        ).alias("fano"),
    ).orderBy("event_type")


ORACLE_events_burstiness = """
WITH pm AS (
    SELECT event_type, epoch_us(ts) // 60000000 AS minute,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), a AS (
    SELECT event_type,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(sum(c * c) AS BIGINT) AS sum_c2,
           max(minute) - min(minute) + 1 AS span_min,
           count(*) AS n_active_min
    FROM pm GROUP BY 1
)
SELECT event_type, n_events, span_min, n_active_min, sum_c2,
       CAST(span_min * sum_c2 - n_events * n_events AS BIGINT) AS var_num,
       CAST(span_min * sum_c2 - n_events * n_events AS DOUBLE)
           / CAST(span_min * n_events AS DOUBLE) AS fano
FROM a
ORDER BY event_type
"""


# -------------------------------------- A61: behavioral diversity (Simpson)
def events_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A61: per-user behavioral diversity via the Simpson concentration
    Σp² — the engagement-breadth profile (single-habit vs explorer
    users) that segmentation and recommendation-cold-start rules key
    on.  Simpson is the RATIONAL diversity index: unlike Shannon
    entropy it needs no ln() (whose last ulp differs between the JVM
    and DuckDB libm — the PSI lesson), so concentration hashes as an
    exact ppm integer: simpson_ppm = 10⁶·Σc² div N².  The effective
    type count (inverse Simpson, 'how many event types does this user
    effectively use') is one float division per OUTPUT row.

    Plan: two group-bys on the same leading key (user,type → user), one
    corpus shuffle, ≤|users| output rows.  Σc²·10⁶ ≤ 10⁶·N_u² — safe
    while any single user stays under ~3·10⁶ events; guard documented.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_type.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return agg.select(
        "user_id",
        "n_events",
        "n_types",
        "sum_c2",
        F.expr("sum_c2 * 1000000 div (n_events * n_events)").alias(
            "simpson_ppm"
        ),
        (
            (F.col("n_events") * F.col("n_events")).cast("double")
            / F.col("sum_c2").cast("double")
        ).alias("effective_types"),
    ).orderBy("user_id")


ORACLE_events_user_diversity = """
WITH pt AS (
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), a AS (
    SELECT user_id,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(sum(c * c) AS BIGINT) AS sum_c2,
           count(*) AS n_types
    FROM pt GROUP BY 1
)
SELECT user_id, n_events, n_types, sum_c2,
       CAST(sum_c2 * 1000000 // (n_events * n_events) AS BIGINT)
           AS simpson_ppm,
       CAST(n_events * n_events AS DOUBLE) / CAST(sum_c2 AS DOUBLE)
           AS effective_types
FROM a
ORDER BY user_id
"""


# ------------------------------------------------ A73: RFM segmentation --
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("customer_rfm", b.customer_rfm, b.ORACLE_customer_rfm)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A73: RFM (recency / frequency / monetary) quartile segmentation
    over the orders fact — the canonical customer-scoring shape behind
    "which users get the retention campaign" and, in a training-data
    pipeline, stratified sampling of user populations by engagement
    tier.

    Relationship to A41 (`customer_rfm_scores`, registered r9): A41 is
    the POSITIONAL formulation — ntile(5) windows over the reduced
    per-customer relation, exactly equal-population tiles, ties split
    by custkey — and its three global sort windows are one-task at 10⁹
    customers even though the relation is reduced.  This operator is
    the SCALE formulation of the same screen: VALUE-based quartiles
    (ties share a score — what segmentation semantics actually want;
    no customer's tier depends on a tiebreak) whose boundaries come
    from distributed order statistics, so no stage sorts the
    per-customer relation in one task.  Both stay registered: A41 is
    the positional-semantics reference, this is the plan a 100 TB
    pipeline runs.

    Quartiles are VALUE-based via distributed order statistics (the
    vocab_growth/Gini idiom — NO global per-customer NTILE window, which
    is a one-task sort at 10⁹ customers): each measure collapses to its
    per-DISTINCT-VALUE count relation (≤|distinct values| rows), a
    cumulative window ordered by value assigns rank ranges, and the
    k-th boundary is the least value whose cumulative count reaches
    ceil(k·n/4). Scores are then 1 + (#boundaries strictly exceeded) —
    deterministic under ties (tied values share a score, which is the
    semantics segmentation wants), all int64, no floats anywhere.

    r_q counts from the STALE end (1 = longest ago) so the composite
    code reads best-customer-high: rfm_code = (5−r_q)·100 + f_q·10
    + m_q, 444 = recent + frequent + big spender.

    Scale: one corpus exchange (per-customer aggregate keyed on
    custkey); everything after rides the three per-distinct-value
    relations and a 1-row broadcast of the nine boundaries.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        cents("o_totalprice").alias("price_cents"),
    )
    anchor = orders.agg(F.max("od").alias("anchor"))
    pc = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("od").alias("last_od"),
            F.count("o_orderkey").alias("frequency"),
            F.sum("price_cents").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.datediff("anchor", "last_od").cast("long").alias("recency_days"),
            F.col("frequency").cast("long").alias("frequency"),
            "monetary_cents",
        )
    )
    long = pc.selectExpr(
        "stack(3, 'r', recency_days, 'f', frequency, 'm', monetary_cents)"
        " as (measure, v)"
    )
    # distributed order statistics, the vocab_growth bucket-refinement
    # idiom: monetary_cents has ~|customers| DISTINCT values, so a
    # per-measure cumulative window over the distinct-value relation is a
    # one-task sort at 10⁹ customers.  Instead: (1) per-distinct-value
    # counts (one map-side-combined exchange), (2) values range-bucket by
    # v div 4096 (order-preserving; ≤ value-range/4096 buckets), the only
    # per-measure global window runs over the BUCKET fold, (3) each of
    # the nine target ranks broadcast-joins to its containing bucket, and
    # the within-bucket fold is partitioned (measure, bkt, k) with ≤4096
    # distinct values per partition BY CONSTRUCTION.
    vc = long.groupBy("measure", "v").agg(F.count(F.lit(1)).alias("cnt"))
    vb = vc.withColumn("bkt", F.expr("v div 4096"))
    bcnt = vb.groupBy("measure", "bkt").agg(F.sum("cnt").alias("bn"))
    cum = bcnt.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("bn").over(
                Window.partitionBy("measure")
                .orderBy("bkt")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    # targets' measure column is RENAMED before the join: cum and targets
    # share bcnt's lineage, so an equality on the common attribute
    # resolves trivially true (Spark's self-join ambiguity) and every
    # bucket would match every measure's targets — masked on this data
    # only because all three measures share n (identical rank triplets),
    # wrong the moment they don't.
    targets = (
        bcnt.groupBy("measure")
        .agg(F.sum("bn").alias("n"))
        .select(
            F.col("measure").alias("t_measure"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
            "n",
        )
        .withColumn("rnk", F.expr("(k * n + 3) div 4"))
    )
    hit = cum.join(
        F.broadcast(targets),
        (F.col("measure") == F.col("t_measure"))
        & (F.col("cum_before") < F.col("rnk"))
        & (F.col("rnk") <= F.col("cum_before") + F.col("bn")),
    ).select("measure", "bkt", "k", "rnk", "cum_before")
    w_in = (
        Window.partitionBy("measure", "bkt", "k")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    thr_rows = (
        vb.join(F.broadcast(hit), ["measure", "bkt"])
        .withColumn("wcum", F.sum("cnt").over(w_in))
        .filter(F.col("cum_before") + F.col("wcum") >= F.col("rnk"))
        .groupBy("measure", "k")
        .agg(F.min("v").alias("thr"))
    )
    thr = thr_rows.groupBy("measure").agg(
        F.min(F.when(F.col("k") == 1, F.col("thr"))).cast("long").alias("t1"),
        F.min(F.when(F.col("k") == 2, F.col("thr"))).cast("long").alias("t2"),
        F.min(F.when(F.col("k") == 3, F.col("thr"))).cast("long").alias("t3"),
    )
    one = thr.groupBy().pivot("measure", ["r", "f", "m"]).agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    scored = pc.crossJoin(F.broadcast(one))
    q = lambda v, p: (  # noqa: E731
        F.lit(1)
        + (F.col(v) > F.col(f"{p}_t1")).cast("int")
        + (F.col(v) > F.col(f"{p}_t2")).cast("int")
        + (F.col(v) > F.col(f"{p}_t3")).cast("int")
    )
    return scored.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        q("recency_days", "r").alias("r_q"),
        q("frequency", "f").alias("f_q"),
        q("monetary_cents", "m").alias("m_q"),
        (
            (F.lit(5) - q("recency_days", "r")) * 100
            + q("frequency", "f") * 10
            + q("monetary_cents", "m")
        ).alias("rfm_code"),
    ).orderBy("c_custkey")


ORACLE_customer_rfm = """
WITH o AS (
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
    FROM orders
), anchor AS (
    SELECT max(od) AS anchor FROM o
), pc AS (
    SELECT o_custkey AS c_custkey,
           CAST(date_diff('day', max(od), (SELECT anchor FROM anchor))
                AS BIGINT) AS recency_days,
           CAST(count(o_orderkey) AS BIGINT) AS frequency,
           CAST(sum(price_cents) AS BIGINT) AS monetary_cents
    FROM o GROUP BY o_custkey
), long AS (
    SELECT 'r' AS measure, recency_days AS v FROM pc
    UNION ALL SELECT 'f', frequency FROM pc
    UNION ALL SELECT 'm', monetary_cents FROM pc
), vc AS (
    SELECT measure, v, count(*) AS cnt FROM long GROUP BY 1, 2
), ranked AS (
    SELECT measure, v,
           sum(cnt) OVER (PARTITION BY measure ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
           sum(cnt) OVER (PARTITION BY measure) AS n
    FROM vc
), thr AS (
    SELECT measure,
           min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS t1,
           min(CASE WHEN cum >= (2 * n + 3) // 4 THEN v END) AS t2,
           min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t3
    FROM ranked GROUP BY measure
), one AS (
    SELECT
      min(CASE WHEN measure = 'r' THEN t1 END) AS r_t1,
      min(CASE WHEN measure = 'r' THEN t2 END) AS r_t2,
      min(CASE WHEN measure = 'r' THEN t3 END) AS r_t3,
      min(CASE WHEN measure = 'f' THEN t1 END) AS f_t1,
      min(CASE WHEN measure = 'f' THEN t2 END) AS f_t2,
      min(CASE WHEN measure = 'f' THEN t3 END) AS f_t3,
      min(CASE WHEN measure = 'm' THEN t1 END) AS m_t1,
      min(CASE WHEN measure = 'm' THEN t2 END) AS m_t2,
      min(CASE WHEN measure = 'm' THEN t3 END) AS m_t3
    FROM thr
)
SELECT c_custkey, recency_days, frequency, monetary_cents,
       CAST(1 + (recency_days > r_t1)::INT + (recency_days > r_t2)::INT
              + (recency_days > r_t3)::INT AS INT) AS r_q,
       CAST(1 + (frequency > f_t1)::INT + (frequency > f_t2)::INT
              + (frequency > f_t3)::INT AS INT) AS f_q,
       CAST(1 + (monetary_cents > m_t1)::INT + (monetary_cents > m_t2)::INT
              + (monetary_cents > m_t3)::INT AS INT) AS m_q,
       CAST((5 - (1 + (recency_days > r_t1)::INT + (recency_days > r_t2)::INT
                    + (recency_days > r_t3)::INT)) * 100
            + (1 + (frequency > f_t1)::INT + (frequency > f_t2)::INT
                 + (frequency > f_t3)::INT) * 10
            + (1 + (monetary_cents > m_t1)::INT + (monetary_cents > m_t2)::INT
                 + (monetary_cents > m_t3)::INT) AS INT) AS rfm_code
FROM pc CROSS JOIN one
ORDER BY c_custkey
"""


# --------------------------------------------- A76: ABC classification --
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("customer_abc", b.customer_abc, b.ORACLE_customer_abc)
def customer_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A76: ABC / Pareto classification of customers by revenue — the
    inventory-analytics classic (A = the heavy heads covering the first
    70% of revenue, B = the next 20%, C = the tail) that drives tiered
    treatment everywhere from stock policy to crawl budgets.

    Relationship to `lineitem_abc_class` (registered r9): that operator
    classifies PARTS with a global descending cumulative window over
    the ≤|parts| revenue relation — fine for a bounded catalog, one-task
    at an unbounded subject.  This operator classifies CUSTOMERS (an
    unbounded subject at 10⁹ users) and therefore replaces the global
    cumulative window with the bucket-refinement order statistics —
    the pair documents the boundary where the reduced-relation
    mitigation stops being enough and the distributed formulation is
    mandatory.  The VALUE-WEIGHTED twin of A73's count-quantiles:
    boundaries sit where
    the CUMULATIVE REVENUE (descending value order) crosses 70% / 90%
    of total, and a customer's class compares its value against the two
    boundary values (ties share a class — deterministic, exchange-free).

    Class rule: walking distinct values DESCENDING, a value v is A if
    the revenue strictly above v is < 70% of total (so the top value is
    always A), B if < 90%, else C — all compares are exact-int
    cross-multiplies (cum_above·10 < total·7), no division anywhere but
    the reported integer ppm.

    Scale: the same bucket-refinement order statistics as A73 — one
    per-customer exchange, a v div 4096 bucket fold carrying per-bucket
    REVENUE sums (the only per-corpus window, value-range/4096 rows),
    two broadcast boundary targets refined inside their single buckets,
    then one broadcast compare.  Output: 3 class rows.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", cents("o_totalprice").alias("pc")
    )
    pc = orders.groupBy("o_custkey").agg(F.sum("pc").alias("v"))
    vc = pc.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("val")
    )
    vb = vc.withColumn("bkt", F.expr("v div 4096"))
    bcnt = vb.groupBy("bkt").agg(F.sum("val").alias("bval"))
    # descending-value cumulative: revenue strictly ABOVE the bucket
    cum = bcnt.withColumn(
        "above_before",
        F.coalesce(
            F.sum("bval").over(
                Window.orderBy(F.desc("bkt")).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    total = bcnt.agg(F.sum("bval").alias("total"))
    # boundary k/10 (k = 7, 9): the LEAST value v whose strictly-above
    # revenue already covers >= k/10 of total — every value above the
    # boundary classifies tighter than k
    targets = total.select(
        "total",
        F.explode(F.array(F.lit(7), F.lit(9))).alias("k"),
    )
    hit = cum.join(
        F.broadcast(targets),
        (F.col("above_before") * 10 < F.col("total") * F.col("k"))
        & (
            (F.col("above_before") + F.col("bval")) * 10
            >= F.col("total") * F.col("k")
        ),
    ).select("bkt", "k", "total", "above_before")
    w_in = (
        Window.partitionBy("bkt", "k")
        .orderBy(F.desc("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    thr_rows = (
        vb.join(F.broadcast(hit), "bkt")
        .withColumn("wabove", F.coalesce(F.sum("val").over(w_in), F.lit(0)))
        .filter(
            (F.col("above_before") + F.col("wabove") + F.col("val")) * 10
            >= F.col("total") * F.col("k")
        )
        .groupBy("k")
        .agg(F.max("v").alias("thr"))
    )
    one = thr_rows.groupBy().agg(
        F.min(F.when(F.col("k") == 7, F.col("thr"))).alias("t_a"),
        F.min(F.when(F.col("k") == 9, F.col("thr"))).alias("t_b"),
    )
    classed = pc.crossJoin(F.broadcast(one)).select(
        "v",
        F.when(F.col("v") >= F.col("t_a"), F.lit("A"))
        .when(F.col("v") >= F.col("t_b"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    tot2 = F.broadcast(total)
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("v").alias("value_cents"),
        )
        .crossJoin(tot2)
        .select(
            "abc_class",
            "n_customers",
            "value_cents",
            F.expr("value_cents * 1000000 div total").alias("share_ppm"),
        )
        .orderBy("abc_class")
    )


ORACLE_customer_abc = """
WITH pc AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS v
    FROM orders GROUP BY o_custkey
), vc AS (
    SELECT v, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(v) AS BIGINT) AS val
    FROM pc GROUP BY v
), cum AS (
    SELECT v, val,
           coalesce(sum(val) OVER (ORDER BY v DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS above,
           (SELECT CAST(sum(val) AS BIGINT) FROM vc) AS total
    FROM vc
), thr AS (
    SELECT
      max(CASE WHEN (above + val) * 10 >= total * 7 THEN v END) AS t_a,
      max(CASE WHEN (above + val) * 10 >= total * 9 THEN v END) AS t_b
    FROM cum
)
SELECT CASE WHEN pc.v >= t_a THEN 'A'
            WHEN pc.v >= t_b THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(pc.v) AS BIGINT) AS value_cents,
       CAST(sum(pc.v) * 1000000 // (SELECT sum(val) FROM vc) AS BIGINT)
           AS share_ppm
FROM pc, thr
GROUP BY 1
ORDER BY 1
"""


# ------------------------------------------- A77: funnel window sweep --
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("events_funnel_sweep", b.events_funnel_sweep,
#    b.ORACLE_events_funnel_sweep)
_FUNNEL_WINDOWS_H = (1, 6, 24, 168)


def events_funnel_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A77: funnel conversion vs DEADLINE-WINDOW operating curve — the
    `dedup_threshold_sweep` idiom applied to the funnel: how many users
    complete view→click→purchase within 1 h / 6 h / 24 h / 7 d of their
    anchor view?  The un-deadlined closed funnel (`events_funnel`) is
    this curve's W→∞ limit; product teams read the curve, not one
    point ("conversion happens in the first six hours or never").

    Semantics: anchor = earliest view; stage i+1 time = earliest
    stage-(i+1) event AT OR AFTER the stage-i time and AT OR BEFORE
    anchor + W (the global-deadline greedy-earliest rule the streaming
    funnel T21 uses, so the W→∞ column of this curve is also T21's
    batch oracle shape).  ONE pass computes all four windows: the
    anchor relation cross-joins the 4-row window literal (the sweep
    trick — never four funnel runs), each later stage is one
    user-keyed equi-join + min per (user, W).  All counts int64.

    Scale: per-stage relations bounded by |users|·|windows|; each stage
    scans events once with the type filter pushed down; joins are
    user-keyed equi-joins (the deadline is a residual predicate inside
    the join, never a band key).
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    anchors = (
        ev.filter(F.col("event_type") == _STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    wins = spark.createDataFrame(
        [(h, h * 3_600_000_000) for h in _FUNNEL_WINDOWS_H],
        "window_hours int, w_us long",
    )
    s1 = anchors.crossJoin(F.broadcast(wins)).select(
        "user_id",
        "window_hours",
        "w_us",
        F.unix_micros("t1").alias("t1_us"),
    )
    clicks = ev.filter(F.col("event_type") == _STAGES[1]).select(
        "user_id", F.unix_micros("ts").alias("c_us")
    )
    s2 = (
        clicks.join(s1, "user_id")
        .filter(
            (F.col("c_us") >= F.col("t1_us"))
            & (F.col("c_us") <= F.col("t1_us") + F.col("w_us"))
        )
        .groupBy("user_id", "window_hours")
        .agg(
            F.min("c_us").alias("t2_us"),
            F.min(F.col("t1_us") + F.col("w_us")).alias("deadline_us"),
        )
    )
    purchases = ev.filter(F.col("event_type") == _STAGES[2]).select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    s3 = (
        purchases.join(s2, "user_id")
        .filter(
            (F.col("p_us") >= F.col("t2_us"))
            & (F.col("p_us") <= F.col("deadline_us"))
        )
        .groupBy("user_id", "window_hours")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    c1 = s1.groupBy("window_hours").agg(F.count(F.lit(1)).alias("n_users"))
    c2 = s2.groupBy("window_hours").agg(F.count(F.lit(1)).alias("n_users"))
    c3 = s3.groupBy("window_hours").agg(F.count(F.lit(1)).alias("n_users"))
    out = (
        c1.select("window_hours", F.lit(1).alias("stage_idx"),
                  F.lit(_STAGES[0]).alias("stage"), "n_users")
        .unionByName(
            c2.select("window_hours", F.lit(2).alias("stage_idx"),
                      F.lit(_STAGES[1]).alias("stage"), "n_users")
        )
        .unionByName(
            c3.select("window_hours", F.lit(3).alias("stage_idx"),
                      F.lit(_STAGES[2]).alias("stage"), "n_users")
        )
    )
    return out.orderBy("window_hours", "stage_idx")


ORACLE_events_funnel_sweep = f"""
WITH wins AS (
    SELECT CAST(h AS INT) AS window_hours,
           CAST(h AS BIGINT) * 3600000000 AS w_us
    FROM unnest([{', '.join(str(h) for h in _FUNNEL_WINDOWS_H)}]) AS g(h)
), anchors AS (
    SELECT user_id, epoch_us(min(ts)) AS t1_us FROM events
    WHERE event_type = '{_STAGES[0]}' GROUP BY user_id
), s1 AS (
    SELECT user_id, window_hours, w_us, t1_us FROM anchors CROSS JOIN wins
), s2 AS (
    SELECT e.user_id, s1.window_hours,
           min(epoch_us(e.ts)) AS t2_us,
           min(s1.t1_us + s1.w_us) AS deadline_us
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = '{_STAGES[1]}'
      AND epoch_us(e.ts) >= s1.t1_us
      AND epoch_us(e.ts) <= s1.t1_us + s1.w_us
    GROUP BY e.user_id, s1.window_hours
), s3 AS (
    SELECT e.user_id, s2.window_hours
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = '{_STAGES[2]}'
      AND epoch_us(e.ts) >= s2.t2_us
      AND epoch_us(e.ts) <= s2.deadline_us
    GROUP BY e.user_id, s2.window_hours
)
SELECT window_hours, stage_idx, stage, n_users FROM (
    SELECT window_hours, 1 AS stage_idx, '{_STAGES[0]}' AS stage,
           CAST(count(*) AS BIGINT) AS n_users
    FROM s1 GROUP BY window_hours
    UNION ALL
    SELECT window_hours, 2, '{_STAGES[1]}', CAST(count(*) AS BIGINT)
    FROM s2 GROUP BY window_hours
    UNION ALL
    SELECT window_hours, 3, '{_STAGES[2]}', CAST(count(*) AS BIGINT)
    FROM s3 GROUP BY window_hours
)
ORDER BY window_hours, stage_idx
"""


# ------------------------------------------- A78: growth accounting -------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("events_growth_accounting", b.events_growth_accounting,
#    b.ORACLE_events_growth_accounting)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A78: weekly growth accounting — every analytics stack's
    user-momentum ledger: per ISO-ish week (epoch-day div 7, zone-free
    and engine-identical), how many active users are NEW (first week
    ever), RETAINED (also active the immediately previous week),
    RESURRECTED (active after a gap ≥ 2 weeks), and how many of the
    previous week's actives CHURNED (not active this week).  The
    identity new + retained + resurrected = active and
    churned(w) = active(w−1) − retained(w) are the cross-checks the
    unit pins.

    Shape: the corpus reduces to DISTINCT (user, week) (one map-side-
    combined exchange), lag over the per-user week sequence classifies
    each active week in one pass (never a self-join on adjacent weeks),
    and the ledger is a ≤|weeks| aggregate.  Churn joins the active
    counts against themselves shifted by one week — a |weeks|-row
    broadcast.  All int64.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts) div 604800000000").alias("week")
    )
    uw = ev.distinct()
    w_user = Window.partitionBy("user_id").orderBy("week")
    classed = uw.select(
        "user_id",
        "week",
        F.lag("week").over(w_user).alias("prev_week"),
    ).select(
        "week",
        F.when(F.col("prev_week").isNull(), F.lit("new"))
        .when(F.col("prev_week") == F.col("week") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("cls"),
    )
    ledger = (
        classed.groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.when(F.col("cls") == "new", 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(F.col("cls") == "retained", 1).otherwise(0)).alias(
                "n_retained"
            ),
            F.sum(F.when(F.col("cls") == "resurrected", 1).otherwise(0)).alias(
                "n_resurrected"
            ),
        )
    )
    prev = ledger.select(
        (F.col("week") + 1).alias("week"), F.col("n_active").alias("prev_active")
    )
    return (
        ledger.join(F.broadcast(prev), "week", "left")
        .select(
            "week",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            (
                F.coalesce("prev_active", F.lit(0)) - F.col("n_retained")
            ).alias("n_churned"),
        )
        .orderBy("week")
    )


ORACLE_events_growth_accounting = """
WITH uw AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
    FROM events
), classed AS (
    SELECT week,
           CASE WHEN lag(week) OVER (PARTITION BY user_id ORDER BY week)
                     IS NULL THEN 'new'
                WHEN lag(week) OVER (PARTITION BY user_id ORDER BY week)
                     = week - 1 THEN 'retained'
                ELSE 'resurrected' END AS cls
    FROM uw
), ledger AS (
    SELECT week,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained,
           CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_resurrected
    FROM classed GROUP BY week
)
SELECT l.week, l.n_active, l.n_new, l.n_retained, l.n_resurrected,
       CAST(coalesce(p.n_active, 0) - l.n_retained AS BIGINT) AS n_churned
FROM ledger l LEFT JOIN ledger p ON p.week = l.week - 1
ORDER BY l.week
"""


# ------------------------------------------ A80: mix-drift timeline -------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("events_mix_drift", b.events_mix_drift, b.ORACLE_events_mix_drift)
def events_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A80: week-over-week composition drift of the event-type mix —
    the TIMELINE member of the drift family: A31 chi-square and A32 PSI
    score ONE baseline-vs-detection split, this walks the whole history
    and emits the L1 distance (total variation ×2) between consecutive
    weekly mixes, the series an alerting rule thresholds ("the traffic
    mix moved 8% this week").

    Exactness: shares are integer ppm (cnt·10⁶ div week_total); the L1
    fold is Σ |share − prev_share| over the FULL OUTER join of
    consecutive weeks' mixes on type (outer, because a type appearing
    or vanishing IS drift — an inner join would silently drop exactly
    the strongest signal).  All int64.

    Scale: the corpus reduces to the (week, type) count relation (one
    map-side-combined exchange, ≤|weeks|·|types| rows); the shifted
    self-join and the final fold ride that tiny relation.
    """
    ev = load(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 604800000000").alias("week"), "event_type"
    )
    wk = ev.groupBy("week", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    tot = wk.groupBy("week").agg(F.sum("cnt").alias("wt"))
    mix = wk.join(tot, "week").select(
        "week",
        "event_type",
        F.expr("cnt * 1000000 div wt").alias("share_ppm"),
    )
    prev = mix.select(
        (F.col("week") + 1).alias("week"),
        "event_type",
        F.col("share_ppm").alias("prev_ppm"),
    )
    joined = mix.join(prev, ["week", "event_type"], "full_outer").select(
        "week",
        "event_type",
        F.coalesce("share_ppm", F.lit(0)).alias("s"),
        F.coalesce("prev_ppm", F.lit(0)).alias("p"),
    )
    # weeks present only via the shift (week = max_week + 1) carry no
    # current mix: drop rows where the CURRENT week has no events at all
    cur_weeks = tot.select("week")
    return (
        joined.join(cur_weeks, "week", "left_semi")
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.abs(F.col("s") - F.col("p"))).alias("l1_drift_ppm"),
        )
        .orderBy("week")
    )


ORACLE_events_mix_drift = """
WITH wk AS (
    SELECT epoch_us(ts) // 604800000000 AS week, event_type,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
), tot AS (
    SELECT week, CAST(sum(cnt) AS BIGINT) AS wt FROM wk GROUP BY week
), mix AS (
    SELECT wk.week, event_type,
           CAST(cnt * 1000000 // wt AS BIGINT) AS share_ppm
    FROM wk JOIN tot ON wk.week = tot.week
), joined AS (
    SELECT coalesce(m.week, p.week + 1) AS week,
           coalesce(m.event_type, p.event_type) AS event_type,
           coalesce(m.share_ppm, 0) AS s,
           coalesce(p.share_ppm, 0) AS p
    FROM mix m FULL OUTER JOIN mix p
      ON m.week = p.week + 1 AND m.event_type = p.event_type
)
SELECT week,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(abs(s - p)) AS BIGINT) AS l1_drift_ppm
FROM joined
WHERE week IN (SELECT week FROM tot)
GROUP BY week
ORDER BY week
"""


# -------------- A92: ABC class migration matrix (staged r13) --------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("customer_abc_migration", b.customer_abc_migration,
#    b.ORACLE_customer_abc_migration)
_ABC_MIG_CUTOFF = "1999-01-01"


def customer_abc_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A92: the ABC transition matrix — A76 classifies customers once;
    the question a tiering policy actually turns on is how customers
    MOVE between classes period over period (an A→C slide is churn in
    the making, C→A is the cohort worth studying), plus the entry/exit
    margins ('N' = absent that period).  Classes per period use the
    A76 value rule (walking distinct revenue values descending, v is A
    while the revenue strictly above it is < 70% of the period total,
    B while < 90%, else C — exact-int cross-multiplies, ties share a
    class); the matrix is the (from, to) count with customer-share ppm.

    Scale: one (custkey, period) exchange for the revenue sums; the
    class windows ride each period's DISTINCT-VALUE reduced relation
    (the `lineitem_abc_class` formulation — at 10⁹ customers swap in
    A76's bucket-refinement boundaries per period, the same
    order-statistic); the matrix is a ≤16-row aggregate."""
    ords = load(spark, sf_dir, "orders")
    per = (
        ords.withColumn(
            "period",
            F.when(
                F.col("o_orderdate")
                < F.lit(_ABC_MIG_CUTOFF).cast("timestamp"),
                F.lit(1),
            ).otherwise(F.lit(2)),
        )
        .groupBy("o_custkey", "period")
        .agg(F.sum(cents("o_totalprice")).alias("v"))
    )
    vals = per.groupBy("period", "v").agg(F.sum("v").alias("val"))
    wd = (
        Window.partitionBy("period")
        .orderBy(F.desc("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy("period")
    classed_vals = (
        vals.withColumn("above", F.coalesce(F.sum("val").over(wd), F.lit(0)))
        .withColumn("total", F.sum("val").over(wt))
        .select(
            "period",
            "v",
            F.when(F.col("above") * 10 < F.col("total") * 7, F.lit("A"))
            .when(F.col("above") * 10 < F.col("total") * 9, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc"),
        )
    )
    labeled = per.join(classed_vals, ["period", "v"]).select(
        "o_custkey", "period", "abc"
    )
    wide = (
        labeled.groupBy("o_custkey")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("period") == 1, F.col("abc"))), F.lit("N")
            ).alias("class_from"),
            F.coalesce(
                F.max(F.when(F.col("period") == 2, F.col("abc"))), F.lit("N")
            ).alias("class_to"),
        )
    )
    tot = wide.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        wide.groupBy("class_from", "class_to")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .crossJoin(F.broadcast(tot))
        .select(
            "class_from",
            "class_to",
            "n_customers",
            F.expr("n_customers * 1000000 div n_total").alias("share_ppm"),
        )
        .orderBy("class_from", "class_to")
    )


ORACLE_customer_abc_migration = f"""
WITH per AS (
    SELECT o_custkey,
           CASE WHEN o_orderdate < TIMESTAMP '{_ABC_MIG_CUTOFF}'
                THEN 1 ELSE 2 END AS period,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS v
    FROM orders GROUP BY 1, 2
), vals AS (
    SELECT period, v, CAST(sum(v) AS BIGINT) AS val
    FROM per GROUP BY period, v
), cls AS (
    SELECT period, v,
           CASE WHEN coalesce(sum(val) OVER (PARTITION BY period
                    ORDER BY v DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * 10
                < sum(val) OVER (PARTITION BY period) * 7 THEN 'A'
                WHEN coalesce(sum(val) OVER (PARTITION BY period
                    ORDER BY v DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * 10
                < sum(val) OVER (PARTITION BY period) * 9 THEN 'B'
                ELSE 'C' END AS abc
    FROM vals
), labeled AS (
    SELECT p.o_custkey, p.period, c.abc
    FROM per p JOIN cls c USING (period, v)
), wide AS (
    SELECT o_custkey,
           coalesce(max(CASE WHEN period = 1 THEN abc END), 'N')
               AS class_from,
           coalesce(max(CASE WHEN period = 2 THEN abc END), 'N')
               AS class_to
    FROM labeled GROUP BY o_custkey
)
SELECT class_from, class_to,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(count(*) * 1000000 // (SELECT count(*) FROM wide) AS BIGINT)
           AS share_ppm
FROM wide
GROUP BY class_from, class_to
ORDER BY class_from, class_to
"""


# ----------- A96: U-shaped multi-touch attribution (staged r13) -----------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("events_attribution_ushape", b.events_attribution_ushape,
#    b.ORACLE_events_attribution_ushape)
#: raising pre-flight cap on the hottest user's touch x purchase product
_USHAPE_MAX_USER_PAIRS = 2_000_000


def events_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A96: position-based (U-shaped) multi-touch attribution — the
    standard 40/40/20 complement to A28's last-touch: credit for each
    purchase splits 40% to the FIRST touch in the lookback, 40% to the
    LAST, 20% evenly across the middle (k=1 → 100%, k=2 → 50/50, no
    touch → 'direct'), which is the question last-touch cannot answer:
    which channels OPEN journeys vs which channels CLOSE them.

    Exactness: the split is pure integer arithmetic on cents with a
    deterministic remainder rule (`pool div m` each, remainder to the
    final middle touch), so credits CONSERVE revenue exactly — the
    conservation identity Σcredit ≡ Σpurchase_cents is unit-pinned and
    implicitly gated (any rounding drift breaks the value hash).  Touch
    qualification is the lexicographic (ts, event_id) order A28 uses.

    Scale: the purchase×touch pairing is a user-keyed equi-join with a
    time-range predicate — per-user work bounded by touches·purchases
    within the 7-day horizon (the events_range_join bin idiom is the
    documented hot-user fallback); the credit windows partition by
    purchase id; the report is a |channels|-row aggregate."""
    ev = load(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    campaign = F.get_json_object(F.col("props"), "$.k").cast("long") % 4
    touches = ev.filter(is_touch).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.concat(
            F.col("event_type"), F.lit("_c"), campaign.cast("string")
        ).alias("channel"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        cents("value").alias("cents"),
    )
    before = (F.col("t_ts") < F.col("p_ts")) | (
        (F.col("t_ts") == F.col("p_ts")) & (F.col("t_id") < F.col("p_id"))
    )
    in_window = (
        F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("t_ts"))
        <= _ATTR_LOOKBACK_S * 1_000_000
    )
    # pair-space guard (the _guard_series_pairs / max_bucket idiom): the
    # purchase x touch pairing is quadratic per user, so a hot user with
    # T touches and P purchases owes T*P join work before the window
    # predicate prunes.  Pre-flight the worst per-user product (a 1-row
    # bounded control-plane read) and refuse to build the plan above the
    # cap — the caller's fallback is the events_range_join day-binned
    # pairing, which bounds work by the 7-day horizon instead.
    worst = (
        ev.filter(is_touch | (F.col("event_type") == "purchase"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(is_touch, 1).otherwise(0)).alias("t"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
        )
        .agg(F.max(F.col("t") * F.col("p")).alias("m"))
        .first()["m"]
    )
    if worst is not None and worst > _USHAPE_MAX_USER_PAIRS:
        raise RuntimeError(
            f"hottest user owes {worst} touch x purchase pairs"
            f" > max_user_pairs={_USHAPE_MAX_USER_PAIRS}; use the day-binned"
            " range-join pairing (events_range_join idiom) for this corpus"
        )
    pairs = purch.join(
        touches, (F.col("user_id") == F.col("t_user")) & before & in_window
    )
    wp = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    wk = Window.partitionBy("p_id")
    credit = F.expr(
        "CASE WHEN k = 1 THEN cents"
        "     WHEN k = 2 THEN CASE WHEN rn = 1 THEN cents div 2"
        "                          ELSE cents - cents div 2 END"
        "     ELSE CASE WHEN rn = 1 THEN cents * 4 div 10"
        "               WHEN rn = k THEN cents * 4 div 10"
        "               ELSE (cents - 2 * (cents * 4 div 10)) div (k - 2)"
        "                    + CASE WHEN rn = k - 1"
        "                      THEN (cents - 2 * (cents * 4 div 10)) % (k - 2)"
        "                      ELSE 0 END END "
        "END"
    )
    credited = (
        pairs.withColumn("rn", F.row_number().over(wp).cast("long"))
        .withColumn("k", F.count(F.lit(1)).over(wk).cast("long"))
        .select("channel", credit.alias("credit_cents"))
    )
    direct = purch.join(
        pairs.select("p_id").distinct(), "p_id", "left_anti"
    ).select(F.lit("direct").alias("channel"), F.col("cents").alias("credit_cents"))
    all_credits = credited.unionByName(direct)
    tot = purch.agg(F.sum("cents").alias("total_cents"))
    return (
        all_credits.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit_cents").alias("credit_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "n_credits",
            "credit_cents",
            F.expr("credit_cents * 1000000 div total_cents").alias("share_ppm"),
        )
        .orderBy("channel")
    )


ORACLE_events_attribution_ushape = f"""
WITH touches AS (
    SELECT user_id AS t_user, ts AS t_ts, event_id AS t_id,
           event_type || '_c' ||
               CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
                    AS VARCHAR) AS channel
    FROM events WHERE event_type IN ('click', 'view')
), purch AS (
    SELECT user_id, ts AS p_ts, event_id AS p_id,
           CAST(round(value * 100, 0) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
), pairs AS (
    SELECT p.p_id, p.cents, t.channel, t.t_ts, t.t_id
    FROM purch p JOIN touches t
      ON p.user_id = t.t_user
     AND (t.t_ts < p.p_ts OR (t.t_ts = p.p_ts AND t.t_id < p.p_id))
     AND epoch_us(p.p_ts) - epoch_us(t.t_ts)
         <= {60 * 60 * 24 * 7 * 1_000_000}
), ranked AS (
    SELECT p_id, cents, channel,
           CAST(row_number() OVER (PARTITION BY p_id ORDER BY t_ts, t_id)
                AS BIGINT) AS rn,
           CAST(count(*) OVER (PARTITION BY p_id) AS BIGINT) AS k
    FROM pairs
), credited AS (
    SELECT channel,
           CASE WHEN k = 1 THEN cents
                WHEN k = 2 THEN CASE WHEN rn = 1 THEN cents // 2
                                     ELSE cents - cents // 2 END
                ELSE CASE WHEN rn = 1 THEN cents * 4 // 10
                          WHEN rn = k THEN cents * 4 // 10
                          ELSE (cents - 2 * (cents * 4 // 10)) // (k - 2)
                               + CASE WHEN rn = k - 1
                                 THEN (cents - 2 * (cents * 4 // 10)) % (k - 2)
                                 ELSE 0 END END
           END AS credit_cents
    FROM ranked
), direct AS (
    SELECT 'direct' AS channel, cents AS credit_cents
    FROM purch WHERE p_id NOT IN (SELECT p_id FROM pairs)
), all_credits AS (
    SELECT * FROM credited UNION ALL SELECT * FROM direct
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_credits,
       CAST(sum(credit_cents) AS BIGINT) AS credit_cents,
       CAST(sum(credit_cents) * 1000000
            // (SELECT sum(cents) FROM purch) AS BIGINT) AS share_ppm
FROM all_credits
GROUP BY channel
ORDER BY channel
"""


# ---------------- A105: market-basket pair lift (round 14) ----------------
# Registration note: REGISTERED r14 (Block R14b).  Registry row:
#   ("basket_pair_lift", bh.basket_pair_lift, bh.ORACLE_basket_pair_lift)
_BASKET_MIN_PAIRS = 2
_BASKET_TOPK = 100


def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A105: association-rule mining over order baskets — support /
    directed confidence / lift for part PAIRS co-occurring within an
    order, the classic market-basket report (and, re-keyed on document
    n-grams or session pages, the co-occurrence miner every
    recommendation or query-expansion stage starts from).  The one
    family the inventory lacked: A-rows compare series, D-rows compare
    documents; this compares ITEMS ACROSS BASKETS.

    Exactness: every measure is an integer-ppm division of exact
    counts — support = n_ab·10⁶ div N, confidence(a→b) = n_ab·10⁶ div
    n_a, lift = n_ab·N·10⁶ div (n_a·n_b) (int64-safe at the gate
    scales; at 10⁹ baskets swap to the cross-multiplied comparison
    form the ABC rows use).  Ties in the top-k break on (n_ab desc,
    part_a, part_b) — total order.

    Scale: the pair space is Σ_orders C(lines, 2) with TPC-H's ≤7
    lines/order — HARD-LINEAR in the fact table, never item²; the
    self-join keys on l_orderkey so it hash-partitions by basket, part
    counts are one map-side-combined aggregate, and the report is
    TakeOrdered top-k (no global sort)."""
    lines = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    # 1-row basket total, broadcast-crossed in (no driver-side action)
    n_orders = lines.agg(
        F.countDistinct("l_orderkey").alias("_n_orders")
    )
    part_n = lines.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = lines.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = lines.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _BASKET_MIN_PAIRS)
    )
    na = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    nb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    scored = (
        pairs.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("n_ab * 1000000 div _n_orders").alias("support_ppm"),
            F.expr("n_ab * 1000000 div n_a").alias("conf_a_to_b_ppm"),
            F.expr("n_ab * 1000000 div n_b").alias("conf_b_to_a_ppm"),
            F.expr("n_ab * _n_orders * 1000000 div (n_a * n_b)").alias(
                "lift_ppm"
            ),
        )
    )
    return scored.orderBy(
        F.desc("n_ab"), "part_a", "part_b"
    ).limit(_BASKET_TOPK)


ORACLE_basket_pair_lift = f"""
WITH lines AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
    SELECT count(DISTINCT l_orderkey) AS n_orders FROM lines
), pn AS (
    SELECT l_partkey, count(*) AS n_part FROM lines GROUP BY 1
), pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n_ab
    FROM lines a JOIN lines b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING count(*) >= {_BASKET_MIN_PAIRS}
)
SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(na.n_part AS BIGINT) AS n_a,
       CAST(nb.n_part AS BIGINT) AS n_b,
       CAST(n_ab * 1000000 // n.n_orders AS BIGINT) AS support_ppm,
       CAST(n_ab * 1000000 // na.n_part AS BIGINT) AS conf_a_to_b_ppm,
       CAST(n_ab * 1000000 // nb.n_part AS BIGINT) AS conf_b_to_a_ppm,
       CAST(n_ab * n.n_orders * 1000000 // (na.n_part * nb.n_part) AS BIGINT)
           AS lift_ppm
FROM pairs
JOIN pn na ON na.l_partkey = part_a
JOIN pn nb ON nb.l_partkey = part_b
CROSS JOIN n
ORDER BY n_ab DESC, part_a, part_b
LIMIT {_BASKET_TOPK}
"""


# ---------------- A106: funnel stage latency (staged r15) -----------------
# Registration note: REGISTERED r15 (Block R15 queue drain; was staged
# via scripts/check_queued.py).  Registry row:
#   ("funnel_stage_latency", bh.funnel_stage_latency,
#    bh.ORACLE_funnel_stage_latency)
def funnel_stage_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A106: time-to-convert distribution per funnel transition — the
    question after A21's conversion COUNTS is "how long does each hop
    take": per (stage_k → stage_k+1), the converted-user count, the
    mean latency, and EXACT nearest-rank p50/p90 latencies in seconds.

    Exactness: first-touch stage times are the A21 anchored-min chain
    verbatim; latencies are integer seconds (micros div 10⁶); the
    quantiles are nearest-rank order statistics computed from
    CUMULATIVE COUNTS OVER THE DISTINCT-LATENCY GRID (the
    Kaplan-Meier/Nelson-Aalen grid pattern — never a per-user global
    sort), rank = (p·n + 99) div 100; the mean is ONE IEEE division of
    exact-int sums.

    Scale: the stage chain is the gated funnel's join topology (per-
    user min aggregates, broadcast-joined forward); the quantile pass
    groups by (transition, latency) first — the grid is bounded by the
    distinct latency values, and the window partitions by transition.
    """
    ev = load(spark, sf_dir, "events")

    def first_touch(stage: str, after: DataFrame | None) -> DataFrame:
        e = ev.filter(F.col("event_type") == stage)
        if after is not None:
            e = e.join(after, "user_id").filter(F.col("ts") >= F.col("t_prev"))
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    s1 = first_touch(_STAGES[0], None)
    s2 = first_touch(
        _STAGES[1], s1.select("user_id", F.col("t").alias("t_prev"))
    )
    s3 = first_touch(
        _STAGES[2], s2.select("user_id", F.col("t").alias("t_prev"))
    )

    def deltas(a: DataFrame, b: DataFrame, name: str) -> DataFrame:
        return (
            a.select("user_id", F.col("t").alias("ta"))
            .join(b.select("user_id", F.col("t").alias("tb")), "user_id")
            .select(
                F.lit(name).alias("transition"),
                F.expr(
                    "(unix_micros(tb) - unix_micros(ta)) div 1000000"
                ).alias("lat_s"),
            )
        )

    lat = deltas(s1, s2, f"{_STAGES[0]}->{_STAGES[1]}").unionByName(
        deltas(s2, s3, f"{_STAGES[1]}->{_STAGES[2]}")
    )
    grid = lat.groupBy("transition", "lat_s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("lat_s").alias("lat_sum")
    )
    wt = Window.partitionBy("transition")
    wcum = (
        Window.partitionBy("transition")
        .orderBy("lat_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = (
        grid.withColumn("n", F.sum("cnt").over(wt))
        .withColumn("sum_all", F.sum("lat_sum").over(wt))
        .withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("i50", F.expr("(50 * n + 99) div 100"))
        .withColumn("i90", F.expr("(90 * n + 99) div 100"))
    )
    return (
        g.groupBy("transition")
        .agg(
            F.first("n").alias("n_converted"),
            (
                F.first("sum_all").cast("double")
                / F.first("n").cast("double")
            ).alias("mean_latency_s"),
            F.min(F.when(F.col("cum") >= F.col("i50"), F.col("lat_s"))).alias(
                "p50_s"
            ),
            F.min(F.when(F.col("cum") >= F.col("i90"), F.col("lat_s"))).alias(
                "p90_s"
            ),
        )
        .orderBy("transition")
    )


ORACLE_funnel_stage_latency = f"""
WITH s1 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = '{_STAGES[0]}' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
    WHERE e.event_type = '{_STAGES[1]}'
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
    WHERE e.event_type = '{_STAGES[2]}'
    GROUP BY e.user_id
), lat AS (
    SELECT '{_STAGES[0]}->{_STAGES[1]}' AS transition,
           (epoch_us(s2.t) - epoch_us(s1.t)) // 1000000 AS lat_s
    FROM s1 JOIN s2 USING (user_id)
    UNION ALL
    SELECT '{_STAGES[1]}->{_STAGES[2]}',
           (epoch_us(s3.t) - epoch_us(s2.t)) // 1000000
    FROM s2 JOIN s3 USING (user_id)
), grid AS (
    SELECT transition, lat_s, count(*) AS cnt, sum(lat_s) AS lat_sum
    FROM lat GROUP BY 1, 2
), g AS (
    SELECT *,
           sum(cnt) OVER (PARTITION BY transition) AS n,
           sum(lat_sum) OVER (PARTITION BY transition) AS sum_all,
           sum(cnt) OVER (PARTITION BY transition ORDER BY lat_s
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM grid
)
SELECT transition,
       CAST(any_value(n) AS BIGINT) AS n_converted,
       CAST(any_value(sum_all) AS DOUBLE) / any_value(n) AS mean_latency_s,
       CAST(min(CASE WHEN cum >= (50 * n + 99) // 100 THEN lat_s END)
            AS BIGINT) AS p50_s,
       CAST(min(CASE WHEN cum >= (90 * n + 99) // 100 THEN lat_s END)
            AS BIGINT) AS p90_s
FROM g
GROUP BY transition
ORDER BY transition
"""


# ---------------- A107: top conversion paths (staged r15) ------------------
# Registration note: REGISTERED r15 (Block R15 queue drain; was staged
# via scripts/check_queued.py).  Registry row:
#   ("events_conversion_paths", bh.events_conversion_paths,
#    bh.ORACLE_events_conversion_paths)
_PATH_TOPK = 10


def events_conversion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A107: the top converting JOURNEYS — for each purchasing user, the
    full ordered event-type path up to and including the FIRST purchase,
    grouped and ranked by frequency: the path report marketing/UX teams
    read next to the funnel (the funnel says WHERE users fall out; the
    paths say WHICH journeys actually convert).

    Exactness: the path is a total-order concatenation (ts, event_id
    tie-break — the Markov/A101 pair order verbatim) truncated at the
    first-purchase timestamp, so the string is deterministic; counts
    are exact; top-k ties break on the path string.  Scale: events
    group per user (one exchange); the per-user array is bounded by the
    pre-conversion journey length (sessions-bounded in practice — the
    same boundedness class as the gated sequence operators); the
    report is TakeOrdered top-k over the ≤|paths| aggregate."""
    ev = load(spark, sf_dir, "events")
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_conv"))
    )
    pre = ev.join(first_purchase, "user_id").filter(
        F.col("ts") <= F.col("t_conv")
    )
    paths = (
        pre.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return (
        paths.select(
            "path",
            F.length("path").alias("path_len"),
            "n_users",
        )
        .orderBy(F.desc("n_users"), "path")
        .limit(_PATH_TOPK)
    )


ORACLE_events_conversion_paths = f"""
WITH fp AS (
    SELECT user_id, min(ts) AS t_conv FROM events
    WHERE event_type = 'purchase' GROUP BY user_id
), pre AS (
    SELECT e.user_id, e.ts, e.event_id, e.event_type
    FROM events e JOIN fp USING (user_id)
    WHERE e.ts <= fp.t_conv
), paths AS (
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM pre GROUP BY user_id
)
SELECT path, CAST(length(path) AS BIGINT) AS path_len,
       CAST(count(*) AS BIGINT) AS n_users
FROM paths
GROUP BY path
ORDER BY n_users DESC, path
LIMIT {_PATH_TOPK}
"""


# ---------------- A110: post-event dwell-time quantiles (round 15) --------
def events_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A110: how long users LINGER after each event type — the
    engagement metric between A20's session stats and A106's funnel
    latencies: per event type, the count of events with a successor in
    the same user's stream, the mean dwell, and EXACT nearest-rank
    p50/p90 dwell seconds (dwell = gap to the user's NEXT event,
    attributed to the current event's type).

    Exactness: the per-user order is the total (ts, event_id) rule
    (A101); dwell is integer seconds of the epoch-micros difference;
    quantiles are the A106 cumulative-count grid over DISTINCT dwell
    values; the mean is ONE IEEE division of exact-int sums.

    Scale: one lead window partitioned per user (the sessionize
    topology), then a map-side-combined (type, dwell) grid aggregate;
    the quantile windows ride the bounded grid."""
    ev = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dw = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lead(F.expr("unix_micros(ts)")).over(wu).alias("next_us"),
        )
        .filter(F.col("next_us").isNotNull())
        .select(
            "event_type",
            F.expr("(next_us - unix_micros(ts)) div 1000000").alias("dwell_s"),
        )
    )
    grid = dw.groupBy("event_type", "dwell_s").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return dwell_report(grid)


def dwell_report(grid: DataFrame) -> DataFrame:
    """The A110 quantile derivation over the reduced (event_type,
    dwell_s, cnt) grid — shared verbatim by the batch plan and the T46
    streaming monitor (the T41/T44 shared-expression rule); windows
    ride the bounded grid."""
    grid = grid.withColumn("dsum", F.col("dwell_s") * F.col("cnt"))
    wt = Window.partitionBy("event_type")
    wcum = wt.orderBy("dwell_s").rowsBetween(Window.unboundedPreceding, 0)
    g = (
        grid.withColumn("n", F.sum("cnt").over(wt))
        .withColumn("sum_all", F.sum("dsum").over(wt))
        .withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("i50", F.expr("(50 * n + 99) div 100"))
        .withColumn("i90", F.expr("(90 * n + 99) div 100"))
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.first("n").alias("n_dwells"),
            (
                F.first("sum_all").cast("double")
                / F.first("n").cast("double")
            ).alias("mean_dwell_s"),
            F.min(F.when(F.col("cum") >= F.col("i50"), F.col("dwell_s"))).alias("p50_s"),
            F.min(F.when(F.col("cum") >= F.col("i90"), F.col("dwell_s"))).alias("p90_s"),
        )
        .orderBy("event_type")
    )


ORACLE_events_dwell_time = """
WITH dw AS (
    SELECT event_type,
           (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
            - epoch_us(ts)) // 1000000 AS dwell_s
    FROM events
), d AS (
    SELECT event_type, dwell_s FROM dw WHERE dwell_s IS NOT NULL
), grid AS (
    SELECT event_type, dwell_s, count(*) AS cnt,
           CAST(sum(dwell_s) AS BIGINT) AS dsum
    FROM d GROUP BY event_type, dwell_s
), g AS (
    SELECT event_type, dwell_s, cnt,
           sum(cnt) OVER (PARTITION BY event_type) AS n,
           sum(dsum) OVER (PARTITION BY event_type) AS sum_all,
           sum(cnt) OVER (PARTITION BY event_type ORDER BY dwell_s
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM grid
)
SELECT event_type,
       CAST(any_value(n) AS BIGINT) AS n_dwells,
       CAST(any_value(sum_all) AS DOUBLE) / CAST(any_value(n) AS DOUBLE)
           AS mean_dwell_s,
       CAST(min(CASE WHEN cum >= (50 * n + 99) // 100 THEN dwell_s END)
            AS BIGINT) AS p50_s,
       CAST(min(CASE WHEN cum >= (90 * n + 99) // 100 THEN dwell_s END)
            AS BIGINT) AS p90_s
FROM g
GROUP BY event_type
ORDER BY event_type
"""
