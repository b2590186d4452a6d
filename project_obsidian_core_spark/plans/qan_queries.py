"""QAN query shapes (SURVEY §2) mapped onto the driver's `events` table.

The reference's domain tables (qan_db/metrics_db) don't exist in the driver's
testdata, so for the oracle gate each QAN operator is expressed over `events`
with the natural mapping: ``user_id`` -> instance, ``event_type`` -> digest,
``value`` -> metric, ``ts`` -> collection time. The same operator code paths
(delta windowing, rollup aggregation, ranked unions, conditional pivots) run
against real qan_db tables via the ``analytics`` package; unit tests pin that
behavior on snapshot fixtures.

Every query here has an ANSI-SQL oracle (same module, ``ORACLE`` dict) that
DuckDB runs on identical parquet; see plans/common.py for the determinism
rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_obsidian_core_spark.plans.common import cents, load


# --------------------------------------------------------------------- Q1
def qan_top_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N by total metric — the signature QAN query (A3+A4+O1;
    02-Query_Analysis.ipynb get_top_queries)."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total_calls"),
        F.sum(cents("value")).alias("total_value_cents"),
    )
    return (
        agg.withColumn(
            "avg_value",
            F.when(
                F.col("total_calls") > 0,
                (F.col("total_value_cents").cast("double") / 100.0) / F.col("total_calls"),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy(F.desc("total_value_cents"), F.asc("event_type"))
        .limit(10)
    )


ORACLE_qan_top_digests = """
SELECT event_type,
       count(*) AS total_calls,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_value_cents,
       CASE WHEN count(*) > 0
            THEN (CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0) / count(*)
            ELSE 0.0 END AS avg_value
FROM events
GROUP BY event_type
ORDER BY total_value_cents DESC, event_type ASC
LIMIT 10
"""


def qan_top_digests_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same top-N contract as :func:`qan_top_digests`, computed through
    the skew-immune salted two-phase aggregation (functions/skew.py) — the
    path you switch to when one hot digest dominates the shuffle. Integer
    partial sums merge exactly, so the oracle is IDENTICAL to the plain
    formulation: salting must not change a single value."""
    from project_obsidian_core_spark.functions.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    agg = salted_agg(
        ev.select("event_type", cents("value").alias("vc")),
        keys=["event_type"],
        aggs={
            "total_calls": ("count", "vc"),
            "total_value_cents": ("sum", "vc"),
        },
    )
    return (
        agg.withColumn(
            "avg_value",
            F.when(
                F.col("total_calls") > 0,
                (F.col("total_value_cents").cast("double") / 100.0) / F.col("total_calls"),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy(F.desc("total_value_cents"), F.asc("event_type"))
        .limit(10)
    )


#: identical contract — the salted plan must reproduce the plain plan's
#: values bit-for-bit
ORACLE_qan_top_digests_salted = ORACLE_qan_top_digests


# --------------------------------------------------------------------- Q2
def qan_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core snapshot-delta operator (J1/W2/T2-T5) as a lag window.

    A deterministic cumulative counter is synthesized per event
    (``event_id*37 % 10000`` — non-monotone, so the counter-reset branch is
    exercised), keyed by (user_id=instance, event_type=digest), ordered by
    scrape time. Delta rule: curr-prev if monotone else curr; first
    observation per key emits nothing; zero deltas filtered (P3);
    time_period_seconds attached (T5).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        "event_id",
        ((F.col("event_id") * 37) % 10000).alias("counter"),
        F.unix_micros("ts").alias("ts_us"),
        "ts",
    )
    d = s.select(
        "user_id",
        "event_type",
        "event_id",
        "counter",
        F.lag("counter").over(w).alias("prev_counter"),
        F.lag("ts_us").over(w).alias("prev_ts_us"),
        "ts_us",
    )
    delta = F.when(
        F.col("counter") >= F.col("prev_counter"),
        F.col("counter") - F.col("prev_counter"),
    ).otherwise(F.col("counter"))
    return (
        d.filter(F.col("prev_counter").isNotNull())
        .select(
            "user_id",
            "event_type",
            "event_id",
            delta.alias("calls_delta"),
            (
                (F.col("ts_us") - F.col("prev_ts_us")).cast("double") / F.lit(1000000.0)
            ).alias("time_period_seconds"),
        )
        .filter(F.col("calls_delta") > 0)
    )


ORACLE_qan_snapshot_delta = """
WITH s AS (
    SELECT user_id, event_type, event_id,
           (event_id * 37) % 10000 AS counter,
           epoch_us(ts) AS ts_us, ts
    FROM events
), d AS (
    SELECT user_id, event_type, event_id, counter, ts_us,
           lag(counter) OVER w AS prev_counter,
           lag(ts_us)   OVER w AS prev_ts_us
    FROM s
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT user_id, event_type, event_id,
       CASE WHEN counter >= prev_counter THEN counter - prev_counter ELSE counter END AS calls_delta,
       CAST(ts_us - prev_ts_us AS DOUBLE) / 1000000.0 AS time_period_seconds
FROM d
WHERE prev_counter IS NOT NULL
  AND (CASE WHEN counter >= prev_counter THEN counter - prev_counter ELSE counter END) > 0
"""


# --------------------------------------------------------------------- Q3
def qan_rollup_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time rollup (A1/A2, S10): minute-truncated time bucket,
    dimension group, sum + max + min — the metrics_db materialization."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("time"),
            "user_id",
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents("value")).alias("value_sum_cents"),
            F.max(cents("value")).alias("value_max_cents"),
            F.min(cents("value")).alias("value_min_cents"),
        )
    )


ORACLE_qan_rollup_minute = """
SELECT date_trunc('minute', ts) AS time,
       user_id, event_type,
       count(*) AS n_rows,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_sum_cents,
       max(CAST(round(value * 100, 0) AS BIGINT)) AS value_max_cents,
       min(CAST(round(value * 100, 0) AS BIGINT)) AS value_min_cents
FROM events
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------- Q4
def qan_trend_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed trend (A6/F1): TIME_FLOOR(ts, PT5M) buckets per digest
    with guarded per-call average (A4). Bucket emitted as epoch seconds."""
    ev = load(spark, sf_dir, "events")
    # integer div keeps the bucket arithmetic exact (µs epochs are ~1.7e15)
    bucket = (F.expr("unix_micros(ts) div 300000000") * 300).alias("bucket_epoch_s")
    agg = ev.groupBy(bucket, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("total_calls"),
        F.sum(cents("value")).alias("total_value_cents"),
    )
    return agg.withColumn(
        "avg_value_per_call",
        F.when(
            F.col("total_calls") > 0,
            (F.col("total_value_cents").cast("double") / 100.0) / F.col("total_calls"),
        ).otherwise(F.lit(0.0)),
    )


ORACLE_qan_trend_5m = """
SELECT (epoch_us(ts) // 300000000) * 300 AS bucket_epoch_s,
       event_type,
       count(*) AS total_calls,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_value_cents,
       CASE WHEN count(*) > 0
            THEN (CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0) / count(*)
            ELSE 0.0 END AS avg_value_per_call
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------- Q5
def qan_multi_metric_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-metric ranked comparison (W1+U1+O3+P9): one aggregate ranked by
    three different metrics via ROW_NUMBER, rank<=3 filtered, UNION ALLed
    with literal metric tags (02-Query_Analysis.ipynb cell-12)."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.sum(cents("value")).alias("total_value_cents"),
        F.count(F.lit(1)).alias("total_calls"),
        F.max(cents("value")).alias("max_value_cents"),
    )
    # Per-branch top-N as orderBy+limit (plans as TakeOrderedAndProject —
    # per-partition heaps, no single-partition WindowExec sort); rank is
    # recovered on the tiny union with a window PARTITIONed BY metric, so
    # no unpartitioned window appears anywhere in the plan.
    parts = []
    for label, col in [
        ("total_value", "total_value_cents"),
        ("calls", "total_calls"),
        ("max_value", "max_value_cents"),
    ]:
        parts.append(
            agg.orderBy(F.desc(col), F.asc("event_type"))
            .limit(3)
            .select(
                F.lit(label).alias("metric"),
                F.col("event_type"),
                F.col(col).alias("value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.partitionBy("metric").orderBy(F.desc("value"), F.asc("event_type"))
    return out.withColumn("rank", F.row_number().over(w))


ORACLE_qan_multi_metric_topn = """
WITH agg AS (
    SELECT event_type,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_value_cents,
           count(*) AS total_calls,
           max(CAST(round(value * 100, 0) AS BIGINT)) AS max_value_cents
    FROM events GROUP BY event_type
), r1 AS (
    SELECT 'total_value' AS metric, event_type, total_value_cents AS value,
           row_number() OVER (ORDER BY total_value_cents DESC, event_type ASC) AS rank
    FROM agg
), r2 AS (
    SELECT 'calls' AS metric, event_type, total_calls AS value,
           row_number() OVER (ORDER BY total_calls DESC, event_type ASC) AS rank
    FROM agg
), r3 AS (
    SELECT 'max_value' AS metric, event_type, max_value_cents AS value,
           row_number() OVER (ORDER BY max_value_cents DESC, event_type ASC) AS rank
    FROM agg
)
SELECT * FROM r1 WHERE rank <= 3
UNION ALL SELECT * FROM r2 WHERE rank <= 3
UNION ALL SELECT * FROM r3 WHERE rank <= 3
"""


# --------------------------------------------------------------------- Q6
def qan_compare_systems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-system summary (A7+A8): rows bucketed into two synthetic
    db_systems; per system count, COUNT(DISTINCT digest), total metric and a
    conditional average that dispatches on system."""
    ev = load(spark, sf_dir, "events")
    sys_col = F.when(F.col("user_id") % 2 == 0, F.lit("mysql")).otherwise(
        F.lit("postgresql")
    )
    df = ev.withColumn("db_system", sys_col).withColumn("vc", cents("value"))
    # The per-system unit conversion (A8's CASE dispatch) is constant within
    # each group, so it hoists out of the SUM — keeping the aggregate an
    # exact integer sum (a double SUM would be summation-order-dependent).
    scaled_total = F.when(
        F.col("db_system") == "mysql", F.col("total_value_cents").cast("double") / 10.0
    ).when(
        F.col("db_system") == "postgresql",
        F.col("total_value_cents").cast("double") / 100.0,
    )
    return (
        df.groupBy("db_system")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.countDistinct("event_type").alias("unique_queries"),
            F.sum("vc").alias("total_value_cents"),
        )
        .withColumn(
            "avg_latency_ms",
            F.when(
                F.col("record_count") > 0, scaled_total / F.col("record_count")
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("db_system")
    )


ORACLE_qan_compare_systems = """
WITH t AS (
    SELECT CASE WHEN user_id % 2 = 0 THEN 'mysql' ELSE 'postgresql' END AS db_system,
           event_type,
           CAST(round(value * 100, 0) AS BIGINT) AS vc
    FROM events
), agg AS (
    SELECT db_system,
           count(*) AS record_count,
           count(DISTINCT event_type) AS unique_queries,
           CAST(sum(vc) AS BIGINT) AS total_value_cents
    FROM t GROUP BY db_system
)
SELECT db_system, record_count, unique_queries, total_value_cents,
       CASE WHEN record_count > 0
            THEN (CASE WHEN db_system = 'mysql' THEN CAST(total_value_cents AS DOUBLE) / 10.0
                       WHEN db_system = 'postgresql' THEN CAST(total_value_cents AS DOUBLE) / 100.0 END)
                 / record_count
            ELSE 0.0 END AS avg_latency_ms
FROM agg
ORDER BY db_system
"""


# --------------------------------------------------------------------- Q7
def qan_hit_ratio_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics self-alignment pivot (J2+A5): two metric series from the long
    table aligned per (hour, instance) via conditional aggregation, ratio
    hit/(hit+read) — the buffer-cache-hit-ratio query."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("time_bucket"),
        F.col("user_id"),
    ).agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "view", cents("value"))), F.lit(0)
        ).alias("hit_cents"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", cents("value"))), F.lit(0)
        ).alias("read_cents"),
    )
    return agg.withColumn(
        "hit_ratio",
        F.when(
            (F.col("hit_cents") + F.col("read_cents")) > 0,
            F.col("hit_cents").cast("double")
            / (F.col("hit_cents") + F.col("read_cents")),
        ).otherwise(F.lit(0.0)),
    )


ORACLE_qan_hit_ratio_pivot = """
WITH agg AS (
    SELECT date_trunc('hour', ts) AS time_bucket,
           user_id,
           CAST(coalesce(sum(CASE WHEN event_type = 'view'
                             THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS hit_cents,
           CAST(coalesce(sum(CASE WHEN event_type = 'click'
                             THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS read_cents
    FROM events
    GROUP BY 1, 2
)
SELECT time_bucket, user_id, hit_cents, read_cents,
       CASE WHEN (hit_cents + read_cents) > 0
            THEN CAST(hit_cents AS DOUBLE) / (hit_cents + read_cents)
            ELSE 0.0 END AS hit_ratio
FROM agg
"""


# --------------------------------------------------------------------- Q8
def qan_distinct_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (A10): metric discovery."""
    ev = load(spark, sf_dir, "events")
    sys_col = F.when(F.col("user_id") % 2 == 0, F.lit("mysql")).otherwise(
        F.lit("postgresql")
    )
    return (
        ev.select(F.col("event_type"), sys_col.alias("db_system"))
        .distinct()
        .orderBy("event_type", "db_system")
    )


ORACLE_qan_distinct_metrics = """
SELECT DISTINCT event_type,
       CASE WHEN user_id % 2 = 0 THEN 'mysql' ELSE 'postgresql' END AS db_system
FROM events
ORDER BY event_type, db_system
"""


# --------------------------------------------------------------------- Q9
def qan_like_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern filter + HAVING on aggregate (P6+P8): the notebook's
    interactive sample filter over statement text."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("props").like("%8%"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("matching_calls"),
            F.sum(cents("value")).alias("total_value_cents"),
        )
        .filter(F.col("matching_calls") > 5)
        .orderBy("event_type")
    )


ORACLE_qan_like_having = """
SELECT event_type,
       count(*) AS matching_calls,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM events
WHERE props LIKE '%8%'
GROUP BY event_type
HAVING count(*) > 5
ORDER BY event_type
"""


# --------------------------------------------------------------------- Q10
def qan_load_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The governor's load formula (A11+F12+T10): per instance a weighted
    composite of activity ratios, clamped to [0,1] —
    0.7*busy_ratio + 0.3*slow_ratio (adaptive/mysql_collector.go:88-113)."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("busy_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("slow_events"),
    )
    load_expr = F.lit(0.7) * (
        F.col("busy_events").cast("double") / F.col("total_events")
    ) + F.lit(0.3) * (F.col("slow_events").cast("double") / F.col("total_events"))
    return agg.withColumn(
        "load_score",
        F.least(F.lit(1.0), F.greatest(load_expr, F.lit(0.0))),
    ).orderBy("user_id")


ORACLE_qan_load_score = """
WITH agg AS (
    SELECT user_id,
           count(*) AS total_events,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS busy_events,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS slow_events
    FROM events GROUP BY user_id
)
SELECT user_id, total_events, busy_events, slow_events,
       least(1.0, greatest(0.7 * (CAST(busy_events AS DOUBLE) / total_events)
                         + 0.3 * (CAST(slow_events AS DOUBLE) / total_events), 0.0)) AS load_score
FROM agg
ORDER BY user_id
"""


# --------------------------------------------------------------------- Q11
def qan_labels_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic-schema escape hatch (SURVEY §1.2): `metric.labels` is a
    JSON dimension in the reference (metrics_db_ingestion.json:33-36). Here:
    extract a label from the JSON props column, bucket it, aggregate — the
    Druid json-dimension groupBy re-expressed with get_json_object.

    JSON parsing happens once per row in the scan projection (JVM-side
    simdjson-like parser, no Python); the groupBy key is the extracted
    scalar, so the shuffle carries longs, not JSON strings.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select((k % 10).alias("label_bucket"), cents("value").alias("vc"))
        .groupBy("label_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vc").alias("total_value_cents"),
        )
        .orderBy("label_bucket")
    )


ORACLE_qan_labels_json = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS label_bucket,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM events
GROUP BY 1
ORDER BY label_bucket
"""


# --------------------------------------------------------------------- Q11b
def qan_query_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide per-query profile of qan_analysis_example.ipynb cell-7: one
    aggregate producing every headline metric — execution count, total time
    (unit-converted), guarded avg-per-call, rows examined/sent, and the
    examined:sent ratio-of-sums — then top-N.

    One shuffle for the groupBy; every derived column is a single
    deterministic double division of exact integer sums (plans/common.py
    rules). countDistinct adds a second aggregation pass over the same
    partitioning, not a new shuffle of the fact table.
    """
    from project_obsidian_core_spark.functions.units import guarded_div

    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    agg = ev.groupBy(F.col("event_type").alias("digest")).agg(
        F.count(F.lit(1)).alias("execution_count"),
        F.sum(cents("value")).alias("tc"),
        F.sum(k).alias("rows_examined"),
        F.countDistinct("user_id").alias("rows_sent"),
    )
    return (
        agg.select(
            "digest",
            "execution_count",
            (F.col("tc").cast("double") / 1000.0).alias("total_time_sec"),
            guarded_div(F.col("tc").cast("double"), F.col("execution_count")).alias(
                "avg_time_ms"
            ),
            "rows_examined",
            "rows_sent",
            guarded_div(
                F.col("rows_examined").cast("double"), F.col("rows_sent")
            ).alias("examined_sent_ratio"),
        )
        .orderBy(F.desc("total_time_sec"), "digest")
        .limit(10)
    )


ORACLE_qan_query_profile = """
WITH agg AS (
    SELECT event_type AS digest,
           count(*) AS execution_count,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS tc,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS rows_examined,
           count(DISTINCT user_id) AS rows_sent
    FROM events
    GROUP BY 1
)
SELECT digest,
       execution_count,
       CAST(tc AS DOUBLE) / 1000.0 AS total_time_sec,
       CASE WHEN execution_count > 0
            THEN CAST(tc AS DOUBLE) / execution_count ELSE 0.0 END AS avg_time_ms,
       rows_examined,
       rows_sent,
       CASE WHEN rows_sent > 0
            THEN CAST(rows_examined AS DOUBLE) / rows_sent ELSE 0.0 END
           AS examined_sent_ratio
FROM agg
ORDER BY total_time_sec DESC, digest
LIMIT 10
"""


# --------------------------------------------------------------------- Q12
def qan_unique_queries_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 unique-query counting, registered with the exact ``countDistinct``
    as the hash-checked contract (HLL estimates are engine-specific, so an
    approx column can never hash-match a DuckDB oracle). The HLL scale path
    lives in :func:`qan_unique_queries_hll` — identical shape with
    ``approx_count_distinct`` — and is pinned by a relative-error unit test
    (tests/test_e2e_pipeline.py::test_approx_count_distinct_accuracy).
    At 100 TB you run the HLL variant: the sketch aggregates map-side into
    ~1.5 KB per group instead of shuffling every digest.
    """
    ev = load(spark, sf_dir, "events")
    sys_col = F.when(F.col("user_id") % 2 == 0, F.lit("mysql")).otherwise(
        F.lit("postgresql")
    )
    return (
        ev.withColumn("db_system", sys_col)
        .groupBy("db_system")
        .agg(
            F.countDistinct("event_type").alias("unique_queries"),
            F.count(F.lit(1)).alias("record_count"),
        )
        .orderBy("db_system")
    )


ORACLE_qan_unique_queries_approx = """
SELECT CASE WHEN user_id % 2 = 0 THEN 'mysql' ELSE 'postgresql' END AS db_system,
       count(DISTINCT event_type) AS unique_queries,
       count(*) AS record_count
FROM events
GROUP BY 1
ORDER BY db_system
"""


def qan_unique_queries_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approx (HyperLogLog++) twin of :func:`qan_unique_queries_approx`
    — the plan you run at 100 TB. Not oracle-gated (engine-specific
    estimate); accuracy pinned against the exact count in unit tests."""
    ev = load(spark, sf_dir, "events")
    sys_col = F.when(F.col("user_id") % 2 == 0, F.lit("mysql")).otherwise(
        F.lit("postgresql")
    )
    return (
        ev.withColumn("db_system", sys_col)
        .groupBy("db_system")
        .agg(
            F.approx_count_distinct("event_type", rsd=0.01).alias("unique_queries_approx"),
            F.count(F.lit(1)).alias("record_count"),
        )
        .orderBy("db_system")
    )


def qan_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-rollup merge (Druid ``rollup=true`` segment-merge
    semantics, S10): two disjoint half-corpus rollups re-aggregated with
    sum/sum/max/min must equal the full rollup — the algebraic
    mergeability every distributed rollup (and Spark's own partial
    aggregation) relies on. The oracle computes the full rollup directly,
    so the gate IS the merge-equivalence proof."""
    ev = load(spark, sf_dir, "events")

    def half_rollup(part: DataFrame) -> DataFrame:
        return part.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("time"),
            "user_id",
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents("value")).alias("value_sum_cents"),
            F.max(cents("value")).alias("value_max_cents"),
            F.min(cents("value")).alias("value_min_cents"),
        )

    halves = half_rollup(ev.filter(F.col("event_id") % 2 == 0)).unionByName(
        half_rollup(ev.filter(F.col("event_id") % 2 == 1))
    )
    return halves.groupBy("time", "user_id", "event_type").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("value_sum_cents").alias("value_sum_cents"),
        F.max("value_max_cents").alias("value_max_cents"),
        F.min("value_min_cents").alias("value_min_cents"),
    )


ORACLE_qan_rollup_merge = ORACLE_qan_rollup_minute


def qan_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup cascade (Druid segment-granularity
    hierarchy, S9/S10): the HOUR rollup is derived FROM the minute rollup
    (sum of counts/sums, max of maxes, min of mins) — never from raw. The
    oracle computes the hour rollup directly from raw events, so the gate
    IS the proof that the cascade is lossless: at 100 TB coarser grains
    re-aggregate the previous materialization (minutes-per-hour rows),
    not the fact table."""
    ev = load(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("time"),
        "user_id",
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents("value")).alias("value_sum_cents"),
        F.max(cents("value")).alias("value_max_cents"),
        F.min(cents("value")).alias("value_min_cents"),
    )
    return (
        minute.groupBy(
            F.date_trunc("hour", F.col("time")).alias("time"),
            "user_id",
            "event_type",
        )
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("value_sum_cents").alias("value_sum_cents"),
            F.max("value_max_cents").alias("value_max_cents"),
            F.min("value_min_cents").alias("value_min_cents"),
        )
        .orderBy("time", "user_id", "event_type")
    )


ORACLE_qan_rollup_cascade = """
SELECT date_trunc('hour', ts) AS time,
       user_id, event_type,
       count(*) AS n_rows,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_sum_cents,
       max(CAST(round(value * 100, 0) AS BIGINT)) AS value_max_cents,
       min(CAST(round(value * 100, 0) AS BIGINT)) AS value_min_cents
FROM events
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ------------------------------------------------------ SLO burn rate -----
#: SLO: 99% success => 1% error budget (10_000 ppm); the Google SRE
#: workbook fast-burn pair alerts when BOTH the short and long window burn
#: the budget at >= 14.4x (i.e. a 30-day budget gone in ~2 days).
_SLO_BUDGET_PPM = 10_000
_BURN_X10 = 144  # 14.4x, scaled by 10 to stay integral


def qan_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A34: multi-window error-budget burn-rate alert — the SRE-workbook
    alerting rule run as a query: per instance, the 5-minute error rate
    AND its enclosing 1-hour error rate, with the fast-burn flag set
    only when BOTH windows exceed 14.4x the SLO budget (the short window
    gives reaction time, the long one suppresses blips).

    One scan: 5-minute (instance, bucket) conditional counts; the 1-hour
    rates RE-AGGREGATE those 5-minute rows (never a second scan) and
    join back on the hour key — the same lossless-cascade shape as
    qan_rollup_cascade. All rates exact ppm ints; the burn comparison is
    pure integer arithmetic (err_ppm·10 > 144·budget), so the alert
    flag is bit-stable cross-engine."""
    ev = load(spark, sf_dir, "events")
    b5 = (F.expr("unix_micros(ts) div 300000000") * 300).alias("bucket5_s")
    five = (
        ev.select(
            (F.col("user_id") % 10).alias("instance_id"),
            b5,
            (F.col("event_type") == "error").cast("int").alias("is_err"),
        )
        .groupBy("instance_id", "bucket5_s")
        .agg(
            F.count(F.lit(1)).alias("n5"),
            F.sum("is_err").alias("err5"),
        )
        .withColumn("hour_s", F.expr("bucket5_s div 3600") * 3600)
    )
    hour = five.groupBy("instance_id", "hour_s").agg(
        F.sum("n5").alias("n1h"), F.sum("err5").alias("err1h")
    )
    j = five.join(hour, ["instance_id", "hour_s"])
    ppm5 = F.expr("err5 * 1000000 div n5")
    ppm1h = F.expr("err1h * 1000000 div n1h")
    fast = (ppm5 * 10 > _BURN_X10 * _SLO_BUDGET_PPM) & (
        ppm1h * 10 > _BURN_X10 * _SLO_BUDGET_PPM
    )
    return j.select(
        "instance_id",
        "bucket5_s",
        "n5",
        "err5",
        ppm5.alias("err_ppm_5m"),
        ppm1h.alias("err_ppm_1h"),
        fast.alias("fast_burn"),
    ).orderBy("instance_id", "bucket5_s")


ORACLE_qan_burn_rate = f"""
WITH five AS (
    SELECT user_id % 10 AS instance_id,
           (epoch_us(ts) // 300000000) * 300 AS bucket5_s,
           count(*) AS n5,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS err5
    FROM events
    GROUP BY 1, 2
), five_h AS (
    SELECT *, (bucket5_s // 3600) * 3600 AS hour_s FROM five
), hour AS (
    SELECT instance_id, hour_s,
           CAST(sum(n5) AS BIGINT) AS n1h,
           CAST(sum(err5) AS BIGINT) AS err1h
    FROM five_h GROUP BY 1, 2
)
SELECT f.instance_id, f.bucket5_s, f.n5, f.err5,
       f.err5 * 1000000 // f.n5 AS err_ppm_5m,
       h.err1h * 1000000 // h.n1h AS err_ppm_1h,
       (f.err5 * 1000000 // f.n5) * 10 > {_BURN_X10 * _SLO_BUDGET_PPM}
           AND (h.err1h * 1000000 // h.n1h) * 10
               > {_BURN_X10 * _SLO_BUDGET_PPM} AS fast_burn
FROM five_h f JOIN hour h
  ON h.instance_id = f.instance_id AND h.hour_s = f.hour_s
ORDER BY f.instance_id, f.bucket5_s
"""


# ---------------------------------------------------- top-N + other -------
_TOPN_OTHER_K = 3


def qan_top_digests_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: the "top-N + other" dashboard contract — the top 3 digests by
    total value keep their identity, everything else folds into one
    'other' row, and the report still accounts for 100% of the volume
    (the property plain top-N silently drops). Rank over the per-digest
    aggregate (≤ digest-cardinality rows — tiny), CASE-relabel, one
    re-aggregation; the fact table is scanned once."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy(F.col("event_type").alias("digest")).agg(
        F.count(F.lit(1)).alias("calls"),
        F.sum(cents("value")).alias("value_cents"),
    )
    w = Window.orderBy(F.col("value_cents").desc(), F.col("digest"))
    ranked = agg.withColumn("rnk", F.row_number().over(w))
    labeled = ranked.select(
        F.when(F.col("rnk") <= _TOPN_OTHER_K, F.col("digest"))
        .otherwise(F.lit("other"))
        .alias("digest"),
        F.when(F.col("rnk") <= _TOPN_OTHER_K, F.col("rnk"))
        .otherwise(F.lit(_TOPN_OTHER_K + 1))
        .alias("rnk"),
        "calls",
        "value_cents",
    )
    return (
        labeled.groupBy("digest", "rnk")
        .agg(
            F.sum("calls").alias("calls"),
            F.sum("value_cents").alias("value_cents"),
            F.count(F.lit(1)).alias("n_digests"),
        )
        .orderBy("rnk", "digest")
    )


ORACLE_qan_top_digests_other = f"""
WITH agg AS (
    SELECT event_type AS digest, count(*) AS calls,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events GROUP BY 1
), ranked AS (
    SELECT *, row_number() OVER (ORDER BY value_cents DESC, digest) AS rnk
    FROM agg
), labeled AS (
    SELECT CASE WHEN rnk <= {_TOPN_OTHER_K} THEN digest ELSE 'other' END
               AS digest,
           CASE WHEN rnk <= {_TOPN_OTHER_K} THEN rnk
                ELSE {_TOPN_OTHER_K + 1} END AS rnk,
           calls, value_cents
    FROM ranked
)
SELECT digest, CAST(rnk AS BIGINT) AS rnk,
       CAST(sum(calls) AS BIGINT) AS calls,
       CAST(sum(value_cents) AS BIGINT) AS value_cents,
       count(*) AS n_digests
FROM labeled
GROUP BY digest, rnk
ORDER BY rnk, digest
"""
