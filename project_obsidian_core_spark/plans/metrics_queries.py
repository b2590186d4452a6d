"""Driver-gated wrappers for the metrics_db analytics (A9/J2 — SURVEY §2.4).

The metrics_db long table (time, instance, metric_name, value) doesn't exist
in the driver testdata, so a deterministic long-format metrics relation is
synthesized from `events` (event_type → OTel-style metric name, cents →
metric_value) and fed through the REAL analytics operators
(:mod:`analytics.metrics`) — the same code paths the notebook drives
(01-Connect_and_Metrics.ipynb cell-8/cell-10). The oracle SQL is generated
from the same constants so the mapping cannot drift.

Determinism: metric_value is integer cents, so the AVG accumulates integers
exactly in a double accumulator (values ≪ 2^53) on both engines and the
single final division is bit-stable; the hit ratio is a guarded single
division of exact conditional sums (plans/common.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.analytics import metrics as MA
from project_obsidian_core_spark.plans.common import cents, load

HIT = "postgresql.blocks_hit"
READ = "postgresql.blocks_read"

#: shared events → long-metrics mapping, SQL side (kept in lockstep with
#: :func:`synthesize_metrics` by construction)
_SYN_SQL = f"""
    SELECT ts AS time,
           CAST(user_id AS VARCHAR) AS instance_id,
           CASE WHEN event_type = 'view' THEN '{HIT}'
                WHEN event_type = 'click' THEN '{READ}'
                ELSE 'postgresql.' || event_type END AS metric_name,
           CAST(round(value * 100, 0) AS BIGINT) AS metric_value
    FROM events
"""


def synthesize_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format metrics rows derived from `events` (S11's receiver shape)."""
    ev = load(spark, sf_dir, "events")
    name = (
        F.when(F.col("event_type") == "view", F.lit(HIT))
        .when(F.col("event_type") == "click", F.lit(READ))
        .otherwise(F.concat(F.lit("postgresql."), F.col("event_type")))
    )
    return ev.select(
        F.col("ts").alias("time"),
        F.col("user_id").cast("string").alias("instance_id"),
        F.lit("postgresql").alias("db_system"),
        name.alias("metric_name"),
        cents("value").alias("metric_value"),
    )


def _guard_series_pairs(
    rel: DataFrame,
    series_col: str,
    max_series: int | None,
    pair_block: str | None,
    op: str,
    count_rel: DataFrame | None = None,
    defer: bool = False,
) -> DataFrame:
    """Pre-flight + blocking guard for the all-pairs SERIES axis shared by
    the association matrices (A37 Pearson, A62 xcorr, A65 Kendall).

    Within-series pair work in those operators is window-bounded (the
    retention grid), but the SERIES-pair axis is S²/2: SCALE.md's r10 soak
    measured 202M sign pairs at just 40 series, so at 10⁴+ series the
    matrix itself is the scale killer.  This is the same failure shape the
    dedup family guards with ``max_bucket``/``max_eval``
    (:func:`datapipe.dedup.minhash_candidates`,
    :func:`datapipe.similarity.lsh_recall`) — mirror those:

    - ``max_series`` — raising pre-flight: count distinct series (a 1-row
      bounded control-plane read, the LSH-capacity idiom) and refuse to
      build an S²/2 plan above the cap unless the caller raised the cap
      explicitly or supplied a block.
    - ``pair_block`` — a SQL expression over ``series_col`` assigning each
      series to a block; pairing is then SAME-BLOCK ONLY, reducing S²/2 to
      Σ bᵢ²/2 (the caller's domain knowledge — host group, metric family,
      dashboard — picks the blocks).  The guard re-checks the LARGEST
      block against ``max_series`` so an oversized block cannot smuggle
      the quadratic back in.

    Returns ``rel`` unchanged when ``pair_block`` is None (gate plans
    byte-identical), else with a ``__blk`` column the caller must fold
    into its pair-join key.

    ``count_rel``, when given, is a CHEAPER upstream relation carrying
    the same ``series_col`` population (the raw pruned projection): the
    pre-flight only needs the distinct series set, so its job skips the
    rollup/window stages entirely.  Measured cost at sf0.1 is ~0.3-0.5 s
    per query either way (the pruned scan dominates, not the windows) —
    noted in SCALE.md so the three gated queries' bench drift is
    pre-explained.

    ``defer=True`` (the r11 ADVICE flag): plan construction stays LAZY —
    instead of the eager 1-row ``collect()``, the cap check is embedded
    in the plan itself as a broadcast 1-row cross join + an
    ``assert_true`` FILTER on the pair input, so the builder never runs
    a Spark job and an over-cap corpus fails at EXECUTION time, before
    the quadratic pair join consumes its input.  A filter (not a bare
    projected column) so column pruning can never fold the check away.
    The gate queries keep the eager default — plans byte-identical.
    """
    if pair_block is not None:
        rel = rel.withColumn("__blk", F.expr(pair_block))
    if max_series is not None:
        check = (count_rel if count_rel is not None else rel).select(series_col)
        key = []
        if pair_block is not None:
            check = check.withColumn("__blk", F.expr(pair_block))
            key = ["__blk"]
        sizes_rel = check.distinct().groupBy(*key).count().agg(
            F.max("count").alias("__guard_n")
        )
        if defer:
            what = "block" if pair_block is not None else "series set"
            # the measured count rides INTO the error message as a concat
            # of the __guard_n column (r12 ADVICE: the deferred raise was
            # less actionable than the eager one, which interpolates n)
            guard_n = F.coalesce(F.col("__guard_n"), F.lit(0))
            msg = F.concat(
                F.lit(f"{op}: {what} of "),
                guard_n.cast("string"),
                F.lit(
                    f" series exceeds max_series={max_series}; the pair"
                    f" matrix is quadratic in this count. Supply"
                    f" pair_block= to restrict pairing to same-block"
                    f" series, or raise max_series explicitly if the"
                    f" quadratic is intended."
                ),
            )
            return (
                rel.crossJoin(F.broadcast(sizes_rel))
                .filter(
                    F.assert_true(
                        guard_n <= F.lit(max_series), msg
                    ).isNull()
                )
                .drop("__guard_n")
            )
        n = sizes_rel.collect()[0]["__guard_n"] or 0
        if n > max_series:
            what = "block" if pair_block is not None else "series set"
            raise RuntimeError(
                f"{op}: {what} of {n} series exceeds max_series={max_series};"
                f" the pair matrix is quadratic in this count"
                f" ({n * (n - 1) // 2} series pairs). Supply pair_block= to"
                f" restrict pairing to same-block series, or raise"
                f" max_series explicitly if the quadratic is intended."
            )
    return rel


def metric_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: 5-minute AVG series per metric through
    :func:`analytics.metrics.metric_series`."""
    m = synthesize_metrics(spark, sf_dir)
    out = MA.metric_series(m, [HIT, READ], bucket="5 minutes")
    return out.select(
        F.col("time_bucket").cast("long").alias("bucket_epoch_s"),
        "metric_name",
        "avg_value",
    ).orderBy("bucket_epoch_s", "metric_name")


ORACLE_metric_series = f"""
WITH m AS ({_SYN_SQL})
SELECT (epoch_us(time) // 300000000) * 300 AS bucket_epoch_s,
       metric_name,
       avg(metric_value) AS avg_value
FROM m
WHERE metric_name IN ('{HIT}', '{READ}')
GROUP BY 1, 2
ORDER BY bucket_epoch_s, metric_name
"""


def buffer_hit_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+A5: per-(minute, instance) hit/(hit+read) through
    :func:`analytics.metrics.buffer_hit_ratio`."""
    m = synthesize_metrics(spark, sf_dir)
    out = MA.buffer_hit_ratio(m)  # defaults: blocks_hit/blocks_read, 1 minute
    return out.select(
        F.col("time_bucket").cast("long").alias("bucket_epoch_s"),
        "instance_id",
        "blocks_hit",
        "blocks_read",
        "hit_ratio",
    ).orderBy("bucket_epoch_s", "instance_id")


ORACLE_buffer_hit_ratio = f"""
WITH m AS ({_SYN_SQL}),
agg AS (
    SELECT (epoch_us(time) // 60000000) * 60 AS bucket_epoch_s,
           instance_id,
           CAST(sum(CASE WHEN metric_name = '{HIT}' THEN metric_value END) AS BIGINT) AS blocks_hit,
           CAST(sum(CASE WHEN metric_name = '{READ}' THEN metric_value END) AS BIGINT) AS blocks_read
    FROM m
    WHERE metric_name IN ('{HIT}', '{READ}')
    GROUP BY 1, 2
)
SELECT bucket_epoch_s, instance_id, blocks_hit, blocks_read,
       CASE WHEN (coalesce(CAST(blocks_hit AS DOUBLE), 0.0)
                + coalesce(CAST(blocks_read AS DOUBLE), 0.0)) > 0
            THEN coalesce(CAST(blocks_hit AS DOUBLE), 0.0)
                 / (coalesce(CAST(blocks_hit AS DOUBLE), 0.0)
                  + coalesce(CAST(blocks_read AS DOUBLE), 0.0))
            ELSE 0.0 END AS hit_ratio
FROM agg
ORDER BY bucket_epoch_s, instance_id
"""


# ------------------------------------------------- time-weighted average --
def metric_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-weighted metric average per (instance, metric) over
    irregular samples — the avg_over_time semantics a monitoring store
    needs when scrape intervals drift (the reference's adaptive governor
    makes them drift BY DESIGN: SURVEY §2.9 T7/T8).

    Each sample's weight is the µs gap to the NEXT sample of the same
    series (lead window; the last sample carries no weight — standard
    left-closed step interpolation). All arithmetic exact int64:
    Σ(value_cents·Δt_us) stays < 2^63 for month-scale spans at cent scale,
    and the final average is an exact milli-cent ratio. One shuffle on
    the series key; no UDFs.
    """
    ev = load(spark, sf_dir, "events")
    samples = ev.select(
        (F.col("user_id") % 10).cast("string").alias("instance"),
        F.col("event_type").alias("metric_name"),
        F.unix_micros(F.col("ts")).alias("us"),
        cents("value").alias("v_cents"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("instance", "metric_name").orderBy("us", "v_cents")
    stepped = samples.withColumn("next_us", F.lead("us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    # weights in ms and a 10^3 ratio scale keep every product < 2^63 for
    # month-scale series at cent resolution (us weights * 10^6 overflow)
    return (
        stepped.groupBy("instance", "metric_name")
        .agg(
            F.sum(F.expr("v_cents * ((next_us - us) div 1000)")).alias("wv_sum"),
            F.sum(F.expr("(next_us - us) div 1000")).alias("w_sum"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .select(
            "instance",
            "metric_name",
            "wv_sum",
            "w_sum",
            "n_intervals",
            F.expr("(wv_sum * 1000L) div w_sum").alias("twa_millicents"),
        )
        .orderBy("instance", "metric_name")
    )


ORACLE_metric_time_weighted_avg = """
WITH samples AS (
    SELECT CAST(user_id % 10 AS VARCHAR) AS instance,
           event_type AS metric_name,
           epoch_us(ts) AS us,
           CAST(round(value * 100, 0) AS BIGINT) AS v_cents
    FROM events
), stepped AS (
    SELECT instance, metric_name, us, v_cents,
           lead(us) OVER (PARTITION BY instance, metric_name
                          ORDER BY us, v_cents) AS next_us
    FROM samples
)
SELECT instance, metric_name,
       CAST(sum(v_cents * ((next_us - us) // 1000)) AS BIGINT) AS wv_sum,
       CAST(sum((next_us - us) // 1000) AS BIGINT) AS w_sum,
       count(*) AS n_intervals,
       CAST(sum(v_cents * ((next_us - us) // 1000)) AS BIGINT) * 1000
           // CAST(sum((next_us - us) // 1000) AS BIGINT) AS twa_millicents
FROM stepped
WHERE next_us IS NOT NULL
GROUP BY instance, metric_name
ORDER BY instance, metric_name
"""


def metric_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carry-forward grid gap filling
    (:func:`analytics.metrics.gap_fill_minutes`) summarized per series.

    Instances fold to 20 buckets and the grid steps hourly so the filled
    relation stays |series| × span/step ≈ 10⁵ rows at any SF (span-bounded,
    not sample-bounded); the GATE row compares a per-series summary that
    still pins every filled value: grid count, filled count, and the exact
    int64 sum of the carried values.
    """
    metrics = synthesize_metrics(spark, sf_dir).withColumn(
        "instance_id",
        F.expr("cast(cast(instance_id as bigint) % 20 as string)"),
    )
    filled = MA.gap_fill_minutes(metrics, step_us=3_600_000_000)
    return (
        filled.groupBy("instance_id", "metric_name")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("is_filled").cast("long")).alias("n_filled"),
            F.sum("value").alias("sum_value_cents"),
            F.min("minute_us").alias("first_us"),
            F.max("minute_us").alias("last_us"),
        )
        .orderBy("instance_id", "metric_name")
    )


ORACLE_metric_gap_fill = f"""
WITH m0 AS ({_SYN_SQL}),
m AS (
    SELECT time, CAST(CAST(instance_id AS BIGINT) % 20 AS VARCHAR) AS instance_id,
           metric_name, metric_value
    FROM m0
), b AS (
    SELECT instance_id, metric_name,
           epoch_us(time) - epoch_us(time) % 3600000000 AS minute_us,
           metric_value,
           row_number() OVER (
               PARTITION BY instance_id, metric_name,
                            epoch_us(time) - epoch_us(time) % 3600000000
               ORDER BY epoch_us(time) DESC, metric_value DESC) AS rn
    FROM m
), per_min AS (
    SELECT instance_id, metric_name, minute_us, metric_value, TRUE AS present
    FROM b WHERE rn = 1
), bounds AS (
    SELECT instance_id, metric_name,
           min(minute_us) AS mn, max(minute_us) AS mx
    FROM per_min GROUP BY instance_id, metric_name
), grid AS (
    SELECT instance_id, metric_name,
           unnest(generate_series(mn, mx, 3600000000)) AS minute_us
    FROM bounds
), filled AS (
    SELECT g.instance_id, g.metric_name, g.minute_us,
           CASE WHEN p.present THEN p.metric_value
                ELSE last_value(p.metric_value IGNORE NULLS) OVER (
                    PARTITION BY g.instance_id, g.metric_name
                    ORDER BY g.minute_us) END AS value,
           p.present IS NULL AS is_filled
    FROM grid g LEFT JOIN per_min p
      ON g.instance_id = p.instance_id AND g.metric_name = p.metric_name
     AND g.minute_us = p.minute_us
)
SELECT instance_id, metric_name,
       count(*) AS n_points,
       CAST(sum(CASE WHEN is_filled THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(sum(value) AS BIGINT) AS sum_value_cents,
       CAST(min(minute_us) AS BIGINT) AS first_us,
       CAST(max(minute_us) AS BIGINT) AS last_us
FROM filled
GROUP BY instance_id, metric_name
ORDER BY instance_id, metric_name
"""


def metric_time_weighted_avg_presplit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hot-series-safe twin of :func:`metric_time_weighted_avg` — identical
    output, checked against the SAME oracle.

    The plain formulation runs one lead window per series, so a series
    holding 10⁸ samples sorts in one task (the round-6 soak's conclusion:
    window-bound, not shuffle-bound). This variant applies the
    sessionize_presplit pattern: samples bucket into 1-day periods, the
    lead runs per (series, period) — tasks bounded by samples per series
    per day — and the one cross-boundary weight per bucket (last sample →
    next non-empty bucket's first sample) comes from a lead over the
    per-bucket SUMMARY relation (one row per (series, day)). Struct
    min/max under (us, v_cents) ordering reproduces the plain version's
    tiebreak exactly.
    """
    from pyspark.sql import Window

    period_us = 86_400_000_000
    ev = load(spark, sf_dir, "events")
    samples = ev.select(
        (F.col("user_id") % 10).cast("string").alias("instance"),
        F.col("event_type").alias("metric_name"),
        F.unix_micros(F.col("ts")).alias("us"),
        cents("value").alias("v_cents"),
    ).withColumn("_p", F.floor(F.col("us") / F.lit(period_us)))

    wp = Window.partitionBy("instance", "metric_name", "_p").orderBy(
        "us", "v_cents"
    )
    local = samples.withColumn("next_us", F.lead("us").over(wp)).filter(
        F.col("next_us").isNotNull()
    )
    in_bucket = local.groupBy("instance", "metric_name").agg(
        F.sum(F.expr("v_cents * ((next_us - us) div 1000)")).alias("wv_sum"),
        F.sum(F.expr("(next_us - us) div 1000")).alias("w_sum"),
        F.count(F.lit(1)).alias("n_intervals"),
    )

    summary = samples.groupBy("instance", "metric_name", "_p").agg(
        F.min(F.struct("us", "v_cents")).alias("_first"),
        F.max(F.struct("us", "v_cents")).alias("_last"),
    )
    ws = Window.partitionBy("instance", "metric_name").orderBy("_p")
    boundary = (
        summary.withColumn("_next_first", F.lead("_first").over(ws))
        .filter(F.col("_next_first").isNotNull())
        .select(
            "instance",
            "metric_name",
            F.col("_last.v_cents").alias("v_cents"),
            F.col("_last.us").alias("us"),
            F.col("_next_first.us").alias("next_us"),
        )
        .groupBy("instance", "metric_name")
        .agg(
            F.sum(F.expr("v_cents * ((next_us - us) div 1000)")).alias("wv_sum"),
            F.sum(F.expr("(next_us - us) div 1000")).alias("w_sum"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )
    merged = (
        in_bucket.unionByName(boundary)
        .groupBy("instance", "metric_name")
        .agg(
            F.sum("wv_sum").alias("wv_sum"),
            F.sum("w_sum").alias("w_sum"),
            F.sum("n_intervals").alias("n_intervals"),
        )
    )
    return merged.select(
        "instance",
        "metric_name",
        "wv_sum",
        "w_sum",
        "n_intervals",
        F.expr("(wv_sum * 1000L) div w_sum").alias("twa_millicents"),
    ).orderBy("instance", "metric_name")


def metric_gap_fill_presplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale twin of :func:`metric_gap_fill` — identical summary, checked
    against the SAME oracle, but the carry-forward windows run per
    (series, 1-day period) via
    :func:`analytics.metrics.gap_fill_minutes_presplit` (24 hourly grid
    rows per partition here) with a per-series boundary stitch over the
    period SUMMARY only. The per-partition grid size is bounded by
    split/step regardless of series span — the escape hatch for the
    multi-year series the plain per-series window would sort in one task
    (SCALE.md round-7 soak).
    """
    metrics = synthesize_metrics(spark, sf_dir).withColumn(
        "instance_id",
        F.expr("cast(cast(instance_id as bigint) % 20 as string)"),
    )
    filled = MA.gap_fill_minutes_presplit(
        metrics, step_us=3_600_000_000, split_us=86_400_000_000
    )
    return (
        filled.groupBy("instance_id", "metric_name")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("is_filled").cast("long")).alias("n_filled"),
            F.sum("value").alias("sum_value_cents"),
            F.min("minute_us").alias("first_us"),
            F.max("minute_us").alias("last_us"),
        )
        .orderBy("instance_id", "metric_name")
    )


# --------------------------------------------------------- OHLC candles ---
_OHLC_BUCKET_S = 300


def metric_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26: OHLC candle downsampling (:func:`analytics.metrics.ohlc`) —
    open/high/low/close/volume per (metric, 5-min bucket), the
    first()/last() resample every metrics store offers. One exchange
    total: both tie-safe row_number windows and the final aggregate share
    the (metric, bucket) partitioning. Values are exact cents ints."""
    m = synthesize_metrics(spark, sf_dir)
    return MA.ohlc(m, bucket_s=_OHLC_BUCKET_S).orderBy(
        "metric_name", "bucket_epoch_s"
    )


ORACLE_metric_ohlc = f"""
WITH m AS ({_SYN_SQL}),
b AS (
    SELECT metric_name,
           (epoch_us(time) // {_OHLC_BUCKET_S * 1_000_000}) * {_OHLC_BUCKET_S}
               AS bucket_epoch_s,
           time, metric_value AS v
    FROM m
), r AS (
    SELECT *,
           row_number() OVER (PARTITION BY metric_name, bucket_epoch_s
                              ORDER BY time ASC, v ASC) AS rn_a,
           row_number() OVER (PARTITION BY metric_name, bucket_epoch_s
                              ORDER BY time DESC, v DESC) AS rn_d
    FROM b
)
SELECT metric_name, bucket_epoch_s,
       CAST(max(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open,
       CAST(max(v) AS BIGINT) AS high,
       CAST(min(v) AS BIGINT) AS low,
       CAST(max(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close,
       CAST(sum(v) AS BIGINT) AS volume,
       count(*) AS n_samples
FROM r
GROUP BY metric_name, bucket_epoch_s
ORDER BY metric_name, bucket_epoch_s
"""


# ------------------------------------------------- A36: OLS trend slope --
def metric_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A36: exact least-squares trend slope per metric series — the
    capacity-planning regression behind "is this counter drifting up"
    alerts, computed as ONE aggregation over exact int64 moments.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x = the sample's
    MINUTE index since the series' own first sample and y = metric cents,
    both min-centered so every moment stays inside int64.  Minute
    granularity is the semantic: capacity trends live above sub-minute
    jitter, and it buys the overflow headroom (raw epoch² ~ 3·10¹⁸ per
    row overflows immediately; centered SECONDS still overflowed n·Σx² at
    a 16k-minute span × 20k rows — caught live by the sf0.1 oracle run;
    centered minutes bound n·Σx² by n·span_min², exact to ~3·10¹²
    row-minutes² — months of data at 10⁶ rows/series).  Centering shifts
    the intercept, never the slope; the numerator/denominator ints hash
    bit-exact cross-engine and the ONLY float is the final division
    (cents/hour = 60·num/den), one deterministic IEEE op per OUTPUT row
    (SCALE.md r8 transcendental rule).  The min() window shares the
    aggregate's partitioning — one corpus shuffle total.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 60000000").alias("xs"),
        F.col("metric_value").alias("y"),
    )
    w = Window.partitionBy("metric_name")
    c = m.select(
        "metric_name",
        (F.col("xs") - F.min("xs").over(w)).alias("x"),
        (F.col("y") - F.min("y").over(w)).alias("yc"),
    )
    agg = c.groupBy("metric_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "metric_name",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den != 0, num.cast("double") * 60.0 / den.cast("double")).alias(
            "slope_cents_per_hour"
        ),
    ).orderBy("metric_name")


ORACLE_metric_trend_slope = f"""
WITH m AS ({_SYN_SQL}),
c AS (
    SELECT metric_name,
           epoch_us(time) // 60000000
               - min(epoch_us(time) // 60000000) OVER (PARTITION BY metric_name)
               AS x,
           metric_value
               - min(metric_value) OVER (PARTITION BY metric_name) AS yc
    FROM m
), a AS (
    SELECT metric_name, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
           CAST(sum(x * yc) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM c GROUP BY metric_name
)
SELECT metric_name, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CASE WHEN n * sxx - sx * sx <> 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE) * 60.0
                 / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope_cents_per_hour
FROM a
ORDER BY metric_name
"""


# ------------------------------------------ A37: metric correlation --
def metric_corr_matrix(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_series: int | None = 64,
    pair_block: str | None = None,
    defer_guard: bool = False,
) -> DataFrame:
    """A37: Pearson correlation between every metric-series pair after
    minute-bucket alignment — the redundancy/co-movement screen behind
    "these two dashboards show the same signal" and feature-selection
    pruning before model training.

    The series-pair axis is S²/2 — guarded by
    :func:`_guard_series_pairs` (``max_series`` raising pre-flight +
    same-block-only ``pair_block`` pairing), mirroring the dedup family's
    ``max_bucket``/``max_eval``.

    Series align by an exact minute rollup (sum of cents per bucket),
    pairs come from a self-join on the bucket key (metric_a < metric_b),
    and all five moment sums (n, Σa, Σb, Σab, Σa², Σb²) are EXACT int64
    over min-centered, DOLLAR-QUANTIZED values: the statistic is defined
    on yq = (y − min y) div 100 — quantization is part of the operator's
    semantics, not an approximation knob, because it is what bounds the
    moments (n·Σy² at cent precision sat within 8x of int64 at sf0.1;
    at dollar precision the bound n·span_$² is ~10⁴x slacker — months of
    minutes at 10⁵-dollar spans).  Centering is shift-invariant for
    covariance/correlation.  The only floats: numerator cast, one
    multiply, one sqrt, one divide per OUTPUT pair row — deterministic
    IEEE ops from exact ints, so even corr hashes bit-identical
    cross-engine.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 60000000").alias("bucket"),
        F.col("metric_value").alias("v"),
    )
    per_bucket = m.groupBy("metric_name", "bucket").agg(
        F.sum("v").alias("y")
    )
    w = Window.partitionBy("metric_name")
    c = per_bucket.select(
        "metric_name", "bucket", (F.col("y") - F.min("y").over(w)).alias("yc0")
    ).select("metric_name", "bucket", F.expr("yc0 div 100").alias("yc"))
    c = _guard_series_pairs(
        c, "metric_name", max_series, pair_block, "metric_corr_matrix",
        count_rel=m,
        defer=defer_guard,
    )
    cond = (F.col("a.bucket") == F.col("b.bucket")) & (
        F.col("a.metric_name") < F.col("b.metric_name")
    )
    if pair_block is not None:
        cond = cond & (F.col("a.__blk") == F.col("b.__blk"))
    pairs = (
        c.alias("a")
        .join(c.alias("b"), cond)
        .select(
            F.col("a.metric_name").alias("metric_a"),
            F.col("b.metric_name").alias("metric_b"),
            F.col("a.yc").alias("ya"),
            F.col("b.yc").alias("yb"),
        )
    )
    agg = pairs.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ya").alias("sa"),
        F.sum("yb").alias("sb"),
        F.sum(F.col("ya") * F.col("yb")).alias("sab"),
        F.sum(F.col("ya") * F.col("ya")).alias("saa"),
        F.sum(F.col("yb") * F.col("yb")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    dx = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    dy = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    return agg.select(
        "metric_a",
        "metric_b",
        "n",
        num.alias("corr_num"),
        dx.alias("var_a_num"),
        dy.alias("var_b_num"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double")
            / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("corr"),
    ).orderBy("metric_a", "metric_b")


ORACLE_metric_corr_matrix = f"""
WITH m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 60000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), c AS (
    SELECT metric_name, bucket,
           (y - min(y) OVER (PARTITION BY metric_name)) // 100 AS yc
    FROM pb
), pairs AS (
    SELECT a.metric_name AS metric_a, b.metric_name AS metric_b,
           a.yc AS ya, b.yc AS yb
    FROM c a JOIN c b
      ON a.bucket = b.bucket AND a.metric_name < b.metric_name
), agg AS (
    SELECT metric_a, metric_b, count(*) AS n,
           CAST(sum(ya) AS BIGINT) AS sa, CAST(sum(yb) AS BIGINT) AS sb,
           CAST(sum(ya * yb) AS BIGINT) AS sab,
           CAST(sum(ya * ya) AS BIGINT) AS saa,
           CAST(sum(yb * yb) AS BIGINT) AS sbb
    FROM pairs GROUP BY 1, 2
)
SELECT metric_a, metric_b, n,
       CAST(n * sab - sa * sb AS BIGINT) AS corr_num,
       CAST(n * saa - sa * sa AS BIGINT) AS var_a_num,
       CAST(n * sbb - sb * sb AS BIGINT) AS var_b_num,
       CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
            THEN CAST(n * sab - sa * sb AS DOUBLE)
                 / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * sbb - sb * sb AS DOUBLE))
       END AS corr
FROM agg
ORDER BY metric_a, metric_b
"""


# ----------------------------------------- A39: exact rolling median --
_ROLL_MED_K = 7  # trailing window width in buckets (ROWS frame)


def metric_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A39: exact trailing-window median per metric series — the robust
    smoother dashboards use where a moving average would chase spikes
    (median-of-7 kills any ≤3-bucket burst without lag tuning).

    Series = per-(metric, 5-min bucket) exact-cents sums; the smoother is
    the LOWER median of the last ``_ROLL_MED_K`` buckets, kept exact-int
    so it hashes bit-exact cross-engine (an interpolated even-count
    median would be a float).  Plan: the corpus pays ONLY the bucket
    aggregate's partially-combined exchange; the ROWS-frame
    ``collect_list`` window then re-keys the REDUCED bucket relation by
    metric (deliberately NOT pre-partitioning the raw rows by metric to
    share an exchange — that would shuffle the full corpus un-combined
    onto |metrics| skewed partitions).  The per-row sort is O(k log k)
    on a k≤7 array, a codegen expression, not a UDF.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir)
    b = m.groupBy(
        "metric_name",
        (F.expr(f"unix_micros(time) div {_OHLC_BUCKET_S * 1_000_000}")
         * _OHLC_BUCKET_S).alias("bucket_epoch_s"),
    ).agg(F.sum("metric_value").alias("v_cents"))
    w = (
        Window.partitionBy("metric_name")
        .orderBy("bucket_epoch_s")
        .rowsBetween(-(_ROLL_MED_K - 1), Window.currentRow)
    )
    roll = F.sort_array(F.collect_list("v_cents").over(w))
    return b.select(
        "metric_name",
        "bucket_epoch_s",
        "v_cents",
        F.element_at(roll, ((F.size(roll) + 1) / 2).cast("int")).alias(
            "med_cents"
        ),
    ).orderBy("metric_name", "bucket_epoch_s")


ORACLE_metric_rolling_median = f"""
WITH m AS ({_SYN_SQL}),
b AS (
    SELECT metric_name,
           (epoch_us(time) // {_OHLC_BUCKET_S * 1_000_000}) * {_OHLC_BUCKET_S}
               AS bucket_epoch_s,
           CAST(sum(metric_value) AS BIGINT) AS v_cents
    FROM m GROUP BY 1, 2
)
SELECT metric_name, bucket_epoch_s, v_cents,
       list_sort(list(v_cents) OVER w)[
           (count(*) OVER w + 1) // 2] AS med_cents
FROM b
WINDOW w AS (PARTITION BY metric_name ORDER BY bucket_epoch_s
             ROWS BETWEEN {_ROLL_MED_K - 1} PRECEDING AND CURRENT ROW)
ORDER BY metric_name, bucket_epoch_s
"""


# ------------------------------------------------ A43: CUSUM drift --
def metric_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A43: exact two-sided CUSUM drift statistic per metric series —
    the classic "small persistent shift" detector the z-score/MAD
    anomaly family misses (each deviation is sub-threshold; only the
    SUM drifts).

    The textbook recursion S_i = max(0, S_{i-1} + (x_i − μ)) is a
    non-associative fold — useless as a distributed window.  It is
    re-expressed closed-form: with P_i = Σ_{t≤i}(x_t·n − S) (deviations
    from the mean scaled by n to stay integer), S_i = P_i − min(0,
    min_{j≤i} P_j) — a prefix sum plus a running min, all plain windows
    sharing ONE metric-keyed exchange over the REDUCED bucket relation
    (the corpus itself pays only the partially-combined bucket
    aggregate).  The downward side mirrors with max.
    Everything is exact int64: x·n ≤ bucket_cents·n_buckets and P sums
    n_buckets of those — bounded by n²·max_bucket_cents (~10¹² here;
    re-quantize the bucket to coarser cents at larger spans, the A36
    centering rationale).  Emitted cusum values are the n-scaled exact
    statistics; alerting thresholds scale by the same n.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir)
    b = m.groupBy(
        "metric_name",
        (F.expr(f"unix_micros(time) div {_OHLC_BUCKET_S * 1_000_000}")
         * _OHLC_BUCKET_S).alias("bucket_epoch_s"),
    ).agg(F.sum("metric_value").alias("v_cents"))
    wser = Window.partitionBy("metric_name")
    d = b.select(
        "metric_name",
        "bucket_epoch_s",
        "v_cents",
        (
            F.col("v_cents") * F.count(F.lit(1)).over(wser)
            - F.sum("v_cents").over(wser)
        ).alias("dev_n"),
    )
    wcum = (
        Window.partitionBy("metric_name")
        .orderBy("bucket_epoch_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pfx = d.select(
        "metric_name",
        "bucket_epoch_s",
        "v_cents",
        F.sum("dev_n").over(wcum).alias("pfx"),
    )
    p = pfx.select(
        "metric_name",
        "bucket_epoch_s",
        "v_cents",
        "pfx",
        F.min("pfx").over(wcum).alias("pmin"),
        F.max("pfx").over(wcum).alias("pmax"),
    )
    return p.select(
        "metric_name",
        "bucket_epoch_s",
        "v_cents",
        (F.col("pfx") - F.least(F.lit(0).cast("long"), F.col("pmin"))).alias(
            "cusum_pos"
        ),
        (F.greatest(F.lit(0).cast("long"), F.col("pmax")) - F.col("pfx")).alias(
            "cusum_neg"
        ),
    ).orderBy("metric_name", "bucket_epoch_s")


ORACLE_metric_cusum = f"""
WITH m AS ({_SYN_SQL}),
b AS (
    SELECT metric_name,
           (epoch_us(time) // {_OHLC_BUCKET_S * 1_000_000}) * {_OHLC_BUCKET_S}
               AS bucket_epoch_s,
           CAST(sum(metric_value) AS BIGINT) AS v_cents
    FROM m GROUP BY 1, 2
), d AS (
    SELECT metric_name, bucket_epoch_s, v_cents,
           v_cents * count(*) OVER (PARTITION BY metric_name)
               - CAST(sum(v_cents) OVER (PARTITION BY metric_name) AS BIGINT)
               AS dev_n
    FROM b
), pf AS (
    SELECT metric_name, bucket_epoch_s, v_cents,
           CAST(sum(dev_n) OVER w AS BIGINT) AS pfx
    FROM d
    WINDOW w AS (PARTITION BY metric_name ORDER BY bucket_epoch_s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), p AS (
    SELECT metric_name, bucket_epoch_s, v_cents, pfx,
           min(pfx) OVER w AS pmin,
           max(pfx) OVER w AS pmax
    FROM pf
    WINDOW w AS (PARTITION BY metric_name ORDER BY bucket_epoch_s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT metric_name, bucket_epoch_s, v_cents,
       pfx - least(CAST(0 AS BIGINT), pmin) AS cusum_pos,
       greatest(CAST(0 AS BIGINT), pmax) - pfx AS cusum_neg
FROM p
ORDER BY metric_name, bucket_epoch_s
"""


# ------------------------------------- A45: LTTB-style plot downsample --
def metric_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A45: visually-faithful series downsampling — per (metric, 5-min
    bucket) keep the ONE raw sample that subtends the largest triangle
    against the neighboring buckets' mean points (the bucket-mean
    variant of Steinarsson's Largest-Triangle-Three-Buckets; classic
    LTTB anchors on the PREVIOUS CHOSEN point, a sequential dependency
    no distributed window can express — the mean-anchor variant is the
    standard parallelization and what MinMaxLTTB approximates).

    Everything exact-int: with prev/next bucket aggregates (n, Σx, Σy)
    and candidate (x, y), the triangle area is proportional to
    |(Σx₁·n₃ − Σx₃·n₁)(y·n₁ − Σy₁) − (Σx₁ − x·n₁)(Σy₃·n₁ − Σy₁·n₃)|
    (both mean denominators multiplied through) — so the per-bucket
    argmax is a deterministic integer comparison, tie-broken by (ts, y).
    x is MINUTES since the series' first sample (the A36 centering: raw
    epoch-µs blows the products past 2⁶³).  Edge buckets (no prev/next)
    keep their earliest sample — the first/last-point rule of LTTB.

    Plan: bucket aggregates map-side combine; prev/next attach by lag/
    lead over the tiny bucket relation; candidates join their bucket's
    anchor row (one shuffle on the bucket key); argmax is a row_number
    over the same key.  Output: one row per bucket — the 100 TB dashboard
    path (downsample happens engine-side, the plot gets |buckets| points).
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir)
    wser = Window.partitionBy("metric_name")
    pts = m.select(
        "metric_name",
        (F.expr("unix_micros(time) div 300000000") * 300).alias(
            "bucket_epoch_s"
        ),
        F.expr("unix_micros(time) div 60000000").alias("xm_raw"),
        F.unix_micros("time").alias("ts_us"),
        F.col("metric_value").alias("y"),
    ).withColumn("x", F.col("xm_raw") - F.min("xm_raw").over(wser)).drop(
        "xm_raw"
    )
    b = pts.groupBy("metric_name", "bucket_epoch_s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    wb = Window.partitionBy("metric_name").orderBy("bucket_epoch_s")
    anchors = b.select(
        "metric_name",
        "bucket_epoch_s",
        F.lag("n").over(wb).alias("n1"),
        F.lag("sx").over(wb).alias("sx1"),
        F.lag("sy").over(wb).alias("sy1"),
        F.lead("n").over(wb).alias("n3"),
        F.lead("sx").over(wb).alias("sx3"),
        F.lead("sy").over(wb).alias("sy3"),
    )
    cand = pts.join(anchors, ["metric_name", "bucket_epoch_s"])
    score = F.abs(
        (F.col("sx1") * F.col("n3") - F.col("sx3") * F.col("n1"))
        * (F.col("y") * F.col("n1") - F.col("sy1"))
        - (F.col("sx1") - F.col("x") * F.col("n1"))
        * (F.col("sy3") * F.col("n1") - F.col("sy1") * F.col("n3"))
    )
    edge = F.col("n1").isNull() | F.col("n3").isNull()
    ranked = cand.withColumn(
        "_score", F.when(edge, F.lit(None).cast("long")).otherwise(score)
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("metric_name", "bucket_epoch_s").orderBy(
                F.when(edge, F.col("ts_us")).asc_nulls_last(),
                F.desc_nulls_last("_score"),
                F.asc("ts_us"),
                F.asc("y"),
            )
        ),
    )
    return (
        ranked.filter(F.col("_rn") == 1)
        .select(
            "metric_name",
            "bucket_epoch_s",
            F.col("ts_us").alias("kept_ts_us"),
            F.col("y").alias("kept_cents"),
        )
        .orderBy("metric_name", "bucket_epoch_s")
    )


ORACLE_metric_lttb = f"""
WITH m AS ({_SYN_SQL}),
pts AS (
    SELECT metric_name,
           (epoch_us(time) // 300000000) * 300 AS bucket_epoch_s,
           epoch_us(time) // 60000000
               - min(epoch_us(time) // 60000000)
                     OVER (PARTITION BY metric_name) AS x,
           epoch_us(time) AS ts_us,
           metric_value AS y
    FROM m
), b AS (
    SELECT metric_name, bucket_epoch_s,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy
    FROM pts GROUP BY 1, 2
), anchors AS (
    SELECT metric_name, bucket_epoch_s,
           lag(n) OVER w AS n1, lag(sx) OVER w AS sx1, lag(sy) OVER w AS sy1,
           lead(n) OVER w AS n3, lead(sx) OVER w AS sx3, lead(sy) OVER w AS sy3
    FROM b
    WINDOW w AS (PARTITION BY metric_name ORDER BY bucket_epoch_s)
), cand AS (
    SELECT p.metric_name, p.bucket_epoch_s, p.ts_us, p.y,
           (a.n1 IS NULL OR a.n3 IS NULL) AS edge,
           CASE WHEN a.n1 IS NULL OR a.n3 IS NULL THEN NULL
                ELSE abs((a.sx1 * a.n3 - a.sx3 * a.n1) * (p.y * a.n1 - a.sy1)
                       - (a.sx1 - p.x * a.n1) * (a.sy3 * a.n1 - a.sy1 * a.n3))
           END AS score
    FROM pts p JOIN anchors a
      ON p.metric_name = a.metric_name
     AND p.bucket_epoch_s = a.bucket_epoch_s
), ranked AS (
    SELECT metric_name, bucket_epoch_s, ts_us, y,
           row_number() OVER (
               PARTITION BY metric_name, bucket_epoch_s
               ORDER BY CASE WHEN edge THEN ts_us END ASC NULLS LAST,
                        score DESC NULLS LAST,
                        ts_us ASC, y ASC) AS rn
    FROM cand
)
SELECT metric_name, bucket_epoch_s,
       ts_us AS kept_ts_us, y AS kept_cents
FROM ranked WHERE rn = 1
ORDER BY metric_name, bucket_epoch_s
"""


# --------------------------------------------- A48: autocorrelation (ACF)
#: max ACF lag (minute buckets)
_ACF_MAX_LAG = 5


def metric_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A48: per-series autocorrelation at lags 1..5 over the minute
    grid — Pearson-at-lag on BUCKET INDEX pairs (bucket_b = bucket_a +
    lag), so series gaps pair nothing instead of silently pairing
    non-adjacent samples the way a positional lag() window would; the
    seasonality/memory screen beside the A33 seasonal baseline.

    Same exact-int idiom as A37 (min-centered dollar-quantized values,
    five int64 moment sums, one float sqrt per OUTPUT row): one
    metric-keyed equi-join with a bounded lag band (fan-out <= max_lag
    per row, never a cross product), one two-key aggregate.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 60000000").alias("bucket"),
        F.col("metric_value").alias("v"),
    )
    per_bucket = m.groupBy("metric_name", "bucket").agg(F.sum("v").alias("y"))
    w = Window.partitionBy("metric_name")
    c = per_bucket.select(
        "metric_name", "bucket", (F.col("y") - F.min("y").over(w)).alias("yc0")
    ).select("metric_name", "bucket", F.expr("yc0 div 100").alias("yc"))
    return acf_over_grid(c, _ACF_MAX_LAG).orderBy("metric_name", "lag")


def acf_over_grid(c: DataFrame, max_lag: int) -> DataFrame:
    """ACF core over a centered (metric_name, bucket, yc) grid relation:
    lag-expanded equi-join + exact-int moment fold (shared by the gate
    plan and the unit tests, so both drive the same code path).

    The lag rides INSIDE the equi-join key: each left row explodes to
    max_lag (lag, bucket+lag) probes joined on (metric, bucket) — exact
    fan-out max_lag, hash-partitioned on both keys.  The tempting
    band-predicate self-join (b.bucket BETWEEN a.bucket+1 AND +L) only
    equi-joins on metric_name, which degenerates to B² per-series
    comparisons — measured 53 s vs 3 s at sf0.1 for identical output."""
    a = c.select(
        "metric_name",
        F.col("yc").alias("ya"),
        F.explode(F.expr(f"sequence(1, {max_lag})")).alias("lag"),
        F.col("bucket"),
    ).select(
        "metric_name", "ya", "lag", (F.col("bucket") + F.col("lag")).alias("bucket")
    )
    pairs = a.join(
        c.select("metric_name", "bucket", F.col("yc").alias("yb")),
        ["metric_name", "bucket"],
    ).select("metric_name", "lag", "ya", "yb")
    agg = pairs.groupBy("metric_name", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ya").alias("sa"),
        F.sum("yb").alias("sb"),
        F.sum(F.col("ya") * F.col("yb")).alias("sab"),
        F.sum(F.col("ya") * F.col("ya")).alias("saa"),
        F.sum(F.col("yb") * F.col("yb")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    dx = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    dy = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    return agg.select(
        "metric_name",
        "lag",
        "n",
        num.alias("acf_num"),
        dx.alias("var_a_num"),
        dy.alias("var_b_num"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("acf"),
    )


ORACLE_metric_acf = f"""
WITH m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 60000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), c AS (
    SELECT metric_name, bucket,
           (y - min(y) OVER (PARTITION BY metric_name)) // 100 AS yc
    FROM pb
), pairs AS (
    SELECT a.metric_name, b.bucket - a.bucket AS lag,
           a.yc AS ya, b.yc AS yb
    FROM c a JOIN c b
      ON a.metric_name = b.metric_name
     AND b.bucket > a.bucket AND b.bucket <= a.bucket + {_ACF_MAX_LAG}
), agg AS (
    SELECT metric_name, lag, count(*) AS n,
           CAST(sum(ya) AS BIGINT) AS sa, CAST(sum(yb) AS BIGINT) AS sb,
           CAST(sum(ya * yb) AS BIGINT) AS sab,
           CAST(sum(ya * ya) AS BIGINT) AS saa,
           CAST(sum(yb * yb) AS BIGINT) AS sbb
    FROM pairs GROUP BY 1, 2
)
SELECT metric_name, lag, n,
       CAST(n * sab - sa * sb AS BIGINT) AS acf_num,
       CAST(n * saa - sa * sa AS BIGINT) AS var_a_num,
       CAST(n * sbb - sb * sb AS BIGINT) AS var_b_num,
       CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
            THEN CAST(n * sab - sa * sb AS DOUBLE)
                 / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * sbb - sb * sb AS DOUBLE))
            END AS acf
FROM agg
ORDER BY metric_name, lag
"""


# ------------------------------------------ W3 gated: EWMA series fold
def metric_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3, GATED: the governor's dual-EWMA recursion (`governor.go`
    parity: ema += α·(x − ema), α = 0.3 fast / 0.05 slow) folded over
    each metric's minute series in bucket order — previously unit-only
    (golden vectors); this row proves the float recursion cross-engine
    bit-exactly, because both sides fold the SAME expression in the
    SAME order (Spark `aggregate` over the sorted series array, DuckDB
    `list_reduce` over `list(y ORDER BY bucket)` — both left folds
    seeded with the first element).

    The series rides one (metric → sorted array) aggregate; array
    length is bounded by the series' bucket count (a retention window
    at 100 TB — the streaming governor holds the same state as one
    scalar per key, which is why THIS shape is the batch replay, not
    the live path).
    """
    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 60000000").alias("bucket"),
        F.col("metric_value").alias("v"),
    )
    per_bucket = m.groupBy("metric_name", "bucket").agg(F.sum("v").alias("y"))
    arr = per_bucket.groupBy("metric_name").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(bucket, y))),"
            " s -> cast(s.y as double))"
        ).alias("ys")
    )
    def fold(alpha: str) -> str:
        return (
            f"aggregate(slice(ys, 2, greatest(size(ys) - 1, 0)),"
            f" element_at(ys, 1), (acc, x) -> acc + {alpha} * (x - acc))"
        )

    return arr.select(
        "metric_name",
        F.size("ys").alias("n_buckets"),
        F.expr(fold("0.3")).alias("ewma_fast"),
        F.expr(fold("0.05")).alias("ewma_slow"),
    ).orderBy("metric_name")


ORACLE_metric_ewma = f"""
WITH m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 60000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), arr AS (
    SELECT metric_name,
           list(CAST(y AS DOUBLE) ORDER BY bucket) AS ys
    FROM pb GROUP BY 1
)
SELECT metric_name,
       CAST(len(ys) AS INT) AS n_buckets,
       list_reduce(ys, (a, b) -> a + 0.3 * (b - a)) AS ewma_fast,
       list_reduce(ys, (a, b) -> a + 0.05 * (b - a)) AS ewma_slow
FROM arr
ORDER BY metric_name
"""


# ---------------------------------------------- A51: Theil-Sen robust slope
def metric_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A51: Theil-Sen robust trend per series — the MEDIAN of all
    pairwise slopes over the hour-bucket grid, the estimator that
    shrugs off the outlier spikes that drag A36's least-squares slope
    (up to ~29% contamination tolerance).  The robust twin every
    capacity-planning alert wants next to `metric_trend_slope`.

    Hour granularity is the semantic AND the scale bound: pairs are
    O(H²) per series where H = the retention window in hours (267 h at
    sf0.1 → 36k pairs; a 30-day window at 100 TB → 260k pairs/series —
    bounded by the window, NOT the corpus).  The whole pair set is
    built INSIDE the per-series row by higher-order functions on the
    sorted (x, y) arrays — pure codegen, no self-join, no extra
    exchange beyond the grid aggregate.  Each slope is ONE double
    division of exact int64 deltas (deterministic IEEE); the median is
    the lower order statistic at rank ceil(p/2) of the sorted slope
    array, so both engines pick the identical element.
    """
    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    arr = grid.groupBy("metric_name").agg(
        F.expr("sort_array(collect_list(struct(x, y)))").alias("pts")
    ).filter(F.size("pts") >= 2)
    slopes = (
        "flatten(transform(sequence(0, size(pts) - 2), i ->"
        " transform(sequence(i + 1, size(pts) - 1), j ->"
        "   cast(element_at(pts, j + 1).y - element_at(pts, i + 1).y as double)"
        "   / cast(element_at(pts, j + 1).x - element_at(pts, i + 1).x as double)"
        " )))"
    )
    return (
        arr.select(
            "metric_name",
            F.size("pts").alias("n_buckets"),
            F.expr(f"sort_array({slopes})").alias("sl"),
        )
        .select(
            "metric_name",
            "n_buckets",
            F.size("sl").alias("n_pairs"),
            F.expr(
                "element_at(sl, cast(ceil(size(sl) / 2.0) as int))"
            ).alias("median_slope_cents_per_hour"),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_theil_sen = f"""
WITH m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), g AS (
    SELECT metric_name, x, y,
           count(*) OVER (PARTITION BY metric_name) AS nb
    FROM pb
), pairs AS (
    SELECT a.metric_name, a.nb,
           CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
    FROM g a JOIN g b ON a.metric_name = b.metric_name AND b.x > a.x
), ranked AS (
    SELECT metric_name, nb, slope,
           row_number() OVER (PARTITION BY metric_name ORDER BY slope) AS rk,
           count(*) OVER (PARTITION BY metric_name) AS np
    FROM pairs
)
SELECT metric_name,
       CAST(nb AS INT) AS n_buckets,
       CAST(np AS INT) AS n_pairs,
       slope AS median_slope_cents_per_hour
FROM ranked
WHERE rk = CAST(ceil(np / 2.0) AS BIGINT)
ORDER BY metric_name
"""


# ------------------------------------- A52: two-segment change-point split
def metric_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A52: single change-point detection per series — the hour-grid
    split maximizing the between-segment variance gain
    gain(s) = (S₁·n₂ − S₂·n₁)² / (n₁·n₂·n), the closed form of the
    one-split SSE minimization (binary segmentation's first step, the
    "when did this metric change regime" primitive behind deploy-impact
    and incident-onset screens).

    All moments are exact int64 prefix sums riding ONE ordered window
    over the already-reduced hour grid (≤ H rows/series — the
    aggregate-then-window rule from A39); the gain's numerator is
    composed from products ≤ 3·10¹² which are EXACTLY representable as
    doubles (< 2⁵³), so the cross-engine argmax compares identical IEEE
    values; ties break to the earliest split.  The output keeps the
    integer segment moments so the gain is recomputable/auditable.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    wser = Window.partitionBy("metric_name")
    word = wser.orderBy("x")
    c = grid.select(
        "metric_name",
        "x",
        F.row_number().over(word).alias("s"),
        F.sum("y").over(word.rowsBetween(Window.unboundedPreceding, 0)).alias("s1"),
        F.sum("y").over(wser).alias("tot"),
        F.count(F.lit(1)).over(wser).alias("n"),
    ).filter(F.col("s") < F.col("n"))
    d = (
        F.col("s1").cast("double") * (F.col("n") - F.col("s"))
        - (F.col("tot") - F.col("s1")).cast("double") * F.col("s")
    )
    gain = d * d / (F.col("s") * (F.col("n") - F.col("s")) * F.col("n")).cast(
        "double"
    )
    scored = c.select(
        "metric_name",
        "x",
        "s",
        "n",
        "s1",
        (F.col("tot") - F.col("s1")).alias("s2"),
        gain.alias("gain"),
    )
    wbest = Window.partitionBy("metric_name").orderBy(
        F.desc("gain"), F.asc("s")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "metric_name",
            F.col("n").cast("int").alias("n_buckets"),
            F.col("s").cast("int").alias("split_idx"),
            F.col("x").alias("last_hour_of_seg1"),
            "s1",
            "s2",
            "gain",
        )
        .orderBy("metric_name")
    )


ORACLE_metric_changepoint = f"""
WITH m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), c AS (
    SELECT metric_name, x,
           row_number() OVER w AS s,
           CAST(sum(y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS s1,
           CAST(sum(y) OVER (PARTITION BY metric_name) AS BIGINT) AS tot,
           count(*) OVER (PARTITION BY metric_name) AS n
    FROM pb
    WINDOW w AS (PARTITION BY metric_name ORDER BY x)
), scored AS (
    SELECT metric_name, x, s, n, s1, tot - s1 AS s2,
           (CAST(s1 AS DOUBLE) * (n - s) - CAST(tot - s1 AS DOUBLE) * s)
           * (CAST(s1 AS DOUBLE) * (n - s) - CAST(tot - s1 AS DOUBLE) * s)
           / CAST(s * (n - s) * n AS DOUBLE) AS gain
    FROM c WHERE s < n
)
SELECT metric_name,
       CAST(n AS INT) AS n_buckets,
       CAST(s AS INT) AS split_idx,
       x AS last_hour_of_seg1,
       s1, s2, gain
FROM (
    SELECT *, row_number() OVER (PARTITION BY metric_name
                                 ORDER BY gain DESC, s ASC) AS rk
    FROM scored
) WHERE rk = 1
ORDER BY metric_name
"""


# ---------------------------------------------- A53: Holt linear smoothing
#: Holt level/trend gains — semantics constants shared by both engines
HOLT_ALPHA = 0.3
HOLT_BETA = 0.1


def metric_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A53: Holt double-exponential (level+trend) smoothing per series —
    the one-step-ahead forecaster that follows a drifting mean where
    W3's flat EWMA lags, the standard next rung on the smoothing ladder
    (level l ← α·x + (1−α)(l+b); trend b ← β(l'−l) + (1−β)b; init
    l₁ = y₁, b₁ = y₂ − y₁; recursion applied for t ≥ 3).

    Gates the COUPLED two-state float recursion cross-engine, extending
    the `metric_ewma` proof (single-state fold): Spark folds a
    named_struct accumulator over the sorted hour series; DuckDB walks
    the identical recurrence in a recursive CTE — both compute the SAME
    expression tree in the SAME order, so the doubles match bit-exactly.
    The hour grid bounds the recursion depth (and the array length) by
    the retention window; the live path holds the same two doubles per
    key in governor-style state.
    """
    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    arr = grid.groupBy("metric_name").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(x, y))),"
            " s -> cast(s.y as double))"
        ).alias("ys")
    ).filter(F.size("ys") >= 2)
    a, b = HOLT_ALPHA, HOLT_BETA
    fold = (
        f"aggregate(slice(ys, 3, greatest(size(ys) - 2, 0)),"
        f" named_struct('l', element_at(ys, 1),"
        f"              'b', element_at(ys, 2) - element_at(ys, 1)),"
        f" (acc, x) -> named_struct("
        f"   'l', {a} * x + {1 - a:.1f} * (acc.l + acc.b),"
        f"   'b', {b} * (({a} * x + {1 - a:.1f} * (acc.l + acc.b)) - acc.l)"
        f"        + {1 - b:.1f} * acc.b))"
    )
    return (
        arr.select(
            "metric_name",
            F.size("ys").alias("n_buckets"),
            F.expr(fold).alias("st"),
        )
        .select(
            "metric_name",
            "n_buckets",
            F.col("st.l").alias("level"),
            F.col("st.b").alias("trend"),
            (F.col("st.l") + F.col("st.b")).alias("forecast_next"),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_holt = f"""
WITH RECURSIVE m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), arr AS (
    SELECT metric_name, list(CAST(y AS DOUBLE) ORDER BY x) AS ys
    FROM pb GROUP BY 1
), h AS (
    SELECT metric_name, ys, 2 AS i,
           ys[1] AS l, ys[2] - ys[1] AS b
    FROM arr WHERE len(ys) >= 2
    UNION ALL
    SELECT metric_name, ys, i + 1,
           {HOLT_ALPHA} * ys[i + 1] + {1 - HOLT_ALPHA:.1f} * (l + b),
           {HOLT_BETA} * (({HOLT_ALPHA} * ys[i + 1]
                           + {1 - HOLT_ALPHA:.1f} * (l + b)) - l)
               + {1 - HOLT_BETA:.1f} * b
    FROM h WHERE i < len(ys)
)
SELECT metric_name,
       CAST(len(ys) AS INT) AS n_buckets,
       l AS level, b AS trend, l + b AS forecast_next
FROM h WHERE i = len(ys)
ORDER BY metric_name
"""


# ------------------------------------- A55: Wald-Wolfowitz runs test ------
def metric_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A55: runs test for randomness — per series, are the hour-grid
    residuals (sign vs the series' lower median, ties dropped — the
    classic Wald-Wolfowitz convention) RANDOMLY ordered, or do they
    clump (trend / regime persistence) or alternate (overdispersion)?
    The nonparametric "is this series just noise" screen that needs no
    distributional assumption — the hypothesis-test sibling of A51/A52.

    Exactness: median = lower order statistic (rank ceil(n/2), repo
    rule); run/sign counts are exact ints computed INSIDE the per-series
    row by higher-order functions (signs array in time order, runs = 1 +
    sign changes); n₁, n₂ ≤ H ≤ a retention window of hours, so every
    product in μ = 1 + 2n₁n₂/n and σ² = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) is
    exactly representable as a double — both engines compose the SAME
    expression text, z = (R−μ)/√σ² is deterministic IEEE per output row.
    """
    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    arr = grid.groupBy("metric_name").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(x, y))), s -> s.y)"
        ).alias("ys")
    )
    med = arr.select(
        "metric_name",
        "ys",
        # hoist the median OUT of the per-element lambda: inlined, the
        # sort_array re-evaluates per element (O(H² log H)/series — fine
        # at gate hours, wasteful at a long retention window)
        F.expr(
            "element_at(sort_array(ys), cast(ceil(size(ys) / 2.0) as int))"
        ).alias("med"),
    )
    sgn = med.select(
        "metric_name",
        F.size("ys").alias("n_buckets"),
        F.expr(
            "filter(transform(ys, y -> CASE"
            " WHEN y > med THEN 1"
            " WHEN y < med THEN -1"
            " ELSE 0 END), s -> s != 0)"
        ).alias("signs"),
    )
    counted = sgn.select(
        "metric_name",
        "n_buckets",
        F.expr("size(filter(signs, s -> s = 1))").cast("long").alias("n_plus"),
        F.expr("size(filter(signs, s -> s = -1))").cast("long").alias("n_minus"),
        F.expr(
            "CASE WHEN size(signs) = 0 THEN 0L ELSE 1L +"
            " size(filter(zip_with(slice(signs, 1, size(signs) - 1),"
            "                      slice(signs, 2, size(signs) - 1),"
            "                      (a, b) -> a != b), c -> c)) END"
        ).alias("n_runs"),
    )
    mu = F.expr("1.0d + (2.0d * n_plus * n_minus) / (n_plus + n_minus)")
    s2 = F.expr(
        "(2.0d * n_plus * n_minus *"
        " (2.0d * n_plus * n_minus - n_plus - n_minus)) /"
        " ((n_plus + n_minus) * (n_plus + n_minus) * (n_plus + n_minus - 1.0d))"
    )
    return counted.select(
        "metric_name",
        "n_buckets",
        "n_plus",
        "n_minus",
        "n_runs",
        F.when(
            (F.col("n_plus") > 0) & (F.col("n_minus") > 0)
            & (F.col("n_plus") + F.col("n_minus") > 1),
            (F.col("n_runs") - mu) / F.sqrt(s2),
        ).alias("z"),
    ).orderBy("metric_name")


ORACLE_metric_runs_test = f"""
WITH m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), arr AS (
    SELECT metric_name,
           list(y ORDER BY x) AS ys_time,
           list(y ORDER BY y) AS ys_sorted
    FROM pb GROUP BY 1
), sgn AS (
    SELECT metric_name,
           CAST(len(ys_time) AS INT) AS n_buckets,
           list_filter(
               list_transform(ys_time, y -> CASE
                   WHEN y > ys_sorted[CAST(ceil(len(ys_sorted) / 2.0) AS BIGINT)]
                       THEN 1
                   WHEN y < ys_sorted[CAST(ceil(len(ys_sorted) / 2.0) AS BIGINT)]
                       THEN -1
                   ELSE 0 END),
               s -> s <> 0) AS signs
    FROM arr
), counted AS (
    SELECT metric_name, n_buckets,
           CAST(len(list_filter(signs, s -> s = 1)) AS BIGINT) AS n_plus,
           CAST(len(list_filter(signs, s -> s = -1)) AS BIGINT) AS n_minus,
           CAST(CASE WHEN len(signs) = 0 THEN 0 ELSE 1 +
               list_sum(list_transform(generate_series(1, len(signs) - 1),
                   i -> CASE WHEN signs[i] <> signs[i + 1]
                        THEN 1 ELSE 0 END)) END AS BIGINT) AS n_runs
    FROM sgn
)
SELECT metric_name, n_buckets, n_plus, n_minus, n_runs,
       CASE WHEN n_plus > 0 AND n_minus > 0 AND n_plus + n_minus > 1 THEN
           (n_runs - (1.0 + (2.0 * n_plus * n_minus) / (n_plus + n_minus)))
           / sqrt((2.0 * n_plus * n_minus *
                   (2.0 * n_plus * n_minus - n_plus - n_minus)) /
                  ((n_plus + n_minus) * (n_plus + n_minus)
                   * (n_plus + n_minus - 1.0)))
       END AS z
FROM counted
ORDER BY metric_name
"""


# ------------------------------------- A62: lead/lag cross-correlation --
#: signed-lag band for the cross-correlation scan (minutes)
_XCORR_MAX_LAG = 3


def metric_xcorr(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_series: int | None = 64,
    pair_block: str | None = None,
    defer_guard: bool = False,
) -> DataFrame:
    """A62: SIGNED-lag cross-correlation between every metric-series
    pair on the minute grid — the lead/lag detector ("disk latency
    moves 2 minutes AFTER buffer misses") that turns the A37 co-movement
    matrix into a causal-direction screen: the lag with the peak |xcorr|
    says which series LEADS.  Lag 0 reproduces A37's Pearson exactly —
    a built-in cross-operator consistency check.

    Same exact-int idiom as A37/A48 (min-centered dollar-quantized
    values, five int64 moment sums per (pair, lag), one float sqrt per
    OUTPUT row).  The lag rides INSIDE the equi-join key (the A48
    lesson, plan-pinned there): each left row explodes to the 2L+1
    signed lags and joins on the SHIFTED bucket — fan-out exactly
    (2L+1)·|metrics|/bucket, never a band-predicate B² degeneration.
    Output is |pairs|·(2L+1) rows regardless of corpus size.

    The series-pair axis is S²/2·(2L+1) — guarded by
    :func:`_guard_series_pairs` (``max_series`` / ``pair_block``).
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 60000000").alias("bucket"),
        F.col("metric_value").alias("v"),
    )
    per_bucket = m.groupBy("metric_name", "bucket").agg(F.sum("v").alias("y"))
    w = Window.partitionBy("metric_name")
    c = per_bucket.select(
        "metric_name", "bucket", (F.col("y") - F.min("y").over(w)).alias("yc0")
    ).select("metric_name", "bucket", F.expr("yc0 div 100").alias("yc"))
    c = _guard_series_pairs(
        c, "metric_name", max_series, pair_block, "metric_xcorr",
        count_rel=m,
        defer=defer_guard,
    )
    blk = ["__blk"] if pair_block is not None else []
    a = c.select(
        F.col("metric_name").alias("metric_a"),
        F.col("yc").alias("ya"),
        F.explode(
            F.expr(f"sequence(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG})")
        ).alias("lag"),
        "bucket",
        *blk,
    ).select(
        "metric_a",
        "ya",
        "lag",
        (F.col("bucket") + F.col("lag")).alias("bucket"),
        *blk,
    )
    pairs = (
        a.join(
            c.select(
                F.col("metric_name").alias("metric_b"),
                "bucket",
                F.col("yc").alias("yb"),
                *blk,
            ),
            ["bucket", *blk],
        )
        .filter(F.col("metric_a") < F.col("metric_b"))
        .select("metric_a", "metric_b", "lag", "ya", "yb")
    )
    agg = pairs.groupBy("metric_a", "metric_b", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ya").alias("sa"),
        F.sum("yb").alias("sb"),
        F.sum(F.col("ya") * F.col("yb")).alias("sab"),
        F.sum(F.col("ya") * F.col("ya")).alias("saa"),
        F.sum(F.col("yb") * F.col("yb")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    dx = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    dy = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    return agg.select(
        "metric_a",
        "metric_b",
        "lag",
        "n",
        num.alias("xcorr_num"),
        dx.alias("var_a_num"),
        dy.alias("var_b_num"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("xcorr"),
    ).orderBy("metric_a", "metric_b", "lag")


ORACLE_metric_xcorr = f"""
WITH m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 60000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), c AS (
    SELECT metric_name, bucket,
           (y - min(y) OVER (PARTITION BY metric_name)) // 100 AS yc
    FROM pb
), a AS (
    SELECT metric_name AS metric_a, yc AS ya, g.l AS lag, bucket + g.l AS bucket
    FROM c, unnest(generate_series(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG})) AS g(l)
), pairs AS (
    SELECT a.metric_a, b.metric_name AS metric_b, a.lag, a.ya, b.yc AS yb
    FROM a JOIN c b ON a.bucket = b.bucket AND a.metric_a < b.metric_name
), agg AS (
    SELECT metric_a, metric_b, lag, count(*) AS n,
           CAST(sum(ya) AS BIGINT) AS sa, CAST(sum(yb) AS BIGINT) AS sb,
           CAST(sum(ya * yb) AS BIGINT) AS sab,
           CAST(sum(ya * ya) AS BIGINT) AS saa,
           CAST(sum(yb * yb) AS BIGINT) AS sbb
    FROM pairs GROUP BY 1, 2, 3
)
SELECT metric_a, metric_b, lag, n,
       CAST(n * sab - sa * sb AS BIGINT) AS xcorr_num,
       CAST(n * saa - sa * sa AS BIGINT) AS var_a_num,
       CAST(n * sbb - sb * sb AS BIGINT) AS var_b_num,
       CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
            THEN CAST(n * sab - sa * sb AS DOUBLE)
                 / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * sbb - sb * sb AS DOUBLE))
            END AS xcorr
FROM agg
ORDER BY metric_a, metric_b, lag
"""


# ------------------------------ A63: linear days-to-threshold forecast --
def metric_days_to_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A63: capacity-exhaustion ETA — for each rising metric series,
    the days until its A36 least-squares trend line crosses one
    observed-range ABOVE the observed peak (threshold = ymax + span,
    i.e. 2·span in min-centered space) — the "disk full in N days"
    forecast every capacity dashboard leads with, composed entirely
    from the already-proven trend-ladder moments.

    All moments are the A36 exact int64 set (minute-indexed x, cents y,
    both min-centered); the forecast itself is a fixed per-OUTPUT-row
    IEEE chain — slope = num/den, ŷ(x_last) = (Σy + slope·(n·x_last −
    Σx))/n, days = (2·span − ŷ)·(1/slope)/1440 — identical operand
    order both engines, so even the float columns hash bit-exact.
    NULL when the trend is flat/declining (den=0 or num≤0): a
    non-rising series never crosses.  One corpus shuffle (the shared
    min-window + aggregate partitioning), |metrics| output rows.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 60000000").alias("xs"),
        F.col("metric_value").alias("y"),
    )
    w = Window.partitionBy("metric_name")
    c = m.select(
        "metric_name",
        (F.col("xs") - F.min("xs").over(w)).alias("x"),
        (F.col("y") - F.min("y").over(w)).alias("yc"),
    )
    agg = c.groupBy("metric_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("x").alias("x_last"),
        F.max("yc").alias("span_cents"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    staged = agg.select(
        "metric_name",
        "n",
        "sx",
        "sy",
        "x_last",
        "span_cents",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(
            den != 0, num.cast("double") / den.cast("double")
        ).alias("slope_cents_per_min"),
    ).select(
        "metric_name",
        "n",
        "x_last",
        "span_cents",
        "slope_num",
        "slope_den",
        "slope_cents_per_min",
        F.when(
            F.col("slope_den") != 0,
            (
                F.col("sy").cast("double")
                + F.col("slope_cents_per_min")
                * (F.col("n") * F.col("x_last") - F.col("sx")).cast("double")
            )
            / F.col("n").cast("double"),
        ).alias("yhat_last_cents"),
    )
    return staged.select(
        "metric_name",
        "n",
        "x_last",
        "span_cents",
        "slope_num",
        "slope_den",
        "slope_cents_per_min",
        "yhat_last_cents",
        F.when(
            (F.col("slope_den") != 0) & (F.col("slope_num") > 0),
            (
                (F.lit(2.0) * F.col("span_cents").cast("double"))
                - F.col("yhat_last_cents")
            )
            / F.col("slope_cents_per_min")
            / F.lit(1440.0),
        ).alias("days_to_threshold"),
    ).orderBy("metric_name")


ORACLE_metric_days_to_threshold = f"""
WITH m AS ({_SYN_SQL}),
c AS (
    SELECT metric_name,
           epoch_us(time) // 60000000
               - min(epoch_us(time) // 60000000) OVER (PARTITION BY metric_name)
               AS x,
           metric_value
               - min(metric_value) OVER (PARTITION BY metric_name) AS yc
    FROM m
), a AS (
    SELECT metric_name, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
           CAST(sum(x * yc) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           max(x) AS x_last, max(yc) AS span_cents
    FROM c GROUP BY metric_name
), s AS (
    SELECT metric_name, n, sx, sy, x_last, span_cents,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_cents_per_min
    FROM a
), y AS (
    SELECT metric_name, n, x_last, span_cents, slope_num, slope_den,
           slope_cents_per_min,
           CASE WHEN slope_den <> 0
                THEN (CAST(sy AS DOUBLE)
                      + slope_cents_per_min
                        * CAST(n * x_last - sx AS DOUBLE))
                     / CAST(n AS DOUBLE)
           END AS yhat_last_cents
    FROM s
)
SELECT metric_name, n, x_last, span_cents, slope_num, slope_den,
       slope_cents_per_min, yhat_last_cents,
       CASE WHEN slope_den <> 0 AND slope_num > 0
            THEN ((2.0 * CAST(span_cents AS DOUBLE)) - yhat_last_cents)
                 / slope_cents_per_min / 1440.0
       END AS days_to_threshold
FROM y
ORDER BY metric_name
"""


# ------------------------- A65: Kendall tau-b concordance between series --
def metric_kendall_tau(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_series: int | None = 64,
    pair_block: str | None = None,
    defer_guard: bool = False,
) -> DataFrame:
    """A65: Kendall tau-b between every metric-series pair on the hour
    grid — the RANK member of the co-movement family: A37/A62 measure
    linear co-movement (Pearson moments), this measures MONOTONE
    association (pair concordance), the screen that still fires when
    the coupling is nonlinear ("latency rises whenever queue depth
    rises, on any curve") and stays calm under single-spike outliers
    that inflate a Pearson r.

    Exactness: every count is int64 — C−D and the three tie counters
    are conditional sums over the pair relation, and C and D follow by
    exact parity algebra (C+D = n0 − ta − tb + tboth).  The only float
    is the final tau_b = (C−D)/√((n0−ta)(n0−tb)) — a correctly-rounded
    sqrt of an exact ≤2⁵³ integer product, so both engines emit the
    identical double.

    Scale shape: the pair space is generated by a self-join of the
    hour-aligned grid ON THE PAIR KEY with x as the range predicate —
    the O(H²) blowup happens INSIDE each join group (bounded by the
    retention window: 720 h grid → 259k index pairs per series pair),
    entirely in whole-stage codegen, and is immediately consumed by a
    map-side-combined hash aggregate, so no exchange ever carries the
    pair space (only the ≤|metrics|²·H/2 aligned rows shuffle).  This
    is the BOUNDED-group case of the A48 band-join rule: the band is
    the whole (window-capped) group, so keying the join on the pair —
    not the lag — is the right trade.  Two interpreted alternatives
    measured and rejected at sf0.1 (SCALE.md r10 session 4): in-row HOF
    pair arrays with a struct-accumulator `aggregate` (8.3 s) and
    primitive sign-code explode (14 s) — higher-order-function lambdas
    evaluate interpreted, while this join formulation runs the same
    2.6M sign pairs in ~2.3 s warm and mirrors the oracle SQL
    one-to-one.
    """
    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    grid = _guard_series_pairs(
        grid, "metric_name", max_series, pair_block, "metric_kendall_tau",
        count_rel=m,
        defer=defer_guard,
    )
    blk = ["__blk"] if pair_block is not None else []
    al = (
        grid.select(
            F.col("metric_name").alias("metric_a"),
            "x",
            F.col("y").alias("ya"),
            *blk,
        )
        .join(
            grid.select(
                F.col("metric_name").alias("metric_b"),
                "x",
                F.col("y").alias("yb"),
                *blk,
            ),
            ["x", *blk],
        )
        .filter(F.col("metric_a") < F.col("metric_b"))
        .select("metric_a", "metric_b", "x", "ya", "yb")
    )
    cnt = al.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).cast("int").alias("n")
    )
    pr = al.alias("p").join(
        al.alias("q"),
        (F.col("p.metric_a") == F.col("q.metric_a"))
        & (F.col("p.metric_b") == F.col("q.metric_b"))
        & (F.col("q.x") > F.col("p.x")),
    )
    signs = pr.select(
        F.col("p.metric_a").alias("metric_a"),
        F.col("p.metric_b").alias("metric_b"),
        F.expr(
            "case when q.ya > p.ya then 1 when q.ya < p.ya then -1 else 0 end"
        ).alias("sa"),
        F.expr(
            "case when q.yb > p.yb then 1 when q.yb < p.yb then -1 else 0 end"
        ).alias("sb"),
    )
    folded = (
        signs.groupBy("metric_a", "metric_b")
        .agg(
            F.count(F.lit(1)).alias("n0"),
            F.sum(F.col("sa") * F.col("sb")).alias("cd"),
            F.sum(F.when(F.col("sa") == 0, 1).otherwise(0)).alias("ties_a"),
            F.sum(F.when(F.col("sb") == 0, 1).otherwise(0)).alias("ties_b"),
            F.sum(
                F.when((F.col("sa") == 0) & (F.col("sb") == 0), 1).otherwise(0)
            ).alias("ties_both"),
        )
        .join(F.broadcast(cnt), ["metric_a", "metric_b"])
    )
    return folded.select(
        "metric_a",
        "metric_b",
        "n",
        "n0",
        F.expr(
            "(cd + n0 - ties_a - ties_b + ties_both) div 2"
        ).alias("concordant"),
        F.expr(
            "(cd + n0 - ties_a - ties_b + ties_both) div 2 - cd"
        ).alias("discordant"),
        "ties_a",
        "ties_b",
        "ties_both",
        F.expr(
            "case when n0 > ties_a and n0 > ties_b"
            " then cast(cd as double)"
            "  / sqrt(cast(n0 - ties_a as double) * cast(n0 - ties_b as double))"
            " end"
        ).alias("tau_b"),
    ).orderBy("metric_a", "metric_b")


ORACLE_metric_kendall_tau = f"""
WITH m AS ({_SYN_SQL}),
g AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), al AS (
    SELECT a.metric_name AS metric_a, b.metric_name AS metric_b,
           a.x, a.y AS ya, b.y AS yb
    FROM g a JOIN g b ON a.x = b.x AND a.metric_name < b.metric_name
), cnt AS (
    SELECT metric_a, metric_b, CAST(count(*) AS INT) AS n
    FROM al GROUP BY 1, 2
), pr AS (
    SELECT p.metric_a, p.metric_b,
           CASE WHEN q.ya > p.ya THEN 1 WHEN q.ya < p.ya THEN -1 ELSE 0 END AS sa,
           CASE WHEN q.yb > p.yb THEN 1 WHEN q.yb < p.yb THEN -1 ELSE 0 END AS sb
    FROM al p JOIN al q
      ON p.metric_a = q.metric_a AND p.metric_b = q.metric_b AND q.x > p.x
), agg AS (
    SELECT metric_a, metric_b,
           CAST(count(*) AS BIGINT) AS n0,
           CAST(sum(sa * sb) AS BIGINT) AS cd,
           CAST(sum(CASE WHEN sa = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_a,
           CAST(sum(CASE WHEN sb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_b,
           CAST(sum(CASE WHEN sa = 0 AND sb = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS ties_both
    FROM pr GROUP BY 1, 2
)
SELECT a.metric_a, a.metric_b, c.n, a.n0,
       (a.cd + a.n0 - a.ties_a - a.ties_b + a.ties_both) // 2 AS concordant,
       (a.cd + a.n0 - a.ties_a - a.ties_b + a.ties_both) // 2 - a.cd
           AS discordant,
       a.ties_a, a.ties_b, a.ties_both,
       CASE WHEN a.n0 > a.ties_a AND a.n0 > a.ties_b
            THEN CAST(a.cd AS DOUBLE)
                 / sqrt(CAST(a.n0 - a.ties_a AS DOUBLE)
                        * CAST(a.n0 - a.ties_b AS DOUBLE))
       END AS tau_b
FROM agg a JOIN cnt c
  ON a.metric_a = c.metric_a AND a.metric_b = c.metric_b
ORDER BY a.metric_a, a.metric_b
"""


# --------------------------- A66: Pettitt rank-based change-point test ----
def metric_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A66: Pettitt change-point test per series — the RANK-based twin
    of A52's variance-gain split: K_t = ΣΣ_{{i≤t<j}} sgn(y_j − y_i), the
    split where the Mann-Whitney shift statistic peaks.  Robust to the
    spike outliers that drag A52's mean-based gain, exactly as Theil-Sen
    (A51) robustifies the A36 slope — completing the robust ladder for
    level shifts.

    NO pair loop: K_t collapses by rank algebra.  The per-element
    increment Δ_t = Σ_{{j≠t}} sgn(y_j − y_t) = n − 2·(rank_t − 1) − eq_t
    (rank over VALUE order, eq = tie-group size), so K_t is the prefix
    sum of Δ over TIME order — two windows on the already-reduced hour
    grid (the A39 aggregate-then-window rule), all int64, zero floats
    in the gate projection.  The argmax of |K_t| over the interior
    splits (earliest on ties) is the change point; the exp() p-value
    approximation lives in :func:`pettitt_pvalue` OUTSIDE the hashed
    projection (the A32 ln-ulp rule — transcendentals differ in the
    last bit between the JVM and libm).

    Scale: one corpus shuffle to the (metric, hour) grid, then windows
    ride the ≤H rows/series partitions; output |metrics| rows.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    wser = Window.partitionBy("metric_name")
    wval = wser.orderBy("y")
    wtie = Window.partitionBy("metric_name", "y")
    wx = wser.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    c = grid.select(
        "metric_name",
        "x",
        F.count(F.lit(1)).over(wser).alias("n"),
        (
            F.count(F.lit(1)).over(wser)
            - 2 * (F.rank().over(wval) - 1)
            - F.count(F.lit(1)).over(wtie)
        ).cast("long").alias("delta"),
    )
    walked = c.select(
        "metric_name",
        "x",
        "n",
        F.sum("delta").over(wx).alias("k_signed"),
        F.row_number().over(wser.orderBy("x")).alias("s"),
    ).filter(F.col("s") < F.col("n"))
    wbest = Window.partitionBy("metric_name").orderBy(
        F.abs(F.col("k_signed")).desc(), F.asc("x")
    )
    return (
        walked.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "metric_name",
            F.col("n").cast("int").alias("n_buckets"),
            F.col("x").alias("last_hour_of_seg1"),
            "k_signed",
            F.abs(F.col("k_signed")).alias("k_stat"),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_pettitt = f"""
WITH m AS ({_SYN_SQL}),
g AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), c AS (
    SELECT metric_name, x,
           count(*) OVER (PARTITION BY metric_name) AS n,
           CAST(count(*) OVER (PARTITION BY metric_name)
                - 2 * (rank() OVER (PARTITION BY metric_name ORDER BY y) - 1)
                - count(*) OVER (PARTITION BY metric_name, y)
               AS BIGINT) AS delta
    FROM g
), walked AS (
    SELECT metric_name, x, n,
           sum(delta) OVER (PARTITION BY metric_name ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS k_signed,
           row_number() OVER (PARTITION BY metric_name ORDER BY x) AS s
    FROM c
), interior AS (
    SELECT metric_name, x, n, k_signed,
           row_number() OVER (PARTITION BY metric_name
                              ORDER BY abs(k_signed) DESC, x) AS rk
    FROM walked WHERE s < n
)
SELECT metric_name, CAST(n AS INT) AS n_buckets,
       x AS last_hour_of_seg1,
       CAST(k_signed AS BIGINT) AS k_signed,
       CAST(abs(k_signed) AS BIGINT) AS k_stat
FROM interior WHERE rk = 1
ORDER BY metric_name
"""


def pettitt_pvalue(df: DataFrame) -> DataFrame:
    """Attach the Pettitt significance approximation
    p ≈ 2·exp(−6K²/(n³+n²)) to an A66 report.  OUTSIDE the hashed gate
    (the A32/psi_from_shares rule): exp() is a transcendental whose
    last ulp differs between the JVM and DuckDB's libm, while K and n
    carry all the information exactly.  Unit-pinned against math.exp."""
    return df.withColumn(
        "p_approx",
        F.least(
            F.lit(1.0),
            2.0
            * F.exp(
                -6.0
                * F.col("k_stat").cast("double")
                * F.col("k_stat").cast("double")
                / (
                    F.col("n_buckets").cast("double")
                    * F.col("n_buckets").cast("double")
                    * (F.col("n_buckets").cast("double") + 1.0)
                )
            ),
        ),
    )


# ----------------- A67: cross-instance quantile normalization (QN) -------
def metric_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A67: quantile normalization of each instance's hour-grid series
    against the cross-instance reference distribution — the classic
    batch-effect correction (Bolstad et al. 2003, microarray QN) an ML
    feature pipeline applies so per-shard/per-tenant measurement bias
    doesn't leak into training features: every instance's rank-r value
    is replaced by the MEAN of all instances' rank-r values.

    Exactness: ranks are a row_number over the (y, x) TOTAL order (the
    A38 tie rule — deterministic, no average-rank rationals), the
    reference is the exact int64 (ref_sum, ref_n) pair per rank, and
    the normalized value is their single guarded division — the only
    float, identical IEEE both engines.  Variable-length semantics
    (instances with fewer buckets than rank r simply don't vote at r)
    are documented rather than padded — classic QN's equal-length
    requirement doesn't survive sparse per-tenant grids.

    Scale: one corpus shuffle to the (instance, hour) grid; the rank
    window rides per-instance partitions; the reference relation is
    ≤ max-series-length rows → BROADCAST back onto the grid.  Output
    = grid size, linear in input.
    """
    m = synthesize_metrics(spark, sf_dir).filter(
        F.col("metric_name") == HIT
    ).select(
        "instance_id",
        F.expr("unix_micros(time) div 3600000000").alias("hour"),
        F.col("metric_value").alias("v"),
    )
    from pyspark.sql import Window

    grid = m.groupBy("instance_id", "hour").agg(F.sum("v").alias("y"))
    wr = Window.partitionBy("instance_id").orderBy("y", "hour")
    ranked = grid.select(
        "instance_id", "hour", "y", F.row_number().over(wr).alias("rk")
    )
    ref = ranked.groupBy("rk").agg(
        F.count(F.lit(1)).alias("ref_n"), F.sum("y").alias("ref_sum")
    )
    return (
        ranked.join(F.broadcast(ref), "rk")
        .select(
            "instance_id",
            "hour",
            "y",
            "rk",
            "ref_n",
            "ref_sum",
            (
                F.col("ref_sum").cast("double") / F.col("ref_n").cast("double")
            ).alias("qn_value"),
        )
        .orderBy("instance_id", "hour")
    )


ORACLE_metric_quantile_normalize = f"""
WITH m AS ({_SYN_SQL}),
g AS (
    SELECT instance_id, epoch_us(time) // 3600000000 AS hour,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m WHERE metric_name = '{HIT}'
    GROUP BY 1, 2
), ranked AS (
    SELECT instance_id, hour, y,
           row_number() OVER (PARTITION BY instance_id ORDER BY y, hour) AS rk
    FROM g
), ref AS (
    SELECT rk, CAST(count(*) AS BIGINT) AS ref_n,
           CAST(sum(y) AS BIGINT) AS ref_sum
    FROM ranked GROUP BY rk
)
SELECT r.instance_id, r.hour, r.y, r.rk, f.ref_n, f.ref_sum,
       CAST(f.ref_sum AS DOUBLE) / CAST(f.ref_n AS DOUBLE) AS qn_value
FROM ranked r JOIN ref f ON r.rk = f.rk
ORDER BY instance_id, hour
"""


# ---------------- A68: Spearman rho with exact integer midranks ----------
# Registration note: implemented + oracle-twinned + unit-pinned in round
# 10 session 4; REGISTRATION deferred to round 11 so the round-10 gate
# window keeps all ten r05-stale rows (the 50-slot window was exactly
# full at 40 new + 10 refresh). The r11 registry block should add:
#   ("metric_spearman", m.metric_spearman, m.ORACLE_metric_spearman)
def metric_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A68: Spearman rho between every metric-series pair on the hour
    grid — the third member of the association triad: A37 Pearson
    (linear), A65 Kendall tau-b (pair concordance), this = Pearson ON
    RANKS (monotone association with the classic magnitude-free
    robustness, cheaper than Kendall's pair space: rank windows are
    O(H log H) per series, not O(H²) per pair).

    Exactness via DOUBLED MIDRANKS (the A64 trick): midrank = (2·below
    + t + 1)/2 stays integer when carried as 2·midrank (below = count
    of strictly smaller grid values within the series, t = tie-group
    size), and Pearson is scale-invariant, so rho over (2r_a, 2r_b)
    equals rho over midranks while every moment (n·Σxy − ΣxΣy etc.)
    stays exact int64.  The only float is the final num/√(dx·dy) —
    correctly-rounded sqrt over exact ≤2⁵³ products (720-hour grid:
    moments ≤ n·(2n)² ≈ 1.5·10⁹, products ≤ 2.2·10¹⁸ < 2⁶³; document
    the H ≲ 10⁵ bound before the dx·dy product needs splitting).

    Scale shape: rank windows ride the per-series partitions of the
    reduced grid (the A39 rule), the pair alignment is the A65 equi-join
    on the ≤|metrics|·H relation, and the five moments come from ONE
    map-side-combined aggregate — no pair space exists at all.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    # below = rank() − 1 (count of STRICTLY smaller values) — tie-stable
    # by definition; a ROWS-frame count would hand each tied row a
    # position-dependent below and the two engines order ties differently
    # (caught by the queued-gate check on first run)
    wval = Window.partitionBy("metric_name").orderBy("y")
    wtie = Window.partitionBy("metric_name", "y")
    ranked = grid.select(
        "metric_name",
        "x",
        (
            2 * (F.rank().over(wval) - 1)
            + F.count(F.lit(1)).over(wtie)
            + 1
        ).cast("long").alias("r2"),
    )
    al = (
        ranked.select(
            F.col("metric_name").alias("metric_a"),
            "x",
            F.col("r2").alias("ra"),
        )
        .join(
            ranked.select(
                F.col("metric_name").alias("metric_b"),
                "x",
                F.col("r2").alias("rb"),
            ),
            "x",
        )
        .filter(F.col("metric_a") < F.col("metric_b"))
    )
    agg = al.groupBy("metric_a", "metric_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sa"),
        F.sum("rb").alias("sb"),
        F.sum(F.col("ra") * F.col("rb")).alias("sab"),
        F.sum(F.col("ra") * F.col("ra")).alias("saa"),
        F.sum(F.col("rb") * F.col("rb")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    dx = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    dy = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    return agg.select(
        "metric_a",
        "metric_b",
        F.col("n").cast("int").alias("n"),
        num.alias("rho_num"),
        dx.alias("var_a_num"),
        dy.alias("var_b_num"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("rho"),
    ).orderBy("metric_a", "metric_b")


ORACLE_metric_spearman = f"""
WITH m AS ({_SYN_SQL}),
g AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), ranked AS (
    SELECT metric_name, x,
           CAST(2 * (rank() OVER (PARTITION BY metric_name ORDER BY y) - 1)
                + count(*) OVER (PARTITION BY metric_name, y)
                + 1 AS BIGINT) AS r2
    FROM g
), al AS (
    SELECT a.metric_name AS metric_a, b.metric_name AS metric_b,
           a.r2 AS ra, b.r2 AS rb
    FROM ranked a JOIN ranked b
      ON a.x = b.x AND a.metric_name < b.metric_name
), agg AS (
    SELECT metric_a, metric_b, count(*) AS n,
           CAST(sum(ra) AS BIGINT) AS sa, CAST(sum(rb) AS BIGINT) AS sb,
           CAST(sum(ra * rb) AS BIGINT) AS sab,
           CAST(sum(ra * ra) AS BIGINT) AS saa,
           CAST(sum(rb * rb) AS BIGINT) AS sbb
    FROM al GROUP BY 1, 2
)
SELECT metric_a, metric_b, CAST(n AS INT) AS n,
       CAST(n * sab - sa * sb AS BIGINT) AS rho_num,
       CAST(n * saa - sa * sa AS BIGINT) AS var_a_num,
       CAST(n * sbb - sb * sb AS BIGINT) AS var_b_num,
       CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
            THEN CAST(n * sab - sa * sb AS DOUBLE)
                 / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * sbb - sb * sb AS DOUBLE))
       END AS rho
FROM agg
ORDER BY metric_a, metric_b
"""


# ---------------- A69: Mann-Kendall trend test (Theil-Sen's twin) --------
# Registration note: queued for round 11 (r10 gate window full); the r11
# registry block should add:
#   ("metric_mann_kendall", m.metric_mann_kendall, m.ORACLE_metric_mann_kendall)
def metric_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A69: Mann-Kendall trend test per series — the SIGNIFICANCE half of
    the standard robust-trend pairing (A51 Theil-Sen gives the slope,
    this says whether a monotone trend exists at all):
    S = ΣΣ_{i<j} sgn(y_j − y_i) over the time order, i.e. Kendall
    concordance of the series AGAINST TIME, with the tie-corrected
    normal approximation var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18.

    Exactness: S and the tie triple Σt(t−1)(2t+5) are exact int64 — S
    from the same within-group pair join as A65 (the time axis is
    strictly increasing, so only the y-signs matter), the tie sum from
    one (series, value) group-by.  z uses the continuity correction
    ((S−1)/σ for S>0, (S+1)/σ for S<0, 0 at S=0) as ONE identical IEEE
    chain over the exact ints (×18 cleared inside the sqrt: z =
    (S∓1)·√18/√var18), so even the float hashes bit-exact.

    Scale shape: identical to A65 — pair space inside window-bounded
    join groups, consumed map-side; tie sum rides the grid aggregate.
    """
    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    pr = grid.alias("p").join(
        grid.alias("q"),
        (F.col("p.metric_name") == F.col("q.metric_name"))
        & (F.col("q.x") > F.col("p.x")),
    )
    s_agg = pr.groupBy(F.col("p.metric_name").alias("metric_name")).agg(
        F.sum(
            F.expr(
                "case when q.y > p.y then 1 when q.y < p.y then -1 else 0 end"
            )
        ).alias("s_stat")
    )
    ties = (
        grid.groupBy("metric_name", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("metric_name")
        .agg(
            F.sum("t").cast("long").alias("n"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_triple"),
        )
    )
    j = s_agg.join(F.broadcast(ties), "metric_name").filter(F.col("n") >= 2)
    return j.select(
        "metric_name",
        F.col("n").cast("int").alias("n_buckets"),
        "s_stat",
        F.expr("n * (n - 1) * (2 * n + 5) - tie_triple").alias("var18"),
        F.expr(
            "case when n * (n - 1) * (2 * n + 5) - tie_triple > 0 and s_stat <> 0"
            " then (cast(s_stat as double)"
            "       - (case when s_stat > 0 then 1.0 else -1.0 end))"
            "  * sqrt(18.0)"
            "  / sqrt(cast(n * (n - 1) * (2 * n + 5) - tie_triple as double))"
            " when n * (n - 1) * (2 * n + 5) - tie_triple > 0 then 0.0"
            " end"
        ).alias("z"),
    ).orderBy("metric_name")


ORACLE_metric_mann_kendall = f"""
WITH m AS ({_SYN_SQL}),
g AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), s_agg AS (
    SELECT p.metric_name,
           CAST(sum(CASE WHEN q.y > p.y THEN 1 WHEN q.y < p.y THEN -1
                         ELSE 0 END) AS BIGINT) AS s_stat
    FROM g p JOIN g q ON p.metric_name = q.metric_name AND q.x > p.x
    GROUP BY p.metric_name
), ties AS (
    SELECT metric_name, CAST(sum(t) AS BIGINT) AS n,
           CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_triple
    FROM (
        SELECT metric_name, y, CAST(count(*) AS BIGINT) AS t
        FROM g GROUP BY 1, 2
    ) GROUP BY metric_name
)
SELECT s.metric_name, CAST(t.n AS INT) AS n_buckets, s.s_stat,
       CAST(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_triple AS BIGINT) AS var18,
       case when t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_triple > 0 and s.s_stat <> 0
        then (cast(s.s_stat as double)
              - (case when s.s_stat > 0 then 1.0 else -1.0 end))
         * sqrt(18.0)
         / sqrt(cast(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_triple as double))
        when t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_triple > 0 then 0.0
        end AS z
FROM s_agg s JOIN ties t ON s.metric_name = t.metric_name
WHERE t.n >= 2
ORDER BY s.metric_name
"""


# --------- A72: Bollinger-band breakouts by exact integer algebra --------
# Registration note: queued for round 11 (r10 gate window full); the r11
# registry block should add:
#   ("metric_bollinger", m.metric_bollinger, m.ORACLE_metric_bollinger)
_BOLL_W = 24  # trailing window, hours
_BOLL_K = 3  # band half-width in trailing sigmas


def metric_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A72: rolling mean±kσ band breakouts per series — the classic
    volatility-aware alert ("this hour is 3 trailing-day sigmas off its
    own recent level") that complements A33's calendar baseline (same
    hour-of-day across the corpus) with a TEMPORALLY LOCAL baseline (the
    immediately preceding 24 h), and A43's CUSUM (cumulative small
    drift) with a single-point blowout detector.

    ZERO floats, not even at the edge: the breakout predicate
    |y−μ| > kσ over the trailing-window mean/variance clears every
    denominator — (y·n − S)² > k²·(n·Q − S²) with S=Σy, Q=Σy² over the
    window — so the gate compares exact int64 cross-products and emits
    the exact dev/var numerators for audit.  Overflow bound documented:
    |y|≲2·10⁶ window-cents keeps (yn−S)² and k²(nQ−S²) under 2⁶³ at
    W=24; quantize y (the A62 ``div 100`` step) past that.  The window
    EXCLUDES the current point (scored against its past, so a breakout
    can't suppress itself), and only full windows score.

    Scale: the trailing window rides the (metric, hour) grid's
    per-series partitions (the A39 aggregate-then-window rule); output
    = breakout rows only.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    wt = (
        Window.partitionBy("metric_name")
        .orderBy("x")
        .rowsBetween(-_BOLL_W, -1)
    )
    rolled = grid.select(
        "metric_name",
        "x",
        "y",
        F.count(F.lit(1)).over(wt).alias("n"),
        F.sum("y").over(wt).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(wt).alias("q"),
    ).filter(F.col("n") == _BOLL_W)
    dev = F.col("y") * F.col("n") - F.col("s")
    var = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        rolled.select(
            "metric_name",
            "x",
            "y",
            dev.alias("dev_num"),
            var.alias("var_num"),
        )
        .filter(
            F.col("dev_num") * F.col("dev_num")
            > F.lit(_BOLL_K * _BOLL_K) * F.col("var_num")
        )
        .select(
            "metric_name",
            F.col("x").alias("hour"),
            F.col("y").alias("value_cents"),
            "dev_num",
            "var_num",
            (F.col("dev_num") > 0).alias("is_upper"),
        )
        .orderBy("metric_name", "hour")
    )


ORACLE_metric_bollinger = f"""
WITH m AS ({_SYN_SQL}),
g AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), rolled AS (
    SELECT metric_name, x, y,
           count(*) OVER w AS n,
           sum(y) OVER w AS s,
           sum(y * y) OVER w AS q
    FROM g
    WINDOW w AS (PARTITION BY metric_name ORDER BY x
                 ROWS BETWEEN {_BOLL_W} PRECEDING AND 1 PRECEDING)
), scored AS (
    SELECT metric_name, x, y,
           CAST(y * n - s AS BIGINT) AS dev_num,
           CAST(n * q - s * s AS BIGINT) AS var_num
    FROM rolled WHERE n = {_BOLL_W}
)
SELECT metric_name, x AS hour, y AS value_cents, dev_num, var_num,
       dev_num > 0 AS is_upper
FROM scored
WHERE dev_num * dev_num > {_BOLL_K * _BOLL_K} * var_num
ORDER BY metric_name, hour
"""


# ------------------------------------- A74: hour-of-day seasonal profile --
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("metric_seasonal_hod", m.metric_seasonal_hod,
#    m.ORACLE_metric_seasonal_hod)
def metric_seasonal_hod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A74: hour-of-day seasonal profile per metric series — the
    decomposition step every anomaly detector needs before thresholding
    ("is 3 AM load LOW, or NORMAL FOR 3 AM?"): for each (metric, hour
    0..23) slot, the sample count, exact cent sum, slot mean, and the
    seasonal index (slot mean / series mean) that rescales a raw reading
    into its deseasonalized residual.

    Relationship to A33 (`metric_seasonal_outliers`, registered):
    A33 builds this same (metric, hod) profile INTERNALLY and emits the
    top-20 residual rows it scores with it; this operator emits the
    PROFILE itself plus the normalized seasonal index — the baseline
    table a dashboard renders and any downstream deseasonalizer joins,
    which A33's top-K output cannot provide.  Same intermediate, the
    two products of it (the rollup / rollup-cascade precedent).

    Exactness: both aggregation levels are int64 cent sums; the two
    float columns are each ONE IEEE division of exact-int products
    (mean = sum/n; index = (sum_h·n_tot)/(n_h·sum_tot) — cross-
    multiplied so it is a single division, not a ratio of two divisions
    whose intermediate rounding could differ cross-engine). hour() is
    evaluated in the session's pinned UTC zone on both engines.

    Scale: one corpus exchange keyed (metric, hod) — 24·|metrics|
    groups, map-side combined — plus a |metrics|-row broadcast for the
    series totals. Output fixed at 24·|metrics| rows regardless of
    corpus size.
    """
    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.hour("time").alias("hod"),
        F.col("metric_value").alias("v"),
    )
    per = m.groupBy("metric_name", "hod").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_cents")
    )
    tot = m.groupBy("metric_name").agg(
        F.count(F.lit(1)).alias("n_tot"), F.sum("v").alias("sum_tot")
    )
    return (
        per.join(F.broadcast(tot), "metric_name")
        .select(
            "metric_name",
            "hod",
            "n",
            "sum_cents",
            (F.col("sum_cents").cast("double") / F.col("n").cast("double")).alias(
                "mean_cents"
            ),
            (
                (F.col("sum_cents") * F.col("n_tot")).cast("double")
                / (F.col("n") * F.col("sum_tot")).cast("double")
            ).alias("seasonal_index"),
        )
        .orderBy("metric_name", "hod")
    )


ORACLE_metric_seasonal_hod = f"""
WITH m AS ({_SYN_SQL}),
per AS (
    SELECT metric_name, CAST(hour(time) AS INT) AS hod,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(metric_value) AS BIGINT) AS sum_cents
    FROM m GROUP BY 1, 2
), tot AS (
    SELECT metric_name, CAST(count(*) AS BIGINT) AS n_tot,
           CAST(sum(metric_value) AS BIGINT) AS sum_tot
    FROM m GROUP BY 1
)
SELECT per.metric_name, hod, n, sum_cents,
       CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
       CAST(sum_cents * n_tot AS DOUBLE) / CAST(n * sum_tot AS DOUBLE)
           AS seasonal_index
FROM per JOIN tot ON per.metric_name = tot.metric_name
ORDER BY per.metric_name, hod
"""


# ------------------------------------------- A75: maximum drawdown --------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("metric_drawdown", m.metric_drawdown, m.ORACLE_metric_drawdown)
def metric_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A75: maximum drawdown per metric series on the hour grid — the
    "worst peak-to-trough slide" statistic (capacity headroom loss,
    cache-hit collapse depth) that the point detectors (A72 Bollinger
    blowouts) and drift detectors (A43 CUSUM) both miss: a slow bleed
    never breaks a band and may never shift the mean enough to trip a
    CUSUM, but its running-peak gap grows monotonically.

    Exact ints end-to-end: running peak = cumulative MAX window over the
    per-series hour grid, drawdown = peak − y, and the winning row is
    row_number 1 over (drawdown DESC, hour ASC) — the earliest deepest
    trough, deterministic under ties. No floats anywhere.

    Scale: both windows ride the per-series partitions of the (metric,
    hour) grid (the A39 aggregate-then-window rule — the grid is
    retention-bounded per series, never corpus-sized); output =
    |metrics| rows.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    w_run = (
        Window.partitionBy("metric_name")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = grid.select(
        "metric_name",
        "x",
        "y",
        F.max("y").over(w_run).alias("peak"),
        (F.max("y").over(w_run) - F.col("y")).alias("drawdown"),
        F.count(F.lit(1)).over(
            Window.partitionBy("metric_name").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_hours"),
    )
    w_pick = Window.partitionBy("metric_name").orderBy(
        F.desc("drawdown"), F.asc("x")
    )
    return (
        dd.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .select(
            "metric_name",
            "n_hours",
            F.col("x").alias("trough_hour"),
            F.col("peak").alias("peak_cents"),
            F.col("y").alias("trough_cents"),
            F.col("drawdown").alias("drawdown_cents"),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_drawdown = f"""
WITH m AS ({_SYN_SQL}),
g AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), dd AS (
    SELECT metric_name, x, y,
           max(y) OVER (PARTITION BY metric_name ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak,
           max(y) OVER (PARTITION BY metric_name ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - y
               AS drawdown,
           CAST(count(*) OVER (PARTITION BY metric_name) AS BIGINT) AS n_hours
    FROM g
), picked AS (
    SELECT *, row_number() OVER (PARTITION BY metric_name
                                 ORDER BY drawdown DESC, x ASC) AS rn
    FROM dd
)
SELECT metric_name, n_hours, x AS trough_hour, peak AS peak_cents,
       y AS trough_cents, CAST(drawdown AS BIGINT) AS drawdown_cents
FROM picked WHERE rn = 1
ORDER BY metric_name
"""


# --------------------------------- A79: series completeness report --------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("metric_completeness_report", m.metric_completeness_report,
#    m.ORACLE_metric_completeness_report)
def metric_completeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A79: per-series grid-completeness audit — the report every
    metrics pipeline runs before trusting a dashboard: over each
    series' observed [first, last] hour span, how many grid points
    exist, how many are missing, the coverage in integer ppm, and the
    LONGEST gap (consecutive missing hours).  `metric_gap_fill` (A42)
    REPAIRS gaps; this MEASURES them — repair without measurement hides
    collector outages, which is exactly what the report exists to
    surface.

    All int64: expected = last − first + 1, missing = expected −
    observed, longest gap = max(lag diff) − 1 over the per-series hour
    sequence (one window on per-series partitions of the already-
    reduced grid).  Output |metrics| rows, one corpus exchange.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
    )
    grid = m.distinct()
    w = Window.partitionBy("metric_name").orderBy("x")
    stepped = grid.select(
        "metric_name",
        "x",
        (F.col("x") - F.lag("x").over(w)).alias("step"),
    )
    return (
        stepped.groupBy("metric_name")
        .agg(
            F.count(F.lit(1)).alias("n_observed"),
            F.min("x").alias("first_hour"),
            F.max("x").alias("last_hour"),
            F.max("step").alias("max_step"),
        )
        .select(
            "metric_name",
            "n_observed",
            "first_hour",
            "last_hour",
            (F.col("last_hour") - F.col("first_hour") + 1).alias("n_expected"),
            (
                F.col("last_hour") - F.col("first_hour") + 1 - F.col("n_observed")
            ).alias("n_missing"),
            F.expr(
                "n_observed * 1000000 div (last_hour - first_hour + 1)"
            ).alias("coverage_ppm"),
            F.coalesce(F.col("max_step") - 1, F.lit(0)).alias(
                "longest_gap_hours"
            ),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_completeness_report = f"""
WITH m AS ({_SYN_SQL}),
grid AS (
    SELECT DISTINCT metric_name, epoch_us(time) // 3600000000 AS x FROM m
), stepped AS (
    SELECT metric_name, x,
           x - lag(x) OVER (PARTITION BY metric_name ORDER BY x) AS step
    FROM grid
), agg AS (
    SELECT metric_name,
           CAST(count(*) AS BIGINT) AS n_observed,
           CAST(min(x) AS BIGINT) AS first_hour,
           CAST(max(x) AS BIGINT) AS last_hour,
           max(step) AS max_step
    FROM stepped GROUP BY metric_name
)
SELECT metric_name, n_observed, first_hour, last_hour,
       CAST(last_hour - first_hour + 1 AS BIGINT) AS n_expected,
       CAST(last_hour - first_hour + 1 - n_observed AS BIGINT) AS n_missing,
       CAST(n_observed * 1000000 // (last_hour - first_hour + 1) AS BIGINT)
           AS coverage_ppm,
       CAST(coalesce(max_step - 1, 0) AS BIGINT) AS longest_gap_hours
FROM agg
ORDER BY metric_name
"""


# --------------------- A84: additive seasonal decomposition (staged r13) ---
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("metric_seasonal_decompose", m.metric_seasonal_decompose,
#    m.ORACLE_metric_seasonal_decompose)
def metric_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A84: classic additive trend/seasonal decomposition of each hourly
    metric series — the missing middle between A74 (the hour-of-day
    PROFILE, which assumes no trend) and the change detectors (A43/A66,
    which assume no seasonality): trend = 25-hour centered moving sum
    over the present-bucket sequence, detrended value in EXACT scaled
    ints (``detr25 = 25·v − trend_sum25``, defined only where the
    window is full — no division, no float), seasonal = per
    (metric, hour-of-day) mean of the detrended values as ONE IEEE
    division of exact-int aggregates (the A74 cross-multiply rule; a
    scaled integer div would floor/truncate differently across engines
    on the negative detrended sums).

    Scale: one exchange to the hourly grid (map-side combined), one
    window per metric (bounded by the retention grid — the same
    partitioning every A4x operator rides), a 24·|metrics|-row seasonal
    aggregate broadcast back.  Output = one row per present bucket.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir)
    hb = m.groupBy(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("bucket"),
    ).agg(F.sum("metric_value").alias("v"))
    w = (
        Window.partitionBy("metric_name")
        .orderBy("bucket")
        .rowsBetween(-12, 12)
    )
    t = (
        hb.withColumn("trend_sum25", F.sum("v").over(w))
        .withColumn("n_win", F.count("v").over(w))
        .withColumn(
            "detr25",
            F.when(
                F.col("n_win") == 25,
                F.col("v") * 25 - F.col("trend_sum25"),
            ),
        )
        .withColumn("hod", (F.col("bucket") % 24).cast("long"))
    )
    seas = (
        t.filter(F.col("detr25").isNotNull())
        .groupBy("metric_name", "hod")
        .agg(
            F.sum("detr25").alias("_num"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "metric_name",
            "hod",
            # one IEEE division of exact ints — bit-identical cross-engine
            (
                F.col("_num").cast("double")
                / (F.lit(25.0) * F.col("_n").cast("double"))
            ).alias("seasonal"),
        )
    )
    return (
        t.join(F.broadcast(seas), ["metric_name", "hod"], "left")
        .select(
            "metric_name",
            "bucket",
            "v",
            "trend_sum25",
            "n_win",
            "detr25",
            "hod",
            "seasonal",
        )
        .orderBy("metric_name", "bucket")
    )


ORACLE_metric_seasonal_decompose = f"""
WITH m AS ({_SYN_SQL}),
hb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS v
    FROM m GROUP BY 1, 2
), t AS (
    SELECT metric_name, bucket, v,
           CAST(sum(v) OVER w AS BIGINT) AS trend_sum25,
           CAST(count(v) OVER w AS BIGINT) AS n_win
    FROM hb
    WINDOW w AS (PARTITION BY metric_name ORDER BY bucket
                 ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), d AS (
    SELECT *,
           CASE WHEN n_win = 25 THEN 25 * v - trend_sum25 END AS detr25,
           CAST(bucket % 24 AS BIGINT) AS hod
    FROM t
), s AS (
    SELECT metric_name, hod,
           CAST(sum(detr25) AS DOUBLE) / (25.0 * count(detr25)) AS seasonal
    FROM d WHERE detr25 IS NOT NULL GROUP BY 1, 2
)
SELECT d.metric_name, d.bucket, d.v, d.trend_sum25, d.n_win, d.detr25,
       d.hod, s.seasonal
FROM d LEFT JOIN s USING (metric_name, hod)
ORDER BY metric_name, bucket
"""


# ----------------------- A86: winsorized robust stats (staged r13) --------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("metric_winsorize", m.metric_winsorize,
#    m.ORACLE_metric_winsorize)
_WINS_LO_PCT = 5
_WINS_HI_PCT = 95


def metric_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A86: winsorized robust statistics of each hourly metric series —
    the trimming counterpart of A22's MAD detector: where MAD *flags*
    outliers, winsorization *prices a summary that survives them*
    (clip at the positional p05/p95, then mean).  Percentile bounds are
    EXACT nearest-rank order statistics (rank ``ceil(p·n/100)`` via
    integer ``(p·n + 99) div 100`` — no interpolation, no float
    percentile semantics to disagree on), the tie order is total
    (value, bucket), clipped sums are exact ints, and the winsorized
    mean is ONE IEEE division of exact-int aggregates (the A74 rule).

    Scale: rides the same per-metric hourly-grid window every A4x
    operator uses (bounded by the retention grid); the rank pass and
    the clip pass share ONE exchange (rank cols extend the sort the
    window already did), and the report is a |metrics|-row aggregate.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir)
    hb = m.groupBy(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("bucket"),
    ).agg(F.sum("metric_value").alias("v"))
    w = Window.partitionBy("metric_name").orderBy("v", "bucket")
    wn = Window.partitionBy("metric_name")
    ranked = (
        hb.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("i_lo", F.expr(f"({_WINS_LO_PCT} * n + 99) div 100"))
        .withColumn("i_hi", F.expr(f"({_WINS_HI_PCT} * n + 99) div 100"))
    )
    bounds = ranked.groupBy("metric_name").agg(
        F.max(F.when(F.col("rn") == F.col("i_lo"), F.col("v"))).alias("p05"),
        F.max(F.when(F.col("rn") == F.col("i_hi"), F.col("v"))).alias("p95"),
    )
    clipped = ranked.join(F.broadcast(bounds), "metric_name").select(
        "metric_name",
        "v",
        "p05",
        "p95",
        F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("v"))).alias("vc"),
    )
    return (
        clipped.groupBy("metric_name")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.first("p05").alias("p05"),
            F.first("p95").alias("p95"),
            F.sum(F.when(F.col("v") < F.col("p05"), 1).otherwise(0))
            .cast("long")
            .alias("n_clip_low"),
            F.sum(F.when(F.col("v") > F.col("p95"), 1).otherwise(0))
            .cast("long")
            .alias("n_clip_high"),
            F.sum("v").alias("sum_raw"),
            F.sum("vc").alias("sum_winsor"),
        )
        .withColumn(
            "winsor_mean",
            # one IEEE division of exact ints — bit-identical cross-engine
            F.col("sum_winsor").cast("double")
            / F.col("n_buckets").cast("double"),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_winsorize = f"""
WITH m AS ({_SYN_SQL}),
hb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS v
    FROM m GROUP BY 1, 2
), ranked AS (
    SELECT metric_name, bucket, v,
           CAST(row_number() OVER (PARTITION BY metric_name
                                   ORDER BY v, bucket) AS BIGINT) AS rn,
           CAST(count(*) OVER (PARTITION BY metric_name) AS BIGINT) AS n
    FROM hb
), idx AS (
    SELECT *,
           ({_WINS_LO_PCT} * n + 99) // 100 AS i_lo,
           ({_WINS_HI_PCT} * n + 99) // 100 AS i_hi
    FROM ranked
), bounds AS (
    SELECT metric_name,
           max(CASE WHEN rn = i_lo THEN v END) AS p05,
           max(CASE WHEN rn = i_hi THEN v END) AS p95
    FROM idx GROUP BY metric_name
), clipped AS (
    SELECT i.metric_name, i.v, b.p05, b.p95,
           greatest(b.p05, least(b.p95, i.v)) AS vc
    FROM idx i JOIN bounds b USING (metric_name)
)
SELECT metric_name,
       count(*) AS n_buckets,
       any_value(p05) AS p05,
       any_value(p95) AS p95,
       CAST(sum(CASE WHEN v < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
       CAST(sum(CASE WHEN v > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
       CAST(sum(v) AS BIGINT) AS sum_raw,
       CAST(sum(vc) AS BIGINT) AS sum_winsor,
       CAST(sum(vc) AS DOUBLE) / count(*) AS winsor_mean
FROM clipped
GROUP BY metric_name
ORDER BY metric_name
"""


# ------------- A90: symbolic series + motif discovery (staged r13) --------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("metric_sax_motifs", m.metric_sax_motifs,
#    m.ORACLE_metric_sax_motifs)
_SAX_ALPHA = 4  # alphabet size (equi-depth quartile symbols)
_SAX_GRAM = 3  # motif width
_SAX_TOPK = 5  # motifs reported per metric


def metric_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A90: SAX-style symbolic motif discovery over each hourly metric
    series — the classic symbolization (Lin et al.'s SAX) with one
    exactness-driven substitution: canonical SAX z-normalizes and cuts
    at Gaussian breakpoints (a mean/σ float chain no two engines fold
    identically); EQUI-DEPTH breakpoints are the same idea expressed as
    positional order statistics — symbol = ⌊(rank−1)·α / n⌋ over the
    (value, bucket) total order — and are *adaptive* to the actual
    distribution, which is why the data-mining literature offers them
    as the standard SAX variant for non-Gaussian series.  Motifs are
    the α-ary 3-grams of the TIME-ordered symbol string; the report is
    each metric's top-{_SAX_TOPK} motifs with exact counts and ppm
    support — the repeated-shape summary that turns a million-point
    series into a screenful.

    Scale: both windows (value rank, time order) partition by metric —
    ONE exchange, two sorts of the retention-grid-bounded series; the
    motif count is a (metric, motif) hash aggregate (≤ α³ groups per
    metric) and the top-k a window over that reduced relation."""
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir)
    hb = m.groupBy(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("bucket"),
    ).agg(F.sum("metric_value").alias("v"))
    wv = Window.partitionBy("metric_name").orderBy("v", "bucket")
    wn = Window.partitionBy("metric_name")
    sym = (
        hb.withColumn("rn", F.row_number().over(wv))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("symbol", F.expr(f"(rn - 1) * {_SAX_ALPHA} div n"))
    )
    wt = Window.partitionBy("metric_name").orderBy("bucket")
    tri = (
        sym.withColumn("s1", F.col("symbol"))
        .withColumn("s2", F.lead("symbol", 1).over(wt))
        .withColumn("s3", F.lead("symbol", 2).over(wt))
        .filter(F.col("s3").isNotNull())
        .select(
            "metric_name",
            F.concat_ws(
                "",
                F.col("s1").cast("string"),
                F.col("s2").cast("string"),
                F.col("s3").cast("string"),
            ).alias("motif"),
        )
    )
    counts = tri.groupBy("metric_name", "motif").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = tri.groupBy("metric_name").agg(F.count(F.lit(1)).alias("n_grams"))
    wr = Window.partitionBy("metric_name").orderBy(
        F.col("cnt").desc(), "motif"
    )
    return (
        counts.join(tot, "metric_name")
        .withColumn("motif_rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("motif_rank") <= _SAX_TOPK)
        .select(
            "metric_name",
            "motif",
            "motif_rank",
            "cnt",
            "n_grams",
            F.expr("cnt * 1000000 div n_grams").alias("support_ppm"),
        )
        .orderBy("metric_name", "motif_rank")
    )


ORACLE_metric_sax_motifs = f"""
WITH m AS ({_SYN_SQL}),
hb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS v
    FROM m GROUP BY 1, 2
), sym AS (
    SELECT metric_name, bucket,
           (row_number() OVER (PARTITION BY metric_name ORDER BY v, bucket)
            - 1) * {_SAX_ALPHA}
           // count(*) OVER (PARTITION BY metric_name) AS symbol
    FROM hb
), tri AS (
    SELECT metric_name,
           CAST(symbol AS VARCHAR)
           || CAST(lead(symbol, 1) OVER w AS VARCHAR)
           || CAST(lead(symbol, 2) OVER w AS VARCHAR) AS motif
    FROM sym
    WINDOW w AS (PARTITION BY metric_name ORDER BY bucket)
    QUALIFY lead(symbol, 2) OVER w IS NOT NULL
), counts AS (
    SELECT metric_name, motif, CAST(count(*) AS BIGINT) AS cnt
    FROM tri GROUP BY 1, 2
), tot AS (
    SELECT metric_name, CAST(count(*) AS BIGINT) AS n_grams
    FROM tri GROUP BY 1
), ranked AS (
    SELECT c.metric_name, c.motif, c.cnt, t.n_grams,
           CAST(row_number() OVER (PARTITION BY c.metric_name
                                   ORDER BY c.cnt DESC, c.motif)
                AS BIGINT) AS motif_rank
    FROM counts c JOIN tot t USING (metric_name)
)
SELECT metric_name, motif, motif_rank, cnt, n_grams,
       CAST(cnt * 1000000 // n_grams AS BIGINT) AS support_ppm
FROM ranked
WHERE motif_rank <= {_SAX_TOPK}
ORDER BY metric_name, motif_rank
"""


# -------------- A94: Holt forecast backtest (staged r13) ------------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("metric_forecast_backtest", m.metric_forecast_backtest,
#    m.ORACLE_metric_forecast_backtest)
_BT_TEST_FRAC_NUM, _BT_TEST_FRAC_DEN = 1, 5  # last 20% of buckets held out


def metric_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A94: the holdout backtest A53's forecaster was missing — "is the
    Holt forecast any GOOD on this series" answered the only honest
    way: freeze the (level, trend) state at the 80% mark, project
    l + h·b across the held-out 20%, and score MAE against the naive
    last-value carry-forward (the baseline every forecasting paper must
    beat; improvement ≤ 0 means the trend term is hurting and the
    governor should fall back to EWMA).

    Exactness: the train fold is A53's gated recursion verbatim (same
    constants, same expression tree); each holdout error is rounded to
    int64 micro-units BEFORE summation (deterministic fold order is not
    even needed once the sum is integer — the N15 rule applied to
    forecast errors), MAE is integer division, improvement integer ppm.

    Scale: identical to A53 — one grid exchange, one per-metric sorted
    array fold bounded by the retention grid; the backtest adds one
    `transform` over the holdout indices, map-side."""
    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    grid = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    arr = (
        grid.groupBy("metric_name")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(x, y))),"
                " s -> cast(s.y as double))"
            ).alias("ys")
        )
        .filter(F.size("ys") >= 5)
        .withColumn(
            "n_train",
            F.expr(
                f"size(ys) - size(ys) * {_BT_TEST_FRAC_NUM}"
                f" div {_BT_TEST_FRAC_DEN}"
            ),
        )
        .withColumn("n_test", F.expr("size(ys) - n_train"))
    )
    a, b = HOLT_ALPHA, HOLT_BETA
    fold = (
        f"aggregate(slice(ys, 3, greatest(n_train - 2, 0)),"
        f" named_struct('l', element_at(ys, 1),"
        f"              'b', element_at(ys, 2) - element_at(ys, 1)),"
        f" (acc, x) -> named_struct("
        f"   'l', {a} * x + {1 - a:.1f} * (acc.l + acc.b),"
        f"   'b', {b} * (({a} * x + {1 - a:.1f} * (acc.l + acc.b)) - acc.l)"
        f"        + {1 - b:.1f} * acc.b))"
    )
    st = arr.withColumn("st", F.expr(fold))
    errs = st.select(
        "metric_name",
        "n_train",
        "n_test",
        F.col("st.l").alias("level"),
        F.col("st.b").alias("trend"),
        F.expr(
            "aggregate(transform(sequence(n_train + 1, size(ys)),"
            " i -> cast(round(abs(element_at(ys, cast(i as int))"
            "      - (st.l + (i - n_train) * st.b)), 0) as long)),"
            " 0L, (acc, e) -> acc + e)"
        ).alias("abs_err_holt_cents"),
        F.expr(
            "aggregate(transform(sequence(n_train + 1, size(ys)),"
            " i -> cast(round(abs(element_at(ys, cast(i as int))"
            "      - element_at(ys, cast(n_train as int))), 0) as long)),"
            " 0L, (acc, e) -> acc + e)"
        ).alias("abs_err_naive_cents"),
    )
    return (
        errs.select(
            "metric_name",
            "n_train",
            "n_test",
            "level",
            "trend",
            F.expr("abs_err_holt_cents div n_test").alias("mae_holt_cents"),
            F.expr("abs_err_naive_cents div n_test").alias("mae_naive_cents"),
            F.expr(
                "case when abs_err_naive_cents > 0 then"
                " (abs_err_naive_cents - abs_err_holt_cents) * 1000000"
                " div abs_err_naive_cents else 0 end"
            ).alias("improvement_ppm"),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_forecast_backtest = f"""
WITH RECURSIVE m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), arr AS (
    SELECT metric_name, list(CAST(y AS DOUBLE) ORDER BY x) AS ys
    FROM pb GROUP BY 1
), sized AS (
    SELECT metric_name, ys,
           len(ys) - len(ys) * {_BT_TEST_FRAC_NUM} // {_BT_TEST_FRAC_DEN}
               AS n_train,
           len(ys) * {_BT_TEST_FRAC_NUM} // {_BT_TEST_FRAC_DEN} AS n_test
    FROM arr WHERE len(ys) >= 5
), h AS (
    SELECT metric_name, ys, n_train, n_test, 2 AS i,
           ys[1] AS l, ys[2] - ys[1] AS b
    FROM sized
    UNION ALL
    SELECT metric_name, ys, n_train, n_test, i + 1,
           {HOLT_ALPHA} * ys[i + 1] + {1 - HOLT_ALPHA:.1f} * (l + b),
           {HOLT_BETA} * (({HOLT_ALPHA} * ys[i + 1]
                           + {1 - HOLT_ALPHA:.1f} * (l + b)) - l)
               + {1 - HOLT_BETA:.1f} * b
    FROM h WHERE i < n_train
), st AS (
    SELECT metric_name, ys, n_train, n_test, l, b
    FROM h WHERE i = n_train
), errs AS (
    SELECT metric_name, n_train, n_test, l AS level, b AS trend,
           list_aggregate(
               [CAST(round(abs(ys[i] - (l + (i - n_train) * b)), 0) AS BIGINT)
                for i in generate_series(n_train + 1, len(ys))],
               'sum') AS abs_err_holt_cents,
           list_aggregate(
               [CAST(round(abs(ys[i] - ys[n_train]), 0) AS BIGINT)
                for i in generate_series(n_train + 1, len(ys))],
               'sum') AS abs_err_naive_cents
    FROM st
)
SELECT metric_name, CAST(n_train AS BIGINT) AS n_train,
       CAST(n_test AS BIGINT) AS n_test, level, trend,
       CAST(abs_err_holt_cents // n_test AS BIGINT) AS mae_holt_cents,
       CAST(abs_err_naive_cents // n_test AS BIGINT) AS mae_naive_cents,
       CAST(CASE WHEN abs_err_naive_cents > 0 THEN
                (abs_err_naive_cents - abs_err_holt_cents) * 1000000
                // abs_err_naive_cents ELSE 0 END AS BIGINT)
           AS improvement_ppm
FROM errs
ORDER BY metric_name
"""


# ----------- A100: SPC control-chart rules (staged r13) -------------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("metric_spc_rules", m.metric_spc_rules,
#    m.ORACLE_metric_spc_rules)
_SPC_RUN = 9  # Western Electric / Nelson rule-4 run length


def metric_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A100: Western-Electric control-chart violations per hourly metric
    series — rule 1 (a point beyond 3σ of the center line) and rule 4
    (9 consecutive points on the same side of center), the two rules a
    mean-shift passes through FIRST: A72's Bollinger flags local
    volatility breakouts against a trailing window; the SPC chart holds
    the center/σ FIXED over the control period, so slow drifts that
    never breach a rolling band still trip the run rule.

    Exactness: all comparisons are exact-int cross-multiplies against
    the center-line rationals — `x > μ + 3σ ⇔ (x·n − S)² > 9·(n·Q −
    S²)` with side = sign(x·n − S) — over DOLLAR-scaled values (cents
    div 100, documented truncation: the cent-scale squares would cross
    int64 at the gate SFs, the dollar-scale keeps every term < 10¹⁶);
    no division, no sqrt, no float anywhere.  Rule 4 is a 9-row window
    sum of sides == ±9.  Scale: one grid exchange; both windows (stats,
    run) partition by metric over the retention-bounded series."""
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir)
    hb = m.groupBy(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("bucket"),
    ).agg(F.expr("sum(metric_value) div 100").alias("x"))
    wn = Window.partitionBy("metric_name")
    stats = (
        hb.withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("s", F.sum("x").over(wn))
        .withColumn("q", F.sum(F.col("x") * F.col("x")).over(wn))
        .withColumn("dev", F.col("x") * F.col("n") - F.col("s"))
        .withColumn("var9", F.lit(9) * (F.col("n") * F.col("q") - F.col("s") * F.col("s")))
        .withColumn("side", F.signum(F.col("dev").cast("double")).cast("long"))
    )
    wrun = (
        Window.partitionBy("metric_name")
        .orderBy("bucket")
        .rowsBetween(-(_SPC_RUN - 1), 0)
    )
    flagged = (
        stats.withColumn("run_sum", F.sum("side").over(wrun))
        .withColumn("run_n", F.count("side").over(wrun))
        .withColumn(
            "rule1",
            F.col("dev") * F.col("dev") > F.col("var9"),
        )
        .withColumn(
            "rule4",
            (F.col("run_n") == _SPC_RUN)
            & (F.abs(F.col("run_sum")) == _SPC_RUN),
        )
    )
    return (
        flagged.filter(F.col("rule1") | F.col("rule4"))
        .select(
            "metric_name",
            "bucket",
            F.col("x").alias("value_dollars"),
            "side",
            "rule1",
            "rule4",
        )
        .orderBy("metric_name", "bucket")
    )


ORACLE_metric_spc_rules = f"""
WITH m AS ({_SYN_SQL}),
hb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS bucket,
           CAST(sum(metric_value) // 100 AS BIGINT) AS x
    FROM m GROUP BY 1, 2
), stats AS (
    SELECT metric_name, bucket, x,
           CAST(count(*) OVER w AS BIGINT) AS n,
           CAST(sum(x) OVER w AS BIGINT) AS s,
           CAST(sum(x * x) OVER w AS BIGINT) AS q
    FROM hb
    WINDOW w AS (PARTITION BY metric_name)
), dev AS (
    SELECT *,
           x * n - s AS dev_,
           9 * (n * q - s * s) AS var9,
           CAST(sign(x * n - s) AS BIGINT) AS side
    FROM stats
), runs AS (
    SELECT *,
           CAST(sum(side) OVER wr AS BIGINT) AS run_sum,
           CAST(count(side) OVER wr AS BIGINT) AS run_n
    FROM dev
    WINDOW wr AS (PARTITION BY metric_name ORDER BY bucket
                  ROWS BETWEEN {_SPC_RUN - 1} PRECEDING AND CURRENT ROW)
)
SELECT metric_name, bucket, x AS value_dollars, side,
       dev_ * dev_ > var9 AS rule1,
       run_n = {_SPC_RUN} AND abs(run_sum) = {_SPC_RUN} AS rule4
FROM runs
WHERE dev_ * dev_ > var9 OR (run_n = {_SPC_RUN} AND abs(run_sum) = {_SPC_RUN})
ORDER BY metric_name, bucket
"""


# ---------------- A102: dominant-period detection (staged r13) -------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("metric_autoperiod", m.metric_autoperiod,
#    m.ORACLE_metric_autoperiod)
_AP_MAX_LAG = 36
_AP_MIN_LAG = 2


def metric_autoperiod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A102: dominant-period detection per metric — the ACF argmax over
    hourly lags 2..36 that A84's decomposition ASSUMES (its period-24
    grid is an input; this operator is where that input comes from, and
    a dominant lag far from 24 is the "don't run the daily model"
    guard).  `is_daily` flags a winner in the 23-25 band.

    Exactness: the A48 exact-int moment machinery verbatim
    (`acf_over_grid`, hourly grid, min-centered dollar quantization);
    the per-lag correlation is the A48 one-sqrt expression and the
    ARGMAX ranks those doubles with lag tie-break — the float totally
    orders identically cross-engine because every value is the same
    fixed expression tree (the knn-cosine precedent).  Scale: one
    lag-expanded equi-join (fan-out ≤ 36, never a band self-join — the
    A48 measurement), one two-key reduce, rank window on the
    |metrics|·35-row reduced relation."""
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("bucket"),
        F.col("metric_value").alias("v"),
    )
    per_bucket = m.groupBy("metric_name", "bucket").agg(F.sum("v").alias("y"))
    w = Window.partitionBy("metric_name")
    c = per_bucket.select(
        "metric_name", "bucket", (F.col("y") - F.min("y").over(w)).alias("yc0")
    ).select("metric_name", "bucket", F.expr("yc0 div 100").alias("yc"))
    acf = acf_over_grid(c, _AP_MAX_LAG).filter(F.col("lag") >= _AP_MIN_LAG)
    wr = Window.partitionBy("metric_name").orderBy(
        F.desc_nulls_last("acf"), "lag"
    )
    ranked = acf.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") <= 2
    )
    return (
        ranked.groupBy("metric_name")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("lag"))).alias("dominant_lag"),
            F.max(F.when(F.col("rk") == 1, F.col("acf"))).alias("dominant_acf"),
            F.max(F.when(F.col("rk") == 2, F.col("lag"))).alias("second_lag"),
            F.max(F.when(F.col("rk") == 2, F.col("acf"))).alias("second_acf"),
        )
        .withColumn(
            "is_daily",
            (F.col("dominant_lag") >= 23) & (F.col("dominant_lag") <= 25),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_autoperiod = f"""
WITH m AS ({_SYN_SQL}),
pb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY 1, 2
), c AS (
    SELECT metric_name, bucket,
           (y - min(y) OVER (PARTITION BY metric_name)) // 100 AS yc
    FROM pb
), pairs AS (
    SELECT a.metric_name, b.bucket - a.bucket AS lag,
           a.yc AS ya, b.yc AS yb
    FROM c a JOIN c b
      ON a.metric_name = b.metric_name
     AND b.bucket > a.bucket AND b.bucket <= a.bucket + {_AP_MAX_LAG}
), agg AS (
    SELECT metric_name, lag, count(*) AS n,
           CAST(sum(ya) AS BIGINT) AS sa, CAST(sum(yb) AS BIGINT) AS sb,
           CAST(sum(ya * yb) AS BIGINT) AS sab,
           CAST(sum(ya * ya) AS BIGINT) AS saa,
           CAST(sum(yb * yb) AS BIGINT) AS sbb
    FROM pairs GROUP BY 1, 2
), r AS (
    SELECT metric_name, lag,
           CASE WHEN n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
                THEN CAST(n * sab - sa * sb AS DOUBLE)
                     / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                            * CAST(n * sbb - sb * sb AS DOUBLE))
                END AS acf
    FROM agg
    WHERE lag >= {_AP_MIN_LAG}
), ranked AS (
    SELECT metric_name, lag, acf,
           row_number() OVER (PARTITION BY metric_name
                              ORDER BY acf DESC NULLS LAST, lag) AS rk
    FROM r
    QUALIFY rk <= 2
)
SELECT metric_name,
       CAST(max(CASE WHEN rk = 1 THEN lag END) AS BIGINT) AS dominant_lag,
       max(CASE WHEN rk = 1 THEN acf END) AS dominant_acf,
       CAST(max(CASE WHEN rk = 2 THEN lag END) AS BIGINT) AS second_lag,
       max(CASE WHEN rk = 2 THEN acf END) AS second_acf,
       max(CASE WHEN rk = 1 THEN lag END) BETWEEN 23 AND 25 AS is_daily
FROM ranked
GROUP BY metric_name
ORDER BY metric_name
"""


# ---------------- A104: PromQL-style range rate (round 14) ----------------
# Registration note: REGISTERED r14 (Block R14b).  Registry row:
#   ("metric_range_rate", m.metric_range_rate, m.ORACLE_metric_range_rate)
_RATE_WRAP = 2_000_000  # counter wrap sized so resets fire at the gate SFs
_RATE_WIN = 6  # range window = 6 aligned hours


def metric_range_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A104: PromQL-style ``increase``/``rate`` over aligned range
    windows of a CUMULATIVE counter with reset correction — the missing
    windowed member of the delta family: T2-T5's snapshot delta is
    per-sample, this is the per-range aggregate dashboards actually
    plot (`rate(counter[6h])`).  The counter series is synthesized
    deterministically from the hourly grid (running cumulative cents,
    wrapped at 2·10⁶ — each wrap IS a reset, exercising the T3 rule at
    range scope).

    Semantics (per (metric, 6h-aligned window)): increase = Σ of
    reset-aware deltas between consecutive samples INSIDE the window
    (``c_i − c_{i−1}`` when monotone, ``c_i`` after a reset — the T3
    rule verbatim); the window-opening sample contributes no delta
    (PromQL's behavior: increases before the first in-range sample are
    outside the range).  ``rate_per_hour`` = increase / observed span
    as ONE IEEE division of exact ints; single-sample windows carry
    NULL rate.  ``n_resets`` makes the wrap events auditable.

    Scale: one exchange to the hourly grid, one per-metric window for
    the cumulative counter + lag (retention-bounded, the A4x pattern),
    then a (metric, window) hash aggregate.  All arithmetic exact ints
    except the final division.
    """
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir)
    hb = m.groupBy(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("bucket"),
    ).agg(F.sum("metric_value").alias("v"))
    wcum = (
        Window.partitionBy("metric_name")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wlag = Window.partitionBy("metric_name").orderBy("bucket")
    c = (
        hb.withColumn("counter", F.sum("v").over(wcum) % F.lit(_RATE_WRAP))
        .withColumn("prev_counter", F.lag("counter", 1).over(wlag))
        .withColumn("prev_bucket", F.lag("bucket", 1).over(wlag))
        .withColumn("win", F.expr(f"bucket div {_RATE_WIN}"))
    )
    in_win = F.col("prev_bucket").isNotNull() & (
        F.expr(f"prev_bucket div {_RATE_WIN}") == F.col("win")
    )
    delta = F.when(
        F.col("counter") >= F.col("prev_counter"), F.col("counter") - F.col("prev_counter")
    ).otherwise(F.col("counter"))
    agg = (
        c.groupBy("metric_name", "win")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.min("bucket").alias("first_bucket"),
            F.max("bucket").alias("last_bucket"),
            F.min_by("counter", "bucket").alias("counter_first"),
            F.max_by("counter", "bucket").alias("counter_last"),
            F.sum(F.when(in_win, delta).otherwise(F.lit(0))).alias("increase"),
            F.sum(
                F.when(
                    in_win & (F.col("counter") < F.col("prev_counter")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_resets"),
        )
        .withColumn(
            "rate_per_hour",
            F.when(
                F.col("last_bucket") > F.col("first_bucket"),
                F.col("increase").cast("double")
                / (F.col("last_bucket") - F.col("first_bucket")).cast("double"),
            ),
        )
    )
    return agg.select(
        "metric_name", "win", "n_samples", "first_bucket", "last_bucket",
        "counter_first", "counter_last", "n_resets", "increase",
        "rate_per_hour",
    ).orderBy("metric_name", "win")


ORACLE_metric_range_rate = f"""
WITH m AS ({_SYN_SQL}),
hb AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS bucket,
           CAST(sum(metric_value) AS BIGINT) AS v
    FROM m GROUP BY 1, 2
), c AS (
    SELECT metric_name, bucket,
           CAST(sum(v) OVER (PARTITION BY metric_name ORDER BY bucket
                             ROWS UNBOUNDED PRECEDING) % {_RATE_WRAP}
                AS BIGINT) AS counter
    FROM hb
), l AS (
    SELECT metric_name, bucket, counter,
           lag(counter) OVER (PARTITION BY metric_name ORDER BY bucket)
               AS prev_counter,
           lag(bucket) OVER (PARTITION BY metric_name ORDER BY bucket)
               AS prev_bucket,
           bucket // {_RATE_WIN} AS win
    FROM c
), d AS (
    SELECT *,
           prev_bucket IS NOT NULL
               AND prev_bucket // {_RATE_WIN} = win AS in_win,
           CASE WHEN counter >= prev_counter THEN counter - prev_counter
                ELSE counter END AS delta
    FROM l
)
SELECT metric_name, win,
       count(*) AS n_samples,
       min(bucket) AS first_bucket,
       max(bucket) AS last_bucket,
       min_by(counter, bucket) AS counter_first,
       max_by(counter, bucket) AS counter_last,
       CAST(sum(CASE WHEN in_win AND counter < prev_counter
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       CAST(sum(CASE WHEN in_win THEN delta ELSE 0 END) AS BIGINT)
           AS increase,
       CASE WHEN max(bucket) > min(bucket)
            THEN CAST(sum(CASE WHEN in_win THEN delta ELSE 0 END) AS DOUBLE)
                 / CAST(max(bucket) - min(bucket) AS DOUBLE)
            END AS rate_per_hour
FROM d
GROUP BY metric_name, win
ORDER BY metric_name, win
"""


# --------- A109: seasonal-hybrid MAD anomaly screen (round 15) -------------
def metric_shesd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A109: seasonal-hybrid anomaly screen (the Twitter S-H-ESD shape
    composed from gated pieces): deseasonalize each metric's hourly
    series by its hour-of-day MEDIAN (A74 gives the mean profile; the
    median survives the very outliers being hunted), then flag buckets
    whose residual deviates from the residual median by more than
    3×MAD — the robust rule A34 (`qan_anomaly_mad`) applies to raw
    values, now applied where it belongs: AFTER seasonal adjustment
    ("is 3 AM low, or normal for 3 AM?" answered before thresholding).

    Exactness: the series is the A84 exact-int hour grid; hod medians,
    the residual median and the MAD are nearest-rank order statistics
    over DISTINCT-value grids ((n+1) div 2 — medians of ints stay
    ints); deviations and the 3×MAD compare are pure int64.  The worst
    bucket is a lexicographic struct-max (dev DESC, bucket ASC) — total
    order, no float.

    Scale: one corpus exchange to the (metric, hour-bucket) grid;
    every window after that partitions by metric (or metric+hod) over
    the retention-bounded grid — the corpus is touched once."""
    from pyspark.sql import Window

    m = synthesize_metrics(spark, sf_dir).select(
        "metric_name",
        F.expr("unix_micros(time) div 3600000000").alias("x"),
        F.col("metric_value").alias("v"),
    )
    series = m.groupBy("metric_name", "x").agg(F.sum("v").alias("y"))
    series = series.withColumn("hod", F.expr("x % 24"))

    # hod median over the distinct-y grid per (metric, hod)
    hg = series.groupBy("metric_name", "hod", "y").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wh = Window.partitionBy("metric_name", "hod")
    whc = wh.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    hod_med = (
        hg.withColumn("n", F.sum("cnt").over(wh))
        .withColumn("cum", F.sum("cnt").over(whc))
        .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("metric_name", "hod")
        .agg(F.min("y").alias("hod_median"))
    )
    resid = series.join(hod_med, ["metric_name", "hod"]).select(
        "metric_name", "x", (F.col("y") - F.col("hod_median")).alias("r")
    )

    # residual median per metric (same grid pattern)
    def _grid_median(df, val, out):
        g = df.groupBy("metric_name", val).agg(F.count(F.lit(1)).alias("cnt"))
        wm = Window.partitionBy("metric_name")
        wmc = wm.orderBy(val).rowsBetween(Window.unboundedPreceding, 0)
        return (
            g.withColumn("n", F.sum("cnt").over(wm))
            .withColumn("cum", F.sum("cnt").over(wmc))
            .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
            .groupBy("metric_name")
            .agg(F.min(val).alias(out))
        )

    r_med = _grid_median(resid, "r", "r_median")
    dev = resid.join(F.broadcast(r_med), "metric_name").select(
        "metric_name",
        "x",
        "r",
        F.abs(F.col("r") - F.col("r_median")).alias("ad"),
    )
    mad = _grid_median(dev.select("metric_name", F.col("ad")), "ad", "mad")
    flagged = dev.join(F.broadcast(mad), "metric_name").withColumn(
        "is_anom", F.col("ad") > 3 * F.col("mad")
    )
    return (
        flagged.groupBy("metric_name")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.first("mad").alias("mad"),
            F.sum(F.when(F.col("is_anom"), 1).otherwise(0)).alias("n_anomalies"),
            F.max(
                F.struct(
                    F.col("ad").alias("ad"), (-F.col("x")).alias("nx")
                )
            ).alias("w"),
        )
        .select(
            "metric_name",
            "n_buckets",
            "mad",
            "n_anomalies",
            (-F.col("w.nx")).alias("worst_bucket"),
            F.col("w.ad").alias("worst_dev"),
        )
        .orderBy("metric_name")
    )


ORACLE_metric_shesd = f"""
WITH m AS ({_SYN_SQL}),
series AS (
    SELECT metric_name, epoch_us(time) // 3600000000 AS x,
           CAST(sum(metric_value) AS BIGINT) AS y
    FROM m GROUP BY metric_name, epoch_us(time) // 3600000000
), s2 AS (
    SELECT *, x % 24 AS hod FROM series
), hg AS (
    SELECT metric_name, hod, y, count(*) AS cnt
    FROM s2 GROUP BY metric_name, hod, y
), hcum AS (
    SELECT metric_name, hod, y,
           sum(cnt) OVER (PARTITION BY metric_name, hod) AS n,
           sum(cnt) OVER (PARTITION BY metric_name, hod ORDER BY y
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM hg
), hod_med AS (
    SELECT metric_name, hod, min(y) AS hod_median
    FROM hcum WHERE cum >= (n + 1) // 2 GROUP BY metric_name, hod
), resid AS (
    SELECT s2.metric_name, s2.x, s2.y - hod_med.hod_median AS r
    FROM s2 JOIN hod_med USING (metric_name, hod)
), rg AS (
    SELECT metric_name, r, count(*) AS cnt FROM resid GROUP BY metric_name, r
), rcum AS (
    SELECT metric_name, r,
           sum(cnt) OVER (PARTITION BY metric_name) AS n,
           sum(cnt) OVER (PARTITION BY metric_name ORDER BY r
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM rg
), r_med AS (
    SELECT metric_name, min(r) AS r_median
    FROM rcum WHERE cum >= (n + 1) // 2 GROUP BY metric_name
), dev AS (
    SELECT resid.metric_name, resid.x, abs(resid.r - r_med.r_median) AS ad
    FROM resid JOIN r_med USING (metric_name)
), ag AS (
    SELECT metric_name, ad, count(*) AS cnt FROM dev GROUP BY metric_name, ad
), acum AS (
    SELECT metric_name, ad,
           sum(cnt) OVER (PARTITION BY metric_name) AS n,
           sum(cnt) OVER (PARTITION BY metric_name ORDER BY ad
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM ag
), mad AS (
    SELECT metric_name, min(ad) AS mad
    FROM acum WHERE cum >= (n + 1) // 2 GROUP BY metric_name
), ranked AS (
    SELECT metric_name, x, ad,
           row_number() OVER (PARTITION BY metric_name
                              ORDER BY ad DESC, x ASC) AS rn
    FROM dev
), agg AS (
    SELECT dev.metric_name,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(any_value(mad.mad) AS BIGINT) AS mad,
           CAST(sum(CASE WHEN dev.ad > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies
    FROM dev JOIN mad USING (metric_name)
    GROUP BY dev.metric_name
)
SELECT agg.metric_name, agg.n_buckets, agg.mad, agg.n_anomalies,
       CAST(ranked.x AS BIGINT) AS worst_bucket,
       CAST(ranked.ad AS BIGINT) AS worst_dev
FROM agg JOIN ranked ON agg.metric_name = ranked.metric_name AND ranked.rn = 1
ORDER BY agg.metric_name
"""
