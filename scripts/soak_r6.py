"""Round-6 soak: parameterized LSH geometry + 10x r5 additions.

1. LSH bits sweep at 200k 64-dim vectors: bucket-population stats and
   lsh_topk wall time at bits = 4 / 8 / 16 (the round-6 scale knob; the
   round-5 verdict required a >= 16-bit soak).
2. pq_adc_topk at 200k vectors (4x the round-5 soak).
3. metric_time_weighted_avg plan shape at 8M samples with a hot series
   holding ~50% of rows (per-series lead windows under skew).
4. orders_asof_snapshot plan shape over a deep SCD2 history: 8M change
   events across 100k entities PLUS one 1M-version hot entity.

Usage: python scripts/soak_r6.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.datapipe import similarity as S  # noqa: E402
from project_obsidian_core_spark.operators.merge import scd2_history  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402


def synth_vecs(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j -> "
            "cast(pmod(xxhash64(id, j), 2000) - 1000 as double) / 1000.0)"
        ).alias("embedding"),
    )


def main() -> None:
    spark = build_session(app_name="soak-r6")
    n_vecs = 200_000

    vecs = synth_vecs(spark, n_vecs).persist()
    vecs.count()
    queries = vecs.filter(F.col("vec_id") < 5)

    # 1. LSH geometry sweep
    for bits in (4, 8, 16):
        t0 = time.time()
        stats = S.lsh_bucket_stats(vecs, bits=bits).agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.expr("percentile_approx(n, 0.99)").alias("p99_bucket"),
        ).first()
        t_stats = time.time() - t0
        t0 = time.time()
        n_out = S.lsh_topk(vecs, queries, k=10, bits=bits).count()
        t_topk = time.time() - t0
        print(
            f"lsh bits={bits:2d}: buckets={stats.n_buckets:6d} "
            f"max_bucket={stats.max_bucket:6d} p99={stats.p99_bucket:6d} "
            f"stats={t_stats:.2f}s topk={t_topk:.2f}s rows={n_out}"
        )

    # 2. PQ/ADC at 200k
    t0 = time.time()
    n_out = S.pq_adc_topk(vecs, queries, k=10).count()
    print(f"pq_adc {n_vecs} vectors: {time.time() - t0:.2f}s rows={n_out}")
    vecs.unpersist()

    # 3. time-weighted average, hot series (plan shape of
    # plans/metrics_queries.py::metric_time_weighted_avg)
    n_samples = 8_000_000
    samples = spark.range(n_samples).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise((F.col("id") % 1000).cast("string"))
        .alias("instance"),
        F.lit("m").alias("metric_name"),
        (F.col("id") * 7 + F.abs(F.xxhash64("id")) % 5).alias("us"),
        (F.abs(F.xxhash64("id", F.lit(3))) % 10_000).alias("v_cents"),
    )
    w = Window.partitionBy("instance", "metric_name").orderBy("us", "v_cents")
    t0 = time.time()
    out = (
        samples.withColumn("next_us", F.lead("us").over(w))
        .filter(F.col("next_us").isNotNull())
        .groupBy("instance", "metric_name")
        .agg(
            F.sum(F.expr("v_cents * ((next_us - us) div 1000)")).alias("wv_sum"),
            F.sum(F.expr("(next_us - us) div 1000")).alias("w_sum"),
        )
        .count()
    )
    print(f"time_weighted_avg 8M samples, hot-series 50%: {time.time() - t0:.2f}s series={out}")

    # 4. deep SCD2 history + AS OF read (plan shape of orders_asof_snapshot)
    n_hist, n_entities = 8_000_000, 100_000
    events = spark.range(n_hist).select(
        F.when(F.col("id") < 1_000_000, F.lit(0))
        .otherwise(1 + F.abs(F.xxhash64("id")) % n_entities)
        .alias("ent"),
        (F.col("id") * 11).alias("order_us"),
        F.col("id").alias("okey"),
        (F.abs(F.xxhash64("id", F.lit(9))) % 100_000).alias("price_cents"),
    )
    t = n_hist * 11 // 2
    t0 = time.time()
    hist = scd2_history(events, "ent", "order_us", "okey")
    current = hist.filter(
        (F.col("valid_from") <= t)
        & (F.coalesce(F.col("valid_to"), F.lit(2**62)) > t)
    ).select("ent", "okey", F.col("valid_from").cast("long").alias("vf"))
    booked = (
        events.filter(F.col("order_us") <= t)
        .groupBy("ent")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price_cents").alias("spend"))
    )
    n_out = current.join(booked, "ent").count()
    print(
        f"scd2 asof 8M events, 100k entities + 1M-version hot entity: "
        f"{time.time() - t0:.2f}s rows={n_out}"
    )


if __name__ == "__main__":
    main()
