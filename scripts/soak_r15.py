"""Scale soaks for the round-15 operators (SCALE.md evidence).

Each soak scales ONE axis ~10x beyond the sf0.1 gate data and measures
wall time plus the invariant that makes the operator 100 TB-safe:

  1. N25 embedding_pca_power on a 10x-replicated embedding table —
     REPLICATION STABILITY: the Gram scales by exactly 10 and the
     max-|entry| rescale divides it back out, up to the divisor-first
     truncation (d' = 10·gm div 10⁶ ≠ 10·(gm div 10⁶) by ≤9), so every
     component must agree within a ≤0.1% drift of the ±10⁶ grid — the
     "corpus touched once, iteration independent of corpus size" proof
     — at ~linear scan cost.
  2. X33 source_vocab_overlap with the source axis widened 10x (200
     sources) — the pair relation grows with C(|sources|,2) per term,
     never with corpus size; measures exploded-pair row count against
     the bound and wall time.
  3. P21 corpus_dedup_yield on a 10x-replicated (dup-heavy) corpus —
     the hash order spreads replicas uniformly, so the cumulative dup
     rate must RISE monotonically and the LAST decile must equal the
     corpus's exact global duplicate rate; the plan must contain NO
     global Sort over the corpus (scan positions compose from
     per-shard ranks).
  4. A109 metric_shesd on a dense synthetic series (50 metrics x 20k
     hourly buckets = 1M grid rows) — per-metric windows ride the
     retention grid; wall time and the <=|metrics|-row output shape.
  5. D27 token_sort_groups on the 10x corpus — one hash-shuffle
     linearity (wall ~10x the base, group count invariant).

Usage: python scripts/soak_r15.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="soak-r15", shuffle_partitions=32)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # ---- 1. N25: replication invariance + linear scan ------------------
    from project_obsidian_core_spark.plans.datapipe_queries import (
        embedding_pca_power,
    )

    t0 = time.time()
    base = embedding_pca_power(spark, sf_dir).collect()
    t_base = time.time() - t0

    rep_dir = "/tmp/soak_r15_emb10x"
    spark.range(10).crossJoin(emb).drop("id").write.mode(
        "overwrite"
    ).parquet(f"{rep_dir}/embeddings.parquet")
    for t in ("documents",):
        docs.write.mode("overwrite").parquet(f"{rep_dir}/{t}.parquet")
    t0 = time.time()
    rep = embedding_pca_power(spark, rep_dir).collect()
    t_rep = time.time() - t0
    comp_drift = max(
        abs(a["component_scaled"] - b["component_scaled"])
        for a, b in zip(base, rep)
    )
    ray_drift = abs(base[0]["rayleigh_scaled"] - rep[0]["rayleigh_scaled"])
    print(
        f"N25 pca_power: base {t_base:.1f}s, 10x {t_rep:.1f}s "
        f"({t_rep / t_base:.2f}x wall), max component drift "
        f"{comp_drift} micro (bound 1000), rayleigh drift {ray_drift}"
    )
    assert comp_drift <= 1000, "PCA replication drift exceeds 0.1%"
    assert ray_drift <= max(10, abs(base[0]["rayleigh_scaled"]) // 100)

    # ---- 2. X33: source-axis widening ----------------------------------
    from project_obsidian_core_spark.plans.curation_queries import (
        source_vocab_overlap,
    )

    wide_dir = "/tmp/soak_r15_docs_wide"
    wide = (
        spark.range(10)
        .crossJoin(docs)
        .withColumn(
            "source", F.concat(F.col("source"), F.lit("_w"), F.col("id"))
        )
        .drop("id")
    )
    wide.write.mode("overwrite").parquet(f"{wide_dir}/documents.parquet")
    n_sources = 200
    t0 = time.time()
    out = source_vocab_overlap(spark, wide_dir).collect()
    t_wide = time.time() - t0
    bound = n_sources * (n_sources - 1) // 2
    print(
        f"X33 vocab_overlap: 200 sources in {t_wide:.1f}s, "
        f"{len(out)} pairs (bound C(200,2)={bound})"
    )
    assert len(out) <= bound

    # ---- 3. P21: dup-heavy curve + no global sort -----------------------
    from project_obsidian_core_spark.plans.pipeline_queries import (
        corpus_dedup_yield,
    )

    rep10 = (
        spark.range(10)
        .crossJoin(docs)
        .withColumn("doc_id", F.col("doc_id") + F.col("id") * 1_000_000)
        .drop("id")
    )
    dup_dir = "/tmp/soak_r15_docs10x"
    rep10.write.mode("overwrite").parquet(f"{dup_dir}/documents.parquet")
    t0 = time.time()
    curve = corpus_dedup_yield(spark, dup_dir).collect()
    t_curve = time.time() - t0
    tail = [r["dup_rate_ppm"] for r in curve[1:]]
    plan = corpus_dedup_yield(spark, dup_dir)._jdf.queryExecution()
    plan_str = plan.executedPlan().toString()
    # per-shard sorts are fine; a global Sort over the corpus is not —
    # corpus_shuffle's contract is "no Exchange rangepartitioning"
    assert "rangepartitioning" not in plan_str.lower(), "global sort leaked"
    rep_rows = rep10.count()
    n_distinct = rep10.select(F.md5("text")).distinct().count()
    want_last = (rep_rows - n_distinct) * 1_000_000 // rep_rows
    print(
        f"P21 dedup_yield: 10x corpus in {t_curve:.1f}s, "
        f"dup-rate curve {tail[0]}..{tail[-1]} ppm (monotone; last must "
        f"equal the global rate {want_last}), no range-partitioned exchange"
    )
    assert tail == sorted(tail), "cumulative dup rate must be monotone"
    assert tail[-1] == want_last, "final decile must equal the global dup rate"

    # ---- 4. A109: dense series -----------------------------------------
    from project_obsidian_core_spark.plans.metrics_queries import metric_shesd

    import project_obsidian_core_spark.plans.metrics_queries as mq

    dense = (
        spark.range(50)
        .select(F.concat(F.lit("m"), F.col("id")).alias("metric_name"))
        .crossJoin(
            spark.range(20_000).select(F.col("id").alias("x"))
        )
        .select(
            "metric_name",
            F.timestamp_micros(F.col("x") * 3_600_000_000).alias("time"),
            (
                F.pmod(F.col("x") * 37 + F.length("metric_name"), 1000)
                + F.when(F.pmod(F.col("x"), 997) == 0, 100_000).otherwise(0)
            ).alias("metric_value"),
        )
    )
    orig = mq.synthesize_metrics
    mq.synthesize_metrics = lambda *_a, **_k: dense
    try:
        t0 = time.time()
        rows = metric_shesd(spark, sf_dir).collect()
        t_dense = time.time() - t0
    finally:
        mq.synthesize_metrics = orig
    print(
        f"A109 shesd: 50x20k dense grid in {t_dense:.1f}s, "
        f"{len(rows)} metric rows, anomalies "
        f"{sorted(set(r['n_anomalies'] for r in rows))}"
    )
    assert len(rows) == 50

    # ---- 5. D27: hash-shuffle linearity ---------------------------------
    from project_obsidian_core_spark.datapipe.dedup import token_sort_groups

    t0 = time.time()
    n_base = token_sort_groups(docs).count()
    t_b = time.time() - t0
    t0 = time.time()
    n_rep = token_sort_groups(spark.read.parquet(f"{dup_dir}/documents.parquet")).count()
    t_r = time.time() - t0
    print(
        f"D27 token_sort: base {t_b:.1f}s/{n_base} groups, "
        f"10x {t_r:.1f}s/{n_rep} groups ({t_r / max(t_b, 0.001):.2f}x wall; "
        f"groups must be invariant under replication)"
    )
    assert n_rep == n_base

    print("SOAK R15 OK")


if __name__ == "__main__":
    main()
