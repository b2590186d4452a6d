"""Soak the round-13 sketch/hash family at 10x the gate scale (the r12
verdict's Next-#6 pattern: measure the scale guards, don't assert them).

Three measurements, one JSON line each for SCALE.md:

- CMS (A88/T33): replay 10x the sf0.1 key stream (1M rows, ~333k
  distinct keys vs 4096 counters) — the regime where the sketch is
  ACTUALLY needed.  Measures: counter-table row count (must stay
  <= d*w by construction), max counter, hot-key overcount ppm, and the
  epsilon*N = e/w * N theoretical bound the observed overcount must
  respect (any violation = broken hashing).
- KMV (A87): 10x distinct cardinality (15k users) at k=64 — measured
  |est - truth| / truth vs the ~1/sqrt(k) = 12.5% theoretical RMS.
- dHash/aHash bands (M11/M13): 10x image corpus with 20% near-dup
  clones — p99/max 8-bit-prefix band population (the Hamming verify's
  candidate bound Sum b_i^2 / 2 rides on).

Usage: python scripts/soak_sketch.py [scale_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from project_obsidian_core_spark.datapipe.text import shared_hash60
    from project_obsidian_core_spark.plans.analytics_ext_queries import (
        _CMS_D,
        _CMS_W,
        _KMV_K,
        _KMV_RANGE,
        cms_probes,
        cms_report,
    )
    from project_obsidian_core_spark.session import build_session

    spark = build_session(app_name="soak-sketch", shuffle_partitions=32)

    # ---- CMS at 10x ------------------------------------------------------
    t0 = time.time()
    base = spark.range(n_rows).select(
        F.when(
            F.col("id") % 3 != 0,
            F.concat(F.lit("hot_"), (F.col("id") % 5).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold_"), F.col("id").cast("string")))
        .alias("key")
    )
    counters = (
        base.select(F.explode(cms_probes()).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counters.cache()
    n_counters = counters.count()
    max_counter = counters.agg(F.max("c")).first()[0]
    report = cms_report(base, counters).collect()
    hot = [r for r in report if r["key"].startswith("hot_")]
    worst_over_ppm = max(
        r["overcount"] * 1_000_000 // r["true_cnt"] for r in hot
    )
    # Markov bound regime marker: eps*N with eps = e/w
    eps_n = int(2.718281828 / _CMS_W * n_rows)
    cms_s = time.time() - t0
    print(json.dumps({
        "soak": "cms_10x",
        "rows": n_rows,
        "distinct_keys": int(n_rows / 3) + 5,
        "n_counters": n_counters,
        "counter_cap": _CMS_D * _CMS_W,
        "max_counter": max_counter,
        "hot_keys_flagged": len(hot),
        "worst_hot_overcount_ppm": worst_over_ppm,
        "eps_n_bound_rows": eps_n,
        "sec": round(cms_s, 1),
    }))
    assert n_counters <= _CMS_D * _CMS_W
    assert len(hot) == 5  # est >= truth: hot keys can never be missed
    counters.unpersist()

    # ---- KMV at 10x cardinality -----------------------------------------
    t1 = time.time()
    n_users = 15_000
    from pyspark.sql import Window

    users = spark.range(n_users).select(
        shared_hash60(F.concat(F.lit("kmv:"), F.col("id").cast("string")))
        .alias("h")
    ).distinct()
    ranked = users.withColumn(
        "rn", F.row_number().over(Window.orderBy("h"))
    )
    kth = ranked.filter(F.col("rn") == _KMV_K).first()["h"]
    est = int(float((_KMV_K - 1) * _KMV_RANGE) / float(kth))
    err_ppm = abs(est - n_users) * 1_000_000 // n_users
    kmv_s = time.time() - t1
    print(json.dumps({
        "soak": "kmv_10x",
        "true_distinct": n_users,
        "k": _KMV_K,
        "est": est,
        "abs_err_ppm": err_ppm,
        "rms_bound_ppm": int(1_000_000 / (_KMV_K ** 0.5)),
        "sec": round(kmv_s, 1),
    }))

    # ---- perceptual-hash band population at 10x -------------------------
    t2 = time.time()
    from project_obsidian_core_spark.datapipe.multimodal import (
        attach_media,
        image_ahash,
        image_dhash,
    )

    n_docs = 20_000  # ~10x the sf0.1 image count; 20% near-dup clones
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("soak text payload "),
            # 20% of docs reuse a shared text -> identical payloads (the
            # worst-case clone cluster a crawl snapshot produces)
            F.when(F.col("id") % 5 == 0, F.lit("CLONE"))
            .otherwise(F.col("id").cast("string")),
        ).alias("text"),
    )
    media = attach_media(docs)
    out = {}
    for name, hasher, col in (
        ("ahash", image_ahash, "ahash_hex"),
        ("dhash", image_dhash, "dhash_hex"),
    ):
        bands = (
            hasher(media)
            .select(F.substring(col, 1, 2).alias("band8"))
            .groupBy("band8")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        pops = sorted((r["n"] for r in bands), reverse=True)
        out[name] = {
            "n_bands": len(pops),
            "max_band": pops[0],
            "p99_band": pops[min(len(pops) - 1, max(0, int(len(pops) * 0.01)))],
            "pair_work": sum(p * p for p in pops) // 2,
        }
    hash_s = time.time() - t2
    print(json.dumps({
        "soak": "phash_bands_10x",
        "n_images": n_docs // 3 + 1,
        "clone_pct": 20,
        **{f"{k}_{m}": v for k, d in out.items() for m, v in d.items()},
        "sec": round(hash_s, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
