"""Soak the extended-session staged operators' scale claims (the
Next-#6 measure-don't-assert pattern):

- A101 stationary iteration at 1000 states: the corpus is touched once;
  the 12 unrolled rounds run on a 1M-row matrix — measured wall time
  for the rounds alone, plus mass drift at that scale.
- A96 U-shape pair guard: the hottest-user pre-flight actually fires at
  the documented cap and the bound tracks T*P.

Usage: python scripts/soak_r13x.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.session import build_session

    spark = build_session(app_name="soak-r13x", shuffle_partitions=32)

    # ---- A101 at 1000 states ---------------------------------------------
    n_states = 1000
    t0 = time.time()
    # synthetic dense-ish chain: each state transitions to 1000 partners
    # (the full matrix) with count = 1 + (a+b) % 7
    matrix = (
        spark.range(n_states)
        .select(F.col("id").alias("a"))
        .crossJoin(spark.range(n_states).select(F.col("id").alias("b")))
        .select(
            "a", "b", (F.lit(1) + (F.col("a") + F.col("b")) % 7).alias("c")
        )
    )
    totals = matrix.groupBy("a").agg(F.sum("c").alias("r"))
    m = matrix.join(totals, "a").cache()
    m.count()
    build_s = time.time() - t0
    t1 = time.time()
    # run the iteration at TWO fixed-point scales: the gate's ppm and
    # the pico scale a 1000-state chain needs (at ppm, pi_a*c div r
    # truncates every term to ~0 and the mass collapses -- measured
    # below, the reason the scale must grow with the state count)
    results = {}
    for label, scale in (("ppm", 1_000_000), ("pico", 10**12)):
        pi = spark.range(n_states).select(
            F.col("id").alias("b"), F.lit(scale // n_states).alias("pi_s")
        )
        for _ in range(12):
            pi = (
                m.join(
                    F.broadcast(pi.withColumnRenamed("b", "a")),
                    "a",
                )
                .groupBy("b")
                .agg(F.sum(F.expr("pi_s * c div r")).alias("pi_s"))
            )
        mass = pi.agg(F.sum("pi_s")).first()[0] or 0
        results[label] = int(abs(mass - scale) * 1_000_000 // scale)
    iter_s = time.time() - t1
    print(json.dumps({
        "soak": "markov_1000_states",
        "matrix_rows": n_states * n_states,
        "rounds": 12,
        "build_s": round(build_s, 1),
        "iterate_2x12_rounds_s": round(iter_s, 1),
        "mass_drift_ppm_at_ppm_scale": results["ppm"],
        "mass_drift_ppm_at_pico_scale": results["pico"],
    }))
    m.unpersist()

    # ---- A96 guard at a synthetic hot user -------------------------------
    import tempfile

    from project_obsidian_core_spark.plans import behavior_queries as B

    t2 = time.time()
    n_ev = 40_000  # one user, half touches half purchases -> 4e8 pairs
    hot = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        (F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000).cast("timestamp").alias("_ts"),
    )
    hot = hot.select(
        "event_id",
        F.col("_ts").alias("ts"),
        F.lit(7).alias("user_id"),
        F.when(F.col("event_id") % 2 == 0, F.lit("click"))
        .otherwise(F.lit("purchase"))
        .alias("event_type"),
        (F.col("event_id") % 97).cast("double").alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    tmp = tempfile.mkdtemp(prefix="soak_ushape_")
    for t in ["events"]:
        hot.write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
    # reuse the real tables for everything else the loader touches
    fired = False
    try:
        B.events_attribution_ushape(spark, tmp)
    except RuntimeError as e:
        fired = "max_user_pairs" in str(e)
    guard_s = time.time() - t2
    print(json.dumps({
        "soak": "ushape_guard_hot_user",
        "events_one_user": n_ev,
        "worst_pairs": (n_ev // 2) ** 2,
        "cap": B._USHAPE_MAX_USER_PAIRS,
        "guard_fired": fired,
        "sec": round(guard_s, 1),
    }))
    assert fired, "guard must refuse the 4e8-pair hot user"
    return 0


if __name__ == "__main__":
    sys.exit(main())
