"""Scale soaks for the round-16 operators (SCALE.md evidence).

Each soak scales ONE axis ~10x beyond the sf0.1 gate data and measures
wall time plus the invariant that makes the operator 100 TB-safe:

  1. X34 text_extract_content on a 10x-replicated corpus — one narrow
     in-row projection: wall must scale ~linearly and the per-source
     removed_ppm must be INVARIANT under replication (same docs, same
     shares; only the counts scale by exactly 10).
  2. N27 embedding_angle_probe on a 10x-replicated embedding table —
     the pair space is BOUNDED by the 256 hash buckets whatever the
     corpus: total pair count must stay <= 256 and wall stays
     scan-dominated (the replicas shift which ids are min/max per
     bucket, so the histogram may differ — the bound is the invariant,
     not the values).
  3. P22 corpus_mixture_dedup on the 10x-replicated corpus — every
     replica is an exact dup (same text, new doc_id), so n_raw scales
     by exactly 10 while n_uniq is INVARIANT, and the dedup shares must
     equal the base run's (the operator's whole point: raw shares move,
     unique shares don't).
  4. A114 orders_gini_segment with the value axis replicated 10x
     (each order appearing 10x) — the grid aggregate absorbs the
     replication into counts: wall ~linear, and gini must drift only
     by the O(1/n) (n+1)-term (<= 1000 ppm observed bound).
  5. P23 corpus_compaction_plan on the 10x corpus — the packing fold
     rides the <=64-row shard relation whatever the corpus: wall is
     one scan + one aggregate, output stays exactly 64 rows, and every
     merge group's final fill is <= the 2x-fair-share cap (verified
     from the output itself).

Usage: python scripts/soak_r16.py [sf_dir]
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
    spark = build_session(app_name="soak-r16", shuffle_partitions=32)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()

    rep_dir = "/tmp/soak_r16_10x"
    (
        spark.range(10)
        .crossJoin(docs)
        .withColumn("doc_id", F.col("doc_id") + F.col("id") * 10_000_000)
        .drop("id")
        .write.mode("overwrite")
        .parquet(f"{rep_dir}/documents.parquet")
    )
    (
        spark.range(10)
        .crossJoin(emb)
        .withColumn("vec_id", F.col("vec_id") + F.col("id") * 10_000_000)
        .drop("id")
        .write.mode("overwrite")
        .parquet(f"{rep_dir}/embeddings.parquet")
    )

    # ---- 1. X34: linear scan + share invariance -------------------------
    from project_obsidian_core_spark.plans.curation_queries import (
        text_extract_content,
    )

    t0 = time.time()
    base = {r["source"]: r.asDict() for r in text_extract_content(spark, sf_dir).collect()}
    t_base = time.time() - t0
    t0 = time.time()
    rep = {r["source"]: r.asDict() for r in text_extract_content(spark, rep_dir).collect()}
    t_rep = time.time() - t0
    for s in base:
        assert rep[s]["n_docs"] == 10 * base[s]["n_docs"]
        assert rep[s]["raw_chars"] == 10 * base[s]["raw_chars"]
        assert rep[s]["removed_ppm"] == base[s]["removed_ppm"], s
    print(
        f"X34 extract: base {t_base:.1f}s, 10x {t_rep:.1f}s "
        f"({t_rep / t_base:.2f}x wall), removed_ppm invariant over "
        f"{len(base)} sources"
    )

    # ---- 2. N27: bounded pair space -------------------------------------
    from project_obsidian_core_spark.plans.datapipe_queries import (
        _ANGLE_BUCKETS,
        embedding_angle_probe,
    )

    t0 = time.time()
    out = embedding_angle_probe(spark, rep_dir).collect()
    t_ang = time.time() - t0
    n_pairs = sum(r["n_pairs"] for r in out)
    print(
        f"N27 angle_probe: 10x embeddings in {t_ang:.1f}s, "
        f"{n_pairs} pairs (bound {_ANGLE_BUCKETS})"
    )
    assert n_pairs <= _ANGLE_BUCKETS

    # ---- 3. P22: raw shares move, unique shares don't -------------------
    from project_obsidian_core_spark.plans.pipeline_queries import (
        corpus_mixture_dedup,
    )

    t0 = time.time()
    mb = {r["source"]: r.asDict() for r in corpus_mixture_dedup(spark, sf_dir).collect()}
    t_mb = time.time() - t0
    t0 = time.time()
    mr = {r["source"]: r.asDict() for r in corpus_mixture_dedup(spark, rep_dir).collect()}
    t_mr = time.time() - t0
    for s in mb:
        assert mr[s]["n_raw"] == 10 * mb[s]["n_raw"]
        assert mr[s]["n_uniq"] == mb[s]["n_uniq"], s
        assert mr[s]["dedup_share_ppm"] == mb[s]["dedup_share_ppm"], s
    print(
        f"P22 mixture_dedup: base {t_mb:.1f}s, 10x {t_mr:.1f}s "
        f"({t_mr / t_mb:.2f}x wall), n_uniq + dedup shares invariant"
    )

    # ---- 4. A114: replication via the grid ------------------------------
    from project_obsidian_core_spark.plans.relational_queries import (
        gini_report,
        orders_gini_segment,
    )
    from project_obsidian_core_spark.plans.common import cents

    t0 = time.time()
    gb = {r["segment"]: r.asDict() for r in orders_gini_segment(spark, sf_dir).collect()}
    t_gb = time.time() - t0
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    seg10 = (
        spark.range(10)
        .crossJoin(
            orders.join(
                F.broadcast(cust.select("c_custkey", "c_mktsegment")),
                orders.o_custkey == F.col("c_custkey"),
            ).select(
                F.col("c_mktsegment").alias("segment"),
                cents("o_totalprice").alias("v"),
            )
        )
        .drop("id")
    )
    t0 = time.time()
    g10 = {
        r["segment"]: r.asDict()
        for r in gini_report(
            seg10.groupBy("segment", "v").agg(F.count(F.lit(1)).alias("c"))
        ).collect()
    }
    t_g10 = time.time() - t0
    drift = max(abs(g10[s]["gini_ppm"] - gb[s]["gini_ppm"]) for s in gb)
    print(
        f"A114 gini: base {t_gb:.1f}s, 10x {t_g10:.1f}s "
        f"({t_g10 / t_gb:.2f}x wall), max gini drift {drift} ppm "
        f"(O(1/n) bound 1000)"
    )
    assert drift <= 1000

    # ---- 5. P23: bounded fold + cap respected ---------------------------
    from project_obsidian_core_spark.plans.pipeline_queries import (
        _COMPACT_SHARDS,
        corpus_compaction_plan,
    )

    t0 = time.time()
    plan = corpus_compaction_plan(spark, rep_dir).collect()
    t_plan = time.time() - t0
    assert len(plan) == _COMPACT_SHARDS
    total = sum(r["bytes_"] for r in plan)
    cap = (2 * total) // _COMPACT_SHARDS
    fills: dict[int, int] = {}
    for r in plan:
        fills[r["merge_group"]] = fills.get(r["merge_group"], 0) + r["bytes_"]
    singles = sum(1 for g, f in fills.items() if f > cap)
    oversized = sum(1 for r in plan if r["bytes_"] > cap)
    assert singles == oversized, "only oversized shards may exceed the cap"
    print(
        f"P23 compaction: 10x corpus in {t_plan:.1f}s, "
        f"{len(plan)} shards -> {len(fills)} merge groups, cap {cap}, "
        f"{oversized} oversized pass-throughs"
    )

    # ---- 6. X35: template set invariant under replication ---------------
    from project_obsidian_core_spark.plans.curation_queries import (
        text_template_lines,
    )

    tb = {r["source"]: r.asDict() for r in text_template_lines(spark, sf_dir).collect()}
    t0 = time.time()
    tr = {r["source"]: r.asDict() for r in text_template_lines(spark, rep_dir).collect()}
    t_tmpl = time.time() - t0
    for s in tb:
        # nav/footer stay corpus-wide; replicated paragraph lines reach
        # only 10 docs of 10n (< the 50% threshold), so the TEMPLATE
        # line set is invariant while instances scale by 10
        assert tr[s]["template_lines"] == tb[s]["template_lines"], s
        assert tr[s]["line_instances"] == 10 * tb[s]["line_instances"]
    print(
        f"X35 template_lines: 10x corpus in {t_tmpl:.1f}s, template set "
        f"invariant across {len(tb)} sources"
    )

    # ---- 7. D28: histogram maps s -> 10s exactly under replication ------
    from project_obsidian_core_spark.plans.datapipe_queries import (
        dedup_group_histogram,
    )

    hb = {r["group_size"]: r["n_groups"] for r in dedup_group_histogram(spark, sf_dir).collect()}
    t0 = time.time()
    hr = {r["group_size"]: r["n_groups"] for r in dedup_group_histogram(spark, rep_dir).collect()}
    t_hist = time.time() - t0
    assert hr == {10 * s: n for s, n in hb.items()}, (hb, hr)
    print(
        f"D28 group_histogram: 10x corpus in {t_hist:.1f}s, histogram "
        f"maps s->10s exactly ({hb} -> {hr})"
    )

    print(f"SOAK r16 OK (docs base {n_docs})")
    spark.stop()


if __name__ == "__main__":
    main()
