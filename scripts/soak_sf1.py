"""sf1-scale soak for the quadratic-prone operators (VERDICT r1 item 9).

Replicates the sf0.1 documents/embeddings 10x (distinct ids; each text
replica gets a per-replica suffix so replicas are NEAR-dups, which is the
hot-bucket worst case for LSH) and measures the operators whose cost can go
quadratic: MinHash-LSH candidates (uncapped vs max_bucket), blocked n-gram
Jaccard (uncapped vs max_block), transitive dedup clustering, and
LSH/IVF/brute ANN. Prints one JSON line per measurement; results land in
SCALE.md.

Usage: python scripts/soak_sf1.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.datapipe import bpe as B  # noqa: E402
from project_obsidian_core_spark.datapipe import clustering as KM  # noqa: E402
from project_obsidian_core_spark.datapipe import curation as C  # noqa: E402
from project_obsidian_core_spark.datapipe import dedup as D  # noqa: E402
from project_obsidian_core_spark.datapipe import similarity as S  # noqa: E402
from project_obsidian_core_spark.operators import temporal_joins as TJ  # noqa: E402
from project_obsidian_core_spark.plans.common import load  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SOAK_SF_DIR", "/root/testdata/sf0.1")


def replicate_docs(spark, replicas: int):
    docs = load(spark, SF_DIR, "documents")
    r = spark.range(replicas).withColumnRenamed("id", "rep")
    return docs.crossJoin(r).select(
        (F.col("doc_id") + F.col("rep") * F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" r"), F.col("rep")).alias("text"),
        "lang",
        "source",
    )


def replicate_embeddings(spark, replicas: int):
    emb = load(spark, SF_DIR, "embeddings")
    r = spark.range(replicas).withColumnRenamed("id", "rep")
    return emb.crossJoin(r).select(
        (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
        "embedding",
        "label",
    )


def timed(name, action, **extra):
    t0 = time.time()
    result = action()
    print(json.dumps({"op": name, "sec": round(time.time() - t0, 2), **extra, **(result or {})}), flush=True)


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = build_session(app_name="obsidian-spark-soak")

    docs = replicate_docs(spark, replicas).persist()
    n_docs = docs.count()
    emb = replicate_embeddings(spark, replicas).persist()
    n_vecs = emb.count()
    print(json.dumps({"op": "corpus", "docs": n_docs, "vecs": n_vecs, "replicas": replicas}), flush=True)

    # --- bucket/block statistics (same derivation as minhash_candidates) --
    b = (
        docs.select("doc_id", D.shingle_set().alias("sh"))
        .withColumn("hs", D.shingle_hashes("sh"))
        .withColumn("mh", D.minhash_signature("hs"))
        .withColumn("bands", D.band_keys("mh"))
        .select(F.posexplode("bands").alias("band_idx", "band_key"))
        .groupBy("band_idx", "band_key")
        .count()
    )
    stats = b.agg(
        F.max("count").alias("max_bucket"),
        F.expr("percentile_approx(count, 0.99)").alias("p99_bucket"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).collect()[0]
    print(json.dumps({"op": "lsh_bucket_stats", **stats.asDict()}), flush=True)

    def run_minhash(cap):
        out = D.minhash_candidates(docs, max_bucket=cap)
        n = out.filter(F.col("jaccard") >= 0.8).count()
        return {"pairs_j08": n, "max_bucket": cap}

    timed("minhash_uncapped", lambda: run_minhash(None))
    timed("minhash_capped", lambda: run_minhash(100))

    blk = docs.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    print(json.dumps({"op": "ngram_block_stats", "max_block": blk}), flush=True)

    def run_ngram(cap):
        return {"pairs": D.ngram_jaccard_pairs(docs, max_block=cap).filter(F.col("jaccard") >= 0.6).count(), "max_block": cap}

    timed("ngram_capped", lambda: run_ngram(600))
    if os.environ.get("SPARK_GRAFT_SOAK_UNCAPPED_NGRAM"):
        timed("ngram_uncapped", lambda: run_ngram(None))

    def run_clusters():
        pairs = D.minhash_candidates(docs, max_bucket=100).filter(F.col("jaccard") >= 0.8)
        cc = D.connected_components(pairs)
        return {"nodes": cc.count(), "clusters": cc.select("cluster").distinct().count()}

    timed("dedup_clusters", run_clusters)

    queries = emb.limit(5)
    timed("knn_brute", lambda: {"rows": S.brute_force_topk(emb, queries, k=10).count()})
    timed("knn_lsh", lambda: {"rows": S.lsh_topk(emb, queries, k=10).count()})

    bucket_stats = (
        emb.select(S.lsh_bucket("embedding").alias("bkt"))
        .groupBy("bkt")
        .count()
        .agg(F.max("count").alias("max_ann_bucket"), F.count(F.lit(1)).alias("n_ann_buckets"))
        .collect()[0]
    )
    print(json.dumps({"op": "ann_bucket_stats", **bucket_stats.asDict()}), flush=True)

    # --- round-2 curation/clustering operators -------------------------------

    def run_decon():
        out = C.decontaminate(docs)
        r = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("contaminated").cast("long")).alias("contaminated"),
        ).collect()[0]
        return r.asDict()

    timed("corpus_decontaminate", run_decon)

    def run_rep():
        out = C.repetition_stats(docs)
        r = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col("repetitive").cast("long")).alias("repetitive"),
        ).collect()[0]
        return r.asDict()

    timed("text_repetition_stats", run_rep)

    def run_tile():
        out = C.tile_dedup(docs)
        r = out.agg(
            F.sum("n_tiles").alias("tiles"), F.sum("n_kept").alias("kept")
        ).collect()[0]
        return {
            "tiles": r["tiles"],
            "kept": r["kept"],
            "kept_frac": round(r["kept"] / r["tiles"], 4),
        }

    timed("corpus_tile_dedup", run_tile)

    timed(
        "vocab_build",
        lambda: {"terms": C.build_vocab(docs).count()},
    )

    timed(
        "stratified_sample",
        lambda: {"rows": C.stratified_sample(docs, target=500.0).count()},
    )

    def run_kmeans():
        out = KM.embedding_kmeans(emb).groupBy("cluster").count()
        r = out.agg(
            F.count(F.lit(1)).alias("clusters"), F.max("count").alias("max_cluster")
        ).collect()[0]
        return r.asDict()

    timed("embedding_kmeans", run_kmeans)

    # --- temporal joins + BPE at 10× ----------------------------------------
    ev = load(spark, SF_DIR, "events")
    r = spark.range(replicas).withColumnRenamed("id", "rep")
    ev10 = ev.crossJoin(r).select(
        (F.col("event_id") + F.col("rep") * F.lit(10_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * F.lit(10_000)).alias("user_id"),
        "event_type",
        "value",
    ).persist()
    n_ev = ev10.count()
    print(json.dumps({"op": "events_corpus", "events": n_ev}), flush=True)

    def run_asof():
        left = ev10.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        right = (
            ev10.filter(F.col("event_type") == "purchase")
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias("v"))
        )
        out = TJ.asof_join(left, right, on="user_id", value_cols=("v",))
        return {"rows": out.count()}

    timed("events_asof_join", run_asof)

    def run_range():
        anchors = ev10.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        probes = ev10.select("user_id", "ts", "value")
        return {
            "pairs": TJ.range_join(
                anchors, probes, on="user_id", span_us=3_600_000_000
            ).count()
        }

    timed("events_range_join", run_range)

    timed(
        "bpe_merges",
        lambda: {"merges": B.learn_merges(docs).count()},
    )


if __name__ == "__main__":
    main()
