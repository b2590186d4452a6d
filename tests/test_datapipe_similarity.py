"""Similarity-search semantics: exactness of brute force, recall of ANN tiers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import similarity as S
from project_obsidian_core_spark.plans.common import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5)


def _pairs(df):
    return {(r["q_id"], r["cand_id"]) for r in df.collect()}


def test_brute_force_is_exact_topk(emb, queries, spark):
    got = S.brute_force_topk(emb, queries, k=5).collect()
    assert len(got) == 25
    for r in got:
        assert r["q_id"] != r["cand_id"]
        assert -1.0 - 1e-12 <= r["cos_sim"] <= 1.0 + 1e-12
    # ranks are 1..5 per query, descending similarity
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["cos_sim"]))
    for rows in by_q.values():
        rows.sort()
        assert [r for r, _ in rows] == [1, 2, 3, 4, 5]
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True)


def test_lsh_subset_of_bucket_and_reasonable_recall(emb, queries):
    brute = _pairs(S.brute_force_topk(emb, queries, k=5))
    lsh = _pairs(S.lsh_topk(emb, queries, k=5))
    # ANN results are a subset of the same-bucket candidates; recall vs
    # exact top-5 should be well above random (1/16 of corpus per bucket)
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_ivf_probe_recall_beats_single_cell(emb, queries):
    brute = _pairs(S.brute_force_topk(emb, queries, k=5))
    ivf = _pairs(S.ivf_topk(emb, queries, k=5, nprobe=2))
    recall2 = len(brute & ivf) / len(brute)
    ivf1 = _pairs(S.ivf_topk(emb, queries, k=5, nprobe=1))
    recall1 = len(brute & ivf1) / len(brute)
    assert recall2 >= recall1      # more probes never hurt recall
    assert recall2 >= 0.3, f"IVF recall collapsed: {recall2}"


def test_bucket_expression_is_stable(emb, spark):
    b = emb.withColumn("bucket", S.lsh_bucket("embedding"))
    stats = b.groupBy("bucket").count().collect()
    assert all(0 <= r["bucket"] < 2 ** S.LSH_BITS for r in stats)
    assert len(stats) > 1  # hyperplanes actually split the corpus


def test_ivf_kmeans_recall_and_cell_discipline(emb, queries):
    brute = _pairs(S.brute_force_topk(emb, queries, k=5))
    got = S.ivf_kmeans_topk(emb, queries, k=5, nprobe=2)
    pairs = _pairs(got)
    recall = len(brute & pairs) / len(brute)
    assert recall >= 0.3, f"IVF-kmeans recall collapsed: {recall}"
    # scores are the same exact cosine as brute force for shared pairs
    bsims = {
        (r["q_id"], r["cand_id"]): r["cos_sim"]
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    for r in got.collect():
        key = (r["q_id"], r["cand_id"])
        if key in bsims:
            assert r["cos_sim"] == bsims[key]  # bit-identical fixed-order fold


def test_knn_graph_degree_invariants(emb, spark):
    sub = emb.filter(F.col("vec_id") < 60)
    hist = {r["degree"]: r["n_nodes"] for r in S.knn_graph_degrees(sub, k=3).collect()}
    # every node appears once; min degree >= k (out-edges always exist)
    assert sum(hist.values()) == 60
    assert min(hist) >= 3


def test_lsh_bits_knob_shrinks_buckets_and_keeps_topk_shape(emb, queries):
    """The round-6 geometry knob: more bits -> strictly finer buckets;
    results at any bits are well-formed top-k subsets of brute force's
    candidate space."""
    s4 = S.lsh_bucket_stats(emb, bits=4).agg(F.max("n")).first()[0]
    s8 = S.lsh_bucket_stats(emb, bits=8).agg(F.max("n")).first()[0]
    assert s8 <= s4
    got = S.lsh_topk(emb, queries, k=5, bits=8).collect()
    for r in got:
        assert 1 <= r["rank"] <= 5 and r["q_id"] != r["cand_id"]


def test_lsh_max_bucket_guard_bounds_candidates(emb, queries):
    """With a tiny max_bucket cap every surviving candidate's bucket is
    within the cap — the silent-quadratic guard in action."""
    capped = S.lsh_topk(emb, queries, k=5, max_bucket=50)
    eb = emb.withColumn("bucket", S.lsh_bucket("embedding"))
    sizes = {r["bucket"]: r["n"] for r in S.lsh_bucket_stats(emb).collect()}
    cand_buckets = {
        r["bucket"]
        for r in eb.join(
            capped.select(F.col("cand_id").alias("vec_id")).distinct(), "vec_id"
        ).collect()
    }
    assert all(sizes[b] <= 50 for b in cand_buckets)


def test_ivf_kmeans_k_cells_knob(emb, queries):
    """k_cells threads through quantizer training, residency, and probe
    arithmetic: results stay well-formed and recall does not collapse."""
    got = S.ivf_kmeans_topk(emb, queries, k=5, nprobe=2, k_cells=4).collect()
    by_q = {}
    for r in got:
        assert r["q_id"] != r["cand_id"]
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    brute = _pairs(S.brute_force_topk(emb, queries, k=5))
    recall = len(brute & _pairs(S.ivf_kmeans_topk(emb, queries, k=5, nprobe=2, k_cells=4))) / len(brute)
    assert recall >= 0.3, f"k_cells=4 recall collapsed: {recall}"


def test_suggest_lsh_bits_pins_soak_rule():
    """The SCALE.md sizing rule, callable: 200k vectors (the round-6 soak
    geometry) suggest bits=8; 10^9 vectors suggest 20; tiny corpora floor
    at 1."""
    assert S.suggest_lsh_bits(200_000) == 8
    assert S.suggest_lsh_bits(1_000_000_000) == 20
    assert S.suggest_lsh_bits(10) == 1
    assert S.suggest_lsh_bits(200_000, target_bucket=50) == 12
    with pytest.raises(ValueError):
        S.suggest_lsh_bits(0)


def test_lsh_topk_check_capacity_preflight(emb, queries):
    """check_capacity is skew-aware: the decision uses the MEASURED
    hottest bucket (> CAPACITY_SLACK * TARGET_BUCKET rejects), not just
    the corpus row count. The sf0.001 embeddings corpus is ~600 vectors
    (max bucket far below the 4,000 threshold) so bits=4 passes; a 16x
    replication squeezed into 2 buckets puts >=4,800 in the hottest one
    and must fail loudly, naming a bits recommendation."""
    # adequately sized: no raise, results well-formed
    got = S.lsh_topk(emb, queries, k=3, bits=4, check_capacity=True).collect()
    assert len(got) > 0
    # skewed/undersized: 16x ~600 vectors over 2^1 buckets -> hottest
    # bucket >= 9600/2 = 4800 > CAPACITY_SLACK * TARGET_BUCKET = 4000
    big = emb.crossJoin(
        F.broadcast(emb.sparkSession.range(16).select(F.col("id").alias("_rep")))
    ).withColumn("vec_id", F.col("vec_id") * 16 + F.col("_rep")).drop("_rep")
    with pytest.raises(ValueError, match="recommends bits"):
        S.lsh_topk(big, queries, k=3, bits=1, check_capacity=True)
    # well-spread above the nominal count rule still passes: same rows at
    # bits=4 spread the population ~16 ways (hottest well under 4,000)
    # even though suggest_lsh_bits(9600) = 4 would equal, not exceed, it.
    got = S.lsh_topk(big, queries, k=3, bits=4, check_capacity=True).collect()
    assert len(got) > 0


def test_ivf_incremental_frozen_quantizer_searches_new_batch(emb, queries):
    """train=base freezes the quantizer on the base prefix; the new batch
    (vec_id >= 400) is still assigned residency and searchable, and the
    training subset genuinely drives the centroids."""
    from project_obsidian_core_spark.datapipe import clustering as KM

    base = emb.filter(F.col("vec_id") < 400)
    got = S.ivf_kmeans_topk(emb, queries, k=10, train=base).collect()
    by_q = {}
    for r in got:
        assert r["q_id"] != r["cand_id"]
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # the frozen index covers the union: new-batch vectors are candidates
    assert any(r["cand_id"] >= 400 for r in got)
    # the training subset actually matters: base-trained centroids differ
    # from full-corpus centroids
    cb = sorted(map(tuple, KM.kmeans_centroids(base).collect()))
    cf = sorted(map(tuple, KM.kmeans_centroids(emb).collect()))
    assert cb != cf
