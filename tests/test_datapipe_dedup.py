"""Dedup operator semantics on planted-duplicate fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import dedup as D

BASE = (
    "spark query engine shuffles data across the cluster while the optimizer "
    "prunes partitions and pushes filters down to the columnar scan layer"
)
NEAR = BASE.replace("columnar scan layer", "columnar file scan layer")  # 1-word insert
FAR = "completely different content about cats dogs birds and fish in the garden pond"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "s1"),
        (2, BASE, "s1"),       # exact dup of 1
        (3, NEAR, "s1"),       # near dup of 1
        (4, FAR, "s1"),
        (5, "tiny", "s2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_exact_groups(docs):
    g = {r["keeper_doc_id"]: r["n_docs"] for r in D.exact_groups(docs).collect()}
    assert g[1] == 2           # docs 1+2 collapse, keeper is min(doc_id)
    assert g[3] == 1 and g[4] == 1


def test_minhash_finds_near_dup_not_far(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.minhash_candidates(docs).collect()
    }
    assert pairs[(1, 2)] == 1.0          # exact dup -> jaccard 1
    assert pairs[(1, 3)] > 0.7           # near dup found via banding
    assert (1, 4) not in pairs           # unrelated text never collides
    assert (2, 3) in pairs               # transitive near dup


def test_minhash_max_bucket_drops_boilerplate_buckets(spark):
    # 6 identical boilerplate docs share every band -> bucket size 6 in all
    # 4 bands -> 15 quadratic pairs; the cap drops those buckets while the
    # small near-dup pair (bucket size 2) survives.
    rows = [(i, BASE, "s1") for i in range(1, 7)]
    rows += [(10, FAR, "s1"), (11, FAR + " pond", "s1")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    uncapped = {(r["doc_a"], r["doc_b"]) for r in D.minhash_candidates(docs).collect()}
    assert sum(1 for a, b in uncapped if a <= 6 and b <= 6) == 15
    assert (10, 11) in uncapped

    capped = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_candidates(docs, max_bucket=5).collect()
    }
    assert capped == {(10, 11)}


def test_simhash_near_dup_is_close_in_hamming(docs):
    sig = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    assert sig[1] == sig[2]
    ham_near = bin(sig[1] ^ sig[3]).count("1")
    ham_far = bin(sig[1] ^ sig[4]).count("1")
    assert ham_near < ham_far
    assert 0 <= sig[1] < 2 ** D.SIMHASH_BITS


def test_ngram_jaccard_blocking(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] > 0.8
    assert pairs[(1, 4)] < 0.2
    # doc 5 is in another block: no cross-block pairs emitted
    assert not any(5 in p for p in pairs)

    # the hashed-gram scale twin produces IDENTICAL scores (xxhash64
    # collisions aside — none on any real corpus this size)
    hashed = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, hashed_grams=True).collect()
    }
    assert hashed == pairs


def test_embedding_cosine_pairs(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.9, 0.1, 0.0], 0),   # close to 1
            (3, [0.0, 1.0, 0.0], 0),   # orthogonal to 1
            (4, [1.0, 0.0, 0.0], 1),   # other block
        ],
        ["vec_id", "embedding", "label"],
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in D.embedding_cosine_pairs(emb).collect()
    }
    assert pairs[(1, 2)] > 0.99
    assert abs(pairs[(1, 3)]) < 1e-9
    assert not any(4 in p for p in pairs)  # blocked by label


def test_connected_components_transitive_clusters(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 8)], ["doc_a", "doc_b"]
    )
    got = {r["doc_id"]: r["cluster"] for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8, 9: 8}


def test_connected_components_long_chain_converges(spark):
    # path graph 0-1-2-...-7: worst-case diameter for min-label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], ["doc_a", "doc_b"]
    )
    got = {r["doc_id"]: r["cluster"] for r in D.connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(8)}


def test_connected_components_ls_matches_propagation(spark):
    # star + chain + isolated self-pair + duplicate/reversed edges
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 8), (8, 9), (7, 7), (3, 1)],
        ["doc_a", "doc_b"],
    )
    want = {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 8, 9: 8}
    got = {r["doc_id"]: r["cluster"] for r in D.connected_components_ls(pairs).collect()}
    assert got == want


def test_connected_components_ls_long_chain_few_rounds(spark):
    # path graph 0-..-63: diameter 63 would need 63 propagation rounds;
    # large-star/small-star must finish inside the default max_iter=30
    # (it needs O(log^2 n) ~ a handful here)
    pairs = spark.createDataFrame([(i, i + 1) for i in range(63)], ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["cluster"] for r in D.connected_components_ls(pairs).collect()}
    assert got == {i: 0 for i in range(64)}


def test_connected_components_ls_random_graph_equivalence(spark):
    import random

    rng = random.Random(7)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    a = {r["doc_id"]: r["cluster"] for r in D.connected_components(pairs).collect()}
    b = {r["doc_id"]: r["cluster"] for r in D.connected_components_ls(pairs).collect()}
    assert a == b


def test_simhash_pairs_radius_and_cap(spark):
    from project_obsidian_core_spark.datapipe import dedup as D
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of 1
        (3, "completely different words entirely unrelated content here now"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_pairs(df).collect()
    }
    assert (1, 2) in pairs  # one-token swap stays within the radius
    # every reported pair respects the radius and canonical ordering
    for (a, b), h in pairs.items():
        assert a < b and h <= D.SIMHASH_HAMMING_MAX
    # max_bucket=1 drops every bucket with >1 member -> no pairs at all
    assert D.simhash_pairs(df, max_bucket=1).count() == 0


def test_canonical_keeper_is_max_quality_member(spark, sf_dir):
    from project_obsidian_core_spark.datapipe.text import with_quality_score
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.datapipe_queries import (
        dedup_canonical,
        dedup_clusters,
    )

    members = {}
    for r in dedup_clusters(spark, sf_dir).collect():
        members.setdefault(r["cluster"], []).append(r["doc_id"])
    q = {
        r["doc_id"]: r["quality_score"]
        for r in with_quality_score(load(spark, sf_dir, "documents")).collect()
    }
    canon = {r["cluster"]: r for r in dedup_canonical(spark, sf_dir).collect()}
    assert set(canon) == set(members)
    for cluster, docs in members.items():
        # expected keeper: max quality, ties to the lower doc_id — via the
        # same integer key encoding the operator uses
        best = min(docs, key=lambda d: (int((1.0 - q[d]) * 1e9), d))
        assert canon[cluster]["keeper_doc_id"] == best
        assert canon[cluster]["n_members"] == len(docs)


def test_lsh_recall_guard_raises_past_max_eval(spark):
    """The recall audit is operator-bounded, not caller-bounded: an
    unsampled corpus above max_eval raises instead of broadcasting into
    an all-pairs quadratic (same raising-guard contract as max_bucket /
    max_block)."""
    docs = spark.range(12).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique doc body number "), F.col("id")).alias("text"),
    )
    with pytest.raises(ValueError, match="max_eval"):
        D.lsh_recall(docs, max_eval=10)
    # at or under the cap the audit runs and returns its one exact row
    row = D.lsh_recall(docs, max_eval=12).collect()[0]
    assert row["n_truth"] == row["n_found"] + row["n_missed"]
