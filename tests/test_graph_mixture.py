"""Integer PageRank + mixture-plan operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import curation as C
from project_obsidian_core_spark.datapipe.similarity import (
    PR_SCALE,
    pagerank_int,
)


def test_pagerank_star_graph_centers_mass(spark):
    """On a star graph the hub must outrank every leaf."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "a long, b long"
    )
    scores = {r.node: r.score for r in pagerank_int(edges, iters=3).collect()}
    hub = scores[0]
    for leaf in range(1, 6):
        assert hub > scores[leaf]
    leaf_scores = {scores[i] for i in range(1, 6)}
    assert len(leaf_scores) == 1  # symmetric leaves tie exactly


def test_pagerank_mass_approximately_conserved(spark):
    """Total score stays within integer-truncation slack of SCALE."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], "a long, b long"
    )
    total = (
        pagerank_int(edges, iters=4).agg(F.sum("score").alias("s")).first().s
    )
    # each node truncates at most DAMP_DEN units per round
    assert abs(total - PR_SCALE) < 4 * 100 * 4


def test_pagerank_regular_graph_is_uniform(spark):
    """On a cycle (2-regular), scores stay exactly uniform every round."""
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "a long, b long"
    )
    scores = {r.node: r.score for r in pagerank_int(edges, iters=2).collect()}
    assert len(set(scores.values())) == 1


def test_mixture_plan_never_upsamples_and_binds_scarcest(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (10 if i % 3 else 1) + "end", "en", f"s{i % 3}")
         for i in range(30)],
        "doc_id int, text string, lang string, source string",
    )
    plan = {r.source: r for r in C.mixture_plan(docs).collect()}
    assert len(plan) == 3
    for r in plan.values():
        assert 0 < r.rate_ppm <= 1_000_000
        assert r.keep_tokens <= r.avail_tokens
    # the scarcest source binds: highest keep rate, kept (nearly) whole —
    # within one token of truncation slack at these tiny counts
    scarcest = min(plan.values(), key=lambda r: r.avail_tokens)
    assert scarcest.rate_ppm == max(r.rate_ppm for r in plan.values())
    assert scarcest.keep_tokens >= scarcest.avail_tokens - 1
    # kept tokens realize the uniform target: all equal (within int slack)
    keeps = [r.keep_tokens for r in plan.values()]
    assert max(keeps) - min(keeps) <= 1
