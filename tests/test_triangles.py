"""Degree-ordered triangle enumeration: exactness vs brute force, hub
safety, and each-triangle-once semantics."""

from __future__ import annotations

import itertools
import random

from project_obsidian_core_spark.datapipe.similarity import triangle_list


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a long, b long"
    ).distinct()


def _brute(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = sorted({n for e in es for n in e})
    return sorted(
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def test_clique_and_star(spark):
    k5 = list(itertools.combinations(range(5), 2))
    assert len(triangle_list(_edges_df(spark, k5)).collect()) == 10
    star = [(0, i) for i in range(1, 30)]  # hub: many wedges, no triangles
    assert triangle_list(_edges_df(spark, star)).count() == 0


def test_matches_brute_force_on_random_graph(spark):
    rng = random.Random(8)
    pairs = {
        tuple(sorted(rng.sample(range(40), 2))) for _ in range(220)
    }
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in triangle_list(_edges_df(spark, pairs)).collect()
    )
    assert got == _brute(pairs)
    # exactly once each: no duplicate triples
    assert len(got) == len(set(got))
