"""G4 deterministic label propagation — known graphs and tie rules."""

from __future__ import annotations

from project_obsidian_core_spark.datapipe.similarity import label_propagation


def _lpa(spark, edges, rounds):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {r.node: r.lbl for r in label_propagation(df, rounds=rounds).collect()}


def test_two_cliques_with_bridge_find_two_communities(spark):
    # cliques {0,1,2,3} and {10,11,12,13} joined by one bridge 3-10
    clique = lambda ns: [(x, y) for x in ns for y in ns if x < y]  # noqa: E731
    edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    got = _lpa(spark, edges, rounds=3)
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[11] == got[12] == got[13] == 10
    # communities are distinct
    assert got[0] != got[11]


def test_star_adopts_hub_label(spark):
    edges = [(0, i) for i in range(1, 6)]
    got = _lpa(spark, edges, rounds=1)
    # every leaf sees only the hub (label 0); the hub sees five distinct
    # leaf labels -> tie broken to the smallest (1)
    assert all(got[i] == 0 for i in range(1, 6))
    assert got[0] == 1


def test_tie_breaks_to_smallest_label(spark):
    # node 2 has neighbors 1 and 3 (one vote each) -> adopts 1
    edges = [(1, 2), (2, 3)]
    got = _lpa(spark, edges, rounds=1)
    assert got[2] == 1


def test_fixed_rounds_are_reproducible(spark):
    import random

    rng = random.Random(7)
    edges = list({(min(a, b), max(a, b)) for a, b in (
        (rng.randrange(30), rng.randrange(30)) for _ in range(80)
    ) if a != b})
    a = _lpa(spark, edges, rounds=3)
    b = _lpa(spark, edges, rounds=3)
    assert a == b
