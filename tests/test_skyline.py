"""Pareto frontier semantics (operators/skyline.py) pinned against a
brute-force dominance check, including tie handling."""

from __future__ import annotations

from itertools import product

from hypothesis import given, settings
from hypothesis import strategies as st

from project_obsidian_core_spark.operators.skyline import pareto_frontier_2d


def _brute(rows):
    """(id, price, size) rows on the frontier by the dominance definition."""
    out = []
    for a in rows:
        dominated = any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in rows
        )
        if not dominated:
            out.append(a[0])
    return sorted(out)


def test_frontier_matches_brute_force(spark):
    rows = [
        (1, 100, 5),   # frontier (cheapest)
        (2, 100, 9),   # frontier (same price, bigger -> dominates 1? yes!)
        (3, 200, 9),   # dominated by 2 (pricier, same size)
        (4, 200, 12),  # frontier
        (5, 300, 12),  # dominated by 4
        (6, 300, 20),  # frontier
    ]
    df = spark.createDataFrame(rows, "id long, price long, size long")
    got = sorted(
        r.id for r in pareto_frontier_2d(df, [], "price", "size").collect()
    )
    assert got == _brute(rows) == [2, 4, 6]


def test_exact_ties_are_mutually_kept(spark):
    rows = [(1, 100, 5), (2, 100, 5), (3, 400, 5)]
    df = spark.createDataFrame(rows, "id long, price long, size long")
    got = sorted(
        r.id for r in pareto_frontier_2d(df, [], "price", "size").collect()
    )
    # identical points don't dominate each other; 3 is strictly worse
    assert got == _brute(rows) == [1, 2]


def test_groups_are_isolated(spark):
    rows = [("a", 1, 100, 5), ("b", 2, 50, 1)]
    df = spark.createDataFrame(rows, "g string, id long, price long, size long")
    got = sorted(
        r.id for r in pareto_frontier_2d(df, ["g"], "price", "size").collect()
    )
    assert got == [1, 2]  # each is its group's entire frontier


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=12,
    )
)
def test_frontier_property_random_points(spark, pts):
    rows = [(i, p, s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, price long, size long")
    got = sorted(
        r.id for r in pareto_frontier_2d(df, [], "price", "size").collect()
    )
    assert got == _brute(rows)
