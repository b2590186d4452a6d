"""Property-based checks for the round-8 operators: interval coalescing
and weighted median vs obvious sequential Python models on adversarial
layouts (duplicate intervals, containment chains, zero-width gaps, tied
weights)."""

from __future__ import annotations

import datetime as dt
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_obsidian_core_spark.operators.intervals import interval_merge

T0 = dt.datetime(2026, 4, 1)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tight domains force duplicates, touching bounds and containment
intervals = st.lists(
    st.tuples(st.integers(0, 12), st.integers(1, 6)),  # (start, width)
    min_size=1,
    max_size=10,
)


def _merge_model(ivs):
    """Sequential island model: sort, sweep, merge overlap-or-touch."""
    spans = sorted((s, s + w) for s, w in ivs)
    islands = []
    for s, e in spans:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
            islands[-1][2] += 1
        else:
            islands.append([s, e, 1])
    return [(s, e, n) for s, e, n in islands]


@given(ivs=intervals)
@settings(**_SETTINGS)
def test_interval_merge_matches_sequential_model(spark, ivs):
    rows = [
        (
            "k",
            T0 + dt.timedelta(minutes=s),
            T0 + dt.timedelta(minutes=s + w),
        )
        for s, w in ivs
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    got = sorted(
        (
            int((r["island_start"] - T0).total_seconds() // 60),
            int((r["island_end"] - T0).total_seconds() // 60),
            r["n_intervals"],
        )
        for r in interval_merge(df, ["k"], "s", "e").collect()
    )
    assert got == _merge_model(ivs)


weighted = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 5)),  # (value, weight)
    min_size=1,
    max_size=12,
)


def _wmedian_model(vw):
    """Smallest value whose cumulative weight doubles >= total."""
    total = sum(w for _, w in vw)
    cum = 0
    for v in sorted({v for v, _ in vw}):
        cum += sum(w for vv, w in vw if vv == v)
        if cum * 2 >= total:
            return v
    raise AssertionError("unreachable")


@given(vw=weighted)
@settings(**_SETTINGS)
def test_weighted_median_matches_sequential_model(spark, vw, tmp_path_factory):
    from project_obsidian_core_spark.plans import relational_queries as R

    rows = [("A", float(v), float(w)) for v, w in vw]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    p = str(tmp_path_factory.mktemp("wm"))
    df.write.mode("overwrite").parquet(f"{p}/lineitem.parquet")
    got = R.lineitem_weighted_median(spark, p).collect()[0]
    assert got["weighted_median_cents"] == _wmedian_model(vw) * 100


@given(ivs=intervals)
@settings(**_SETTINGS)
def test_presplit_interval_merge_equals_plain(spark, ivs):
    from project_obsidian_core_spark.operators.intervals import (
        interval_merge_presplit,
    )

    # spread intervals across several hours so the "1 hour" chunking
    # actually splits (minutes*13 pushes spans across chunk boundaries)
    rows = [
        (
            "k",
            T0 + dt.timedelta(minutes=s * 13),
            T0 + dt.timedelta(minutes=s * 13 + w * 9),
        )
        for s, w in ivs
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")

    def norm(res):
        return sorted(
            (r["island_start"], r["island_end"], r["n_intervals"])
            for r in res.collect()
        )

    from project_obsidian_core_spark.operators.intervals import interval_merge

    assert norm(
        interval_merge_presplit(df, ["k"], "s", "e", chunk="1 hour")
    ) == norm(interval_merge(df, ["k"], "s", "e"))
