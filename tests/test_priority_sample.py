"""C24 fixed-k priority sampling: exact-k contract, weight skew,
determinism under repartition, zero/negative-weight exclusion."""

from __future__ import annotations

import pyspark.sql.functions as F

from project_obsidian_core_spark.datapipe.curation import priority_sample


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, grp string, w long")


def test_exactly_k_per_group_and_deterministic(spark):
    rows = [(i, f"g{i % 3}", 10 + i) for i in range(60)]
    df = _df(spark, rows)
    got = priority_sample(df, k=5, weight=F.col("w"), group_cols=("grp",))
    per = {r["grp"]: 0 for r in got.collect()}
    out1 = sorted((r["grp"], r["doc_id"]) for r in got.collect())
    for g, _ in out1:
        per[g] += 1
    assert per == {"g0": 5, "g1": 5, "g2": 5}
    # membership survives repartitioning (hash-derived, not row-order)
    out2 = sorted(
        (r["grp"], r["doc_id"])
        for r in priority_sample(
            df.repartition(7, "doc_id"), k=5, weight=F.col("w"), group_cols=("grp",)
        ).collect()
    )
    assert out1 == out2


def test_global_topk_limit_path(spark):
    df = _df(spark, [(i, "g", 1 + i % 4) for i in range(50)])
    got = priority_sample(df, k=7, weight=F.col("w"))
    assert got.count() == 7


def test_heavy_weights_overrepresented(spark):
    # 100 light (w=1) vs 100 heavy (w=100) rows: a k=40 sample must
    # skew decisively heavy (in expectation ~99% of picks)
    rows = [(i, "g", 1) for i in range(100)] + [(i + 100, "g", 100) for i in range(100)]
    got = priority_sample(_df(spark, rows), k=40, weight=F.col("w"))
    n_heavy = sum(1 for r in got.collect() if r["doc_id"] >= 100)
    assert n_heavy >= 35


def test_nonpositive_weights_excluded(spark):
    df = _df(spark, [(1, "g", 0), (2, "g", -5), (3, "g", 10), (4, "g", 3)])
    ids = {r["doc_id"] for r in priority_sample(df, k=10, weight=F.col("w")).collect()}
    assert ids == {3, 4}


def test_k_larger_than_group_returns_whole_group(spark):
    df = _df(spark, [(1, "a", 2), (2, "a", 3), (3, "b", 1)])
    got = priority_sample(df, k=5, weight=F.col("w"), group_cols=("grp",))
    assert got.count() == 3
