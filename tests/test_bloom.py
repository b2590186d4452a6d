"""J17 Bloom runtime filter — no-false-negative contract and pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.operators.bloom import (
    BLOOM_M_BITS,
    build_bloom,
    might_contain,
)


def test_no_false_negatives(spark):
    keys = [(k,) for k in range(0, 5000, 7)]  # 715 keys
    df = spark.createDataFrame(keys, ["k"])
    words = build_bloom(df, "k")
    kept = (
        df.filter(might_contain("k", words)).count()
    )
    assert kept == len(keys)  # every inserted key tests positive


def test_false_positive_rate_is_small(spark):
    build = spark.createDataFrame([(k,) for k in range(1000)], ["k"])
    words = build_bloom(build, "k")
    probe = spark.createDataFrame(
        [(k,) for k in range(1_000_000, 1_020_000)], ["k"]
    )  # 20k keys, none inserted
    fp = probe.filter(might_contain("k", words)).count()
    # theory at n=1000, m=2^16, k=4: ~(1-e^-0.061)^4 ~= 1.2e-5
    assert fp <= 20  # generous ceiling; typically 0-1


def test_filtered_join_equals_plain_join(spark):
    dim = spark.createDataFrame([(k,) for k in range(0, 300, 3)], ["k"])
    fact = spark.createDataFrame(
        [(i, i % 400) for i in range(4000)], ["row_id", "k2"]
    )
    words = build_bloom(dim, "k")
    plain = fact.join(dim, fact.k2 == dim.k).select("row_id")
    pruned = (
        fact.filter(might_contain("k2", words))
        .join(dim, fact.k2 == dim.k)
        .select("row_id")
    )
    assert sorted(r.row_id for r in plain.collect()) == sorted(
        r.row_id for r in pruned.collect()
    )


def test_null_keys_test_false(spark):
    dim = spark.createDataFrame([(1,), (2,)], ["k"])
    words = build_bloom(dim, "k")
    probe = spark.createDataFrame([(None,), (1,)], "k: bigint")
    got = [r.k for r in probe.filter(might_contain("k", words)).collect()]
    assert got == [1]


def test_bitmap_is_bounded(spark):
    df = spark.createDataFrame([(k,) for k in range(10_000)], ["k"])
    words = build_bloom(df, "k")
    assert len(words) == BLOOM_M_BITS // 64  # 1024 words regardless of n
