"""Salted two-phase aggregation: result equivalence + partial spreading."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.functions.skew import salted_agg

AGGS = {
    "n": ("count", "v"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _skewed_df(spark):
    # one hot key with 10k rows, a long tail with 10 each
    hot = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    tail = (
        spark.range(500)
        .select(
            F.concat(F.lit("k"), (F.col("id") % 50)).alias("k"),
            F.col("id").alias("v"),
        )
    )
    return hot.unionByName(tail).repartition(8)


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {r["k"]: r for r in salted_agg(df, ["k"], AGGS).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        for c in AGGS:
            assert plain[k][c] == salted[k][c], (k, c)


def test_salt_actually_spreads_hot_key(spark):
    df = _skewed_df(spark)
    salted = df.withColumn(
        "__salt",
        (F.spark_partition_id() + F.monotonically_increasing_id()) % 16,
    )
    n_partials = (
        salted.filter(F.col("k") == "hot").select("__salt").distinct().count()
    )
    assert n_partials > 4  # the hot key's rows land in many salt buckets


def test_non_algebraic_op_rejected(spark):
    df = _skewed_df(spark)
    import pytest

    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"bad": ("avg", "v")})
