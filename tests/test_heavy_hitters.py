"""Two-pass exact heavy hitters: pigeonhole completeness across many Arrow
batches, strict-threshold semantics, and the broadcast-semi-join plan."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.analytics import heavy_hitters as HH


def _direct(df, phi):
    total = df.count()
    return {
        r["key"]: r["cnt"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] * phi.denominator > total * phi.numerator
    }


@pytest.fixture()
def small_batches(spark):
    # force many tiny Arrow batches so the candidate pass really runs
    # per-batch (the distributed shape), not on one big batch
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_matches_direct_groupby_under_many_batches(spark, small_batches):
    # head/tail mix: key 'h{i%7}' for 70% of rows, unique tail otherwise —
    # heavy keys span every batch, so a per-batch false negative would show
    rows = [
        (f"h{i % 7}",) if i % 10 < 7 else (f"tail{i}",) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, ["key"]).repartition(8)
    phi = Fraction(1, 50)
    got = {
        r["key"]: r["cnt"]
        for r in HH.heavy_hitters(df, phi=phi).collect()
    }
    assert got == _direct(df, phi)
    assert len(got) == 7


def test_threshold_is_strict(spark):
    # 100 rows, phi=1/10: a key with EXACTLY 10 rows is not reported
    rows = [("at",)] * 10 + [("over",)] * 11 + [(f"u{i}",) for i in range(79)]
    df = spark.createDataFrame(rows, ["key"])
    got = {r["key"] for r in HH.heavy_hitters(df, phi=Fraction(1, 10)).collect()}
    assert got == {"over"}


def test_share_ppm_is_exact_integer(spark):
    rows = [("a",)] * 30 + [("b",)] * 70
    df = spark.createDataFrame(rows, ["key"])
    out = {
        r["key"]: r["share_ppm"]
        for r in HH.heavy_hitters(df, phi=Fraction(1, 10)).collect()
    }
    assert out == {"a": 300000, "b": 700000}


def test_verify_pass_is_broadcast_semi_join(spark):
    df = spark.createDataFrame([("a",)] * 100, ["key"])
    plan = (
        HH.heavy_hitters(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
