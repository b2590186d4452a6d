"""Bucketed co-located joins: the plan must contain no Exchange."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.operators import bucketing as B


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("digest_id"), (F.col("id") % 97).alias("m")
    )
    right = spark.range(0, 10_000, 7).select(
        F.col("id").alias("digest_id"), F.lit("dim").alias("label")
    )
    B.write_bucketed(left, "b_left", ["digest_id"], n_buckets=8, path=str(tmp_path / "l"))
    B.write_bucketed(right, "b_right", ["digest_id"], n_buckets=8, path=str(tmp_path / "r"))
    yield "b_left", "b_right"
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force SMJ: at real scale both sides are too big to broadcast; here the
    # hint stands in for that (broadcast would bypass bucket locality)
    joined = B.co_located_join(spark, lt, rt, ["digest_id"], force_sortmerge=True)
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan
    # and it is actually correct
    assert joined.count() == len(range(0, 10_000, 7))


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    # control: the same SMJ over a raw (unbucketed) side plans an Exchange
    lt, _ = bucketed_tables
    raw = spark.range(0, 10_000, 7).select(F.col("id").alias("digest_id"))
    plan = _plan(spark.table(lt).hint("merge").join(raw, ["digest_id"]))
    assert "Exchange" in plan


def test_gate_query_join_is_exchange_free(spark):
    # the registry gate query (orders_bucketed_join) must plan its
    # orders⋈lineitem as a bucket-local SMJ: the ONLY exchange allowed in
    # the whole plan is the final top-N (rangepartitioning/singlepartition),
    # never a hashpartitioning shuffle feeding the join or the per-order agg
    from project_obsidian_core_spark.plans import layout_queries as lay

    df = lay.orders_bucketed_join(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "hashpartitioning" not in plan, plan
