"""Exact weighted median: handcrafted weight splits, duplicate-value
folding, and the single-exchange plan."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from project_obsidian_core_spark.plans import relational_queries as R


def _run(spark, rows, tmp_path):
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    p = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{p}/lineitem.parquet")
    return {
        r["l_returnflag"]: r["weighted_median_cents"]
        for r in R.lineitem_weighted_median(spark, p).collect()
    }


def test_weighted_median_pulls_toward_heavy_value(spark, tmp_path):
    rows = [
        # group A: value 1.00 carries 9 of 10 total weight -> median 100
        ("A", 1.00, 9.0),
        ("A", 100.00, 1.0),
        # group B: symmetric weights, exact midpoint at the lower value
        # (cum*2 == tot at the first row -> smallest qualifying value)
        ("B", 1.00, 5.0),
        ("B", 3.00, 5.0),
    ]
    got = _run(spark, rows, tmp_path)
    assert got == {"A": 100, "B": 100}


def test_weighted_median_folds_duplicate_values(spark, tmp_path):
    # duplicate price rows are RANGE-frame peers: their weights fold into
    # one prefix step, so the median cannot land "between" duplicates
    rows = [("A", 2.00, 1.0)] * 3 + [("A", 1.00, 2.0)]
    got = _run(spark, rows, tmp_path)
    assert got == {"A": 200}  # cum(100)=2, cum(200)=5, tot=5 -> 2*2<5 -> 200


def test_weighted_median_single_exchange(spark, tmp_path):
    rows = [("A", 1.0, 1.0), ("B", 2.0, 2.0)]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    p = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{p}/lineitem.parquet")
    plan = (
        R.lineitem_weighted_median(spark, p)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # windows + aggregate share the (flag) partitioning; only the final
    # orderBy adds a range exchange
    assert plan.count("hashpartitioning") <= 1, plan
