"""Column profiling (operators.quality.profile): exact counts, null
handling, and the no-Expand plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.operators.quality import profile


def _df(spark):
    rows = [
        (1, "a", None),
        (2, "b", 10),
        (3, "a", 20),
        (None, None, 20),
    ]
    return spark.createDataFrame(rows, "k int, s string, v int")


def _cols():
    return [
        ("k", F.lpad(F.col("k").cast("string"), 4, "0")),
        ("s", F.col("s")),
        ("v", F.lpad(F.col("v").cast("string"), 4, "0")),
    ]


def test_profile_counts_and_minmax(spark):
    out = {r["column"]: r for r in profile(_df(spark), _cols()).collect()}
    assert set(out) == {"k", "s", "v"}
    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 1, 3)
    assert (k["min_repr"], k["max_repr"]) == ("0001", "0003")
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    v = out["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (1, 2)
    assert (v["min_repr"], v["max_repr"]) == ("0010", "0020")


def test_profile_plan_has_no_expand(spark):
    plan = (
        profile(_df(spark), _cols())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan, plan
    # the melt is an explicit Generate feeding partial hash aggregates
    assert "Generate" in plan
    assert "HashAggregate" in plan
