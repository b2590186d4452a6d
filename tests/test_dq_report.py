"""dq_report semantics: each rule kind counts exactly its violations on a
table seeded with every violation type; clean table reports zeros."""

from __future__ import annotations

import pytest

from project_obsidian_core_spark.operators.quality import dq_report


def _table(spark):
    return spark.createDataFrame(
        [
            (1, 10, "O", 100),
            (2, None, "F", 200),      # null custkey
            (3, 30, "X", -5),         # bad status, negative price
            (4, 40, None, 999_999),   # null status
            (4, 50, "P", 300),        # duplicate orderkey
        ],
        "o_orderkey long, o_custkey long, status string, price long",
    )


def test_dq_report_counts_each_violation_kind(spark):
    out = {
        r.rule: (r.n_violations, r.n_rows)
        for r in dq_report(
            _table(spark),
            [
                ("not_null", "o_custkey"),
                ("range", "price", 0, 1000),
                ("in_set", "status", ["O", "F", "P"]),
                ("unique", "o_orderkey"),
            ],
        ).collect()
    }
    assert out["not_null:o_custkey"] == (1, 5)
    assert out["range:price"] == (2, 5)     # -5 and 999999
    assert out["in_set:status"] == (2, 5)   # 'X' and NULL
    assert out["unique:o_orderkey"] == (1, 5)


def test_dq_report_clean_table_and_validation(spark):
    clean = _table(spark).filter("o_orderkey = 1")
    out = {
        r.rule: r.n_violations
        for r in dq_report(
            clean, [("not_null", "o_custkey"), ("unique", "o_orderkey")]
        ).collect()
    }
    assert out == {"not_null:o_custkey": 0, "unique:o_orderkey": 0}

    with pytest.raises(ValueError):
        dq_report(clean, [])
    with pytest.raises(ValueError):
        dq_report(clean, [("bogus", "o_custkey")])


def test_dq_report_duplicate_rules_get_distinct_names(spark):
    """Two rules with the same kind and column (e.g. two range rules with
    different bounds) must each be addressable — later duplicates carry a
    #{i} position suffix instead of silently colliding (ADVICE r7)."""
    out = {
        r.rule: r.n_violations
        for r in dq_report(
            _table(spark),
            [
                ("range", "price", 0, 1000),        # -5, 999999 violate
                ("range", "price", 0, 1_000_000),   # only -5 violates
            ],
        ).collect()
    }
    assert out == {"range:price": 2, "range:price#1": 1}


def test_dq_report_multi_unique_no_expand(spark):
    """k unique rules must NOT compile to k countDistincts in one agg:
    that plan Expands every input row (k+1)x through the shuffle. Each
    unique gets its own two-level aggregation instead — plan has no
    Expand node — and counts stay exact."""
    df = _table(spark)
    rep = dq_report(
        df,
        [
            ("not_null", "o_custkey"),
            ("unique", "o_orderkey"),
            ("unique", "o_custkey"),
            ("unique", "status"),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    out = {r.rule: r.n_violations for r in rep.collect()}
    assert out == {
        "not_null:o_custkey": 1,
        "unique:o_orderkey": 1,   # orderkey 4 twice
        "unique:o_custkey": 0,    # NULL doesn't count, others distinct
        "unique:status": 0,       # NULL doesn't count
    }


def test_dq_report_unique_only_rules(spark):
    """A report of only unique rules still carries the exact n_rows."""
    rows = dq_report(_table(spark), [("unique", "o_orderkey")]).collect()
    assert [(r.rule, r.n_violations, r.n_rows) for r in rows] == [
        ("unique:o_orderkey", 1, 5)
    ]
