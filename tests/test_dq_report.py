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
