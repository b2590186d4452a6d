"""X19 k-anonymity report — hand-counted equivalence classes."""

from __future__ import annotations

from project_obsidian_core_spark.datapipe.curation import k_anonymity_report


def test_hand_counted_classes(spark):
    # classes: (a, 1) x3 rows, (a, 2) x1, (b, 1) x2, (b, 2) x1
    rows = [
        ("a", 1), ("a", 1), ("a", 1),
        ("a", 2),
        ("b", 1), ("b", 1),
        ("b", 2),
    ]
    df = spark.createDataFrame(rows, ["t", "g"])
    out = {
        r.k: r
        for r in k_anonymity_report(df, ["t", "g"], ks=(2, 3, 4)).collect()
    }
    assert out[2].classes_total == 4 and out[2].rows_total == 7
    # below 2: the two singletons
    assert (out[2].classes_below, out[2].rows_below) == (2, 2)
    # below 3: singletons + the pair
    assert (out[3].classes_below, out[3].rows_below) == (3, 4)
    # below 4: everything but the size-3 class... the size-3 class is
    # below 4 too -> all 4 classes, 7 rows
    assert (out[4].classes_below, out[4].rows_below) == (4, 7)
    assert out[2].risk_ppm == 2 * 1_000_000 // 7


def test_fully_anonymous_table_has_zero_risk(spark):
    rows = [("x", i % 2) for i in range(20)]  # two classes of 10
    df = spark.createDataFrame(rows, ["t", "g"])
    out = k_anonymity_report(df, ["t", "g"], ks=(2, 5, 10)).collect()
    assert all(r.rows_below == 0 and r.risk_ppm == 0 for r in out)
