"""Hand-built golden units for the round-16 operator batch (the gate
proves engine parity; these pin the SEMANTICS on cases small enough to
verify by hand)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _gini(spark, values):
    from project_obsidian_core_spark.plans.relational_queries import (
        gini_grid,
        gini_report,
    )

    seg = spark.createDataFrame(
        [("S", int(v)) for v in values], ["segment", "v"]
    )
    return gini_report(gini_grid(seg)).collect()[0]


def test_gini_equal_values_is_zero(spark):
    row = _gini(spark, [500] * 8)
    assert row["gini_ppm"] == 0
    assert row["n_orders"] == 8
    assert row["total_cents"] == 4000


def test_gini_matches_hand_formula_with_ties(spark):
    # values sorted: 100,100,200,400 -> 2*sum(i*x) = 2*(100+200+600+1600)
    # = 5000; num = 5000 - 5*800 = 1000; (1000 div 4)*1e6 div 800 =
    # 312500 ppm = the exact 0.3125.  (Cents-scale values: the
    # divide-by-n-first truncation chain is exact when num % n == 0 and
    # loses < 1e6/s0 ppm otherwise — negligible at corpus scale.)
    row = _gini(spark, [400, 100, 200, 100])
    assert row["gini_ppm"] == 312_500


def test_lorenz_deciles_cumulative_shares(spark, tmp_path):
    """A115 on a hand corpus: one segment, orders valued 1..10 dollars
    (cents 100..1000); L(d/10) = sum(1..d)/55."""
    from project_obsidian_core_spark.plans.relational_queries import (
        orders_lorenz_deciles,
    )

    orders = spark.createDataFrame(
        [(i, i, float(i)) for i in range(1, 11)],
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = spark.createDataFrame(
        [(i, "SEG") for i in range(1, 11)], ["c_custkey", "c_mktsegment"]
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    cust.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    out = orders_lorenz_deciles(spark, str(tmp_path)).collect()
    assert len(out) == 10
    for r in out:
        d = r["decile"]
        expect = sum(range(1, d + 1)) * 100
        assert r["pop_rank"] == d
        assert r["cum_value_cents"] == expect, (d, r)
        assert r["value_share_ppm"] == expect * 1_000_000 // 5500
    assert out[-1]["value_share_ppm"] == 1_000_000


def test_compaction_oversized_shard_isolates(spark):
    """P23's fold (pack_best_fit): an item above the cap opens its own
    bin and nothing ever joins it."""
    from project_obsidian_core_spark.datapipe.pipeline import pack_best_fit

    items = spark.createDataFrame(
        [(1, "all", 500), (2, "all", 30), (3, "all", 40), (4, "all", 35)],
        ["doc_id", "source", "n_tokens"],
    )
    out = {int(r["doc_key"]): r.asDict() for r in pack_best_fit(items, 100).collect()}
    big_group = out[1]["pack_id"]
    # the oversized item is alone in its group
    assert all(
        r["pack_id"] != big_group for k, r in out.items() if k != 1
    )
    # the three small items fit into one bin under BFD (40+35+... 40
    # first, then 35 -> 75, then 30 -> 105 > 100 so 30 opens bin 3)
    assert out[3]["pack_fill"] == 0
    assert out[4]["pack_fill"] == 40
    assert out[2]["pack_fill"] == 0


def test_template_lines_flags_cross_doc_chrome(spark, tmp_path):
    """X35: nav/aside(no)/footer lines are cross-doc identical on the
    fixture -> flagged; paragraph halves are unique -> not."""
    from project_obsidian_core_spark.plans.curation_queries import (
        text_template_lines,
    )

    # the distinguishing token must sit in the FIRST half too, or the
    # fixture's paragraph-1 line is cross-doc identical and legitimately
    # counts as a third template line
    rows = [
        (i, f"number {i} totally unique body text with enough words", "s0")
        for i in range(10)
    ]
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    r = text_template_lines(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 10
    assert r["line_instances"] == 50
    # nav + footer are identical in every doc; the aside/paragraphs
    # carry doc_id-dependent text.  aside repeats with period
    # lcm(7,5,3)=105 > 10 docs -> distinct per doc except doc_id
    # collisions mod (7,5,3): doc 0's aside (0,0,0) has no twin < 10.
    assert r["template_lines"] == 2
    assert r["template_instances"] == 20
    assert r["template_share_ppm"] == 400_000


def test_angle_probe_bands_on_known_vectors(spark, tmp_path):
    """N27 semantics sanity on the real plan: bands partition pairs,
    counts sum to <=256, min<=max within band."""
    from project_obsidian_core_spark.plans.datapipe_queries import (
        embedding_angle_probe,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(64)]) for i in range(300)
    ]
    spark.createDataFrame(rows, ["vec_id", "embedding"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))
    out = embedding_angle_probe(spark, str(tmp_path)).collect()
    total = sum(r["n_pairs"] for r in out)
    assert 0 < total <= 256
    for r in out:
        assert r["min_cos_ppm"] <= r["max_cos_ppm"]
        assert r["band"] == r["min_cos_ppm"] // 100_000 or r[
            "min_cos_ppm"
        ] < 0  # negative bands truncate toward zero (div semantics)
