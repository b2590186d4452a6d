"""Blocked entity resolution (datapipe/linkage.py): block isolation, the
early-exit threshold distance, and the max_block guard."""

from __future__ import annotations

from project_obsidian_core_spark.datapipe.linkage import blocked_match_pairs


def _people(spark):
    return spark.createDataFrame(
        [
            (1, "us", "jon smith"),
            (2, "us", "john smith"),     # dist 1 to jon smith
            (3, "us", "jane smithers"),  # dist > 2 to both
            (4, "uk", "jon smith"),      # identical name, other block
            (5, "uk", "jon smyth"),      # dist 1 within uk
        ],
        "id long, country string, name string",
    )


def test_matches_within_block_only(spark):
    out = {
        (r.id_a, r.id_b): r.dist
        for r in blocked_match_pairs(
            _people(spark), "id", "name", ["country"], max_dist=2
        ).collect()
    }
    # (1,2) match in us; (4,5) in uk; (1,4) identical names NEVER pair
    # across blocks; (3,*) exceeds the bound
    assert out == {(1, 2): 1, (4, 5): 1}


def test_threshold_is_exact_distance(spark):
    df = spark.createDataFrame(
        [(1, "x", "abcdef"), (2, "x", "abQdeX")], "id long, b string, s string"
    )
    rows = blocked_match_pairs(df, "id", "s", ["b"], max_dist=2).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in rows] == [(1, 2, 2)]
    assert blocked_match_pairs(df, "id", "s", ["b"], max_dist=1).count() == 0


def test_max_block_guard_drops_oversized_blocks(spark):
    # "big" block has 3 records, "ok" has 2; cap at 2 -> only "ok" pairs
    df = spark.createDataFrame(
        [
            (1, "big", "aa"), (2, "big", "ab"), (3, "big", "ba"),
            (4, "ok", "zz"), (5, "ok", "zy"),
        ],
        "id long, b string, s string",
    )
    rows = blocked_match_pairs(
        df, "id", "s", ["b"], max_dist=2, max_block=2
    ).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(4, 5)]
    # no cap: the big block contributes its 3 pairs too
    assert (
        blocked_match_pairs(df, "id", "s", ["b"], max_dist=2, max_block=None).count()
        == 4
    )
