"""inverted_index (datapipe/text.py): exact stats over the FULL relation
with postings capped BEFORE they buffer."""

from __future__ import annotations

from project_obsidian_core_spark.datapipe.text import inverted_index


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a"),
            (2, "a c"),
            (3, "b b b"),
            (4, "a"),
        ],
        "doc_id long, text string",
    )


def test_stats_are_exact_and_postings_sorted(spark):
    out = {r.term: r for r in inverted_index(_docs(spark)).collect()}
    assert set(out) == {"a", "b", "c"}
    assert (out["a"].doc_freq, out["a"].total_tf, out["a"].postings) == (3, 4, [1, 2, 4])
    assert (out["b"].doc_freq, out["b"].total_tf, out["b"].postings) == (2, 4, [1, 3])
    assert (out["c"].doc_freq, out["c"].total_tf, out["c"].postings) == (1, 1, [2])


def test_postings_cap_bounds_the_list_not_the_stats(spark):
    out = {
        r.term: r
        for r in inverted_index(_docs(spark), postings_cap=2).collect()
    }
    # doc_freq/total_tf stay exact over ALL postings; the list is cut to
    # the first 2 doc_ids — the cap bounds the aggregation buffer, so a
    # stop-word term can never gather the whole corpus into one task
    assert (out["a"].doc_freq, out["a"].total_tf) == (3, 4)
    assert out["a"].postings == [1, 2]


def test_empty_tokens_are_dropped(spark):
    df = spark.createDataFrame([(1, "a  b")], "doc_id long, text string")
    out = {r.term for r in inverted_index(df).collect()}
    assert out == {"a", "b"}
