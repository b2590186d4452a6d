"""BPE merge-learning semantics on toy fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import bpe as B


def test_learn_merges_classic_example(spark):
    # 'lo' dominates: appears in every word, weighted 5+2+1 = 8
    docs = spark.createDataFrame(
        [(0, "low low low low low lower lower lowest")], ["doc_id", "text"]
    )
    merges = B.learn_merges(docs, rounds=2).collect()
    assert merges[0]["round"] == 1 and merges[0]["pair"] == "l o"
    assert merges[0]["total"] == 8
    # after merging 'lo', the next winner is ('lo', 'w') — merges chain
    assert merges[1]["pair"] == "lo w" and merges[1]["total"] == 8


def test_apply_merge_consecutive_occurrences(spark):
    # [a,b,a,b] must become [ab,ab] — the single-pass string-replace trap
    # (scan resuming after the replacement) would miss the second one
    segs = spark.createDataFrame(
        [("x", 1, ["a", "b", "a", "b"])], ["word", "cnt", "seg"]
    ).withColumn("pair", F.lit("a b"))
    out = B.apply_merge(segs).collect()[0]["seg"]
    assert out == ["ab", "ab"]


def test_self_pairs_excluded_from_candidates(spark):
    # 'aaaa' offers only the self-pair (a,a); with it excluded the winner
    # must be a pair from 'xy'
    docs = spark.createDataFrame([(0, "aaaa aaaa aaaa xy")], ["doc_id", "text"])
    top = B.top_pair(B.initial_segmentation(B.word_counts(docs))).collect()[0]
    assert top["pair"] == "x y"


def test_merge_is_a_no_op_without_occurrences(spark):
    segs = spark.createDataFrame(
        [("x", 1, ["q", "r"])], ["word", "cnt", "seg"]
    ).withColumn("pair", F.lit("a b"))
    assert B.apply_merge(segs).collect()[0]["seg"] == ["q", "r"]


def test_encode_stats_compression(spark):
    docs = spark.createDataFrame(
        [(0, "low low low low low lower lower lowest")], ["doc_id", "text"]
    )
    r = B.encode_stats(docs, rounds=2).collect()[0]
    assert r["n_words"] == 8
    # after merges 'lo' then 'low': 'low'->1 token, 'lower'->3 ('low','e','r'),
    # 'lowest'->4 -> 5*1 + 2*3 + 1*4 = 15; without merges it would be 42 chars
    assert r["n_bpe_tokens"] == 15
