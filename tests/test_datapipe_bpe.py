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


def test_self_pairs_counted_sennrich_style(spark):
    # 'aaaa' contributes 3 overlapping (a, a) positions per occurrence —
    # the same enumeration reference BPE implementations use — so the
    # self-pair (9 total) beats 'xy' (1)
    docs = spark.createDataFrame([(0, "aaaa aaaa aaaa xy")], ["doc_id", "text"])
    top = B.top_pair(B.initial_segmentation(B.word_counts(docs))).collect()[0]
    assert top["pair"] == "a a" and top["total"] == 9


def test_apply_merge_self_pair_run_parity(spark):
    # left-to-right greedy on runs: odd-length runs keep a trailing single
    cases = {
        "aa": ["aa"],
        "aaa": ["aa", "a"],
        "aaaa": ["aa", "aa"],
        "aaaaa": ["aa", "aa", "a"],
        "baaab": ["b", "aa", "a", "b"],
        "aabaa": ["aa", "b", "aa"],
        "xyz": ["x", "y", "z"],
    }
    segs = spark.createDataFrame(
        [(w, 1, list(w)) for w in cases], ["word", "cnt", "seg"]
    ).withColumn("pair", F.lit("a a"))
    got = {r["word"]: r["seg"] for r in B.apply_merge(segs).collect()}
    assert got == cases


def _golden_bpe(word_counts: dict[str, int], rounds: int):
    """Pure-Python Sennrich-style BPE: overlapping pair counts,
    left-to-right greedy merge, (total desc, pair asc) tie-break."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        pair, total = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((f"{pair[0]} {pair[1]}", total))
        a, b = pair
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_learn_merges_matches_golden_python_bpe(spark):
    # run-heavy corpus: self-pairs dominate, exercising the parity branch
    text = "aaaa aaaa baaab zoo zoo zoo keeper aaa"
    wc: dict[str, int] = {}
    for w in text.split(" "):
        wc[w] = wc.get(w, 0) + 1
    golden_merges, golden_segs = _golden_bpe(wc, rounds=4)

    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    merges = [(r["pair"], r["total"]) for r in B.learn_merges(docs, rounds=4).collect()]
    assert merges == golden_merges
    segs = {r["word"]: r["seg"] for r in B.segment_words(docs, rounds=4).collect()}
    assert segs == golden_segs


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
