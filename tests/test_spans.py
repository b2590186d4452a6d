"""D18/D19 duplicated-span detection: planted spans, short-doc guard,
brute-force coverage equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F

from project_obsidian_core_spark.datapipe.spans import (
    dup_span_coverage,
    dup_spans,
    token_windows,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_span_found_with_positions(spark):
    shared = "alpha beta gamma delta"
    df = _docs(
        spark,
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} nine eight seven"),
            (3, "unrelated words only here right now"),
        ],
    )
    got = {r["gram"]: (r["n_docs"], r["n_occ"]) for r in dup_spans(df, k=4).collect()}
    assert got == {shared: (2, 2)}
    w = token_windows(df, k=4)
    pos = {
        (r["doc_id"], r["start_pos"])
        for r in w.where(F.col("gram") == shared).collect()
    }
    assert pos == {(1, 3), (2, 1)}


def test_long_shared_span_reported_as_overlapping_windows(spark):
    # a shared span of length k+1 must yield exactly 2 dup k-windows
    span = "a b c d e"
    df = _docs(spark, [(1, f"x {span} y"), (2, f"{span} z w q")])
    grams = sorted(r["gram"] for r in dup_spans(df, k=4).collect())
    assert grams == ["a b c d", "b c d e"]


def test_short_docs_emit_no_windows_no_descending_sequence(spark):
    # size < k must be filtered BEFORE sequence(): Spark's sequence(1, n)
    # descends for n < 1 and would fabricate windows otherwise
    df = _docs(spark, [(1, "only three tokens"), (2, ""), (3, "a b c d")])
    w = token_windows(df, k=4).collect()
    assert [(r["doc_id"], r["start_pos"]) for r in w] == [(3, 1)]


def test_whitespace_runs_normalised(spark):
    df = _docs(spark, [(1, "a  b\tc   d"), (2, "a b c d")])
    got = dup_spans(df, k=4).collect()
    assert len(got) == 1 and got[0]["n_docs"] == 2


def test_coverage_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 30))))
        for i in range(30)
    ]
    k = 3
    # brute force
    wins: dict[int, list[str]] = {}
    for i, t in rows:
        toks = t.split()
        wins[i] = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
    from collections import defaultdict

    docs_of = defaultdict(set)
    for i, ws in wins.items():
        for g in ws:
            docs_of[g].add(i)
    ref = {}
    for i, ws in wins.items():
        if not ws:
            continue
        nd = sum(1 for g in ws if len(docs_of[g]) >= 2)
        ref[i] = (len(ws), nd, nd * 1_000_000 // len(ws))
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_ppm"])
        for r in dup_span_coverage(_docs(spark, rows), k=k).collect()
    }
    assert got == ref


def test_within_doc_repeat_does_not_count_as_dup(spark):
    # min_docs=2 counts DISTINCT docs: a span repeated twice inside one
    # doc is not corpus-duplicated
    df = _docs(spark, [(1, "p q r s p q r s"), (2, "t u v w x y z a")])
    assert dup_spans(df, k=4).collect() == []
    cov = {r["doc_id"]: r["n_dup_windows"] for r in dup_span_coverage(df, k=4).collect()}
    assert cov == {1: 0, 2: 0}


def test_excise_keeps_canonical_occurrence_only(spark):
    from project_obsidian_core_spark.datapipe.spans import excise_dup_spans

    shared = "alpha beta gamma delta"
    df = _docs(
        spark,
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} nine eight seven"),
            (3, "unrelated words only here right"),
        ],
    )
    got = {r["doc_id"]: r for r in excise_dup_spans(df, k=4).collect()}
    # doc 1 holds the canonical (smallest doc_id) occurrence: untouched
    assert got[1]["n_removed"] == 0
    assert got[1]["clean_text"] == f"one two {shared} three"
    # doc 2 loses exactly the 4 shared tokens
    assert got[2]["n_removed"] == 4
    assert got[2]["clean_text"] == "nine eight seven"
    assert got[3]["n_removed"] == 0


def test_excise_overlapping_windows_union(spark):
    from project_obsidian_core_spark.datapipe.spans import excise_dup_spans

    span = "a b c d e"  # shared length k+1 -> two overlapping dup 4-windows
    df = _docs(spark, [(1, f"{span} x y z"), (2, f"p q {span} r")])
    got = {r["doc_id"]: r for r in excise_dup_spans(df, k=4).collect()}
    assert got[1]["n_removed"] == 0  # canonical
    # doc 2: both windows non-canonical; union covers all 5 span tokens
    assert got[2]["n_removed"] == 5
    assert got[2]["clean_text"] == "p q r"


def test_excise_short_docs_and_within_doc_repeats_pass_through(spark):
    from project_obsidian_core_spark.datapipe.spans import excise_dup_spans

    df = _docs(spark, [(1, "tiny doc"), (2, "p q r s p q r s t u v w")])
    got = {r["doc_id"]: r for r in excise_dup_spans(df, k=4).collect()}
    assert got[1]["n_removed"] == 0 and got[1]["clean_text"] == "tiny doc"
    assert got[2]["n_removed"] == 0  # within-doc repeat is not corpus-dup


def test_span_decontaminate_positions_and_counts(spark):
    from project_obsidian_core_spark.datapipe.spans import span_decontaminate

    bench = _docs(spark, [(100, "leak one two three tail"), (101, "x y z w v")])
    corpus = _docs(
        spark,
        [
            (1, "pad pad leak one two three pad"),  # hit at start_pos 3
            (2, "clean words without any overlap here"),
            (3, "x y z w v and leak one two three"),  # hits both bench docs
        ],
    )
    got = {
        r["doc_id"]: r
        for r in span_decontaminate(corpus, bench, k=4).collect()
    }
    assert got[1]["n_contaminated"] == 1 and got[1]["first_hit_pos"] == 3
    assert got[1]["n_bench_docs"] == 1
    assert got[2]["n_contaminated"] == 0 and got[2]["first_hit_pos"] is None
    assert got[2]["n_bench_docs"] == 0
    assert got[3]["n_contaminated"] == 3  # 'x y z w', 'y z w v', 'leak one two three'
    assert got[3]["n_bench_docs"] == 2
    assert got[3]["first_hit_pos"] == 1


def test_span_decontaminate_shuffle_fallback_matches_broadcast(spark):
    from project_obsidian_core_spark.datapipe.spans import span_decontaminate

    bench = _docs(spark, [(100, "a b c d e f")])
    corpus = _docs(spark, [(1, "z a b c d q"), (2, "m n o p q r")])
    a = sorted(map(tuple, span_decontaminate(corpus, bench, k=4).collect()))
    b = sorted(
        map(
            tuple,
            span_decontaminate(corpus, bench, k=4, broadcast_bench=False).collect(),
        )
    )
    assert a == b
