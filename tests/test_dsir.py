"""Q18 DSIR-style importance weighting: brute-force equivalence,
target-domain discrimination, short-doc guard."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from project_obsidian_core_spark.datapipe.dsir import DSIR_BUCKETS, dsir_importance


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute(rows, targets, buckets):
    feats = {}
    for i, t in rows:
        toks = " ".join(t.split()).split(" ")
        fs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        feats[i] = [_h60(f) % buckets for f in fs]
    n_raw: Counter = Counter()
    n_tgt: Counter = Counter()
    for i, bs in feats.items():
        for b in bs:
            n_raw[b] += 1
            if i in targets:
                n_tgt[b] += 1
    R, T = sum(n_raw.values()), sum(n_tgt.values())
    q = (R + buckets) * 1_000_000 // (T + buckets)
    lift = {b: (n_tgt[b] + 1) * q // (n_raw[b] + 1) for b in n_raw}
    out = {}
    for i, bs in feats.items():
        per = defaultdict(int)
        for b in bs:
            per[b] += 1
        num = sum(n * lift[b] for b, n in per.items())
        den = sum(per.values())
        out[i] = (den, num // den)
    return out


def test_matches_bruteforce_on_random_corpus(spark):
    import random

    rng = random.Random(11)
    tgt_vocab = [f"t{i}" for i in range(8)]
    raw_vocab = [f"r{i}" for i in range(8)]
    rows, targets = [], set()
    for i in range(40):
        is_tgt = rng.random() < 0.4
        vocab = tgt_vocab if is_tgt else raw_vocab
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 20)))))
        if is_tgt:
            targets.add(i)
    df = spark.createDataFrame(
        [(i, t, i in targets) for i, t in rows],
        "doc_id long, text string, tgt boolean",
    )
    got = {
        r["doc_id"]: (r["n_features"], r["importance_ppm"])
        for r in dsir_importance(df, F.col("tgt"), buckets=64).collect()
    }
    assert got == _brute(rows, targets, 64)


def test_target_vocab_docs_score_higher(spark):
    # docs drawn from the target vocabulary must outscore disjoint-vocab
    # docs — the property selection thresholds rely on
    rows = [(i, " ".join(f"tw{j}" for j in range(10)), True) for i in range(10)]
    rows += [(i + 10, " ".join(f"ow{j}" for j in range(10)), False) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {r["doc_id"]: r["importance_ppm"] for r in dsir_importance(df, F.col("tgt")).collect()}
    tgt_scores = {got[i] for i in range(10)}
    raw_scores = {got[i + 10] for i in range(10)}
    assert min(tgt_scores) > max(raw_scores)
    # corpus-average anchor: target docs sit above 1e6, pure-other below
    assert min(tgt_scores) > 1_000_000 > max(raw_scores)


def test_single_token_doc_no_descending_sequence(spark):
    df = spark.createDataFrame(
        [(1, "solo", True), (2, "a b", False)], "doc_id long, text string, tgt boolean"
    )
    got = {r["doc_id"]: r["n_features"] for r in dsir_importance(df, F.col("tgt")).collect()}
    assert got == {1: 1, 2: 3}  # 1 unigram; 2 unigrams + 1 bigram
