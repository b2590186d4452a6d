"""Corpus-curation operator semantics on hand-built fixtures."""

from __future__ import annotations

import pytest

from project_obsidian_core_spark.datapipe import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0 is the "benchmark" doc (0 % DECON_BENCH_MOD == 0)
        (0, "alpha beta gamma delta epsilon zeta", "en", "srcA"),
        (1, "alpha beta gamma other words here entirely", "en", "srcA"),  # overlaps 0
        (2, "nothing shared with that benchmark document at all", "en", "srcA"),
        (3, "spam spam spam spam spam spam spam spam", "en", "srcB"),  # repetitive
        (4, "xy", "fr", "srcB"),  # shorter than any n-gram
        (5, "one two three four five six seven eight nine ten", "fr", "srcB"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def by_id(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_decontaminate_flags_overlap(docs):
    r = by_id(C.decontaminate(docs, n=3, bench_mod=25))
    assert 0 not in r  # benchmark docs are excluded from the output
    assert r[1]["contaminated"] and r[1]["n_overlap"] >= 1  # shares 'alpha beta gamma'
    assert not r[2]["contaminated"] and r[2]["n_overlap"] == 0
    assert r[4]["n_ngrams"] == 0 and not r[4]["contaminated"]  # short-doc guard


def test_repetition_stats(docs):
    r = by_id(C.repetition_stats(docs))
    # 'spam' x8 -> 7 identical 2-grams: dup frac 6/7, top frac 7/7
    assert r[3]["dup_2gram_frac"] == pytest.approx(6 / 7)
    assert r[3]["top_2gram_frac"] == pytest.approx(1.0)
    assert r[3]["repetitive"]
    # all-distinct tokens -> zero repetition; top frac 1/9 does NOT trip
    # because the top gram appears only once (the >=2 occurrence guard)
    assert r[5]["dup_2gram_frac"] == 0.0
    assert r[5]["top_2gram_frac"] == pytest.approx(1 / 9)
    assert not r[5]["repetitive"]
    # short doc: no 2-grams, guarded to zeros
    assert r[4]["dup_2gram_frac"] == 0.0 and r[4]["top_2gram_frac"] == 0.0


def test_pii_scan_counts_and_redacts(docs):
    r = by_id(C.pii_scan(C.with_synthetic_pii(docs)))
    for d in r.values():
        assert d["n_emails"] == 1  # every doc gets exactly one injected email
    assert r[3]["n_ips"] == 1 and r[1]["n_ips"] == 0  # doc_id % 3
    assert r[5]["n_phones"] == 1 and r[1]["n_phones"] == 0  # doc_id % 5
    # redaction replaced every detected span
    from pyspark.sql import functions as F

    enriched = C.with_synthetic_pii(docs)
    red = enriched.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("enriched", C.EMAIL_RE, "<EMAIL>"),
                C.IPV4_RE,
                "<IP>",
            ),
            C.PHONE_RE,
            "<PHONE>",
        ).alias("red"),
    )
    rr = by_id(red)
    assert "<EMAIL>" in rr[1]["red"] and "@" not in rr[1]["red"]
    assert "<IP>" in rr[3]["red"]
    assert "<PHONE>" in rr[5]["red"]


def test_stratified_sample_caps_strata(spark):
    from pyspark.sql import functions as F

    # 100 docs in stratum A, 2 in stratum B: A is downsampled toward the
    # target, B survives whole (fraction clamps to 1.0)
    rows = [(i, "t", "en", "big") for i in range(100)] + [
        (1000, "t", "en", "small"),
        (1001, "t", "en", "small"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = C.stratified_sample(df, target=10.0)
    got = out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    n = {r["source"]: r["n"] for r in got}
    assert n.get("small") == 2  # clamp keeps the whole rare stratum
    assert 2 <= n.get("big", 0) <= 30  # ~10 expected from 100 at f=0.1
    # determinism: same input -> identical sample
    again = C.stratified_sample(df, target=10.0)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_stratified_sample_keeps_null_strata(spark):
    from pyspark.sql import types as T

    # rows with NULL lang/source form their own stratum and must be
    # sampled, not dropped by a NULL=NULL join miss
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    rows = [(i, "t", None, None) for i in range(3)] + [
        (10 + i, "t", "en", "web") for i in range(3)
    ]
    df = spark.createDataFrame(rows, schema)
    out = C.stratified_sample(df, target=10.0).collect()
    # fraction clamps to 1.0 in both strata -> every row survives
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 10, 11, 12]
    assert all(r["stratum_n"] == 3 for r in out)


def test_tile_dedup_drops_repeats_keeps_first(spark):
    rows = [
        # doc 1: tiles [a b] [c d]; doc 2 repeats [a b] then new [e f];
        # doc 3 is entirely doc 1's content -> everything dropped
        (1, "a b c d"),
        (2, "a b e f"),
        (3, "a b c d"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = {x["doc_id"]: x.asDict() for x in C.tile_dedup(df, tile=2).collect()}
    assert r[1]["n_tiles"] == 2 and r[1]["n_kept"] == 2  # first occurrences survive
    assert r[2]["n_kept"] == 1  # 'a b' already seen in doc 1
    assert r[3]["n_kept"] == 0 and r[3]["dedup_len"] == 0  # fully duplicate doc
    # reassembly preserves tile order: doc 2 keeps 'e f'
    from project_obsidian_core_spark.datapipe.text import shared_hash60
    from pyspark.sql import functions as F

    expect = df.limit(0).sparkSession.range(1).select(
        shared_hash60(F.lit("e f")).alias("h")
    ).collect()[0]["h"]
    assert r[2]["dedup_hash"] == expect


def test_tile_dedup_partial_last_tile(spark):
    # 5 tokens with tile=2 -> 3 tiles, last tile is the single trailing token
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    r = C.tile_dedup(df, tile=2).collect()[0]
    assert r["n_tiles"] == 3 and r["n_kept"] == 3


def test_vocab_build_ids_dense_and_ordered(docs):
    v = C.build_vocab(docs, min_count=2, cap=5).orderBy("vocab_id").collect()
    assert len(v) <= 5
    ids = [r["vocab_id"] for r in v]
    assert ids == list(range(1, len(v) + 1))  # dense, 1-based
    counts = [r["term_count"] for r in v]
    assert counts == sorted(counts, reverse=True)  # ranked by frequency
    # 'spam' (8 occurrences) must be the top term
    assert v[0]["term"] == "spam"
    # bigrams participate: 'spam spam' (7 occurrences) ranks second
    assert v[1]["term"] == "spam spam"


def test_vocab_no_single_partition_window(docs):
    # the rank join must not plan a Window at all (scale guard)
    plan = C.build_vocab(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_surprisal_rare_tokens_score_higher(spark):
    rows = [
        (1, "common common common common"),
        (2, "common common rare common"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = {x["doc_id"]: x.asDict() for x in C.surprisal_score(df).collect()}
    # 'rare' appears once in 8 tokens -> weight 8000; 'common' 7 times -> 1142
    assert r[2]["mean_surprisal"] > r[1]["mean_surprisal"]
    assert r[1]["surprisal_q"] == 4 * ((8 * C.SURPRISAL_SCALE) // 7)
    assert r[2]["surprisal_q"] == 3 * ((8 * C.SURPRISAL_SCALE) // 7) + 8 * C.SURPRISAL_SCALE
    assert r[1]["n_tokens"] == 4 and r[2]["n_tokens"] == 4


def test_weighted_sample_biases_toward_quality(spark):
    from pyspark.sql import functions as F

    # weight 0 -> never kept; weight 1 with rate>=1 -> always kept
    rows = [(i, 0.0 if i % 2 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = C.weighted_sample(df, weight=F.col("w"), rate=1.0)
    got = [r["doc_id"] for r in out.collect()]
    assert len(got) == 100 and all(i % 2 == 0 for i in got)
    # determinism: same inputs -> same membership
    again = [r["doc_id"] for r in C.weighted_sample(df, weight=F.col("w"), rate=1.0).collect()]
    assert sorted(got) == sorted(again)
    # intermediate weight keeps roughly that fraction
    half = spark.createDataFrame([(i, 0.5) for i in range(1000)], ["doc_id", "w"])
    n = C.weighted_sample(half, weight=F.col("w"), rate=1.0).count()
    assert 400 < n < 600


# -------------------------------------------------------------- OOV rate
def test_oov_rate_counts_and_ppm(spark):
    """Exact per-doc token/OOV counts and integer ppm against a hand
    vocabulary; fully-covered and fully-OOV docs hit the 0 / 1e6 rails."""
    from project_obsidian_core_spark.datapipe.curation import oov_rate

    docs = spark.createDataFrame(
        [
            (1, "a b a c"),   # c is OOV -> 1/4
            (2, "a a b"),     # covered -> 0/3
            (3, "x y"),       # all OOV -> 2/2
        ],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("a",), ("b",)], "term string")
    out = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_ppm)
           for r in oov_rate(docs, vocab).collect()}
    assert out[1] == (4, 1, 250_000)
    assert out[2] == (3, 0, 0)
    assert out[3] == (2, 2, 1_000_000)
