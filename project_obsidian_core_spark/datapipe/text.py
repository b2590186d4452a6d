"""Text-analysis operators for training-data pipelines.

Language-ID (n-gram/stopword profile heuristic), quality scoring, token
counting (whitespace + BPE-ish regex) and content fingerprinting (k-gram
min-hash, winnowing-style) — the text-side preprocessing a 100 TB document
corpus needs before model training.

Scale notes
-----------
Every operator here is a *narrow*, per-row projection built from JVM
expressions (split / regexp / transform / aggregate): no shuffle, no Python,
fully pipelined inside WholeStageCodegen with the parquet scan. On a
1000-executor cluster these run at scan speed; the only shuffles are the
explicit groupBys in the dedup/rollup consumers downstream.

Cross-engine determinism (DuckDB oracle): ratios are int/int divisions;
weighted scores use identical association order; the shared 60-bit hash is
``conv(substr(md5(s),1,15),16,10)`` (Spark) == ``CAST('0x'||substr(md5(s),1,15)
AS BIGINT)`` (DuckDB) — both exact in int64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Words whose presence marks a "language" profile. The corpus is synthetic
#: word-salad, so profiles are topical rather than natural languages; the
#: operator structure (per-profile token-hit ratio, deterministic argmax) is
#: exactly an n-gram-profile language identifier.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "common": ("the", "a", "is", "of", "and", "to", "in"),
    "sql": ("table", "query", "join", "group", "order", "filter", "sort", "agg"),
    "exec": ("scan", "hash", "merge", "batch", "stream", "window", "part", "row", "column"),
    "data": ("data", "value", "key", "line", "vector", "customer", "spark"),
}

#: Stopword set for the quality score (subset of the corpus function words).
STOPWORDS: tuple[str, ...] = ("the", "a", "is", "of", "and", "to", "in")

#: BPE-ish tokenizer: letter runs | digit runs | single non-space symbol.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: Punctuation class for the punctuation-density feature.
PUNCT_RE = "[^.,;:!?]"

#: k-gram width for the content fingerprint.
FINGERPRINT_K = 5


def shared_hash60(col: Column) -> Column:
    """60-bit deterministic string hash reproducible in ANSI SQL:
    first 15 hex chars of md5, parsed base-16. Positive, fits int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _tokens(col: Column) -> Column:
    return F.split(col, " ")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and length features.

    All per-row JVM expressions — pipelined with the scan, no shuffle.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    bpe = F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0)
    # int->long casts: DuckDB len()/length() are BIGINT; keep schemas aligned
    return df.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_measured"),
        F.size(toks).cast("long").alias("n_ws_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.when(
            F.size(toks) > 0,
            (F.length(t) - F.size(toks) + 1).cast("double") / F.size(toks),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document quality scoring: length / punctuation / stopword / lexical-
    diversity ratios combined into one [0,1] score.

    The weighted combination mirrors the heuristic quality filters used on
    web-scale corpora (C4/Gopher-style rules); weights are fixed constants so
    the score is a pure per-row expression.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_tok = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    )
    punct = F.length(F.regexp_replace(t, PUNCT_RE, ""))
    stop_ratio = F.when(n_tok > 0, stop_hits.cast("double") / n_tok).otherwise(F.lit(0.0))
    uniq_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length(t) > 0, punct.cast("double") / F.length(t)
    ).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), F.length(t).cast("double") / F.lit(500.0))
    # fixed association order — the oracle SQL parenthesizes identically
    quality = (
        F.lit(0.35) * len_score
        + F.lit(0.25) * uniq_ratio
        + F.lit(0.25) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.15) * (F.lit(1.0) - stop_ratio)
    )
    return df.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        punct_ratio.alias("punct_ratio"),
        F.least(F.lit(1.0), F.greatest(quality, F.lit(0.0))).alias("quality_score"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Profile-based language identification: per-profile token-hit ratio,
    deterministic argmax (ties broken by profile declaration order)."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_tok = F.size(toks)
    out = df.select("doc_id", toks.alias("_toks"), n_tok.alias("_n"))
    names = list(LANG_PROFILES)
    for name in names:
        words = LANG_PROFILES[name]
        hits = F.size(F.filter(F.col("_toks"), lambda x: x.isin(*words)))
        out = out.withColumn(
            f"score_{name}",
            F.when(F.col("_n") > 0, hits.cast("double") / F.col("_n")).otherwise(
                F.lit(0.0)
            ),
        )
    # argmax with first-declared-wins ties: name_i wins iff score_i strictly
    # exceeds every earlier profile and is >= every later one.
    pred = None
    for i, name in enumerate(names):
        cond = F.lit(True)
        for j, other in enumerate(names):
            if j < i:
                cond = cond & (F.col(f"score_{name}") > F.col(f"score_{other}"))
            elif j > i:
                cond = cond & (F.col(f"score_{name}") >= F.col(f"score_{other}"))
        pred = F.when(cond, F.lit(name)) if pred is None else pred.when(cond, F.lit(name))
    return out.select(
        "doc_id",
        *[F.col(f"score_{n}") for n in names],
        pred.otherwise(F.lit(names[0])).alias("lang_pred"),
    )


#: fingerprint hash params: Mersenne prime + Knuth multiplicative scramble.
FP_P = 2_147_483_647
FP_MULT = 2_654_435_761


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: min over scrambled polynomial hashes of all
    character k-grams of the normalized text (winnowing-style rolling-hash
    min-sketch).

    Robust to token order and duplicated whitespace; two documents with the
    same k-gram set share a fingerprint. Pure per-row *integer* expression:
    codepoints are materialized once per row, each k-gram is a base-128
    polynomial over them (injective for k=5 ascii chars), scrambled with a
    Knuth multiplicative step so the min isn't biased toward
    space-prefixed k-grams. No md5/string building in the hot loop — this
    stays inside WholeStageCodegen at ~scan speed (the md5 variant measured
    4× slower at sf0.1).
    """
    k = FINGERPRINT_K
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""), " +", " ")
    )
    # split-to-chars then ascii: O(L) — a sequence+substring(j,1) variant is
    # O(L²) per row (substring seeks) and measured 80× slower at sf0.1
    d = df.select("doc_id", norm.alias("_norm")).withColumn(
        "_codes", F.expr("transform(split(_norm, ''), ch -> ascii(ch))")
    )
    poly = " + ".join(
        f"element_at(_codes, i + {j}) * {128 ** (k - 1 - j)}L" for j in range(k)
    )
    kgram_hashes = F.expr(
        f"transform(sequence(1, greatest(length(_norm) - {k - 1}, 1)), "
        f"i -> ((({poly}) % {FP_P}L) * {FP_MULT}L) % {FP_P}L)"
    )
    return d.select(
        "doc_id",
        F.length("_norm").cast("long").alias("norm_len"),
        F.when(F.length("_norm") >= k, F.array_min(kgram_hashes))
        .otherwise(shared_hash60(F.col("_norm")))
        .alias("fingerprint"),
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by tf·idf.

    The idf is the log-free rational form (N+1)/(df+1): monotone in the
    usual ln((N+1)/(df+1)), so rankings are identical, but the score stays
    inside exact integer-ratio arithmetic — ln() differs at ULP level
    between libm implementations, which would break cross-engine
    reproducibility (see plans/common.py determinism rules).

    Plan shape: this is the one text operator that genuinely explodes
    (building the inverted index IS the job). Document frequency is
    derived from the already-deduplicated (doc, term) tf relation — no
    second pass over the corpus — and joined back per term; the term
    dimension is tiny relative to the corpus, so at 100 TB it broadcasts.
    """
    toks = _tokens(F.col(text_col))
    pairs = df.select("doc_id", F.explode(toks).alias("term"))
    tf = pairs.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # Corpus size folded INTO the plan as a broadcast 1-row aggregate — no
    # eager df.count() driver action at construction time (the constructor
    # stays a pure logical-plan builder like every other operator here).
    # The count(*) subtree prunes to zero columns, so at 100 TB it resolves
    # from parquet footer row counts, not a data scan.
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    scored = (
        tf.join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.col("df").alias("doc_freq"),
            (
                F.col("tf").cast("double")
                * (
                    (F.col("n_docs") + F.lit(1)).cast("double")
                    / (F.col("df") + F.lit(1)).cast("double")
                )
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "tfidf", "rank")
    )


# ----------------------------------------------------------- heavy hitters

#: frequent-token cut: a token is a heavy hitter in its source when it is
#: ≥ 4% of the source's token mass (exact parts-per-million, int arithmetic)
HEAVY_HITTER_PPM = 40_000


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    threshold_ppm: int = HEAVY_HITTER_PPM,
) -> DataFrame:
    """Exact per-group frequent-token detection: tokens whose share of the
    group's token mass is at least ``threshold_ppm`` parts per million —
    the exact two-pass replacement for Misra-Gries/Count-Min heavy-hitter
    sketches when the group-token pair cardinality (≤ vocab × groups) is
    itself tractable, which for natural-language corpora it always is.

    Plan: one explode, then two aggregations over the SAME exploded pass —
    per-(group, token) counts shuffle on the pair key (map-side combined,
    so the shuffle carries at most |vocab × groups| rows per mapper, not
    the token stream), and per-group totals come from re-aggregating those
    pair counts (no second scan of the corpus). The tiny per-group totals
    broadcast back. Shares are exact BIGINT ppm — no float fold anywhere.
    """
    toks = df.select(
        F.col(group_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    pair_counts = toks.groupBy(group_col, "tok").agg(F.count(F.lit(1)).alias("n"))
    totals = pair_counts.groupBy(group_col).agg(F.sum("n").alias("n_total"))
    return (
        pair_counts.join(F.broadcast(totals), group_col)
        .select(
            group_col,
            "tok",
            "n",
            F.col("n_total").cast("long").alias("n_total"),
            F.expr("(n * 1000000L) div n_total").alias("share_ppm"),
        )
        .filter(F.col("share_ppm") >= threshold_ppm)
    )


# --------------------------------------------------------- inverted index

#: per-term posting-list cap for `inverted_index` (driver-facing audit cut).
POSTINGS_CAP = 20


def inverted_index(
    df: DataFrame, text_col: str = "text", postings_cap: int = POSTINGS_CAP
) -> DataFrame:
    """Term → posting-list index build: per term, its document frequency,
    total occurrence count, and the first ``postings_cap`` doc_ids.

    The retrieval-side primitive of the RAG/serving stack (tfidf_top_terms
    is the ranking view over the same relation; this materializes the
    index itself). Returns ``(term, doc_freq, total_tf, postings)``.

    Plan shape — the collect is CAPPED BEFORE it buffers: a naive
    ``slice(collect_list(doc_id))`` would gather every posting of a
    stop-word term into one aggregation buffer (the whole corpus for
    "the") before slicing. Instead a row_number window over the same
    term-key shuffle keeps only rank ≤ cap rows, so no aggregate ever
    holds more than ``postings_cap`` ids; the full tf relation separately
    folds to the exact doc_freq/total_tf stats with map-side combine.
    """
    pairs = df.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = pairs.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy("doc_id")
    posts = (
        tf.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= postings_cap)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return stats.join(posts, "term").select(
        "term", "doc_freq", "total_tf", "postings"
    )


def bigram_lift(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """X20: collocation mining — adjacent-token bigrams scored by exact
    integer LIFT (the monotone core of PMI without the logarithm):

        lift_ppm = n_bigram · N_tokens · 10⁶ div (n_w1 · n_w2)

    PMI = log2(lift/10⁶), so ranking by lift_ppm IS ranking by PMI while
    every emitted number stays an exact int64 that hashes bit-exact
    cross-engine (the SCALE.md no-transcendentals-in-hashed-projections
    rule).  The collocation signal feeds tokenizer-vocab candidates and
    boilerplate detection ("click here") in a curation pipeline.

    Plan: bigrams are built INSIDE the row as an array expression (zip
    of the token array with its tail — no self-join, no per-doc window),
    then one explode + two-level aggregate; unigram counts broadcast
    back onto the ≤|vocab|² bigram relation.  ``min_count`` prunes the
    hapax tail BEFORE the joins — the classic PMI-noise guard (rare
    pairs otherwise dominate any lift ranking).

    Overflow: n_bigram·N·10⁶ needs n_bigram·N < 9.2·10¹² — fine to
    ~10⁹-token corpora with 10³-count bigrams; beyond that drop the ppm
    scale to per-mille or pre-divide N (documented, same rationale as
    the A36 minute quantization).
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    grams = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        df.select(F.explode(grams).alias("g"))
        .select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_bigram")
    ).filter(F.col("n_bigram") >= min_count)
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    total = uni.agg(F.sum("n_w").alias("n_tokens"))
    return (
        big.join(
            F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("n_w", "n_w1")),
            "w1",
        )
        .join(
            F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("n_w", "n_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_bigram",
            "n_w1",
            "n_w2",
            F.expr("n_bigram * n_tokens * 1000000 div (n_w1 * n_w2)").alias(
                "lift_ppm"
            ),
        )
    )


# ----------------------------------------------------------------------
# X34: main-content extraction (boilerplate strip)
#
# The trafilatura/jusText stage reduced to deterministic, engine-
# portable string ops: tag strip by regexp, then a line-level
# boilerplate rule — a line is DROPPED when its stripped content is
# shorter than BOILER_MIN_CHARS (nav bars, footers, cookie banners) or
# its link density (chars of anchor text over content chars) reaches
# BOILER_LINK_PPM (link lists, "related articles" asides).  Reference
# parity target: the markup-leakage X32 *detects*, this *strips*
# (r15 verdict #4).

#: a stripped line shorter than this is boilerplate (jusText's
#: length-short rule)
BOILER_MIN_CHARS = 25
#: a line whose anchor-text share reaches this ppm is boilerplate
#: (jusText's link-density rule)
BOILER_LINK_PPM = 500_000
#: any markup tag
TAG_RE = "<[^>]*>"
#: an anchor element INCLUDING its text (for the link-density diff)
ANCHOR_RE = "<a[^>]*>[^<]*</a>"


def extract_main_content(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Text-in/text-out main-content extraction: adds

    - ``content``   — the kept lines, tag-stripped, newline-joined
    - ``raw_chars`` — length of the raw markup document
    - ``content_chars`` — Σ stripped length over KEPT lines
    - ``n_lines`` / ``n_boiler`` — line accounting

    All in-row higher-order functions over ``split(html, chr(10))`` —
    no explode, no shuffle, scan-speed on a 1000-executor cluster.
    Link density per line is length-difference arithmetic:
    anchor_chars = len(strip_tags(l)) − len(strip_tags(l with anchor
    elements removed)) — the same trick as the X32 class counts, so
    the DuckDB twin is exact (both engines replace ALL matches;
    DuckDB needs the 'g' flag)."""
    stats = (
        f"transform(split({html_col}, chr(10)), l -> named_struct("
        f" 'txt', regexp_replace(l, '{TAG_RE}', ''),"
        f" 'clen', length(regexp_replace(l, '{TAG_RE}', '')),"
        f" 'alen', length(regexp_replace(l, '{TAG_RE}', ''))"
        f"  - length(regexp_replace(regexp_replace(l, '{ANCHOR_RE}', ''),"
        f"           '{TAG_RE}', ''))))"
    )
    keep = (
        f"filter({stats}, s -> s.clen >= {BOILER_MIN_CHARS}"
        f" and s.alen * 1000000 div greatest(s.clen, 1)"
        f" < {BOILER_LINK_PPM})"
    )
    return df.select(
        "*",
        F.expr(
            f"array_join(transform({keep}, s -> s.txt), chr(10))"
        ).alias("content"),
        F.expr(f"length({html_col})").cast("long").alias("raw_chars"),
        F.expr(
            f"aggregate({keep}, 0L, (a, s) -> a + s.clen)"
        ).alias("content_chars"),
        F.expr(f"size(split({html_col}, chr(10)))")
        .cast("long")
        .alias("n_lines"),
        F.expr(
            f"size(split({html_col}, chr(10))) - size({keep})"
        )
        .cast("long")
        .alias("n_boiler"),
    )
