"""Corpus-curation operators for training-data pipelines.

The cleaning/filtering stages a 100 TB pretraining corpus goes through
between raw ingest and packing: benchmark decontamination (n-gram overlap
against a held-out evaluation set), repetition-based quality filtering
(Gopher-style duplicate/top n-gram fractions), PII detection + redaction,
per-stratum balanced sampling, and vocabulary construction.

These extend the reference's surface (it is a DB-observability engine with
no corpus tooling); they are first-class here per SURVEY §2.11.

Scale notes
-----------
- **Decontamination** never shuffles the corpus: the benchmark n-gram set is
  aggregated to ONE row (benchmarks are ~10⁴-10⁶ n-grams — MMLU-sized, not
  corpus-sized) and broadcast; overlap is then a per-row array intersection
  pipelined with the scan. At 100 TB this is scan-bound, the optimum.
- **Repetition stats** are pure per-row expressions (O(d·g) per doc where d
  = distinct n-grams — bounded by document length, not corpus size).
- **PII scan** is per-row regexp work inside WholeStageCodegen; the
  redacted text never shuffles.
- **Stratified sampling** joins a broadcast stratum-count relation (strata
  are low-cardinality by construction) and filters on the shared salted
  60-bit hash — deterministic under re-runs and repartitioning, like
  pipeline.hash_sample.
- **Vocabulary build** aggregates (term → count) — term dimension is tiny
  relative to the corpus — caps with TakeOrderedAndProject (orderBy+limit,
  no global-window sort), and ranks the ≤V survivors with a broadcast
  nested-loop self-join instead of an unpartitioned row_number window, so
  no stage ever funnels through a single task.

Cross-engine determinism: the shared 60-bit md5 hash
(:func:`datapipe.text.shared_hash60`); `floor()` before every double→long
cast (DuckDB CAST rounds, Spark truncates); ratios are int/int → double
divisions with fixed association order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe.text import shared_hash60

# ------------------------------------------------------------ constants ----

#: word n-gram width for benchmark decontamination ("13-gram overlap" style
#: exact-overlap checks, scaled to the synthetic corpus's ~55-token docs and
#: 31-word vocabulary so both classes actually occur)
DECON_NGRAM = 3

#: doc_id modulus that designates the held-out "benchmark" slice
DECON_BENCH_MOD = 25

#: Gopher-style repetition thresholds (tuned to the synthetic corpus's
#: distribution — dup2 p90≈0.065/max 0.133 — so both classes occur; the
#: *shape* — dup-fraction OR top-fraction trip — is the rule)
REP_DUP2_MAX = 0.09
REP_TOP2_MAX = 0.10

#: PII patterns (RE2-compatible: both Java regex and DuckDB accept these)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
PHONE_RE = "\\b555-\\d{4}\\b"

#: per-stratum target row count for balanced sampling
STRATA_TARGET = 3.0

#: token width of a dedup tile (the "line" unit for exact substring dedup)
TILE_TOKENS = 10

#: occurrence-key multiplier: doc_id · 10⁵ + tile_idx must be injective, so
#: documents are bounded at 10⁵ tiles (10⁶ tokens) — far beyond any web doc
TILE_IDX_SPAN = 100_000

#: vocabulary: minimum term frequency and vocabulary cap
VOCAB_MIN_COUNT = 3
VOCAB_CAP = 200


def _toks(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams of a token array as space-joined strings.

    Guarded for short docs: Spark ``sequence(1, 0)`` returns ``[1, 0]``
    (descending!), so the empty case is an explicit branch.

    ``toks`` is bound ONCE per row via the single-element
    ``transform(array(..), tk -> ..)`` wrapper: Spark does not hoist
    lambda-invariant subexpressions, so a caller passing a raw
    ``split(text, ' ')`` expression would otherwise re-tokenize the
    document once per gram position — O(L²) per row (r16 optimization
    round).  For callers that already pass a plain column attribute the
    wrapper is a no-op-cost identity.
    """
    def _grams(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1))
        grams = F.transform(idx, lambda i: F.array_join(F.slice(tk, i, n), " "))
        return F.when(F.size(tk) >= n, grams).otherwise(
            F.expr("cast(array() as array<string>)")
        )

    return F.element_at(F.transform(F.array(toks), _grams), 1)


# -------------------------------------------------------- decontamination --


def decontaminate(
    df: DataFrame,
    text_col: str = "text",
    n: int = DECON_NGRAM,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with the held-out benchmark slice (``doc_id % bench_mod == 0``).

    The standard eval-set overlap check (GPT-3 App. C / Gopher style): build
    the benchmark's n-gram set, mark a training doc contaminated if any of
    its n-grams appears in the set. N-grams are compared via the shared
    60-bit hash so only fixed-width longs ever move.

    Plan shape: the benchmark n-gram relation (small — benchmarks are
    MMLU-sized, not corpus-sized) broadcasts; the corpus's exploded distinct
    grams probe it through a broadcast HASH join — O(1) per gram. A first
    cut kept the bench set as one collected array and used a per-row
    ``array_contains`` filter: that is O(|bench|) per probe and measured
    **74 s vs 1 s** at sf0.1 — the hidden-quadratic trap this module's
    operators are designed to avoid. Overlap counts aggregate with map-side
    combine on ``doc_id``; zero-overlap docs rejoin via a left join on the
    narrow (doc_id, n_ngrams) relation.
    """
    toks = _toks(text_col)
    grams = F.array_distinct(
        F.transform(
            word_ngrams(toks, n), lambda g: shared_hash60(g)
        )
    )
    # persisted: the grams relation feeds three branches (bench set, probe
    # explode, per-doc size) and would otherwise re-tokenize + re-hash the
    # corpus per branch (same persist-for-reuse rationale as
    # dedup.minhash_signatures; measured 6 s -> 2 s at sf0.1). At 100 TB
    # this is the staged signatures table you'd materialize anyway.
    # Lifetime note: CacheManager dedups identical plans ("already cached"
    # on re-call), so repeat invocations over the same input share ONE
    # entry per distinct source rather than leaking per call.
    d = df.select("doc_id", grams.alias("_grams")).persist()
    bench_grams = (
        d.filter(F.col("doc_id") % bench_mod == 0)
        .select(F.explode("_grams").alias("g"))
        .distinct()
    )
    train = d.filter(F.col("doc_id") % bench_mod != 0)
    hits = (
        train.select("doc_id", F.explode("_grams").alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    overlap = F.coalesce(F.col("_hits"), F.lit(0))
    return (
        train.select("doc_id", F.size("_grams").cast("long").alias("n_ngrams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            overlap.cast("long").alias("n_overlap"),
            (overlap > 0).alias("contaminated"),
        )
    )


# ------------------------------------------------------- repetition stats --


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document.

    - ``dup_2gram_frac`` / ``dup_3gram_frac``: fraction of n-gram slots
      occupied by repeats (1 − distinct/total).
    - ``top_2gram_frac``: fraction of slots taken by the single most
      frequent 2-gram (the "fraction of characters in most common n-gram"
      rule, in token space).
    - ``repetitive``: trips when either signal exceeds its threshold.

    Plan shape: explode to (doc_id, width, gram) rows → count per gram →
    per-doc slots/distinct/top in a second aggregation. Both shuffles have
    map-side partial aggregation and high-cardinality skew-free keys. A
    first cut computed the top-gram count as a per-row
    ``transform(distinct, d -> size(filter(g, =d)))`` — O(L²) per document
    and evaluated once per referencing expression, measuring 7.4 s vs ~1 s
    at sf0.1; with real web docs (10³-10⁴ tokens) the per-row quadratic is
    the difference between scan-bound and dead.
    """
    toks = _toks(text_col)
    base = df.select("doc_id", toks.alias("_toks"))
    grams = base.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(2).alias("w"), word_ngrams(F.col("_toks"), 2).alias("g")),
                F.struct(F.lit(3).alias("w"), word_ngrams(F.col("_toks"), 3).alias("g")),
            )
        ).alias("wg"),
    ).select("doc_id", F.col("wg.w").alias("w"), F.explode("wg.g").alias("gram"))
    per_gram = grams.groupBy("doc_id", "w", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy("doc_id", "w").agg(
        F.sum("c").alias("slots"),
        F.count(F.lit(1)).alias("distinct_g"),
        F.max("c").alias("top_c"),
    )
    stats = (
        per_doc.groupBy("doc_id")
        .pivot("w", [2, 3])
        .agg(
            F.first("slots").alias("slots"),
            F.first("distinct_g").alias("distinct"),
            F.first("top_c").alias("top"),
        )
    )
    # docs too short for any 2-gram produce no exploded rows: rejoin and zero
    d2 = F.coalesce(F.col("2_slots"), F.lit(0))
    d3 = F.coalesce(F.col("3_slots"), F.lit(0))
    dup2 = F.when(
        d2 > 0, F.lit(1.0) - F.col("2_distinct").cast("double") / d2
    ).otherwise(F.lit(0.0))
    dup3 = F.when(
        d3 > 0, F.lit(1.0) - F.col("3_distinct").cast("double") / d3
    ).otherwise(F.lit(0.0))
    top_c = F.coalesce(F.col("2_top"), F.lit(0))
    top2 = F.when(d2 > 0, top_c.cast("double") / d2).otherwise(F.lit(0.0))
    # the top-fraction rule only fires when the top gram actually repeats —
    # otherwise every short all-distinct doc trips on 1/n
    return (
        base.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            dup2.alias("dup_2gram_frac"),
            dup3.alias("dup_3gram_frac"),
            top2.alias("top_2gram_frac"),
            (
                (dup2 > REP_DUP2_MAX) | ((top2 > REP_TOP2_MAX) & (top_c >= 2))
            ).alias("repetitive"),
        )
    )


# ---------------------------------------------------------------- PII scan --


def with_synthetic_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically inject PII-shaped spans (the image/audio stub
    pattern: the container has no real PII corpus, so the fixture derives
    from ``doc_id`` — every doc gets an email, every 3rd an IPv4, every 5th
    a phone number), producing the ``enriched`` column the scanner reads."""
    did = F.col("doc_id")
    enriched = F.concat(
        F.col(text_col),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@mail.example.com"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" ip 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" tel 555-"), F.lpad((did % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    return df.withColumn("enriched", enriched)


def pii_scan(df: DataFrame, text_col: str = "enriched") -> DataFrame:
    """PII detection + redaction: count and mask emails, IPv4s, phone
    numbers. Counts and the redacted text's (length, 60-bit hash) are the
    verifiable output; the redaction itself is chained ``regexp_replace``
    (email → ip → phone, fixed order) inside WholeStageCodegen."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
        shared_hash60(redacted).alias("redacted_hash"),
    )


# ------------------------------------------------------ stratified sample --


def stratified_sample(
    df: DataFrame,
    strata: tuple[str, ...] = ("lang", "source"),
    target: float = STRATA_TARGET,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum balanced sampling: each stratum keeps ~``target`` rows,
    so over-represented strata are downsampled and rare strata survive
    whole — the rebalancing pass a source/language-skewed crawl needs.

    fraction = min(1, target / stratum_n); keep iff
    ``hash60(salt:key) % 1e6 < floor(fraction · 1e6)``. The integer
    threshold avoids double comparison drift; ``floor`` before the long
    cast because DuckDB CAST rounds where Spark truncates.

    Plan: one broadcast join of the (tiny) stratum-count relation + a
    per-row hash filter. The corpus shuffles zero times. The join keys are
    ``eqNullSafe``: a NULL stratum (unknown lang/source) is a legitimate
    stratum and must be SAMPLED, not silently dropped the way a plain
    equi-join's NULL = NULL would (the same reasoning as write_corpus's
    window-based stratum counts).
    """
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("stratum_n"))
    d, c = df.alias("d"), F.broadcast(counts.alias("c"))
    cond = None
    for col in strata:
        eq = F.col(f"d.{col}").eqNullSafe(F.col(f"c.{col}"))
        cond = eq if cond is None else (cond & eq)
    joined = d.join(c, cond).select("d.*", "c.stratum_n")
    thr = F.floor(
        F.least(F.lit(1.0), F.lit(target) / F.col("stratum_n")) * F.lit(1_000_000)
    )
    keep = (
        shared_hash60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
        % 1_000_000
    ) < thr
    return joined.filter(keep).select(
        key_col, *strata, F.col("stratum_n").cast("long").alias("stratum_n")
    )


# -------------------------------------------------- tile (substring) dedup --


def tile_dedup(df: DataFrame, text_col: str = "text", tile: int = TILE_TOKENS) -> DataFrame:
    """Exact sub-document dedup: drop repeated text *tiles* across the whole
    corpus, keeping each tile's first global occurrence (RefinedWeb/CCNet
    line-dedup, re-expressed over fixed-width token tiles since the corpus
    has no line structure).

    Documents are cut into non-overlapping ``tile``-token tiles; a tile that
    already occurred anywhere earlier (lowest (doc_id, tile_idx)) is removed
    and the survivors are reassembled in order.

    Plan shape: explode to (doc_id, tile_idx, tile) → ONE hash-partitioned
    window over ``tile_hash`` (near-unique key, no skew) to find each tile's
    first occurrence → one groupBy(doc_id) to reassemble. Two shuffles
    total, both on high-cardinality keys; "first occurrence" is an int64
    min over the injective key ``doc_id·TILE_IDX_SPAN + tile_idx`` — no
    struct comparison, deterministic everywhere.
    """
    from pyspark.sql.window import Window

    # tokenization bound ONCE per row (single-element transform wrapper):
    # the naive form re-split the text once per tile (r16 optimization
    # round; same lambda-invariant-hoisting fix as dedup.shingle_set)
    tiles = F.element_at(
        F.transform(
            F.array(_toks(text_col)),
            lambda tk: F.transform(
                F.sequence(
                    F.lit(1),
                    F.floor(
                        (F.size(tk) + F.lit(tile - 1)) / F.lit(tile)
                    ).cast("int"),
                ),
                lambda i: F.array_join(
                    F.slice(tk, (i - F.lit(1)) * tile + 1, tile), " "
                ),
            ),
        ),
        1,
    )
    ex = df.select(
        "doc_id", F.posexplode(tiles).alias("_pos", "tile")
    ).select(
        "doc_id",
        (F.col("_pos") + 1).alias("tile_idx"),
        "tile",
        shared_hash60(F.col("tile")).alias("tile_hash"),
    )
    occ = F.col("doc_id") * TILE_IDX_SPAN + F.col("tile_idx")
    w = Window.partitionBy("tile_hash")
    marked = ex.withColumn("_keep", occ == F.min(occ).over(w))
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_keep"), F.struct("tile_idx", "tile"))
                )
            ),
            lambda x: x.getField("tile"),
        ),
        " ",
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tiles"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.sum(
            F.when(F.col("_keep"), F.size(F.split(F.col("tile"), " ")))
            .otherwise(F.lit(0))
            .cast("long")
        ).alias("n_kept_tokens"),
        F.length(kept_text).cast("long").alias("dedup_len"),
        shared_hash60(kept_text).alias("dedup_hash"),
    )


# ------------------------------------------------------- vocabulary build --


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = VOCAB_MIN_COUNT,
    cap: int = VOCAB_CAP,
) -> DataFrame:
    """Corpus vocabulary over unigrams + bigrams: term frequency, document
    frequency, and a dense ``vocab_id`` by (count desc, term asc).

    Plan shape, chosen for scale:
    - explode → groupBy(term): the only corpus-wide shuffle, on the tiny
      term dimension (map-side partial aggregation applies).
    - the cap is ``orderBy(count desc, term).limit(cap)`` —
      TakeOrderedAndProject, NOT a global sort.
    - ``vocab_id`` = 1 + number of strictly-preceding survivors, via a
      broadcast nested-loop self-join over the ≤cap rows — deliberately not
      an unpartitioned ``row_number`` window (which would funnel the
      relation through one task and warn; see VERDICT r1 item 4). cap² ≤
      4·10⁴ comparisons here, bounded by cap, not the corpus.
    """
    toks = _toks(text_col)
    terms = F.concat(toks, word_ngrams(toks, 2))
    pairs = df.select("doc_id", F.explode(terms).alias("term"))
    counts = (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("term_count"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("term_count") >= min_count)
    )
    # persisted: `top` feeds BOTH sides of the rank self-join, and the
    # subtree above it (corpus explode + term aggregation) is the expensive
    # part — without the cache it executes twice per query.
    # Lifetime note: CacheManager dedups identical plans, so the cached
    # relation is one entry per distinct source corpus, not per call; in a
    # long-lived session iterating over MANY distinct corpora, entries
    # accumulate until executor storage evicts them (LRU) — call
    # spark.catalog.clearCache() between corpora if that pressure matters.
    top = counts.orderBy(F.desc("term_count"), F.asc("term")).limit(cap).persist()
    a, b = top.alias("a"), top.alias("b")
    before = (F.col("b.term_count") > F.col("a.term_count")) | (
        (F.col("b.term_count") == F.col("a.term_count"))
        & (F.col("b.term") < F.col("a.term"))
    )
    return (
        a.join(F.broadcast(b), before, "left")
        .groupBy("a.term", "a.term_count", "a.doc_freq")
        .agg((F.count("b.term") + 1).alias("vocab_id"))
        .select("term", "term_count", "doc_freq", "vocab_id")
    )


def oov_rate(
    df: DataFrame, vocab: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a capped vocabulary —
    tokenizer/vocab evaluation: which documents a vocabulary fails to
    cover, and by how much (exact parts-per-million, no floats).

    Unigram tokens probe the vocab's ``term`` column via a BROADCAST left
    join (the vocab is ≤ cap rows by construction); per-doc aggregation is
    the only shuffle, keyed on doc_id with map-side partials. At 100 TB:
    one corpus scan, one bounded broadcast, one aggregation — no
    corpus-side join shuffle.
    """
    pairs = df.select("doc_id", F.explode(_toks(text_col)).alias("term"))
    v = vocab.select("term", F.lit(True).alias("_in_vocab"))
    return (
        pairs.join(F.broadcast(v), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
        )
        .withColumn("oov_ppm", F.expr("n_oov * 1000000 div n_tokens"))
    )


# --------------------------------------------------- unigram LM surprisal --

#: surprisal weight quantization: weight(token) = (N_tokens · SCALE) div count
SURPRISAL_SCALE = 1_000


def surprisal_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model-based quality scoring: per-document mean unigram improbability,
    the corpus acting as its own language model (the cheap stand-in for the
    perplexity filters web pipelines run with a small LM).

    Per token, weight = ``(N · SCALE) div count(token)`` — the reciprocal
    unigram probability, integer-quantized. Rare-token-heavy documents
    score high (surprising), common-word documents low. The monotone
    reciprocal replaces log-perplexity because ln() differs at ULP level
    between libm implementations (same rationale as tf-idf's rational idf);
    rankings are preserved.

    Determinism: weights are exact int64, so the per-doc SUM is order-free
    — safe under any partitioning, no float fold needed anywhere.

    Plan: explode → broadcast-join the (tiny) unigram count relation →
    one map-side-combined sum per doc; N folds in as a broadcast 1-row
    aggregate (no driver-side count action).
    """
    toks = _toks(text_col)
    pairs = df.select("doc_id", F.explode(toks).alias("term"))
    counts = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = pairs.agg(F.count(F.lit(1)).alias("n_total"))
    weighted = (
        pairs.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr(f"(n_total * {SURPRISAL_SCALE}) div cnt").alias("w"),
        )
    )
    return weighted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("w").alias("surprisal_q"),
        (F.sum("w").cast("double") / F.count(F.lit(1))).alias("mean_surprisal"),
    )


def bigram_surprisal_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X21: conditional (bigram) surprisal — the second rung on the
    corpus-as-its-own-LM ladder above :func:`surprisal_score`: per
    adjacent token pair, weight = ``(count(prev) · SCALE) div
    count(prev, next)`` — the reciprocal CONDITIONAL probability
    P(next|prev), integer-quantized.  Documents whose word ORDER is
    unusual score high even when every individual word is common — the
    signal that separates shuffled/template text from fluent prose,
    which the unigram score cannot see.  Same monotone-reciprocal
    rationale as the unigram operator (integer rationals instead of
    log-perplexity: libm ln() differs at ULP level across engines;
    rankings are preserved).

    Determinism: weights are exact int64; per-doc sums are order-free.
    Plan: bigrams zip INSIDE the row (arrays_zip of the token array
    against its own tail — no explode before pairing, the X20 move);
    the bigram count relation is |vocab-pairs|-bounded and the unigram
    counts broadcast onto it; docs with < 2 tokens contribute zero
    bigrams and surface with n_bigrams = 0 via the left join."""
    toks = _toks(text_col)
    pairs = df.select(
        "doc_id",
        F.explode(
            # short-doc guard: sequence(1, 0) is DESCENDING in Spark, so
            # generate >= 1 element and slice back to the true length.
            # The split is bound ONCE via the single-element transform
            # wrapper (Spark does not hoist lambda-invariant
            # subexpressions: the naive form re-split the text twice per
            # bigram position — O(L²) per row; r16 optimization round).
            F.expr(
                f"element_at(transform(array(split({text_col}, ' ')), tk ->"
                f" slice(transform("
                f"  sequence(1, greatest(size(tk) - 1, 1)),"
                f"  i -> named_struct("
                f"    'prev', element_at(tk, i),"
                # try_: the over-generated guard element indexes past the
                # array end on 1-token docs (ANSI element_at raises)
                f"    'next', try_element_at(tk, i + 1))),"
                f" 1, greatest(size(tk) - 1, 0))), 1)"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.next").alias("next"))
    uni = df.select(F.explode(toks).alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).alias("u_cnt")
    )
    # unigram counts as the CONDITIONING denominator must count every
    # token occurrence, including each document's final token
    bi = pairs.groupBy("prev", "next").agg(F.count(F.lit(1)).alias("b_cnt"))
    weighted = (
        pairs.join(F.broadcast(bi), ["prev", "next"])
        .join(F.broadcast(uni.withColumnRenamed("term", "prev")), "prev")
        .select(
            "doc_id",
            F.expr(f"(u_cnt * {SURPRISAL_SCALE}) div b_cnt").alias("w"),
        )
    )
    agg = weighted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("w").alias("surprisal_q"),
    )
    return (
        df.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("surprisal_q", F.lit(0)).alias("surprisal_q"),
            F.when(
                F.col("n_bigrams").isNotNull(),
                F.col("surprisal_q").cast("double") / F.col("n_bigrams"),
            ).alias("mean_surprisal"),
        )
    )


# ------------------------------------------------------ weighted sampling --

#: weighted-sample acceptance scale: P(keep) = min(1, rate · quality)
WEIGHTED_RATE = 1.2


def weighted_sample(
    df: DataFrame,
    weight: Column,
    rate: float = WEIGHTED_RATE,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Importance sampling: keep each row with probability
    ``min(1, rate · weight)`` — how curation pipelines up-weight
    high-quality documents without hard thresholds (soft quality filtering,
    as in the FineWeb/DCLM mixing recipes).

    Deterministic like every sampler here: acceptance compares the salted
    60-bit hash against a per-row integer threshold
    (``floor`` before the long cast — DuckDB CAST rounds, Spark truncates).
    Re-runs, repartitioning, and engine choice cannot change membership.
    Pure per-row expression: zero shuffles.
    """
    thr = F.floor(
        F.least(F.lit(1.0), F.lit(rate) * weight) * F.lit(1_000_000)
    )
    keep = (
        shared_hash60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
        % 1_000_000
    ) < thr
    return df.filter(keep)


# --------------------------------------------- fixed-k priority sampling --

def priority_sample(
    df: DataFrame,
    k: int,
    weight: Column,
    group_cols: tuple[str, ...] = (),
    key_col: str = "doc_id",
    salt: str = "psample",
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement: exactly k rows
    (per group), inclusion odds ~ proportional to ``weight`` — priority
    sampling (Duffield-Lund-Thorup) with integer-quantized priorities.
    The fixed-budget counterpart to ``weighted_sample``'s Bernoulli pass
    (random size there, exact k here): "give me k docs per source,
    favouring the long/high-quality ones" is a budgeted-curation
    primitive, not a rate.

    Each row draws the deterministic uniform u = hash60(salt:key) in
    [0, 2^60) and competes on the integer key u DIV w (w = weight cast
    long, rows with w <= 0 excluded); the k SMALLEST keys win — doubling
    w halves the key, ~doubling selection odds.  The classic A-ES /
    priority formulation compares u^(1/w) or w/u, which either drags
    transcendentals into the selection order (ln ulp drift between
    engines — the SCALE.md r8 lesson) or needs exact rational compare;
    integer floor-division keeps the order bit-reproducible in ANSI SQL
    at the cost of quantization ties, broken deterministically by key.

    Plan: ungrouped -> global orderBy+limit = TakeOrderedAndProject
    (per-partition top-k then a k-row merge, never a global sort);
    grouped -> one exchange on the group key + row_number.  Zero joins.
    """
    from pyspark.sql.window import Window

    w = weight.cast("long")
    u = shared_hash60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    out = (
        df.filter(w > 0)
        .withColumn("_u", u)
        .withColumn("_w", w)
        # integer DIV, not float division: u is 60-bit and a double
        # quotient's floor can land one off an exact multiple, which
        # would flip selection near quantization boundaries
        .withColumn("prio", F.expr("_u DIV _w"))
        .drop("_u", "_w")
    )
    if group_cols:
        rn = F.row_number().over(
            Window.partitionBy(*group_cols).orderBy("prio", key_col)
        )
        return out.withColumn("rn", rn).filter(F.col("rn") <= k).drop("rn")
    return out.orderBy("prio", key_col).limit(k)


# ---------------------------------------------- composite quality filter ---

#: reason bits for quality_filter (C4/Gopher-style heuristic rules)
QF_TOO_FEW_WORDS = 1
QF_MEAN_WORD_LEN = 2
QF_LOW_ALPHA = 4
QF_HIGH_DIGIT = 8

QF_MIN_WORDS = 5
QF_MEAN_LEN_LO = 2   # mean word length lower bound (inclusive)
QF_MEAN_LEN_HI = 12  # upper bound (inclusive)


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/Gopher-style composite quality gate with a REASONS bitmask —
    the per-document filter pass every pretraining corpus goes through,
    kept auditable (why was this dropped?) instead of a bare boolean.

    Rules (bit set = rule violated):

    - ``QF_TOO_FEW_WORDS``: fewer than 5 whitespace words;
    - ``QF_MEAN_WORD_LEN``: mean word length outside [2, 12] — gibberish
      or minified blobs (compared in exact integer cross-multiplication:
      ``chars < 2·n`` / ``chars > 12·n``, no float division anywhere);
    - ``QF_LOW_ALPHA``: alphabetic characters under half the text
      (``2·alpha < len``);
    - ``QF_HIGH_DIGIT``: digits over 30% (``10·digits > 3·len``).

    Pure per-row expressions in codegen — zero shuffles, zero UDFs; the
    bit arithmetic is identical in the DuckDB oracle.
    """
    toks = _toks(text_col)
    n_words = F.size(toks).cast("long")
    total_len = F.length(F.col(text_col)).cast("long")
    word_chars = F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("long")
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("long")
    digits = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast("long")
    reasons = (
        F.when(n_words < QF_MIN_WORDS, QF_TOO_FEW_WORDS).otherwise(0)
        + F.when(
            (word_chars < QF_MEAN_LEN_LO * n_words)
            | (word_chars > QF_MEAN_LEN_HI * n_words),
            QF_MEAN_WORD_LEN,
        ).otherwise(0)
        + F.when(2 * alpha < total_len, QF_LOW_ALPHA).otherwise(0)
        + F.when(10 * digits > 3 * total_len, QF_HIGH_DIGIT).otherwise(0)
    )
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        reasons.cast("long").alias("reasons"),
        (reasons == 0).alias("kept"),
    )


# ------------------------------------------------------- language mixture --


def language_mixture(df: DataFrame) -> DataFrame:
    """Per-source language composition: (source, lang, n_docs, share_ppm)
    — the mixture report a multilingual corpus needs before setting
    sampling weights.

    ``share_ppm`` is exact integer arithmetic (``n·10⁶ div total``; Spark
    ``div`` ≡ DuckDB ``//`` truncating division), so the result hashes
    bit-identically across engines. Source totals come from a window over
    the aggregated (source, lang) relation — tiny, and NULL-safe the way
    a self-join would not be.
    """
    counts = df.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return language_mixture_shares(counts)


def language_mixture_shares(counts: DataFrame) -> DataFrame:
    """The share expression of :func:`language_mixture` over an
    already-aggregated (source, lang, n_docs) relation — shared with the
    T41 streaming twin, whose complete-mode count aggregation drains into
    exactly this shape (one expression, so batch and live shares can
    never drift)."""
    from pyspark.sql.window import Window

    total = F.sum("n_docs").over(Window.partitionBy("source"))
    return counts.select(
        "source",
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        total.cast("long").alias("_tot"),
    ).select(
        "source",
        "lang",
        "n_docs",
        # decimal(38,0) widen before the ×10⁶ so the share stays exact past
        # int64 doc counts (`div` on decimal returns BIGINT, truncating —
        # DuckDB `//` semantics for the non-negative operands here).
        F.expr("(cast(n_docs as decimal(38,0)) * 1000000) div _tot").alias(
            "share_ppm"
        ),
    )


def mixture_plan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Domain-mixture sampling plan: per-source keep rates that realize a
    uniform target mixture WITHOUT upsampling any source.

    The pretraining-mix planning step: given available tokens per source
    and a target share per source, the largest achievable corpus is
    ``T* = min_s avail_s·10⁶ ÷ share_ppm_s`` (the scarcest source binds);
    every source then keeps ``share_ppm_s·T* ÷ 10⁶`` tokens, i.e. sampling
    rate ``keep_s·10⁶ ÷ avail_s`` ppm. All exact integer arithmetic — the
    plan is reproducible bit-for-bit and feeds corpus_weighted_sample /
    corpus_stratified_sample as the rate table.

    Plan shape: one groupBy(source) over the corpus (token counts are a
    per-row codegen expression), then a broadcast 1-row scalar join for
    the binding minimum — no second corpus scan, no window, no collect.
    """
    avail = (
        df.select(
            "source", F.size(_toks(text_col)).cast("long").alias("n_tokens")
        )
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("avail_tokens"))
    )
    n_src = avail.agg(F.count(F.lit(1)).alias("n_sources"))
    shared = avail.join(F.broadcast(n_src)).withColumn(
        "target_ppm", F.expr("1000000L div n_sources")
    )
    # Every ×10⁶ product is widened to decimal(38,0) first: avail_tokens
    # grows linearly with the corpus, so the bare int64 multiply would wrap
    # past ~9.2·10¹² tokens per source (Spark non-ANSI wraps silently while
    # DuckDB raises). `div` on decimal returns BIGINT — exact while T* and
    # keep_tokens themselves fit int64, i.e. corpora up to ~9.2·10¹⁸ tokens.
    tstar = shared.agg(
        F.min(
            F.expr("(cast(avail_tokens as decimal(38,0)) * 1000000) div target_ppm")
        ).alias("t_star")
    )
    return (
        shared.join(F.broadcast(tstar))
        .withColumn(
            "keep_tokens",
            F.expr("(cast(target_ppm as decimal(38,0)) * t_star) div 1000000"),
        )
        .select(
            "source",
            "avail_tokens",
            "target_ppm",
            "keep_tokens",
            F.expr(
                "least(1000000L,"
                " (cast(keep_tokens as decimal(38,0)) * 1000000) div avail_tokens)"
            ).alias("rate_ppm"),
        )
        .orderBy("source")
    )


# ------------------------------------- embedding-level decontamination ----

#: default sign-LSH geometry / cosine cut for embedding decontamination.
#: Production embeddings use a ~0.9 cut; the synthetic corpus's max
#: train↔eval cosine is ~0.45 (its near-dup pairs land inside one label,
#: and the %-mod eval split rarely separates them), so the gate threshold
#: sits where the operator's screen genuinely fires at every test SF.
DECON_EMB_BITS = 4
DECON_EMB_THRESHOLD = 0.3


def decontaminate_embedding(
    emb: DataFrame,
    bits: int = DECON_EMB_BITS,
    threshold: float = DECON_EMB_THRESHOLD,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """Embedding-level benchmark decontamination: flag training vectors
    whose cosine similarity to ANY held-out eval vector (``vec_id %
    bench_mod == 0``) reaches ``threshold``.

    The semantic sibling of :func:`decontaminate` — n-gram overlap misses
    paraphrased eval leakage, embedding cosine catches it (the screen
    modern pretraining pipelines run alongside exact-match decon).
    Returns one audit row per (train, eval) hit: ``(train_id, eval_id,
    cos_sim)``.

    Plan shape: the eval side is benchmark-sized (MMLU, not corpus), so it
    is BROADCAST; candidates are restricted to the eval vector's sign-LSH
    bucket (datapipe.similarity geometry), so each training vector probes
    only the hash-colliding slice of the bench set instead of all of it —
    at 100 TB the corpus scan is the whole cost, exactly like the n-gram
    path. Cosine uses the bit-exact left-fold dot (datapipe.vectors), so
    the threshold compare is engine-identical.
    """
    from project_obsidian_core_spark.datapipe import similarity as S
    from project_obsidian_core_spark.datapipe import vectors as V

    base = emb.select(
        "vec_id",
        "embedding",
        S.lsh_bucket("embedding", bits).alias("bucket"),
        V.norm(F.col("embedding")).alias("nrm"),
    )
    ev = base.filter(F.col("vec_id") % bench_mod == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("ev"),
        F.col("nrm").alias("e_nrm"),
        "bucket",
    )
    train = base.filter(F.col("vec_id") % bench_mod != 0).select(
        F.col("vec_id").alias("train_id"),
        F.col("embedding").alias("tv"),
        F.col("nrm").alias("t_nrm"),
        "bucket",
    )
    cos = V.cosine_prenormed(
        V.dot(F.col("tv"), F.col("ev")), F.col("t_nrm"), F.col("e_nrm")
    )
    return (
        train.join(F.broadcast(ev), "bucket")
        .select("train_id", "eval_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )


# ----------------------------------------- X19: k-anonymity risk report --
def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], ks: tuple[int, ...] = (2, 5, 10)
) -> DataFrame:
    """Re-identification risk report over a quasi-identifier tuple — the
    privacy gate a training-data release runs next to the PII scan (X8):
    a row whose QI combination is shared by fewer than k rows is
    k-anonymity-violating (Sweeney 2002); publishing it risks linkage.

    One corpus scan: groupBy the QI columns (map-side combined to one row
    per equivalence class), then ONE reduction over the class sizes emits
    every threshold's numbers (conditional aggregates, the dq_report
    shape), stacked to a driver-sized (k, classes_below, rows_below,
    classes_total, rows_total, risk_ppm) report — all exact ints, rule
    count never adds passes.
    """
    sizes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).alias("cls")
    )
    aggs = [
        F.count(F.lit(1)).alias("classes_total"),
        F.sum("cls").alias("rows_total"),
    ]
    for k in ks:
        aggs.append(
            F.sum(F.when(F.col("cls") < k, 1).otherwise(0))
            .cast("long")
            .alias(f"cb_{k}")
        )
        aggs.append(
            F.sum(F.when(F.col("cls") < k, F.col("cls")).otherwise(0))
            .cast("long")
            .alias(f"rb_{k}")
        )
    row = sizes.agg(*aggs)
    stack = ", ".join(f"{k}L, cb_{k}, rb_{k}" for k in ks)
    return row.select(
        F.expr(
            f"stack({len(ks)}, {stack}) as (k, classes_below, rows_below)"
        ),
        F.col("classes_total"),
        F.col("rows_total"),
    ).select(
        "k",
        "classes_below",
        "rows_below",
        "classes_total",
        "rows_total",
        F.expr("rows_below * 1000000 div rows_total").alias("risk_ppm"),
    )
