"""Driver-facing query wrappers for the corpus-curation operators.

Every oracle SQL string is generated from the SAME constants as the Spark
operator (n-gram widths, thresholds, regexes, targets) so the two sides
cannot drift. Determinism rules per plans/common.py; notable here:
``floor()`` before every double→long cast (DuckDB CAST rounds, Spark
truncates) and the shared 60-bit md5 hash for every string that becomes a
join/compare key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from project_obsidian_core_spark.datapipe import curation as C
from project_obsidian_core_spark.plans.common import load

#: DuckDB twin of datapipe.text.shared_hash60 — single definition shared
#: with the pipeline oracles so the two families cannot drift
from project_obsidian_core_spark.plans.pipeline_queries import (  # noqa: E402
    _sql_hash60 as _h60,
)


def _ngrams(toks: str, n: int) -> str:
    """DuckDB word-n-gram list comprehension (empty for short docs, matching
    the Spark operator's guarded branch)."""
    return (
        f"[array_to_string({toks}[i:i+{n - 1}], ' ') "
        f"FOR i IN generate_series(1, len({toks}) - {n - 1})]"
    )


# --------------------------------------------------------- decontamination
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram overlap decontamination over documents."""
    return C.decontaminate(load(spark, sf_dir, "documents")).orderBy("doc_id")


ORACLE_corpus_decontaminate = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g0 AS (
    SELECT doc_id, {_ngrams('toks', C.DECON_NGRAM)} AS grams FROM t
), g AS (
    SELECT doc_id,
           list_distinct(list_transform(grams, s -> {_h60('s')})) AS grams
    FROM g0
), bench AS (
    SELECT list(DISTINCT gg) AS bl
    FROM (SELECT unnest(grams) AS gg FROM g WHERE doc_id % {C.DECON_BENCH_MOD} = 0)
)
SELECT doc_id,
       len(grams) AS n_ngrams,
       len(list_filter(grams, x -> list_contains(bl, x))) AS n_overlap,
       len(list_filter(grams, x -> list_contains(bl, x))) > 0 AS contaminated
FROM g CROSS JOIN bench
WHERE doc_id % {C.DECON_BENCH_MOD} <> 0
ORDER BY doc_id
"""


# -------------------------------------------------------- repetition stats
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate/top n-gram fractions per document."""
    return C.repetition_stats(load(spark, sf_dir, "documents")).orderBy("doc_id")


ORACLE_text_repetition_stats = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
    SELECT doc_id,
           {_ngrams('toks', 2)} AS g2,
           {_ngrams('toks', 3)} AS g3
    FROM t
), f AS (
    SELECT doc_id,
           CASE WHEN len(g2) > 0
                THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
                ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(g3) > 0
                THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
                ELSE 0.0 END AS dup_3gram_frac,
           CASE WHEN len(g2) > 0
                THEN CAST(list_max(list_transform(list_distinct(g2),
                          d -> len(list_filter(g2, x -> x = d)))) AS DOUBLE) / len(g2)
                ELSE 0.0 END AS top_2gram_frac,
           CASE WHEN len(g2) > 0
                THEN list_max(list_transform(list_distinct(g2),
                          d -> len(list_filter(g2, x -> x = d))))
                ELSE 0 END AS top_count
    FROM g
)
SELECT doc_id, dup_2gram_frac, dup_3gram_frac, top_2gram_frac,
       (dup_2gram_frac > {C.REP_DUP2_MAX}
        OR (top_2gram_frac > {C.REP_TOP2_MAX} AND top_count >= 2)) AS repetitive
FROM f
ORDER BY doc_id
"""


# ---------------------------------------------------------------- PII scan
def pii_scan_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over the deterministic synthetic-PII fixture."""
    docs = C.with_synthetic_pii(load(spark, sf_dir, "documents"))
    return C.pii_scan(docs).orderBy("doc_id")


ORACLE_pii_scan_redact = f"""
WITH e AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
           || CASE WHEN doc_id % 3 = 0
                   THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                        || CAST((doc_id * 7) % 256 AS VARCHAR)
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END AS enriched
    FROM documents
), r AS (
    SELECT doc_id, enriched,
           regexp_replace(regexp_replace(regexp_replace(enriched,
               '{C.EMAIL_RE}', '<EMAIL>', 'g'),
               '{C.IPV4_RE}', '<IP>', 'g'),
               '{C.PHONE_RE}', '<PHONE>', 'g') AS red
    FROM e
)
SELECT doc_id,
       len(regexp_extract_all(enriched, '{C.EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(enriched, '{C.IPV4_RE}')) AS n_ips,
       len(regexp_extract_all(enriched, '{C.PHONE_RE}')) AS n_phones,
       length(red) AS redacted_len,
       {_h60('red')} AS redacted_hash
FROM r
ORDER BY doc_id
"""


# ------------------------------------------------------- stratified sample
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source)-stratum balanced hash sampling."""
    return C.stratified_sample(load(spark, sf_dir, "documents")).orderBy("doc_id")


ORACLE_corpus_stratified_sample = f"""
WITH c AS (
    SELECT lang, source, count(*) AS stratum_n
    FROM documents GROUP BY lang, source
), j AS (
    -- IS NOT DISTINCT FROM mirrors the operator's eqNullSafe join keys:
    -- NULL strata are sampled, not dropped
    SELECT d.doc_id, d.lang, d.source, c.stratum_n
    FROM documents d JOIN c
      ON d.lang IS NOT DISTINCT FROM c.lang
     AND d.source IS NOT DISTINCT FROM c.source
)
SELECT doc_id, lang, source, stratum_n
FROM j
WHERE {_h60("'strat:' || CAST(doc_id AS VARCHAR)")} % 1000000
      < CAST(floor(least(1.0, {C.STRATA_TARGET} / stratum_n) * 1000000) AS BIGINT)
ORDER BY doc_id
"""


# ----------------------------------------------------- tile substring dedup
def corpus_tile_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact tile dedup with in-order reassembly."""
    return C.tile_dedup(load(spark, sf_dir, "documents")).orderBy("doc_id")


def _tile_chain(rel: str) -> str:
    """Tile-dedup CTE chain over any (doc_id, text) relation, ending in a
    CTE named ``tile_agg`` with (doc_id, n_tiles, n_kept, n_kept_tokens,
    kept_text). Reused verbatim by the v2 end-to-end pipeline so the
    standalone gate and the composition cannot drift."""
    return f"""tsrc AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM {rel}
), tl0 AS (
    SELECT doc_id,
           unnest([{{'idx': i, 'tile': array_to_string(
                       toks[((i - 1) * {C.TILE_TOKENS} + 1):(i * {C.TILE_TOKENS})], ' ')}}
                   FOR i IN generate_series(1,
                       (len(toks) + {C.TILE_TOKENS - 1}) // {C.TILE_TOKENS})]) AS s
    FROM tsrc
), tl AS (
    SELECT doc_id, s.idx AS tile_idx, s.tile AS tile,
           {_h60("s.tile")} AS tile_hash
    FROM tl0
), tw AS (
    SELECT *,
           (doc_id * {C.TILE_IDX_SPAN} + tile_idx) =
               min(doc_id * {C.TILE_IDX_SPAN} + tile_idx)
                   OVER (PARTITION BY tile_hash) AS keep
    FROM tl
), tile_agg AS (
    SELECT doc_id,
           count(*) AS n_tiles,
           sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept,
           CAST(sum(CASE WHEN keep THEN len(string_split(tile, ' '))
                         ELSE 0 END) AS BIGINT) AS n_kept_tokens,
           -- list() over zero kept rows is NULL in DuckDB; Spark's
           -- collect_list is an empty array -> coalesce to match
           coalesce(array_to_string(list(tile ORDER BY tile_idx)
                                        FILTER (WHERE keep), ' '), '')
               AS kept_text
    FROM tw GROUP BY doc_id
)"""


ORACLE_corpus_tile_dedup = f"""
WITH {_tile_chain('documents')}
SELECT doc_id, n_tiles, CAST(n_kept AS BIGINT) AS n_kept, n_kept_tokens,
       length(kept_text) AS dedup_len, {_h60('kept_text')} AS dedup_hash
FROM tile_agg
ORDER BY doc_id
"""


# --------------------------------------------------------- vocabulary build
def vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped unigram+bigram vocabulary with dense ids."""
    return C.build_vocab(load(spark, sf_dir, "documents")).orderBy("vocab_id")


ORACLE_vocab_build = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), u AS (
    SELECT doc_id, list_concat(toks, {_ngrams('toks', 2)}) AS terms FROM t
), p AS (
    SELECT doc_id, unnest(terms) AS term FROM u
), c AS (
    SELECT term, count(*) AS term_count, count(DISTINCT doc_id) AS doc_freq
    FROM p GROUP BY term
    HAVING count(*) >= {C.VOCAB_MIN_COUNT}
), v AS (
    SELECT term, term_count, doc_freq
    FROM c ORDER BY term_count DESC, term LIMIT {C.VOCAB_CAP}
)
SELECT term, term_count, doc_freq,
       row_number() OVER (ORDER BY term_count DESC, term) AS vocab_id
FROM v
ORDER BY vocab_id
"""


# --------------------------------------------------------- LM surprisal
def text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal quality score over documents."""
    return C.surprisal_score(load(spark, sf_dir, "documents")).orderBy("doc_id")


ORACLE_text_surprisal = f"""
WITH p AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), c AS (
    SELECT term, count(*) AS cnt FROM p GROUP BY term
), t AS (
    SELECT count(*) AS n_total FROM p
), w AS (
    SELECT p.doc_id, (t.n_total * {C.SURPRISAL_SCALE}) // c.cnt AS w
    FROM p JOIN c USING (term) CROSS JOIN t
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(w) AS BIGINT) AS surprisal_q,
       CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) / count(*) AS mean_surprisal
FROM w
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------------------------------- curation report
def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus dashboard: every per-document curation signal — heuristic
    quality, repetition, surprisal, benchmark contamination, PII counts —
    joined into ONE wide relation in ONE logical plan.

    Composability check: each signal is the already-gated operator reused
    verbatim; Catalyst fuses the per-row projections with a shared scan and
    plans one join tree. The oracle is the same composition of the
    already-proven SQL, so a drift in ANY stage fails this query too.
    """
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.datapipe.text import with_quality_score

    docs = load(spark, sf_dir, "documents")
    q = with_quality_score(docs).select("doc_id", "quality_score")
    rep = C.repetition_stats(docs).select("doc_id", "dup_2gram_frac", "repetitive")
    surp = C.surprisal_score(docs).select("doc_id", "mean_surprisal")
    dec = C.decontaminate(docs).select("doc_id", "n_overlap", "contaminated")
    pii = C.pii_scan(C.with_synthetic_pii(docs)).select(
        "doc_id", "n_emails", "n_ips", "n_phones"
    )
    out = (
        docs.select("doc_id", "lang", "source")
        .join(q, "doc_id")
        .join(rep, "doc_id")
        .join(surp, "doc_id")
        .join(dec, "doc_id", "left")  # benchmark docs carry null contamination
        .join(pii, "doc_id")
    )
    return out.select(
        "doc_id",
        "lang",
        "source",
        "quality_score",
        "dup_2gram_frac",
        "repetitive",
        "mean_surprisal",
        F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        "n_emails",
        "n_ips",
        "n_phones",
    ).orderBy("doc_id")


def _report_oracle() -> str:
    # compose the proven per-signal SQL as subqueries of one statement
    def sub(sql: str) -> str:
        return sql.replace("ORDER BY doc_id", "")

    from project_obsidian_core_spark.plans.datapipe_queries import ORACLE_text_quality

    return f"""
WITH q AS ({sub(ORACLE_text_quality)}),
rep AS ({sub(ORACLE_text_repetition_stats)}),
surp AS ({sub(ORACLE_text_surprisal)}),
dec AS ({sub(ORACLE_corpus_decontaminate)}),
pii AS ({sub(ORACLE_pii_scan_redact)})
SELECT d.doc_id, d.lang, d.source,
       q.quality_score,
       rep.dup_2gram_frac, rep.repetitive,
       surp.mean_surprisal,
       coalesce(dec.n_overlap, 0) AS n_overlap,
       coalesce(dec.contaminated, false) AS contaminated,
       pii.n_emails, pii.n_ips, pii.n_phones
FROM documents d
JOIN q USING (doc_id)
JOIN rep USING (doc_id)
JOIN surp USING (doc_id)
LEFT JOIN dec USING (doc_id)
JOIN pii USING (doc_id)
ORDER BY doc_id
"""


ORACLE_curation_report = _report_oracle()


# ---------------------------------------- end-to-end curation pipeline (v2)
#: context length for the packed output (matches pipeline_queries._CTX_LEN)
V2_CTX_LEN = 256


def prepare_training_set_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL curation chain as one logical plan: repetition filter →
    benchmark decontamination → cross-document tile dedup → train split →
    sequence packing of the deduped token counts.

    Extends prepare_training_set (quality→exact-dedup→split→pack) with the
    round-2 stages; every stage is the already-gated operator reused
    verbatim, and the oracle is assembled from the same proven CTE chains.
    Plan shape at 100 TB: scan → per-row filters (fused) → tile explode +
    two keyed shuffles (dedup) → per-shard packing window. Nothing
    materializes between stages.
    """
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.datapipe import pipeline as P

    docs = load(spark, sf_dir, "documents")
    rep_ok = C.repetition_stats(docs).filter(~F.col("repetitive")).select("doc_id")
    dec_ok = (
        C.decontaminate(docs).filter(~F.col("contaminated")).select("doc_id")
    )
    survivors = docs.join(rep_ok, "doc_id").join(dec_ok, "doc_id")
    tiled = C.tile_dedup(survivors).filter(F.col("n_kept") > 0)
    with_tokens = (
        tiled.select("doc_id", F.col("n_kept_tokens").alias("n_tokens"))
        .join(docs.select("doc_id", "source"), "doc_id")
    )
    train = P.assign_splits(with_tokens).filter(F.col("split") == "train")
    return P.pack_sequential(
        train.select("doc_id", "source", "n_tokens"), V2_CTX_LEN
    ).orderBy("source", "doc_id")


def _v2_oracle() -> str:
    from project_obsidian_core_spark.plans.pipeline_queries import (
        _split_case_sql,
        _sql_hash60,
    )

    rep = ORACLE_text_repetition_stats.rsplit("ORDER BY", 1)[0]
    dec = ORACLE_corpus_decontaminate.rsplit("ORDER BY", 1)[0]
    split_case = _split_case_sql(
        _sql_hash60("'split:' || CAST(doc_id AS VARCHAR)") + " % 1000"
    )
    return f"""
WITH rep AS ({rep}),
dec AS ({dec}),
survivors AS (
    SELECT d.doc_id, d.text, d.source
    FROM documents d
    JOIN rep ON rep.doc_id = d.doc_id AND NOT rep.repetitive
    JOIN dec ON dec.doc_id = d.doc_id AND NOT dec.contaminated
),
{_tile_chain('survivors')},
tok AS (
    SELECT t.doc_id, s.source, t.n_kept_tokens AS n_tokens
    FROM tile_agg t JOIN survivors s USING (doc_id)
    WHERE t.n_kept > 0
),
tr AS (
    SELECT * FROM tok WHERE {split_case} = 'train'
),
p AS (
    SELECT *,
           -- CAST: window SUM of BIGINT is HUGEINT in DuckDB; pack_id /
           -- pack_offset derive from it, so cast back to BIGINT or the
           -- driver-side fetch encodes them differently from Spark's
           -- LongType (r03 hash mismatch)
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS prefix
    FROM tr
)
SELECT doc_id, source, n_tokens,
       prefix // {V2_CTX_LEN} AS pack_id,
       prefix % {V2_CTX_LEN} AS pack_offset
FROM p
ORDER BY source, doc_id
"""


ORACLE_prepare_training_set_v2 = _v2_oracle()


# ------------------------------------------------------- weighted sampling
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sample: P(keep) = min(1, rate·quality)."""
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.datapipe.text import with_quality_score

    docs = load(spark, sf_dir, "documents")
    q = with_quality_score(docs).select("doc_id", "quality_score")
    joined = docs.select("doc_id", "lang", "source").join(q, "doc_id")
    out = C.weighted_sample(joined, weight=F.col("quality_score"))
    return out.select("doc_id", "lang", "source", "quality_score").orderBy("doc_id")


def _weighted_oracle() -> str:
    from project_obsidian_core_spark.plans.datapipe_queries import ORACLE_text_quality

    q = ORACLE_text_quality.rsplit("ORDER BY", 1)[0]
    return f"""
WITH q AS ({q})
SELECT d.doc_id, d.lang, d.source, q.quality_score
FROM documents d JOIN q USING (doc_id)
WHERE {_h60("'wsample:' || CAST(doc_id AS VARCHAR)")} % 1000000
      < CAST(floor(least(1.0, {C.WEIGHTED_RATE} * q.quality_score) * 1000000)
             AS BIGINT)
ORDER BY doc_id
"""


ORACLE_corpus_weighted_sample = _weighted_oracle()


# ---------------------------------------------------- composite QF report --
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style heuristic gate with an auditable reasons bitmask."""
    return C.quality_filter(load(spark, sf_dir, "documents").orderBy("doc_id"))


ORACLE_corpus_quality_filter = f"""
WITH m AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS total_len,
           CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS word_chars,
           CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digits
    FROM documents
), r AS (
    SELECT doc_id, n_words,
           (CASE WHEN n_words < {C.QF_MIN_WORDS} THEN {C.QF_TOO_FEW_WORDS} ELSE 0 END
            + CASE WHEN word_chars < {C.QF_MEAN_LEN_LO} * n_words
                     OR word_chars > {C.QF_MEAN_LEN_HI} * n_words
                   THEN {C.QF_MEAN_WORD_LEN} ELSE 0 END
            + CASE WHEN 2 * alpha < total_len THEN {C.QF_LOW_ALPHA} ELSE 0 END
            + CASE WHEN 10 * digits > 3 * total_len THEN {C.QF_HIGH_DIGIT} ELSE 0 END
           ) AS reasons
    FROM m
)
SELECT doc_id, n_words, CAST(reasons AS BIGINT) AS reasons, reasons = 0 AS kept
FROM r ORDER BY doc_id
"""


# ------------------------------------------------------- language mixture --
def corpus_language_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language composition with exact-integer ppm shares."""
    return C.language_mixture(load(spark, sf_dir, "documents")).orderBy(
        "source", "lang"
    )


ORACLE_corpus_language_mixture = """
WITH counts AS (
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs,
       CAST((CAST(n_docs AS HUGEINT) * 1000000)
            // sum(n_docs) OVER (PARTITION BY source)
            AS BIGINT) AS share_ppm
FROM counts
ORDER BY source, lang
"""


# ------------------------------------------------------- mixture planning --
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target domain-mixture sampling plan over the documents
    corpus (exact integer rates; the scarcest source binds)."""
    return C.mixture_plan(load(spark, sf_dir, "documents"))


ORACLE_corpus_mixture_plan = """
WITH avail AS (
    SELECT source,
           CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
               AS avail_tokens
    FROM documents GROUP BY source
), shared AS (
    SELECT source, avail_tokens,
           1000000 // (SELECT count(*) FROM avail) AS target_ppm
    FROM avail
), t AS (
    SELECT CAST(min((CAST(avail_tokens AS HUGEINT) * 1000000) // target_ppm)
               AS BIGINT) AS t_star
    FROM shared
)
SELECT source, avail_tokens, CAST(target_ppm AS BIGINT) AS target_ppm,
       CAST((CAST(target_ppm AS HUGEINT) * t_star) // 1000000 AS BIGINT)
           AS keep_tokens,
       CAST(least(1000000,
            (CAST((CAST(target_ppm AS HUGEINT) * t_star) // 1000000 AS HUGEINT)
             * 1000000) // avail_tokens) AS BIGINT)
           AS rate_ppm
FROM shared, t
ORDER BY source
"""


# ------------------------------------------------------------- OOV rate
def corpus_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the corpus's own capped vocabulary
    (:func:`datapipe.curation.oov_rate` over :func:`build_vocab`'s top
    terms) — the coverage report a tokenizer/vocab choice is judged by."""
    docs = load(spark, sf_dir, "documents")
    vocab = C.build_vocab(docs)
    return C.oov_rate(docs, vocab).orderBy("doc_id")


ORACLE_corpus_oov_rate = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), u AS (
    SELECT doc_id, list_concat(toks, {_ngrams('toks', 2)}) AS terms FROM t
), p AS (
    SELECT doc_id, unnest(terms) AS term FROM u
), c AS (
    SELECT term, count(*) AS term_count
    FROM p GROUP BY term
    HAVING count(*) >= {C.VOCAB_MIN_COUNT}
), v AS (
    SELECT term FROM c ORDER BY term_count DESC, term LIMIT {C.VOCAB_CAP}
), up AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), j AS (
    SELECT up.doc_id, v.term AS hit
    FROM up LEFT JOIN v ON up.term = v.term
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000
           // count(*) AS oov_ppm
FROM j
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------- embedding-level decontamination
def corpus_decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine benchmark decontamination
    (curation.decontaminate_embedding): train vectors too close to the
    held-out eval slice — the paraphrase-leak screen n-gram overlap
    misses. Top-50 hits by similarity."""
    from pyspark.sql import functions as F

    return (
        C.decontaminate_embedding(load(spark, sf_dir, "embeddings"))
        .orderBy(F.desc("cos_sim"), "train_id", "eval_id")
        .limit(50)
    )


def _oracle_decon_embedding() -> str:
    from project_obsidian_core_spark.datapipe import similarity as _S
    from project_obsidian_core_spark.datapipe import vectors as _V

    dim = 64
    return f"""
WITH base AS (
    SELECT vec_id, embedding AS v,
           {_S.sql_lsh_bucket('embedding', bits=C.DECON_EMB_BITS)} AS bucket,
           {_V.sql_norm('embedding', dim)} AS nrm
    FROM embeddings
), ev AS (
    SELECT vec_id AS eval_id, v AS e_v, nrm AS e_nrm, bucket FROM base
    WHERE vec_id % {C.DECON_BENCH_MOD} = 0
), tr AS (
    SELECT vec_id AS train_id, v AS t_v, nrm AS t_nrm, bucket FROM base
    WHERE vec_id % {C.DECON_BENCH_MOD} <> 0
)
SELECT train_id, eval_id,
       {_V.sql_dot('t_v', 'e_v', dim)} / (t_nrm * e_nrm) AS cos_sim
FROM tr JOIN ev USING (bucket)
WHERE {_V.sql_dot('t_v', 'e_v', dim)} / (t_nrm * e_nrm) >= {C.DECON_EMB_THRESHOLD}
ORDER BY cos_sim DESC, train_id, eval_id
LIMIT 50
"""


ORACLE_corpus_decontaminate_embedding = _oracle_decon_embedding()


# ------------------------------------------ X19: k-anonymity risk gate --
from pyspark.sql import functions as F  # noqa: E402

#: QI tuple for the gate: behaviour type x activity day x user cohort.
_KANON_KS = (2, 5, 10)


def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X19: k-anonymity risk report over the (event_type, day, user-cohort)
    quasi-identifier tuple of the events table — how many equivalence
    classes (and rows) fall below k for k in {2, 5, 10}.  The privacy
    sibling of the PII regex scan: PII is *direct* identification, QI
    sparsity is *linkage* identification."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.col("user_id") % 50).alias("cohort"),
    )
    return C.k_anonymity_report(
        ev, ["event_type", "day", "cohort"], ks=_KANON_KS
    ).orderBy("k")


def _kanon_oracle() -> str:
    rows = "\nUNION ALL\n".join(
        f"""SELECT {k} AS k,
       CAST(sum(CASE WHEN cls < {k} THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
       CAST(sum(CASE WHEN cls < {k} THEN cls ELSE 0 END) AS BIGINT) AS rows_below,
       count(*) AS classes_total,
       CAST(sum(cls) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN cls < {k} THEN cls ELSE 0 END) * 1000000
           // sum(cls) AS BIGINT) AS risk_ppm
FROM sizes"""
        for k in _KANON_KS
    )
    return f"""
WITH sizes AS (
    SELECT event_type, CAST(ts AS DATE) AS day, user_id % 50 AS cohort,
           count(*) AS cls
    FROM events GROUP BY 1, 2, 3
)
{rows}
ORDER BY k
"""


ORACLE_events_k_anonymity = _kanon_oracle()


# ---------------------------------------- C24: fixed-k priority sampling
from pyspark.sql import functions as F  # noqa: E402


def corpus_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24: exactly 4 docs per source, inclusion odds ~ n_chars
    (budgeted weighted curation; priority keys quantized-int)."""
    out = C.priority_sample(
        load(spark, sf_dir, "documents"),
        k=4,
        weight=F.col("n_chars"),
        group_cols=("source",),
    )
    return out.select("source", "doc_id", "n_chars", "prio").orderBy(
        "source", "prio", "doc_id"
    )


ORACLE_corpus_priority_sample = """
WITH w AS (
    SELECT source, doc_id, n_chars,
           CAST('0x' || substr(md5('psample:' || CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) // n_chars AS prio
    FROM documents WHERE n_chars > 0
), r AS (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY prio, doc_id) AS rn
    FROM w
)
SELECT source, doc_id, n_chars, prio
FROM r WHERE rn <= 4
ORDER BY source, prio, doc_id
"""


# ---------------------------------------- X21: conditional bigram surprisal
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21: per-document mean CONDITIONAL (bigram) surprisal — word-order
    fluency scoring via :func:`datapipe.curation.bigram_surprisal_score`;
    the unigram surprisal's second rung (catches shuffled/template text
    whose individual words are all common)."""
    return C.bigram_surprisal_score(load(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


ORACLE_text_bigram_surprisal = f"""
WITH p AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bg AS (
    SELECT doc_id, toks[i] AS prev, toks[i + 1] AS next
    FROM p, unnest(generate_series(1, len(toks) - 1)) AS g(i)
), uni AS (
    SELECT unnest(string_split(text, ' ')) AS term, 1 AS one FROM documents
), uc AS (
    SELECT term, CAST(count(*) AS BIGINT) AS u_cnt FROM uni GROUP BY term
), bi AS (
    SELECT prev, next, CAST(count(*) AS BIGINT) AS b_cnt
    FROM bg GROUP BY 1, 2
), w AS (
    SELECT bg.doc_id, (uc.u_cnt * {C.SURPRISAL_SCALE}) // bi.b_cnt AS w
    FROM bg
    JOIN bi ON bi.prev = bg.prev AND bi.next = bg.next
    JOIN uc ON uc.term = bg.prev
), agg AS (
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(w) AS BIGINT) AS surprisal_q
    FROM w GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(agg.n_bigrams, 0) AS n_bigrams,
       coalesce(agg.surprisal_q, 0) AS surprisal_q,
       CASE WHEN agg.n_bigrams IS NOT NULL
            THEN CAST(agg.surprisal_q AS DOUBLE) / agg.n_bigrams END
           AS mean_surprisal
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------ X22: readability (Flesch-ish)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X22: Flesch-reading-ease-shaped readability per document from
    three exact integer counts — words (space tokens), sentences
    (terminal . ! ? characters, floor 1), and syllable proxy = maximal
    vowel runs (split on /[aeiou]+/, fence-post count) — the
    quality-filter signal complexity-targeted curation mixes with the
    C4/Gopher gates (too-easy = boilerplate lists, too-hard = OCR
    garbage).  Counts are exact ints with IDENTICAL split semantics in
    both engines (trailing-empty behavior verified by the gate); the
    Flesch composition 206.835 − 1.015·(W/S) − 84.6·(V/W) is one
    deterministic IEEE chain per OUTPUT row (the A36 rule)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr("size(split(text, ' '))").cast("long").alias("n_words"),
            F.greatest(
                F.lit(1),
                (
                    F.length("text")
                    - F.length(F.expr("replace(replace(replace(text, '.', ''),"
                                      " '!', ''), '?', '')"))
                ),
            ).cast("long").alias("n_sentences"),
            (
                F.expr("size(split(lower(text), '[aeiou]+'))") - F.lit(1)
            ).cast("long").alias("n_vowel_runs"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_vowel_runs",
            F.when(
                F.col("n_words") > 0,
                F.lit(206.835)
                - F.lit(1.015)
                * (F.col("n_words").cast("double") / F.col("n_sentences"))
                - F.lit(84.6)
                * (F.col("n_vowel_runs").cast("double") / F.col("n_words")),
            ).alias("flesch_score"),
        )
        .orderBy("doc_id")
    )


ORACLE_text_readability = """
WITH c AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(greatest(1, length(text)
                - length(replace(replace(replace(text, '.', ''),
                                 '!', ''), '?', ''))) AS BIGINT)
               AS n_sentences,
           CAST(len(string_split_regex(lower(text), '[aeiou]+')) - 1 AS BIGINT)
               AS n_vowel_runs
    FROM documents
)
SELECT doc_id, n_words, n_sentences, n_vowel_runs,
       CASE WHEN n_words > 0 THEN
           206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                   - 84.6 * (CAST(n_vowel_runs AS DOUBLE) / n_words)
       END AS flesch_score
FROM c
ORDER BY doc_id
"""


# ----------------------------------------- X23: vocabulary growth curve --
#: growth-curve checkpoints as /16 fractions of the corpus (doc_id order)
_VOCAB_GROWTH_FRACS = (1, 2, 4, 8, 16)

#: doc-id range-bucket width for the distributed order statistic: the
#: per-bucket count relation is |id-range|/width rows (the only relation a
#: global window ever sees), and only the ≤5 checkpoint-hit buckets are
#: ever locally ranked — ≤ 5·width rows into partitioned windows.
_VOCAB_GROWTH_BUCKET = 4096


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X23: the vocabulary growth (Heaps' law) curve — distinct terms
    discovered after the first n/16, n/8, n/4, n/2 and all docs in
    doc_id order.  The corpus-health diagnostic behind "is more data
    still buying new language": a curve that flattens early means
    near-dup/template mass, one that stays steep means the tokenizer
    will keep meeting OOV text; the Heaps exponent read off this curve
    sizes vocabulary budgets.

    Semantics: checkpoints are LOWER-ORDER-STATISTIC doc_id thresholds
    (rank ceil(n·k/16), the repo quantile rule), so both engines pick
    identical boundary docs; a term counts at checkpoint k iff its
    FIRST containing doc (min doc_id) is ≤ the threshold.

    Plan (round 11 — the r10 verdict's #1): the checkpoint thresholds
    are DISTRIBUTED order statistics, never a collected array.  Doc ids
    range-bucket by ``doc_id div 4096`` (order-preserving); the
    cumulative fold runs over the per-bucket COUNT relation (the Gini
    per-distinct-value idiom — the only global window is over
    |id-range|/4096 rows, not |docs|); each of the five target ranks
    broadcast-joins to the one bucket whose cumulative range contains
    it; only those ≤5 buckets' rows enter a (bucket, checkpoint)-
    partitioned row_number to read the threshold doc.  Then one explode
    → per-term min(doc_id) (map-side combined) and one broadcast-
    threshold conditional aggregate over the ≤|vocab| relation, as
    before.  No stage ever materializes an unbounded collection in a
    single buffer (plan-pinned: test_plan_shapes.py asserts no
    collect_list/sort_array anywhere in this plan)."""
    from pyspark.sql import Window, functions as F

    docs = load(spark, sf_dir, "documents")
    # per-bucket doc counts: the order statistic's only shuffled relation
    bkt = docs.select(
        F.floor(F.col("doc_id") / _VOCAB_GROWTH_BUCKET).alias("bkt"),
        "doc_id",
    )
    bcnt = bkt.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    cum = bcnt.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    # the five target ranks (rank ceil(n·k/16)) from the bucket totals
    targets = (
        bcnt.agg(F.sum("cnt").alias("n_docs"))
        .select(
            "n_docs",
            F.explode(
                F.array(*[F.lit(k) for k in _VOCAB_GROWTH_FRACS])
            ).alias("sixteenth"),
        )
        .withColumn(
            "rnk",
            F.expr("cast(ceil(n_docs * sixteenth / 16.0) as bigint)"),
        )
    )
    # locate each rank's bucket: 5-row broadcast against the bucket fold
    hit = cum.join(
        F.broadcast(targets),
        (F.col("cum_before") < F.col("rnk"))
        & (F.col("rnk") <= F.col("cum_before") + F.col("cnt")),
    ).select("bkt", "sixteenth", "n_docs", "rnk", "cum_before")
    # rank ONLY inside the ≤5 hit buckets; (bkt, sixteenth) partitioning
    # keeps two checkpoints landing in one bucket independent
    thr_rows = (
        bkt.join(F.broadcast(hit), "bkt")
        .withColumn(
            "lr",
            F.row_number().over(
                Window.partitionBy("bkt", "sixteenth").orderBy("doc_id")
            ),
        )
        .filter(F.col("lr") == F.col("rnk") - F.col("cum_before"))
        .select("sixteenth", "n_docs", "rnk", F.col("doc_id").alias("thr"))
    )
    # pivot the 5 threshold rows to one broadcastable row
    thr = thr_rows.groupBy().agg(
        F.max("n_docs").alias("n_docs"),
        *[
            F.max(F.when(F.col("sixteenth") == k, F.col("thr"))).alias(
                f"t{k}"
            )
            for k in _VOCAB_GROWTH_FRACS
        ],
    )
    first = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    counts = first.crossJoin(F.broadcast(thr)).agg(
        F.max("n_docs").alias("n_docs"),
        *[
            F.sum(
                F.when(F.col("first_doc") <= F.col(f"t{k}"), 1).otherwise(0)
            ).alias(f"v{k}")
            for k in _VOCAB_GROWTH_FRACS
        ],
        *[F.max(f"t{k}").alias(f"m{k}") for k in _VOCAB_GROWTH_FRACS],
    )
    rows = None
    for k in _VOCAB_GROWTH_FRACS:
        row = counts.select(
            F.lit(k).alias("sixteenth"),
            F.expr(f"cast(ceil(n_docs * {k} / 16.0) as bigint)").alias(
                "checkpoint_docs"
            ),
            F.col(f"m{k}").alias("threshold_doc_id"),
            F.col(f"v{k}").alias("vocab_size"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows.orderBy("sixteenth")


def _vocab_growth_oracle() -> str:
    ks = ", ".join(str(k) for k in _VOCAB_GROWTH_FRACS)
    return f"""
WITH ids AS (
    SELECT list(doc_id ORDER BY doc_id) AS ids, count(*) AS n_docs
    FROM documents
), first AS (
    SELECT term, min(doc_id) AS first_doc FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ) GROUP BY term
), ck AS (
    SELECT k.k AS sixteenth,
           CAST(ceil(ids.n_docs * k.k / 16.0) AS BIGINT) AS checkpoint_docs,
           ids.ids[CAST(ceil(ids.n_docs * k.k / 16.0) AS BIGINT)]
               AS threshold_doc_id
    FROM ids, (SELECT unnest([{ks}]) AS k) k
)
SELECT ck.sixteenth, ck.checkpoint_docs, ck.threshold_doc_id,
       CAST((SELECT count(*) FROM first
             WHERE first.first_doc <= ck.threshold_doc_id) AS BIGINT)
           AS vocab_size
FROM ck
ORDER BY ck.sixteenth
"""


ORACLE_vocab_growth = _vocab_growth_oracle()


# --------------- X21: Zipf octave profile of the token distribution -------
# Registration note: queued for round 11 (r10 gate window full); the r11
# registry block should add:
#   ("text_zipf_octaves", cu.text_zipf_octaves, cu.ORACLE_text_zipf_octaves)
_ZIPF_MAX_OCTAVE = 40


def text_zipf_octaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X21: rank-octave profile of the corpus token-frequency
    distribution — the exact relation behind a Zipf-law fit (is this
    corpus natural text, template spam, or dedup residue?): for each
    rank octave o (ranks 2^o..2^(o+1)−1 by descending frequency), the
    term count and total frequency.  Natural-language corpora show
    near-constant total frequency per octave (Zipf α≈1); template-heavy
    corpora bulge in the head octaves, boilerplate-stripped ones in the
    tail.

    NO global per-token rank window (the A49/Gini lesson): tokens
    collapse to the per-COUNT relation (count → n_tokens, ≤|distinct
    counts| rows — tiny under any Zipfian distribution), a cumulative
    window over descending count assigns each count-group its rank
    RANGE, and octave membership is the range intersection against a
    41-row broadcast boundary table.  Well-defined without any
    term tiebreak: tokens inside one count group are interchangeable
    for octave AGGREGATES, so the straddle split is deterministic
    whichever tokens land on either side.  All int64; no floats at all.
    The ln-based α fit lives in :func:`zipf_alpha` OUTSIDE the hashed
    gate (the A32 transcendental rule).

    Scale: one corpus-wide token shuffle (map-side combined), then
    everything rides relations bounded by |distinct counts| and 41.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_count = counts.groupBy("cnt").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    wdesc = (
        Window.orderBy(F.desc("cnt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranged = per_count.select(
        "cnt",
        "n_tok",
        (F.coalesce(F.sum("n_tok").over(wdesc), F.lit(0)) + 1).alias("r_first"),
        (
            F.coalesce(F.sum("n_tok").over(wdesc), F.lit(0)) + F.col("n_tok")
        ).alias("r_last"),
    )
    octaves = spark.range(0, _ZIPF_MAX_OCTAVE + 1).select(
        F.col("id").cast("int").alias("octave"),
        F.expr("shiftleft(1L, cast(id as int))").alias("lo"),
        F.expr("shiftleft(1L, cast(id as int) + 1) - 1").alias("hi"),
    )
    j = ranged.join(
        F.broadcast(octaves),
        (F.col("r_first") <= F.col("hi")) & (F.col("r_last") >= F.col("lo")),
    )
    overlap = (
        F.least("r_last", "hi") - F.greatest("r_first", "lo") + 1
    ).alias("width")
    return (
        j.select("octave", "lo", "cnt", overlap)
        .groupBy("octave", "lo")
        .agg(
            F.sum("width").alias("n_terms"),
            F.sum(F.col("cnt") * F.col("width")).alias("total_freq"),
            F.max("cnt").alias("max_count"),
            F.min("cnt").alias("min_count"),
        )
        .orderBy("octave")
    )


ORACLE_text_zipf_octaves = f"""
WITH p AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
), counts AS (
    SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY term
), per_count AS (
    SELECT cnt, CAST(count(*) AS BIGINT) AS n_tok FROM counts GROUP BY cnt
), ranged AS (
    SELECT cnt, n_tok,
           coalesce(sum(n_tok) OVER (ORDER BY cnt DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) + 1 AS r_first,
           coalesce(sum(n_tok) OVER (ORDER BY cnt DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) + n_tok AS r_last
    FROM per_count
), octaves AS (
    SELECT CAST(o AS INT) AS octave,
           CAST(1 AS BIGINT) << o AS lo,
           (CAST(1 AS BIGINT) << (o + 1)) - 1 AS hi
    FROM unnest(generate_series(0, {_ZIPF_MAX_OCTAVE})) AS g(o)
)
SELECT octave, lo,
       CAST(sum(least(r_last, hi) - greatest(r_first, lo) + 1) AS BIGINT)
           AS n_terms,
       CAST(sum(cnt * (least(r_last, hi) - greatest(r_first, lo) + 1))
           AS BIGINT) AS total_freq,
       CAST(max(cnt) AS BIGINT) AS max_count,
       CAST(min(cnt) AS BIGINT) AS min_count
FROM ranged JOIN octaves
  ON r_first <= hi AND r_last >= lo
GROUP BY octave, lo
ORDER BY octave
"""


def zipf_alpha(df: DataFrame) -> DataFrame:
    """OLS Zipf exponent over the octave profile: regress
    ln(mean freq per term in octave) on ln(geometric rank midpoint) —
    slope ≈ −α.  OUTSIDE the hashed gate (ln ulp differs between JVM
    and libm, the A32 rule); the octave relation carries all the exact
    information.  Unit-pinned against python's math.log."""
    pts = df.select(
        (F.log(F.lit(2.0)) * (F.col("octave") + 0.5)).alias("lx"),
        F.log(
            F.col("total_freq").cast("double") / F.col("n_terms").cast("double")
        ).alias("ly"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    return agg.select(
        "n",
        (
            -(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("alpha"),
    )


# ---------------------------------- X24: first-occurrence gram novelty --
from project_obsidian_core_spark.datapipe.text import shared_hash60  # noqa: E402


# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("text_gram_novelty", cu.text_gram_novelty,
#    cu.ORACLE_text_gram_novelty)
def text_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X24: per-document n-gram NOVELTY — what fraction of a document's
    distinct word trigrams appear here FIRST (min doc_id over the
    corpus)?  The curation signal between exact dedup and quality
    scoring: boilerplate-heavy or templated documents score near zero
    (their grams all debuted earlier), genuinely new content scores
    near one; ordering the corpus by ingest id makes this "how much new
    text does each increment actually add" — the marginal-value curve a
    data-buying pipeline ranks sources by.

    Grams travel as 60-bit shared hashes (the corpus-wide idiom:
    :func:`datapipe.text.shared_hash60`), so the gram exchange carries
    int64 keys, never strings. Per-doc distinct grams first (bounded by
    doc length), then min(doc_id) per gram (≤|distinct grams| groups,
    map-side combined), then one count-style re-aggregation per doc.
    The novelty ratio is the single guarded IEEE division of two exact
    ints. Docs too short for a trigram keep a row (0 grams, NULL
    novelty) via the left join from the documents spine.

    Scale: two corpus exchanges (gram → min doc, doc → counts), both on
    int64 keys; no windows, no pair space, no collect.
    """
    docs = load(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(C.word_ngrams(F.split("text", " "), 3))
        ).alias("gram"),
    ).select("doc_id", shared_hash60(F.col("gram")).alias("h"))
    first = g.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        g.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


ORACLE_text_gram_novelty = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g0 AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 3 THEN {_ngrams('toks', 3)}
                ELSE [] END AS grams
    FROM t
), g AS (
    SELECT doc_id, {_h60('gram')} AS h
    FROM (SELECT doc_id, unnest(list_distinct(grams)) AS gram FROM g0)
), first AS (
    SELECT h, min(doc_id) AS first_doc FROM g GROUP BY h
), per_doc AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN first.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel
    FROM g JOIN first USING (h)
    GROUP BY g.doc_id
)
SELECT d.doc_id,
       coalesce(n_grams, 0) AS n_grams,
       coalesce(n_novel, 0) AS n_novel,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE)
       END AS novelty
FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
ORDER BY d.doc_id
"""


# ---------------- V3: vocabulary coverage curve (staged r13) --------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("vocab_coverage_curve", c.vocab_coverage_curve,
#    c.ORACLE_vocab_coverage_curve)
_COV_CHECKPOINTS = (8, 16, 32, 64, 128, 256, 512, 1024)


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: the vocabulary-size planning curve — at each candidate vocab
    size k, what fraction of ALL corpus token occurrences do the top-k
    terms cover (the rest become <unk> / get split by BPE)?  This is
    the table that sizes a tokenizer before training one: coverage
    flattening at small k says a compact vocab suffices; a long slow
    tail says byte-fallback will be hot.  Complements V1 (the capped
    vocab itself) and X-family Zipf octaves (the same mass viewed as a
    distribution law).

    Exactness: term counts are exact ints over the V1 unigram+bigram
    stream, ranks use the V1 total order (count desc, term),
    cumulative sums ride the rank order, coverage is integer ppm.
    Scale: one corpus-sized term count (map-side combined — the V1
    exchange), then the rank window on the distinct-term relation with
    a ≤|checkpoints|-row report."""
    from pyspark.sql import Window

    from project_obsidian_core_spark.datapipe.curation import (
        _toks,
        word_ngrams,
    )

    docs = load(spark, sf_dir, "documents")
    toks = _toks("text")
    terms = docs.select(
        F.explode(F.concat(toks, word_ngrams(toks, 2))).alias("term")
    )
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), "term")
    wc = Window.orderBy(F.col("cnt").desc(), "term").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("cum_cnt", F.sum("cnt").over(wc))
        .withColumn("total_cnt", F.sum("cnt").over(wt))
        .withColumn("n_terms", F.count(F.lit(1)).over(wt))
    )
    cps = F.array(*[F.lit(k) for k in _COV_CHECKPOINTS])
    return (
        ranked.filter(F.array_contains(cps, F.col("rk")))
        .select(
            F.col("rk").alias("vocab_k"),
            F.col("term").alias("boundary_term"),
            F.col("cnt").alias("boundary_count"),
            "cum_cnt",
            "total_cnt",
            "n_terms",
            F.expr("cum_cnt * 1000000 div total_cnt").alias("coverage_ppm"),
        )
        .orderBy("vocab_k")
    )


ORACLE_vocab_coverage_curve = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), terms AS (
    SELECT unnest(list_concat(toks, {_ngrams('toks', 2)})) AS term FROM t
), counts AS (
    SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM terms GROUP BY term
), ranked AS (
    SELECT term, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rk,
           CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cnt,
           CAST(sum(cnt) OVER () AS BIGINT) AS total_cnt,
           CAST(count(*) OVER () AS BIGINT) AS n_terms
    FROM counts
)
SELECT rk AS vocab_k, term AS boundary_term, cnt AS boundary_count,
       cum_cnt, total_cnt, n_terms,
       CAST(cum_cnt * 1000000 // total_cnt AS BIGINT) AS coverage_ppm
FROM ranked
WHERE rk IN ({", ".join(str(k) for k in _COV_CHECKPOINTS)})
ORDER BY vocab_k
"""


# ---------------- V4: tokenizer fertility by language (round 14) ----------
# Registration note: REGISTERED r14 (Block R14b).  Registry row:
#   ("vocab_fertility", cu.vocab_fertility, cu.ORACLE_vocab_fertility)
def vocab_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4: tokenizer fertility per language — BPE-ish tokens emitted per
    whitespace word, the standard multilingual-tokenizer audit (a
    language whose fertility is 2× the corpus mean pays twice the
    sequence length for the same text, which skews both training cost
    and effective mixture weights — the number that motivates
    vocabulary rebalancing).  Languages come from the gated X2 lang-ID
    (first-declared-wins argmax); fertility is an integer-ppm division
    of exact token counts; the corpus-relative ratio uses the SAME
    exact sums, so every value is engine-portable.  Int64 headroom:
    ``sum_bpe·tot_ws·10⁶`` holds to ~10⁶ total tokens per side at the
    gate SFs; at real corpus scale (10¹²+ tokens) compute the relative
    ratio from the two ppm fertilities instead (the A105 cross-multiply
    fallback rule).

    Scale: two per-row expression stacks (lang scores + token counts)
    pipelined with one scan, then a ≤|langs| hash aggregate; the
    corpus totals are a 1-row broadcast."""
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.datapipe import text as T

    docs = load(spark, sf_dir, "documents")
    lang = T.with_lang_id(docs).select("doc_id", "lang_pred")
    counts = T.with_token_stats(docs).select(
        "doc_id", "n_ws_tokens", "n_bpe_tokens"
    )
    per_doc = lang.join(counts, "doc_id")
    per_lang = per_doc.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws_tokens").alias("sum_ws"),
        F.sum("n_bpe_tokens").alias("sum_bpe"),
    )
    totals = per_doc.agg(
        F.sum("n_ws_tokens").alias("_tws"),
        F.sum("n_bpe_tokens").alias("_tbpe"),
    )
    return (
        per_lang.crossJoin(F.broadcast(totals))
        .select(
            "lang_pred",
            "n_docs",
            "sum_ws",
            "sum_bpe",
            F.expr("sum_bpe * 1000000 div sum_ws").alias("fertility_ppm"),
            # corpus-relative: (lang fertility) / (corpus fertility) in ppm
            # = (sum_bpe · _tws · 10⁶) div (sum_ws · _tbpe) — exact ints
            F.expr(
                "sum_bpe * _tws * 1000000 div (sum_ws * _tbpe)"
            ).alias("rel_fertility_ppm"),
        )
        .orderBy("lang_pred")
    )


def _fertility_oracle() -> str:
    from project_obsidian_core_spark.datapipe import text as T
    from project_obsidian_core_spark.plans.datapipe_queries import _lang_oracle

    # reuse the lang oracle verbatim as a CTE (body_only drops the ORDER
    # BY tail at the source instead of rindex-slicing rendered SQL)
    lang_body = _lang_oracle(body_only=True).strip()
    return f"""
WITH lang AS ({lang_body}),
cnt AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws,
           len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')) AS n_bpe
    FROM documents
), per_doc AS (
    SELECT l.lang_pred, c.n_ws, c.n_bpe
    FROM lang l JOIN cnt c USING (doc_id)
), tot AS (
    SELECT sum(n_ws) AS tws, sum(n_bpe) AS tbpe FROM per_doc
)
SELECT lang_pred,
       count(*) AS n_docs,
       CAST(sum(n_ws) AS BIGINT) AS sum_ws,
       CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
       CAST(sum(n_bpe) * 1000000 // sum(n_ws) AS BIGINT) AS fertility_ppm,
       CAST(sum(n_bpe) * tot.tws * 1000000
            // (sum(n_ws) * tot.tbpe) AS BIGINT) AS rel_fertility_ppm
FROM per_doc CROSS JOIN tot
GROUP BY lang_pred, tot.tws, tot.tbpe
ORDER BY lang_pred
"""


ORACLE_vocab_fertility = _fertility_oracle()


# ---------------- X30: lexical diversity curve (staged r15) ----------------
# Registration note: REGISTERED r15 (Block R15 queue drain; was staged
# via scripts/check_queued.py).  Registry row:
#   ("text_ttr_curve", cu.text_ttr_curve, cu.ORACLE_text_ttr_curve)
_TTR_DECILES = 10


def text_ttr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X30: type-token ratio by document-length decile — the lexical-
    diversity curve that normalizes TTR's notorious length dependence
    (TTR falls with length, so a single corpus-wide TTR conflates
    vocabulary richness with document size; the per-decile curve is the
    comparable form).  Deciles are COUNT-QUANTILES of n_chars with ties
    sharing a decile (the P18 stage rule: boundary table on the
    ≤|distinct lengths| grid, broadcast back — no global sort of docs);
    per decile the pooled TTR is an integer-ppm division of exact
    distinct/total token sums.
    """
    from pyspark.sql import Window, functions as F

    from project_obsidian_core_spark.datapipe import text as T

    docs = load(spark, sf_dir, "documents")
    stats = T.with_token_stats(docs).select(
        "doc_id", "n_chars_measured", "n_ws_tokens", "n_distinct_tokens"
    )
    vc = stats.groupBy("n_chars_measured").agg(F.count(F.lit(1)).alias("_n"))
    wv = Window.orderBy("n_chars_measured").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = vc.agg(F.sum("_n").alias("_total"))
    deciles = (
        vc.withColumn("_before", F.coalesce(F.sum("_n").over(wv), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .select(
            "n_chars_measured",
            (
                F.lit(1) + F.expr(f"({_TTR_DECILES} * _before) div _total")
            ).cast("int").alias("decile"),
        )
    )
    return (
        stats.join(F.broadcast(deciles), "n_chars_measured")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars_measured").alias("min_chars"),
            F.max("n_chars_measured").alias("max_chars"),
            F.sum("n_ws_tokens").alias("sum_tokens"),
            F.sum("n_distinct_tokens").alias("sum_distinct"),
        )
        .withColumn(
            "ttr_ppm", F.expr("sum_distinct * 1000000 div sum_tokens")
        )
        .orderBy("decile")
    )


ORACLE_text_ttr_curve = f"""
WITH stats AS (
    SELECT doc_id, length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tok,
           len(list_distinct(string_split(text, ' '))) AS n_dis
    FROM documents
), dec AS (
    SELECT *,
           1 + ({_TTR_DECILES} * count(*) OVER (
                   ORDER BY n_chars
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
               // count(*) OVER () AS decile
    FROM stats
)
SELECT CAST(decile AS INT) AS decile,
       count(*) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
       CAST(sum(n_dis) AS BIGINT) AS sum_distinct,
       CAST(sum(n_dis) * 1000000 // sum(n_tok) AS BIGINT) AS ttr_ppm
FROM dec
GROUP BY decile
ORDER BY decile
"""


# --------- X32: character-class composition profile (round 15) ------------
def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X32: per-source character-class composition — the cheapest
    corpus fingerprint there is (a source whose digit share doubles
    week-over-week started emitting logs/IDs; a punctuation spike =
    markup leakage; C4 gates threshold exactly these ratios): per
    source, total chars and exact-ppm shares of alphabetic, digit,
    space, and other characters.

    Exactness: class counts are length-difference arithmetic on
    regexp_replace (count = len − len(text with the class removed) —
    engine-identical on anchored single-char classes); totals int64;
    shares truncating integer ppm.  Scale: one narrow per-row
    projection, ONE map-side-combined ≤|sources|-group aggregate."""
    docs = load(spark, sf_dir, "documents")
    return charclass_report(charclass_counts(docs))


def charclass_counts(docs: DataFrame) -> DataFrame:
    """Per-row (source, n, a, d, s) char-class counts — stateless
    length-difference arithmetic shared verbatim by the batch plan and
    the T45 streaming monitor (the T41/T44 shared-expression rule)."""

    def cnt(cls: str) -> F.Column:
        return F.length("text") - F.length(
            F.regexp_replace("text", cls, "")
        )

    return docs.select(
        "source",
        F.length("text").cast("long").alias("n"),
        cnt("[A-Za-z]").cast("long").alias("a"),
        cnt("[0-9]").cast("long").alias("d"),
        cnt("[ ]").cast("long").alias("s"),
    )


def charclass_sums(per: DataFrame) -> DataFrame:
    """≤|sources|-group integer sums — commutative, so a complete-mode
    streaming aggregation merges to the identical relation."""
    return per.groupBy("source").agg(
        F.sum("n").alias("n_chars"),
        F.sum("a").alias("na"),
        F.sum("d").alias("nd"),
        F.sum("s").alias("ns"),
    )


def charclass_report(per: DataFrame, summed: bool = False) -> DataFrame:
    """The X32 ppm derivation over the reduced per-source sums."""
    sums = per if summed else charclass_sums(per)
    return sums.select(
        "source",
        "n_chars",
        F.expr("na * 1000000 div n_chars").alias("alpha_ppm"),
        F.expr("nd * 1000000 div n_chars").alias("digit_ppm"),
        F.expr("ns * 1000000 div n_chars").alias("space_ppm"),
        F.expr(
            "(n_chars - na - nd - ns) * 1000000 div n_chars"
        ).alias("other_ppm"),
    ).orderBy("source")


ORACLE_text_charclass_profile = """
WITH per AS (
    SELECT source,
           CAST(len(text) AS BIGINT) AS n,
           CAST(len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g'))
                AS BIGINT) AS a,
           CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
                AS BIGINT) AS d,
           CAST(len(text) - len(regexp_replace(text, '[ ]', '', 'g'))
                AS BIGINT) AS s
    FROM documents
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_chars,
       CAST(sum(a) * 1000000 // sum(n) AS BIGINT) AS alpha_ppm,
       CAST(sum(d) * 1000000 // sum(n) AS BIGINT) AS digit_ppm,
       CAST(sum(s) * 1000000 // sum(n) AS BIGINT) AS space_ppm,
       CAST((sum(n) - sum(a) - sum(d) - sum(s)) * 1000000 // sum(n) AS BIGINT)
           AS other_ppm
FROM per
GROUP BY source
ORDER BY source
"""


# ----------- X33: cross-source vocabulary overlap matrix (round 15) -------
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X33: pairwise vocabulary Jaccard between sources — the
    source-similarity matrix a curation pipeline reads next to D26's
    document-level near-dup matrix (documents can be distinct while the
    VOCABULARY says two crawls cover the same domain; a mirror site
    shows up here first): per source pair (a < b), both vocab sizes,
    the shared-term count, and exact-ppm Jaccard.

    Exactness: vocab = DISTINCT whitespace tokens per source (set
    semantics, no weighting); intersection by a term-keyed equi-join of
    the distinct relation with itself (a < b); Jaccard ppm by
    truncating integer division of |∩| against |a|+|b|−|∩|.

    Scale: NEVER source²-by-content — the vocab relation collapses to
    ONE row per term carrying its sorted source set (a ≤|sources| array),
    pairs are generated IN-ROW from that array (fan-out ≤ C(|sources|,2)
    per term, a constant), and both the pair counts and the per-source
    sizes are map-side-combined aggregates of the same term relation —
    no vocab self-join, no second distinct pass over the corpus."""
    docs = load(spark, sf_dir, "documents")
    per_term = (
        docs.select(
            "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
        )
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
    )
    pair_expr = (
        "flatten(transform(sequence(1, size(ss) - 1), i ->"
        " transform(sequence(i + 1, size(ss)), j -> named_struct("
        "   'a', element_at(ss, i), 'b', element_at(ss, j)))))"
    )
    inter = (
        per_term.filter(F.size("ss") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy(
            F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = (
        per_term.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_terms"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_terms").alias("n_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_terms").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_inter",
            F.expr(
                "n_inter * 1000000 div (n_a + n_b - n_inter)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


ORACLE_source_vocab_overlap = """
WITH terms AS (
    SELECT DISTINCT source, t
    FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS t
          FROM documents)
    WHERE t <> ''
), sizes AS (
    SELECT source, count(*) AS n_terms FROM terms GROUP BY source
), inter AS (
    SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
    FROM terms a JOIN terms b ON a.t = b.t AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT source_a, source_b,
       CAST(sa.n_terms AS BIGINT) AS n_a,
       CAST(sb.n_terms AS BIGINT) AS n_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_inter * 1000000 // (sa.n_terms + sb.n_terms - n_inter)
            AS BIGINT) AS jaccard_ppm
FROM inter
JOIN sizes sa ON inter.source_a = sa.source
JOIN sizes sb ON inter.source_b = sb.source
ORDER BY source_a, source_b
"""


# -------- X34: main-content extraction / boilerplate strip (round 16) -----
def _markup_fixture_spark() -> str:
    """Deterministic pseudo-HTML synthesized from (doc_id, text): a nav
    bar, the document's first half as a paragraph, a link-list aside,
    the second half as a paragraph carrying ONE inline citation anchor,
    and a footer.  Shared shape with the DuckDB twin below; the corpus
    has no markup of its own, so the fixture IS the operator input —
    the same pattern the media family uses for binary payloads."""
    return (
        "concat_ws(chr(10),"
        " '<nav>Home | About | Contact</nav>',"
        " concat('<p>', substr(text, 1, length(text) div 2), '</p>'),"
        " concat('<aside>Related: <a>item', cast(doc_id % 7 as string),"
        "        '</a> <a>item', cast(doc_id % 5 as string),"
        "        '</a> <a>item', cast(doc_id % 3 as string),"
        "        '</a></aside>'),"
        " concat('<p>', substr(text, (length(text) div 2) + 1),"
        "        ' see <a>ref', cast(doc_id % 5 as string), '</a></p>'),"
        " '<footer>(c) corp 2026</footer>')"
    )


def text_extract_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X34: main-content extraction / boilerplate strip — the standard
    pretraining stage X32 only *detects* (r15 verdict #4): the
    trafilatura/jusText shape reduced to engine-portable string ops.
    Each document is wrapped in a deterministic markup fixture (nav +
    two content paragraphs + link-list aside + footer); the operator
    strips tags and drops boilerplate lines by the length-short and
    link-density rules (datapipe/text.py:extract_main_content), then
    this report accounts removed bytes per source.

    Exactness: per-line content/anchor lengths are length-difference
    arithmetic on regexp_replace (both engines replace ALL matches —
    DuckDB via the 'g' flag); the keep predicate and ppm shares are
    truncating integer division; the nav/footer exercise the length
    rule, the aside the link-density rule, the citation anchor in
    paragraph 2 proves an inline link alone does NOT kill a content
    line, and sub-50-char docs lose their first half to the length
    rule (deterministically, both engines).

    Scale: the fixture + extraction are ONE narrow in-row projection
    (higher-order functions over the 5-line split — no explode); the
    only exchange is the final ≤|sources|-group aggregate."""
    docs = load(spark, sf_dir, "documents")
    return extract_report(extract_sums(extract_doc_stats(docs)))


def extract_doc_stats(docs: DataFrame) -> DataFrame:
    """Per-doc (source, raw_chars, content_chars, n_lines, n_boiler,
    doc_removed_ppm) over the synthesized markup fixture — stateless
    in-row projection shared verbatim by the batch plan and the T48
    streaming monitor (the T41/T44/T45 shared-expression rule)."""
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.datapipe.text import (
        extract_main_content,
    )

    marked = docs.select(
        "doc_id", "source", F.expr(_markup_fixture_spark()).alias("html")
    )
    return extract_main_content(marked).withColumn(
        "doc_removed_ppm",
        F.expr(
            "(raw_chars - content_chars) * 1000000 div raw_chars"
        ),
    )


def extract_sums(per: DataFrame) -> DataFrame:
    """≤|sources|-group sums + max — commutative, so a complete-mode
    streaming aggregation merges to the identical relation."""
    from pyspark.sql import functions as F

    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("raw_chars").alias("raw_chars"),
        F.sum("content_chars").alias("content_chars"),
        F.sum("n_boiler").alias("boiler_lines"),
        F.sum(F.expr("n_lines - n_boiler")).alias("content_lines"),
        F.max("doc_removed_ppm").alias("max_doc_removed_ppm"),
    )


def extract_report(sums: DataFrame) -> DataFrame:
    """The X34 ppm derivation over the reduced per-source sums."""
    from pyspark.sql import functions as F

    return sums.select(
        "source",
        "n_docs",
        "raw_chars",
        "content_chars",
        "boiler_lines",
        "content_lines",
        F.expr(
            "(raw_chars - content_chars) * 1000000 div raw_chars"
        ).alias("removed_ppm"),
        "max_doc_removed_ppm",
    ).orderBy("source")


#: DuckDB twin of :func:`_markup_fixture_spark` — ONE definition shared
#: by the X34 and X35 oracles so the fixture cannot drift between them
_MARKUP_SQL = """concat_ws(chr(10),
           '<nav>Home | About | Contact</nav>',
           concat('<p>', substr(text, 1, len(text) // 2), '</p>'),
           concat('<aside>Related: <a>item', CAST(doc_id % 7 AS VARCHAR),
                  '</a> <a>item', CAST(doc_id % 5 AS VARCHAR),
                  '</a> <a>item', CAST(doc_id % 3 AS VARCHAR),
                  '</a></aside>'),
           concat('<p>', substr(text, (len(text) // 2) + 1),
                  ' see <a>ref', CAST(doc_id % 5 AS VARCHAR), '</a></p>'),
           '<footer>(c) corp 2026</footer>')"""


def _x34_oracle() -> str:
    from project_obsidian_core_spark.datapipe.text import (
        ANCHOR_RE,
        BOILER_LINK_PPM,
        BOILER_MIN_CHARS,
        TAG_RE,
    )

    markup = _MARKUP_SQL
    strip = f"regexp_replace(l, '{TAG_RE}', '', 'g')"
    noanchor = (
        f"regexp_replace(regexp_replace(l, '{ANCHOR_RE}', '', 'g'),"
        f" '{TAG_RE}', '', 'g')"
    )
    return f"""
WITH m AS (
    SELECT source, {markup} AS html
    FROM documents
), st AS (
    SELECT source,
           CAST(len(html) AS BIGINT) AS raw_chars,
           len(string_split(html, chr(10))) AS n_lines,
           list_filter(
               list_transform(string_split(html, chr(10)), l ->
                   struct_pack(clen := len({strip}),
                               alen := len({strip}) - len({noanchor}))),
               s -> s['clen'] >= {BOILER_MIN_CHARS}
                    AND s['alen'] * 1000000 // greatest(s['clen'], 1)
                        < {BOILER_LINK_PPM}) AS kept
    FROM m
), per AS (
    SELECT source, raw_chars, n_lines,
           CAST(coalesce(list_aggregate(
               list_transform(kept, s -> CAST(s['clen'] AS BIGINT)),
               'sum'), 0) AS BIGINT) AS content_chars,
           len(kept) AS n_kept
    FROM st
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(raw_chars) AS BIGINT) AS raw_chars,
       CAST(sum(content_chars) AS BIGINT) AS content_chars,
       CAST(sum(n_lines - n_kept) AS BIGINT) AS boiler_lines,
       CAST(sum(n_kept) AS BIGINT) AS content_lines,
       CAST(sum(raw_chars - content_chars) * 1000000 // sum(raw_chars)
            AS BIGINT) AS removed_ppm,
       CAST(max((raw_chars - content_chars) * 1000000 // raw_chars)
            AS BIGINT) AS max_doc_removed_ppm
FROM per
GROUP BY source
ORDER BY source
"""


ORACLE_text_extract_content = _x34_oracle()


# -------- X35: line-frequency template detection (round 16) ---------------
TEMPLATE_DOC_SHARE_PPM = 500_000  # a line in >= half the source's docs


def text_template_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X35: corpus-statistical boilerplate detection by LINE FREQUENCY
    — the ccnet/Common-Crawl rule X34's per-line heuristics cannot
    express: a line occurring in most of a source's documents is
    template chrome NO MATTER how long or link-free it is (cookie
    banners, legal footers, "subscribe" calls pass every local rule).
    The two detectors compose: X34 drops lines a single document
    convicts, X35 drops lines the CORPUS convicts.  Runs on the X34
    markup fixture, where the nav/footer lines are identical across
    docs and the paragraph lines are unique — so the report separates
    them by frequency alone.

    Per source: line instances, distinct lines, template lines (in ≥
    {TEMPLATE_DOC_SHARE_PPM} ppm of the source's docs), and the ppm of
    line INSTANCES a template-strip would remove.

    Exactness: line identity is the md5 of the stripped line; doc
    share per distinct line = distinct-doc count · 10⁶ div n_docs
    (truncating); all counts int64.  Scale: the one explode is the
    tf-idf-shaped (doc, line) relation — 5 rows/doc, bounded fan-out —
    into a map-side-combined (source, line-hash) aggregate; the
    report aggregate rides ≤|sources|·|distinct lines| rows."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    lines = (
        docs.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"split({_markup_fixture_spark()}, chr(10))"
                )
            ).alias("line"),
        )
        .select(
            "doc_id",
            "source",
            F.md5(F.expr("regexp_replace(line, '<[^>]*>', '')")).alias("lh"),
        )
    )
    n_docs = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per_line = lines.groupBy("source", "lh").agg(
        F.count(F.lit(1)).alias("n_inst"),
        F.count_distinct("doc_id").alias("n_docs_with"),
    )
    flagged = per_line.join(F.broadcast(n_docs), "source").withColumn(
        "is_template",
        F.expr(
            f"n_docs_with * 1000000 div n_docs >= {TEMPLATE_DOC_SHARE_PPM}"
        ),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.sum("n_inst").alias("line_instances"),
            F.count(F.lit(1)).alias("distinct_lines"),
            F.sum(F.when(F.col("is_template"), 1).otherwise(0)).alias(
                "template_lines"
            ),
            F.sum(
                F.when(F.col("is_template"), F.col("n_inst")).otherwise(0)
            ).alias("template_instances"),
        )
        .withColumn(
            "template_share_ppm",
            F.expr("template_instances * 1000000 div line_instances"),
        )
        .orderBy("source")
    )


def _x35_oracle() -> str:
    markup = _MARKUP_SQL
    return f"""
WITH m AS (
    SELECT doc_id, source, {markup} AS html FROM documents
), lines AS (
    SELECT doc_id, source,
           md5(regexp_replace(l.line, '<[^>]*>', '', 'g')) AS lh
    FROM m, unnest(string_split(html, chr(10))) AS l(line)
), nd AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
), per_line AS (
    SELECT source, lh,
           CAST(count(*) AS BIGINT) AS n_inst,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_with
    FROM lines GROUP BY source, lh
), flagged AS (
    SELECT p.source, p.n_inst,
           p.n_docs_with * 1000000 // nd.n_docs
               >= {TEMPLATE_DOC_SHARE_PPM} AS is_template,
           nd.n_docs
    FROM per_line p JOIN nd ON p.source = nd.source
)
SELECT source,
       CAST(any_value(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_inst) AS BIGINT) AS line_instances,
       CAST(count(*) AS BIGINT) AS distinct_lines,
       CAST(sum(CASE WHEN is_template THEN 1 ELSE 0 END) AS BIGINT)
           AS template_lines,
       CAST(sum(CASE WHEN is_template THEN n_inst ELSE 0 END) AS BIGINT)
           AS template_instances,
       CAST(sum(CASE WHEN is_template THEN n_inst ELSE 0 END) * 1000000
            // sum(n_inst) AS BIGINT) AS template_share_ppm
FROM flagged
GROUP BY source
ORDER BY source
"""


ORACLE_text_template_lines = _x35_oracle()
