"""Driver-facing query wrappers for the datapipe text operators.

Each oracle SQL string is *generated from the same constants* as the Spark
operator (profiles, stopwords, regexes, weights) so the two sides cannot
drift. Determinism rules per plans/common.py; the shared 60-bit hash is
documented in datapipe/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import text as T
from project_obsidian_core_spark.plans.common import load


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _docs_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ordered by doc_id BEFORE the per-row feature projection.

    For the pure per-row operators (token stats, quality, lang-id,
    fingerprint, simhash) a trailing ``.orderBy`` made the range
    exchange's boundary-sampling job re-execute the whole expensive
    projection a second time (the sample pass runs the full child plan;
    measured 2.5 → 1.5 s on text_fingerprint at sf0.1, r16 optimization
    round).  Sorting the RAW rows first costs the sampling pass only the
    scan, and a deterministic per-row projection preserves the range
    partitioning and intra-partition order, so the output rows and
    their order are identical.  Only valid for shuffle-free per-row
    operators — anything with an internal exchange destroys the
    pre-sort and must keep its own trailing orderBy.
    """
    return load(spark, sf_dir, "documents").orderBy("doc_id")


# ------------------------------------------------------------- token stats
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) over documents."""
    return T.with_token_stats(_docs_by_id(spark, sf_dir))


ORACLE_text_token_stats = f"""
SELECT doc_id,
       length(text) AS n_chars_measured,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')) AS n_bpe_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       CASE WHEN len(string_split(text, ' ')) > 0
            THEN CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                 / len(string_split(text, ' '))
            ELSE 0.0 END AS avg_token_len
FROM documents
ORDER BY doc_id
"""


# ------------------------------------------------------------ quality score
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length/punct/stopword/diversity ratios)."""
    return T.with_quality_score(_docs_by_id(spark, sf_dir))


ORACLE_text_quality = f"""
WITH b AS (
    SELECT doc_id,
           string_split(text, ' ') AS toks,
           length(text) AS n_chars,
           length(regexp_replace(text, '{T.PUNCT_RE}', '', 'g')) AS punct
    FROM documents
), f AS (
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_filter(toks, x -> x IN ({_sql_list(T.STOPWORDS)}))) AS stop_hits,
           len(list_distinct(toks)) AS n_uniq,
           punct, n_chars
    FROM b
), r AS (
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / n_tokens ELSE 0.0 END AS stopword_ratio,
           CASE WHEN n_tokens > 0 THEN CAST(n_uniq AS DOUBLE) / n_tokens ELSE 0.0 END AS uniq_ratio,
           CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
           least(1.0, CAST(n_chars AS DOUBLE) / 500.0) AS len_score
    FROM f
)
SELECT doc_id, n_tokens, stopword_ratio, uniq_ratio, punct_ratio,
       least(1.0, greatest(
           0.35 * len_score + 0.25 * uniq_ratio
           + 0.25 * (1.0 - punct_ratio) + 0.15 * (1.0 - stopword_ratio),
           0.0)) AS quality_score
FROM r
ORDER BY doc_id
"""


# ----------------------------------------------------------------- lang id
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-based language-ID with deterministic argmax."""
    return T.with_lang_id(_docs_by_id(spark, sf_dir))


def _lang_oracle(body_only: bool = False) -> str:
    names = list(T.LANG_PROFILES)
    score_cols = ",\n           ".join(
        f"CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN "
        f"({_sql_list(T.LANG_PROFILES[n])}))) AS DOUBLE) / len(toks) ELSE 0.0 END AS score_{n}"
        for n in names
    )
    branches = []
    for i, n in enumerate(names):
        conds = [f"score_{n} > score_{o}" for o in names[:i]] + [
            f"score_{n} >= score_{o}" for o in names[i + 1 :]
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{n}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{names[0]}' END"
    body = f"""
WITH b AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
    SELECT doc_id,
           {score_cols}
    FROM b
)
SELECT doc_id, {', '.join('score_' + n for n in names)},
       {case} AS lang_pred
FROM s
"""
    # unordered body is reused as a CTE by consumers (vocab_fertility);
    # exposing it directly beats string surgery on the rendered SQL
    # (r14 advice: an rindex() slice broke the whole plans package import
    # the moment the tail changed)
    if body_only:
        return body
    return body + "ORDER BY doc_id\n"


ORACLE_text_lang_id = _lang_oracle()


# -------------------------------------------------------------- fingerprint
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-gram min-hash content fingerprint per document."""
    return T.with_fingerprint(_docs_by_id(spark, sf_dir))


_K = T.FINGERPRINT_K
_FP_POLY = " + ".join(
    f"cds[i + {j}] * {128 ** (T.FINGERPRINT_K - 1 - j)}" for j in range(T.FINGERPRINT_K)
)
ORACLE_text_fingerprint = f"""
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS norm
    FROM documents
), c AS (
    SELECT doc_id, norm,
           list_transform(string_split(norm, ''), ch -> CAST(ascii(ch) AS BIGINT)) AS cds
    FROM n
)
SELECT doc_id,
       length(norm) AS norm_len,
       CASE WHEN length(norm) >= {_K}
            THEN list_aggregate(
                [((({_FP_POLY}) % {T.FP_P}) * {T.FP_MULT}) % {T.FP_P}
                 for i in generate_series(1, greatest(length(norm) - {_K - 1}, 1))],
                'min')
            ELSE CAST('0x' || substr(md5(norm), 1, 15) AS BIGINT)
       END AS fingerprint
FROM c
ORDER BY doc_id
"""


# =============================================================== dedup ====
from project_obsidian_core_spark.datapipe import dedup as D  # noqa: E402
from project_obsidian_core_spark.datapipe import vectors as V  # noqa: E402


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup groups (keeper = min doc_id)."""
    return D.exact_groups(load(spark, sf_dir, "documents")).orderBy("text_hash")


ORACLE_dedup_exact = """
SELECT md5(text) AS text_hash,
       count(*) AS n_docs,
       min(doc_id) AS keeper_doc_id
FROM documents
GROUP BY 1
ORDER BY text_hash
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates with exact-jaccard verification (>= 0.1)."""
    return (
        D.minhash_candidates(load(spark, sf_dir, "documents"))
        .filter(F.col("jaccard") >= 0.1)
        .orderBy("doc_a", "doc_b")
    )


def _minhash_oracle() -> str:
    P, w, r = D.MINHASH_P, D.SHINGLE_W, D.MINHASH_BAND_ROWS
    h60 = "CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)"
    mh_items = ", ".join(
        f"list_aggregate(list_transform(hs, x -> ({a} * x + {b}) % {P}), 'min')"
        for a, b in D.MINHASH_COEF
    )
    key = "concat_ws('_', " + ", ".join(
        f"mh[band_idx * {r} + {row + 1}]" for row in range(r)
    ) + ")"
    return f"""
WITH t AS (
    SELECT doc_id,
           list_distinct([array_to_string(toks[i:i+{w - 1}], ' ')
               for i in generate_series(1, greatest(len(toks) - {w - 1}, 1))]) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
), h AS (
    SELECT doc_id, sh,
           list_transform(sh, s -> {h60} % {P}) AS hs
    FROM t
), m AS (
    SELECT doc_id, sh, [{mh_items}] AS mh FROM h
), buckets AS (
    SELECT doc_id, band_idx, {key} AS band_key
    FROM m, (SELECT unnest(generate_series(0, {D.MINHASH_BANDS - 1})) AS band_idx)
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM buckets a JOIN buckets b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / len(list_distinct(sa.sh || sb.sh)) AS jaccard
FROM cand c
JOIN t sa ON sa.doc_id = c.doc_a
JOIN t sb ON sb.doc_id = c.doc_b
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / len(list_distinct(sa.sh || sb.sh)) >= 0.1
ORDER BY doc_a, doc_b
"""


ORACLE_dedup_minhash_lsh = _minhash_oracle()


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash signatures."""
    return D.simhash_signatures(_docs_by_id(spark, sf_dir))


def _simhash_oracle() -> str:
    h = "list_transform(list_distinct(string_split(text, ' ')), s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 4294967296)"
    terms = " + ".join(
        f"CASE WHEN 2 * len(list_filter(h, x -> (x // {2 ** b}) % 2 = 1)) > len(h) "
        f"THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(D.SIMHASH_BITS)
    )
    return f"""
WITH t AS (SELECT doc_id, {h} AS h FROM documents)
SELECT doc_id, len(h) AS n_tokens, {terms} AS simhash
FROM t
ORDER BY doc_id
"""


ORACLE_dedup_simhash = _simhash_oracle()


_NGRAM_GATE_SAMPLE = 1000


def dedup_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 char-4-gram Jaccard pairs within source blocks — the
    STRING-gram exactness gate, bounded to a doc_id slice.

    The string path exists to prove the gram semantics; its full-corpus
    run was the single slowest bench query (34 s at sf0.1) while the
    hashed twin below produces bit-identical output at 4x less wall.
    So the string gate keeps a bounded slice (every block still
    contributes pairs) and :func:`dedup_ngram_pairs_hashed` carries the
    full-corpus timing + oracle — the production deployment shape."""
    return (
        D.ngram_jaccard_pairs(
            load(spark, sf_dir, "documents").filter(
                F.col("doc_id") < _NGRAM_GATE_SAMPLE
            )
        )
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


def dedup_ngram_pairs_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale twin of :func:`dedup_ngram_pairs` — identical output, checked
    against the SAME string-gram oracle, but the pairwise intersections
    run over xxhash64-hashed int64 gram sets (4x the string path's wall
    at sf0.1; collision odds ~2⁻⁶⁴ per pair — the gate match IS the
    no-collision proof on this corpus)."""
    return (
        D.ngram_jaccard_pairs(
            load(spark, sf_dir, "documents"), hashed_grams=True
        )
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(20)
    )


def _ngram_oracle(where: str = "") -> str:
    return f"""
WITH t AS (
    SELECT doc_id, source AS block,
           list_distinct([substring(text, i, {D.NGRAM_W})
               for i in generate_series(1, greatest(length(text) - {D.NGRAM_W - 1}, 1))]) AS gr
    FROM documents{where}
)
SELECT a.block AS block, a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
           / len(list_distinct(a.gr || b.gr)) AS jaccard
FROM t a JOIN t b ON a.block = b.block AND a.doc_id < b.doc_id
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
"""


ORACLE_dedup_ngram_pairs = _ngram_oracle(
    f" WHERE doc_id < {_NGRAM_GATE_SAMPLE}"
)
# full-corpus string-gram truth: gates the hashed int64 twin
ORACLE_dedup_ngram_pairs_full = _ngram_oracle()


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 directed shingle-containment pairs drawn from the MinHash-LSH
    candidate buckets — the asymmetric (short-doc-inside-long-doc) near-dup
    rule on the scale path: pair count bounded by bucket geometry (with the
    max_bucket guard available), never corpus-quadratic. Exact ppm integer
    scores; ordered by the max direction."""
    return (
        D.minhash_containment_pairs(load(spark, sf_dir, "documents"))
        .orderBy(F.desc("cont_max_ppm"), "doc_a", "doc_b")
        .limit(20)
    )


def _containment_oracle() -> str:
    P, w, r = D.MINHASH_P, D.SHINGLE_W, D.MINHASH_BAND_ROWS
    h60 = "CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)"
    mh_items = ", ".join(
        f"list_aggregate(list_transform(hs, x -> ({a} * x + {b}) % {P}), 'min')"
        for a, b in D.MINHASH_COEF
    )
    key = "concat_ws('_', " + ", ".join(
        f"mh[band_idx * {r} + {row + 1}]" for row in range(r)
    ) + ")"
    return f"""
WITH t AS (
    SELECT doc_id,
           list_distinct([array_to_string(toks[i:i+{w - 1}], ' ')
               for i in generate_series(1, greatest(len(toks) - {w - 1}, 1))]) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
), h AS (
    SELECT doc_id, sh,
           list_transform(sh, s -> {h60} % {P}) AS hs
    FROM t
), m AS (
    SELECT doc_id, sh, [{mh_items}] AS mh FROM h
), buckets AS (
    SELECT doc_id, band_idx, {key} AS band_key
    FROM m, (SELECT unnest(generate_series(0, {D.MINHASH_BANDS - 1})) AS band_idx)
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM buckets a JOIN buckets b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), pairs AS (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 1000000
               // CAST(len(sa.sh) AS BIGINT) AS cont_a_ppm,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 1000000
               // CAST(len(sb.sh) AS BIGINT) AS cont_b_ppm
    FROM cand c
    JOIN t sa ON sa.doc_id = c.doc_a
    JOIN t sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, cont_a_ppm, cont_b_ppm,
       greatest(cont_a_ppm, cont_b_ppm) AS cont_max_ppm
FROM pairs
ORDER BY cont_max_ppm DESC, doc_a, doc_b
LIMIT 20
"""


ORACLE_dedup_containment_pairs = _containment_oracle()


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 within-label cosine pairs over the embeddings table."""
    return (
        D.embedding_cosine_pairs(load(spark, sf_dir, "embeddings"))
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
        .limit(50)
    )


_EMB_DIM = 64
ORACLE_dedup_embedding_cosine = f"""
WITH t AS (
    SELECT vec_id, label AS block, embedding AS v,
           {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings
)
SELECT a.block AS block, a.vec_id AS vec_a, b.vec_id AS vec_b,
       {V.sql_dot('a.v', 'b.v', _EMB_DIM)} / (a.nrm * b.nrm) AS cos_sim
FROM t a JOIN t b ON a.block = b.block AND a.vec_id < b.vec_id
ORDER BY cos_sim DESC, vec_a, vec_b
LIMIT 50
"""


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 cosine pairs blocked by SIGN-LSH bucket (bits=8) — the
    label-free production path of dedup_embedding_cosine (round 6; a raw
    crawl corpus has no label column to block on)."""
    return (
        D.embedding_lsh_pairs(load(spark, sf_dir, "embeddings"), bits=8)
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
        .limit(50)
    )


def _oracle_dedup_embedding_lsh(bits: int) -> str:
    from project_obsidian_core_spark.datapipe import similarity as _S

    return f"""
WITH t AS (
    SELECT vec_id, {_S.sql_lsh_bucket('embedding', bits=bits)} AS block,
           embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings
)
SELECT a.block AS block, a.vec_id AS vec_a, b.vec_id AS vec_b,
       {V.sql_dot('a.v', 'b.v', _EMB_DIM)} / (a.nrm * b.nrm) AS cos_sim
FROM t a JOIN t b ON a.block = b.block AND a.vec_id < b.vec_id
ORDER BY cos_sim DESC, vec_a, vec_b
LIMIT 50
"""


ORACLE_dedup_embedding_lsh = _oracle_dedup_embedding_lsh(8)


# ========================================================== similarity ====
from project_obsidian_core_spark.datapipe import similarity as S  # noqa: E402

_N_QUERY_VECS = 5
_TOPK = 10


def _query_vecs(spark: SparkSession, sf_dir: str):
    emb = load(spark, sf_dir, "embeddings")
    return emb, emb.filter(F.col("vec_id") < _N_QUERY_VECS)


def knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the first 5 vectors (broadcast query side)."""
    emb, q = _query_vecs(spark, sf_dir)
    return _present_topk(S.brute_force_topk(emb, q, k=_TOPK))


ORACLE_knn_brute = f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id < {_N_QUERY_VECS} AND q.vec_id != c.vec_id
), ranked AS (
    SELECT q_id, cand_id, cos_sim,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
)
SELECT q_id, cand_id, cos_sim, rank FROM ranked
WHERE rank <= {_TOPK}
ORDER BY q_id, rank
"""


def _present_topk(out: DataFrame) -> DataFrame:
    """Deterministic presentation order for a top-k result.

    The result is ≤ k·|queries| rows BY CONSTRUCTION (50 here), so a
    1-partition sort is scale-safe and replaces the range-sampling
    exchange a global ``orderBy`` schedules — one fewer job per run on a
    bounded relation (r13 verdict Next #3)."""
    return out.coalesce(1).sortWithinPartitions("q_id", "rank")


def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH ANN: query bucket + Hamming-1 ring.

    The queries are corpus rows, so the self-query path computes the
    bucket hash on ONE scan and filters the query side from it."""
    emb = load(spark, sf_dir, "embeddings")
    return _present_topk(
        S.lsh_topk_selfquery(emb, F.col("vec_id") < _N_QUERY_VECS, k=_TOPK)
    )


def _oracle_knn_lsh(bits: int) -> str:
    """DuckDB oracle for :func:`lsh_topk` at any hash geometry — generated
    from the SAME plane matrix (`sql_lsh_bucket(bits=...)`), so the
    round-6 bits/dim knobs stay oracle-checkable at every setting."""
    flips = ", ".join(str(2 ** i) for i in range(bits))
    return f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm,
           {S.sql_lsh_bucket('embedding', bits=bits)} AS bucket
    FROM embeddings
), probes AS (
    SELECT vec_id, v, nrm, CAST(xor(bucket, f) AS BIGINT) AS bucket
    FROM t, (SELECT unnest([0, {flips}]) AS f)
    WHERE vec_id < {_N_QUERY_VECS}
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM probes q, t c
    WHERE q.vec_id != c.vec_id AND q.bucket = c.bucket
), ranked AS (
    SELECT q_id, cand_id, cos_sim,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
)
SELECT q_id, cand_id, cos_sim, rank FROM ranked
WHERE rank <= {_TOPK}
ORDER BY q_id, rank
"""


ORACLE_knn_lsh = _oracle_knn_lsh(S.LSH_BITS)

#: scaled LSH geometry exercised end-to-end by knn_lsh_scaled: 8 bits →
#: 256 buckets (the multi-probe ring then scans 9/256 ≈ 3.5% of the corpus
#: per query instead of 5/16 ≈ 31% at the 4-bit default).
_LSH_SCALED_BITS = 8


def knn_lsh_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lsh_topk at the SCALED hash geometry (bits=8 → 256 buckets) — the
    round-6 proof that the 100 TB knob is code, not a docstring: same
    operator, same oracle generator, 16× finer bucketing."""
    emb = load(spark, sf_dir, "embeddings")
    return _present_topk(
        S.lsh_topk_selfquery(
            emb, F.col("vec_id") < _N_QUERY_VECS, k=_TOPK, bits=_LSH_SCALED_BITS
        )
    )


ORACLE_knn_lsh_scaled = _oracle_knn_lsh(_LSH_SCALED_BITS)


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: deterministic seed quantizer, nprobe=2 cell probe."""
    emb, q = _query_vecs(spark, sf_dir)
    return S.ivf_topk(emb, q, k=_TOPK).orderBy("q_id", "rank")


ORACLE_knn_ivf = f"""
WITH e AS (
    SELECT vec_id, label, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings
), seeds AS (
    SELECT label AS cell, v AS seed_v, nrm AS seed_nrm
    FROM e
    QUALIFY row_number() OVER (PARTITION BY label ORDER BY vec_id) = 1
), cell_scored AS (
    SELECT e.vec_id, e.v, e.nrm, s.cell,
           {V.sql_dot('e.v', 's.seed_v', _EMB_DIM)} / (e.nrm * s.seed_nrm) AS cell_sim
    FROM e, seeds s
), resident AS (
    SELECT vec_id, v, nrm, cell FROM cell_scored
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cell_sim DESC, cell ASC) <= 1
), probes AS (
    SELECT vec_id, v, nrm, cell FROM cell_scored
    WHERE vec_id < {_N_QUERY_VECS}
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cell_sim DESC, cell ASC) <= {S.NPROBE}
), scored AS (
    SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM probes q JOIN resident c
      ON q.cell = c.cell AND q.vec_id != c.vec_id
), ranked AS (
    SELECT q_id, cand_id, cos_sim,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
)
SELECT q_id, cand_id, cos_sim, rank FROM ranked
WHERE rank <= {_TOPK}
ORDER BY q_id, rank
"""


# ========================================================== multimodal ====
from project_obsidian_core_spark.datapipe import multimodal as M  # noqa: E402


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bytes-level media features via the mapInPandas decode stub.

    Presentation order is within-partition only: the output is one row
    per document (corpus-sized), so a global ``orderBy`` would schedule a
    range-sampling pass + full exchange purely for display — exactly the
    plan the 100 TB lens forbids.  The driver's oracle compare is
    order-insensitive; readers wanting a global order sort the (tiny)
    slice they display (r13 verdict Next #3: this halved the query's
    fixed overhead)."""
    media = M.attach_media(load(spark, sf_dir, "documents")).select(
        "doc_id", "media_type", "content", "width", "height"
    )
    return M.extract_features(media).sortWithinPartitions("doc_id")


_FULL_HEX = " || ".join(
    f"md5(text || ':{i}')" for i in range(1, M.PAYLOAD_BLOCKS + 1)
)
_N_PAYLOAD = M.PAYLOAD_BLOCKS * M.BLOCK_BYTES

ORACLE_media_features = f"""
WITH p AS (
    SELECT doc_id,
           (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
           {_FULL_HEX} AS fh
    FROM documents
), f AS (
    SELECT doc_id, media_type,
           list_aggregate([CAST('0x' || substr(fh, 2 * i - 1, 2) AS BIGINT)
                           for i in generate_series(1, {_N_PAYLOAD})], 'sum') AS byte_sum
    FROM p
)
SELECT doc_id, media_type,
       CAST({_N_PAYLOAD} AS BIGINT) AS n_bytes,
       CAST(byte_sum AS BIGINT) AS byte_sum,
       CAST(byte_sum AS DOUBLE) / {_N_PAYLOAD} AS byte_mean,
       CAST(16 + doc_id % 17 AS INTEGER) AS width,
       CAST(16 + doc_id % 13 AS INTEGER) AS height
FROM f
ORDER BY doc_id
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling of video payloads inside Arrow batches."""
    media = M.attach_media(load(spark, sf_dir, "documents"))
    return M.sample_frames(media).orderBy("doc_id", "frame_idx")


ORACLE_media_frame_sample = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents
    WHERE doc_id % 3 = 2
)
SELECT doc_id,
       CAST(j AS INTEGER) AS frame_idx,
       substr(fh, j * {M.FRAME_BYTES * 2} + 1, {M.FRAME_BYTES * 2}) AS frame_hex
FROM p, (SELECT unnest(generate_series(0, {M.PAYLOAD_BLOCKS - 1})) AS j)
ORDER BY doc_id, frame_idx
"""


# ------------------------------------------------- dedup cluster groups ---
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters over verified MinHash pairs: each doc in
    a candidate component mapped to its canonical keeper (min doc_id)."""
    pairs = D.minhash_candidates(load(spark, sf_dir, "documents")).filter(
        F.col("jaccard") >= 0.1
    )
    return D.connected_components(pairs).orderBy("doc_id")


def _clusters_oracle() -> str:
    # same generated CTE chain as ORACLE_dedup_minhash_lsh, then a recursive
    # min-label closure over the verified pairs
    body = _minhash_oracle()
    prefix, _, _ = body.partition("\nSELECT c.doc_a")
    prefix = prefix.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
    return f"""{prefix},
pairs AS (
    SELECT c.doc_a AS a, c.doc_b AS b
    FROM cand c
    JOIN t sa ON sa.doc_id = c.doc_a
    JOIN t sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(sa.sh || sb.sh)) >= 0.1
), edges AS (
    SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
), cc(node, label) AS (
    SELECT DISTINCT a AS node, a AS label FROM edges
    UNION
    SELECT e.a AS node, cc.label
    FROM cc JOIN edges e ON cc.node = e.b
    WHERE cc.label < e.a
)
SELECT node AS doc_id, min(label) AS cluster
FROM cc GROUP BY node
ORDER BY doc_id
"""


ORACLE_dedup_clusters = _clusters_oracle()


# ------------------------------------------------------------- tf-idf -----
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document (rational tf-idf)."""
    return T.tfidf_top_terms(load(spark, sf_dir, "documents"), k=3).orderBy(
        "doc_id", "rank"
    )


ORACLE_text_tfidf_topk = """
WITH pairs AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM pairs GROUP BY 1, 2
), n AS (
    SELECT count(*) AS n_docs FROM documents
), dfreq AS (
    SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1
), scored AS (
    SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
           CAST(dfreq.doc_freq AS BIGINT) AS doc_freq,
           CAST(tf.tf AS DOUBLE)
               * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(dfreq.doc_freq + 1 AS DOUBLE)) AS tfidf
    FROM tf JOIN dfreq USING (term), n
), ranked AS (
    SELECT doc_id, term, tf, doc_freq, tfidf,
           row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
    FROM scored
)
SELECT doc_id, term, tf, doc_freq, tfidf, rank
FROM ranked WHERE rank <= 3
ORDER BY doc_id, rank
"""


# ----------------------------------------------------------- media resize
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize of the synthetic image payloads (M-family):
    Arrow-batched numpy gather; oracle recomputes the resized bytes from
    the payload-generation formula (no codec needed on either side)."""
    docs = load(spark, sf_dir, "documents")
    return M.resize_images(M.attach_media(docs)).orderBy("doc_id")


_T = M.RESIZE_TARGET
_SRC_IDX = (
    f"((((s // {_T}) * h) // {_T}) * w + (((s % {_T}) * w) // {_T})) % {_N_PAYLOAD}"
)
ORACLE_media_resize = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh,
           16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h
    FROM documents WHERE doc_id % 3 = 0
), r AS (
    SELECT doc_id,
           [CAST('0x' || substr(fh, 2 * ({_SRC_IDX}) + 1, 2) AS BIGINT)
            FOR s IN generate_series(0, {_T * _T - 1})] AS px,
           list_aggregate([substr(fh, 2 * ({_SRC_IDX}) + 1, 2)
                           FOR s IN generate_series(0, {_T * _T - 1})],
                          'string_agg', '') AS hexstr
    FROM p
)
SELECT doc_id, CAST({_T} AS INTEGER) AS out_w, CAST({_T} AS INTEGER) AS out_h,
       CAST(list_aggregate(px, 'sum') AS BIGINT) AS pixel_sum,
       hexstr AS resized_hex
FROM r
ORDER BY doc_id
"""


# --------------------------------------------------------- audio resample
def media_resample_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D nearest-neighbor resample of the synthetic audio payloads."""
    docs = load(spark, sf_dir, "documents")
    return M.resample_audio(M.attach_media(docs)).orderBy("doc_id")


_RT = M.RESAMPLE_TARGET
_A_IDX = f"((s * {_N_PAYLOAD}) // {_RT})"
ORACLE_media_resample_audio = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 1
), r AS (
    SELECT doc_id,
           [CAST('0x' || substr(fh, 2 * {_A_IDX} + 1, 2) AS BIGINT)
            FOR s IN generate_series(0, {_RT - 1})] AS sm,
           list_aggregate([substr(fh, 2 * {_A_IDX} + 1, 2)
                           FOR s IN generate_series(0, {_RT - 1})],
                          'string_agg', '') AS hexstr
    FROM p
)
SELECT doc_id, CAST({_RT} AS INTEGER) AS n_samples,
       CAST(list_aggregate(sm, 'sum') AS BIGINT) AS sample_sum,
       hexstr AS resampled_hex
FROM r
ORDER BY doc_id
"""


# -------------------------------------------------------- simhash pairing
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash band-bucketed near-dup pairs with exact popcount filter."""
    return D.simhash_pairs(load(spark, sf_dir, "documents")).orderBy(
        "doc_a", "doc_b"
    )


def _simhash_pairs_oracle() -> str:
    bits = D.SIMHASH_BITS // D.SIMHASH_BANDS
    base = _simhash_oracle().rsplit("ORDER BY", 1)[0]
    band_structs = ", ".join(
        f"{{'band_idx': {b}, 'band_val': (simhash // {2 ** (bits * b)}) % {2 ** bits}}}"
        for b in range(D.SIMHASH_BANDS)
    )
    return f"""
WITH sigs AS ({base}),
bands AS (
    SELECT doc_id, simhash, unnest([{band_structs}]) AS bk FROM sigs
), bk AS (
    SELECT doc_id, simhash, bk.band_idx AS band_idx, bk.band_val AS band_val
    FROM bands
), cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.simhash AS sim_a, b.simhash AS sim_b
    FROM bk a JOIN bk b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
FROM cands
WHERE bit_count(xor(sim_a, sim_b)) <= {D.SIMHASH_HAMMING_MAX}
ORDER BY doc_a, doc_b
"""


ORACLE_dedup_simhash_pairs = _simhash_pairs_oracle()


# --------------------------------------------------- canonical selection
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware keeper selection per duplicate cluster: instead of the
    arbitrary min-doc_id keeper, each near-dup cluster keeps its
    HIGHEST-QUALITY member (ties to the lower id) — what a production
    dedup actually wants to retain.

    Determinism: argmax is encoded as an int64 MIN over
    ``floor((1 - quality)·10⁹)·10⁹ + doc_id`` (quality is the proven
    bit-identical score, floor() before widening; doc_id < 10⁹ documented),
    so both engines pick the same keeper without struct comparison.
    """
    from project_obsidian_core_spark.datapipe.text import with_quality_score

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_candidates(docs).filter(F.col("jaccard") >= 0.1)
    clusters = D.connected_components(pairs)
    quality = with_quality_score(docs).select("doc_id", "quality_score")
    key = (
        F.floor((F.lit(1.0) - F.col("quality_score")) * 1_000_000_000)
        * F.lit(1_000_000_000)
        + F.col("doc_id")
    )
    return (
        clusters.join(quality, "doc_id")
        .select("cluster", "doc_id", key.alias("_k"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (F.min("_k") % 1_000_000_000).alias("keeper_doc_id"),
        )
        .orderBy("cluster")
    )


def _canonical_oracle() -> str:
    # reuse the recursive cluster chain UP TO its final SELECT, which
    # becomes a named CTE here
    ctes = ORACLE_dedup_clusters.partition("\nSELECT node AS doc_id")[0]
    quality = ORACLE_text_quality.rsplit("ORDER BY", 1)[0]
    return f"""{ctes.rstrip().rstrip(',')},
clusters AS (
    SELECT node AS doc_id, min(label) AS cluster FROM cc GROUP BY node
), q AS ({quality})
SELECT c.cluster,
       count(*) AS n_members,
       CAST(min(CAST(floor((1.0 - q.quality_score) * 1000000000) AS BIGINT)
                * 1000000000 + c.doc_id) % 1000000000 AS BIGINT)
           AS keeper_doc_id
FROM clusters c JOIN q USING (doc_id)
GROUP BY c.cluster
ORDER BY c.cluster
"""


ORACLE_dedup_canonical = _canonical_oracle()


# ----------------------------------------------------- kNN graph degrees --
_GRAPH_VECS = 200
_GRAPH_K = 5


def knn_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the symmetrized exact 5-NN graph over the first
    200 vectors (the oracle-checkable exact subgraph; the LSH/IVF candidate
    paths plug into the same construction at scale)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    return S.knn_graph_degrees(emb, k=_GRAPH_K).orderBy("degree")


ORACLE_knn_graph_degree = f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings WHERE vec_id < {_GRAPH_VECS}
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id != c.vec_id
), ranked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
), edges AS (
    SELECT DISTINCT least(q_id, cand_id) AS a, greatest(q_id, cand_id) AS b
    FROM ranked WHERE rank <= {_GRAPH_K}
), degrees AS (
    SELECT node, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
    GROUP BY node
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM degrees GROUP BY degree
ORDER BY degree
"""


# ------------------------------------------- web-scale CC variant (ls/ss) --
def dedup_clusters_ls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same transitive clusters as dedup_clusters, computed by the
    large-star/small-star algorithm (O(log² n) rounds on ANY graph shape,
    vs diameter-many for propagation) — checked against the IDENTICAL
    recursive oracle, so the two CC implementations cannot drift."""
    pairs = D.minhash_candidates(load(spark, sf_dir, "documents")).filter(
        F.col("jaccard") >= 0.1
    )
    return D.connected_components_ls(pairs).orderBy("doc_id")


# ------------------------------------------------ IVF over learned cells --
def knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN whose coarse quantizer is the LEARNED k-means centroid set
    (the production construction: train quantizer → probe nprobe cells →
    exact cosine inside). Cell residency and probe lists are exact int64
    k-means arithmetic; the oracle composes the Lloyd CTE chain with the
    same probe/score SQL."""
    emb, q = _query_vecs(spark, sf_dir)
    return S.ivf_kmeans_topk(emb, q, k=_TOPK).orderBy("q_id", "rank")


def _ivf_kmeans_oracle(train_pred: str | None = None) -> str:
    from project_obsidian_core_spark.datapipe import clustering as KM
    from project_obsidian_core_spark.plans.clustering_queries import kmeans_cte_parts

    k, dim, nprobe = KM.KMEANS_K, KM.KMEANS_DIM, 2
    parts, final = kmeans_cte_parts(train_pred)
    cdist = (
        f"CAST(list_sum([(p.qv[j] - c.cv[j]) * (p.qv[j] - c.cv[j]) "
        f"FOR j IN generate_series(1, {dim})]) AS BIGINT)"
    )
    parts += [
        f"""res AS (
    SELECT vec_id, CAST(key % {k} AS BIGINT) AS c_cell FROM a{final}
)""",
        f"""cl AS (
    SELECT list({{'cluster': cluster, 'cv': cv}}) AS cs FROM c{final - 1}
)""",
        f"""pk AS (
    SELECT p.vec_id AS q_id,
           unnest(list_sort([{cdist} * {k} + c.cluster
                             FOR c IN cl.cs])[1:{nprobe}]) AS pkey
    FROM q p CROSS JOIN cl
    WHERE p.vec_id < {_N_QUERY_VECS}
)""",
        f"""probes AS (
    SELECT q_id, CAST(pkey % {k} AS BIGINT) AS probe_cell FROM pk
)""",
        f"""t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings
)""",
        f"""scored AS (
    SELECT p.q_id, r.vec_id AS cand_id,
           {V.sql_dot('tq.v', 'tc.v', _EMB_DIM)} / (tq.nrm * tc.nrm) AS cos_sim
    FROM probes p
    JOIN res r ON r.c_cell = p.probe_cell AND r.vec_id != p.q_id
    JOIN t tq ON tq.vec_id = p.q_id
    JOIN t tc ON tc.vec_id = r.vec_id
)""",
        """ranked AS (
    SELECT q_id, cand_id, cos_sim,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
)""",
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT q_id, cand_id, cos_sim, rank FROM ranked
WHERE rank <= {_TOPK}
ORDER BY q_id, rank
"""
    )


ORACLE_knn_ivf_kmeans = _ivf_kmeans_oracle()


# ------------------------------------------- incremental IVF maintenance --
#: the frozen-quantizer training prefix (embeddings is a fixed 500-row
#: table at every SF; the tail 100 vectors play the "new batch").
_IVF_BASE_N = 400


def knn_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance: the coarse quantizer is trained
    ONCE on the base corpus (vec_id < 400) and FROZEN; the new batch (the
    remaining vectors) only pays the one-pass nearest-centroid residency
    assignment — no Lloyd re-run, no index rebuild. Queries then search
    the full (base + new) index. The oracle composes the same Lloyd CTEs
    with training restricted to the base subset, so frozen-centroid
    residency of the new batch is bit-exact.

    At 100 TB this is the ingest path for a living ANN index: appending a
    batch costs one broadcast-argmin scan of the batch, never a re-train
    over the corpus."""
    emb, q = _query_vecs(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < _IVF_BASE_N)
    return S.ivf_kmeans_topk(emb, q, k=_TOPK, train=base).orderBy(
        "q_id", "rank"
    )


ORACLE_knn_ivf_incremental = _ivf_kmeans_oracle(f"vec_id < {_IVF_BASE_N}")


# ---------------------------------------------------- incremental dedup ---
_INCR_MOD = 5  # doc_id % 5 == 0 plays the "new batch"; the rest "existing"


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-existing-corpus near-dup detection (daily-ingest
    pattern): the new slice's LSH matches against the accumulated corpus,
    verified with exact Jaccard at the same 0.1 threshold as the batch
    dedup gate."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "is_new", F.col("doc_id") % _INCR_MOD == 0
    )
    return (
        D.minhash_candidates_incremental(docs)
        .filter(F.col("jaccard") >= 0.1)
        .orderBy("doc_new", "doc_old")
    )


def _incremental_oracle() -> str:
    # the same generated signature chain as _minhash_oracle, with the band
    # join split new-vs-existing instead of a < b
    body = _minhash_oracle()
    prefix, _, _ = body.partition("), cand AS (")
    return (
        prefix
        + f"""), cand AS (
    SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old
    FROM buckets a JOIN buckets b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id % {_INCR_MOD} = 0 AND b.doc_id % {_INCR_MOD} != 0
)
SELECT c.doc_new, c.doc_old,
       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / len(list_distinct(sa.sh || sb.sh)) AS jaccard
FROM cand c
JOIN t sa ON sa.doc_id = c.doc_new
JOIN t sb ON sb.doc_id = c.doc_old
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / len(list_distinct(sa.sh || sb.sh)) >= 0.1
ORDER BY doc_new, doc_old
"""
    )


ORACLE_dedup_incremental = _incremental_oracle()


# ---------------------------------------------------- integer PageRank --
def knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PageRank (2 rounds, ppb scale) over the symmetrized
    5-NN graph of the first 200 vectors — graph centrality for diversity
    sampling / hub detection, oracle-checked bit-exact because every step
    is truncating int64 arithmetic (see datapipe/similarity.pagerank_int).

    r17: runs the IN-ROW twin — the graph is pinned to ≤_GRAPH_VECS=200
    nodes, so the 2-round relational tower's driver fixed cost (~0.2 s of
    plan/broadcast per round) dwarfs the data work; pagerank_int_inrow is
    bit-identical (oracle-gated + randomized equivalence test) and the
    web-scale relational twin stays for unbounded graphs."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    edges = S.knn_edges(emb, k=_GRAPH_K)
    return S.pagerank_int_inrow(edges, iters=2).orderBy("node")


def _pagerank_oracle() -> str:
    from project_obsidian_core_spark.datapipe.similarity import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
    )

    base = PR_DAMP_DEN - PR_DAMP_NUM
    parts = [
        f"""t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings WHERE vec_id < {_GRAPH_VECS}
)""",
        f"""scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id != c.vec_id
)""",
        f"""ranked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
)""",
        f"""edges AS (
    SELECT DISTINCT least(q_id, cand_id) AS a, greatest(q_id, cand_id) AS b
    FROM ranked WHERE rank <= {_GRAPH_K}
)""",
        """dedges AS (
    SELECT a AS src, b AS dst FROM edges
    UNION ALL
    SELECT b AS src, a AS dst FROM edges
)""",
        """deg AS (SELECT src, count(*) AS deg FROM dedges GROUP BY src)""",
        """nodes AS (SELECT DISTINCT src AS node FROM dedges)""",
        """nn AS (SELECT count(*) AS n FROM nodes)""",
        f"""s0 AS (
    SELECT node, {PR_SCALE} // n AS score FROM nodes CROSS JOIN nn
)""",
    ]
    for i in (1, 2):
        parts.append(
            f"""c{i} AS (
    SELECT d.dst, CAST(sum(s.score // g.deg) AS BIGINT) AS contrib
    FROM dedges d
    JOIN s{i - 1} s ON s.node = d.src
    JOIN deg g ON g.src = d.src
    GROUP BY d.dst
)"""
        )
        parts.append(
            f"""s{i} AS (
    SELECT nodes.node,
           CAST(({base} * ({PR_SCALE} // n)
                 + {PR_DAMP_NUM} * coalesce(c.contrib, 0)) // {PR_DAMP_DEN} AS BIGINT)
               AS score
    FROM nodes CROSS JOIN nn LEFT JOIN c{i} c ON c.dst = nodes.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT node, CAST(score AS BIGINT) AS score FROM s2 ORDER BY node
"""
    )


ORACLE_knn_pagerank = _pagerank_oracle()


# ------------------------------------------------------- inverted index ----
def corpus_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list index build over documents (text.inverted_index):
    per term its doc_freq, total_tf, and first-20 doc_id postings — the
    retrieval-side primitive behind the tfidf ranking view.

    The library API (:func:`datapipe.text.inverted_index`) returns
    ``postings`` as ``array<bigint>``; the GATE query serializes it to a
    comma-joined string because the driver harness canonicalizes rows
    via pandas hashing, which cannot hash list cells (the r08 row
    errored with ``unhashable type: 'list'`` despite bit-exact values).
    """
    idx = T.inverted_index(load(spark, sf_dir, "documents"))
    return idx.select(
        "term",
        "doc_freq",
        "total_tf",
        F.array_join("postings", ",").alias("postings"),
    ).orderBy("term")


ORACLE_corpus_inverted_index = f"""
WITH pairs AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
    SELECT term, doc_id, count(*) AS tf FROM pairs WHERE term <> ''
    GROUP BY 1, 2
), stats AS (
    SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
           CAST(sum(tf) AS BIGINT) AS total_tf
    FROM tf GROUP BY 1
), capped AS (
    SELECT term, doc_id,
           row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
    FROM tf
), posts AS (
    SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
    FROM capped WHERE rn <= {T.POSTINGS_CAP} GROUP BY 1
)
SELECT stats.term, doc_freq, total_tf, postings
FROM stats JOIN posts USING (term)
ORDER BY stats.term
"""


# ------------------------------------------------ blocked entity match ----
from project_obsidian_core_spark.datapipe import linkage as LK  # noqa: E402

_ER_MAX_DIST = 2


def customer_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution (datapipe.linkage) over customer:
    block on (nation, market segment), verify with early-exit banded
    levenshtein ≤ 2 on the name — the dimension-table linkage step of a
    training-data join pipeline. Top-100 pairs by (dist, id_a, id_b)."""
    pairs = LK.blocked_match_pairs(
        load(spark, sf_dir, "customer"),
        id_col="c_custkey",
        text_col="c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
        max_dist=_ER_MAX_DIST,
    )
    return pairs.orderBy("dist", "id_a", "id_b").limit(100)


ORACLE_customer_entity_match = f"""
WITH c AS (
    SELECT c_nationkey, c_mktsegment, c_custkey, c_name FROM customer
)
SELECT a.c_nationkey, a.c_mktsegment,
       a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
FROM c a JOIN c b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {_ER_MAX_DIST}
ORDER BY dist, id_a, id_b
LIMIT 100
"""


# ------------------------------------------------------ triangle counting --
def knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered triangle enumeration
    (:func:`datapipe.similarity.triangle_list`) over the same symmetrized
    exact 5-NN graph as ``knn_graph_degree`` — the clustering-coefficient
    primitive for graph-based corpus diagnostics (dense triangle
    neighborhoods = redundant near-dup clusters worth thinning before
    training). The oracle closes triangles with the textbook a<b<c
    3-way self-join; the Spark plan instead orients edges by (degree, id)
    so wedge fan-out is bounded by O(√m) per node — same triangles,
    hub-safe at 100 TB."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    edges = S.knn_edges(emb, k=_GRAPH_K)
    return S.triangle_list(edges).orderBy("a", "b", "c")


def _triangles_oracle() -> str:
    # reuse the degree oracle's signature->edges CTE chain verbatim; only
    # the final consumer differs (3-way closure instead of the histogram)
    edges_ctes = ORACLE_knn_graph_degree.partition("), degrees AS")[0] + ")"
    return f"""{edges_ctes}
SELECT e1.a AS a, e1.b AS b, e2.b AS c
FROM edges e1
JOIN edges e2 ON e2.a = e1.b
JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
ORDER BY a, b, c
"""


ORACLE_knn_triangles = _triangles_oracle()


# ------------------------------------------------------ ANN recall eval ---
def knn_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N12: index-quality evaluation — recall@k of the multi-probe LSH
    index against the exact brute-force ground truth, per query. The
    "measure your ANN before trusting it" operator every index rollout
    needs: ground truth is computed on the SAME (bounded) query sample
    the production queries use (brute force over the eval slice is the
    documented cost — recall evaluation is a sampled audit, never a
    full-corpus pass), hits come from a left-semi-style indicator join
    on (q_id, cand_id), and recall is an exact ppm int.

    At 100 TB: the eval sample stays ~10³ queries (broadcast), ground
    truth is one broadcast-scored corpus scan per audit, and the report
    is the go/no-go gate for LSH bits / IVF nprobe retuning — the
    feedback loop for the N10 auto-sizing rule."""
    emb, q = _query_vecs(spark, sf_dir)
    truth = S.brute_force_topk(emb, q, k=_TOPK).select("q_id", "cand_id")
    found = S.lsh_topk(emb, q, k=_TOPK).select(
        "q_id", F.col("cand_id").alias("f_cand")
    )
    joined = truth.join(
        found,
        (truth.q_id == found.q_id) & (truth.cand_id == found.f_cand),
        "left",
    ).select(truth.q_id, truth.cand_id, found.f_cand)
    return (
        joined.groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("f_cand").alias("n_hits"),
        )
        .withColumn("recall_ppm", F.expr("n_hits * 1000000 div n_truth"))
        .orderBy("q_id")
    )


def _recall_oracle() -> str:
    flips = ", ".join(str(2 ** i) for i in range(S.LSH_BITS))
    return f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm,
           {S.sql_lsh_bucket('embedding', bits=S.LSH_BITS)} AS bucket
    FROM embeddings
), probes AS (
    SELECT vec_id, v, nrm, CAST(xor(bucket, f) AS BIGINT) AS bucket
    FROM t, (SELECT unnest([0, {flips}]) AS f)
    WHERE vec_id < {_N_QUERY_VECS}
), lscored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM probes q, t c
    WHERE q.vec_id != c.vec_id AND q.bucket = c.bucket
), lranked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM lscored
), lsh AS (
    SELECT q_id, cand_id FROM lranked WHERE rank <= {_TOPK}
), bscored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id < {_N_QUERY_VECS} AND q.vec_id != c.vec_id
), branked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM bscored
), truth AS (
    SELECT q_id, cand_id FROM branked WHERE rank <= {_TOPK}
)
SELECT tr.q_id,
       count(*) AS n_truth,
       CAST(count(l.cand_id) AS BIGINT) AS n_hits,
       count(l.cand_id) * 1000000 // count(*) AS recall_ppm
FROM truth tr
LEFT JOIN lsh l ON l.q_id = tr.q_id AND l.cand_id = tr.cand_id
GROUP BY tr.q_id
ORDER BY tr.q_id
"""


ORACLE_knn_recall_report = _recall_oracle()


# -------------------------------------------------- dedup recall audit ----
#: audit sample bound: the all-pairs truth join is quadratic BY DESIGN,
#: so the gate caps its input to the first 1000 doc_ids at every SF
#: (sf0.01 = the whole corpus; sf0.1 = a 1000-doc slice of 5000) — the
#: "sampled audit" contract from the operator docstring made literal.
_RECALL_SAMPLE = 1000


def dedup_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15: MinHash-LSH recall audit (:func:`datapipe.dedup.lsh_recall`)
    — exact all-pairs Jaccard ground truth on the bounded eval sample
    (doc_id < 1000) vs the banded candidate pairs; one exact-int row
    (n_truth, n_found, n_missed, recall_ppm). The measured counterpart
    of the band/row S-curve the LSH geometry was chosen from."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _RECALL_SAMPLE
    )
    return D.lsh_recall(docs)


def _dedup_recall_oracle() -> str:
    body = _minhash_oracle().replace(
        "AS toks FROM documents)",
        f"AS toks FROM documents WHERE doc_id < {_RECALL_SAMPLE})",
    )
    prefix, _, _ = body.partition("\nSELECT c.doc_a")
    return f"""{prefix}
, found AS (
    SELECT c.doc_a, c.doc_b
    FROM cand c
    JOIN t sa ON sa.doc_id = c.doc_a
    JOIN t sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(sa.sh || sb.sh)) >= 0.1
), truth AS (
    SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b
    FROM t sa JOIN t sb ON sa.doc_id < sb.doc_id
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(sa.sh || sb.sh)) >= 0.1
)
SELECT count(*) AS n_truth,
       CAST(count(f.doc_a) AS BIGINT) AS n_found,
       CAST(count(*) - count(f.doc_a) AS BIGINT) AS n_missed,
       count(f.doc_a) * 1000000 // count(*) AS recall_ppm
FROM truth tr
LEFT JOIN found f ON f.doc_a = tr.doc_a AND f.doc_b = tr.doc_b
"""


ORACLE_dedup_recall_report = _dedup_recall_oracle()


# ------------------------------------- prefix-filter exact join (D16) --
#: ppm Jaccard threshold for the prefix-filter exact join gate.
PREFIX_T_PPM = 600_000


def dedup_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY pair with word-3-shingle Jaccard >= 0.6, found by the
    prefix-filter exact join (SSJoin/PPJoin) — provably complete, no
    blocking column, no LSH recall loss.  The full qualifying set is
    returned (not a top-N): completeness IS the claim, and the oracle
    computes the identical prefix-filtered join, while the brute-force
    all-pairs equality is pinned by a unit property test."""
    return D.prefix_filter_pairs(
        load(spark, sf_dir, "documents"), threshold_ppm=PREFIX_T_PPM
    ).select(
        "doc_a",
        "doc_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "j_ppm",
    ).orderBy("doc_a", "doc_b")


def _prefix_pairs_oracle() -> str:
    w1, t = D.SHINGLE_W - 1, PREFIX_T_PPM
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
sh AS (
    SELECT doc_id, list_distinct([array_to_string(tk[i:i+{w1}], ' ')
        for i in generate_series(1, greatest(len(tk) - {w1}, 1))]) AS s
    FROM toks
), ex AS (SELECT doc_id, unnest(s) AS tok FROM sh),
freq AS (SELECT tok, count(*) AS df FROM ex GROUP BY tok),
ord AS (
    SELECT e.doc_id, list(e.tok ORDER BY f.df, e.tok) AS osh
    FROM ex e JOIN freq f ON e.tok = f.tok GROUP BY e.doc_id
), pre AS (
    SELECT doc_id, len(osh) AS n,
           osh[1 : len(osh) - ({t} * len(osh) + 999999) // 1000000 + 1] AS pfx
    FROM ord
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM (SELECT doc_id, n, unnest(pfx) AS tok FROM pre) a
    JOIN (SELECT doc_id, n, unnest(pfx) AS tok FROM pre) b
      ON a.tok = b.tok AND a.doc_id < b.doc_id
     AND {t} * greatest(a.n, b.n) <= 1000000 * least(a.n, b.n)
)
SELECT doc_a, doc_b, len(x.s) AS n_a, len(y.s) AS n_b,
       1000000 * len(list_intersect(x.s, y.s))
           // (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS j_ppm
FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
WHERE 1000000 * len(list_intersect(x.s, y.s))
          // (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= {t}
ORDER BY doc_a, doc_b
"""


ORACLE_dedup_prefix_pairs = _prefix_pairs_oracle()


# ------------------------------- N13: random-projection recall audit --
def knn_rp_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N13: recall@k of brute-force search in the 16-dim JL sign-projected
    space against full-64-dim exact truth — the measurement behind "how
    much does the cheap reduced-space pre-filter lose on THIS corpus"
    (the companion audit to N12's LSH recall, same indicator-join shape).

    At 100 TB the projection is a one-off codegen scan (d_in·d_out FMAs
    per row) and the reduced vectors are what the ANN index ingests;
    re-ranking the reduced top-k' in full space recovers recall — this
    report sizes how much head-room (k' vs k) that re-rank needs."""
    emb, q = _query_vecs(spark, sf_dir)
    signs = S.rp_signs(_EMB_DIM, S.RP_DIM_OUT)

    def prj(df):
        return df.select(
            "vec_id", S.rp_project(F.col("embedding"), signs).alias("embedding")
        )

    truth = S.brute_force_topk(emb, q, k=_TOPK).select("q_id", "cand_id")
    red = S.brute_force_topk(prj(emb), prj(q), k=_TOPK).select(
        "q_id", F.col("cand_id").alias("f_cand")
    )
    joined = truth.join(
        red,
        (truth.q_id == red.q_id) & (truth.cand_id == red.f_cand),
        "left",
    ).select(truth.q_id, truth.cand_id, red.f_cand)
    return (
        joined.groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("f_cand").alias("n_hits"),
        )
        .withColumn("recall_ppm", F.expr("n_hits * 1000000 div n_truth"))
        .orderBy("q_id")
    )


def _rp_recall_oracle() -> str:
    signs = S.rp_signs(_EMB_DIM, S.RP_DIM_OUT)
    rp = S.sql_rp_project("embedding", signs, _EMB_DIM)
    return f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm,
           {rp} AS rv
    FROM embeddings
), rt AS (
    SELECT vec_id, rv, {V.sql_norm('rv', S.RP_DIM_OUT)} AS rnrm FROM t
), truth AS (
    SELECT q_id, cand_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) DESC,
                            c.vec_id) AS rk
        FROM t q, t c
        WHERE q.vec_id < {_N_QUERY_VECS} AND q.vec_id != c.vec_id
    ) WHERE rk <= {_TOPK}
), red AS (
    SELECT q_id, cand_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY {V.sql_dot('q.rv', 'c.rv', S.RP_DIM_OUT)} / (q.rnrm * c.rnrm) DESC,
                            c.vec_id) AS rk
        FROM rt q, rt c
        WHERE q.vec_id < {_N_QUERY_VECS} AND q.vec_id != c.vec_id
    ) WHERE rk <= {_TOPK}
)
SELECT tr.q_id, count(*) AS n_truth,
       CAST(count(r.cand_id) AS BIGINT) AS n_hits,
       count(r.cand_id) * 1000000 // count(*) AS recall_ppm
FROM truth tr
LEFT JOIN red r ON r.q_id = tr.q_id AND r.cand_id = tr.cand_id
GROUP BY tr.q_id
ORDER BY tr.q_id
"""


ORACLE_knn_rp_recall = _rp_recall_oracle()


# ----------------------------------- G4: label-propagation communities --
_LPA_ROUNDS = 3


def knn_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: deterministic synchronous label propagation (3 rounds, ties to
    the smallest label) over the symmetrized 5-NN graph of the first 200
    vectors — community detection for corpus diversity analysis and
    cluster-aware sampling; the iterative sibling of dedup's connected
    components (CC finds *reachability*, LPA finds *density* groups).

    r17: runs the IN-ROW twin (see knn_pagerank) — identical labels,
    none of the 3 relational rounds' per-round driver fixed cost."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    edges = S.knn_edges(emb, k=_GRAPH_K)
    return S.label_propagation_inrow(edges, rounds=_LPA_ROUNDS).orderBy("node")


def _lpa_oracle() -> str:
    head = f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings WHERE vec_id < {_GRAPH_VECS}
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c WHERE q.vec_id != c.vec_id
), ranked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
), edges AS (
    SELECT DISTINCT least(q_id, cand_id) AS a, greatest(q_id, cand_id) AS b
    FROM ranked WHERE rank <= {_GRAPH_K}
), dedges AS (
    SELECT a AS src, b AS dst FROM edges
    UNION ALL
    SELECT b AS src, a AS dst FROM edges
), l0 AS (
    SELECT DISTINCT src AS node, src AS lbl FROM dedges
)"""
    rounds = []
    for r in range(1, _LPA_ROUNDS + 1):
        prev = "l0" if r == 1 else f"l{r - 1}"
        rounds.append(
            f""", l{r} AS (
    SELECT node, lbl FROM (
        SELECT d.src AS node, p.lbl,
               row_number() OVER (PARTITION BY d.src
                                  ORDER BY count(*) DESC, p.lbl ASC) AS rn
        FROM dedges d JOIN {prev} p ON d.dst = p.node
        GROUP BY d.src, p.lbl
    ) WHERE rn = 1
)"""
        )
    return (
        head
        + "".join(rounds)
        + f"\nSELECT node, lbl FROM l{_LPA_ROUNDS} ORDER BY node\n"
    )


ORACLE_knn_communities = _lpa_oracle()


# --------------------------- D17: exact-complete near-dup clusters --
def dedup_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D17: PROVABLY COMPLETE near-dup clusters — the D16 prefix-filter
    exact join supplies every pair >= t (no LSH recall loss), and the
    min-label connected components fold (D6) closes them transitively.
    End to end, the claim most dedup pipelines can't make: no qualifying
    pair was missed, so no cluster was split.  The capstone composition
    for exactness-critical dedup (license dedup, benchmark contamination
    families)."""
    pairs = D.prefix_filter_pairs(
        load(spark, sf_dir, "documents"), threshold_ppm=PREFIX_T_PPM
    ).select("doc_a", "doc_b")
    return D.connected_components(pairs).orderBy("doc_id")


def _prefix_clusters_oracle() -> str:
    body = ORACLE_dedup_prefix_pairs
    prefix, _, _ = body.partition("\nSELECT doc_a, doc_b, len(x.s)")
    prefix = prefix.replace("WITH toks AS", "WITH RECURSIVE toks AS", 1)
    t = PREFIX_T_PPM
    return f"""{prefix},
ver AS (
    SELECT doc_a, doc_b
    FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
    WHERE 1000000 * len(list_intersect(x.s, y.s))
              // (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= {t}
), edges AS (
    SELECT doc_a AS a, doc_b AS b FROM ver
    UNION SELECT doc_b, doc_a FROM ver
), cc(node, label) AS (
    SELECT DISTINCT a AS node, a AS label FROM edges
    UNION
    SELECT e.a AS node, cc.label
    FROM cc JOIN edges e ON cc.node = e.b
    WHERE cc.label < e.a
)
SELECT node AS doc_id, min(label) AS cluster
FROM cc GROUP BY node
ORDER BY doc_id
"""


ORACLE_dedup_prefix_clusters = _prefix_clusters_oracle()


# ---------------------------------------------- X20: collocation lift ----
_PMI_MIN_COUNT = 5


def corpus_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X20: top collocations by exact integer lift
    (:func:`datapipe.text.bigram_lift`) — PMI's monotone core with no
    logarithm, so the ranking hashes bit-exact.  Top-100 by
    (lift desc, w1, w2)."""
    return (
        T.bigram_lift(
            load(spark, sf_dir, "documents"), min_count=_PMI_MIN_COUNT
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(100)
    )


ORACLE_corpus_bigram_pmi = f"""
WITH d AS (
    SELECT list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents
), pairs AS (
    SELECT unnest([toks[i] || ' ' || toks[i+1]
                   for i in generate_series(1, len(toks) - 1)]) AS b
    FROM d WHERE len(toks) >= 2
), big AS (
    SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
           CAST(count(*) AS BIGINT) AS n_bigram
    FROM pairs GROUP BY 1, 2
    HAVING count(*) >= {_PMI_MIN_COUNT}
), uni AS (
    SELECT w, CAST(count(*) AS BIGINT) AS n_w
    FROM (SELECT unnest(toks) AS w FROM d) GROUP BY 1
), tot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_tokens FROM uni)
SELECT big.w1, big.w2, n_bigram,
       u1.n_w AS n_w1, u2.n_w AS n_w2,
       n_bigram * n_tokens * 1000000 // (u1.n_w * u2.n_w) AS lift_ppm
FROM big
JOIN uni u1 ON big.w1 = u1.w
JOIN uni u2 ON big.w2 = u2.w
CROSS JOIN tot
ORDER BY lift_ppm DESC, big.w1, big.w2
LIMIT 100
"""


# ---------------------------------------------- D18/D19: duplicated spans
from project_obsidian_core_spark.datapipe import spans as SP  # noqa: E402

#: gate window length — the synthetic docs run ~100 tokens, so k=8 plays
#: the role Lee et al.'s k=50 plays on web pages (SP.SPAN_K stays 50).
_SPAN_GATE_K = 8


def corpus_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D18: verbatim k-token spans repeated across >= 2 distinct docs —
    the distributed stand-in for suffix-array substring dedup (window
    text kept for the report; TakeOrdered caps the output)."""
    return (
        SP.dup_spans(load(spark, sf_dir, "documents"), k=_SPAN_GATE_K)
        .orderBy(F.desc("n_occ"), F.desc("n_docs"), "gram")
        .limit(200)
    )


ORACLE_corpus_dup_spans = f"""
WITH d AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), w AS (
    SELECT doc_id,
           unnest([array_to_string(toks[i:i+{_SPAN_GATE_K - 1}], ' ')
                   for i in generate_series(1, len(toks) - {_SPAN_GATE_K - 1})]) AS gram
    FROM d WHERE len(toks) >= {_SPAN_GATE_K}
)
SELECT gram,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM w
GROUP BY gram
HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_occ DESC, n_docs DESC, gram
LIMIT 200
"""


def corpus_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19: per-doc duplicated-span coverage (exact ppm) over hashed
    windows — the shuffle carries int64 window hashes, never text."""
    return SP.dup_span_coverage(
        load(spark, sf_dir, "documents"), k=_SPAN_GATE_K
    ).orderBy("doc_id")


ORACLE_corpus_dup_span_coverage = f"""
WITH d AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), w AS (
    SELECT doc_id,
           unnest([CAST('0x' || substr(md5(array_to_string(toks[i:i+{_SPAN_GATE_K - 1}], ' ')), 1, 15) AS BIGINT)
                   for i in generate_series(1, len(toks) - {_SPAN_GATE_K - 1})]) AS gh
    FROM d WHERE len(toks) >= {_SPAN_GATE_K}
), dup AS (
    SELECT gh FROM w GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(dup.gh) AS BIGINT) AS n_dup_windows,
       (count(dup.gh) * 1000000) // count(*) AS dup_ppm
FROM w LEFT JOIN dup ON w.gh = dup.gh
GROUP BY w.doc_id
ORDER BY w.doc_id
"""


# ------------------------------------------- Q18: DSIR importance weights
from project_obsidian_core_spark.datapipe import dsir as DS  # noqa: E402


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: DSIR-style hashed-ngram importance scores, target = lang
    'en' (exact-int lift-ppm rank proxy; see datapipe/dsir.py)."""
    return DS.dsir_importance(
        load(spark, sf_dir, "documents"), F.col("lang") == "en"
    ).orderBy("doc_id")


ORACLE_corpus_dsir_weights = f"""
WITH d AS (
    SELECT doc_id, CAST(lang = 'en' AS INT) AS is_tgt,
           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), f AS (
    SELECT doc_id, is_tgt,
           CAST('0x' || substr(md5(feat), 1, 15) AS BIGINT) % {DS.DSIR_BUCKETS} AS b
    FROM (
        SELECT doc_id, is_tgt,
               unnest(list_concat(toks,
                   [toks[i] || ' ' || toks[i+1]
                    for i in generate_series(1, len(toks) - 1)])) AS feat
        FROM d)
), doc_feat AS (
    SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n_f FROM f GROUP BY 1, 2
), bucket AS (
    SELECT b, CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(is_tgt) AS BIGINT) AS n_tgt
    FROM f GROUP BY 1
), tot AS (
    SELECT CAST(sum(n_raw) AS BIGINT) AS R, CAST(sum(n_tgt) AS BIGINT) AS T
    FROM bucket
), scored AS (
    SELECT b, CAST((n_tgt + 1) * ((R + {DS.DSIR_BUCKETS}) * 1000000
                   // (T + {DS.DSIR_BUCKETS})) // (n_raw + 1) AS BIGINT) AS lift_ppm
    FROM bucket CROSS JOIN tot
)
SELECT doc_feat.doc_id,
       CAST(sum(n_f) AS BIGINT) AS n_features,
       CAST(sum(n_f * lift_ppm) // sum(n_f) AS BIGINT) AS importance_ppm
FROM doc_feat JOIN scored USING (b)
GROUP BY 1
ORDER BY doc_feat.doc_id
"""


def corpus_excise_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20: substring-dedup rewrite — duplicated k-token spans removed
    from every doc except the canonical (smallest doc_id, start_pos)
    occurrence; emits the cleaned text + removal accounting."""
    return SP.excise_dup_spans(
        load(spark, sf_dir, "documents"), k=_SPAN_GATE_K
    ).orderBy("doc_id")


ORACLE_corpus_excise_spans = f"""
WITH d AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), w AS (
    SELECT doc_id, i AS start_pos,
           array_to_string(toks[i:i+{_SPAN_GATE_K - 1}], ' ') AS gram
    FROM d, UNNEST(generate_series(1, len(toks) - {_SPAN_GATE_K - 1})) AS t(i)
    WHERE len(toks) >= {_SPAN_GATE_K}
), dup AS (
    SELECT gram FROM w GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), occ AS (
    SELECT w.doc_id, w.start_pos,
           row_number() OVER (PARTITION BY w.gram
                              ORDER BY w.doc_id, w.start_pos) AS occ_rank
    FROM w JOIN dup USING (gram)
), sel AS (
    SELECT doc_id, list(start_pos) AS starts
    FROM occ WHERE occ_rank > 1 GROUP BY doc_id
), rebuilt AS (
    SELECT d.doc_id, d.toks,
           list_transform(
               list_filter(generate_series(1, len(d.toks)),
                   i -> len(list_filter(coalesce(sel.starts, CAST([] AS BIGINT[])),
                            s -> i >= s AND i < s + {_SPAN_GATE_K})) = 0),
               i -> d.toks[i]) AS kept
    FROM d LEFT JOIN sel USING (doc_id)
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(toks) - len(kept) AS INT) AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS clean_text
FROM rebuilt
ORDER BY doc_id
"""


def corpus_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D21: span-level benchmark decontamination (benchmark = the X6
    held-out slice doc_id % 25 == 0; corpus = the rest); reports which
    windows hit and where, not just whether the doc is contaminated."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 25 == 0)
    corpus = docs.where(F.col("doc_id") % 25 != 0)
    return SP.span_decontaminate(corpus, bench, k=_SPAN_GATE_K).orderBy("doc_id")


ORACLE_corpus_decontaminate_spans = f"""
WITH d AS (
    SELECT doc_id,
           string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
    FROM documents
), w AS (
    SELECT doc_id, i AS start_pos,
           CAST('0x' || substr(md5(array_to_string(toks[i:i+{_SPAN_GATE_K - 1}], ' ')), 1, 15)
                AS BIGINT) AS gh
    FROM d, UNNEST(generate_series(1, len(toks) - {_SPAN_GATE_K - 1})) AS t(i)
    WHERE len(toks) >= {_SPAN_GATE_K}
), bw AS (
    SELECT DISTINCT gh, doc_id AS bench_id FROM w WHERE doc_id % 25 = 0
), cw AS (
    SELECT * FROM w WHERE doc_id % 25 <> 0
), hits AS (
    SELECT cw.doc_id, cw.start_pos, bw.bench_id
    FROM cw LEFT JOIN bw USING (gh)
)
SELECT doc_id,
       CAST(count(DISTINCT start_pos) AS BIGINT) AS n_windows,
       CAST(count(DISTINCT CASE WHEN bench_id IS NOT NULL THEN start_pos END)
            AS BIGINT) AS n_contaminated,
       min(CASE WHEN bench_id IS NOT NULL THEN start_pos END) AS first_hit_pos,
       CAST(count(DISTINCT bench_id) AS BIGINT) AS n_bench_docs
FROM hits
GROUP BY doc_id
ORDER BY doc_id
"""


def knn_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: per-node clustering coefficient over the same symmetrized
    5-NN graph as G1/G2 — coeff = 2·T(v) / (deg(v)·(deg(v)−1)) in exact
    ppm (0 for deg < 2). The "how clique-like is this node's
    neighborhood" score that separates redundant near-dup pockets
    (coeff → 1) from hub spokes (coeff → 0); composes G2's
    degree-ordered triangles (hub-safe wedge bound) with G1's degree
    relation — two exchanges beyond the triangle pass, both int-keyed."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    edges = S.knn_edges(emb, k=_GRAPH_K)
    tri = S.triangle_list(edges)
    tcnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.join(tcnt, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.expr(
                "CASE WHEN degree >= 2 THEN"
                " (2 * coalesce(n_triangles, 0L) * 1000000L)"
                " DIV (degree * (degree - 1)) ELSE 0 END"
            ).alias("coeff_ppm"),
        )
        .orderBy("node")
    )


def _clustering_coeff_oracle() -> str:
    edges_ctes = ORACLE_knn_graph_degree.partition("), degrees AS")[0] + ")"
    return f"""{edges_ctes},
tri AS (
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
), tcnt AS (
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY node
), deg AS (
    SELECT node, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
    GROUP BY node
)
SELECT deg.node, deg.degree,
       coalesce(tcnt.n_triangles, 0) AS n_triangles,
       CASE WHEN deg.degree >= 2 THEN
            (2 * coalesce(tcnt.n_triangles, 0) * 1000000)
            // (deg.degree * (deg.degree - 1)) ELSE 0 END AS coeff_ppm
FROM deg LEFT JOIN tcnt USING (node)
ORDER BY deg.node
"""


ORACLE_knn_clustering_coeff = _clustering_coeff_oracle()


# ------------------------------------- G5: k-core over the near-dup graph --
def dedup_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 gate: 2-core of the verified near-dup pair graph (jaccard ≥ 0.1)
    — the docs whose near-dup support survives MUTUALLY, i.e. the
    template/boilerplate families, vs the pendant one-off pairs the peel
    strips. The near-dup graph is the right coreness substrate here: the
    uniform-random kNN graph has min-degree ≥ k by construction, so its
    k-core is all-or-nothing (probed r10), while the pair graph has
    pendant chains the peel genuinely cascades through (fixpoint in 2
    rounds at sf0.01 AND sf0.1)."""
    pairs = (
        D.minhash_candidates(load(spark, sf_dir, "documents"))
        .filter(F.col("jaccard") >= 0.1)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    return S.kcore(pairs, k=2).orderBy("node")


def _kcore_oracle(k: int = 2, rounds: int = 4) -> str:
    """Unrolled fixed-round peel: degree CTE + semi-join CTE per round
    (the knn_pagerank/knn_communities unrolling trick). The peel is
    IDEMPOTENT past its fixpoint, so unrolling 4 rounds where the gate
    corpora converge in 2 leaves slack without changing the result —
    the data-dependent early-exit in :func:`datapipe.similarity.kcore`
    and this fixed unroll meet at the same fixpoint."""
    body = _minhash_oracle()
    prefix, _, _ = body.partition("\nSELECT c.doc_a")
    parts = [
        f"""{prefix},
pairs AS (
    SELECT c.doc_a AS a, c.doc_b AS b
    FROM cand c
    JOIN t sa ON sa.doc_id = c.doc_a
    JOIN t sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(sa.sh || sb.sh)) >= 0.1
), live0 AS (
    SELECT a AS src, b AS dst FROM pairs
    UNION
    SELECT b AS src, a AS dst FROM pairs
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
deg{i} AS (SELECT src, count(*) AS c FROM live{i - 1} GROUP BY src),
keep{i} AS (SELECT src FROM deg{i} WHERE c >= {k}),
live{i} AS (
    SELECT l.src, l.dst FROM live{i - 1} l
    JOIN keep{i} ka ON l.src = ka.src
    JOIN keep{i} kb ON l.dst = kb.src
)"""
        )
    parts.append(
        f"""
SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree
FROM live{rounds} GROUP BY src ORDER BY node
"""
    )
    return "".join(parts)


ORACLE_dedup_kcore = _kcore_oracle()


# ---------------------------------------- N14: MMR diversified top-k ----
def knn_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N14: MMR re-ranking of each query's exact top-20 pool into 5
    diversity-aware picks (λ=0.7) — nearest examples without k copies
    of the same near-dup cluster."""
    emb, q = _query_vecs(spark, sf_dir)
    return S.mmr_topk(emb, q, k=5, pool=20).orderBy("q_id", "sel_rank")


def _mmr_oracle(k: int = 5, pool: int = 20, lam: int = S.MMR_LAMBDA_PPM) -> str:
    """Unrolled greedy-MMR oracle: one (pen_i, sel_i, selall_i) CTE trio
    per round — the same stage-unrolling move as the funnel oracles."""
    rounds = []
    for i in range(2, k + 1):
        rounds.append(f""",
pen{i} AS (
    SELECT p.q_id, p.a AS cand_id, max(p.sim) AS penalty
    FROM pairs p JOIN selall{i - 1} s ON p.q_id = s.q_id AND p.b = s.cand_id
    GROUP BY 1, 2
), sel{i} AS (
    SELECT q_id, cand_id, cos_sim, {i} AS sel_rank FROM (
        SELECT pool.q_id, pool.cand_id, pool.cos_sim,
               row_number() OVER (PARTITION BY pool.q_id
                   ORDER BY ({lam} * pool.cos_sim
                             - {1_000_000 - lam} * pen{i}.penalty) DESC,
                            pool.cand_id ASC) AS rn
        FROM pool JOIN pen{i} USING (q_id, cand_id)
        WHERE NOT EXISTS (SELECT 1 FROM selall{i - 1} s
                          WHERE s.q_id = pool.q_id
                            AND s.cand_id = pool.cand_id)
    ) WHERE rn = 1
), selall{i} AS MATERIALIZED (SELECT * FROM selall{i - 1} UNION ALL SELECT * FROM sel{i})""")
    return f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id < {_N_QUERY_VECS} AND q.vec_id != c.vec_id
), pool AS MATERIALIZED (
    SELECT q_id, cand_id, cos_sim FROM (
        SELECT q_id, cand_id, cos_sim,
               row_number() OVER (PARTITION BY q_id
                   ORDER BY cos_sim DESC, cand_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {pool}
), pv AS (
    SELECT pool.q_id, pool.cand_id, t.v, t.nrm
    FROM pool JOIN t ON pool.cand_id = t.vec_id
), pairs AS MATERIALIZED (
    SELECT x.q_id, x.cand_id AS a, y.cand_id AS b,
           {V.sql_dot('x.v', 'y.v', _EMB_DIM)} / (x.nrm * y.nrm) AS sim
    FROM pv x JOIN pv y ON x.q_id = y.q_id AND x.cand_id != y.cand_id
), sel1 AS (
    SELECT q_id, cand_id, cos_sim, 1 AS sel_rank FROM (
        SELECT q_id, cand_id, cos_sim,
               row_number() OVER (PARTITION BY q_id
                   ORDER BY cos_sim DESC, cand_id ASC) AS rn
        FROM pool
    ) WHERE rn = 1
), selall1 AS MATERIALIZED (SELECT * FROM sel1){''.join(rounds)}
SELECT q_id, cand_id, cos_sim, sel_rank FROM selall{k}
ORDER BY q_id, sel_rank
"""


ORACLE_knn_mmr = _mmr_oracle()


# -------------------------------- G7: shared-nearest-neighbor strength ----
def knn_snn_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: shared-nearest-neighbor edge strength over the G1 kNN graph —
    for every undirected edge (a,b), how many OTHER nodes are neighbors
    of both, plus the neighborhood Jaccard in exact ppm.  The SNN
    re-weighting (Jarvis-Patrick / SNN-DBSCAN) that turns a raw
    distance graph into a density-robust one: edges inside a tight
    cluster share most of their neighborhoods, hub spokes share none —
    the EDGE-level lens completing G6's node-level coefficient.

    Plan: two int-keyed hash joins count wedges through each edge
    (edge ⋈ adjacency on a's side, ⋈ again on b's side, equi-keyed on
    the common neighbor) then degrees attach broadcast — wedge-bounded
    like G2, never corpus-quadratic; every relation after the kNN pass
    is ≤ k·|V| rows."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    edges = S.knn_edges(emb, k=_GRAPH_K)
    return S.snn_strength(edges).orderBy("a", "b")


def _snn_oracle() -> str:
    edges_ctes = ORACLE_knn_graph_degree.partition("), degrees AS")[0] + ")"
    return f"""{edges_ctes},
adj AS (
    SELECT a AS src, b AS dst FROM edges
    UNION ALL
    SELECT b AS src, a AS dst FROM edges
), deg AS (
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM adj GROUP BY 1
), wedges AS (
    SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS n_shared
    FROM edges e
    JOIN adj x ON x.src = e.a
    JOIN adj y ON y.src = e.b AND y.dst = x.dst
    GROUP BY e.a, e.b
)
SELECT e.a, e.b,
       coalesce(w.n_shared, 0) AS n_shared,
       da.degree AS deg_a,
       db.degree AS deg_b,
       coalesce(w.n_shared, 0) * 1000000
           // (da.degree + db.degree - coalesce(w.n_shared, 0))
           AS snn_jaccard_ppm
FROM edges e
LEFT JOIN wedges w ON w.a = e.a AND w.b = e.b
JOIN deg da ON da.node = e.a
JOIN deg db ON db.node = e.b
ORDER BY e.a, e.b
"""


ORACLE_knn_snn_strength = _snn_oracle()


# ----------------------------- N15: per-dimension embedding distribution --
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N15: per-dimension distribution profile of the embedding table —
    count / mean / min / max per coordinate in exact micro-units.  The
    embedding-drift data-quality check run before trusting ANN indexes
    or cosine thresholds: a dimension whose range collapses (dead unit)
    or explodes (scale drift after a model swap) silently corrupts
    every downstream distance; this is the profiling pass that catches
    it, the N-family sibling of `orders_profile`.

    Determinism: float sums across rows are order-dependent, so each
    coordinate is quantized to int64 micro-units FIRST (float→double is
    exact, ×10⁶ then floor are single IEEE ops per value) and every
    aggregate is an exact integer; the mean is integer-div micro-units.
    Plan: one posexplode (map-side, 64 rows/vector) into a 64-group
    hash aggregate — partial-combined, one exchange of 64×cores rows."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode("embedding").alias("dim", "v")
    ).select(
        "dim",
        F.floor(F.col("v").cast("double") * F.lit(1_000_000.0)).cast("long").alias("q"),
    )
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("sum_micro"),
            F.min("q").alias("min_micro"),
            F.max("q").alias("max_micro"),
        )
        .select(
            "dim",
            "n",
            "sum_micro",
            F.expr("sum_micro div n").alias("mean_micro"),
            "min_micro",
            "max_micro",
        )
        .orderBy("dim")
    )


ORACLE_embedding_dim_stats = """
WITH ex AS (
    -- no WITH ORDINALITY in DuckDB 1.0.0: index via generate_series
    SELECT g.i - 1 AS dim,
           CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) AS q
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS g(i)
)
SELECT dim,
       count(*) AS n,
       CAST(sum(q) AS BIGINT) AS sum_micro,
       CAST(sum(q) AS BIGINT) // count(*) AS mean_micro,
       min(q) AS min_micro,
       max(q) AS max_micro
FROM ex
GROUP BY dim
ORDER BY dim
"""


# ------------------------------ N16: reciprocal-rank fusion (hybrid ANN) --
#: RRF smoothing constant (Cormack et al.'s k=60, the standard default)
RRF_K = 60


def knn_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N16: reciprocal-rank fusion of the two production ANN indexes —
    LSH multi-probe and IVF candidates merged by
    score = Σ 10⁶ div (60 + rank), the standard hybrid-retrieval
    combiner (Cormack-Clarke-Buettcher RRF).  Two indexes with
    UNCORRELATED failure modes (hash-plane geometry vs quantizer cells)
    fused rank-wise recover neighbors either one misses alone — the
    retrieval-side answer to the N12 recall audits.

    Exactness: RRF is usually Σ 1/(k+rank) floats; integer-scaled
    reciprocals (10⁶ div (k+rank)) keep the fused ORDER identical (the
    map is strictly monotone in rank over the relevant range) and make
    the score hashable cross-engine — the same no-float-fold rule as
    every ppm operator.  Ties break by cand_id.  Plan: both ranker
    outputs are |q|·k relations; the fuse is one full outer join +
    one window over |q|·2k rows — free next to the index probes.
    """
    emb, q = _query_vecs(spark, sf_dir)
    a = S.lsh_topk(emb, q, k=_TOPK).select(
        "q_id", "cand_id", F.col("rank").alias("rank_lsh")
    )
    b = S.ivf_topk(emb, q, k=_TOPK).select(
        "q_id", "cand_id", F.col("rank").alias("rank_ivf")
    )
    from pyspark.sql import Window

    merged = a.join(b, ["q_id", "cand_id"], "full").select(
        "q_id",
        "cand_id",
        "rank_lsh",
        "rank_ivf",
        F.expr(
            f"cast(coalesce(1000000 div ({RRF_K} + rank_lsh), 0)"
            f" + coalesce(1000000 div ({RRF_K} + rank_ivf), 0) as bigint)"
        ).alias("rrf_score"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("rrf_score"), F.asc("cand_id")
    )
    return (
        merged.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= _TOPK)
        .orderBy("q_id", "fused_rank")
    )


def _rrf_oracle() -> str:
    lsh = ORACLE_knn_lsh.replace("ORDER BY q_id, rank", "")
    ivf = ORACLE_knn_ivf.replace("ORDER BY q_id, rank", "")
    return f"""
WITH lsh AS ({lsh}), ivf AS ({ivf}),
merged AS (
    SELECT coalesce(l.q_id, i.q_id) AS q_id,
           coalesce(l.cand_id, i.cand_id) AS cand_id,
           l.rank AS rank_lsh, i.rank AS rank_ivf,
           CAST(coalesce(1000000 // ({RRF_K} + l.rank), 0)
                + coalesce(1000000 // ({RRF_K} + i.rank), 0) AS BIGINT)
               AS rrf_score
    FROM lsh l
    FULL JOIN ivf i ON l.q_id = i.q_id AND l.cand_id = i.cand_id
)
SELECT q_id, cand_id, rank_lsh, rank_ivf, rrf_score, fused_rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY rrf_score DESC, cand_id ASC) AS fused_rank
    FROM merged
)
WHERE fused_rank <= {_TOPK}
ORDER BY q_id, fused_rank
"""


ORACLE_knn_rrf_fusion = _rrf_oracle()


# ----------------------- N17: exact embedding cross-moment (Gram) matrix --
def embedding_crossmoments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N17: the exact integer cross-moment matrix of the embedding table
    — Σ qᵢ·qⱼ over all vectors for every dimension pair i ≤ j, in
    micro²-units.  This IS the covariance/whitening/PCA input (subtract
    the N15 means, divide by n): computing it EXACTLY in one pass is
    what lets a 64×64 eigen-solve run driver-side as bounded
    control-plane math while the 100 TB scan stays distributed — and
    the drift-detection twin of N15 (a rotating covariance eigenbasis
    flags representation drift per-dimension stats cannot see).

    Determinism/overflow: values quantize to int64 micro-units first
    (N15 rule); |q| ≤ ~10⁶ ⇒ |qᵢqⱼ| ≤ 10¹², safe to ~9·10⁶ rows per
    partial and Σ over the corpus bounded by n·10¹² — document the
    rescale (coarser quantization) past 9M rows (the A42 lesson:
    quantization is part of the operator's semantics).  Plan: the 2080
    pair terms are generated IN-ROW by higher-order functions feeding a
    partial-combined hash aggregate — the exchange carries 2080 rows
    per partition, the exploded relation never shuffles.
    """
    emb = load(spark, sf_dir, "embeddings")
    d = _EMB_DIM
    q = (
        "transform(embedding,"
        " v -> cast(floor(cast(v as double) * 1000000.0) as bigint))"
    )
    # r16 optimization round: explode only the ROW index (d rows per
    # vector, the array carried alongside) into a d-group aggregate with
    # d sum buffers, then emit the upper triangle from the aggregated
    # row — the previous form allocated 2080 named_structs per vector
    # into the hash aggregate (the embedding_pca_power gram fix; 4.0 →
    # ~1 s warm at sf0.1).  The full-row sums cost 2× the multiplies of
    # the triangle in codegen but zero allocations; values identical
    # (same int64 products, same per-(i,j) sums, n = corpus count for
    # every pair in both forms).
    ex = emb.select(F.expr(q).alias("q")).select(
        F.posexplode("q").alias("dim_i", "qi"), F.col("q")
    )
    wide = ex.groupBy("dim_i").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col("qi") * F.col("q")[j]).alias(f"s{j}") for j in range(d)],
    )
    return (
        wide.select(
            "dim_i",
            "n",
            F.posexplode(F.array(*[F.col(f"s{j}") for j in range(d)])).alias(
                "dim_j", "sum_cross_micro2"
            ),
        )
        .filter(F.col("dim_j") >= F.col("dim_i"))
        .select("dim_i", "dim_j", "n", "sum_cross_micro2")
        .orderBy("dim_i", "dim_j")
    )


ORACLE_embedding_crossmoments = f"""
WITH ex AS (
    SELECT g1.i - 1 AS dim_i, g2.j - 1 AS dim_j,
           CAST(floor(CAST(embedding[g1.i] AS DOUBLE) * 1000000) AS BIGINT)
           * CAST(floor(CAST(embedding[g2.j] AS DOUBLE) * 1000000) AS BIGINT)
               AS p
    FROM embeddings,
         unnest(generate_series(1, {_EMB_DIM})) AS g1(i),
         unnest(generate_series(1, {_EMB_DIM})) AS g2(j)
    WHERE g2.j >= g1.i
)
SELECT dim_i, dim_j, count(*) AS n,
       CAST(sum(p) AS BIGINT) AS sum_cross_micro2
FROM ex
GROUP BY 1, 2
ORDER BY dim_i, dim_j
"""


# --------------------------- G8: degree assortativity of the kNN graph ---
def knn_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8: degree assortativity — the Pearson correlation of endpoint
    degrees over the symmetrized edge list (both directions, the
    Newman convention), the one-number graph-health summary that
    separates hub-and-spoke corpora (disassortative, r < 0: near-dup
    templates pulling everything toward a few centers) from uniformly
    mixed ones (r ≈ 0).  Completes the graph-stats family at the GRAPH
    level (node G1/G6, edge G7, component D6/G5, now whole-graph G8).

    A36's exact-moment idiom over the directed edge relation: degrees
    are ≤ 2k, so every moment fits int64 at ANY corpus size with no
    centering needed (the one operator where the raw moments are
    born-bounded); one broadcast degree attach + one global aggregate;
    the only float is the final correlation composition per output row.
    """
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    edges = S.knn_edges(emb, k=_GRAPH_K)
    dedges = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = dedges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    pairs = (
        dedges.join(
            F.broadcast(deg.select(F.col("node").alias("src"),
                                   F.col("d").alias("dx"))), "src"
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("dst"),
                                   F.col("d").alias("dy"))), "dst"
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.select(
        "m",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.when(
            (denx > 0) & (deny > 0),
            num.cast("double") / (F.sqrt(denx.cast("double"))
                                  * F.sqrt(deny.cast("double"))),
        ).alias("assortativity"),
    )


def _assortativity_oracle() -> str:
    edges_ctes = ORACLE_knn_graph_degree.partition("), degrees AS")[0] + ")"
    return f"""{edges_ctes},
dedges AS (
    SELECT a AS src, b AS dst FROM edges
    UNION ALL
    SELECT b AS src, a AS dst FROM edges
), deg AS (
    SELECT src AS node, CAST(count(*) AS BIGINT) AS d
    FROM dedges GROUP BY 1
), pairs AS (
    SELECT dx.d AS dx, dy.d AS dy
    FROM dedges e
    JOIN deg dx ON dx.node = e.src
    JOIN deg dy ON dy.node = e.dst
), a AS (
    SELECT count(*) AS m,
           CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
           CAST(sum(dx * dy) AS BIGINT) AS sxy,
           CAST(sum(dx * dx) AS BIGINT) AS sxx,
           CAST(sum(dy * dy) AS BIGINT) AS syy
    FROM pairs
)
SELECT m, sx, sy, sxy, sxx, syy,
       CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0 THEN
           CAST(m * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(m * syy - sy * sy AS DOUBLE)))
       END AS assortativity
FROM a
"""


ORACLE_knn_assortativity = _assortativity_oracle()


# ---------------------- D22: near-dup threshold sweep (operating curve) --
_SWEEP_PERMILLE = (100, 200, 300, 400, 500, 600, 700, 800, 900)


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D22: the near-dup OPERATING CURVE — how many verified candidate
    pairs survive each Jaccard threshold from 0.1 to 0.9, computed from
    ONE LSH candidate pass.  The report a curation run reads before
    committing a dedup threshold: the knee of this curve separates the
    true near-dup mass from the long similarity tail, and sweeping it
    from the already-verified pairs costs one conditional aggregate —
    not nine dedup runs.

    Exactness: thresholds compare CROSS-MULTIPLIED integers
    (|A∩B|·1000 ≥ t·|A∪B|), never a float-vs-literal compare, so the
    curve is bit-stable at every t.  One candidate join (the D2
    machinery), one 9-way conditional aggregate over the pair relation.
    """
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", D.shingle_set("text").alias("sh")
    )
    pairs = (
        D.minhash_candidates(docs)
        .select("doc_a", "doc_b")
        .join(sh.select(F.col("doc_id").alias("doc_a"),
                        F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"),
                        F.col("sh").alias("sh_b")), "doc_b")
        .select(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("i"),
            F.size(F.array_union("sh_a", "sh_b")).cast("long").alias("u"),
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        *[
            F.sum(
                F.when(F.col("i") * 1000 >= F.lit(t) * F.col("u"), 1).otherwise(0)
            ).alias(f"n{t}")
            for t in _SWEEP_PERMILLE
        ],
    )
    rows = None
    for t in _SWEEP_PERMILLE:
        row = agg.select(
            F.lit(t).alias("threshold_permille"),
            F.col("n_candidates"),
            F.col(f"n{t}").alias("n_pairs_at_or_above"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows.orderBy("threshold_permille")


def _threshold_sweep_oracle() -> str:
    # reuse the minhash candidate CTE chain, then sweep on exact ints
    body = _minhash_oracle()
    prefix, _, _ = body.partition("\nSELECT c.doc_a")
    ts = ", ".join(str(t) for t in _SWEEP_PERMILLE)
    return f"""{prefix},
ps AS (
    SELECT CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS i,
           CAST(len(list_distinct(sa.sh || sb.sh)) AS BIGINT) AS u
    FROM cand c
    JOIN t sa ON sa.doc_id = c.doc_a
    JOIN t sb ON sb.doc_id = c.doc_b
), agg AS (
    SELECT count(*) AS n_candidates FROM ps
)
SELECT k.t AS threshold_permille,
       agg.n_candidates,
       CAST((SELECT count(*) FROM ps WHERE ps.i * 1000 >= k.t * ps.u)
            AS BIGINT) AS n_pairs_at_or_above
FROM (SELECT unnest([{ts}]) AS t) k, agg
ORDER BY threshold_permille
"""


ORACLE_dedup_threshold_sweep = _threshold_sweep_oracle()


# ------------------------- N18: centroid-distance embedding outliers -----
_OUTLIER_TOPK = 20


def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N18: the corpus's farthest-from-centroid vectors — top-20 by
    EXACT integer squared distance to the quantized mean vector, the
    outlier screen run before trusting kNN/cluster structure (a handful
    of far-out vectors distort IVF cells and poison diversity samples;
    these are the rows a curation pass eyeballs).  Composes N15: the
    centroid is the per-dimension integer mean the dim-stats operator
    already proves, broadcast as one 64-long array; distance² =
    Σ(qᵢ−μᵢ)² stays int64 (|q−μ| ≤ ~2·10⁶ ⇒ per-dim ≤ 4·10¹², ×64
    ≤ 3·10¹⁴); TakeOrdered top-k, ties to vec_id.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = (
        "transform(embedding,"
        " v -> cast(floor(cast(v as double) * 1000000.0) as bigint))"
    )
    ex = emb.select("vec_id", F.expr(q).alias("q")).select(
        "vec_id", F.posexplode("q").alias("dim", "qv")
    )
    mean = ex.groupBy("dim").agg(
        F.expr("sum(qv) div count(1)").alias("mu")
    )
    return (
        ex.join(F.broadcast(mean), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (F.col("qv") - F.col("mu")) * (F.col("qv") - F.col("mu"))
            ).alias("dist2_micro2")
        )
        .orderBy(F.desc("dist2_micro2"), "vec_id")
        .limit(_OUTLIER_TOPK)
    )


ORACLE_embedding_outliers = f"""
WITH ex AS (
    SELECT vec_id, g.i - 1 AS dim,
           CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) AS qv
    FROM embeddings,
         unnest(generate_series(1, {_EMB_DIM})) AS g(i)
), mu AS (
    SELECT dim, CAST(sum(qv) AS BIGINT) // count(*) AS mu
    FROM ex GROUP BY 1
)
SELECT ex.vec_id,
       CAST(sum((ex.qv - mu.mu) * (ex.qv - mu.mu)) AS BIGINT) AS dist2_micro2
FROM ex JOIN mu ON ex.dim = mu.dim
GROUP BY ex.vec_id
ORDER BY dist2_micro2 DESC, ex.vec_id
LIMIT {_OUTLIER_TOPK}
"""


# ------------------------ D23: near-dup family-size distribution ---------
def dedup_family_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D23: how the near-dup mass is SHAPED — the family-size
    distribution of the D6 transitive clusters (pairs = 2, small
    families 3-10, boilerplate 11+), with per-band family counts, doc
    counts, and removable-doc counts (family size − 1 keeper each).
    Pair counts alone hide shape: 1000 pairs can be 1000 independent
    twins (benign) or one 1001-doc template family (a systemic source
    problem); this is the report that tells them apart, and the
    removable column IS the dedup savings estimate.

    Composability gate: the cluster relation is the gated D6 operator
    verbatim; the histogram is two aggregates on top (sizes per
    cluster, then per band) — ≤|clusters| rows after the first.
    """
    pairs = D.minhash_candidates(load(spark, sf_dir, "documents")).filter(
        F.col("jaccard") >= 0.1
    )
    cc = D.connected_components(pairs)
    sizes = cc.groupBy("cluster").agg(F.count(F.lit(1)).alias("sz"))
    band = (
        F.when(F.col("sz") <= 2, F.lit("2"))
        .when(F.col("sz") <= 10, F.lit("3-10"))
        .otherwise(F.lit("11+"))
    )
    return (
        sizes.select(band.alias("family_size_band"), "sz")
        .groupBy("family_size_band")
        .agg(
            F.count(F.lit(1)).alias("n_families"),
            F.sum("sz").alias("n_docs"),
            F.sum(F.col("sz") - 1).alias("n_removable"),
        )
        .orderBy("family_size_band")
    )


def _family_histogram_oracle() -> str:
    body = ORACLE_dedup_clusters.rsplit("ORDER BY doc_id", 1)[0]
    prefix, _, tail = body.rpartition("\nSELECT node AS doc_id")
    return f"""{prefix},
cc_final AS (
    SELECT node AS doc_id{tail}
), sizes AS (
    SELECT cluster, CAST(count(*) AS BIGINT) AS sz
    FROM cc_final GROUP BY cluster
)
SELECT CASE WHEN sz <= 2 THEN '2'
            WHEN sz <= 10 THEN '3-10'
            ELSE '11+' END AS family_size_band,
       count(*) AS n_families,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(sum(sz - 1) AS BIGINT) AS n_removable
FROM sizes
GROUP BY 1
ORDER BY family_size_band
"""


ORACLE_dedup_family_histogram = _family_histogram_oracle()


# --------------- G7: directed kNN reciprocity (queued for r11) ------------
# Registration note: queued for round 11 (r10 gate window full); the r11
# registry block should add:
#   ("knn_reciprocity", d.knn_reciprocity, d.ORACLE_knn_reciprocity)
def knn_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: mutual-neighbor histogram of the directed exact 5-NN graph —
    the hubness screen (how many of each node's k out-neighbors point
    back); see :func:`datapipe.similarity.knn_reciprocity`."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    return S.knn_reciprocity(emb, k=_GRAPH_K).orderBy("n_mutual_neighbors")


ORACLE_knn_reciprocity = f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings WHERE vec_id < {_GRAPH_VECS}
), scored AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id != c.vec_id
), ranked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
), directed AS (
    SELECT q_id, cand_id FROM ranked WHERE rank <= {_GRAPH_K}
), per_node AS (
    SELECT d.q_id,
           CAST(sum(CASE WHEN r.q_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_mutual
    FROM directed d
    LEFT JOIN directed r ON d.q_id = r.cand_id AND d.cand_id = r.q_id
    GROUP BY d.q_id
)
SELECT n_mutual AS n_mutual_neighbors,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM per_node
GROUP BY n_mutual
ORDER BY n_mutual_neighbors
"""


# ------------------------------------ X25: lang-ID confusion audit --------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("lang_id_confusion", d.lang_id_confusion, d.ORACLE_lang_id_confusion)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X25: label-vs-prediction cross-tab for the gated profile lang-ID
    — the model-QA shape every classifier in a curation pipeline needs
    before its output keys a routing decision: per (labeled lang,
    predicted profile) cell, the document count and the cell's share of
    its label row (exact-int ppm).  On the synthetic corpus the
    heuristic CANNOT separate the labels (all langs draw one
    vocabulary) and the matrix shows it — which is precisely the audit:
    a confusion matrix this flat says "do not route on this signal",
    the same way the dedup recall audits price their candidate
    generators.

    Scale: the per-doc score/argmax is one projection (no exchange),
    the cross-tab is a ≤|langs|·|profiles| group-by with map-side
    combine, and the row totals ride a |langs|-row broadcast. share_ppm
    is integer (n·10⁶ div row_n) — no float hashing.
    """
    labeled = load(spark, sf_dir, "documents").select("doc_id", "lang")
    pred = T.with_lang_id(load(spark, sf_dir, "documents")).select(
        "doc_id", "lang_pred"
    )
    cells = (
        labeled.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = cells.groupBy("lang").agg(F.sum("n").alias("row_n"))
    return (
        cells.join(F.broadcast(rows), "lang")
        .select(
            "lang",
            "lang_pred",
            "n",
            "row_n",
            F.expr("n * 1000000 div row_n").alias("share_ppm"),
        )
        .orderBy("lang", "lang_pred")
    )


def _lang_confusion_oracle() -> str:
    names = list(T.LANG_PROFILES)
    score_cols = ",\n           ".join(
        f"CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> x IN "
        f"({_sql_list(T.LANG_PROFILES[n])}))) AS DOUBLE) / len(toks) "
        f"ELSE 0.0 END AS score_{n}"
        for n in names
    )
    branches = []
    for i, n in enumerate(names):
        conds = [f"score_{n} > score_{o}" for o in names[:i]] + [
            f"score_{n} >= score_{o}" for o in names[i + 1 :]
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{n}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{names[0]}' END"
    return f"""
WITH b AS (
    SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), s AS (
    SELECT doc_id, lang,
           {score_cols}
    FROM b
), p AS (
    SELECT doc_id, lang, {case} AS lang_pred FROM s
), cells AS (
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY 1, 2
), rows_ AS (
    SELECT lang, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY lang
)
SELECT cells.lang, lang_pred, n, row_n,
       CAST(n * 1000000 // row_n AS BIGINT) AS share_ppm
FROM cells JOIN rows_ ON cells.lang = rows_.lang
ORDER BY cells.lang, lang_pred
"""


ORACLE_lang_id_confusion = _lang_confusion_oracle()


# --------------------------------- D24: sorted-neighborhood candidates ----
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("dedup_sorted_neighborhood", d.dedup_sorted_neighborhood,
#    d.ORACLE_dedup_sorted_neighborhood)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D24: sorted-neighborhood near-dup candidates over documents —
    the THIRD blocking family (after LSH banding and key blocking),
    distinguished by a HARD-LINEAR candidate bound: |docs|·w pairs no
    matter how skewed the keys (the guarantee `max_bucket` only
    enforces by dropping). Verified with exact char-4-gram Jaccard in
    integer ppm.  The GATED plan pins ``hashed_grams=False`` so the
    bit-exact gate stays DETERMINISTIC against the string-gram oracle
    (r12 ADVICE: hashing in the gate made it probabilistically sound
    only — a 2⁻⁶⁴ gram collision could flip jaccard_ppm); production
    callers keep the hashed default, and the hashed path has its own
    gate (`dedup_snm_hashed`, the `dedup_ngram_pairs_hashed` pattern).
    See :func:`datapipe.dedup.sorted_neighborhood_pairs` for the
    key/window/boundary design."""
    return (
        D.sorted_neighborhood_pairs(
            load(spark, sf_dir, "documents"), hashed_grams=False
        )
        .orderBy("doc_a", "doc_b")
    )


def dedup_snm_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D24b: scale twin of :func:`dedup_sorted_neighborhood` — identical
    output checked against the SAME string-gram oracle, but the window
    fan-out carries xxhash64-hashed int64 gram sets (the r11 Next #3
    measurement: 4.5 → 2.2 s dedicated at sf0.1; collision odds ~2⁻⁶⁴
    per pair-union — the gate match IS the no-collision proof on this
    corpus, exactly how `dedup_ngram_pairs_hashed` is gated)."""
    return (
        D.sorted_neighborhood_pairs(
            load(spark, sf_dir, "documents"), hashed_grams=True
        )
        .orderBy("doc_a", "doc_b")
    )


ORACLE_dedup_sorted_neighborhood = f"""
WITH t AS (
    SELECT doc_id,
           substr(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' '), 1, {D.SN_KEY_PREFIX})
               AS sn_key,
           list_distinct([substring(text, i, {D.NGRAM_W})
               for i in generate_series(1,
                   greatest(length(text) - {D.NGRAM_W - 1}, 1))]) AS gr
    FROM documents
), r AS (
    SELECT doc_id, sn_key, substr(sn_key, 1, {D.SN_BLOCK_CHARS}) AS block, gr,
           row_number() OVER (PARTITION BY substr(sn_key, 1, {D.SN_BLOCK_CHARS})
                              ORDER BY sn_key, doc_id) AS rn
    FROM t
)
SELECT a.block AS block, a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rn - a.rn AS INT) AS rank_dist,
       CAST(len(list_intersect(a.gr, b.gr)) AS BIGINT) AS n_inter,
       CAST(len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))
            AS BIGINT) AS n_union,
       CAST(len(list_intersect(a.gr, b.gr)) * 1000000
            // (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr)))
            AS BIGINT) AS jaccard_ppm
FROM r a JOIN r b
  ON a.block = b.block AND b.rn > a.rn AND b.rn <= a.rn + {D.SN_WINDOW}
ORDER BY doc_a, doc_b
"""


# ------------------------------------ G10: link prediction ----------------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("knn_link_prediction", d.knn_link_prediction,
#    d.ORACLE_knn_link_prediction)
def knn_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10: common-neighbor + integer-RA link prediction over the exact
    5-NN graph — the missed-near-dup candidate ranker; see
    :func:`datapipe.similarity.knn_link_prediction`."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    return S.knn_link_prediction(emb, k=_GRAPH_K)


ORACLE_knn_link_prediction = f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings WHERE vec_id < {_GRAPH_VECS}
), scored0 AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id != c.vec_id
), ranked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored0
), u AS (
    SELECT DISTINCT least(q_id, cand_id) AS a, greatest(q_id, cand_id) AS b
    FROM ranked WHERE rank <= {_GRAPH_K}
), adj AS (
    SELECT a, b FROM u UNION ALL SELECT b AS a, a AS b FROM u
), deg AS (
    SELECT a AS mid, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY a
), wedges AS (
    SELECT l.a AS x, l.b AS mid, r.b AS y
    FROM adj l JOIN adj r ON l.b = r.a
    WHERE l.a < r.b
), sc AS (
    SELECT x, y, CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum(1000000 // deg) AS BIGINT) AS ra_ppm
    FROM wedges JOIN deg USING (mid)
    GROUP BY x, y
)
SELECT x AS vec_a, y AS vec_b, n_common, ra_ppm
FROM sc
WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.a = sc.x AND u.b = sc.y)
ORDER BY n_common DESC, ra_ppm DESC, vec_a, vec_b
LIMIT 20
"""


# -------------------------------- D25: edit-distance verify over SNM ------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("dedup_edit_distance", d.dedup_edit_distance,
#    d.ORACLE_dedup_edit_distance)
_EDIT_PREFIX = 256  # chars of text the DP runs over (documented bound)
_EDIT_MAX = 64  # near-dup band: keep pairs within this edit distance


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D25: Levenshtein verification over the sorted-neighborhood
    candidates — the EDIT-model near-dup scorer next to the set models
    (Jaccard/containment/SimHash): token-set models are blind to
    ORDER-ONLY edits and char-level corruption inside tokens, edit
    distance prices both, and merge/purge pipelines pair exactly these
    two (SNM blocking + edit-distance verify).

    The DP runs over the first 256 chars of each side (the documented
    bound — O(prefix²) per pair is the operator's whole cost, and a
    256-char prefix decides near-duphood for document-scale text; the
    bound is part of the semantics, mirrored in the oracle).  Both
    engines implement classic unit-cost Levenshtein, so the distance is
    exact int; edit_ppm normalizes by the longer prefix in integer ppm.
    Candidate count is the SNM hard-linear |docs|·w; pairs within the
    64-edit band survive.
    """
    docs = load(spark, sf_dir, "documents")
    pref = docs.select(
        "doc_id", F.substring("text", 1, _EDIT_PREFIX).alias("p")
    )
    # verify=False: candidates are purely sort-order-derived, so the
    # edit-distance verifier pays ZERO gram payload through the SNM
    # window (the jaccard gram columns existed only to be dropped here —
    # 19.5 s → the window carries (block, key, doc_id) alone).
    cand = D.sorted_neighborhood_pairs(docs, verify=False).select(
        "doc_a", "doc_b", "rank_dist"
    )
    j = (
        cand.join(
            pref.select(F.col("doc_id").alias("doc_a"), F.col("p").alias("pa")),
            "doc_a",
        )
        .join(
            pref.select(F.col("doc_id").alias("doc_b"), F.col("p").alias("pb")),
            "doc_b",
        )
        # length pre-filter: edit distance ≥ |len(a) − len(b)|, so pairs
        # whose prefix lengths differ by more than the band skip the
        # O(prefix²) DP entirely — result-identical (any skipped pair
        # would fail the band filter anyway).  Measured NEUTRAL on this
        # corpus (22-26 s at sf0.1 either way: the synthetic docs share a
        # length regime, so almost every SNM pair survives the filter);
        # kept because heterogeneous real corpora are exactly where the
        # prune bites, at zero cost here.
        .filter(
            F.abs(F.length("pa") - F.length("pb")) <= F.lit(_EDIT_MAX)
        )
        # banded DP (Spark 3.5+ threshold form): computes the exact
        # distance for pairs within the band and -1 beyond it, touching
        # O((2k+1)·n) cells instead of O(n²) — result-identical because
        # every -1 row is exactly a row the band filter discarded anyway
        # (r16 optimization round; the >= 0 guard keeps the -1 sentinel
        # out of the <= band predicate).
        .withColumn(
            "edit_dist", F.levenshtein("pa", "pb", _EDIT_MAX).cast("long")
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= _EDIT_MAX))
    )
    return j.select(
        "doc_a",
        "doc_b",
        "rank_dist",
        "edit_dist",
        F.expr(
            "edit_dist * 1000000 div greatest(length(pa), length(pb))"
        ).alias("edit_ppm"),
    ).orderBy("doc_a", "doc_b")


ORACLE_dedup_edit_distance = f"""
WITH t AS (
    SELECT doc_id,
           substr(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' '), 1, {D.SN_KEY_PREFIX})
               AS sn_key,
           substr(text, 1, {_EDIT_PREFIX}) AS p
    FROM documents
), r AS (
    SELECT doc_id, p, substr(sn_key, 1, {D.SN_BLOCK_CHARS}) AS block,
           row_number() OVER (PARTITION BY substr(sn_key, 1, {D.SN_BLOCK_CHARS})
                              ORDER BY sn_key, doc_id) AS rn
    FROM t
), cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.rn - a.rn AS INT) AS rank_dist,
           a.p AS pa, b.p AS pb
    FROM r a JOIN r b
      ON a.block = b.block AND b.rn > a.rn AND b.rn <= a.rn + {D.SN_WINDOW}
)
SELECT doc_a, doc_b, rank_dist,
       CAST(levenshtein(pa, pb) AS BIGINT) AS edit_dist,
       CAST(levenshtein(pa, pb) * 1000000
            // greatest(length(pa), length(pb)) AS BIGINT) AS edit_ppm
FROM cand
WHERE levenshtein(pa, pb) <= {_EDIT_MAX}
ORDER BY doc_a, doc_b
"""


# ------------------------------------ G11: h-hop reachability -------------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("knn_khop_reachability", d.knn_khop_reachability,
#    d.ORACLE_knn_khop_reachability)
def knn_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G11: 3-hop reachability histogram over the exact 5-NN graph —
    the bounded frontier-expansion shape; see
    :func:`datapipe.similarity.knn_khop_reachability`."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    return S.knn_khop_reachability(emb, k=_GRAPH_K, hops=3)


ORACLE_knn_khop_reachability = f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings WHERE vec_id < {_GRAPH_VECS}
), scored0 AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id != c.vec_id
), ranked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored0
), u AS (
    SELECT DISTINCT least(q_id, cand_id) AS a, greatest(q_id, cand_id) AS b
    FROM ranked WHERE rank <= {_GRAPH_K}
), adj AS (
    SELECT DISTINCT a, b FROM
    (SELECT a, b FROM u UNION ALL SELECT b, a FROM u)
), h2 AS (
    SELECT DISTINCT l.a, r.b
    FROM adj l JOIN adj r ON l.b = r.a
    WHERE l.a <> r.b
), h3 AS (
    SELECT DISTINCT l.a, r.b
    FROM h2 l JOIN adj r ON l.b = r.a
    WHERE l.a <> r.b
), reach AS (
    SELECT DISTINCT a, b FROM
    (SELECT a, b FROM adj UNION ALL SELECT a, b FROM h2
     UNION ALL SELECT a, b FROM h3)
), per_node AS (
    SELECT a, CAST(count(*) AS BIGINT) AS n_reached FROM reach GROUP BY a
)
SELECT n_reached, CAST(count(*) AS BIGINT) AS n_nodes
FROM per_node GROUP BY n_reached ORDER BY n_reached
"""


# --------------------------- G12: harmonic closeness ----------------------
def knn_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G12: 3-hop harmonic closeness centrality over the exact 5-NN
    graph — shortest-dist layered frontier expansion with an exact
    integer Σ 10⁶ div dist score; see
    :func:`datapipe.similarity.knn_closeness`."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _GRAPH_VECS)
    return S.knn_closeness(emb, k=_GRAPH_K, hops=3)


ORACLE_knn_closeness = f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings WHERE vec_id < {_GRAPH_VECS}
), scored0 AS (
    SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id != c.vec_id
), ranked AS (
    SELECT q_id, cand_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored0
), u AS (
    SELECT DISTINCT least(q_id, cand_id) AS a, greatest(q_id, cand_id) AS b
    FROM ranked WHERE rank <= {_GRAPH_K}
), adj AS (
    SELECT DISTINCT a, b FROM
    (SELECT a, b FROM u UNION ALL SELECT b, a FROM u)
), h2 AS (
    SELECT DISTINCT l.a, r.b
    FROM adj l JOIN adj r ON l.b = r.a
    WHERE l.a <> r.b
), h3 AS (
    SELECT DISTINCT l.a, r.b
    FROM h2 l JOIN adj r ON l.b = r.a
    WHERE l.a <> r.b
), dist AS (
    -- layer membership = shortest distance (each layer minus earlier)
    SELECT a, b, 1 AS d FROM adj
    UNION ALL
    SELECT a, b, 2 AS d FROM h2
    WHERE NOT EXISTS (SELECT 1 FROM adj WHERE adj.a = h2.a AND adj.b = h2.b)
    UNION ALL
    SELECT h3.a, h3.b, 3 AS d FROM h3
    WHERE NOT EXISTS (SELECT 1 FROM adj WHERE adj.a = h3.a AND adj.b = h3.b)
      AND NOT EXISTS (SELECT 1 FROM h2 WHERE h2.a = h3.a AND h2.b = h3.b)
)
SELECT a AS vec_id, CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(1000000 // d) AS BIGINT) AS harmonic_ppm
FROM dist GROUP BY a
ORDER BY vec_id
"""


# --------------------------------- M5: windowed audio energy profile ------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("media_audio_energy", d.media_audio_energy,
#    d.ORACLE_media_audio_energy)
def media_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: per-window exact energy profile of the audio payloads — the
    VAD/loudness front-end; see :func:`datapipe.multimodal.audio_energy`
    (Arrow-batched, stateless, no shuffle)."""
    media = M.attach_media(load(spark, sf_dir, "documents"))
    return M.audio_energy(media).orderBy("doc_id", "window_idx")


_EW = M.ENERGY_WINDOW
ORACLE_media_audio_energy = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 1
), w AS (
    SELECT doc_id, CAST(g.w AS INT) AS window_idx,
           [CAST('0x' || substr(fh, 2 * (g.w * {_EW} + i) - 1, 2) AS BIGINT)
            for i in generate_series(1, {_EW})] AS samples
    FROM p, unnest(generate_series(0, {_N_PAYLOAD // _EW} - 1)) AS g(w)
)
SELECT doc_id, window_idx,
       CAST({_EW} AS INT) AS n,
       CAST(list_aggregate(samples, 'sum') AS BIGINT) AS sample_sum,
       CAST(list_aggregate(list_transform(samples, s -> s * s), 'sum')
            AS BIGINT) AS sample_sq_sum,
       CAST(list_aggregate(list_transform(samples, s -> s * s), 'sum')
            AS DOUBLE) / {_EW} AS mean_square
FROM w
ORDER BY doc_id, window_idx
"""


# --------------------------------- M6: video scene-cut detection ----------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("media_scene_cuts", d.media_scene_cuts, d.ORACLE_media_scene_cuts)
def media_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: exact frame-difference (SAD) scene-cut detection over the
    video payloads; see :func:`datapipe.multimodal.scene_cuts`."""
    media = M.attach_media(load(spark, sf_dir, "documents"))
    return M.scene_cuts(media).orderBy("doc_id", "frame_idx")


_FB = M.FRAME_BYTES
ORACLE_media_scene_cuts = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 2
), fr AS (
    SELECT doc_id, CAST(g.j AS INT) AS frame_idx,
           [CAST('0x' || substr(fh, 2 * (g.j * {_FB} + i) - 1, 2) AS BIGINT)
            for i in generate_series(1, {_FB})] AS bytes_
    FROM p, unnest(generate_series(0, {M.PAYLOAD_BLOCKS - 1})) AS g(j)
), sad AS (
    SELECT a.doc_id, b.frame_idx,
           CAST(list_aggregate(
               list_transform(generate_series(1, {_FB}),
                              i -> abs(a.bytes_[i] - b.bytes_[i])),
               'sum') AS BIGINT) AS sad
    FROM fr a JOIN fr b
      ON a.doc_id = b.doc_id AND b.frame_idx = a.frame_idx + 1
)
SELECT doc_id, frame_idx, sad, sad > {M.SCENE_CUT_THRESHOLD} AS is_cut
FROM sad
ORDER BY doc_id, frame_idx
"""


# --------------------------------- M7: image intensity histogram ----------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("media_image_histogram", d.media_image_histogram,
#    d.ORACLE_media_image_histogram)
def media_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: equal-width intensity histogram of the image payloads — the
    blank/saturated-capture gate; see
    :func:`datapipe.multimodal.image_histogram`."""
    media = M.attach_media(load(spark, sf_dir, "documents"))
    return M.image_histogram(media).orderBy("doc_id", "bin_idx")


_HB = M.IMAGE_HIST_BINS
ORACLE_media_image_histogram = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 0
), by_ AS (
    SELECT doc_id,
           [CAST('0x' || substr(fh, 2 * i - 1, 2) AS BIGINT)
            for i in generate_series(1, {_N_PAYLOAD})] AS bytes_
    FROM p
)
SELECT doc_id, CAST(g.b AS INT) AS bin_idx,
       CAST(len(list_filter(bytes_, x -> x // {256 // _HB} = g.b))
            AS BIGINT) AS n_bytes
FROM by_, unnest(generate_series(0, {_HB - 1})) AS g(b)
ORDER BY doc_id, bin_idx
"""


# ------------------------------- M11: perceptual average hash + bands -----
def media_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11: perceptual average hash of every image payload plus the
    16-bit band bucket a dedup pre-filter indexes on — the bridge
    between the multimodal and dedup pillars: production image dedup
    hashes every capture (aHash/pHash), buckets on a hash prefix, and
    only compares within-bucket pairs (the LSH-banding idiom applied to
    pixels).  ``band_n`` is the bucket population — the candidate
    fan-out a downstream Hamming verify would pay, and the blank-corpus
    signal (uniform payloads → everything in one band).  Exact int
    arithmetic, engine-independent hex; see
    :func:`datapipe.multimodal.image_ahash`."""
    from pyspark.sql import Window

    media = M.attach_media(load(spark, sf_dir, "documents"))
    h = M.image_ahash(media).withColumn(
        "band", F.substring("ahash_hex", 1, 4)
    )
    wb = Window.partitionBy("band")
    return (
        h.withColumn("band_n", F.count(F.lit(1)).over(wb).cast("long"))
        .select("doc_id", "ahash_hex", "band", "band_n")
        .orderBy("doc_id")
    )


_AC = M.AHASH_CELLS
ORACLE_media_ahash = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 0
), by_ AS (
    SELECT doc_id,
           [CAST('0x' || substr(fh, 2 * i - 1, 2) AS BIGINT)
            for i in generate_series(1, {_N_PAYLOAD})] AS bytes_
    FROM p
), bits AS (
    -- equal 1-byte regions ({_N_PAYLOAD} bytes / {_AC} cells):
    -- bit i = region_sum·cells > total_sum (exact-int mean compare)
    SELECT doc_id,
           [CASE WHEN bytes_[i] * {_AC} > list_aggregate(bytes_, 'sum')
                 THEN 1 ELSE 0 END
            for i in generate_series(1, {_AC})] AS b
    FROM by_
), hx AS (
    SELECT doc_id,
           array_to_string(
               [substr('0123456789abcdef',
                       1 + 8 * b[4 * k - 3] + 4 * b[4 * k - 2]
                         + 2 * b[4 * k - 1] + b[4 * k], 1)
                for k in generate_series(1, {_AC // 4})], '') AS ahash_hex
    FROM bits
)
SELECT doc_id, ahash_hex, substr(ahash_hex, 1, 4) AS band,
       CAST(count(*) OVER (PARTITION BY substr(ahash_hex, 1, 4))
            AS BIGINT) AS band_n
FROM hx
ORDER BY doc_id
"""


# ------------------- M12: Hamming verify over aHash bands -----------------
_AHASH_NIBBLES = _AC // 4
_HAMMING_NEAR = 8  # near-dup flag threshold (bits out of 64)


def media_dedup_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12: the verify stage M11's bands exist for — candidate pairs =
    images sharing an 8-bit hash prefix (coarser than M11's report band:
    banding trades candidate volume for recall exactly like text LSH,
    and the verify is what makes a coarse band safe), scored with the
    EXACT Hamming distance between the full 64-bit hashes (per-nibble
    ``bit_count(xor)`` over the hex — all JVM-side integer ops) plus the
    ``is_near`` flag at {_HAMMING_NEAR} bits.  Candidate volume is
    Σ bᵢ²/2 over 256 buckets of a uniform 8-bit key — the bounded-block
    quadratic every banding scheme here prices; the full-corpus pair
    space is never touched."""
    from pyspark.sql import Window

    media = M.attach_media(load(spark, sf_dir, "documents"))
    h = M.image_ahash(media).withColumn(
        "band8", F.substring("ahash_hex", 1, 2)
    )
    ham = F.expr(
        f"aggregate(sequence(1, {_AHASH_NIBBLES}), 0L, (acc, k) -> acc"
        f" + bit_count(cast(conv(substring(a.ahash_hex, k, 1), 16, 10)"
        f"                  as long)"
        f"             ^ cast(conv(substring(b.ahash_hex, k, 1), 16, 10)"
        f"                    as long)))"
    )
    return (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.band8") == F.col("b.band8"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.band8").alias("band8"),
            ham.cast("long").alias("hamming"),
        )
        .withColumn("is_near", F.col("hamming") <= _HAMMING_NEAR)
        .orderBy("doc_a", "doc_b")
    )


ORACLE_media_dedup_hamming = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 0
), by_ AS (
    SELECT doc_id,
           [CAST('0x' || substr(fh, 2 * i - 1, 2) AS BIGINT)
            for i in generate_series(1, {_N_PAYLOAD})] AS bytes_
    FROM p
), bits AS (
    SELECT doc_id,
           [CASE WHEN bytes_[i] * {_AC} > list_aggregate(bytes_, 'sum')
                 THEN 1 ELSE 0 END
            for i in generate_series(1, {_AC})] AS b
    FROM by_
), hx AS (
    SELECT doc_id,
           array_to_string(
               [substr('0123456789abcdef',
                       1 + 8 * b[4 * k - 3] + 4 * b[4 * k - 2]
                         + 2 * b[4 * k - 1] + b[4 * k], 1)
                for k in generate_series(1, {_AC // 4})], '') AS ahash_hex
    FROM bits
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       substr(a.ahash_hex, 1, 2) AS band8,
       CAST(list_aggregate(
           [bit_count(xor(
                CAST(position(substr(a.ahash_hex, k, 1)
                              IN '0123456789abcdef') - 1 AS BIGINT),
                CAST(position(substr(b.ahash_hex, k, 1)
                              IN '0123456789abcdef') - 1 AS BIGINT)))
            for k in generate_series(1, {_AHASH_NIBBLES})], 'sum')
           AS BIGINT) AS hamming,
       CAST(list_aggregate(
           [bit_count(xor(
                CAST(position(substr(a.ahash_hex, k, 1)
                              IN '0123456789abcdef') - 1 AS BIGINT),
                CAST(position(substr(b.ahash_hex, k, 1)
                              IN '0123456789abcdef') - 1 AS BIGINT)))
            for k in generate_series(1, {_AHASH_NIBBLES})], 'sum')
           <= {_HAMMING_NEAR} AS BOOLEAN) AS is_near
FROM hx a JOIN hx b
  ON substr(a.ahash_hex, 1, 2) = substr(b.ahash_hex, 1, 2)
 AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


# ------------------- N19: int8 scalar quantization audit (staged r13) ------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("embedding_sq8", d.embedding_sq8,
#    d.ORACLE_embedding_sq8)
_SQ_LEVELS = 256


def embedding_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N19: per-dimension int8 scalar quantization (SQ8) audit — the
    fourth standard ANN compression next to the gated sign-LSH, IVF and
    PQ-ADC rows: each coordinate maps to ⌊(v−minᵈ)·256/(maxᵈ−minᵈ)⌋
    (clamped to 255), reconstruction = midpoint dequant, and the report
    prices what 4×-smaller vectors cost in reconstruction error —
    per-dimension, so a heavy-tailed dimension (where SQ8's uniform
    grid wastes levels) shows up as the outlier row before anyone
    trusts distances on the quantized index.

    Exactness: min/max are exact selections; the quantize and dequant
    expressions are FIXED IEEE trees over float→double-exact inputs
    (floor/round of a double is deterministic), and every aggregate is
    an exact int — codes sum, |err| quantized to ppm per element BEFORE
    summation (a float sum across rows would be partition-order
    dependent; the N15 micro-unit rule).

    Scale: one posexplode (map-side, 64 rows/vector) + a 64-group
    min/max aggregate broadcast back onto the exploded stream — two
    reduce exchanges of |dims|·cores rows each, nothing pair-wise."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim", "vf")).select(
        "dim", F.col("vf").cast("double").alias("v")
    )
    rng = ex.groupBy("dim").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    code = F.when(
        F.col("vmax") > F.col("vmin"),
        F.least(
            F.lit(_SQ_LEVELS - 1),
            F.floor(
                (F.col("v") - F.col("vmin"))
                * F.lit(float(_SQ_LEVELS))
                / (F.col("vmax") - F.col("vmin"))
            ),
        ),
    ).otherwise(F.lit(0))
    q = (
        ex.join(F.broadcast(rng), "dim")
        .withColumn("code", code.cast("long"))
        .withColumn(
            "dequant",
            F.col("vmin")
            + (F.col("code").cast("double") + F.lit(0.5))
            * (F.col("vmax") - F.col("vmin"))
            / F.lit(float(_SQ_LEVELS)),
        )
        .withColumn(
            "abs_err_ppm",
            F.abs(F.round((F.col("v") - F.col("dequant")) * F.lit(1_000_000.0), 0))
            .cast("long"),
        )
    )
    return (
        q.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("vmin").alias("vmin"),
            F.first("vmax").alias("vmax"),
            F.sum("code").alias("sum_code"),
            F.sum("abs_err_ppm").alias("sum_abs_err_ppm"),
            F.max("abs_err_ppm").alias("max_abs_err_ppm"),
        )
        .select(
            "dim",
            "n",
            "vmin",
            "vmax",
            "sum_code",
            "sum_abs_err_ppm",
            F.expr("sum_abs_err_ppm div n").alias("mean_abs_err_ppm"),
            "max_abs_err_ppm",
        )
        .orderBy("dim")
    )


ORACLE_embedding_sq8 = f"""
WITH ex AS (
    SELECT g.i - 1 AS dim, CAST(embedding[g.i] AS DOUBLE) AS v
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS g(i)
), rng AS (
    SELECT dim, min(v) AS vmin, max(v) AS vmax FROM ex GROUP BY dim
), q AS (
    SELECT ex.dim, ex.v, rng.vmin, rng.vmax,
           CAST(CASE WHEN rng.vmax > rng.vmin
                     THEN least({_SQ_LEVELS - 1},
                                floor((ex.v - rng.vmin) * {float(_SQ_LEVELS)!r}
                                      / (rng.vmax - rng.vmin)))
                     ELSE 0 END AS BIGINT) AS code
    FROM ex JOIN rng USING (dim)
), e AS (
    SELECT dim, v, vmin, vmax, code,
           vmin + (CAST(code AS DOUBLE) + 0.5) * (vmax - vmin)
               / {float(_SQ_LEVELS)!r} AS dequant
    FROM q
), p AS (
    SELECT dim, v, vmin, vmax, code,
           CAST(abs(round((v - dequant) * 1000000.0, 0)) AS BIGINT)
               AS abs_err_ppm
    FROM e
)
SELECT dim,
       count(*) AS n,
       any_value(vmin) AS vmin,
       any_value(vmax) AS vmax,
       CAST(sum(code) AS BIGINT) AS sum_code,
       CAST(sum(abs_err_ppm) AS BIGINT) AS sum_abs_err_ppm,
       CAST(sum(abs_err_ppm) AS BIGINT) // count(*) AS mean_abs_err_ppm,
       max(abs_err_ppm) AS max_abs_err_ppm
FROM p
GROUP BY dim
ORDER BY dim
"""


# ---------------------- M13: difference-hash report (staged r13) -----------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("media_dhash", d.media_dhash,
#    d.ORACLE_media_dhash)
def media_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13: difference hash of every image payload plus its 16-bit band
    bucket — the gradient sibling of M11's aHash (bits key on local
    pixel structure, invariant to the global brightness/contrast shifts
    that flip aHash bits wholesale; production image dedup runs BOTH
    and unions the candidate pairs).  Same band/`band_n` report shape
    as M11 so the two hash families price their bucket fan-out
    side-by-side; see :func:`datapipe.multimodal.image_dhash` for the
    row-cyclic grid detail.  Pure integer comparisons, no division —
    exact on any engine."""
    from pyspark.sql import Window

    media = M.attach_media(load(spark, sf_dir, "documents"))
    h = M.image_dhash(media).withColumn(
        "band", F.substring("dhash_hex", 1, 4)
    )
    wb = Window.partitionBy("band")
    return (
        h.withColumn("band_n", F.count(F.lit(1)).over(wb).cast("long"))
        .select("doc_id", "dhash_hex", "band", "band_n")
        .orderBy("doc_id")
    )


_DH_R = M.DHASH_ROWS
_DH_C = M.DHASH_COLS
ORACLE_media_dhash = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 0
), by_ AS (
    SELECT doc_id,
           [CAST('0x' || substr(fh, 2 * i - 1, 2) AS BIGINT)
            for i in generate_series(1, {_N_PAYLOAD})] AS bytes_
    FROM p
), bits AS (
    -- bit k (row-major over the {_DH_R}x{_DH_C} grid): pixel brighter
    -- than its right neighbour, row-cyclic at the last column
    SELECT doc_id,
           [CASE WHEN bytes_[k] >
                      bytes_[{_DH_C} * ((k - 1) // {_DH_C})
                             + ((k - 1) % {_DH_C} + 1) % {_DH_C} + 1]
                 THEN 1 ELSE 0 END
            for k in generate_series(1, {_DH_R * _DH_C})] AS b
    FROM by_
), hx AS (
    SELECT doc_id,
           array_to_string(
               [substr('0123456789abcdef',
                       1 + 8 * b[4 * k - 3] + 4 * b[4 * k - 2]
                         + 2 * b[4 * k - 1] + b[4 * k], 1)
                for k in generate_series(1, {_DH_R * _DH_C // 4})], '') AS dhash_hex
    FROM bits
)
SELECT doc_id, dhash_hex, substr(dhash_hex, 1, 4) AS band,
       CAST(count(*) OVER (PARTITION BY substr(dhash_hex, 1, 4))
            AS BIGINT) AS band_n
FROM hx
ORDER BY doc_id
"""


# ---------------------- X-family: RAKE keywords (staged r13) ---------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("text_rake_keywords", d.text_rake_keywords,
#    d.ORACLE_text_rake_keywords)
_RAKE_TOPK = 25


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X28: RAKE keyword extraction (Rose et al. 2010) over the corpus —
    the keyword layer between token stats (counts) and tf-idf (salience
    vs other docs): candidate phrases are the maximal stopword-free
    token runs, each scored by Σ over member words of deg(w)/freq(w)
    where deg counts co-membership (phrase length) — long multi-word
    phrases outrank their member unigrams, which is exactly what makes
    RAKE the standard cheap keyphrase baseline.  Corpus-level word
    statistics (the multi-document RAKE variant), so equal phrase
    texts score equally and the report is the distinct-phrase top-25.

    Exactness: word scores are integer ppm (`deg·10⁶ div freq`), the
    phrase score an exact int sum of member ppms, phrase text rebuilt
    in token order via sorted collect (a total order — no
    nondeterministic aggregation order); ties in the report break by
    (occurrences, phrase).  Scale: one corpus-sized posexplode (the
    tf-idf shape) feeding three key-partitioned aggregates — phrase
    membership (doc, phrase), word stats (token), phrase score (doc,
    phrase) — each map-side combined; the report window rides the
    distinct-phrase relation."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    ).withColumn(
        "is_stop", F.col("token").isin(*T.STOPWORDS)
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    phr = (
        toks.withColumn(
            "phrase_id",
            F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(wd),
        )
        .filter(~F.col("is_stop"))
    )
    plen = phr.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("phrase_len")
    )
    words = (
        phr.join(plen, ["doc_id", "phrase_id"])
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("phrase_len").alias("deg"),
        )
        .select(
            "token", F.expr("deg * 1000000 div freq").alias("word_score_ppm")
        )
    )
    phrases = (
        phr.join(words, "token")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.concat_ws(
                " ",
                F.expr("transform(array_sort(collect_list(struct(pos, token))), s -> s.token)"),
            ).alias("phrase"),
            F.sum("word_score_ppm").alias("score_ppm"),
        )
    )
    wr = Window.orderBy(
        F.col("score_ppm").desc(), F.col("n_occurrences").desc(), "phrase"
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("score_ppm").alias("score_ppm"),
        )
        .withColumn("kw_rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("kw_rank") <= _RAKE_TOPK)
        .select("kw_rank", "phrase", "n_occurrences", "score_ppm")
        .orderBy("kw_rank")
    )


ORACLE_text_rake_keywords = f"""
WITH toks AS (
    SELECT doc_id, g.i AS pos,
           string_split(text, ' ')[g.i] AS token
    FROM documents,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS g(i)
), marked AS (
    SELECT doc_id, pos, token,
           token IN ({_sql_list(T.STOPWORDS)}) AS is_stop
    FROM toks
), phr AS (
    SELECT doc_id, pos, token,
           sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
    FROM marked
    QUALIFY NOT is_stop
), plen AS (
    SELECT doc_id, phrase_id, count(*) AS phrase_len
    FROM phr GROUP BY doc_id, phrase_id
), words AS (
    SELECT p.token,
           count(*) AS freq,
           sum(l.phrase_len) AS deg
    FROM phr p JOIN plen l USING (doc_id, phrase_id)
    GROUP BY p.token
), wscore AS (
    SELECT token, CAST(deg * 1000000 // freq AS BIGINT) AS word_score_ppm
    FROM words
), phrases AS (
    SELECT p.doc_id, p.phrase_id,
           string_agg(p.token, ' ' ORDER BY p.pos) AS phrase,
           CAST(sum(w.word_score_ppm) AS BIGINT) AS score_ppm
    FROM phr p JOIN wscore w USING (token)
    GROUP BY p.doc_id, p.phrase_id
), dedup AS (
    SELECT phrase,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(max(score_ppm) AS BIGINT) AS score_ppm
    FROM phrases GROUP BY phrase
)
SELECT CAST(row_number() OVER (ORDER BY score_ppm DESC, n_occurrences DESC,
                               phrase) AS BIGINT) AS kw_rank,
       phrase, n_occurrences, score_ppm
FROM dedup
QUALIFY kw_rank <= {_RAKE_TOPK}
ORDER BY kw_rank
"""


# ------------------ N20: Matryoshka prefix-dim recall (staged r13) ---------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("knn_prefix_recall", d.knn_prefix_recall,
#    d.ORACLE_knn_prefix_recall)
_PREFIX_DIM = 16


def knn_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N20: recall@k of brute-force search in the first-16-dims
    prefix space against full-64-dim exact truth — the audit behind
    Matryoshka-representation retrieval (Kusupati et al. '22): MRL-trained
    embeddings pack coarse semantics into the leading coordinates, so a
    4×-cheaper prefix index plus full-dim re-rank is the modern
    alternative to N13's JL sign projection.  Same indicator-join shape
    as N13 ON PURPOSE: the two reports read side-by-side answer "for
    THIS corpus, is the cheap space a learned prefix or a random
    projection" — for non-MRL embeddings (these synthetic ones) prefix
    recall ≈ dimension share, and a prefix report ≫ random-projection
    report is the fingerprint that the model was MRL-trained.

    Plan shape (the N13 scale story verbatim): the prefix is a zero-cost
    `slice` projection pipelined with the scan; both top-k's are the
    gated brute kernel; the recall join is |q|·k rows."""
    emb, q = _query_vecs(spark, sf_dir)

    def prj(df):
        return df.select(
            "vec_id", F.slice("embedding", 1, _PREFIX_DIM).alias("embedding")
        )

    truth = S.brute_force_topk(emb, q, k=_TOPK).select("q_id", "cand_id")
    red = S.brute_force_topk(prj(emb), prj(q), k=_TOPK).select(
        "q_id", F.col("cand_id").alias("f_cand")
    )
    joined = truth.join(
        red,
        (truth.q_id == red.q_id) & (truth.cand_id == red.f_cand),
        "left",
    ).select(truth.q_id, truth.cand_id, red.f_cand)
    return (
        joined.groupBy("q_id")
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("f_cand").alias("n_hits"),
        )
        .withColumn("recall_ppm", F.expr("n_hits * 1000000 div n_truth"))
        .orderBy("q_id")
    )


def _prefix_recall_oracle() -> str:
    return f"""
WITH t AS (
    SELECT vec_id, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm,
           embedding[1:{_PREFIX_DIM}] AS rv
    FROM embeddings
), rt AS (
    SELECT vec_id, rv, {V.sql_norm('rv', _PREFIX_DIM)} AS rnrm FROM t
), truth AS (
    SELECT q_id, cand_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) DESC,
                            c.vec_id) AS rk
        FROM t q, t c
        WHERE q.vec_id < {_N_QUERY_VECS} AND q.vec_id != c.vec_id
    ) WHERE rk <= {_TOPK}
), red AS (
    SELECT q_id, cand_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY {V.sql_dot('q.rv', 'c.rv', _PREFIX_DIM)} / (q.rnrm * c.rnrm) DESC,
                            c.vec_id) AS rk
        FROM rt q, rt c
        WHERE q.vec_id < {_N_QUERY_VECS} AND q.vec_id != c.vec_id
    ) WHERE rk <= {_TOPK}
)
SELECT tr.q_id, count(*) AS n_truth,
       CAST(count(r.cand_id) AS BIGINT) AS n_hits,
       count(r.cand_id) * 1000000 // count(*) AS recall_ppm
FROM truth tr
LEFT JOIN red r ON r.q_id = tr.q_id AND r.cand_id = tr.cand_id
GROUP BY tr.q_id
ORDER BY tr.q_id
"""


ORACLE_knn_prefix_recall = _prefix_recall_oracle()


# ---------------- N21: per-label centroid drift audit (staged r13) ---------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("embedding_centroid_drift", d.embedding_centroid_drift,
#    d.ORACLE_embedding_centroid_drift)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N21: per-label centroid drift between the two vec_id-parity
    halves of the corpus — the index-maintenance signal the ANN family
    needs but none of the gated rows emits: IVF/PQ cells are trained on
    yesterday's distribution, and when per-group centroids move, recall
    silently decays until the quantizer is re-trained (the N10/N11
    re-train trigger).  Halving by vec_id parity is the deterministic
    stand-in for the before/after split a production pipeline takes
    from ingest time.

    Exactness: coordinates quantize to int64 micro-units FIRST (the N15
    rule — float sums across rows are partition-order dependent),
    per-(label, half, dim) sums are exact ints, centroids integer-div
    micro, drift = Σ|Δ| and max|Δ| over dims in exact micro-units.
    Scale: one posexplode into a (label, half, dim)-keyed aggregate
    (map-side combined, ≤ labels·2·64 groups), then a 64-fold smaller
    pivot join — nothing pairwise, nothing driver-side."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "vf"),
    ).select(
        "label",
        "half",
        "dim",
        F.floor(F.col("vf").cast("double") * F.lit(1_000_000.0))
        .cast("long")
        .alias("q"),
    )
    cent = (
        ex.groupBy("label", "half", "dim")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label", "half", "dim", F.expr("s div n").alias("c_micro"), "n"
        )
    )
    a = cent.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c_micro").alias("c0"), F.col("n").alias("n0")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "dim", F.col("c_micro").alias("c1"), F.col("n").alias("n1")
    )
    return (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.max("n0").alias("n_half0"),
            F.max("n1").alias("n_half1"),
            F.sum(F.abs(F.col("c0") - F.col("c1"))).alias("l1_drift_micro"),
            F.max(F.abs(F.col("c0") - F.col("c1"))).alias("max_dim_drift_micro"),
        )
        .orderBy("label")
    )


ORACLE_embedding_centroid_drift = """
WITH ex AS (
    SELECT label, vec_id % 2 AS half, g.i - 1 AS dim,
           CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)
               AS q
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS g(i)
), cent AS (
    SELECT label, half, dim,
           CAST(sum(q) AS BIGINT) // count(*) AS c_micro,
           CAST(count(*) AS BIGINT) AS n
    FROM ex GROUP BY label, half, dim
)
SELECT a.label,
       CAST(max(a.n) AS BIGINT) AS n_half0,
       CAST(max(b.n) AS BIGINT) AS n_half1,
       CAST(sum(abs(a.c_micro - b.c_micro)) AS BIGINT) AS l1_drift_micro,
       CAST(max(abs(a.c_micro - b.c_micro)) AS BIGINT)
           AS max_dim_drift_micro
FROM cent a JOIN cent b
  ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1
GROUP BY a.label
ORDER BY a.label
"""


# ------------- D26: cross-source near-dup matrix (staged r13) --------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("dedup_source_matrix", d.dedup_source_matrix,
#    d.ORACLE_dedup_source_matrix)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D26: the near-duplication matrix BETWEEN sources — the question
    the pairwise dedup rows answer one pair at a time, aggregated to
    the level corpus curation actually acts on: two crawl dumps with a
    hot off-diagonal cell are re-crawls of each other (drop one,
    reweight the mixture), a hot diagonal is within-source boilerplate
    (send to the span/tile dedup).  Pairs are the PRODUCTION minhash
    path (banded candidates, exact-jaccard verify ≥ 0.1 — the gated D*
    row), so this report costs one extra aggregate over an existing
    output, not a new pair space.

    Exactness: each verified pair's jaccard quantizes to integer ppm
    (one IEEE floor per pair — never an order-dependent float fold),
    sums/means exact ints.  Scale: inherits the banded candidate bound;
    the source join is a doc-keyed equi-join; the matrix ≤ |sources|²/2
    rows."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_candidates(docs).filter(F.col("jaccard") >= 0.1)
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    b = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    labeled = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_lo"),
            F.greatest("sa", "sb").alias("source_hi"),
            F.floor(F.col("jaccard") * F.lit(1_000_000.0))
            .cast("long")
            .alias("jac_ppm"),
        )
    )
    return (
        labeled.groupBy("source_lo", "source_hi")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("jac_ppm").alias("sum_jac_ppm"),
            F.max("jac_ppm").alias("max_jac_ppm"),
        )
        .select(
            "source_lo",
            "source_hi",
            (F.col("source_lo") == F.col("source_hi")).alias("within_source"),
            "n_pairs",
            F.expr("sum_jac_ppm div n_pairs").alias("mean_jac_ppm"),
            "max_jac_ppm",
        )
        .orderBy("source_lo", "source_hi")
    )


def _source_matrix_oracle() -> str:
    base = _minhash_oracle().rsplit("ORDER BY doc_a, doc_b", 1)[0]
    return f"""
WITH pairs AS (
{base}
), labeled AS (
    SELECT least(da.source, db.source) AS source_lo,
           greatest(da.source, db.source) AS source_hi,
           CAST(floor(p.jaccard * 1000000.0) AS BIGINT) AS jac_ppm
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
)
SELECT source_lo, source_hi,
       source_lo = source_hi AS within_source,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(jac_ppm) // count(*) AS BIGINT) AS mean_jac_ppm,
       max(jac_ppm) AS max_jac_ppm
FROM labeled
GROUP BY source_lo, source_hi
ORDER BY source_lo, source_hi
"""


ORACLE_dedup_source_matrix = _source_matrix_oracle()


# ------------- X29: word burstiness / Fano factors (staged r13) ------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("text_word_burstiness", d.text_word_burstiness,
#    d.ORACLE_text_word_burstiness)
_BURST_TOPK = 30


def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29: per-word burstiness (the Fano factor of per-document counts,
    Church & Gale '95) — the signal tf-idf approximates and Zipf hides:
    a FUNCTION word's occurrences spread evenly across documents
    (Fano ≈ 1, Poisson), a TOPICAL word clumps (Fano ≫ 1: absent almost
    everywhere, dense where its topic lives).  Burstiness is the
    principled stopword/keyword split for corpora where a fixed
    stopword list is wrong (code, non-English), and a burstiness
    COLLAPSE corpus-wide is the fingerprint of template spam.

    Exactness: Fano = var/mean over per-doc counts INCLUDING zeros —
    with N docs, Σc, Σc²: `fano_ppm = (N·Σc² − (Σc)²)·10⁶ div (N·Σc)`,
    all exact int64 (zero-docs enter via N, never materialized).
    Report = top-30 by (fano desc, word) among words in ≥ 5 docs.
    Scale: one corpus explode → (word, doc) count → word reduce (both
    map-side combined, the tf-idf shape); N is a 1-row broadcast; the
    top-k a TakeOrderedAndProject on the vocab relation."""
    docs = load(spark, sf_dir, "documents")
    wd = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    per_word = (
        wd.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("c").alias("sc"),
            F.sum(F.col("c") * F.col("c")).alias("scc"),
        )
        .filter(F.col("df") >= 5)
    )
    return (
        per_word.crossJoin(F.broadcast(n_docs))
        .select(
            "word",
            "df",
            "sc",
            F.expr(
                "(n_docs * scc - sc * sc) * 1000000 div (n_docs * sc)"
            ).alias("fano_ppm"),
            F.expr("sc * 1000000 div n_docs").alias("mean_count_ppm"),
        )
        .orderBy(F.col("fano_ppm").desc(), "word")
        .limit(_BURST_TOPK)
    )


ORACLE_text_word_burstiness = f"""
WITH wd AS (
    SELECT word, doc_id, CAST(count(*) AS BIGINT) AS c
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    GROUP BY word, doc_id
), n AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), per_word AS (
    SELECT word,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(c) AS BIGINT) AS sc,
           CAST(sum(c * c) AS BIGINT) AS scc
    FROM wd GROUP BY word
    HAVING count(*) >= 5
)
SELECT word, df, sc,
       CAST((n.n_docs * scc - sc * sc) * 1000000 // (n.n_docs * sc)
            AS BIGINT) AS fano_ppm,
       CAST(sc * 1000000 // n.n_docs AS BIGINT) AS mean_count_ppm
FROM per_word CROSS JOIN n
ORDER BY fano_ppm DESC, word
LIMIT {_BURST_TOPK}
"""


# ---------------- N22: hard-negative mining (round 14) --------------------
# Registration note: REGISTERED r14 (Block R14b).  Registry row:
#   ("knn_hard_negatives", d.knn_hard_negatives,
#    d.ORACLE_knn_hard_negatives)
def knn_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N22: per anchor vector, the top-k most-similar DIFFERENT-label
    candidates — the hard negatives contrastive/triplet training mines
    per batch (near-boundary negatives carry the gradient; random ones
    are too easy).  The brute exact form is the recall baseline; the
    label predicate composes with the LSH/IVF candidate rings for the
    100 TB path (the same ladder every kNN row climbs).  The cosine is
    the N1 fixed expression tree — bit-identical doubles cross-engine."""
    emb, q = _query_vecs(spark, sf_dir)
    return _present_topk(S.hard_negatives_topk(emb, q, k=_TOPK))


ORACLE_knn_hard_negatives = f"""
WITH t AS (
    SELECT vec_id, label, embedding AS v,
           {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS q_id, q.label AS q_label,
           c.vec_id AS cand_id, c.label AS cand_label,
           {V.sql_dot('q.v', 'c.v', _EMB_DIM)} / (q.nrm * c.nrm) AS cos_sim
    FROM t q, t c
    WHERE q.vec_id < {_N_QUERY_VECS}
      AND q.vec_id != c.vec_id AND q.label != c.label
), ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY cos_sim DESC, cand_id ASC) AS rank
    FROM scored
)
SELECT q_id, q_label, cand_id, cand_label, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_TOPK}
ORDER BY q_id, rank
"""


# ---------------- M14: audio clipping / silence screen (round 14) ---------
# Registration note: REGISTERED r14 (Block R14b).  Registry row:
#   ("media_audio_clipping", d.media_audio_clipping,
#    d.ORACLE_media_audio_clipping)
def media_audio_clipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14: rail-pinned sample counts (clipping/saturation) and the
    longest quiet-band RUN (dead air) per audio payload — the two
    capture-quality gates audio curation runs before any model sees a
    clip; see :func:`datapipe.multimodal.audio_clipping`.  All exact
    integers (counts, integer-div ppm, a run length)."""
    media = M.attach_media(load(spark, sf_dir, "documents"))
    return M.audio_clipping(media).orderBy("doc_id")


ORACLE_media_audio_clipping = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 1
), b AS (
    SELECT doc_id, CAST(g.i AS BIGINT) AS i,
           CAST('0x' || substr(fh, 2 * g.i - 1, 2) AS BIGINT) AS byte
    FROM p, unnest(generate_series(1, {_N_PAYLOAD})) AS g(i)
), q AS (
    SELECT doc_id, i, byte,
           byte BETWEEN {M.QUIET_LO} AND {M.QUIET_HI} AS quiet,
           byte <= {M.CLIP_LO} OR byte >= {M.CLIP_HI} AS clipped
    FROM b
), isl AS (
    SELECT doc_id, quiet,
           i - row_number() OVER (PARTITION BY doc_id, quiet ORDER BY i)
               AS grp
    FROM q
), runs AS (
    SELECT doc_id, count(*) AS run_len
    FROM isl WHERE quiet GROUP BY doc_id, grp
), longest AS (
    SELECT doc_id, max(run_len) AS longest_quiet_run FROM runs GROUP BY doc_id
)
SELECT q.doc_id,
       count(*) AS n_samples,
       CAST(sum(CASE WHEN clipped THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       CAST(sum(CASE WHEN clipped THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS clip_ppm,
       CAST(sum(CASE WHEN quiet THEN 1 ELSE 0 END) AS BIGINT) AS n_quiet,
       CAST(coalesce(any_value(l.longest_quiet_run), 0) AS BIGINT)
           AS longest_quiet_run
FROM q LEFT JOIN longest l ON q.doc_id = l.doc_id
GROUP BY q.doc_id
ORDER BY q.doc_id
"""


# ---------------- N23: embedding-space ROC-AUC audit (round 14) -----------
# Registration note: REGISTERED r14 (Block R14b).  Registry row:
#   ("embedding_pair_auc", d.embedding_pair_auc, d.ORACLE_embedding_pair_auc)
_AUC_SAMPLE = 80  # bounded eval sample: C(80,2) = 3160 pairs, fixed cost


def embedding_pair_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N23: ROC-AUC of cosine similarity as a same-label classifier —
    the standard "is this embedding space any good for retrieval"
    audit: over a deterministic hash-order sample of vectors, every
    pair is scored by the N1 cosine and labeled by label agreement;
    AUC is the probability a same-label pair outranks a
    different-label pair, computed EXACTLY from rank statistics with
    average-rank tie handling in INTEGERS: ``2·avg_rank = 2·min_rank +
    tie_n − 1``, so ``auc_ppm = (2·R⁺ − n⁺(n⁺+1)) · 10⁶ div
    (2·n⁺·n⁻)`` divides exact ints (the Mann-Whitney U identity the
    A64 row already gates, re-deployed as an embedding audit).

    Scale: the sample is FIXED (C(80,2) = 3160 pairs — the
    dedup_recall_report bounded-eval pattern), so the global rank
    window rides a bounded-by-construction relation at any corpus
    size; the sample selection is hash-order top-S (the P13 rule, no
    RNG state)."""
    from project_obsidian_core_spark.datapipe.text import shared_hash60

    emb = load(spark, sf_dir, "embeddings")
    sample = (
        emb.withColumn(
            "_sk",
            shared_hash60(
                F.concat(F.lit("aucsample:"), F.col("vec_id").cast("string"))
            ),
        )
        .orderBy("_sk", "vec_id")
        .limit(_AUC_SAMPLE)
        .select("vec_id", "label", "embedding", V.norm(F.col("embedding")).alias("nrm"))
    )
    a = sample.select(
        F.col("vec_id").alias("ia"),
        F.col("label").alias("la"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = sample.select(
        F.col("vec_id").alias("ib"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).select(
        (F.col("la") == F.col("lb")).alias("pos"),
        V.cosine_prenormed(
            V.dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    wr = Window.orderBy("cos_sim")
    wt = Window.partitionBy("cos_sim")
    ranked = pairs.withColumn("r_lo", F.rank().over(wr)).withColumn(
        "tie_n", F.count(F.lit(1)).over(wt)
    )
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("n_pos"),
            F.sum(F.when(~F.col("pos"), 1).otherwise(0)).cast("long").alias("n_neg"),
            F.sum(
                F.when(F.col("pos"), 2 * F.col("r_lo") + F.col("tie_n") - 1)
            ).cast("long").alias("two_rank_sum_pos"),
        )
        .select(
            "n_pairs",
            "n_pos",
            "n_neg",
            "two_rank_sum_pos",
            F.expr(
                "(two_rank_sum_pos - n_pos * (n_pos + 1)) * 1000000"
                " div (2 * n_pos * n_neg)"
            ).alias("auc_ppm"),
        )
    )


def _sql_hash60_local(expr: str) -> str:
    """DuckDB twin of datapipe.text.shared_hash60 (inlined: importing
    pipeline_queries here would be circular)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


ORACLE_embedding_pair_auc = f"""
WITH s AS (
    SELECT vec_id, label, embedding AS v, {V.sql_norm('embedding', _EMB_DIM)} AS nrm
    FROM embeddings
    ORDER BY {_sql_hash60_local("'aucsample:' || CAST(vec_id AS VARCHAR)")}, vec_id
    LIMIT {_AUC_SAMPLE}
), pairs AS (
    SELECT a.label = b.label AS pos,
           {V.sql_dot('a.v', 'b.v', _EMB_DIM)} / (a.nrm * b.nrm) AS cos_sim
    FROM s a JOIN s b ON a.vec_id < b.vec_id
), ranked AS (
    SELECT pos,
           rank() OVER (ORDER BY cos_sim) AS r_lo,
           count(*) OVER (PARTITION BY cos_sim) AS tie_n
    FROM pairs
)
SELECT count(*) AS n_pairs,
       CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(sum(CASE WHEN pos THEN 2 * r_lo + tie_n - 1 END) AS BIGINT)
           AS two_rank_sum_pos,
       CAST((sum(CASE WHEN pos THEN 2 * r_lo + tie_n - 1 END)
             - sum(CASE WHEN pos THEN 1 ELSE 0 END)
               * (sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1)) * 1000000
            // (2 * sum(CASE WHEN pos THEN 1 ELSE 0 END)
                  * sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)) AS BIGINT)
           AS auc_ppm
FROM ranked
"""


# ---------------- N24: nearest-centroid probe (staged r15) -----------------
# Registration note: REGISTERED r15 (Block R15 queue drain; was staged
# via scripts/check_queued.py).  Registry row:
#   ("embedding_centroid_probe", d.embedding_centroid_probe,
#    d.ORACLE_embedding_centroid_probe)
def embedding_centroid_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N24: nearest-centroid classification probe — the second standard
    embedding-quality audit next to N23's pair AUC: predict every
    vector's label by its nearest per-label centroid (Rocchio) and
    report the confusion matrix; a label whose row smears across the
    matrix is a class the embedding space cannot separate, which is
    what decides retrieval-filter and hard-negative policies.

    Exactness: coordinates quantize to int64 micro-units FIRST and
    centroids are the N21 exact integer-division idiom VERBATIM;
    distance² = Σ(q − c)² is a non-negative exact int (≤ 64·(2·10⁶)² ≈
    2.6·10¹⁴ — int64-safe); argmin ties break by label ascending via a
    lexicographic struct-min, so the prediction is total.  No float
    exists anywhere in the operator.

    Scale: one posexplode → (label, dim) centroid aggregate (≤
    |labels|·64 groups, broadcast back); the per-vector distance pass
    is a dim-keyed broadcast join + two map-side-combined aggregates —
    nothing pairwise, nothing driver-side."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "vf"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("vf").cast("double") * F.lit(1_000_000.0))
        .cast("long")
        .alias("q"),
    )
    cent = (
        ex.groupBy(F.col("label").alias("c_label"), F.col("dim"))
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("c_label", "dim", F.expr("s div n").alias("c_micro"))
    )
    d2 = (
        ex.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sum(
                (F.col("q") - F.col("c_micro")) * (F.col("q") - F.col("c_micro"))
            ).alias("dist2")
        )
    )
    pred = d2.groupBy("vec_id", F.col("label").alias("true_label")).agg(
        F.min(F.struct("dist2", "c_label")).alias("_best")
    )
    return (
        pred.groupBy("true_label", F.col("_best.c_label").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("true_label", "pred_label")
    )


ORACLE_embedding_centroid_probe = """
WITH ex AS (
    SELECT vec_id, label, g.i - 1 AS dim,
           CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)
               AS q
    FROM embeddings,
         unnest(generate_series(1, len(embedding))) AS g(i)
), cent AS (
    SELECT label AS c_label, dim,
           CAST(sum(q) AS BIGINT) // count(*) AS c_micro
    FROM ex GROUP BY label, dim
), d2 AS (
    SELECT e.vec_id, e.label, c.c_label,
           sum((e.q - c.c_micro) * (e.q - c.c_micro)) AS dist2
    FROM ex e JOIN cent c USING (dim)
    GROUP BY e.vec_id, e.label, c.c_label
), pred AS (
    SELECT vec_id, label AS true_label, c_label AS pred_label
    FROM (
        SELECT *,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist2, c_label) AS rk
        FROM d2
    )
    WHERE rk = 1
)
SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n_vecs
FROM pred
GROUP BY true_label, pred_label
ORDER BY true_label, pred_label
"""


# ----------------- D27: token-sort order-insensitive dedup (round 15) -----
def dedup_token_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D27: order-insensitive exact dedup groups (md5 of the SORTED
    token multiset — the token_sort blocking key); see
    :func:`datapipe.dedup.token_sort_groups`.  ``is_reorder_only``
    marks the catches that are NEW relative to D1's bitwise pass."""
    return D.token_sort_groups(load(spark, sf_dir, "documents")).orderBy(
        "sort_hash"
    )


ORACLE_dedup_token_sort = """
SELECT md5(list_aggregate(list_sort(string_split(text, ' ')), 'string_agg', ' '))
           AS sort_hash,
       count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct_raw,
       min(doc_id) AS keeper_doc_id,
       count(DISTINCT md5(text)) > 1 AS is_reorder_only
FROM documents
GROUP BY 1
ORDER BY sort_hash
"""


# --------------------- M15: keyframe selection report (round 15) ----------
def media_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M15: per-video keyframe selection — the frame AFTER the largest
    inter-frame change (the "I-frame after the biggest cut" heuristic
    real samplers use to pick one representative frame per clip),
    plus the motion profile a curation gate reads (a near-zero
    total_motion = a static/frozen capture; n_cuts from the gated M9
    threshold).

    Exactness: SADs are the gated M9 exact integers; the keyframe is a
    lexicographic struct-max (sad DESC, frame_idx ASC) — total order,
    ties to the earliest frame.  Scale: M9's stateless Arrow decode
    (one pass, no shuffle) followed by ONE map-side-combined per-video
    aggregate."""
    media = M.attach_media(load(spark, sf_dir, "documents"))
    cuts = M.scene_cuts(media)
    return (
        cuts.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum("sad").alias("total_motion"),
            F.sum(F.when(F.col("is_cut"), 1).otherwise(0)).alias("n_cuts"),
            F.max(
                F.struct(
                    F.col("sad").alias("sad"),
                    (-F.col("frame_idx")).alias("nfi"),
                )
            ).alias("w"),
        )
        .select(
            "doc_id",
            "n_transitions",
            "total_motion",
            "n_cuts",
            (-F.col("w.nfi")).cast("int").alias("keyframe_idx"),
            F.col("w.sad").alias("max_sad"),
        )
        .orderBy("doc_id")
    )


ORACLE_media_keyframes = f"""
WITH p AS (
    SELECT doc_id, {_FULL_HEX} AS fh
    FROM documents WHERE doc_id % 3 = 2
), fr AS (
    SELECT doc_id, CAST(g.j AS INT) AS frame_idx,
           [CAST('0x' || substr(fh, 2 * (g.j * {M.FRAME_BYTES} + i) - 1, 2) AS BIGINT)
            for i in generate_series(1, {M.FRAME_BYTES})] AS bytes_
    FROM p, unnest(generate_series(0, {M.PAYLOAD_BLOCKS - 1})) AS g(j)
), sad AS (
    SELECT a.doc_id, b.frame_idx,
           CAST(list_aggregate(
               list_transform(generate_series(1, {M.FRAME_BYTES}),
                              i -> abs(a.bytes_[i] - b.bytes_[i])),
               'sum') AS BIGINT) AS sad
    FROM fr a JOIN fr b
      ON a.doc_id = b.doc_id AND b.frame_idx = a.frame_idx + 1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(sum(sad) AS BIGINT) AS total_motion,
       CAST(sum(CASE WHEN sad > {M.SCENE_CUT_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cuts,
       CAST(min(CASE WHEN (sad, -frame_idx) =
                     (SELECT max((s2.sad, -s2.frame_idx)) FROM sad s2
                      WHERE s2.doc_id = sad.doc_id)
                THEN frame_idx END) AS INT) AS keyframe_idx,
       CAST(max(sad) AS BIGINT) AS max_sad
FROM sad
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------- X31: tokenizer-bomb / token-length anomaly screen ----------
#: the maxlen flag threshold is per-source DERIVED: greatest(FLOOR,
#: 2·p99 of the source's own per-doc max token length).  The r15
#: static threshold of 8 chars flagged ordinary English words —
#: near-total on natural text, pure noise (r15 ADVICE #4); the floor
#: now sits in the genuinely anomalous URL/base64/DNA regime and the
#: 2·p99 term adapts it upward for legitimately long-token sources
#: (minified code, agglutinative languages).
TOKEN_MAXLEN_FLOOR = 40
TOKEN_MEANLEN_MILLI_FLAG = 6000


def text_token_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X31: token-length anomaly screen per source — the
    "tokenizer bomb" gate (URLs, base64 blobs, DNA strings and
    minified code explode BPE token counts and training step time;
    their signature is extreme max/mean WORD length, visible long
    before tokenization): per source, the doc count, docs whose
    longest token ≥ greatest({TOKEN_MAXLEN_FLOOR}, 2·p99) chars, docs
    whose mean token length ≥ {TOKEN_MEANLEN_MILLI_FLAG} milli-chars,
    and the EXACT nearest-rank p99 of per-doc max token length.

    Exactness: lengths are ints; the mean is scaled integer division
    (Σlen·1000 div n — truncating both engines); the p99 is the A106
    cumulative-count grid over DISTINCT max-length values (bounded by
    the longest word, not the corpus); the maxlen flag is counted on
    the SAME grid against the derived per-source threshold, so it
    needs no second corpus pass.  Scale: one narrow per-row
    projection (no explode — higher-order functions fold in-row), one
    map-side-combined (source, max_len) aggregate, windows on the
    ≤|sources|·|len range| grid."""
    docs = load(spark, sf_dir, "documents")
    grid = token_anomaly_grid(token_doc_stats(docs))
    return token_anomaly_report(grid)


def token_doc_stats(docs: DataFrame) -> DataFrame:
    """Per-doc (source, max_len, mean_milli) — stateless in-row folds,
    shared verbatim by the batch plan and the T44 streaming monitor so
    the two gates cannot drift (the T41 shared-expression rule)."""
    return docs.select(
        "source",
        F.expr(
            "aggregate(transform(split(text, ' '), t -> length(t)),"
            " 0L, (a, x) -> greatest(a, cast(x as long)))"
        ).alias("max_len"),
        F.expr(
            "aggregate(transform(split(text, ' '), t -> length(t)),"
            " 0L, (a, x) -> a + x) * 1000"
            " div size(split(text, ' '))"
        ).alias("mean_milli"),
    )


def token_anomaly_grid(stats: DataFrame) -> DataFrame:
    """(source, max_len) grid with count + flag sums — commutative
    integer aggregates, so a complete-mode streaming aggregation of the
    same expressions merges to the identical relation."""
    return stats.groupBy("source", "max_len").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.when(F.col("mean_milli") >= TOKEN_MEANLEN_MILLI_FLAG, 1).otherwise(0)
        ).alias("flag_mean"),
    )


def token_anomaly_report(grid: DataFrame) -> DataFrame:
    """The X31 report derivation over the reduced (source, max_len)
    grid — windows ride ≤|sources|·|len range| rows.  The maxlen flag
    is derived HERE (not in the grid): its threshold is
    greatest(TOKEN_MAXLEN_FLOOR, 2·p99(source)), and the p99 only
    exists once the grid is complete — which also keeps the flag
    correct under the T44 complete-mode streaming merge (a per-row
    flag against a moving threshold would not be commutative)."""
    from pyspark.sql import Window

    ws = Window.partitionBy("source")
    wcum = ws.orderBy("max_len").rowsBetween(Window.unboundedPreceding, 0)
    g = (
        grid.withColumn("n", F.sum("cnt").over(ws))
        .withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("i99", F.expr("(99 * n + 99) div 100"))
    )
    g = g.withColumn(
        "p99",
        F.min(
            F.when(F.col("cum") >= F.col("i99"), F.col("max_len"))
        ).over(ws),
    )
    return (
        g.groupBy("source")
        .agg(
            F.first("n").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("max_len")
                    >= F.greatest(
                        F.lit(TOKEN_MAXLEN_FLOOR), F.expr("2 * p99")
                    ),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("n_flag_maxlen"),
            F.sum("flag_mean").alias("n_flag_meanlen"),
            F.first("p99").alias("p99_max_token_len"),
        )
        .orderBy("source")
    )


ORACLE_text_token_anomalies = f"""
WITH d AS (
    SELECT source,
           CAST(list_aggregate(
               list_transform(string_split(text, ' '), t -> len(t)),
               'max') AS BIGINT) AS max_len,
           CAST(list_aggregate(
               list_transform(string_split(text, ' '), t -> len(t)),
               'sum') AS BIGINT) * 1000
           // len(string_split(text, ' ')) AS mean_milli
    FROM documents
), grid AS (
    SELECT source, max_len, count(*) AS cnt,
           sum(CASE WHEN mean_milli >= {TOKEN_MEANLEN_MILLI_FLAG}
                    THEN 1 ELSE 0 END) AS flag_mean
    FROM d GROUP BY source, max_len
), g AS (
    SELECT source, max_len, cnt, flag_mean,
           sum(cnt) OVER (PARTITION BY source) AS n,
           sum(cnt) OVER (PARTITION BY source ORDER BY max_len
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM grid
), gp AS (
    SELECT *,
           min(CASE WHEN cum >= (99 * n + 99) // 100 THEN max_len END)
               OVER (PARTITION BY source) AS p99
    FROM g
)
SELECT source,
       CAST(any_value(n) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN max_len >= greatest({TOKEN_MAXLEN_FLOOR}, 2 * p99)
                     THEN cnt ELSE 0 END) AS BIGINT) AS n_flag_maxlen,
       CAST(sum(flag_mean) AS BIGINT) AS n_flag_meanlen,
       CAST(any_value(p99) AS BIGINT) AS p99_max_token_len
FROM gp
GROUP BY source
ORDER BY source
"""


# -------- N25: PCA top component via integer power iteration (round 15) ---
_PCA_ROUNDS = 3
_PCA_S = 1_000_000


def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N25: the top principal direction of the embedding cloud by POWER
    ITERATION over the exact N17 Gram matrix — the audit that tells a
    training pipeline whether its embedding space has collapsed onto
    one axis (a dominant rayleigh share = anisotropy; the per-dim
    loadings name the axis).  The corpus is touched ONCE (the Gram
    aggregate); the 64×64 iteration is bounded control-plane math
    expressed as ≤4096-row relational rounds.

    Exactness: NO float anywhere — the Gram is the N17 exact int64
    micro² sum (full matrix, generated in-row); it is rescaled to
    ≤10⁶ by one truncating division by its max |entry| (Spark div ≡
    DuckDB // — both truncate toward zero); each of the 3 unrolled
    rounds is an exact integer mat-vec (|w| ≤ 64·10¹² — overflow-safe)
    renormalized back to the ±10⁶ grid by w div (max|w| div 10⁶) —
    dividing the DIVISOR first keeps every product inside int64; the
    rayleigh quotient is the documented truncation chain
    Σ(v div 10³)·(w div 10³) div Σ(v div 10³)² — identical in both
    engines, so even the truncation drift is gate-pinned.

    Scale: one corpus exchange (2·64² in-row pair terms feed a
    map-side-combined hash aggregate); every later relation is ≤4096
    rows with broadcast vectors — the iteration cost is independent of
    corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    d = _EMB_DIM
    q = (
        "transform(embedding,"
        " v -> cast(floor(cast(v as double) * 1000000.0) as bigint))"
    )
    # Gram build (r16 optimization round): explode only the ROW index i
    # (d rows per vector, each carrying the quantized array) and compute
    # the d column sums as d wide aggregate expressions — the partial
    # (map-side) aggregation then folds everything into d groups × d sum
    # buffers before the exchange.  The previous form exploded d² =
    # 4096 named_structs per vector into the hash aggregate (measured
    # 10.4 → 2.6 s warm at sf0.1).  Same exact int64 sums, same (i, j,
    # g) relation.
    ex = emb.select(F.expr(q).alias("q")).select(
        F.posexplode("q").alias("i", "qi"), F.col("q")
    )
    gram_wide = ex.groupBy("i").agg(
        *[F.sum(F.col("qi") * F.col("q")[j]).alias(f"g{j}") for j in range(d)]
    )
    # The whole d×d iteration runs IN-ROW (r16 optimization round): the
    # gram collapses to ONE row (transform(array_sort(collect_list))
    # orders the d row-vectors by i) and the 3 unrolled mat-vec rounds +
    # rayleigh are pure array expressions over it.  The previous
    # relational unrolling re-planned and re-scheduled ~10 tiny
    # join/agg/broadcast jobs per run — 11.5 s of fixed overhead for
    # 4096-row relations (measured; the corpus scan itself is ~1 s).
    # Exactness is untouched: every op is the same int64 chain (sums
    # reordered only — int64 addition is associative, and the docstring
    # bound |w| <= 64·10¹² keeps every partial in range); divisor-first
    # rescale, truncating div, and the rayleigh truncation chain are
    # verbatim.  Each intermediate is bound once via the single-element
    # transform(array(..), name -> ..) wrapper, so nothing re-evaluates.
    gg_row = gram_wide.select(
        F.struct(
            F.col("i"),
            F.array(*[F.col(f"g{j}") for j in range(d)]).alias("gr"),
        ).alias("s")
    ).agg(F.expr("transform(array_sort(collect_list(s)), x -> x.gr)").alias("gg"))

    def bind(val: str, name: str, body: str) -> str:
        return f"element_at(transform(array({val}), {name} -> {body}), 1)"

    def matvec(gs: str, v: str) -> str:
        return (
            f"transform({gs}, r -> aggregate(zip_with(r, {v},"
            f" (a, b) -> a * b), 0L, (acc, x) -> acc + x))"
        )

    def maxabs(arr: str) -> str:
        return f"aggregate({arr}, 0L, (m, x) -> greatest(m, abs(x)))"

    def renorm(w: str, wm: str) -> str:
        return f"transform({w}, x -> x div greatest({wm} div {_PCA_S}, 1))"

    v0 = f"transform(sequence(1, {d}), z -> cast({_PCA_S} as bigint))"
    ray = (
        "aggregate(zip_with(vf, wf, (a, b) -> (a div 1000) * (b div 1000)),"
        " 0L, (acc, x) -> acc + x)"
        " div greatest(aggregate(vf, 0L,"
        " (acc, x) -> acc + (x div 1000) * (x div 1000)), 1)"
    )
    body = bind(
        matvec("gs", f"v{_PCA_ROUNDS}"),
        "w4",
        bind(
            f"v{_PCA_ROUNDS}",
            "vf",
            bind(
                "w4",
                "wf",
                f"named_struct('v', vf, 'ray', {ray})",
            ),
        ),
    )
    for k in range(_PCA_ROUNDS, 0, -1):
        prev = f"v{k - 1}" if k > 1 else "v0_"
        body = bind(
            matvec("gs", prev),
            f"w{k}",
            bind(
                renorm(f"w{k}", f"greatest({maxabs(f'w{k}')}, 1)"),
                f"v{k}",
                body,
            ),
        )
    # rescale as g div (gm div S): dividing the DIVISOR first keeps the
    # product out of int64 overflow (g·10^6 can exceed 2^63 at sf0.01);
    # the slightly different truncation is identical in both engines
    expr = bind(
        maxabs("flatten(gg)"),
        "gm",
        bind(
            f"transform(gg, r0 -> transform(r0,"
            f" g -> g div greatest(gm div {_PCA_S}, 1)))",
            "gs",
            bind(v0, "v0_", body),
        ),
    )
    row = gg_row.select(F.expr(expr).alias("res"))
    return row.select(
        F.posexplode("res.v").alias("dim", "component_scaled"),
        F.col("res.ray").alias("rayleigh_scaled"),
    ).orderBy("dim")


def _pca_oracle() -> str:
    d, S, q = _EMB_DIM, _PCA_S, "CAST(floor(CAST(%s AS DOUBLE) * 1000000) AS BIGINT)"
    rounds = []
    prev = "v0"
    for k in range(1, _PCA_ROUNDS + 1):
        rounds.append(f"""
w{k} AS (
    SELECT gs.i, CAST(sum(gs.gs * {prev}.v) AS BIGINT) AS w
    FROM gs JOIN {prev} ON gs.j = {prev}.j GROUP BY gs.i
), wm{k} AS (
    SELECT greatest(max(abs(w)), 1) AS wm FROM w{k}
), v{k} AS (
    SELECT w{k}.i AS j, w{k}.w // greatest(wm{k}.wm // {S}, 1) AS v
    FROM w{k}, wm{k}
)""")
        prev = f"v{k}"
    return f"""
WITH ex AS (
    SELECT g1.i - 1 AS i, g2.j - 1 AS j,
           {q % 'embedding[g1.i]'} * {q % 'embedding[g2.j]'} AS p
    FROM embeddings,
         unnest(generate_series(1, {d})) AS g1(i),
         unnest(generate_series(1, {d})) AS g2(j)
), gram AS (
    SELECT i, j, CAST(sum(p) AS BIGINT) AS g FROM ex GROUP BY i, j
), gmax AS (
    SELECT max(abs(g)) AS gm FROM gram
), gs AS (
    SELECT i, j, g // greatest(gm // {S}, 1) AS gs FROM gram, gmax
), v0 AS (
    SELECT CAST(g.j AS INT) - 1 AS j, CAST({S} AS BIGINT) AS v
    FROM unnest(generate_series(1, {d})) AS g(j)
),{",".join(rounds)},
w4 AS (
    SELECT gs.i, CAST(sum(gs.gs * {prev}.v) AS BIGINT) AS w
    FROM gs JOIN {prev} ON gs.j = {prev}.j GROUP BY gs.i
), vw AS (
    SELECT {prev}.j AS i, {prev}.v, w4.w FROM {prev} JOIN w4 ON {prev}.j = w4.i
), ray AS (
    SELECT CAST(sum((v // 1000) * (w // 1000)) //
                greatest(sum((v // 1000) * (v // 1000)), 1) AS BIGINT)
               AS rayleigh_scaled
    FROM vw
)
SELECT CAST(vw.i AS INT) AS dim,
       CAST(vw.v AS BIGINT) AS component_scaled,
       ray.rayleigh_scaled
FROM vw, ray
ORDER BY dim
"""


ORACLE_embedding_pca_power = _pca_oracle()


# ----------- N26: embedding squared-norm deciles (round 15) ---------------
def embedding_norm_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N26: the norm-distribution audit next to N15's per-dim profile
    and N25's anisotropy probe — norm COLLAPSE (all vectors shrinking
    toward a point) and norm OUTLIERS (a few giants dominating every
    dot product) are the two embedding-quality failures per-dim stats
    average away; the decile curve of vector magnitudes shows both at
    a glance.

    Exactness: magnitudes are SQUARED norms in exact micro²-int64
    (Σ qᵢ² over the micro-quantized vector — no sqrt, no float);
    deciles are P18 count-quantile stages on the ≤|distinct values|
    grid (cumulative counts, (d·n + 9) div 10 ranks), per-decile count
    and mean one IEEE division of exact sums.

    Scale: one in-row fold per vector (no explode), one map-side-
    combined grid aggregate, windows on the bounded distinct-norm
    grid."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    q2 = (
        "aggregate(transform(embedding,"
        " v -> cast(floor(cast(v as double) * 1000000.0) as bigint)),"
        " 0L, (a, x) -> a + x * x)"
    )
    norms = emb.select(F.expr(q2).alias("sq"))
    grid = norms.groupBy("sq").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("sq").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    g = (
        grid.withColumn("n", F.sum("cnt").over(wt))
        .withColumn("cum", F.sum("cnt").over(w))
        .withColumn(
            "decile",
            F.expr(
                "least(9, ((cum - cnt) * 10) div n)"
            ),
        )
    )
    return (
        g.groupBy("decile")
        .agg(
            F.sum("cnt").alias("n_vectors"),
            F.min("sq").alias("min_sq_micro2"),
            F.max("sq").alias("max_sq_micro2"),
            (
                F.sum(F.col("sq") * F.col("cnt")).cast("double")
                / F.sum("cnt").cast("double")
            ).alias("mean_sq_micro2"),
        )
        .orderBy("decile")
    )


ORACLE_embedding_norm_deciles = f"""
WITH norms AS (
    SELECT CAST(list_aggregate(
               list_transform(embedding,
                   v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)
                        * CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)),
               'sum') AS BIGINT) AS sq
    FROM embeddings
), grid AS (
    SELECT sq, count(*) AS cnt FROM norms GROUP BY sq
), g AS (
    SELECT sq, cnt,
           sum(cnt) OVER () AS n,
           sum(cnt) OVER (ORDER BY sq ROWS UNBOUNDED PRECEDING) AS cum
    FROM grid
)
SELECT CAST(least(9, ((cum - cnt) * 10) // n) AS BIGINT) AS decile,
       CAST(sum(cnt) AS BIGINT) AS n_vectors,
       CAST(min(sq) AS BIGINT) AS min_sq_micro2,
       CAST(max(sq) AS BIGINT) AS max_sq_micro2,
       CAST(sum(sq * cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
           AS mean_sq_micro2
FROM g
GROUP BY 1
ORDER BY decile
"""


# ------- N27: pairwise-angle health probe over hash-sampled pairs ---------
_ANGLE_BUCKETS = 256
_ANGLE_SALT = "angle"


def embedding_angle_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N27: the pairwise-cosine HISTOGRAM over a deterministic bounded
    pair sample — the third leg of the embedding-health tripod (N25
    answers "is there one dominant axis", N26 "are the magnitudes
    sane"; this answers "are RANDOM pairs near-orthogonal the way a
    healthy high-dim space is" — representation collapse shows up as
    histogram mass piling into the high-cosine bands long before any
    downstream eval notices).

    Pair sampling is hash-deterministic and BOUNDED: each vector lands
    in one of {_ANGLE_BUCKETS} hash buckets; a bucket contributes
    exactly one pair (its min-id, max-id members) — ≤{_ANGLE_BUCKETS}
    pairs whatever the corpus size, so the probe's cost is a corpus
    scan + a broadcast-joined constant relation, never a self-join.

    Exactness: dot and squared norms are exact int64 over the N25
    micro-quantized vectors (|q| ≤ 5.3e5 ⇒ 64-term dot ≤ 1.8e13);
    cos_ppm = floor(dot·10⁶ / sqrt(na·nb)) with the one sqrt and one
    division in IEEE doubles of exactly-representable ints (the A102
    one-sqrt precedent — correctly-rounded ops, engine-identical);
    bands are cos_ppm div 10⁵ (truncation toward zero, both engines,
    per the N25 div ≡ // note).  Scale: one narrow projection for the
    bucket keys, one ≤{_ANGLE_BUCKETS}-group aggregate, two broadcast
    lookups of the pair ids against the corpus scan."""
    emb = load(spark, sf_dir, "embeddings")
    b = F.pmod(
        T.shared_hash60(
            F.concat(F.lit(f"{_ANGLE_SALT}:"), F.col("vec_id").cast("string"))
        ),
        F.lit(_ANGLE_BUCKETS),
    )
    pairs = (
        emb.select(F.col("vec_id"), b.alias("b"))
        .groupBy("b")
        .agg(F.min("vec_id").alias("ida"), F.max("vec_id").alias("idb"))
        .filter(F.col("ida") != F.col("idb"))
    )
    q = (
        "transform(embedding,"
        " v -> cast(floor(cast(v as double) * 1000000) as bigint))"
    )
    qv = emb.select("vec_id", F.expr(q).alias("q"))
    # two corpus-side lookups against the BROADCAST pair list (never
    # broadcast the corpus: each side of the pair is fished out of the
    # scan by a broadcast join, and the two ≤-bucket-count results meet
    # on the bucket key)
    va = qv.join(
        F.broadcast(pairs.select("b", "ida")),
        qv.vec_id == F.col("ida"),
    ).select("b", F.col("q").alias("qa"))
    vc = qv.join(
        F.broadcast(pairs.select("b", "idb")),
        qv.vec_id == F.col("idb"),
    ).select("b", F.col("q").alias("qc"))
    joined = (
        va.join(F.broadcast(vc), "b")
        .select(
            F.col("b"),
            F.expr(
                "aggregate(zip_with(qa, qc, (x, y) -> x * y),"
                " 0L, (s, x) -> s + x)"
            ).alias("dot"),
            F.expr(
                "aggregate(qa, 0L, (s, x) -> s + x * x)"
            ).alias("na"),
            F.expr(
                "aggregate(qc, 0L, (s, x) -> s + x * x)"
            ).alias("nb"),
        )
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .withColumn(
            "cos_ppm",
            F.expr(
                "cast(floor(cast(dot as double) * 1000000"
                " / sqrt(cast(na as double) * cast(nb as double)))"
                " as bigint)"
            ),
        )
    )
    return (
        joined.select(F.expr("cos_ppm div 100000").alias("band"), "cos_ppm")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("cos_ppm").alias("min_cos_ppm"),
            F.max("cos_ppm").alias("max_cos_ppm"),
        )
        .orderBy("band")
    )


ORACLE_embedding_angle_probe = f"""
WITH keyed AS (
    SELECT vec_id,
           {{h}} % {_ANGLE_BUCKETS} AS b,
           list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS q
    FROM embeddings
), pairs AS (
    SELECT b, min(vec_id) AS ida, max(vec_id) AS idb
    FROM keyed GROUP BY b HAVING min(vec_id) != max(vec_id)
), scored AS (
    SELECT p.b,
           CAST(list_aggregate(
               list_transform(generate_series(1, {_EMB_DIM}),
                              i -> a.q[i] * c.q[i]), 'sum') AS BIGINT) AS dot,
           CAST(list_aggregate(
               list_transform(a.q, x -> x * x), 'sum') AS BIGINT) AS na,
           CAST(list_aggregate(
               list_transform(c.q, x -> x * x), 'sum') AS BIGINT) AS nb
    FROM pairs p
    JOIN keyed a ON a.vec_id = p.ida
    JOIN keyed c ON c.vec_id = p.idb
), cp AS (
    SELECT b, CAST(floor(CAST(dot AS DOUBLE) * 1000000
               / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS BIGINT)
               AS cos_ppm
    FROM scored WHERE na > 0 AND nb > 0
)
SELECT CAST(cos_ppm // 100000 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(cos_ppm) AS BIGINT) AS min_cos_ppm,
       CAST(max(cos_ppm) AS BIGINT) AS max_cos_ppm
FROM cp
GROUP BY 1
ORDER BY band
""".format(h="CAST('0x' || substr(md5('" + _ANGLE_SALT + ":' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)")


# -------- D28: dedup group-size histogram (round 16) ----------------------
def dedup_group_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D28: the duplicate-group SIZE distribution — the planning view
    behind every dedup budget (P21 says WHEN dup mass arrives in scan
    order; this says HOW it clusters: ten thousand pairs are a
    different cleanup job than one 20,000-copy template, at identical
    dup rates), and the shape MinHash banding parameters should be
    tuned against.  Per exact-content group size s: the number of
    groups, the documents they hold, the ppm of the corpus those
    documents are, and the removable ppm ((s−1)/s of them).

    Exactness: group identity is the D1 md5; all counts int64, shares
    truncating ppm.  Scale: one (hash → size) map-side-combined
    aggregate, then a ≤|distinct sizes| histogram aggregate — the
    corpus is touched once, the histogram relation is tiny."""
    docs = load(spark, sf_dir, "documents")
    sizes = (
        docs.select(F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    return (
        sizes.groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("s").alias("n_docs"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("group_size"),
            "n_groups",
            "n_docs",
            F.expr("n_docs * 1000000 div n").alias("docs_ppm"),
            F.expr(
                "(n_docs - n_groups) * 1000000 div n"
            ).alias("removable_ppm"),
        )
        .orderBy("group_size")
    )


ORACLE_dedup_group_histogram = """
WITH sizes AS (
    SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS s
    FROM documents GROUP BY 1
), tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM documents
)
SELECT s AS group_size,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(s) AS BIGINT) AS n_docs,
       CAST(sum(s) * 1000000 // n AS BIGINT) AS docs_ppm,
       CAST((sum(s) - count(*)) * 1000000 // n AS BIGINT)
           AS removable_ppm
FROM sizes, tot
GROUP BY s, n
ORDER BY group_size
"""
