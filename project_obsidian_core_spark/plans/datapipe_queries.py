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


# ------------------------------------------------------------- token stats
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) over documents."""
    return T.with_token_stats(load(spark, sf_dir, "documents")).orderBy("doc_id")


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
    return T.with_quality_score(load(spark, sf_dir, "documents")).orderBy("doc_id")


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
    return T.with_lang_id(load(spark, sf_dir, "documents")).orderBy("doc_id")


def _lang_oracle() -> str:
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
    return f"""
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
ORDER BY doc_id
"""


ORACLE_text_lang_id = _lang_oracle()


# -------------------------------------------------------------- fingerprint
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-gram min-hash content fingerprint per document."""
    return T.with_fingerprint(load(spark, sf_dir, "documents")).orderBy("doc_id")


_K = T.FINGERPRINT_K
ORACLE_text_fingerprint = f"""
WITH n AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS norm
    FROM documents
)
SELECT doc_id,
       length(norm) AS norm_len,
       CASE WHEN length(norm) >= {_K}
            THEN list_aggregate(
                [CAST('0x' || substr(md5(substring(norm, i, {_K})), 1, 15) AS BIGINT)
                 for i in generate_series(1, greatest(length(norm) - {_K - 1}, 1))],
                'min')
            ELSE CAST('0x' || substr(md5(norm), 1, 15) AS BIGINT)
       END AS fingerprint
FROM n
ORDER BY doc_id
"""
