"""Driver-facing wrapper for BPE merge learning, with an unrolled oracle.

The oracle unrolls the merge rounds into a CTE chain generated from the
same constants. The merge step is the same indexed comprehension as the
Spark operator — including the self-pair (a == b) run-parity branch, so
both engines implement standard left-to-right greedy BPE; each round's
winner is the (total desc, pair asc) top-1 — a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from project_obsidian_core_spark.datapipe import bpe as B
from project_obsidian_core_spark.plans.common import load


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE_ROUNDS merges from the documents word-frequency table."""
    return B.learn_merges(load(spark, sf_dir, "documents")).orderBy("round")


def _round_ctes(r: int) -> str:
    """CTEs for round r: pair counts over s{r-1}, top-1 t{r}, merged s{r}.

    The merge comprehension mirrors ``bpe.apply_merge`` exactly: a
    self-pair (lft = rgt) branch using run parity (distance to the last
    non-`lft` symbol), and the local non-self branch otherwise.
    """
    prev, cur = f"s{r - 1}", f"s{r}"
    return f"""p{r} AS (
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS total
    FROM (
        SELECT cnt,
               unnest([seg[i] || ' ' || seg[i + 1]
                       FOR i IN generate_series(1, len(seg) - 1)]) AS pair
        FROM {prev}
    )
    GROUP BY pair
), t{r} AS (
    SELECT pair, total,
           string_split(pair, ' ')[1] AS lft,
           string_split(pair, ' ')[2] AS rgt
    FROM p{r} ORDER BY total DESC, pair LIMIT 1
), {cur} AS (
    SELECT word, cnt,
           list_filter(
               [CASE WHEN lft = rgt THEN
                     CASE WHEN seg[i] <> lft THEN seg[i]
                          WHEN (i - coalesce(list_max(list_filter(
                                   generate_series(1, i), j -> seg[j] <> lft)), 0) - 1)
                               % 2 = 1
                          THEN NULL
                          WHEN i < len(seg) AND seg[i + 1] = lft THEN lft || rgt
                          ELSE seg[i] END
                ELSE
                     CASE WHEN i > 1 AND seg[i - 1] = lft AND seg[i] = rgt
                          THEN NULL
                          WHEN i < len(seg) AND seg[i] = lft AND seg[i + 1] = rgt
                          THEN lft || rgt
                          ELSE seg[i] END
                END
                FOR i IN generate_series(1, len(seg))],
               x -> x IS NOT NULL) AS seg
    FROM {prev} CROSS JOIN t{r}
)"""


def _bpe_oracle() -> str:
    rounds = B.BPE_ROUNDS
    ctes = [
        """wc AS (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
), s0 AS (
    SELECT word, cnt, string_split(word, '') AS seg FROM wc
)"""
    ]
    ctes += [_round_ctes(r) for r in range(1, rounds + 1)]
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, pair, total FROM t{r}" for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{union}\nORDER BY round\n"


ORACLE_bpe_merges = _bpe_oracle()


# ----------------------------------------------------------- BPE encoding
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the learned merges."""
    return B.encode_stats(load(spark, sf_dir, "documents")).orderBy("doc_id")


def _encode_oracle() -> str:
    rounds = B.BPE_ROUNDS
    base = ORACLE_bpe_merges
    # reuse everything up to the final union, then encode against s{rounds}
    ctes = base[len("WITH ") : base.index("\nSELECT 1 AS round")]
    return f"""WITH {ctes},
wt AS (
    SELECT word, CAST(len(seg) AS BIGINT) AS word_tokens FROM s{rounds}
),
dw AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT doc_id, count(*) AS n_words,
       CAST(sum(word_tokens) AS BIGINT) AS n_bpe_tokens
FROM dw JOIN wt USING (word)
GROUP BY doc_id
ORDER BY doc_id
"""


ORACLE_bpe_encode_stats = _encode_oracle()
