"""Driver-facing product-quantization ANN query + generated oracle.

The oracle unrolls the SAME construction as datapipe/similarity.py's
PQ/ADC path from the same constants: per-subspace quantized-Lloyd codebook
CTE chains (one per subspace, PQ_ITERS refinements each), the code
assignment, the per-query distance tables, and the ADC sum — all exact
int64 arithmetic, so Spark and DuckDB hash bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import clustering as KM
from project_obsidian_core_spark.datapipe import similarity as S
from project_obsidian_core_spark.plans.common import load

_N_QUERY_VECS = 5
_TOPK = 10


def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN: learn per-subspace codebooks, encode the corpus
    to M small codes, answer top-k by asymmetric distance computation."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    return S.pq_adc_topk(emb, q, k=_TOPK).orderBy("q_id", "rank")


def _pq_oracle() -> str:
    m_cnt, sub, ksub, iters = S.PQ_M, S.PQ_SUBDIM, S.PQ_KSUB, S.PQ_ITERS
    scale = KM.KMEANS_SCALE
    dist = (
        f"CAST(list_sum([(v.qv[j] - c.cv[j]) * (v.qv[j] - c.cv[j]) "
        f"FOR j IN generate_series(1, {sub})]) AS BIGINT)"
    )
    parts = [
        f"""q AS (
    SELECT vec_id,
           [CAST(round(CAST(e AS DOUBLE) * {scale}) AS BIGINT) FOR e IN embedding] AS qv
    FROM embeddings
)"""
    ]
    final = iters + 1
    for m in range(m_cnt):
        a, b = m * sub + 1, (m + 1) * sub
        parts.append(
            f"""qm{m} AS (
    SELECT vec_id, qv[{a}:{b}] AS qv FROM q
)"""
        )
        parts.append(
            f"""c0_{m} AS (
    SELECT vec_id AS cluster, qv AS cv FROM qm{m} WHERE vec_id < {ksub}
)"""
        )
        for i in range(1, final + 1):
            parts.append(
                f"""a{i}_{m} AS (
    SELECT v.vec_id, min({dist} * {ksub} + c.cluster) AS key
    FROM qm{m} v CROSS JOIN c{i - 1}_{m} c
    GROUP BY v.vec_id
)"""
            )
            if i <= iters:
                parts.append(
                    f"""e{i}_{m} AS (
    SELECT CAST(a.key % {ksub} AS BIGINT) AS cluster, g.j AS pos, v.qv[g.j] AS val
    FROM a{i}_{m} a JOIN qm{m} v USING (vec_id)
    CROSS JOIN generate_series(1, {sub}) AS g(j)
)"""
                )
                parts.append(
                    f"""c{i}_{m} AS (
    SELECT cluster, list(CAST((s - s % n) // n AS BIGINT) ORDER BY pos) AS cv
    FROM (
        SELECT cluster, pos, sum(val) AS s, count(*) AS n
        FROM e{i}_{m} GROUP BY cluster, pos
    ) GROUP BY cluster
)"""
                )
    code_joins = " ".join(
        f"JOIN a{final}_{m} s{m} ON s{m}.vec_id = q.vec_id" for m in range(m_cnt)
    )
    code_list = ", ".join(f"CAST(s{m}.key % {ksub} AS BIGINT)" for m in range(m_cnt))
    parts.append(
        f"""codes AS (
    SELECT q.vec_id, [{code_list}] AS codes
    FROM q {code_joins}
)"""
    )
    dt_branches = "\n    UNION ALL\n".join(
        f"""    SELECT v.vec_id AS q_id, {m} AS m, c.cluster, {dist} AS d
    FROM qm{m} v CROSS JOIN c{final - 1}_{m} c
    WHERE v.vec_id < {_N_QUERY_VECS}"""
        for m in range(m_cnt)
    )
    parts.append(f"""dt AS (\n{dt_branches}\n)""")
    parts.append(
        f"""adist AS (
    SELECT dt.q_id, codes.vec_id AS cand_id, CAST(sum(dt.d) AS BIGINT) AS adist_q
    FROM codes JOIN dt
      ON dt.cluster = codes.codes[dt.m + 1] AND dt.q_id != codes.vec_id
    GROUP BY dt.q_id, codes.vec_id
)"""
    )
    parts.append(
        """ranked AS (
    SELECT q_id, cand_id, adist_q,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adist_q ASC, cand_id ASC) AS rank
    FROM adist
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT q_id, cand_id, adist_q, rank FROM ranked
WHERE rank <= {_TOPK}
ORDER BY q_id, rank
"""
    )


ORACLE_knn_pq_adc = _pq_oracle()
