"""Driver-facing wrapper for quantized k-means, with a generated oracle.

The oracle unrolls the Lloyd iterations into a CTE chain built from the
SAME constants (K, dim, scale, iteration count) as the Spark operator.
Everything after quantization is exact integer arithmetic, so the two
engines agree bit-for-bit — see datapipe/clustering.py for why a float
centroid mean could never be oracle-checked this way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from project_obsidian_core_spark.datapipe import clustering as KM
from project_obsidian_core_spark.plans.common import load


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized Lloyd k-means assignment over the embeddings table."""
    return KM.embedding_kmeans(load(spark, sf_dir, "embeddings")).orderBy("vec_id")


def kmeans_cte_parts(train_pred: str | None = None) -> tuple[list[str], int]:
    """The Lloyd-iteration CTE chain (shared with the IVF-kmeans oracle):
    returns (parts, final_assignment_index) where ``a{final}`` holds the
    final int64 argmin keys and ``c{iters}`` the final centroids.

    ``train_pred`` (SQL over ``vec_id``) restricts quantizer TRAINING to a
    subset — seeds, refinement assignments, and centroid updates see only
    matching rows, while the FINAL assignment still covers every row
    (frozen-centroid incremental indexing). Default None trains on the
    full relation and generates the exact SQL this function always has."""
    k, dim, scale, iters = (
        KM.KMEANS_K,
        KM.KMEANS_DIM,
        KM.KMEANS_SCALE,
        KM.KMEANS_ITERS,
    )
    dist = (
        f"CAST(list_sum([(v.qv[j] - c.cv[j]) * (v.qv[j] - c.cv[j]) "
        f"FOR j IN generate_series(1, {dim})]) AS BIGINT)"
    )
    parts = [
        f"""q AS (
    SELECT vec_id,
           [CAST(round(CAST(e AS DOUBLE) * {scale}) AS BIGINT) FOR e IN embedding] AS qv
    FROM embeddings
)""",
    ]
    train = "q"
    if train_pred is not None:
        parts.append(f"qt AS (\n    SELECT * FROM q WHERE {train_pred}\n)")
        train = "qt"
    parts.append(
        f"""c0 AS (
    SELECT vec_id AS cluster, qv AS cv FROM {train} WHERE vec_id < {k}
)"""
    )
    for i in range(1, iters + 2):  # iters refinements + the final assignment
        # refinement assignments see only the training rows; the FINAL
        # assignment (i == iters+1) covers the full relation
        src = train if i <= iters else "q"
        parts.append(
            f"""a{i} AS (
    SELECT v.vec_id, min({dist} * {k} + c.cluster) AS key
    FROM {src} v CROSS JOIN c{i - 1} c
    GROUP BY v.vec_id
)"""
        )
        if i <= iters:
            parts.append(
                f"""e{i} AS (
    SELECT CAST(a.key % {k} AS BIGINT) AS cluster, g.j AS pos, q.qv[g.j] AS val
    FROM a{i} a JOIN q USING (vec_id)
    CROSS JOIN generate_series(1, {dim}) AS g(j)
)"""
            )
            parts.append(
                f"""c{i} AS (
    SELECT cluster, list(CAST((s - s % n) // n AS BIGINT) ORDER BY pos) AS cv
    FROM (
        SELECT cluster, pos, sum(val) AS s, count(*) AS n
        FROM e{i} GROUP BY cluster, pos
    ) GROUP BY cluster
)"""
            )
    return parts, iters + 1


def _kmeans_oracle() -> str:
    k = KM.KMEANS_K
    parts, final = kmeans_cte_parts()
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id,
       CAST(key % {k} AS BIGINT) AS cluster,
       CAST((key - key % {k}) // {k} AS BIGINT) AS dist_q
FROM a{final}
ORDER BY vec_id
"""
    )


ORACLE_embedding_kmeans = _kmeans_oracle()
