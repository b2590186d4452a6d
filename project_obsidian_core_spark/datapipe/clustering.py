"""Embedding clustering: quantized-integer Lloyd k-means.

The corpus-organization pass a pretraining pipeline runs over document
embeddings (semantic dedup sharding, domain mixture analysis, cluster-
balanced sampling): assign every vector to one of K centroids, refine the
centroids by Lloyd iteration, emit the final assignment.

Why integer quantization
------------------------
A float centroid mean is a *parallel* double sum — its value depends on
partition boundaries and reduce order, so two runs (or two engines) disagree
at ULP level and every downstream tie flips. Quantizing each coordinate to
``round(x · 10⁶)`` int64 makes every Lloyd step exact integer arithmetic:
distances, argmins, sums and the truncating mean are bit-identical on any
cluster layout and in any engine. 10⁻⁶ resolution is far below embedding
noise; the sums fit comfortably (|q| ≤ 2·10⁶, dim 64 → Σq² ≤ 2.6·10¹⁴).

Scale notes
-----------
- Assignment is shuffle-free: the K×dim centroid relation is aggregated to
  ONE collected row and broadcast; each vector computes its argmin inline
  (K·dim integer ops per row inside codegen).
- The ties rule is encoded in the argmin key ``dist·K + cluster``: a single
  int64 min — no struct comparison, no nondeterministic ``arg_min``.
- The centroid update is the only shuffle: posexplode to (cluster, dim)
  rows → partial-aggregated sums over a K·dim-sized key space — tiny.
- Each Lloyd iteration re-scans the corpus (inherent to k-means). The plan
  is kept pure/declarative; at 100 TB you'd persist the quantized relation
  once and localCheckpoint per round like datapipe.dedup.dedup_clusters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: number of clusters (seeds = vectors with vec_id < K)
KMEANS_K = 8

#: embedding dimensionality of the testdata corpus
KMEANS_DIM = 64

#: quantization scale: coordinate → round(x · SCALE) as int64
KMEANS_SCALE = 1_000_000

#: Lloyd refinement rounds before the final assignment
KMEANS_ITERS = 2


def quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, qv): each float32 coordinate → round(x·SCALE) int64."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * KMEANS_SCALE).cast("long"),
    )
    return df.select("vec_id", qv.alias("qv"))


def _qdist(a: Column, b: Column) -> Column:
    """Σ (a_i − b_i)² — exact int64 (order-free: integer addition)."""
    sq = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, x: acc + x)


def kmeans_assign(q: DataFrame, centroids: DataFrame, k: int = KMEANS_K) -> DataFrame:
    """Nearest-centroid assignment, shuffle-free.

    Centroids collapse to one row ``[(cluster, cv), …]`` (sorted for plan
    determinism, though the int argmin key makes order irrelevant) that
    broadcasts; the per-row argmin key is ``dist·K + cluster`` so ties break
    toward the lowest cluster id as a pure int64 min.
    """
    cents = centroids.agg(
        F.sort_array(F.collect_list(F.struct("cluster", "cv"))).alias("_cents")
    )
    key = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: _qdist(F.col("qv"), c.getField("cv")) * k + c.getField("cluster"),
        )
    )
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn("_key", key)
        .select(
            "vec_id",
            "qv",
            (F.col("_key") % k).alias("cluster"),
            F.expr(f"(_key - _key % {k}) div {k}").alias("dist_q"),
        )
    )


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """New centroids: per-(cluster, dim) integer sums, truncating mean.

    ``(s − s % n) div n`` is exact integer division (s − s%n is divisible),
    identical under Spark ``div`` and DuckDB ``//`` — no float mean ever.
    """
    ex = assigned.select("cluster", F.posexplode("qv").alias("pos", "val"))
    sums = ex.groupBy("cluster", "pos").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mean = sums.withColumn("m", F.expr("(s - s % n) div n"))
    return mean.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda x: x.getField("m"),
        ).alias("cv")
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    vec_col: str = "embedding",
) -> DataFrame:
    """The final (cluster, cv) centroid relation after ``iters`` Lloyd
    rounds — the learned coarse quantizer other operators (IVF search)
    build on. Seeds are the vectors with ``vec_id < k``."""
    q = quantize(emb, vec_col)
    centroids = q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), F.col("qv").alias("cv")
    )
    for _ in range(iters):
        centroids = kmeans_update(kmeans_assign(q, centroids, k))
    return centroids


def embedding_kmeans(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means over quantized embeddings; returns the assignment under
    the final centroids: (vec_id, cluster, dist_q).

    Seeds are the vectors with ``vec_id < k`` (deterministic, like
    similarity.ivf_seeds' min-vec_id rule). ``iters`` assign+update rounds,
    then one final assignment.
    """
    q = quantize(emb, vec_col)
    centroids = kmeans_centroids(emb, k, iters, vec_col)
    return kmeans_assign(q, centroids, k).select("vec_id", "cluster", "dist_q")
