"""Quantized k-means semantics on hand-built fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import clustering as KM


@pytest.fixture(scope="module")
def emb(spark):
    # two tight groups far apart; vec_id 0 and 1 seed the two clusters
    rows = [
        (0, [0.0, 0.0, 0.1]),
        (1, [1.0, 1.0, 0.9]),
        (2, [0.05, -0.02, 0.0]),
        (3, [0.98, 1.02, 1.0]),
        (4, [0.01, 0.03, 0.05]),
        (5, [1.05, 0.97, 1.01]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_kmeans_separates_obvious_groups(emb):
    out = {
        r["vec_id"]: r["cluster"]
        for r in KM.embedding_kmeans(emb, k=2, iters=2).collect()
    }
    assert out[0] == out[2] == out[4]
    assert out[1] == out[3] == out[5]
    assert out[0] != out[1]


def test_kmeans_refinement_does_not_worsen_cost(emb):
    # Lloyd invariant: total within-cluster cost is non-increasing (exact
    # integer arithmetic keeps this clean; the truncating mean can only
    # perturb below quantization resolution)
    def cost(iters):
        return (
            KM.embedding_kmeans(emb, k=2, iters=iters)
            .agg(F.sum("dist_q"))
            .collect()[0][0]
        )

    assert cost(1) <= cost(0)
    assert cost(2) <= cost(1)


def test_kmeans_deterministic_across_runs(emb):
    a = sorted(map(tuple, KM.embedding_kmeans(emb, k=2, iters=2).collect()))
    b = sorted(map(tuple, KM.embedding_kmeans(emb, k=2, iters=2).collect()))
    assert a == b


def test_assign_tie_breaks_to_lowest_cluster(spark):
    # a point equidistant from two centroids must go to the lower cluster id
    rows = [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    q = KM.quantize(emb)
    cents = q.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cluster"), F.col("qv").alias("cv")
    )
    out = {r["vec_id"]: r for r in KM.kmeans_assign(q, cents, k=2).collect()}
    assert out[2]["cluster"] == 0
    assert out[2]["dist_q"] == 10**12  # (1.0 * 1e6)^2 exactly — quantization is exact


def test_update_truncating_mean_exact(spark):
    # centroid of quantized [1, 2] and [2, 3] is [1, 2] under trunc division
    rows = [(0, 0, [1, 2]), (1, 0, [2, 3])]
    assigned = spark.createDataFrame(rows, ["vec_id", "cluster", "qv"]).withColumn(
        "qv", F.col("qv").cast("array<long>")
    )
    cents = {r["cluster"]: r["cv"] for r in KM.kmeans_update(assigned).collect()}
    assert cents[0] == [1, 2]  # (1+2)//2, (2+3)//2
