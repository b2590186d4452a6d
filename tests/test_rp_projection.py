"""N13 JL sign projection — numpy golden, scale invariance, one-hot rows."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import similarity as S
from project_obsidian_core_spark.datapipe import vectors as V


def test_projection_matches_numpy(spark):
    d_in, d_out = 8, 3
    signs = S.rp_signs(d_in, d_out)
    vec = [0.5, -1.25, 3.0, 0.0, 2.5, -0.75, 1.0, 4.0]
    df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
    got = df.select(
        S.rp_project(F.col("embedding"), signs).alias("p")
    ).collect()[0].p
    want = (np.array(signs, dtype=float) @ np.array(vec)).tolist()
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_one_hot_recovers_sign_column(spark):
    d_in, d_out = 6, 4
    signs = S.rp_signs(d_in, d_out)
    for i in range(d_in):
        vec = [0.0] * d_in
        vec[i] = 1.0
        df = spark.createDataFrame([(1, vec)], ["vec_id", "embedding"])
        got = df.select(
            S.rp_project(F.col("embedding"), signs).alias("p")
        ).collect()[0].p
        assert got == [float(row[i]) for row in signs]


def test_cosine_is_scale_invariant_in_reduced_space(spark):
    signs = S.rp_signs(8, 4)
    v = [1.0, 2.0, -3.0, 0.5, 1.5, -0.25, 2.25, -1.0]
    df = spark.createDataFrame(
        [(1, v), (2, [2 * x for x in v])], ["vec_id", "embedding"]
    )
    p = df.select(
        "vec_id", S.rp_project(F.col("embedding"), signs).alias("p")
    )
    a, b = p.alias("a"), p.alias("b")
    cos = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(V.cosine(F.col("a.p"), F.col("b.p")).alias("c"))
        .collect()[0]
        .c
    )
    assert abs(cos - 1.0) < 1e-12


def test_matrix_is_deterministic_and_pm_one():
    s1 = S.rp_signs(64, 16)
    s2 = S.rp_signs(64, 16)
    assert s1 == s2
    assert all(v in (-1, 1) for row in s1 for v in row)
