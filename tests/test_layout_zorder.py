"""Z-order layout key semantics: exact Morton interleave vs a pure-Python
reference, clamping, and the clustered-write round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.operators import layout as L


def _py_z(vals, bounds, bits):
    """Pure-Python reference: quantize + interleave."""
    maxq = (1 << bits) - 1
    z = 0
    n = len(vals)
    for j, (v, (lo, hi)) in enumerate(zip(vals, bounds)):
        q = max(0, min(maxq, (v - lo) * maxq // (hi - lo)))
        for i in range(bits):
            z |= ((q >> i) & 1) << (i * n + j)
    return z


def test_zorder_value_matches_python_reference(spark):
    bounds = [(0, 16), (0, 256)]
    cols = [("x", 0, 16), ("y", 0, 256)]
    rows = [(0, 0), (15, 255), (3, 7), (8, 128), (1, 200), (-5, 999)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", L.zorder_value(cols, bits=4)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_z((x, y), bounds, 4), (x, y)
    # clamping: out-of-range lands on edge cells, never errors
    assert got[(-5, 999)] == _py_z((-5, 999), bounds, 4)


def test_zorder_value_validates_geometry(spark):
    with pytest.raises(ValueError):
        L.zorder_value([])
    with pytest.raises(ValueError):
        L.zorder_value([("a", 0, 1)] * 4, bits=16)  # 64 > 62


def test_write_zordered_round_trip(spark, tmp_path):
    df = spark.range(1000).select(
        (F.col("id") % 37).alias("x"), (F.col("id") * 7 % 101).alias("y")
    )
    path = str(tmp_path / "zdata")
    L.write_zordered(
        df, path, [("x", 0, 37), ("y", 0, 101)], bits=8, n_files=4
    )
    back = spark.read.parquet(path)
    assert back.columns == ["x", "y"]  # helper column dropped
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
