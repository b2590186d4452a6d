"""Vector (embedding) column expressions shared by dedup + similarity search.

All arithmetic is float64 with a fixed left-fold order so results are
bit-identical to the DuckDB oracle's ``list_reduce`` (also a left fold):
cast each float32 element to double *before* multiplying, accumulate
ascending by index. Division and sqrt are IEEE-deterministic.

Everything is a per-row JVM array expression — no UDF, no Python, pipelined
with the scan; at 100 TB the cost model is exactly `dim` fused multiply-adds
per row inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a deterministic double left-fold."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine when norms were precomputed once per vector (the join-efficient
    form: norm is computed at scan, not per candidate pair)."""
    return dot_col / (norm_a * norm_b)


def sql_dot(a: str, b: str, dim: int) -> str:
    """DuckDB mirror of :func:`dot` — identical element order + fold."""
    return (
        f"list_reduce([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in generate_series(1, {dim})], (x, y) -> x + y)"
    )


def sql_norm(a: str, dim: int) -> str:
    return f"sqrt({sql_dot(a, a, dim)})"
