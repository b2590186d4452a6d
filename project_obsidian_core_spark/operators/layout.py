"""Multi-dimensional data-layout optimization: Z-order (Morton) clustering.

The reference prunes on time via Druid segment granularity (SURVEY §2.1
S9/S10 hour partitions); a lakehouse at 100 TB also needs MULTI-column
skipping — "orders for customer range X in date range Y" must not scan
either dimension fully. Sorting by one column gives perfect min/max
pruning on that column and none on the others; interleaving the bits of
several quantized columns (a Z-order / Morton curve, the technique behind
Delta Lake's ``OPTIMIZE ZORDER BY``) makes every file's min/max tight on
EVERY participating column, so parquet row-group stats prune
multi-dimensional boxes.

All arithmetic is integer-exact and engine-neutral: the same quantize +
interleave formula is emitted as a Spark JVM expression and as the DuckDB
oracle SQL, so the layout key itself is oracle-gated like any operator.

Scale notes
-----------
- ``zorder_value`` is a per-row expression — a narrow map, whole-stage
  codegen, no shuffle, no Python.
- ``write_zordered`` pays ONE range shuffle on the z-value (the same
  shuffle any global sort pays) and writes files whose row groups are
  axis-aligned boxes in the quantized space; subsequent reads prune with
  plain pushed-down min/max filters — no reader-side cooperation needed.
- The quantization bounds (lo, hi) are a layout parameter, not a data
  contract: values outside clamp to the edge cells, which only weakens
  pruning for those rows, never correctness.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits per dimension (2 dims -> 32-bit z values).
ZORDER_BITS = 16


def _quant_sql(col: str, lo: int, hi: int, bits: int, div: str) -> str:
    """Integer quantization of ``col`` into [0, 2^bits): scale the clamped
    value over [lo, hi] — exact integer arithmetic, identical under Spark's
    ``div`` and DuckDB's ``//``."""
    maxq = (1 << bits) - 1
    scaled = f"((({col}) - {lo}) * {maxq}) {div} ({hi} - {lo})"
    return f"greatest(0, least({maxq}, {scaled}))"


def _interleave_sql(qs: Sequence[str], bits: int, shift1: str) -> str:
    """Bit interleave of quantized values: bit i of dim j lands at position
    i*ndims + j. ``shift1`` is the engine's single-bit extractor template
    (Spark ``shiftright``, DuckDB ``>>``)."""
    n = len(qs)
    terms = []
    for i in range(bits):
        for j, q in enumerate(qs):
            weight = 1 << (i * n + j)
            terms.append(f"({shift1.format(q=q, i=i)} & 1) * {weight}")
    return " + ".join(terms)


def zorder_sql(
    cols: Sequence[tuple[str, int, int]], bits: int = ZORDER_BITS
) -> str:
    """Spark SQL expression for the z-value of ``cols`` = [(name, lo, hi)]."""
    qs = [
        f"cast({_quant_sql(c, lo, hi, bits, 'div')} as bigint)"
        for c, lo, hi in cols
    ]
    return f"cast({_interleave_sql(qs, bits, 'shiftright({q}, {i})')} as bigint)"


def sql_zorder_value(
    cols: Sequence[tuple[str, int, int]], bits: int = ZORDER_BITS
) -> str:
    """DuckDB twin of :func:`zorder_sql` — same quantize + interleave."""
    qs = [
        f"CAST({_quant_sql(c, lo, hi, bits, '//')} AS BIGINT)"
        for c, lo, hi in cols
    ]
    return f"CAST({_interleave_sql(qs, bits, '(({q}) >> {i})')} AS BIGINT)"


def zorder_value(
    cols: Sequence[tuple[str, int, int]], bits: int = ZORDER_BITS
) -> Column:
    """Z-order key as a per-row JVM column expression."""
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError("bits * ndims must fit a signed 64-bit value")
    return F.expr(zorder_sql(cols, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[str, int, int]],
    bits: int = ZORDER_BITS,
    n_files: int = 32,
) -> None:
    """Publish ``df`` as parquet clustered along the z-curve of ``cols``:
    one range shuffle on the z-value, files sorted within, the helper
    column dropped before write (the point is tight min/max stats on the
    ORIGINAL columns — readers need no special key)."""
    z = df.withColumn("_z", zorder_value(cols, bits))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
