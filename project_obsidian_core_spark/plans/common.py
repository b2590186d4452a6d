"""Shared helpers for the driver-facing query plans.

Cross-engine determinism rules (Spark result must value-hash-match the DuckDB
oracle):

- **Money/metric arithmetic in scaled integers.** Testdata money columns are
  exact 2-decimal doubles; ``round(x*100)`` -> BIGINT is exact in both
  engines, integer sums are order-independent, and any derived double is then
  a deterministic int->double division. Never hash a parallel double SUM —
  summation order differs between engines.
- **Timestamps**: session timezone pinned to UTC so Spark's instant rendering
  matches DuckDB's naive-UTC timestamps; sub-second arithmetic via
  ``unix_micros`` (Spark) / ``epoch_us`` (DuckDB), both exact BIGINT.
- **Top-N**: every LIMIT is preceded by an ORDER BY with a unique tiebreaker.
- DuckDB ``SUM(BIGINT)`` returns HUGEINT — every oracle casts sums back to
  BIGINT to match Spark's LongType.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Timestamp columns stored as parquet TIMESTAMP(NANOS) — Spark rejects the
#: type outright, so they are read as ns-longs (legacy.parquet.nanosAsLong)
#: and truncated to µs timestamps here. DuckDB 1.0 reads the same files as
#: µs TIMESTAMP (ns silently truncated), so this conversion is exactly
#: value- and order-equivalent to what the oracle sees.
_NANOS_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "customer": (),
}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with cross-engine session settings pinned."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _NANOS_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            # ns -> µs must be integer division: ns epoch values exceed 2^53,
            # so a double roundtrip would corrupt the low bits.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def cents(col: Column | str, scale: int = 100) -> Column:
    """Exact scaled-integer form of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale, 0).cast("long")
