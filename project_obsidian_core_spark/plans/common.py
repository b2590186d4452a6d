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

#: Timestamp columns whose parquet encoding varies across testdata
#: generations: TIMESTAMP(NANOS) (read as ns-longs via
#: legacy.parquet.nanosAsLong, truncated to µs here) or TIMESTAMP(MICROS,
#: isAdjustedToUTC=false) (read as TIMESTAMP_NTZ, cast to the session-UTC
#: instant type here). Both normalizations yield the identical µs TIMESTAMP
#: column DuckDB sees when reading the same files, so every downstream
#: query and oracle is encoding-agnostic.
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
        elif dtypes.get(c) == "timestamp_ntz":
            # naive µs -> instant; session TZ is pinned UTC above, so the
            # wall-clock value is preserved exactly.
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def cents(col: Column | str, scale: int = 100) -> Column:
    """Exact scaled-integer form of a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale, 0).cast("long")
