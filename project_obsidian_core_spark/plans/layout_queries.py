"""Driver-gated wrapper for the Z-order layout key
(:mod:`operators.layout`): the quantize+interleave arithmetic is emitted
identically as a Spark JVM expression and as DuckDB SQL, so the layout
key every z-clustered write depends on is oracle-gated bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.operators import layout as L
from project_obsidian_core_spark.plans.common import cents, load

#: layout geometry for the gate query: 12 bits/dim, 2 dims -> 24-bit z.
_Z_BITS = 12
#: quantization bounds (layout params — out-of-range clamps to edge cells).
_CUST_LO, _CUST_HI = 0, 200_000
_PRICE_LO, _PRICE_HI = 0, 60_000_000
#: aggregate over the top-8-bit z prefix (256 curve cells).
_PREFIX_SHIFT = 16

_Z_COLS = [
    ("o_custkey", _CUST_LO, _CUST_HI),
    ("price_cents", _PRICE_LO, _PRICE_HI),
]


def orders_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-curve cell statistics over orders keyed by (custkey, price):
    per top-8-bit z prefix, the row count and the min/max of BOTH source
    dimensions — exactly the per-file stats a z-clustered write exposes to
    min/max pruning (tight boxes on every dimension, pinned by the
    zorder soak in SCALE.md). Narrow map + one small aggregate."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", cents("o_totalprice").alias("price_cents")
    )
    z = orders.withColumn("z", L.zorder_value(_Z_COLS, _Z_BITS))
    return (
        z.groupBy(
            F.expr(f"z div {1 << _PREFIX_SHIFT}").alias("z_cell")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("price_cents").alias("min_price"),
            F.max("price_cents").alias("max_price"),
        )
        .orderBy("z_cell")
    )


ORACLE_orders_zorder_stats = f"""
WITH o AS (
    SELECT o_custkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
    FROM orders
), z AS (
    SELECT o_custkey, price_cents,
           {L.sql_zorder_value(_Z_COLS, _Z_BITS)} AS z
    FROM o
)
SELECT z // {1 << _PREFIX_SHIFT} AS z_cell,
       count(*) AS n_rows,
       min(o_custkey) AS min_cust,
       max(o_custkey) AS max_cust,
       min(price_cents) AS min_price,
       max(price_cents) AS max_price
FROM z
GROUP BY 1
ORDER BY 1
"""
