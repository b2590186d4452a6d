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


# ----------------------------------------------------------- DQ report ---
def orders_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders
    (:func:`operators.quality.dq_report`): null / range / enum /
    uniqueness contracts, all exact counts in one scan + one reduce
    (uniqueness adds its distinct shuffle)."""
    from project_obsidian_core_spark.operators.quality import dq_report

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        cents("o_totalprice").alias("price_cents"),
    )
    return dq_report(
        orders,
        [
            ("not_null", "o_custkey"),
            ("range", "price_cents", 0, 60_000_000),
            ("in_set", "o_orderstatus", ["O", "F", "P"]),
            ("unique", "o_orderkey"),
        ],
    ).orderBy("rule")


ORACLE_orders_dq_report = """
WITH o AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
    FROM orders
), a AS (
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS v_not_null,
           CAST(sum(CASE WHEN price_cents IS NULL OR price_cents < 0
                         OR price_cents > 60000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS v_range,
           CAST(sum(CASE WHEN o_orderstatus IS NULL
                         OR o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_in_set,
           CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
               AS v_unique
    FROM o
)
SELECT rule, n_violations, n_rows FROM (
    SELECT 'not_null:o_custkey' AS rule, v_not_null AS n_violations, n_rows FROM a
    UNION ALL
    SELECT 'range:price_cents', v_range, n_rows FROM a
    UNION ALL
    SELECT 'in_set:o_orderstatus', v_in_set, n_rows FROM a
    UNION ALL
    SELECT 'unique:o_orderkey', v_unique, n_rows FROM a
)
ORDER BY rule
"""


# ----------------------------------------------- bucketed co-located join --
#: bucket count for the gate tables (matches both sides — the elision rule).
_N_BUCKETS = 8
#: external-table location; per-sf so sf0.01 gate runs and sf0.1 bench runs
#: cannot clobber each other's layout.
_BUCKET_ROOT = "/tmp/spark_graft_bucketed"


def orders_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 oracle gate: the exchange-free fact-fact join over bucketed
    tables (:mod:`operators.bucketing`).

    Both orders and lineitem are written bucketed (and sorted) on the
    order key, then joined through the catalog: with matching bucket
    specs Spark plans a SortMergeJoin with NO shuffle Exchange on either
    side, and the follow-up per-order aggregate reuses the same hash
    partitioning (outputPartitioning is already satisfied), so the only
    exchange in the whole plan is the final top-N. At 100 TB this is the
    layout that turns every orders⋈lineitem query from a dual full
    shuffle into a local per-bucket merge — the write cost is paid once,
    the shuffle saving is per-query.

    The bucketed layout is physical only — the oracle computes the same
    join/aggregate over the raw tables, so the gate proves layout does
    not change results (and the no-Exchange property is pinned by
    tests/test_bucketing.py::test_gate_query_join_is_exchange_free).
    """
    import os

    from project_obsidian_core_spark.operators import bucketing as B

    # pid in the tag: a concurrent process (bench beside an oracle run)
    # must not overwrite the tables/files this session is reading
    tag = (
        os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
        + f"_{os.getpid()}"
    )
    lt, rt = f"sg_bkt_orders_{tag}", f"sg_bkt_lineitem_{tag}"
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        cents("l_extendedprice").alias("ext_cents"),
        cents("l_discount").alias("disc_pct"),
    )
    B.write_bucketed(
        orders, lt, ["o_orderkey"], _N_BUCKETS,
        path=f"{_BUCKET_ROOT}/{tag}/orders",
    )
    B.write_bucketed(
        lineitem, rt, ["o_orderkey"], _N_BUCKETS,
        path=f"{_BUCKET_ROOT}/{tag}/lineitem",
    )
    joined = B.co_located_join(
        spark, lt, rt, ["o_orderkey"], force_sortmerge=True
    )
    return (
        joined.groupBy("o_orderkey", "o_orderpriority")
        .agg(
            (F.sum(F.col("ext_cents") * (F.lit(100) - F.col("disc_pct"))))
            .alias("revenue_cp"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue_cp").desc(), "o_orderkey")
        .limit(100)
    )


ORACLE_orders_bucketed_join = """
WITH l AS (
    SELECT l_orderkey AS o_orderkey,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS ext_cents,
           CAST(round(l_discount * 100, 0) AS BIGINT) AS disc_pct
    FROM lineitem
)
SELECT o.o_orderkey, o.o_orderpriority,
       CAST(sum(l.ext_cents * (100 - l.disc_pct)) AS BIGINT) AS revenue_cp,
       count(*) AS n_lines
FROM orders o JOIN l USING (o_orderkey)
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue_cp DESC, o_orderkey
LIMIT 100
"""


# ----------------------------------------------------- column profiling ---
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: one-pass exact column profiling (:func:`operators.quality.profile`)
    over orders — null / distinct / min / max per column through canonical
    order-preserving string reprs (zero-padded ints, ISO timestamps), so
    the whole report is one melt + two partial-aggregated hash aggs and
    NEVER a k-way countDistinct Expand. The discovery step before any
    dq_report contract is written."""
    from project_obsidian_core_spark.operators.quality import profile

    o = load(spark, sf_dir, "orders")
    pad10 = lambda c: F.lpad(F.col(c).cast("string"), 10, "0")  # noqa: E731
    cols = [
        ("o_orderkey", pad10("o_orderkey")),
        ("o_custkey", pad10("o_custkey")),
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_orderpriority", F.col("o_orderpriority")),
        (
            "price_cents",
            F.lpad(cents("o_totalprice").cast("string"), 12, "0"),
        ),
        (
            "o_orderdate",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        ),
    ]
    return profile(o, cols).orderBy("column")


ORACLE_orders_profile = """
WITH reprs AS (
    SELECT lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS r_orderkey,
           lpad(CAST(o_custkey AS VARCHAR), 10, '0') AS r_custkey,
           o_orderstatus AS r_status,
           o_orderpriority AS r_priority,
           lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR),
                12, '0') AS r_price,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f') AS r_date
    FROM orders
), melted AS (
    SELECT 'o_orderkey' AS "column", r_orderkey AS value FROM reprs
    UNION ALL SELECT 'o_custkey', r_custkey FROM reprs
    UNION ALL SELECT 'o_orderstatus', r_status FROM reprs
    UNION ALL SELECT 'o_orderpriority', r_priority FROM reprs
    UNION ALL SELECT 'price_cents', r_price FROM reprs
    UNION ALL SELECT 'o_orderdate', r_date FROM reprs
), per_value AS (
    SELECT "column", value, count(*) AS cnt
    FROM melted GROUP BY 1, 2
)
SELECT "column",
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN value IS NULL THEN cnt ELSE 0 END) AS BIGINT)
           AS n_nulls,
       CAST(count(value) AS BIGINT) AS n_distinct,
       min(value) AS min_repr,
       max(value) AS max_repr
FROM per_value
GROUP BY "column"
ORDER BY "column"
"""


# ------------------------------------------------- table fingerprinting ---
def orders_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2: order-independent snapshot fingerprint
    (:func:`operators.versioning.table_fingerprint`) of orders, one
    signature row per order priority — count + XOR fold + modular-sum
    fold + hash bounds over a canonical row rendering. The replication /
    migration / cross-engine parity check: both sides compute their
    signature independently (one partial-aggregated scan, no sort, no
    window) and compare bytes. The oracle recomputes the identical folds
    in DuckDB — which IS the cross-engine use case, run as a gate."""
    from project_obsidian_core_spark.operators.versioning import table_fingerprint

    o = load(spark, sf_dir, "orders")
    repr_col = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        cents("o_totalprice").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.col("o_orderpriority"),
    )
    return table_fingerprint(o, repr_col, ["o_orderpriority"]).orderBy(
        "o_orderpriority"
    )


ORACLE_orders_checksum = """
WITH reprs AS (
    SELECT o_orderpriority,
           CAST('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               o_orderstatus || '|' ||
               CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR)
                   || '|' ||
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
               o_orderpriority
           ), 1, 15) AS BIGINT) AS h
    FROM orders
)
SELECT o_orderpriority,
       count(*) AS n_rows,
       bit_xor(h) AS xor_sig,
       CAST(sum(h % 1000003) AS BIGINT) AS modsum_sig,
       min(h) AS min_hash,
       max(h) AS max_hash
FROM reprs
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------- J17: bloom runtime filter --
#: selective dim predicate for the bloom gate (132 of 1500 customers at
#: sf0.01 — the shape where probe-side pre-pruning pays).
_BLOOM_SEGMENT = "BUILDING"
_BLOOM_MIN_BAL = 5000.0


def orders_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J17: fact-dim join with an EXPLICIT Bloom runtime filter — the
    orders scan is pre-pruned by an 8 KiB bitmap built from the selective
    customer subset BEFORE the join shuffle, then the join removes the
    bloom's false positives.

    The oracle is the PLAIN join: the gate asserts the bloom path never
    changes a row — the no-false-negative property made bit-exact.  At
    100 TB the pre-filter drops ~(1 - sel) of the fact scan out of the
    shuffle for the cost of k hash probes per row inside codegen
    (``operators/bloom.py`` for geometry and the bounded-collect note).
    """
    from project_obsidian_core_spark.operators import bloom as B

    cust = (
        load(spark, sf_dir, "customer")
        .filter(
            (F.col("c_mktsegment") == _BLOOM_SEGMENT)
            & (F.col("c_acctbal") > _BLOOM_MIN_BAL)
        )
        .select("c_custkey")
    )
    words = B.build_bloom(cust, "c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        B.might_contain("o_custkey", words)
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_orders_bloom_join = f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{_BLOOM_SEGMENT}' AND c.c_acctbal > {_BLOOM_MIN_BAL}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
