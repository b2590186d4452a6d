"""Relational query shapes (SURVEY §2.3 J3, §2.6, workload-script query mix)
over the TPC-H-ish testdata: multi-way joins, group-by-having, correlated
subquery (decorrelated), CTE + COALESCE — the canonical query mix of the
reference's workload generators (scripts/mysql-workload.sh:10-58,
scripts/postgres-workload.sh:10-67) and a Q1-style pricing summary.

Scale notes: nation/region/customer/supplier are broadcast-joined (small
dims); orders⋈lineitem shuffles on the order key. All arithmetic follows
plans/common.py determinism rules (scaled-integer money).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_obsidian_core_spark.plans.common import cents, load


# --------------------------------------------------------------------- R1
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 2-key group, 8 aggregates, the
    workhorse scan+agg probe. Money math in exact scaled integers:
    disc_price at 1e-4, charge at 1e-6."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    epc = cents("l_extendedprice")
    dc = cents("l_discount")
    tc = cents("l_tax")
    df = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        epc.alias("epc"),
        (epc * (100 - dc)).alias("disc_e4"),
        (epc * (100 - dc) * (100 + tc)).alias("charge_e6"),
        dc.alias("dc"),
    )
    agg = df.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        F.sum("epc").alias("sum_base_price_cents"),
        F.sum("disc_e4").alias("sum_disc_price_e4"),
        F.sum("charge_e6").alias("sum_charge_e6"),
        F.sum("dc").alias("sum_disc_cents"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price_cents",
        "sum_disc_price_e4",
        "sum_charge_e6",
        (F.col("sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price_cents").cast("double") / F.col("count_order")).alias(
            "avg_price_cents"
        ),
        (F.col("sum_disc_cents").cast("double") / F.col("count_order")).alias(
            "avg_disc_cents"
        ),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


ORACLE_pricing_summary = """
WITH t AS (
    SELECT l_returnflag, l_linestatus,
           CAST(l_quantity AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS epc,
           CAST(round(l_discount * 100, 0) AS BIGINT) AS dc,
           CAST(round(l_tax * 100, 0) AS BIGINT) AS tc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
), agg AS (
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qty) AS BIGINT) AS sum_qty,
           CAST(sum(epc) AS BIGINT) AS sum_base_price_cents,
           CAST(sum(epc * (100 - dc)) AS BIGINT) AS sum_disc_price_e4,
           CAST(sum(epc * (100 - dc) * (100 + tc)) AS BIGINT) AS sum_charge_e6,
           CAST(sum(dc) AS BIGINT) AS sum_disc_cents,
           count(*) AS count_order
    FROM t GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price_cents,
       sum_disc_price_e4, sum_charge_e6,
       CAST(sum_qty AS DOUBLE) / count_order AS avg_qty,
       CAST(sum_base_price_cents AS DOUBLE) / count_order AS avg_price_cents,
       CAST(sum_disc_cents AS DOUBLE) / count_order AS avg_disc_cents,
       count_order
FROM agg
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------- R2
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: 3-way join with per-table
    filters, group, top-10 by revenue. customer is broadcast; orders⋈lineitem
    shuffles on the order key."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("l_orderkey", "o_orderdate", "o_orderpriority", rev)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_top_revenue_orders = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------- R3
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈
    nation ⋈ region with the customer-nation = supplier-nation constraint.
    Every dimension side is broadcast; the fact-side join shuffles once."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    rev = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_name", rev)
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("n_name"))
    )


ORACLE_regional_revenue = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue_e4 DESC, n_name ASC
"""


# --------------------------------------------------------------------- R4
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape from the workload scripts
    (scripts/mysql-workload.sh:52-58): per-customer order count + spend,
    zero-order customers included — decorrelated into aggregate + left join,
    which is how Spark should execute it at scale."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum(cents("o_totalprice")).alias("total_spend_cents"),
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("order_count", F.lit(0)).alias("order_count"),
            F.coalesce("total_spend_cents", F.lit(0)).alias("total_spend_cents"),
        )
        .orderBy(F.desc("total_spend_cents"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_customer_order_stats = """
SELECT c_custkey, c_name,
       CAST(coalesce((SELECT count(*) FROM orders WHERE o_custkey = c_custkey), 0) AS BIGINT) AS order_count,
       CAST(coalesce((SELECT sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                      FROM orders WHERE o_custkey = c_custkey), 0) AS BIGINT) AS total_spend_cents
FROM customer
ORDER BY total_spend_cents DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------- R5
def cte_order_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + LEFT JOIN + COALESCE shape (scripts/postgres-workload.sh:55-66):
    per-order lineitem rollup joined back to orders, null-safe."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    summary = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("line_count"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
    )
    return (
        orders.join(summary, orders.o_orderkey == summary.l_orderkey, "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            cents("o_totalprice").alias("total_price_cents"),
            F.coalesce("line_count", F.lit(0)).alias("line_count"),
            F.coalesce("total_qty", F.lit(0)).alias("total_qty"),
        )
        .filter(F.col("o_orderstatus") == "O")
    )


ORACLE_cte_order_summary = """
WITH order_summary AS (
    SELECT l_orderkey,
           count(*) AS line_count,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey, o_orderstatus,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_price_cents,
       CAST(coalesce(line_count, 0) AS BIGINT) AS line_count,
       CAST(coalesce(total_qty, 0) AS BIGINT) AS total_qty
FROM orders LEFT JOIN order_summary ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'O'
"""


# ------------------------------------------------ per-customer running sum --
def customer_cumulative_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of order value per customer in order-date order — the
    classic partitioned cumulative window (exact cents, no float sums).
    Partitioned by customer: no global window, no single-task funnel."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_us", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            # o_orderdate loads as TIMESTAMP_NTZ; cast (session TZ pinned
            # UTC) so unix_micros matches DuckDB epoch_us
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
            cents("o_totalprice").alias("price_cents"),
        )
        .withColumn("cum_cents", F.sum("price_cents").over(w).cast("long"))
        .orderBy("o_custkey", "order_us", "o_orderkey")
    )


ORACLE_customer_cumulative_spend = """
SELECT o_custkey, o_orderkey,
       epoch_us(o_orderdate) AS order_us,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM orders
ORDER BY o_custkey, order_us, o_orderkey
"""


# ------------------------------------------------------------- Q8-shaped
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: within the ASIA customer market, the
    fraction of yearly revenue supplied by one nation (NATION_5), as exact
    parts-per-million of exact e4-integer revenue.

    Plan shape: one fact-side shuffle (lineitem ⋈ orders on orderkey);
    customer / supplier / nation / region all broadcast; the share is a
    conditional aggregate (CASE inside SUM) so both the numerator and the
    denominator come out of a single pass — no second scan, no self-join.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    s_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(s_nation), supp.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev,
            F.col("supp_nation"),
        )
    )
    agg = joined.groupBy("o_year").agg(
        F.sum("rev_e4").alias("mkt_rev_e4"),
        F.sum(
            F.when(F.col("supp_nation") == "NATION_5", F.col("rev_e4")).otherwise(
                F.lit(0)
            )
        ).alias("nation_rev_e4"),
    )
    return agg.select(
        "o_year",
        "mkt_rev_e4",
        "nation_rev_e4",
        F.expr("(nation_rev_e4 * 1000000L) div mkt_rev_e4").alias("share_ppm"),
    ).orderBy("o_year")


ORACLE_nation_market_share = """
WITH j AS (
    SELECT year(o_orderdate) AS o_year,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_e4,
           sn.n_name AS supp_nation
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT o_year,
       CAST(sum(rev_e4) AS BIGINT) AS mkt_rev_e4,
       CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_e4 ELSE 0 END) AS BIGINT)
           AS nation_rev_e4,
       CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_e4 ELSE 0 END) AS BIGINT)
           * 1000000 // CAST(sum(rev_e4) AS BIGINT) AS share_ppm
FROM j
GROUP BY o_year
ORDER BY o_year
"""


# ------------------------------------------------------------- Q4-shaped
def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join: count orders per priority having at
    least one line item shipped more than 60 days after the order date.

    Plan shape: a LEFT SEMI join — the lineitem side is reduced to the
    qualifying orderkeys and never multiplies the orders rows, so the count
    is per-order no matter how many late lines an order has. Both sides
    shuffle once on orderkey; at 100 TB this is the join you bucket both
    tables on.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (
            F.unix_micros(F.col("l_shipdate").cast("timestamp"))
            > F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            + F.lit(60 * 86400 * 1000000)
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


ORACLE_late_shipment_orders = """
SELECT o_orderpriority, count(*) AS n_late_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND epoch_us(l_shipdate) > epoch_us(o_orderdate) + CAST(5184000 AS BIGINT) * 1000000
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
