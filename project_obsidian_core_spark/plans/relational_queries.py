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
        # decimal(38,0) widen before the ×10⁶: rev_e4 sums grow linearly
        # with the fact table, so a bare int64 multiply wraps around SF~0.3
        # (Spark non-ANSI wraps silently; DuckDB raises). `div` on decimal
        # returns BIGINT, exact for totals up to 10³² — the operating range.
        F.expr("(cast(nation_rev_e4 as decimal(38,0)) * 1000000) div mkt_rev_e4").alias(
            "share_ppm"
        ),
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
       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_e4 ELSE 0 END) AS HUGEINT)
           * 1000000 // CAST(sum(rev_e4) AS HUGEINT) AS BIGINT) AS share_ppm
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


# ------------------------------------------------------------- Q14-shaped
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion share: fraction of 1997 revenue coming
    from PROMO-type parts, as exact parts-per-million.

    Plan shape: part is a pure broadcast dimension (no shuffle on the fact
    side beyond the final 1-group aggregate); numerator and denominator come
    out of one conditional-aggregate pass (A4/A5 family applied to a join).
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        rev, F.col("p_type")
    )
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(F.lit(0))
        ).alias("promo_rev_e4"),
        F.sum("rev_e4").alias("total_rev_e4"),
    )
    return agg.select(
        "promo_rev_e4",
        "total_rev_e4",
        # decimal(38,0) widen — see share_ppm in nation_market_share; exact
        # for totals up to 10³² instead of wrapping past int64 around SF~0.3.
        F.expr(
            "(cast(promo_rev_e4 as decimal(38,0)) * 1000000) div total_rev_e4"
        ).alias("promo_ppm"),
    )


ORACLE_promo_revenue = """
WITH j AS (
    SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_e4,
           p_type
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT) AS promo_rev_e4,
       CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
       CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS HUGEINT)
         * 1000000 // CAST(sum(rev_e4) AS HUGEINT) AS BIGINT) AS promo_ppm
FROM j
"""


# ------------------------------------------------------------- Q17-shaped
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated aggregate: revenue of lineitems whose
    quantity is below 20% of the average quantity for their part, for one
    brand.

    Decorrelation: the per-part AVG subquery becomes a groupBy over the
    (already brand-filtered) lineitems joined back to the fact rows — the
    canonical decorrelated plan Catalyst would produce for the EXISTS-style
    correlated scalar. The avg comparison is kept in exact integers
    (5 * qty * n < sum_qty  ⟺  qty < 0.2 * avg) so the oracle hashes
    bit-identically.

    At scale both sides of the self-join shuffle on l_partkey once; the
    brand filter reaches the scan (broadcast part dim), shrinking the fact
    side ~25x before any shuffle.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        cents("l_extendedprice").alias("epc"),
    )
    branded = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "qty", "epc")
    per_part = branded.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("n_li")
    )
    small = branded.join(
        per_part, branded.l_partkey == F.col("agg_partkey")
    ).filter(F.col("qty") * 5 * F.col("n_li") < F.col("sum_qty"))
    return small.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        F.coalesce(F.sum("epc"), F.lit(0)).alias("sum_price_cents"),
        F.coalesce(F.expr("sum(epc) div 7"), F.lit(0)).alias("avg_yearly_cents"),
    )


ORACLE_small_quantity_revenue = """
WITH branded AS (
    SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS epc
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#3'
), per_part AS (
    SELECT l_partkey AS agg_partkey,
           CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n_li
    FROM branded GROUP BY l_partkey
)
SELECT count(*) AS n_small_lines,
       CAST(coalesce(sum(epc), 0) AS BIGINT) AS sum_price_cents,
       CAST(coalesce(sum(epc), 0) AS BIGINT) // 7 AS avg_yearly_cents
FROM branded JOIN per_part ON l_partkey = agg_partkey
WHERE qty * 5 * n_li < sum_qty
"""


# ------------------------------------------------------------- Q18-shaped
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: customers whose orders carry
    total quantity above a threshold — a HAVING-subquery turned LEFT SEMI
    join.

    Plan shape: the qualifying-orderkey set is built by one groupBy on the
    fact table and is tiny (hundreds of keys), so it broadcast-semi-joins
    back against orders; customer is broadcast. The fact table shuffles
    once, on its natural key.
    """
    threshold = 350
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("total_qty"))
        .filter(F.col("total_qty") > threshold)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
            cents("o_totalprice").alias("total_price_cents"),
            "total_qty",
        )
        .orderBy(F.desc("total_price_cents"), F.asc("o_orderkey"))
        .limit(20)
    )


ORACLE_large_order_customers = """
SELECT c_custkey, c_name, o_orderkey,
       epoch_us(o_orderdate) AS order_us,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_price_cents,
       CAST(t.total_qty AS BIGINT) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 350) t
  ON o_orderkey = t.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price_cents DESC, o_orderkey ASC
LIMIT 20
"""


# ------------------------------------------------------------- Q19-shaped
def brand_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: OR of three
    (brand, size-range, quantity-range) conjunctions across the
    lineitem ⋈ part join.

    Plan shape: part is broadcast; the OR-of-ANDs predicate references both
    sides so it evaluates post-join, but each disjunct's part-only conjuncts
    (brand, size) are ALSO pushed to the part scan as their union — Catalyst
    derives `(brand=1 AND size<=15) OR (brand=2 AND ...) OR ...` for the
    build side, shrinking the broadcast. One conditional-aggregate pass.
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4"),
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("qty").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("qty").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("qty").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.coalesce(F.sum("rev_e4"), F.lit(0)).alias("revenue_e4"),
    )


ORACLE_brand_type_revenue = """
SELECT count(*) AS n_lines,
       CAST(coalesce(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))), 0) AS BIGINT) AS revenue_e4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)
"""


# ------------------------------------------------------------- Q22-shaped
def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped anti-join: above-average-balance customers with no
    recent orders (none since 2000-01-01), counted per market segment.

    Plan shape: the global positive-balance average is a broadcast 1-row
    aggregate (exact integer cross-multiplication, no float avg); the
    "no recent orders" test is a LEFT ANTI join against the date-filtered
    orderkey side — the filter reaches the orders scan, so the anti build
    side is a fraction of the table. No correlated per-row subqueries
    survive into the plan.
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", cents("c_acctbal").alias("bal_cents")
    )
    pos = cust.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("sum_bal"), F.count(F.lit(1)).alias("n_bal")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(pos)).filter(
        F.col("bal_cents") * F.col("n_bal") > F.col("sum_bal")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        dormant.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_dormant_customers = """
WITH c AS (
    SELECT c_custkey, c_mktsegment,
           CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
    FROM customer
), pos AS (
    SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_bal, count(*) AS n_bal
    FROM c WHERE bal_cents > 0
)
SELECT c_mktsegment, count(*) AS n_custs,
       CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
FROM c, pos
WHERE bal_cents * n_bal > sum_bal
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ------------------------------------------------------------- Q15-shaped
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped argmax-by-view: per-supplier revenue over one
    quarter, returning the supplier(s) achieving the maximum.

    Plan shape: the "view" is a groupBy over the date-filtered fact table;
    the MAX over it is a broadcast 1-row aggregate joined back — the
    decorrelated form of `WHERE total_revenue = (SELECT max(...) ...)`.
    The fact table is scanned once (reused subplan), shuffled once on
    suppkey; supplier is broadcast.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4")
    by_supp = (
        li.select("l_suppkey", rev)
        .groupBy("l_suppkey")
        .agg(F.sum("rev_e4").alias("total_rev_e4"))
    )
    mx = by_supp.agg(F.max("total_rev_e4").alias("max_rev_e4"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        by_supp.join(F.broadcast(mx), F.col("total_rev_e4") == F.col("max_rev_e4"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_e4")
        .orderBy("s_suppkey")
    )


ORACLE_top_supplier_revenue = """
WITH revenue AS (
    SELECT l_suppkey,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
               AS total_rev_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_e4
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM revenue)
ORDER BY s_suppkey
"""


# ------------------------------------------------------ RANGE-frame window
def customer_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer at each order, via a RANGE window
    frame (value-based, not row-based): every order sums all of the same
    customer's orders whose order DAY falls within the last 30 days —
    including same-day ties, which a ROWS frame would miscount.

    Plan shape: one shuffle on the customer key; the frame bound is a
    numeric day offset (``rangeBetween(-30, 0)`` over days-since-epoch) so
    the window stays a single pass over each partition, exact cents ints
    end to end. The W-family inventory gains its only value-RANGE frame.
    """
    o = load(spark, sf_dir, "orders")
    day = (
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        / F.lit(86400_000_000)
    ).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-30, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            day.alias("order_day"),
            cents("o_totalprice").alias("price_cents"),
        )
        .withColumn("trail30_cents", F.sum("price_cents").over(w).cast("long"))
        .withColumn("n_trail30", F.count(F.lit(1)).over(w).cast("long"))
        .orderBy("o_custkey", "order_day", "o_orderkey")
    )


ORACLE_customer_trailing_revenue = """
WITH t AS (
    SELECT o_custkey, o_orderkey,
           epoch_us(o_orderdate) // 86400000000 AS order_day,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
    FROM orders
)
SELECT o_custkey, o_orderkey, order_day, price_cents,
       CAST(sum(price_cents) OVER w AS BIGINT) AS trail30_cents,
       CAST(count(*) OVER w AS BIGINT) AS n_trail30
FROM t
WINDOW w AS (PARTITION BY o_custkey ORDER BY order_day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, order_day, o_orderkey
"""


# ------------------------------------------------------------- Q7-shaped
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between two
    specific nations (either direction), per year.

    Plan shape: both nation filters push into the broadcast dim sides
    (supplier-nation via supplier, customer-nation via orders→customer);
    the OR-of-two-directions predicate evaluates post-join on two tiny
    broadcast attaches. The fact table shuffles once (orders join).
    """
    n1, n2 = "NATION_1", "NATION_2"
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(n1, n2))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(n1, n2))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem")
    rev = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4")
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            rev,
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_e4").alias("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_nation_trade_volume = """
WITH j AS (
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_e4
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
)
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev_e4) AS BIGINT) AS revenue_e4
FROM j
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ------------------------------------------------------------ Q10-shaped
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item losers: top 20 customers by revenue
    lost to returns ('R' lines) in one quarter.

    Plan shape: the return-flag + date filters push to the lineitem and
    orders scans; customer/nation broadcast onto the aggregated result —
    the aggregate runs on (custkey) BEFORE the dimension attach, so the
    broadcast join sees thousands of rows, not the fact table.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    rev = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", rev)
        .groupBy("o_custkey")
        .agg(F.sum("rev_e4").alias("lost_revenue_e4"))
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", cents("c_acctbal").alias("bal_cents")
    )
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "bal_cents", "lost_revenue_e4")
        .orderBy(F.desc("lost_revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_returned_item_customers = """
SELECT c_custkey, c_name, n_name,
       CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
           AS lost_revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name, bal_cents
ORDER BY lost_revenue_e4 DESC, c_custkey ASC
LIMIT 20
"""


# ------------------------------------------------------------ Q13-shaped
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped double aggregation: the distribution of customers
    by how many (non-special) orders they placed, zero-order customers
    included.

    Plan shape: orders aggregate to per-customer counts; the left join
    keeps customers with no orders (count 0); the second aggregate
    histograms the counts. Two small shuffles — custkey then count — and
    the filter is a pushed-down NOT LIKE on the orders scan.
    """
    orders = load(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").like("%URGENT%")
    )
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("c_count"))
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    counts = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_customer_order_distribution = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, CAST(coalesce(count(o_orderkey), 0) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
    GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------------------------- Q6-shaped
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast revenue: one filtered scan, one global
    sum — the pure predicate-pushdown probe (every filter reaches the
    parquet scan; no join, no shuffle beyond the 1-row aggregate).

    Revenue is Σ(extendedprice·discount) in exact 1e-4 units over 1997
    shipments with discount 2-4 cents and quantity < 24.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & cents("l_discount").between(2, 4)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(cents("l_extendedprice") * cents("l_discount")).alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


ORACLE_forecast_revenue = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * CAST(round(l_discount * 100, 0) AS BIGINT)) AS BIGINT)
           AS revenue_e4,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 2 AND 4
  AND l_quantity < 24
"""


# ------------------------------------------------------------- Q9-shaped
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product profit: revenue on name-matched parts by
    (supplier nation, order year). The testdata has no partsupp table, so
    profit is the discounted revenue side of Q9's expression — the JOIN
    TOPOLOGY is the point: three broadcast dims (part filter, supplier,
    nation) around the lineitem⋈orders shuffle join.
    """
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    amount = (cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
        "amount_e4"
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select("nation", F.year("o_orderdate").alias("o_year"), amount)
    )
    return (
        joined.groupBy("nation", "o_year")
        .agg(F.sum("amount_e4").alias("sum_profit_e4"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE_nation_year_profit = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
           AS sum_profit_e4
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# ------------------------------------------------------------ Q11-shaped
def major_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped share-of-total HAVING: suppliers whose revenue
    exceeds 1/1000 of the global total.

    The Q11 mechanics without partsupp: group, then filter against a
    scalar subquery — here a broadcast 1-row total joined in (no second
    scan of the fact; the decimal-widened comparison keeps the ×1000
    exact past int64).
    """
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.select(
            "l_suppkey",
            (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("rev_e4").alias("value_e4"))
    )
    total = rev.agg(F.sum("value_e4").alias("total_e4"))
    return (
        rev.join(F.broadcast(total))
        .filter(
            F.expr("(cast(value_e4 as decimal(38,0)) * 1000) > total_e4")
        )
        .select("l_suppkey", "value_e4")
        .orderBy(F.desc("value_e4"), "l_suppkey")
    )


ORACLE_major_suppliers = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
               AS BIGINT) AS value_e4
    FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, value_e4
FROM rev
WHERE CAST(value_e4 AS HUGEINT) * 1000
      > (SELECT CAST(sum(value_e4) AS HUGEINT) FROM rev)
ORDER BY value_e4 DESC, l_suppkey
"""


# ------------------------------------------------------------ Q12-shaped
def late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped priority split over late shipments: per line
    status, how many late-shipped lines belong to critical vs ordinary
    orders (CASE-conditional counts after a date-arithmetic predicate —
    the shipmode split with the columns the testdata carries).
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.unix_micros(F.col("l_shipdate").cast("timestamp"))
        > F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        + F.lit(30 * 86400 * 1000000)
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_late_priority_lines = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE epoch_us(l_shipdate) > epoch_us(o_orderdate)
      + CAST(2592000 AS BIGINT) * 1000000
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ------------------------------------------------------------ Q16-shaped
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier-variety count: distinct suppliers per
    (brand, type, size) for selected parts, EXCLUDING a NOT-IN supplier
    set (low-balance suppliers stand in for the complaint filter; the
    lineitem relation stands in for partsupp).

    Plan: the exclusion is a broadcast LEFT ANTI join (NOT IN without
    null traps — acctbal is non-null); the distinct count shuffles once
    on the 3-key group.
    """
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 9, 13))
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000.0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    kept = li.join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
    return (
        kept.join(F.broadcast(part), kept.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_part_supplier_variety = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 5, 9, 13)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ------------------------------------------------------------ Q21-shaped
def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped waiting-supplier search: suppliers who were the
    ONLY late shipper on multi-supplier orders (late = shipped > 60 days
    after the order date).

    The EXISTS / NOT-EXISTS pair is decorrelated into per-order
    aggregates: any_late per (order, supplier), then supplier & late
    counts per order — the candidate filter `n_supp > 1 AND n_late = 1`
    is exactly "another supplier exists, no other late supplier exists".
    The oracle keeps the textbook correlated EXISTS form, so the gate
    also pins the decorrelation's equivalence. Two keyed shuffles
    (orderkey, then supplier), dims broadcast.
    """
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.unix_micros(F.col("l_shipdate").cast("timestamp"))
            > F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            + F.lit(60 * 86400 * 1000000)
        ).alias("late"),
    )
    sup_order = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("any_late")
    )
    order_stats = sup_order.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("any_late").cast("long")).alias("n_late"),
    )
    cand = (
        sup_order.filter(F.col("any_late"))
        .join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cand.join(F.broadcast(supp), cand.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


ORACLE_sole_late_suppliers = """
WITH lo AS (
    SELECT l_orderkey AS ok, l_suppkey AS sk,
           epoch_us(l_shipdate) > epoch_us(o_orderdate)
               + CAST(5184000 AS BIGINT) * 1000000 AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), so AS (
    SELECT ok, sk, max(late) AS any_late FROM lo GROUP BY ok, sk
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM so s1 JOIN supplier ON s1.sk = s_suppkey
WHERE s1.any_late
  AND EXISTS (SELECT 1 FROM so s2 WHERE s2.ok = s1.ok AND s2.sk <> s1.sk)
  AND NOT EXISTS (SELECT 1 FROM so s3
                  WHERE s3.ok = s1.ok AND s3.sk <> s1.sk AND s3.any_late)
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


# ------------------------------------------------------ Pareto frontier ---
def part_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type part skyline (operators.skyline): the parts not beaten on
    BOTH price (minimize) and size (maximize) by any same-type part — two
    value-RANGE windows on one group shuffle, never the O(n²) dominance
    self-join. Exact integer cents keep the compare engine-identical."""
    from project_obsidian_core_spark.operators.skyline import pareto_frontier_2d

    parts = load(spark, sf_dir, "part").select(
        "p_type", "p_partkey", cents("p_retailprice").alias("price_cents"), "p_size"
    )
    return pareto_frontier_2d(
        parts, ["p_type"], "price_cents", "p_size"
    ).orderBy("p_type", "price_cents", "p_partkey")


ORACLE_part_pareto_frontier = """
WITH p AS (
    SELECT p_type, p_partkey,
           CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
           p_size
    FROM part
), scored AS (
    SELECT p_type, p_partkey, price_cents, p_size,
           max(p_size) OVER (PARTITION BY p_type ORDER BY price_cents
                             RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_best,
           max(p_size) OVER (PARTITION BY p_type, price_cents) AS tie_best
    FROM p
)
SELECT p_type, p_partkey, price_cents, p_size
FROM scored
WHERE p_size = tie_best
  AND (prev_best IS NULL OR p_size > prev_best)
ORDER BY p_type, price_cents, p_partkey
"""


# ----------------------------------------------- exact weighted median ----
def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A30: exact quantity-weighted median price per return flag — the
    distributed weighted-quantile primitive (cost-weighted SLO cuts,
    size-weighted latency medians) computed WITHOUT any approx sketch:

    the RANGE-frame running weight per (flag, price) prefix gives, at any
    row, the total weight of prices ≤ it (peers share the frame, so
    duplicate prices fold correctly); the weighted median is the smallest
    price whose doubled prefix weight reaches the group total. Both
    windows and the final aggregate share ONE (flag) partitioning — a
    single exchange, and the only per-key cost is the window sort, which
    is the information-theoretic floor for an exact quantile. Compare
    `qan_latency_quantiles` (unweighted percentiles): this is its
    weighted sibling, all in exact int64 arithmetic."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        cents("l_extendedprice").alias("price_cents"),
        cents("l_quantity", scale=1).alias("qty"),
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    scored = li.select(
        "l_returnflag",
        "price_cents",
        "qty",
        F.sum("qty").over(w_cum).alias("cum_w"),
        F.sum("qty").over(w_all).alias("tot_w"),
    )
    return (
        scored.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(F.col("cum_w") * 2 >= F.col("tot_w"), F.col("price_cents"))
            ).alias("weighted_median_cents"),
            F.sum("qty").alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_lineitem_weighted_median = """
WITH li AS (
    SELECT l_returnflag,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
           CAST(round(l_quantity, 0) AS BIGINT) AS qty
    FROM lineitem
), scored AS (
    SELECT l_returnflag, price_cents, qty,
           sum(qty) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                          RANGE BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_w,
           sum(qty) OVER (PARTITION BY l_returnflag) AS tot_w
    FROM li
)
SELECT l_returnflag,
       CAST(min(CASE WHEN cum_w * 2 >= tot_w THEN price_cents END) AS BIGINT)
           AS weighted_median_cents,
       CAST(sum(qty) AS BIGINT) AS total_qty,
       count(*) AS n_lines
FROM scored
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ------------------------------------------------------------- Q2-shaped
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated-min sourcing query: within one part
    slice (STANDARD type, size <= 15) and one supplier market (EUROPE),
    the supplier(s) offering each part at the minimum observed unit
    price.  The testdata has no partsupp table, so the "offer" relation
    is derived from lineitem: unit price = extendedprice/quantity,
    held EXACT as micro-dollars via integer division (price_cents *
    10^4 div qty — both engines truncate identically, so the argmin
    set is deterministic without float compares).

    Plan shape: the part slice and the supplier⋈nation⋈region market
    are broadcast dims around ONE fact scan; the per-part min rides a
    WINDOW over the already-reduced (part, supplier) offer relation
    (aggregate-then-window) — the decorrelated form of Q2's
    `WHERE ps_supplycost = (SELECT min(...) WHERE ... correlated)`.
    The first draft joined a re-aggregated mins relation back by
    equality, which RECOMPUTED the offers subplan — a second full fact
    scan at 100 TB (caught in the r10 plan audit, now pinned).
    """
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name", "p_size")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    li = load(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            (cents("l_extendedprice") * F.lit(10_000)).alias("_num_e6"),
            F.col("l_quantity").cast("long").alias("_qty"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            F.expr("_num_e6 div _qty").alias("unit_e6"),
        )
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "n_name")
        .agg(F.min("unit_e6").alias("best_unit_e6"))
    )
    wmin = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_unit_e6", F.min("best_unit_e6").over(wmin))
        .filter(F.col("best_unit_e6") == F.col("min_unit_e6"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name", "min_unit_e6")
        .orderBy("p_partkey", "s_suppkey")
    )


ORACLE_min_cost_supplier = """
WITH market AS (
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
), offers AS (
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
           CAST(min(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 10000
                    // CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS best_unit_e6
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN market ON l_suppkey = s_suppkey
    WHERE p_type = 'STANDARD' AND p_size <= 15
    GROUP BY 1, 2, 3, 4, 5
)
SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
       best_unit_e6 AS min_unit_e6
FROM offers o
WHERE best_unit_e6 = (SELECT min(best_unit_e6) FROM offers i
                      WHERE i.p_partkey = o.p_partkey)
ORDER BY p_partkey, s_suppkey
"""


# ------------------------------------------------------------- Q20-shaped
def dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped "who really holds the stock" semi-join: suppliers
    that shipped MORE THAN HALF of some red part's total 1997 volume.
    Q20's partsupp-availqty predicate (`ps_availqty > 0.5 * sum(l_qty)`)
    is reshaped onto lineitem as a share-of-part threshold — same
    correlated-aggregate-vs-total structure, exact integers throughout
    (2·supplier_qty > part_total compares ints, no division).

    Plan shape: ONE fact scan feeds the (part, supplier) partials; the
    per-part totals ride a WINDOW over that already-reduced relation
    (aggregate-then-window — the first draft's re-aggregated totals
    join recomputed the partials subplan, i.e. a second full fact scan
    at 100 TB; caught in the r10 plan audit, now pinned); the supplier
    dim attaches broadcast; output is per-supplier with the count of
    parts they dominate.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red ")
    ).select("p_partkey")
    ps = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("qty"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum("qty").alias("supp_qty"))
    )
    wtot = Window.partitionBy("p_partkey")
    dom = ps.withColumn("part_qty", F.sum("supp_qty").over(wtot)).filter(
        F.col("supp_qty") * 2 > F.col("part_qty")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dom.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_dominant_parts"),
            F.sum("supp_qty").alias("dominated_qty"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_dominant_parts", "dominated_qty")
        .orderBy("s_suppkey")
    )


ORACLE_dominant_suppliers = """
WITH ps AS (
    SELECT p_partkey, l_suppkey,
           CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS supp_qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red %'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
), dom AS (
    SELECT ps.l_suppkey, ps.supp_qty
    FROM ps
    JOIN (SELECT p_partkey AS tk, CAST(sum(supp_qty) AS BIGINT) AS part_qty
          FROM ps GROUP BY 1) t
      ON ps.p_partkey = t.tk AND ps.supp_qty * 2 > t.part_qty
)
SELECT s_suppkey, s_name,
       count(*) AS n_dominant_parts,
       CAST(sum(supp_qty) AS BIGINT) AS dominated_qty
FROM dom JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2
ORDER BY s_suppkey
"""


# ------------------------------------ A57: brand price elasticity (OLS) --
def brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A57: per-brand demand slope — exact-int OLS of quantity against
    unit price (cents) across a brand's lineitems, the "does a lower
    unit price move volume" screen (a negative slope is economically
    sane demand; positive flags premium/luxury mix or data problems).
    A36's centered-moment idiom on a pricing substrate: both variables
    min-center per brand (shift changes intercept, never slope), five
    int64 moments in ONE aggregate over the already-keyed relation, the
    only float is the final num/den division per output row.

    Overflow bound: unit price ≤ ~10⁷ cents and qty ≤ 50, so Σx·y ≤
    rows·5·10⁸ and n·Σx² ≤ rows²·10¹⁴ — document the cents→dollar
    rescale past ~10⁴ rows/brand... which the gate corpus exceeds, so
    the operator quantizes x to DOLLARS (price_cents div 100) by
    definition, the A42 lesson (quantization is semantics, chosen so
    n·Σx² stays exact at 10⁶ rows/brand).
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            F.expr(
                "(cast(round(l_extendedprice * 100, 0) as bigint)"
                " div cast(l_quantity as bigint)) div 100"
            ).alias("px"),
            F.col("l_quantity").cast("long").alias("qy"),
        )
    )
    w = Window.partitionBy("p_brand")
    c = base.select(
        "p_brand",
        (F.col("px") - F.min("px").over(w)).alias("x"),
        (F.col("qy") - F.min("qy").over(w)).alias("y"),
    )
    agg = c.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "p_brand",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "qty_per_dollar"
        ),
    ).orderBy("p_brand")


ORACLE_brand_price_elasticity = """
WITH base AS (
    SELECT p_brand,
           (CAST(round(l_extendedprice * 100, 0) AS BIGINT)
            // CAST(l_quantity AS BIGINT)) // 100 AS px,
           CAST(l_quantity AS BIGINT) AS qy
    FROM lineitem JOIN part ON l_partkey = p_partkey
), c AS (
    SELECT p_brand,
           px - min(px) OVER (PARTITION BY p_brand) AS x,
           qy - min(qy) OVER (PARTITION BY p_brand) AS y
    FROM base
), a AS (
    SELECT p_brand, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM c GROUP BY 1
)
SELECT p_brand, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CASE WHEN n * sxx - sx * sx <> 0 THEN
           CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS qty_per_dollar
FROM a
ORDER BY p_brand
"""


# ----------------------------- R25: market-basket affinity over orders ---
def orders_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R25: which parts are BOUGHT TOGETHER beyond chance — per unordered
    part pair co-occurring in ≥ 2 orders, exact integer lift
    n_both · N_orders · 10⁶ div (n_p1 · n_p2) plus support counts: the
    classic market-basket screen (A56's affinity on order baskets
    instead of user histories — the same algebra at a 100×-larger pair
    space, which is why the ≥ 2 support floor exists: it prunes the
    hapax pair tail BEFORE the count relations attach, the X20
    min_count move).

    Plan: one scan reduces to distinct (order, part); the pair join is
    per-order equi-keyed (fan-out C(basket,2), baskets are small by
    data shape); per-part order counts broadcast onto the ≤ surviving-
    pairs relation. All integers exact.
    """
    li = load(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = op.select("o").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    per_part = op.groupBy(F.col("p")).agg(F.count(F.lit(1)).alias("n_p"))
    pairs = (
        op.select("o", F.col("p").alias("p1"))
        .join(op.select("o", F.col("p").alias("p2")), "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    return (
        pairs.join(
            F.broadcast(per_part.select(F.col("p").alias("p1"),
                                        F.col("n_p").alias("n_p1"))), "p1"
        )
        .join(
            F.broadcast(per_part.select(F.col("p").alias("p2"),
                                        F.col("n_p").alias("n_p2"))), "p2"
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "n_both",
            "n_p1",
            "n_p2",
            F.expr("n_both * n_orders * 1000000 div (n_p1 * n_p2)").alias(
                "lift_ppm"
            ),
        )
        .orderBy("p1", "p2")
    )


ORACLE_orders_basket_affinity = """
WITH op AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), no AS (
    SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM op
), pp AS (
    SELECT p, CAST(count(*) AS BIGINT) AS n_p FROM op GROUP BY 1
), pairs AS (
    SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS n_both
    FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    GROUP BY 1, 2
    HAVING count(*) >= 2
)
SELECT pr.p1, pr.p2, pr.n_both, x.n_p AS n_p1, y.n_p AS n_p2,
       pr.n_both * no.n_orders * 1000000 // (x.n_p * y.n_p) AS lift_ppm
FROM pairs pr
JOIN pp x ON x.p = pr.p1
JOIN pp y ON y.p = pr.p2
CROSS JOIN no
ORDER BY pr.p1, pr.p2
"""


# ------------------------------------------------------------- Q19-shaped
def lineitem_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-bracket revenue (R26): three
    brand/size/quantity brackets OR-ed together, revenue per bracket in
    the exact ``rev_e4`` integer recipe.

    The classic Q19 optimization is expressed declaratively and left to
    Catalyst: the OR-of-ANDs predicate references both sides, but its
    HULL factors into per-side conjuncts — ``p_brand IN (…) AND p_size
    BETWEEN 1 AND 35`` prunes the part scan and ``l_quantity BETWEEN 1
    AND 30`` prunes the fact scan BEFORE the join (both reach
    PushedFilters), so the broadcast hash join sees only candidate rows
    and the residual disjunction runs on the joined slice.  At 100 TB
    the fact-side quantity hull is the one that matters: it is a plain
    min/max predicate parquet row-group stats can skip on.  Brackets are
    brand-disjoint, so the CASE label is unambiguous.
    """
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        (cents("l_extendedprice") * (100 - cents("l_discount"))).alias("rev_e4"),
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        j.filter(b1 | b2 | b3)
        .select(
            F.when(b1, F.lit("B1")).when(b2, F.lit("B2")).otherwise(
                F.lit("B3")
            ).alias("bracket"),
            "rev_e4",
        )
        .groupBy("bracket")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("rev_e4").alias("revenue_e4"),
        )
        .select(
            "bracket",
            "n_lines",
            "revenue_e4",
            (F.col("revenue_e4").cast("double") / 10000.0).alias("revenue"),
        )
        .orderBy("bracket")
    )


ORACLE_lineitem_disjunctive_revenue = """
WITH j AS (
    SELECT p_brand, p_size, l_quantity,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev_e4
    FROM lineitem JOIN part ON l_partkey = p_partkey
), lab AS (
    SELECT CASE
             WHEN p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 10
                  AND l_quantity BETWEEN 1 AND 11 THEN 'B1'
             WHEN p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20
                  AND l_quantity BETWEEN 10 AND 20 THEN 'B2'
             WHEN p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35
                  AND l_quantity BETWEEN 20 AND 30 THEN 'B3'
           END AS bracket, rev_e4
    FROM j
)
SELECT bracket, count(*) AS n_lines,
       CAST(sum(rev_e4) AS BIGINT) AS revenue_e4,
       CAST(sum(rev_e4) AS DOUBLE) / 10000.0 AS revenue
FROM lab WHERE bracket IS NOT NULL
GROUP BY bracket
ORDER BY bracket
"""


# -------------------------------------------------- R27: inter-order gaps
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R27: purchase-cadence distribution — the gap in days between each
    customer's consecutive orders, folded to a bounded week-binned
    histogram (replenishment-cycle analytics; the batch shape behind
    churn-risk "customer is N× past their usual gap" alerts).

    Gaps come from one LAG window over (customer, order-date) — the
    window partitioning IS the aggregation partitioning, so the corpus
    shuffles once on o_custkey and the histogram fold is a ≤|bins|
    relation.  Days index as exact ``epoch_us div 86400e6`` ints; ties
    on the same date break by o_orderkey (the A38 total-order rule) and
    contribute a 0-day gap.  Output is |bins| rows regardless of corpus
    size.
    """
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = o.select(
        "o_custkey", (F.col("day") - F.lag("day").over(w)).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy(F.expr("gap_days div 7").alias("gap_weeks"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum("gap_days").alias("sum_gap_days"),
        )
        .select(
            "gap_weeks",
            "n_gaps",
            "n_customers",
            "sum_gap_days",
            (
                F.col("sum_gap_days").cast("double")
                / F.col("n_gaps").cast("double")
            ).alias("mean_gap_days"),
        )
        .orderBy("gap_weeks")
    )


ORACLE_customer_order_gaps = """
WITH o AS (
    SELECT o_custkey, o_orderkey,
           epoch_us(o_orderdate) // 86400000000 AS day
    FROM orders
), g AS (
    SELECT o_custkey,
           day - lag(day) OVER (
               PARTITION BY o_custkey ORDER BY day, o_orderkey
           ) AS gap_days
    FROM o
)
SELECT gap_days // 7 AS gap_weeks,
       count(*) AS n_gaps,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(sum(gap_days) AS BIGINT) AS sum_gap_days,
       CAST(sum(gap_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS mean_gap_days
FROM g WHERE gap_days IS NOT NULL
GROUP BY 1
ORDER BY gap_weeks
"""


# ------------- A70: Kaplan-Meier repurchase survival (queued for r11) -----
# Registration note: queued for round 11 (r10 gate window full); the r11
# registry block should add:
#   ("orders_kaplan_meier", r.orders_kaplan_meier, r.ORACLE_orders_kaplan_meier)
def _repurchase_risk_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared survival-analysis timeline for A70 (Kaplan-Meier) and A82
    (Nelson-Aalen): per distinct repurchase duration t (days) the event
    count (reorder gaps = t), censor count (last-order tails = t, exact
    right-censoring at the corpus max date), and the risk set
    n_risk = Σ_{s≥t}(events+censored).  One per-customer window over the
    orders projection + one tiny ordered pass over the ≤|span|-row
    timeline; corpus max attaches via the PSI broadcast-totals idiom."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    )
    omax = o.groupBy().agg(F.max("day").alias("corpus_last_day"))
    w = Window.partitionBy("o_custkey").orderBy("day")
    seq = o.select(
        "o_custkey",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy(F.desc("day"))
        ).alias("rn_desc"),
    )
    events = seq.filter(F.col("prev_day").isNotNull()).select(
        (F.col("day") - F.col("prev_day")).alias("dur"),
        F.lit(1).alias("ev"),
        F.lit(0).alias("cz"),
    )
    censored = (
        seq.filter(F.col("rn_desc") == 1)
        .crossJoin(F.broadcast(omax))
        .select(
            (F.col("corpus_last_day") - F.col("day")).alias("dur"),
            F.lit(0).alias("ev"),
            F.lit(1).alias("cz"),
        )
    )
    timeline = (
        events.unionByName(censored)
        .groupBy("dur")
        .agg(
            F.sum("ev").cast("long").alias("n_events"),
            F.sum("cz").cast("long").alias("n_censored"),
        )
    )
    wcum = (
        Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy()
    return timeline.select(
        F.col("dur").alias("t_days"),
        "n_events",
        "n_censored",
        (
            F.sum(F.col("n_events") + F.col("n_censored")).over(wtot)
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(wcum),
                F.lit(0),
            )
        ).alias("n_risk"),
    )


def orders_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A70: Kaplan-Meier repurchase-survival timeline — "what fraction
    of customers go t days without reordering", the censoring-correct
    answer the naive gap ECDF (A60's histogram) gets wrong: a customer
    whose LAST order is d days before the corpus end has survived d
    days without the event, and dropping them (or counting them as
    events) biases the curve — so they enter as right-CENSORED
    observations at d.

    The gate pins the exact timeline: per distinct duration t (days),
    n_events (reorder gaps = t), n_censored (last-order tails = t), the
    risk set n_risk = Σ_{s≥t}(events+censored), and the per-step factor
    (n_risk−d)/n_risk — one exact int division.  The cumulative product
    S(t) = Π factor lives in :func:`km_survival` OUTSIDE the hashed
    gate: an ordered float product has no shuffle-safe SQL form (window
    exp(Σln) hits the A32 transcendental trap), and the timeline
    carries all the information exactly.

    Scale: gaps ride one per-customer window on the orders projection;
    the timeline is ≤|distinct durations| rows (day-granular: ≤ corpus
    span), so the risk-set window is one tiny ordered pass; the corpus
    max date attaches via the PSI broadcast-totals idiom.
    """
    return (
        _repurchase_risk_timeline(spark, sf_dir)
        .select(
            "t_days",
            "n_events",
            "n_censored",
            "n_risk",
            F.when(
                F.col("n_events") > 0,
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double"),
            )
            .otherwise(F.lit(1.0))
            .alias("factor"),
        )
        .orderBy("t_days")
    )


ORACLE_orders_kaplan_meier = """
WITH o AS (
    SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
    FROM orders
), omax AS (
    SELECT max(day) AS corpus_last_day FROM o
), seq AS (
    SELECT o_custkey, day,
           lag(day) OVER (PARTITION BY o_custkey ORDER BY day) AS prev_day,
           row_number() OVER (PARTITION BY o_custkey ORDER BY day DESC)
               AS rn_desc
    FROM o
), obs AS (
    SELECT day - prev_day AS dur, 1 AS ev, 0 AS cz
    FROM seq WHERE prev_day IS NOT NULL
    UNION ALL
    SELECT corpus_last_day - day AS dur, 0 AS ev, 1 AS cz
    FROM seq CROSS JOIN omax WHERE rn_desc = 1
), timeline AS (
    SELECT dur, CAST(sum(ev) AS BIGINT) AS n_events,
           CAST(sum(cz) AS BIGINT) AS n_censored
    FROM obs GROUP BY dur
)
SELECT dur AS t_days, n_events, n_censored,
       CAST(sum(n_events + n_censored) OVER ()
            - coalesce(sum(n_events + n_censored) OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk,
       CASE WHEN n_events > 0
            THEN CAST(
                (sum(n_events + n_censored) OVER ()
                 - coalesce(sum(n_events + n_censored) OVER (ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                - n_events AS DOUBLE)
                / CAST(sum(n_events + n_censored) OVER ()
                   - coalesce(sum(n_events + n_censored) OVER (ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS DOUBLE)
            ELSE 1.0
       END AS factor
FROM timeline
ORDER BY t_days
"""


def km_survival(df: DataFrame) -> DataFrame:
    """Attach the cumulative Kaplan-Meier survival S(t) = Π_{s≤t} factor
    to an A70 timeline.  OUTSIDE the hashed gate (the A32 rule's product
    variant: an ordered float product in SQL means exp(Σ ln) — two
    transcendentals whose last ulp differs between engines), while the
    timeline's exact ints + per-step factors carry all the information.
    The fold multiplies ascending-t in a single ordered pass (the
    timeline is ≤|distinct durations| rows — driver-size by
    construction), matching python's left-to-right product; unit-pinned
    against that reference."""
    from pyspark.sql import Window

    arr = df.select(
        F.expr("sort_array(collect_list(struct(t_days, factor)))").alias("tl")
    )
    walked = arr.select(
        F.expr(
            "transform(sequence(1, size(tl)), i -> struct("
            " element_at(tl, i).t_days as t_days,"
            " aggregate(slice(tl, 1, i), cast(1.0 as double),"
            "           (acc, s) -> acc * s.factor) as survival))"
        ).alias("pts")
    )
    out = walked.select(F.explode("pts").alias("p")).select(
        F.col("p.t_days").alias("t_days"),
        F.col("p.survival").alias("survival"),
    )
    return df.join(out, "t_days").orderBy("t_days")


# ----------------------- A82: Nelson-Aalen cumulative hazard --------------
def orders_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A82: Nelson-Aalen cumulative-hazard timeline over the SAME
    censoring-correct repurchase data as A70 — the KM sibling whose
    CUMULATIVE estimator is gate-exact: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ is a SUM,
    not a product, so the whole curve hashes bit-exact in integer ppm
    (``Σ 10⁶·dᵢ div nᵢ``), where KM's S(t) = Π(1−dᵢ/nᵢ) had to leave
    the cumulative product outside the gate (ordered float products
    have no shuffle-safe SQL form).  This is why NA is the estimator of
    choice when the HAZARD, not the survival fraction, is the quantity
    consumed (churn-intensity monitoring, e.g.): the plateauing of
    H(t)'s increments IS the stabilized repurchase rate.

    Shares :func:`_repurchase_risk_timeline` with A70 (one per-customer
    window + one tiny timeline pass; refactor-pinned by both gates
    staying EXACT)."""
    tl = _repurchase_risk_timeline(spark, sf_dir)
    step = F.expr("1000000 * n_events div n_risk")
    wcum = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        tl.select(
            "t_days",
            "n_events",
            "n_censored",
            "n_risk",
            step.cast("long").alias("hazard_step_ppm"),
        )
        .withColumn(
            "hazard_cum_ppm",
            F.sum("hazard_step_ppm").over(wcum).cast("long"),
        )
        .orderBy("t_days")
    )


ORACLE_orders_nelson_aalen = """
WITH o AS (
    SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
    FROM orders
), omax AS (
    SELECT max(day) AS corpus_last_day FROM o
), seq AS (
    SELECT o_custkey, day,
           lag(day) OVER (PARTITION BY o_custkey ORDER BY day) AS prev_day,
           row_number() OVER (PARTITION BY o_custkey ORDER BY day DESC)
               AS rn_desc
    FROM o
), obs AS (
    SELECT day - prev_day AS dur, 1 AS ev, 0 AS cz
    FROM seq WHERE prev_day IS NOT NULL
    UNION ALL
    SELECT corpus_last_day - day AS dur, 0 AS ev, 1 AS cz
    FROM seq CROSS JOIN omax WHERE rn_desc = 1
), timeline AS (
    SELECT dur, CAST(sum(ev) AS BIGINT) AS n_events,
           CAST(sum(cz) AS BIGINT) AS n_censored
    FROM obs GROUP BY dur
), risk AS (
    SELECT dur AS t_days, n_events, n_censored,
           CAST(sum(n_events + n_censored) OVER ()
                - coalesce(sum(n_events + n_censored) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
    FROM timeline
)
SELECT t_days, n_events, n_censored, n_risk,
       CAST(1000000 * n_events // n_risk AS BIGINT) AS hazard_step_ppm,
       CAST(sum(1000000 * n_events // n_risk) OVER (ORDER BY t_days
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS hazard_cum_ppm
FROM risk
ORDER BY t_days
"""


# -------------------------- A83: log-rank two-cohort survival test --------
def orders_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A83: log-rank test timeline comparing repurchase survival between
    two customer cohorts (BUILDING market segment vs the rest) — the
    hypothesis-test member of the survival family: A70 (KM) and A82
    (Nelson-Aalen) each DESCRIBE one curve; this asks whether two
    cohorts' curves differ beyond chance, censoring-correct on both
    sides (the question "do segment-X customers reorder faster" that a
    naive mean-gap comparison answers wrongly under censoring).

    Per distinct duration t: per-cohort event/censor counts, per-cohort
    risk sets (the A70 total-minus-prefix window, once per cohort via
    conditional sums — ONE ordered pass over the ≤|span|-row timeline),
    the n-scaled observed-minus-expected numerator
    ``oe_num = d_a·n − d·n_a`` EXACT int64, and the hypergeometric
    variance term as ONE deterministic float chain per row
    (``d·n_a·n_b·(n−d) / (n²·(n−1))`` evaluated in the identical
    operation order by both engines — kept float because the int
    numerator alone brushes int64 at sf1; documented).  The scalar z
    lives in :func:`logrank_z` OUTSIDE the gate (a float reduction over
    the timeline), mirroring A70's survival product.

    Cohort attaches via ONE broadcast join against the customer dim —
    the dimension is |customers| rows but only (key, 1-bit) wide here;
    at 100 TB the same join is a broadcast of the reduced projection.
    """
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("ga"),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    )
    omax = o.groupBy().agg(F.max("day").alias("corpus_last_day"))
    w = Window.partitionBy("o_custkey").orderBy("day")
    seq = o.select(
        "o_custkey",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy(F.desc("day"))
        ).alias("rn_desc"),
    )
    events = seq.filter(F.col("prev_day").isNotNull()).select(
        "o_custkey",
        (F.col("day") - F.col("prev_day")).alias("dur"),
        F.lit(1).alias("ev"),
        F.lit(0).alias("cz"),
    )
    censored = (
        seq.filter(F.col("rn_desc") == 1)
        .crossJoin(F.broadcast(omax))
        .select(
            "o_custkey",
            (F.col("corpus_last_day") - F.col("day")).alias("dur"),
            F.lit(0).alias("ev"),
            F.lit(1).alias("cz"),
        )
    )
    obs = events.unionByName(censored).join(F.broadcast(c), "o_custkey")
    tl = obs.groupBy("dur").agg(
        F.sum(F.col("ev") * F.col("ga")).cast("long").alias("d_a"),
        F.sum(F.col("ev") * (1 - F.col("ga"))).cast("long").alias("d_b"),
        F.sum(F.col("cz") * F.col("ga")).cast("long").alias("c_a"),
        F.sum(F.col("cz") * (1 - F.col("ga"))).cast("long").alias("c_b"),
    )
    wprev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    wtot = Window.partitionBy()
    risk = tl.select(
        F.col("dur").alias("t_days"),
        "d_a",
        "d_b",
        "c_a",
        "c_b",
        (
            F.sum(F.col("d_a") + F.col("c_a")).over(wtot)
            - F.coalesce(F.sum(F.col("d_a") + F.col("c_a")).over(wprev), F.lit(0))
        ).alias("n_a"),
        (
            F.sum(F.col("d_b") + F.col("c_b")).over(wtot)
            - F.coalesce(F.sum(F.col("d_b") + F.col("c_b")).over(wprev), F.lit(0))
        ).alias("n_b"),
    )
    d = F.col("d_a") + F.col("d_b")
    n = F.col("n_a") + F.col("n_b")
    return risk.select(
        "t_days",
        "d_a",
        "d_b",
        "c_a",
        "c_b",
        "n_a",
        "n_b",
        (F.col("d_a") * n - d * F.col("n_a")).cast("long").alias("oe_num"),
        F.when(
            n > 1,
            (
                d.cast("double")
                * F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
                * (n - d).cast("double")
            )
            / (
                n.cast("double")
                * n.cast("double")
                * (n - F.lit(1)).cast("double")
            ),
        ).alias("var_t"),
    ).orderBy("t_days")


def logrank_z(df: DataFrame) -> DataFrame:
    """Scalar log-rank statistic from the A83 timeline — OUTSIDE the
    hashed gate (a float reduction, like A70's survival product):
    z = Σ(oe_num/n) / sqrt(Σ var_t)."""
    oe = (
        F.col("oe_num").cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    agg = df.agg(
        F.sum(oe).alias("oe_sum"),
        F.sum("var_t").alias("var_sum"),
    )
    return agg.select(
        "oe_sum",
        "var_sum",
        F.when(
            F.col("var_sum") > 0,
            F.col("oe_sum") / F.sqrt(F.col("var_sum")),
        ).alias("z"),
    )


ORACLE_orders_logrank = """
WITH c AS (
    SELECT c_custkey AS o_custkey,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ga
    FROM customer
), o AS (
    SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
    FROM orders
), omax AS (
    SELECT max(day) AS corpus_last_day FROM o
), seq AS (
    SELECT o_custkey, day,
           lag(day) OVER (PARTITION BY o_custkey ORDER BY day) AS prev_day,
           row_number() OVER (PARTITION BY o_custkey ORDER BY day DESC)
               AS rn_desc
    FROM o
), obs AS (
    SELECT o_custkey, day - prev_day AS dur, 1 AS ev, 0 AS cz
    FROM seq WHERE prev_day IS NOT NULL
    UNION ALL
    SELECT o_custkey, corpus_last_day - day AS dur, 0 AS ev, 1 AS cz
    FROM seq CROSS JOIN omax WHERE rn_desc = 1
), tl AS (
    SELECT dur,
           CAST(sum(ev * ga) AS BIGINT) AS d_a,
           CAST(sum(ev * (1 - ga)) AS BIGINT) AS d_b,
           CAST(sum(cz * ga) AS BIGINT) AS c_a,
           CAST(sum(cz * (1 - ga)) AS BIGINT) AS c_b
    FROM obs JOIN c USING (o_custkey)
    GROUP BY dur
), risk AS (
    SELECT dur AS t_days, d_a, d_b, c_a, c_b,
           CAST(sum(d_a + c_a) OVER ()
                - coalesce(sum(d_a + c_a) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_a,
           CAST(sum(d_b + c_b) OVER ()
                - coalesce(sum(d_b + c_b) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_b
    FROM tl
)
SELECT t_days, d_a, d_b, c_a, c_b, n_a, n_b,
       CAST(d_a * (n_a + n_b) - (d_a + d_b) * n_a AS BIGINT) AS oe_num,
       CASE WHEN n_a + n_b > 1 THEN
           (CAST(d_a + d_b AS DOUBLE) * CAST(n_a AS DOUBLE)
            * CAST(n_b AS DOUBLE) * CAST((n_a + n_b) - (d_a + d_b) AS DOUBLE))
           / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
              * CAST((n_a + n_b) - 1 AS DOUBLE))
       END AS var_t
FROM risk
ORDER BY t_days
"""


# -------------------------------------------------- R28: Q16 reshape --
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("part_supplier_counts", r.part_supplier_counts,
#    r.ORACLE_part_supplier_counts)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R28: supplier-breadth census per part bucket — the TPC-H Q16
    shape (parts/supplier relationship, druid-specs' notebook carries
    the same "how many distinct suppliers can ship this" question) over
    the columns the testdata carries: for each (brand, type, size)
    bucket surviving the catalog exclusions, how many DISTINCT
    suppliers have actually shipped that part, excluding suppliers on
    the deny list (negative account balance — the testdata's analogue
    of Q16's complaints subquery).

    Shapes under test: a NOT-IN decorrelated into a broadcast LEFT ANTI
    join (the deny list is ≤|suppliers| and tiny after its filter), the
    part↔supplier bridge reduced to DISTINCT (partkey, suppkey) pairs
    BEFORE the dimension join (lineitem touches each pair many times —
    dedup first so the expensive join carries ≤|pairs| rows), and a
    COUNT(DISTINCT) per group. At 100 TB: lineitem-side combine-style
    distinct prunes the fact scan to the pair relation, the part dim
    and deny list broadcast, and the final exchange carries only
    |buckets| groups.
    """
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("MEDIUM"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    deny = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(deny.select(F.col("s_suppkey").alias("l_suppkey"))),
            "l_suppkey",
            "left_anti",
        )
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"),
            F.asc("p_brand"),
            F.asc("p_type"),
            F.asc("p_size"),
        )
    )


ORACLE_part_supplier_counts = """
WITH deny AS (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
), pairs AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM deny)
)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# -------------------------------------------------- R29: Q13 reshape --
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("customer_order_histogram", r.customer_order_histogram,
#    r.ORACLE_customer_order_histogram)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R29: customer-distribution histogram — the TPC-H Q13 shape: how
    many customers placed exactly k qualifying orders, INCLUDING the
    zero-order customers (the classic left-join-with-FILTERED-JOIN-
    PREDICATE decorrelation: the filter belongs in the JOIN CONDITION,
    not a WHERE after it, or the zero bucket silently vanishes). The
    qualifying predicate here is "not urgent" over the priority column
    the testdata carries (Q13's comment NOT LIKE).

    Two cascaded aggregations: per-customer count (keyed on custkey —
    the corpus-sized exchange), then the histogram (≤|distinct counts|
    groups). Both map-side combine; the customer dim never broadcasts
    (it is the PROBE side and the left join must preserve it).
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_customer_order_histogram = """
WITH per_cust AS (
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------- R30: Q11-shape threshold --
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("part_value_concentration", r.part_value_concentration,
#    r.ORACLE_part_value_concentration)
def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R30: value-concentration screen — the TPC-H Q11 shape (groups
    whose aggregate clears a GLOBAL-SCALAR-subquery threshold): which
    parts carry more than 1.5× the AVERAGE per-part shipped value? The
    correlated HAVING decorrelates into one scalar aggregate broadcast
    against the per-part relation; the threshold compare is the
    exact-int cross-multiply 2·value·n_parts > 3·total (no division in
    the predicate — Q11's fixed global fraction would be SF-dependent
    and empty on uniform catalogs, a mean-relative threshold is the
    shape that stays populated at every scale), and the reported share
    is integer ppm (value·10⁶ div total).

    Scale: one corpus exchange (per-part aggregate), a 1-row broadcast
    scalar, a broadcast part-dim join for the name — output is the
    above-threshold tail only.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", cents("l_extendedprice").alias("pc")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("pc").alias("value_cents"))
    total = per_part.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * F.col("n_parts") * 2
            > F.col("total_cents") * 3
        )
        .join(F.broadcast(part), per_part.l_partkey == part.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "value_cents",
            F.expr("value_cents * 1000000 div total_cents").alias("share_ppm"),
        )
        .orderBy(F.desc("value_cents"), F.asc("p_partkey"))
    )


ORACLE_part_value_concentration = """
WITH li AS (
    SELECT l_partkey,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
    FROM lineitem
), per_part AS (
    SELECT l_partkey, CAST(sum(pc) AS BIGINT) AS value_cents
    FROM li GROUP BY l_partkey
), total AS (
    SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM per_part
)
SELECT p_partkey, p_name, p_brand, value_cents,
       CAST(value_cents * 1000000 // total_cents AS BIGINT) AS share_ppm
FROM per_part, total
JOIN part ON l_partkey = p_partkey
WHERE value_cents * n_parts * 2 > total_cents * 3
ORDER BY value_cents DESC, p_partkey
"""


# ----------------------- A85: cohort LTV curve (staged r13 for r14) -------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("customer_cohort_ltv", r.customer_cohort_ltv,
#    r.ORACLE_customer_cohort_ltv)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A85: the cohort lifetime-value curve — the revenue counterpart of
    `events_retention`'s activity matrix, the other table every growth
    dashboard ships: customers cohorted by FIRST-order month, and per
    (cohort, months-since-first-order) the active-customer count,
    period revenue, CUMULATIVE revenue, and cumulative revenue per
    cohort member.

    Exactness: month arithmetic as ``year·12 + month`` ints (no
    cross-engine interval semantics), money as exact cent sums, the
    running total a window SUM over the (cohorts × ages) REDUCED
    relation, per-member LTV as integer division of positive ints
    (``div`` and ``//`` agree above zero).

    Scale: one exchange per aggregation level — the per-customer
    first-order min rides the same (custkey) shuffle as the order agg,
    the (cohort, age) grid is tiny (months²), and the cohort-size join
    broadcasts.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).alias("ym"),
        cents("o_totalprice").alias("pc"),
    )
    first = o.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    aged = o.join(first, "o_custkey").withColumn(
        "age_months", (F.col("ym") - F.col("cohort_ym")).cast("long")
    )
    grid = aged.groupBy("cohort_ym", "age_months").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("pc").alias("cents_sum"),
    )
    size = first.groupBy("cohort_ym").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    wcum = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.withColumn("cum_cents", F.sum("cents_sum").over(wcum))
        .join(F.broadcast(size), "cohort_ym")
        .select(
            F.col("cohort_ym").cast("long").alias("cohort_ym"),
            "age_months",
            "n_active",
            "cents_sum",
            "cum_cents",
            "cohort_size",
            F.expr("cum_cents div cohort_size").alias("ltv_cents_per_cust"),
        )
        .orderBy("cohort_ym", "age_months")
    )


ORACLE_customer_cohort_ltv = """
WITH o AS (
    SELECT o_custkey,
           year(o_orderdate) * 12 + month(o_orderdate) AS ym,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc
    FROM orders
), first AS (
    SELECT o_custkey, min(ym) AS cohort_ym FROM o GROUP BY o_custkey
), aged AS (
    SELECT o.o_custkey, f.cohort_ym,
           CAST(o.ym - f.cohort_ym AS BIGINT) AS age_months, o.pc
    FROM o JOIN first f USING (o_custkey)
), grid AS (
    SELECT cohort_ym, age_months,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
           CAST(sum(pc) AS BIGINT) AS cents_sum
    FROM aged GROUP BY 1, 2
), size_ AS (
    SELECT cohort_ym, CAST(count(*) AS BIGINT) AS cohort_size
    FROM first GROUP BY 1
)
SELECT CAST(g.cohort_ym AS BIGINT) AS cohort_ym, g.age_months, g.n_active,
       g.cents_sum,
       CAST(sum(g.cents_sum) OVER (PARTITION BY g.cohort_ym
                                   ORDER BY g.age_months
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_cents,
       s.cohort_size,
       CAST(CAST(sum(g.cents_sum) OVER (PARTITION BY g.cohort_ym
                                        ORDER BY g.age_months
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
            // s.cohort_size AS BIGINT) AS ltv_cents_per_cust
FROM grid g JOIN size_ s USING (cohort_ym)
ORDER BY cohort_ym, age_months
"""


# ----------------- A91: decile gains / lift table (staged r13) ------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("customer_decile_lift", r.customer_decile_lift,
#    r.ORACLE_customer_decile_lift)
#: score-period / holdout-period boundary (1999-01-01)
_LIFT_CUTOFF = "1999-01-01"
_LIFT_BINS = 10


def customer_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A91: the decile gains/lift table — the standard readout for "does
    ranking customers by history concentrate future value?": customers
    are scored by pre-cutoff revenue, cut into POSITIONAL deciles
    (equi-count, ties broken by custkey — the A90 equi-depth rule, so
    no interpolated percentile semantics), and each decile reports how
    much HOLDOUT-period revenue it captures, cumulatively, against the
    uniform baseline (`lift_ppm` = capture share ÷ population share).
    Decile 0 (the top) capturing ≫ 10% is the whole justification for
    targeting models; a flat table says history doesn't predict.

    Exactness: cents sums, positional decile `(rank−1)·10 div n`,
    running integer sums over the 10-row decile grid, integer-ppm
    divisions only in the report.  Scale: one custkey-keyed exchange
    builds (score, holdout) per customer (conditional sums, map-side
    combined); the GLOBAL rank window is the A41-style positional
    statement (one sorter over the already-reduced customer relation)
    — at 10⁸+ customers swap in A73's bucket-refinement order
    statistics exactly as `customer_rfm` does, the decile boundary
    being the same order-statistic query."""
    ords = load(spark, sf_dir, "orders")
    per_cust = ords.groupBy("o_custkey").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderdate") < F.lit(_LIFT_CUTOFF).cast("timestamp"),
                    cents("o_totalprice"),
                )
            ),
            F.lit(0),
        ).alias("score_cents"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderdate") >= F.lit(_LIFT_CUTOFF).cast("timestamp"),
                    cents("o_totalprice"),
                )
            ),
            F.lit(0),
        ).alias("holdout_cents"),
    )
    w = Window.orderBy(F.col("score_cents").desc(), "o_custkey")
    wn = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned = (
        per_cust.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("decile", F.expr(f"(rn - 1) * {_LIFT_BINS} div n"))
    )
    grid = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("score_cents").alias("score_cents"),
        F.sum("holdout_cents").alias("holdout_cents"),
    )
    wg = Window.orderBy("decile")
    wtot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        grid.withColumn("cum_holdout_cents", F.sum("holdout_cents").over(wg))
        .withColumn("total_holdout", F.sum("holdout_cents").over(wtot))
        .withColumn("cum_customers", F.sum("n_customers").over(wg))
        .withColumn("total_customers", F.sum("n_customers").over(wtot))
        .select(
            "decile",
            "n_customers",
            "score_cents",
            "holdout_cents",
            "cum_holdout_cents",
            F.expr(
                "cum_holdout_cents * 1000000 div total_holdout"
            ).alias("cum_capture_ppm"),
            F.expr(
                "(cum_holdout_cents * 1000000 div total_holdout)"
                " * total_customers div cum_customers"
            ).alias("lift_ppm"),
        )
        .orderBy("decile")
    )


ORACLE_customer_decile_lift = f"""
WITH per_cust AS (
    SELECT o_custkey,
           CAST(coalesce(sum(CASE WHEN o_orderdate < TIMESTAMP '{_LIFT_CUTOFF}'
                   THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END),
                0) AS BIGINT) AS score_cents,
           CAST(coalesce(sum(CASE WHEN o_orderdate >= TIMESTAMP '{_LIFT_CUTOFF}'
                   THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END),
                0) AS BIGINT) AS holdout_cents
    FROM orders GROUP BY o_custkey
), binned AS (
    SELECT *,
           (row_number() OVER (ORDER BY score_cents DESC, o_custkey) - 1)
               * {_LIFT_BINS} // count(*) OVER () AS decile
    FROM per_cust
), grid AS (
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(score_cents) AS BIGINT) AS score_cents,
           CAST(sum(holdout_cents) AS BIGINT) AS holdout_cents
    FROM binned GROUP BY decile
), cum AS (
    SELECT decile, n_customers, score_cents, holdout_cents,
           CAST(sum(holdout_cents) OVER (ORDER BY decile) AS BIGINT)
               AS cum_holdout_cents,
           CAST(sum(holdout_cents) OVER () AS BIGINT) AS total_holdout,
           CAST(sum(n_customers) OVER (ORDER BY decile) AS BIGINT)
               AS cum_customers,
           CAST(sum(n_customers) OVER () AS BIGINT) AS total_customers
    FROM grid
)
SELECT decile, n_customers, score_cents, holdout_cents, cum_holdout_cents,
       CAST(cum_holdout_cents * 1000000 // total_holdout AS BIGINT)
           AS cum_capture_ppm,
       CAST((cum_holdout_cents * 1000000 // total_holdout)
                * total_customers // cum_customers AS BIGINT) AS lift_ppm
FROM cum
ORDER BY decile
"""


# ------------------- A93: open-order aging buckets (staged r13) -----------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("orders_aging_buckets", r.orders_aging_buckets,
#    r.ORACLE_orders_aging_buckets)
_AGING_ASOF = "2001-09-01"


def orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A93: the aging report — open orders (status ≠ 'F') bucketed by
    days outstanding at a snapshot date (0-30 / 31-60 / 61-90 / 90+,
    the accounts-receivable classic), value-weighted per priority so
    the table answers both "how stale is the open book" and "is the
    stale tail skewed toward urgent orders" (the operational smell).

    Exactness: day arithmetic on midnight timestamps (integer
    `datediff`), cents sums, share ppm over the open total — no floats.
    Scale: one scan with the status filter pushed to parquet, one
    (bucket, priority) hash aggregate — map-side combined, ≤ 4·5 output
    rows; the share join broadcasts a 1-row total."""
    ords = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    aged = ords.select(
        "o_orderpriority",
        cents("o_totalprice").alias("c"),
        F.datediff(
            F.lit(_AGING_ASOF).cast("date"), F.col("o_orderdate").cast("date")
        ).alias("age_days"),
    ).withColumn(
        "age_bucket",
        F.when(F.col("age_days") <= 30, F.lit("000-030"))
        .when(F.col("age_days") <= 60, F.lit("031-060"))
        .when(F.col("age_days") <= 90, F.lit("061-090"))
        .otherwise(F.lit("090+")),
    )
    tot = aged.agg(F.sum("c").alias("open_cents"))
    return (
        aged.groupBy("age_bucket", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("c").alias("total_cents"),
            F.max("age_days").cast("long").alias("oldest_days"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "age_bucket",
            "o_orderpriority",
            "n_orders",
            "total_cents",
            "oldest_days",
            F.expr("total_cents * 1000000 div open_cents").alias("share_ppm"),
        )
        .orderBy("age_bucket", "o_orderpriority")
    )


ORACLE_orders_aging_buckets = f"""
WITH aged AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
           date_diff('day', CAST(o_orderdate AS DATE),
                     DATE '{_AGING_ASOF}') AS age_days
    FROM orders WHERE o_orderstatus != 'F'
), b AS (
    SELECT o_orderpriority, c, age_days,
           CASE WHEN age_days <= 30 THEN '000-030'
                WHEN age_days <= 60 THEN '031-060'
                WHEN age_days <= 90 THEN '061-090'
                ELSE '090+' END AS age_bucket
    FROM aged
)
SELECT age_bucket, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(c) AS BIGINT) AS total_cents,
       CAST(max(age_days) AS BIGINT) AS oldest_days,
       CAST(sum(c) * 1000000 // (SELECT sum(c) FROM b) AS BIGINT)
           AS share_ppm
FROM b
GROUP BY age_bucket, o_orderpriority
ORDER BY age_bucket, o_orderpriority
"""


# ------------- A97: nation trade-profile similarity (staged r13) ----------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("nation_trade_similarity", r.nation_trade_similarity,
#    r.ORACLE_nation_trade_similarity)
_TRADE_UNIT = 100_000  # cents -> ~k$ cells: keeps dot products int64-safe
_TRADE_TOPK = 3


def nation_trade_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A97: cosine similarity between nations' supply-mix profiles —
    each nation's vector is its suppliers' revenue by part TYPE, and the
    report is every nation's top-3 most similar trade partners: the
    economic-complexity shape ("who exports like whom") that also reads
    as assortment-overlap between retailers or workload-overlap between
    database fleets.  The novel surface vs the N-family: similarity
    between AGGREGATED dimension profiles built by joins, not between
    stored embedding rows.

    Exactness: cells are scaled ints (cents div unit — documented
    deterministic truncation), dot/norms exact int64 sums over the
    6-type axis (the scale cap keeps every product double-exact too),
    cosine is the fixed tree dot/(√n_a·√n_b) with CORRECTLY-ROUNDED
    IEEE sqrt.  Scale: fact-side one (nation, type) aggregate behind
    broadcast dim joins; the pair space is |nations|²/2 over the
    REDUCED profile relation (25 nations here; a 10⁴-entity profile
    matrix would ride the A37 series-pair guard)."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part")
    nat = load(spark, sf_dir, "nation")
    cells = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("p_type").alias("ptype"))
        .agg(
            F.expr(
                f"sum(cast(round(l_extendedprice * 100, 0) as bigint))"
                f" div {_TRADE_UNIT}"
            ).alias("v")
        )
    )
    norms = cells.groupBy("nation").agg(
        F.sum(F.col("v") * F.col("v")).alias("norm2")
    )
    a = cells.select(
        F.col("nation").alias("nation_a"), "ptype", F.col("v").alias("va")
    )
    b = cells.select(
        F.col("nation").alias("nation_b"), "ptype", F.col("v").alias("vb")
    )
    dots = (
        a.join(b, "ptype")
        .filter(F.col("nation_a") < F.col("nation_b"))
        .groupBy("nation_a", "nation_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("nation").alias("nation_a"), F.col("norm2").alias("na2"))
    nb = norms.select(F.col("nation").alias("nation_b"), F.col("norm2").alias("nb2"))
    sym = (
        dots.join(F.broadcast(na), "nation_a")
        .join(F.broadcast(nb), "nation_b")
        .withColumn(
            "cos_sim",
            F.col("dot").cast("double")
            / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
        )
    )
    # both directions so every nation ranks its partners
    both = sym.select("nation_a", "nation_b", "dot", "cos_sim").unionByName(
        sym.select(
            F.col("nation_b").alias("nation_a"),
            F.col("nation_a").alias("nation_b"),
            "dot",
            "cos_sim",
        )
    )
    wr = Window.partitionBy("nation_a").orderBy(
        F.col("cos_sim").desc(), "nation_b"
    )
    return (
        both.withColumn("partner_rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("partner_rank") <= _TRADE_TOPK)
        .select("nation_a", "partner_rank", "nation_b", "dot", "cos_sim")
        .orderBy("nation_a", "partner_rank")
    )


ORACLE_nation_trade_similarity = f"""
WITH cells AS (
    SELECT n.n_name AS nation, p.p_type AS ptype,
           CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                // {_TRADE_UNIT} AS BIGINT) AS v
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
), norms AS (
    SELECT nation, CAST(sum(v * v) AS BIGINT) AS norm2
    FROM cells GROUP BY nation
), dots AS (
    SELECT a.nation AS nation_a, b.nation AS nation_b,
           CAST(sum(a.v * b.v) AS BIGINT) AS dot
    FROM cells a JOIN cells b ON a.ptype = b.ptype AND a.nation < b.nation
    GROUP BY 1, 2
), sym AS (
    SELECT d.nation_a, d.nation_b, d.dot,
           CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(na.norm2 AS DOUBLE))
                  * sqrt(CAST(nb.norm2 AS DOUBLE))) AS cos_sim
    FROM dots d
    JOIN norms na ON na.nation = d.nation_a
    JOIN norms nb ON nb.nation = d.nation_b
), both_ AS (
    SELECT nation_a, nation_b, dot, cos_sim FROM sym
    UNION ALL
    SELECT nation_b, nation_a, dot, cos_sim FROM sym
)
SELECT nation_a,
       CAST(row_number() OVER (PARTITION BY nation_a
                               ORDER BY cos_sim DESC, nation_b) AS BIGINT)
           AS partner_rank,
       nation_b, dot, cos_sim
FROM both_
QUALIFY partner_rank <= {_TRADE_TOPK}
ORDER BY nation_a, partner_rank
"""


# ------------------ A103: win-back cohorts (staged r13) --------------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("customer_winback", r.customer_winback,
#    r.ORACLE_customer_winback)
_WB_MIN_GAP_MONTHS = 3


def customer_winback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A103: the win-back report — every order that ends a dormancy of
    ≥ 3 months, bucketed by how long the customer was gone (3-5 / 6-11
    / 12+ months): the re-activation counterpart of `dormant_customers`
    (who IS gone) and A85's cohort LTV (what actives are worth) — this
    is what re-engagement campaigns are measured against, and the
    recovered-revenue column prices whether chasing 12+-month dormants
    is worth the discount that wakes them.

    Exactness: month arithmetic as `year·12 + month` ints (the A85
    rule, no interval semantics), gap via one lag window per customer,
    cents sums, ppm only in the report.  Scale: one custkey-keyed
    exchange (the window), a ≤3-row aggregate, 1-row broadcast total."""
    ords = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gapped = (
        ords.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            cents("o_totalprice").alias("c"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).alias("ym"),
        )
        .withColumn("prev_ym", F.lag("ym", 1).over(w))
        .filter(
            F.col("prev_ym").isNotNull()
            & (F.col("ym") - F.col("prev_ym") >= _WB_MIN_GAP_MONTHS)
        )
        .withColumn(
            "dormancy_bucket",
            F.when(F.col("ym") - F.col("prev_ym") <= 5, F.lit("03-05"))
            .when(F.col("ym") - F.col("prev_ym") <= 11, F.lit("06-11"))
            .otherwise(F.lit("12+")),
        )
    )
    tot = gapped.agg(F.sum("c").alias("total_recovered"))
    return (
        gapped.groupBy("dormancy_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_winbacks"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum("c").alias("recovered_cents"),
            F.max(F.col("ym") - F.col("prev_ym")).cast("long").alias(
                "longest_gap_months"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "dormancy_bucket",
            "n_winbacks",
            "n_customers",
            "recovered_cents",
            "longest_gap_months",
            F.expr(
                "recovered_cents * 1000000 div total_recovered"
            ).alias("share_ppm"),
        )
        .orderBy("dormancy_bucket")
    )


ORACLE_customer_winback = f"""
WITH gapped AS (
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
           year(o_orderdate) * 12 + month(o_orderdate) AS ym,
           lag(year(o_orderdate) * 12 + month(o_orderdate), 1)
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS prev_ym
    FROM orders
), wb AS (
    SELECT *,
           CASE WHEN ym - prev_ym <= 5 THEN '03-05'
                WHEN ym - prev_ym <= 11 THEN '06-11'
                ELSE '12+' END AS dormancy_bucket
    FROM gapped
    WHERE prev_ym IS NOT NULL AND ym - prev_ym >= {_WB_MIN_GAP_MONTHS}
)
SELECT dormancy_bucket,
       CAST(count(*) AS BIGINT) AS n_winbacks,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(sum(c) AS BIGINT) AS recovered_cents,
       CAST(max(ym - prev_ym) AS BIGINT) AS longest_gap_months,
       CAST(sum(c) * 1000000 // (SELECT sum(c) FROM wb) AS BIGINT)
           AS share_ppm
FROM wb
GROUP BY dormancy_bucket
ORDER BY dormancy_bucket
"""


# ---------------- A108: supplier HHI per nation (staged r15) ---------------
# Registration note: REGISTERED r15 (Block R15 queue drain; was staged
# via scripts/check_queued.py).  Registry row:
#   ("nation_supplier_hhi", r.nation_supplier_hhi,
#    r.ORACLE_nation_supplier_hhi)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A108: Herfindahl-Hirschman concentration of supplier revenue per
    nation — the antitrust-standard market-concentration index
    (HHI = Σ shareᵢ², shares in thousandths → index on 0..10⁶), plus
    the classic DOJ bands scaled ×100 (<150,000 unconcentrated,
    150,000–250,000 moderate, >250,000 high): the sourcing-risk KPI a
    supply-chain dashboard puts next to A76's ABC classes (ABC says
    which suppliers matter; HHI says whether a MARKET has a single
    point of failure).

    Exactness: revenue in exact cents; shares are milli-units by
    integer division (revᵢ·10³ div rev_total — truncating both
    engines), HHI an exact integer sum of their squares; band edges
    are integer compares.  Scale: one fact aggregate on (nation,
    supplier) — map-side combined, supplier dim broadcast — then a
    ≤|nations| rollup; nothing pairwise."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", cents("l_extendedprice").alias("epc")
    )
    per_supp = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation", "l_suppkey")
        .agg(F.sum("epc").alias("rev"))
    )
    wn = Window.partitionBy("nation")
    shares = per_supp.withColumn("tot", F.sum("rev").over(wn)).select(
        "nation",
        "rev",
        "tot",
        F.expr("(rev * 1000) div tot").alias("share_milli"),
    )
    return (
        shares.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.first("tot").alias("revenue_cents"),
            F.sum(F.col("share_milli") * F.col("share_milli")).alias("hhi"),
        )
        .withColumn(
            "band",
            F.when(F.col("hhi") < 150_000, F.lit("unconcentrated"))
            .when(F.col("hhi") <= 250_000, F.lit("moderate"))
            .otherwise(F.lit("high")),
        )
        .orderBy("nation")
    )


ORACLE_nation_supplier_hhi = """
WITH per_supp AS (
    SELECT n.n_name AS nation, l.l_suppkey,
           CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS rev
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
), shares AS (
    SELECT nation, rev,
           sum(rev) OVER (PARTITION BY nation) AS tot,
           (rev * 1000) // sum(rev) OVER (PARTITION BY nation)
               AS share_milli
    FROM per_supp
)
SELECT nation,
       count(*) AS n_suppliers,
       CAST(any_value(tot) AS BIGINT) AS revenue_cents,
       CAST(sum(share_milli * share_milli) AS BIGINT) AS hhi,
       CASE WHEN sum(share_milli * share_milli) < 150000
            THEN 'unconcentrated'
            WHEN sum(share_milli * share_milli) <= 250000 THEN 'moderate'
            ELSE 'high' END AS band
FROM shares
GROUP BY nation
ORDER BY nation
"""


# ------------- R31: supplier fulfillment lead-time quantiles (round 15) ---
def supplier_leadtime_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R31: order→ship fulfillment lead time per supplier nation — the
    logistics KPI next to A108's concentration risk (HHI says WHO you
    depend on; this says how FAST each market actually ships): per
    nation, the line count, mean lead days, and EXACT nearest-rank
    p50/p90/p99 lead times.

    Exactness: lead days are pure integer arithmetic on epoch micros
    ((ship − order) div 86 400 000 000 — engine-identical; calendar
    datediff would disagree across engines on mid-day timestamps);
    quantiles are the A106 nearest-rank grid pattern (cumulative counts
    over the DISTINCT-value grid, rank = (p·n + 99) div 100 — never a
    per-line global sort); the mean is ONE IEEE division of exact-int
    sums.

    Scale: the li ⋈ orders fact join shuffles once (the Q12 topology);
    supplier and nation broadcast; the quantile pass groups by
    (nation, lead_days) first, so the windows ride a ≤|nations|·|day
    range| grid."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr("unix_micros(o_orderdate)").alias("om")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.expr("unix_micros(l_shipdate)").alias("sm")
    )
    lead = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "nation", F.expr("(sm - om) div 86400000000").alias("lead_days")
        )
    )
    grid = lead.groupBy("nation", "lead_days").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("lead_days").alias("day_sum")
    )
    wt = Window.partitionBy("nation")
    wcum = (
        Window.partitionBy("nation")
        .orderBy("lead_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = (
        grid.withColumn("n", F.sum("cnt").over(wt))
        .withColumn("sum_all", F.sum("day_sum").over(wt))
        .withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("i50", F.expr("(50 * n + 99) div 100"))
        .withColumn("i90", F.expr("(90 * n + 99) div 100"))
        .withColumn("i99", F.expr("(99 * n + 99) div 100"))
    )
    return (
        g.groupBy("nation")
        .agg(
            F.first("n").alias("n_lines"),
            (
                F.first("sum_all").cast("double")
                / F.first("n").cast("double")
            ).alias("mean_lead_days"),
            F.min(F.when(F.col("cum") >= F.col("i50"), F.col("lead_days"))).alias("p50_d"),
            F.min(F.when(F.col("cum") >= F.col("i90"), F.col("lead_days"))).alias("p90_d"),
            F.min(F.when(F.col("cum") >= F.col("i99"), F.col("lead_days"))).alias("p99_d"),
        )
        .orderBy("nation")
    )


ORACLE_supplier_leadtime_quantiles = """
WITH lead AS (
    SELECT n.n_name AS nation,
           (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
               AS lead_days
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
), grid AS (
    SELECT nation, lead_days,
           count(*) AS cnt, CAST(sum(lead_days) AS BIGINT) AS day_sum
    FROM lead GROUP BY nation, lead_days
), g AS (
    SELECT nation, lead_days, cnt,
           sum(cnt) OVER (PARTITION BY nation) AS n,
           sum(day_sum) OVER (PARTITION BY nation) AS sum_all,
           sum(cnt) OVER (PARTITION BY nation ORDER BY lead_days
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM grid
)
SELECT nation,
       CAST(any_value(n) AS BIGINT) AS n_lines,
       CAST(any_value(sum_all) AS DOUBLE) / CAST(any_value(n) AS DOUBLE)
           AS mean_lead_days,
       CAST(min(CASE WHEN cum >= (50 * n + 99) // 100 THEN lead_days END)
            AS BIGINT) AS p50_d,
       CAST(min(CASE WHEN cum >= (90 * n + 99) // 100 THEN lead_days END)
            AS BIGINT) AS p90_d,
       CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN lead_days END)
            AS BIGINT) AS p99_d
FROM g
GROUP BY nation
ORDER BY nation
"""


# -------- A114: order-value Gini concentration per segment (round 16) -----
def orders_gini_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A114: the Gini coefficient of order value per market segment —
    the inequality measure that complements T43's HHI (HHI asks "how
    few keys hold the mass"; Gini asks "how unequal is the whole
    distribution"), the standard concentration audit for revenue,
    token-count and shard-size distributions alike.

    Exactness: for values sorted ascending, G = (2·Σᵢ i·xᵢ − (n+1)·Σx)
    / (n·Σx).  The rank sum is computed WITHOUT any per-row sort via
    the distinct-value grid (the A106/P18 stage rule): a value v with
    count c and cumulative count C occupies ranks C−c+1..C, so
    2·Σ i·xᵢ = Σ_v v·c·(2C−c+1) — the factor-2 form is summed
    directly, so no halving division ever happens and every term is
    exact int64; Gini is one truncating ppm division.  Tie order
    cannot matter: equal values occupy a contiguous rank block whose
    sum is order-free.

    Scale: one broadcast join (customer segment), one map-side-combined
    (segment, cents) grid aggregate, windows on the ≤|segments|·
    |distinct values| grid.  int64 bound: Σ i·x ≤ n²·max_x — at 10⁹
    orders/segment switch the grid sums to the A33 two-level (hi/lo)
    split; the gate pins today's regime."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    seg = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        cents("o_totalprice").alias("v"),
    )
    return gini_report(gini_grid(seg))


def gini_grid(seg: DataFrame) -> DataFrame:
    """(segment, v) → count grid — one commutative integer aggregate,
    shared verbatim by the batch plan and the T49 streaming monitor
    (complete-mode micro-batch merge ≡ this grid, the T41 rule)."""
    return seg.groupBy("segment", "v").agg(F.count(F.lit(1)).alias("c"))


def gini_report(grid: DataFrame) -> DataFrame:
    """The A114 rank-sum derivation over the reduced grid."""
    ws = Window.partitionBy("segment")
    wcum = ws.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    g = (
        grid.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(ws))
        .withColumn("s0", F.sum(F.expr("v * c")).over(ws))
        .withColumn("t2", F.expr("v * c * (2 * cum - c + 1)"))
    )
    return (
        g.groupBy("segment")
        .agg(
            F.first("n").alias("n_orders"),
            F.first("s0").alias("total_cents"),
            # truncation chain: (num div n)·10⁶ div s0 — dividing by n
            # FIRST keeps the ×10⁶ product inside int64 (num ≤ n·s0, so
            # num·10⁶ overflows at sf0.01 already); identical chain in
            # the DuckDB twin, so the truncation drift is gate-pinned
            F.expr(
                "((sum(t2) - (first(n) + 1) * first(s0)) div first(n))"
                " * 1000000 div first(s0)"
            ).alias("gini_ppm"),
        )
        .orderBy("segment")
    )


ORACLE_orders_gini_segment = """
WITH seg AS (
    SELECT c.c_mktsegment AS segment,
           CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS v
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), grid AS (
    SELECT segment, v, CAST(count(*) AS BIGINT) AS c
    FROM seg GROUP BY segment, v
), g AS (
    SELECT segment, v, c,
           sum(c) OVER (PARTITION BY segment ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY segment) AS n,
           sum(v * c) OVER (PARTITION BY segment) AS s0
    FROM grid
)
SELECT segment,
       CAST(any_value(n) AS BIGINT) AS n_orders,
       CAST(any_value(s0) AS BIGINT) AS total_cents,
       CAST(((sum(v * c * (2 * cum - c + 1)) - (any_value(n) + 1)
              * any_value(s0)) // any_value(n)) * 1000000
            // any_value(s0) AS BIGINT) AS gini_ppm
FROM g
GROUP BY segment
ORDER BY segment
"""


# -------- A115: Lorenz curve deciles per segment (round 16) ---------------
def orders_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A115: the Lorenz curve behind A114's Gini — per segment, the
    cumulative VALUE share held by the poorest d/10 of orders, the
    curve a concentration review actually plots (Gini is its area;
    the curve says WHERE the inequality lives: a kinked tail means a
    few whales, a uniform bow means broad spread).

    Exactness: population deciles are nearest-rank edges r_d =
    (d·n) div 10 on the same distinct-value grid as A114 (value v with
    cumulative count C occupies ranks C−c+1..C); the cumulative value
    at rank r is S_v − v·(C_v − r) for the smallest v with C_v ≥ r —
    the partial block subtracts exactly; shares are truncating ppm.
    Scale: the A114 grid aggregate + a broadcast 10-row decile spine
    joined against the ≤|segments|·|distinct values| grid — no per-row
    sort, no new corpus exchange."""
    from project_obsidian_core_spark.plans.common import cents as _cents

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    seg = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        _cents("o_totalprice").alias("v"),
    )
    grid = gini_grid(seg)
    ws = Window.partitionBy("segment")
    wcum = ws.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    g = (
        grid.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("cumval", F.sum(F.expr("v * c")).over(wcum))
        .withColumn("n", F.sum("c").over(ws))
        .withColumn("s0", F.sum(F.expr("v * c")).over(ws))
    )
    spine = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    return (
        g.crossJoin(F.broadcast(spine))
        .withColumn("r", F.expr("(decile * n) div 10"))
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("segment", "decile")
        .agg(
            F.first("r").alias("pop_rank"),
            F.min(F.struct("v", "cum", "cumval")).alias("edge"),
        )
        .select(
            "segment",
            "decile",
            "pop_rank",
            F.expr("edge.cumval - edge.v * (edge.cum - pop_rank)").alias(
                "cum_value_cents"
            ),
        )
        .join(
            F.broadcast(
                g.groupBy("segment").agg(F.max("s0").alias("s0"))
            ),
            "segment",
        )
        .select(
            "segment",
            "decile",
            "pop_rank",
            "cum_value_cents",
            F.expr("cum_value_cents * 1000000 div s0").alias(
                "value_share_ppm"
            ),
        )
        .orderBy("segment", "decile")
    )


ORACLE_orders_lorenz_deciles = """
WITH seg AS (
    SELECT c.c_mktsegment AS segment,
           CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS v
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), grid AS (
    SELECT segment, v, CAST(count(*) AS BIGINT) AS c
    FROM seg GROUP BY segment, v
), g AS (
    SELECT segment, v, c,
           sum(c) OVER (PARTITION BY segment ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(v * c) OVER (PARTITION BY segment ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cumval,
           sum(c) OVER (PARTITION BY segment) AS n,
           sum(v * c) OVER (PARTITION BY segment) AS s0
    FROM grid
), edges AS (
    SELECT segment, d.decile, (d.decile * n) // 10 AS r,
           min(struct_pack(v := v, cum := cum, cumval := cumval)) AS edge,
           max(s0) AS s0
    FROM g, (SELECT unnest(generate_series(1, 10)) AS decile) d
    WHERE cum >= (d.decile * n) // 10
    GROUP BY segment, d.decile, (d.decile * n) // 10
)
SELECT segment,
       CAST(decile AS INT) AS decile,
       CAST(r AS BIGINT) AS pop_rank,
       CAST(edge['cumval'] - edge['v'] * (edge['cum'] - r) AS BIGINT)
           AS cum_value_cents,
       CAST((edge['cumval'] - edge['v'] * (edge['cum'] - r)) * 1000000
            // s0 AS BIGINT) AS value_share_ppm
FROM edges
ORDER BY segment, decile
"""
