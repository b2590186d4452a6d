"""Driver-facing CDC / table-maintenance queries (operators/merge.py).

A deterministic CDC batch is derived from the orders table itself (key
arithmetic only, no randomness) so the Spark MERGE result and the DuckDB
oracle reconstruct the identical post-merge snapshot:

- keys ``o_orderkey % 10 == 3``  → **U**: status forced to 'F', price +500c
- keys ``o_orderkey % 10 == 7``  → **D**: removed
- keys ``o_orderkey % 10 == 5``  → **I**: re-keyed clone at key+10^9 (new
  key space), priority tagged 'CDC-INSERT'

``orders_cdc_merge`` returns the merged snapshot (one row per surviving
key); ``orders_scd2`` builds the SCD2 validity-interval history of each
customer's order timeline with lead() windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.operators.merge import merge_upsert, scd2_history
from project_obsidian_core_spark.plans.common import cents, load

_NEW_KEY_OFFSET = 1_000_000_000


def _orders_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        cents("o_totalprice").alias("price_cents"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
        "o_orderpriority",
    )


def _cdc_batch(base: DataFrame) -> DataFrame:
    """Deterministic I/U/D batch derived from the base snapshot."""
    m = F.col("o_orderkey") % 10
    updates = (
        base.filter(m == 3)
        .withColumn("o_orderstatus", F.lit("F"))
        .withColumn("price_cents", F.col("price_cents") + F.lit(500))
        .withColumn("op", F.lit("U"))
    )
    deletes = base.filter(m == 7).withColumn("op", F.lit("D"))
    inserts = (
        base.filter(m == 5)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(_NEW_KEY_OFFSET))
        .withColumn("o_orderpriority", F.lit("CDC-INSERT"))
        .withColumn("op", F.lit("I"))
    )
    return updates.unionByName(deletes).unionByName(inserts)


def orders_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on the orders snapshot (insert/update/delete).

    The base is scanned once and anti-joined against the touched-key set
    (broadcast at any realistic batch:base ratio); change rows with op≠D are
    unioned in. No base-side shuffle when the batch broadcasts.
    """
    base = _orders_snapshot(spark, sf_dir)
    merged = merge_upsert(base, _cdc_batch(base), keys=["o_orderkey"])
    return merged.orderBy("o_orderkey")


ORACLE_orders_cdc_merge = """
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
           epoch_us(o_orderdate) AS order_us,
           o_orderpriority
    FROM orders
), changes AS (
    SELECT o_orderkey, o_custkey, 'F' AS o_orderstatus,
           price_cents + 500 AS price_cents, order_us, o_orderpriority,
           'U' AS op
    FROM base WHERE o_orderkey % 10 = 3
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
           o_orderpriority, 'D' AS op
    FROM base WHERE o_orderkey % 10 = 7
    UNION ALL
    SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus, price_cents,
           order_us, 'CDC-INSERT' AS o_orderpriority, 'I' AS op
    FROM base WHERE o_orderkey % 10 = 5
)
SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
       o_orderpriority
FROM base
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
       o_orderpriority
FROM changes WHERE op <> 'D'
ORDER BY o_orderkey
"""


def orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals over each customer's order timeline.

    One shuffle on the entity key (customer); lead() supplies valid_to and
    the is_current flag. valid_to is NULL on the open interval — rendered
    as -1 so the hash gate compares exact BIGINTs.
    """
    base = _orders_snapshot(spark, sf_dir)
    hist = scd2_history(
        base,
        entity_col="o_custkey",
        order_col="order_us",
        tiebreak_col="o_orderkey",
    )
    return hist.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("valid_from").cast("long").alias("valid_from_us"),
        F.coalesce(F.col("valid_to"), F.lit(-1)).cast("long").alias("valid_to_us"),
        "is_current",
    ).orderBy("o_custkey", "valid_from_us", "o_orderkey")


ORACLE_orders_scd2 = """
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           epoch_us(o_orderdate) AS order_us
    FROM orders
)
SELECT o_custkey, o_orderkey, o_orderstatus,
       order_us AS valid_from_us,
       coalesce(lead(order_us) OVER w, -1) AS valid_to_us,
       lead(order_us) OVER w IS NULL AS is_current
FROM base
WINDOW w AS (PARTITION BY o_custkey ORDER BY order_us, o_orderkey)
ORDER BY o_custkey, valid_from_us, o_orderkey
"""


_AS_OF = "1998-06-15 00:00:00"


def orders_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read over the SCD2 history: the state of
    each customer's order timeline AS OF a fixed instant — which history
    row was current, and the cumulative orders/spend booked by then.

    The interval predicate ``valid_from <= T < valid_to`` turns time travel
    into a plain filter over the history relation (the lakehouse pattern:
    SCD2 + predicate instead of snapshot copies); the cumulative columns
    come from the same single pass. One shuffle on the entity key total.
    """
    base = _orders_snapshot(spark, sf_dir)
    hist = scd2_history(
        base,
        entity_col="o_custkey",
        order_col="order_us",
        tiebreak_col="o_orderkey",
    )
    t = F.unix_micros(F.lit(_AS_OF).cast("timestamp"))
    current = hist.filter(
        (F.col("valid_from") <= t)
        & (F.coalesce(F.col("valid_to"), F.lit(2**62)) > t)
    )
    cum = current.select(
        "o_custkey",
        F.col("o_orderkey").alias("current_orderkey"),
        F.col("o_orderstatus").alias("current_status"),
        F.col("valid_from").cast("long").alias("valid_from_us"),
    )
    booked = (
        base.filter(F.col("order_us") <= t)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders_asof"),
            F.sum("price_cents").alias("spend_cents_asof"),
        )
    )
    return (
        cum.join(booked, "o_custkey")
        .orderBy("o_custkey")
    )


ORACLE_orders_asof_snapshot = f"""
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
           epoch_us(o_orderdate) AS order_us
    FROM orders
), hist AS (
    SELECT o_custkey, o_orderkey, o_orderstatus,
           order_us AS valid_from,
           lead(order_us) OVER (PARTITION BY o_custkey
                                ORDER BY order_us, o_orderkey) AS valid_to
    FROM base
), t AS (SELECT epoch_us(TIMESTAMP '{_AS_OF}') AS pit)
SELECT h.o_custkey,
       h.o_orderkey AS current_orderkey,
       h.o_orderstatus AS current_status,
       h.valid_from AS valid_from_us,
       b.n_orders_asof,
       b.spend_cents_asof
FROM hist h
CROSS JOIN t
JOIN (
    SELECT o_custkey,
           count(*) AS n_orders_asof,
           CAST(sum(price_cents) AS BIGINT) AS spend_cents_asof
    FROM base CROSS JOIN t WHERE order_us <= pit GROUP BY o_custkey
) b ON b.o_custkey = h.o_custkey
WHERE h.valid_from <= pit AND coalesce(h.valid_to, 4611686018427387904) > pit
ORDER BY h.o_custkey
"""


def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed generation: diff the pre- and post-MERGE order
    snapshots back into the I/U/D batch (operators/merge.py
    ``snapshot_diff`` — the inverse of ``merge_upsert``, Delta CDF
    semantics from plain snapshots).

    The oracle reconstructs the same feed with a FULL OUTER JOIN, so the
    gate pins insert/update/delete classification AND the emitted row
    images (new image for I/U, old image for D).
    """
    from project_obsidian_core_spark.operators.merge import snapshot_diff

    base = _orders_snapshot(spark, sf_dir)
    merged = merge_upsert(base, _cdc_batch(base), keys=["o_orderkey"])
    return snapshot_diff(base, merged, keys=["o_orderkey"]).orderBy(
        "op", "o_orderkey"
    )


ORACLE_orders_snapshot_diff = """
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
           epoch_us(o_orderdate) AS order_us,
           o_orderpriority
    FROM orders
), changes AS (
    SELECT o_orderkey, o_custkey, 'F' AS o_orderstatus,
           price_cents + 500 AS price_cents, order_us, o_orderpriority,
           'U' AS op
    FROM base WHERE o_orderkey % 10 = 3
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
           o_orderpriority, 'D' AS op
    FROM base WHERE o_orderkey % 10 = 7
    UNION ALL
    SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus, price_cents,
           order_us, 'CDC-INSERT' AS o_orderpriority, 'I' AS op
    FROM base WHERE o_orderkey % 10 = 5
), merged AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
           o_orderpriority
    FROM base
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
           o_orderpriority
    FROM changes WHERE op <> 'D'
)
SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
       CASE WHEN n.o_orderkey IS NULL THEN o.o_custkey ELSE n.o_custkey END AS o_custkey,
       CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus ELSE n.o_orderstatus END AS o_orderstatus,
       CASE WHEN n.o_orderkey IS NULL THEN o.price_cents ELSE n.price_cents END AS price_cents,
       CASE WHEN n.o_orderkey IS NULL THEN o.order_us ELSE n.order_us END AS order_us,
       CASE WHEN n.o_orderkey IS NULL THEN o.o_orderpriority ELSE n.o_orderpriority END AS o_orderpriority,
       CASE WHEN o.o_orderkey IS NULL THEN 'I'
            WHEN n.o_orderkey IS NULL THEN 'D'
            ELSE 'U' END AS op
FROM base o FULL OUTER JOIN merged n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_custkey IS DISTINCT FROM n.o_custkey
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
   OR o.price_cents IS DISTINCT FROM n.price_cents
   OR o.order_us IS DISTINCT FROM n.order_us
   OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
ORDER BY op, o_orderkey
"""


# ------------------------------------------------------- merge-on-read ----
def _cdc_batch2(base: DataFrame) -> DataFrame:
    """Second deterministic delta batch, defined from the BASE image (full
    row images, so sequential-merge composition == per-key latest-wins):
    overrides some batch-1 updates, deletes one batch-1 update cohort and
    one batch-1 insert cohort, touches fresh keys, inserts a new cohort."""
    k = F.col("o_orderkey")
    override = (
        base.filter((k % 10 == 3) & (k % 100 == 23))
        .withColumn("o_orderstatus", F.lit("P"))
        .withColumn("price_cents", F.col("price_cents") + F.lit(1200))
        .withColumn("op", F.lit("U"))
    )
    del_updated = base.filter((k % 10 == 3) & (k % 100 == 33)).withColumn(
        "op", F.lit("D")
    )
    del_inserted = (
        base.filter((k % 10 == 5) & (k % 100 == 15))
        .withColumn("o_orderkey", k + F.lit(_NEW_KEY_OFFSET))
        .withColumn("op", F.lit("D"))
    )
    fresh = (
        base.filter(k % 10 == 1)
        .withColumn("price_cents", F.col("price_cents") + F.lit(11))
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        base.filter(k % 10 == 9)
        .withColumn("o_orderkey", k + F.lit(2 * _NEW_KEY_OFFSET))
        .withColumn("o_orderpriority", F.lit("CDC-INSERT-2"))
        .withColumn("op", F.lit("I"))
    )
    return (
        override.unionByName(del_updated)
        .unionByName(del_inserted)
        .unionByName(fresh)
        .unionByName(inserts)
    )


def orders_mor_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J16: merge-on-read CDC — the base snapshot plus TWO delta batches
    written as O(|batch|) delta files (never rewriting the base), folded
    at read time by :func:`operators.merge.read_mor` (per-key
    latest-batch-wins + broadcast anti-join). The oracle composes the
    same two batches as SEQUENTIAL MERGE steps, so a green row proves
    read-time folding ≡ eager copy-on-write merging — the equivalence a
    lakehouse needs before it may defer compaction."""
    import os

    from project_obsidian_core_spark.operators.merge import (
        append_mor_delta,
        read_mor,
        write_mor_base,
    )

    base = _orders_snapshot(spark, sf_dir)
    # pid-scoped path: concurrent processes must not clobber each other's
    # base/delta files mid-read
    tag = (
        os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
        + f"_{os.getpid()}"
    )
    path = f"/tmp/spark_graft_mor/{tag}"
    write_mor_base(base, path)
    append_mor_delta(_cdc_batch(base), path, seq=1)
    append_mor_delta(_cdc_batch2(base), path, seq=2)
    return read_mor(spark, path, keys=["o_orderkey"]).orderBy("o_orderkey")


ORACLE_orders_mor_merge = """
WITH base AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
           epoch_us(o_orderdate) AS order_us,
           o_orderpriority
    FROM orders
), c1 AS (
    SELECT o_orderkey, o_custkey, 'F' AS o_orderstatus,
           price_cents + 500 AS price_cents, order_us, o_orderpriority,
           'U' AS op
    FROM base WHERE o_orderkey % 10 = 3
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
           o_orderpriority, 'D' AS op
    FROM base WHERE o_orderkey % 10 = 7
    UNION ALL
    SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus, price_cents,
           order_us, 'CDC-INSERT' AS o_orderpriority, 'I' AS op
    FROM base WHERE o_orderkey % 10 = 5
), m1 AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
           o_orderpriority
    FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM c1)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
           o_orderpriority
    FROM c1 WHERE op <> 'D'
), c2 AS (
    SELECT o_orderkey, o_custkey, 'P' AS o_orderstatus,
           price_cents + 1200 AS price_cents, order_us, o_orderpriority,
           'U' AS op
    FROM base WHERE o_orderkey % 10 = 3 AND o_orderkey % 100 = 23
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
           o_orderpriority, 'D' AS op
    FROM base WHERE o_orderkey % 10 = 3 AND o_orderkey % 100 = 33
    UNION ALL
    SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus, price_cents,
           order_us, o_orderpriority, 'D' AS op
    FROM base WHERE o_orderkey % 10 = 5 AND o_orderkey % 100 = 15
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, price_cents + 11, order_us,
           o_orderpriority, 'U' AS op
    FROM base WHERE o_orderkey % 10 = 1
    UNION ALL
    SELECT o_orderkey + 2000000000, o_custkey, o_orderstatus, price_cents,
           order_us, 'CDC-INSERT-2' AS o_orderpriority, 'I' AS op
    FROM base WHERE o_orderkey % 10 = 9
)
SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
       o_orderpriority
FROM m1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM c2)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, order_us,
       o_orderpriority
FROM c2 WHERE op <> 'D'
ORDER BY o_orderkey
"""
