"""Round-8 soak: measured scale behavior of the three round-8 operators
whose 100 TB story rests on a cost-model claim.

1. **Merge-on-read degradation curve** (operators/merge.py): base of
   `--rows` rows; apply k ∈ {1, 2, 4, 8, 16} accumulated delta batches
   (1% of base each) and time the `read_mor` reconstruction vs a plain
   read of the equivalent compacted snapshot.  The claim under test:
   read cost grows with the delta ledger and compaction resets it —
   i.e. the CoW/MOR amortization is real, not narrative.

2. **Bucketed co-located join** (operators/bucketing.py): orders ⋈
   lineitem per-order aggregate at sf0.1, bucketed-table plan (no
   exchange before the join) vs the identical query over raw parquet
   (dual shuffle), both forced to SortMergeJoin.  Claim: the write-once
   bucketing pays back per-query shuffle savings.

3. **Two-pass exact heavy hitters** (analytics/heavy_hitters.py): a
   high-cardinality synthetic stream (hot head + unique tail, `--rows`
   rows) through the sketch-pruned two-pass plan vs the naive
   groupBy-every-key + filter plan.  Claim: pruning the key space before
   the shuffle wins when distinct keys ~ rows.

Usage: python scripts/soak_r8.py [--rows N]   (default 5M)
Writes human-readable results to stdout; summarize into SCALE.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.session import build_session  # noqa: E402


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def soak_mor(spark, n_rows: int) -> None:
    from project_obsidian_core_spark.operators.merge import (
        append_mor_delta,
        read_mor,
        write_mor_base,
    )

    root = tempfile.mkdtemp(prefix="soak_mor_")
    path = f"{root}/t"
    base = spark.range(0, n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.sha1(F.col("id").cast("string")).alias("pad"),
    )
    write_mor_base(base, path)
    batch_sz = max(1, n_rows // 100)
    print(f"[mor] base={n_rows} rows, delta batch={batch_sz} rows (1%)")
    for seq in range(1, 17):
        delta = spark.range(0, batch_sz).select(
            ((F.col("id") * 7919 + seq) % n_rows).alias("k"),
            F.lit(seq).alias("v"),
            F.sha1(F.col("id").cast("string")).alias("pad"),
            F.lit("U").alias("op"),
        )
        append_mor_delta(delta, path, seq=seq)
        if seq in (1, 2, 4, 8, 16):
            _, t = _timed(lambda: read_mor(spark, path, ["k"]).count())
            # compacted equivalent: one plain parquet scan
            if seq == 1:
                comp = f"{root}/compacted"
                read_mor(spark, path, ["k"]).write.mode("overwrite").parquet(
                    comp
                )
            _, tc = _timed(lambda: spark.read.parquet(comp).count())
            print(
                f"[mor] deltas={seq:3d}  read_mor={t:6.2f}s  "
                f"compacted_scan={tc:6.2f}s  overhead={t / tc:5.2f}x"
            )
    shutil.rmtree(root, ignore_errors=True)


def soak_bucketed_join(spark, sf_dir: str) -> None:
    from project_obsidian_core_spark.operators import bucketing as B
    from project_obsidian_core_spark.plans.common import cents, load

    root = tempfile.mkdtemp(prefix="soak_bkt_")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        cents("l_extendedprice").alias("ext"),
    )
    B.write_bucketed(orders, "soak_bo", ["o_orderkey"], 32, path=f"{root}/o")
    B.write_bucketed(li, "soak_bl", ["o_orderkey"], 32, path=f"{root}/l")

    def agg(j):
        return (
            j.groupBy("o_orderkey", "o_orderpriority")
            .agg(F.sum("ext").alias("rev"))
            .orderBy(F.col("rev").desc(), "o_orderkey")
            .limit(100)
            .collect()
        )

    for tag, mk in (
        (
            "bucketed ",
            lambda: B.co_located_join(
                spark, "soak_bo", "soak_bl", ["o_orderkey"], force_sortmerge=True
            ),
        ),
        ("raw-SMJ  ", lambda: orders.hint("merge").join(li, ["o_orderkey"])),
    ):
        for rep in range(3):
            _, t = _timed(lambda: agg(mk()))
            print(f"[bucketed-join] {tag} rep{rep}  {t:6.2f}s")
    for tbl in ("soak_bo", "soak_bl"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(root, ignore_errors=True)


def soak_heavy_hitters(spark, n_rows: int) -> None:
    from fractions import Fraction

    from project_obsidian_core_spark.analytics.heavy_hitters import (
        heavy_hitters,
    )

    # 60% of rows over 20 hot keys; 40% unique tail -> distinct ~ 0.4*n
    df = spark.range(0, n_rows).select(
        F.when(
            F.col("id") % 5 < 3,
            F.concat(F.lit("hot_"), (F.col("id") % 20).cast("string")),
        )
        .otherwise(F.concat(F.lit("tail_"), F.col("id").cast("string")))
        .alias("key")
    )
    phi = Fraction(1, 100)

    def naive():
        total = df.count()
        return (
            df.groupBy("key")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * phi.denominator > total * phi.numerator)
            .collect()
        )

    for rep in range(3):
        got, t = _timed(lambda: heavy_hitters(df, phi=phi).collect())
        print(f"[hh] two-pass rep{rep}  {t:6.2f}s  ({len(got)} keys)")
    for rep in range(3):
        got, t = _timed(naive)
        print(f"[hh] naive    rep{rep}  {t:6.2f}s  ({len(got)} keys)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = build_session(app_name="soak_r8")
    spark.sparkContext.setLogLevel("ERROR")
    soak_mor(spark, args.rows)
    soak_bucketed_join(spark, args.sf_dir)
    soak_heavy_hitters(spark, args.rows)
    spark.stop()


if __name__ == "__main__":
    main()
