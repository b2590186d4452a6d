"""Round-6 soak: partition-targeted MERGE vs full-snapshot rewrite.

A 2M-row snapshot in 64 bucket leaves takes a stream of small CDC batches
(200 keys each). Compare per-batch wall time of:

  a) merge_into_partitioned, HASH bucketing, random keys — worst case:
     200 random keys touch ~all 64 leaves, so targeting degenerates to a
     full rewrite plus rename overhead (documented in _bucket_expr)
  b) merge_into_partitioned, RANGE bucketing, clustered hot-range keys —
     the common CDC shape (recent rows get the updates): a batch touches
     O(1) leaves
  c) the r5 behavior: read whole snapshot, merge, rewrite everything

At 2M rows a full rewrite is trivially cheap, so (c) wins on raw wall —
the meaningful numbers are (b)'s touched-leaf count and per-batch cost,
which stay CONSTANT as the table grows while (c) grows linearly.

Usage: python scripts/soak_cdc_merge.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.operators.merge import (  # noqa: E402
    merge_into_partitioned,
    merge_upsert,
    read_partitioned_snapshot,
    write_partitioned_snapshot,
)
from project_obsidian_core_spark.session import build_session  # noqa: E402


def main() -> None:
    spark = build_session(app_name="soak-cdc-merge")
    n_rows, n_buckets, batch_keys, n_batches = 2_000_000, 64, 200, 3

    base = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        (F.col("id") * 13 % 100_000).alias("v"),
    )

    def make_batch(i: int):
        return spark.range(batch_keys).select(
            (F.col("id") * 9973 + i * 1_000_003).alias("k"),
            F.lit(f"updated-{i}").alias("name"),
            (F.col("id") + i).alias("v"),
            F.lit("U").alias("op"),
        )

    # a) partition-targeted
    tmp_a = tempfile.mkdtemp(prefix="soak_merge_a_")
    snap_a = f"{tmp_a}/snap"
    write_partitioned_snapshot(base, snap_a, keys=["k"], n_buckets=n_buckets)
    times_a, touched_counts = [], []
    for i in range(n_batches):
        t0 = time.time()
        touched = merge_into_partitioned(
            spark, snap_a, make_batch(i), keys=["k"], n_buckets=n_buckets
        )
        times_a.append(time.time() - t0)
        touched_counts.append(len(touched))
    n_a = read_partitioned_snapshot(spark, snap_a).count()

    # b) range bucketing + clustered hot-range batches (recent keys)
    range_sql = f"cast(k div {n_rows // n_buckets + 1} as int)"
    tmp_r = tempfile.mkdtemp(prefix="soak_merge_r_")
    snap_r = f"{tmp_r}/snap"
    write_partitioned_snapshot(
        base, snap_r, keys=["k"], n_buckets=n_buckets, bucket_sql=range_sql
    )

    def make_hot_batch(i: int):
        # updates cluster at the tail of the key space (recent rows)
        return spark.range(batch_keys).select(
            (F.lit(n_rows - 1) - F.col("id") * 3 - i).alias("k"),
            F.lit(f"hot-{i}").alias("name"),
            (F.col("id") + i).alias("v"),
            F.lit("U").alias("op"),
        )

    times_r, touched_r = [], []
    for i in range(n_batches):
        t0 = time.time()
        touched = merge_into_partitioned(
            spark, snap_r, make_hot_batch(i), keys=["k"],
            n_buckets=n_buckets, bucket_sql=range_sql,
        )
        times_r.append(time.time() - t0)
        touched_r.append(len(touched))
    n_r = read_partitioned_snapshot(spark, snap_r).count()

    # c) full rewrite (the r5 behavior)
    tmp_b = tempfile.mkdtemp(prefix="soak_merge_b_")
    snap_b = f"{tmp_b}/snap"
    base.write.mode("overwrite").parquet(snap_b)
    times_b = []
    for i in range(n_batches):
        t0 = time.time()
        merged = merge_upsert(spark.read.parquet(snap_b), make_batch(i), keys=["k"])
        nxt = f"{snap_b}.next"
        merged.write.mode("overwrite").parquet(nxt)
        old = f"{snap_b}.old"
        os.rename(snap_b, old)
        os.rename(nxt, snap_b)
        shutil.rmtree(old)
        times_b.append(time.time() - t0)
    n_b = spark.read.parquet(snap_b).count()

    fmt = lambda ts: "/".join(f"{t:.2f}" for t in ts)  # noqa: E731
    print(
        f"hash-bucketed merge, random keys ({n_rows} rows, {n_buckets} "
        f"buckets, {batch_keys}-key batches): {fmt(times_a)} s "
        f"touched={touched_counts} rows={n_a}"
    )
    print(
        f"range-bucketed merge, hot-range keys: {fmt(times_r)} s "
        f"touched={touched_r} rows={n_r}"
    )
    print(f"full-rewrite merge (r5 behavior): {fmt(times_b)} s rows={n_b}")
    shutil.rmtree(tmp_a)
    shutil.rmtree(tmp_r)
    shutil.rmtree(tmp_b)


if __name__ == "__main__":
    main()
