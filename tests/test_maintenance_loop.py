"""Compaction + adaptive collection loop tests."""

from __future__ import annotations

import datetime as dt
import random

from project_obsidian_core_spark.operators import maintenance as MT
from project_obsidian_core_spark.streaming.collection_loop import AdaptiveCollectionLoop
from project_obsidian_core_spark.streaming.governor import MAXIMUM_INTERVAL_S, AdaptiveGovernor


def _write_fragmented(spark, path, n_appends=4):
    ts = dt.datetime(2026, 3, 1, 10, 0, 0)
    for i in range(n_appends):
        df = spark.createDataFrame(
            [(ts, f"v{i}-{j}") for j in range(50)], ["time", "payload"]
        )
        (
            df.withColumn("event_date", df.time.cast("date"))
            .withColumn("event_hour", df.time.cast("timestamp").substr(12, 2).cast("int"))
            .coalesce(1)
            .write.mode("append")
            .partitionBy("event_date", "event_hour")
            .parquet(path)
        )


def test_partition_stats_and_compaction(spark, tmp_path):
    path = str(tmp_path / "fact")
    _write_fragmented(spark, path, n_appends=4)

    stats = MT.partition_stats(spark, path)
    assert len(stats) == 1
    assert stats[0].n_files == 4  # one file per append

    before = spark.read.parquet(path).orderBy("payload").collect()
    done = MT.compact_table(spark, path, target_file_bytes=1 << 30)
    assert done == {stats[0].partition: 1}

    after_stats = MT.partition_stats(spark, path)
    assert after_stats[0].n_files == 1
    # data survives byte-identical, partition columns intact
    after = spark.read.parquet(path).orderBy("payload").collect()
    assert [r["payload"] for r in after] == [r["payload"] for r in before]
    assert all(r["event_hour"] == 10 for r in after)

    # idempotent: nothing above min_files left to do
    assert MT.compact_table(spark, path) == {}


def test_inflight_compaction_invisible_to_readers(spark, tmp_path):
    # A crashed compaction leaves its rewrite under dot-prefixed working
    # dirs; partition discovery and full-table reads must not see it
    # (the old '<leaf>__compact_tmp' sibling layout doubled every row).
    path = str(tmp_path / "fact")
    _write_fragmented(spark, path, n_appends=3)
    n_before = spark.read.parquet(path).count()
    stats = MT.partition_stats(spark, path)

    # simulate a crash-before-swap: rewrite present under .compact_tmp
    leaf = f"{path}/{stats[0].partition}"
    spark.read.parquet(leaf).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/.compact_tmp/{stats[0].partition}"
    )
    assert spark.read.parquet(path).count() == n_before  # no duplication
    assert MT.partition_stats(spark, path) == stats  # discovery unchanged

    # retry after the simulated crash completes normally
    done = MT.compact_table(spark, path, target_file_bytes=1 << 30)
    assert done == {stats[0].partition: 1}
    assert spark.read.parquet(path).count() == n_before


def test_adaptive_loop_backs_off_and_recovers():
    gov = AdaptiveGovernor(base_interval_s=1.0, rng=random.Random(7))
    loads = [0.2] * 5 + [1.0] * 30 + [0.1] * 60
    it = iter(loads)
    slept = []
    loop = AdaptiveCollectionLoop(gov, lambda: next(it), sleep=slept.append)
    loop.run(max_ticks=len(loads))

    assert loop.ticks == len(loads)
    # quiet start: ~base interval
    assert all(0.9 <= s <= 1.1 for s in slept[:5])
    # sustained critical load: backed off to the 60 s max (±5% jitter)
    assert any(s > MAXIMUM_INTERVAL_S * 0.9 for s in slept[5:35])
    # recovery: slow EMA decays, interval returns to base by the end
    assert slept[-1] < 2.0
