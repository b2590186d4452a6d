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


class _CrashingFS:
    """Delegating FileSystem proxy that raises at an injected call point."""

    def __init__(self, fs, crash_rename_at=None, crash_delete_at=None):
        self._fs = fs
        self._renames = 0
        self._deletes = 0
        self._crash_rename_at = crash_rename_at
        self._crash_delete_at = crash_delete_at

    def rename(self, src, dst):
        self._renames += 1
        if self._renames == self._crash_rename_at:
            raise RuntimeError("injected crash: kill between renames")
        return self._fs.rename(src, dst)

    def delete(self, p, recursive):
        self._deletes += 1
        if self._deletes == self._crash_delete_at:
            raise RuntimeError("injected crash: kill before trash delete")
        return self._fs.delete(p, recursive)

    def __getattr__(self, name):
        return getattr(self._fs, name)


def _patch_fs(monkeypatch, **crash_kw):
    real = MT._fs_and_path

    def patched(spark, path):
        fs, hpath, jvm = real(spark, path)
        return _CrashingFS(fs, **crash_kw), hpath, jvm

    monkeypatch.setattr(MT, "_fs_and_path", patched)


def test_crash_between_renames_recovers_from_trash(spark, tmp_path, monkeypatch):
    import pytest

    path = str(tmp_path / "fact")
    _write_fragmented(spark, path, n_appends=3)
    baseline = sorted(r["payload"] for r in spark.read.parquet(path).collect())
    stats = MT.partition_stats(spark, path)

    # rename #1 = leaf -> trash, rename #2 = tmp -> leaf: die in between
    _patch_fs(monkeypatch, crash_rename_at=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        MT.compact_partition(spark, path, stats[0].partition)
    monkeypatch.undo()

    # crash window: rows may be absent but are NEVER doubled
    import glob

    leaf_files = glob.glob(f"{path}/{stats[0].partition}/*.parquet")
    assert leaf_files == []  # leaf went aside; rewrite not yet promoted
    assert MT.partition_stats(spark, path) == []  # discovery sees no leaf

    actions = MT.recover_compaction(spark, path)
    assert actions[stats[0].partition] == "restored_from_trash"
    restored = sorted(r["payload"] for r in spark.read.parquet(path).collect())
    assert restored == baseline
    # recovery is idempotent and leaves no working dirs behind
    assert MT.recover_compaction(spark, path) == {}
    # the table compacts normally afterwards
    assert MT.compact_table(spark, path, target_file_bytes=1 << 30) == {
        stats[0].partition: 1
    }
    assert sorted(r["payload"] for r in spark.read.parquet(path).collect()) == baseline


def test_crash_before_trash_delete_drops_stale_copy(spark, tmp_path, monkeypatch):
    import pytest

    path = str(tmp_path / "fact")
    _write_fragmented(spark, path, n_appends=3)
    baseline = sorted(r["payload"] for r in spark.read.parquet(path).collect())
    stats = MT.partition_stats(spark, path)

    # delete #1 clears any old trash pre-swap; delete #2 is the post-swap
    # trash removal: die right before it
    _patch_fs(monkeypatch, crash_delete_at=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        MT.compact_partition(spark, path, stats[0].partition)
    monkeypatch.undo()

    # swap completed: readers see exactly the baseline rows (old copy is
    # dot-prefixed and invisible) — never doubled
    assert sorted(r["payload"] for r in spark.read.parquet(path).collect()) == baseline
    assert MT.partition_stats(spark, path)[0].n_files == 1

    actions = MT.recover_compaction(spark, path)
    assert actions[stats[0].partition] == "dropped_stale_trash"
    assert sorted(r["payload"] for r in spark.read.parquet(path).collect()) == baseline
    assert MT.recover_compaction(spark, path) == {}


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
