"""Fact-table maintenance: small-file compaction + partition statistics.

Druid runs background segment compaction; the Parquet equivalent is
rewriting hour partitions that have accumulated many small files (every
streaming micro-batch appends at least one file per partition) into a few
target-sized files. At 100 TB this is the difference between a scan planning
millions of splits and planning thousands.

Compaction is per-partition and idempotent: each (event_date, event_hour)
directory is rewritten independently with an overwrite of just that
directory, so a failed job leaves untouched partitions valid and a retry
redoes only its own partition. Run it as a scheduled batch job over
partitions older than the streaming watermark (they no longer receive
appends).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 256 * 1024 * 1024


@dataclass
class PartitionStats:
    partition: str       # e.g. "event_date=2026-03-01/event_hour=10"
    n_files: int
    total_bytes: int


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def partition_stats(spark: SparkSession, path: str) -> list[PartitionStats]:
    """File count/bytes per leaf partition directory (two-level layout)."""
    fs, root, jvm = _fs_and_path(spark, path)
    out: list[PartitionStats] = []
    for date_dir in fs.listStatus(root):
        if not date_dir.isDirectory() or not date_dir.getPath().getName().startswith("event_date="):
            continue
        for hour_dir in fs.listStatus(date_dir.getPath()):
            # only real partition leaves: skips hidden/working dirs outright
            if not hour_dir.isDirectory() or not hour_dir.getPath().getName().startswith(
                "event_hour="
            ):
                continue
            files = [
                f
                for f in fs.listStatus(hour_dir.getPath())
                if f.isFile() and f.getPath().getName().endswith(".parquet")
            ]
            out.append(
                PartitionStats(
                    partition=f"{date_dir.getPath().getName()}/{hour_dir.getPath().getName()}",
                    n_files=len(files),
                    total_bytes=sum(f.getLen() for f in files),
                )
            )
    return sorted(out, key=lambda s: s.partition)


def compact_partition(
    spark: SparkSession,
    path: str,
    partition: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite one leaf partition into ceil(bytes/target) files.

    Returns the new file count. Reads the leaf directory directly (the
    partition columns live in the path, not the files, and are restored on
    read of the root), coalesces, and overwrites only that directory.
    """
    fs, _, jvm = _fs_and_path(spark, path)
    leaf = f"{path}/{partition}"
    stats = [s for s in partition_stats(spark, path) if s.partition == partition]
    if not stats:
        raise ValueError(f"no such partition under {path}: {partition}")
    n_target = max(1, math.ceil(stats[0].total_bytes / target_file_bytes))
    df = spark.read.parquet(leaf).coalesce(n_target)

    # The rewrite lands under dot-prefixed working dirs at the table root:
    # Hadoop's partition discovery and FileInputFormat skip '.'/'_'-prefixed
    # paths, so concurrent readers never see the in-flight copy (a bare
    # '<leaf>__compact_tmp' sibling would be discovered as another leaf and
    # double every row mid-compaction, permanently on a crash-before-delete).
    tmp = f"{path}/.compact_tmp/{partition}"
    df.write.mode("overwrite").parquet(tmp)

    # Swap = rename old leaf aside, rename new one in, then delete the old.
    # The data-loss window is two metadata renames (vs. a recursive delete
    # before the old sequence's rename); a crash between them leaves the old
    # data recoverable under .compact_trash.
    P = jvm.org.apache.hadoop.fs.Path
    leaf_p, tmp_p = P(leaf), P(tmp)
    aside_p = P(f"{path}/.compact_trash/{partition}")
    fs.delete(aside_p, True)
    fs.mkdirs(aside_p.getParent())
    if not fs.rename(leaf_p, aside_p):
        raise IOError(f"compaction: could not move {leaf} aside")
    if not fs.rename(tmp_p, leaf_p):
        # restore the original leaf before surfacing the failure
        fs.rename(aside_p, leaf_p)
        raise IOError(f"compaction: could not move rewrite into {leaf}")
    fs.delete(aside_p, True)
    return n_target


def recover_compaction(spark: SparkSession, path: str) -> dict[str, str]:
    """Repair the table after a compaction crash; idempotent, safe to run
    at every maintenance-loop startup.

    The swap in :func:`compact_partition` is two metadata renames
    (leaf → ``.compact_trash``, ``.compact_tmp`` → leaf) followed by a
    trash delete. Every crash point leaves a recoverable state:

    - **between the renames**: the leaf is MISSING and the original data
      sits under ``.compact_trash`` → rename it back (restore).
    - **after the second rename, before the delete**: the leaf holds the
      rewrite and ``.compact_trash`` still holds the old copy → delete the
      trash (the rewrite is complete and equivalent).
    - **before the first rename**: only ``.compact_tmp`` leftovers exist →
      delete them (the next compaction rewrites from live data).

    Readers are correct at EVERY crash point except the missing-leaf
    window (rows temporarily absent, never doubled — both working dirs are
    dot-prefixed and invisible to partition discovery); recovery closes
    that window. Returns {partition: action}.
    """
    fs, _, jvm = _fs_and_path(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    actions: dict[str, str] = {}

    trash_root = P(f"{path}/.compact_trash")
    if fs.exists(trash_root):
        for date_dir in fs.listStatus(trash_root):
            for hour_dir in fs.listStatus(date_dir.getPath()):
                partition = f"{date_dir.getPath().getName()}/{hour_dir.getPath().getName()}"
                leaf_p = P(f"{path}/{partition}")
                if fs.exists(leaf_p):
                    # swap completed; old copy is redundant
                    fs.delete(hour_dir.getPath(), True)
                    actions[partition] = "dropped_stale_trash"
                else:
                    fs.mkdirs(leaf_p.getParent())
                    if not fs.rename(hour_dir.getPath(), leaf_p):
                        raise IOError(f"recovery: could not restore {partition}")
                    actions[partition] = "restored_from_trash"
        # prune now-empty date dirs, then the trash root itself
        for date_dir in fs.listStatus(trash_root):
            if len(list(fs.listStatus(date_dir.getPath()))) == 0:
                fs.delete(date_dir.getPath(), True)
        if len(list(fs.listStatus(trash_root))) == 0:
            fs.delete(trash_root, True)

    tmp_root = P(f"{path}/.compact_tmp")
    if fs.exists(tmp_root):
        fs.delete(tmp_root, True)
        actions.setdefault("_compact_tmp", "dropped_incomplete_rewrite")
    return actions


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files: int = 2,
) -> dict[str, int]:
    """Compact every partition with more than ``min_files`` files.

    Serial over partitions by design: each rewrite is itself a distributed
    job, and partition-at-a-time keeps the failure domain to one directory.
    Returns {partition: new_file_count} for the partitions rewritten.
    """
    done: dict[str, int] = {}
    for s in partition_stats(spark, path):
        if s.n_files > min_files:
            done[s.partition] = compact_partition(spark, path, s.partition, target_file_bytes)
    return done
