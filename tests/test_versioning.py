"""Versioned corpus snapshots: pinning, isolation, crash safety."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from project_obsidian_core_spark.operators import versioning as V


def test_snapshot_pinning_and_latest(spark):
    root = tempfile.mkdtemp(prefix="corpus_ver_")
    d1 = spark.range(10).select(F.col("id").alias("doc_id"))
    d2 = spark.range(25).select(F.col("id").alias("doc_id"))
    assert V.write_snapshot(d1, root) == 1
    assert V.write_snapshot(d2, root) == 2
    assert V.latest_version(root) == 2
    # pinned read returns the exact old dataset after newer writes
    assert V.read_snapshot(spark, root, version=1).count() == 10
    assert V.read_snapshot(spark, root).count() == 25


def test_dangling_partial_version_is_invisible(spark):
    root = tempfile.mkdtemp(prefix="corpus_ver_crash_")
    V.write_snapshot(spark.range(5).select(F.col("id").alias("doc_id")), root)
    # simulate a writer that crashed after data files, before publishing:
    # v=2 exists on disk but _LATEST still says 1
    crashed = os.path.join(root, "v=2")
    spark.range(99).select(F.col("id").alias("doc_id")).write.parquet(crashed)
    assert V.latest_version(root) == 1
    assert V.read_snapshot(spark, root).count() == 5  # reader never sees v=2


def test_manifest_guards_against_listing_races(spark):
    root = tempfile.mkdtemp(prefix="corpus_ver_manifest_")
    V.write_snapshot(spark.range(7).select(F.col("id").alias("doc_id")), root)
    # a stray file dropped into the version dir is not part of the snapshot
    stray = os.path.join(root, "v=1", "stray.parquet")
    spark.range(50).select(F.col("id").alias("doc_id")).coalesce(1).write.parquet(
        stray
    )
    assert V.read_snapshot(spark, root, version=1).count() == 7


def test_write_recovers_after_crashed_writer(spark):
    import tempfile

    root = tempfile.mkdtemp(prefix="corpus_ver_recover_")
    V.write_snapshot(spark.range(5).select(F.col("id").alias("doc_id")), root)
    # crashed writer left v=2 unpublished; the next write must skip past it
    spark.range(9).select(F.col("id").alias("doc_id")).write.parquet(
        os.path.join(root, "v=2")
    )
    v = V.write_snapshot(spark.range(3).select(F.col("id").alias("doc_id")), root)
    assert v == 3
    assert V.latest_version(root) == 3
    assert V.read_snapshot(spark, root).count() == 3


def test_vacuum_keeps_latest_and_inflight(spark, tmp_path):
    """Retention removes only old published versions: the latest survives
    any keep_last, in-flight (newer-than-latest) dirs survive, dangling
    old dirs go, and the sweep is idempotent."""
    import os

    from project_obsidian_core_spark.operators.versioning import (
        latest_version,
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    root = str(tmp_path / "corpus")
    for i in range(4):
        write_snapshot(
            spark.createDataFrame([(i, "x")], "k int, s string"), root
        )
    assert latest_version(root, spark) == 4

    # simulate a concurrent writer's in-flight version (newer than latest)
    os.makedirs(f"{root}/v=9")

    removed = vacuum_snapshots(spark, root, keep_last=2)
    assert removed == [1, 2]
    assert read_snapshot(spark, root).collect()[0].k == 3  # latest intact
    assert read_snapshot(spark, root, version=3).count() == 1
    assert os.path.isdir(f"{root}/v=9")  # in-flight untouched
    import pytest

    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=1)

    assert vacuum_snapshots(spark, root, keep_last=2) == []  # idempotent
    with pytest.raises(ValueError):
        vacuum_snapshots(spark, root, keep_last=0)


def test_vacuum_dangling_dir_never_consumes_a_keep_slot(spark, tmp_path):
    """[v1 readable, v2 dangling (crashed writer, no manifest), v3 latest]
    with keep_last=2: the dangling v2 must NOT displace the readable v1
    from the retention horizon — v1 is kept, v2 is removed (ADVICE r7)."""
    import os

    from project_obsidian_core_spark.operators.versioning import (
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    root = str(tmp_path / "corpus")
    write_snapshot(spark.createDataFrame([(1, "a")], "k int, s string"), root)
    # crashed writer: dir exists, no _MANIFEST.json, below the next publish
    os.makedirs(f"{root}/v=2")
    with open(f"{root}/v=2/part-orphan.parquet", "w") as f:
        f.write("garbage")
    write_snapshot(spark.createDataFrame([(3, "c")], "k int, s string"), root)
    assert {"_LATEST", "v=1", "v=2", "v=3"} <= set(os.listdir(root))

    removed = vacuum_snapshots(spark, root, keep_last=2)
    assert removed == [2]                       # dangling dir swept
    assert read_snapshot(spark, root, version=1).count() == 1  # v1 KEPT
    assert read_snapshot(spark, root).collect()[0].k == 3
    assert not os.path.isdir(f"{root}/v=2")


# ----------------------------------------------------- table_fingerprint --
def test_fingerprint_is_order_and_partitioning_independent(spark):
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.operators.versioning import (
        table_fingerprint,
    )

    rows = [(i, f"v{i % 13}") for i in range(500)]
    a = spark.createDataFrame(rows, "id int, v string")
    b = spark.createDataFrame(list(reversed(rows)), "id int, v string").repartition(7)
    rep = F.concat_ws("|", F.col("id").cast("string"), F.col("v"))
    fa = table_fingerprint(a, rep).collect()[0]
    fb = table_fingerprint(b, rep).collect()[0]
    assert fa == fb


def test_fingerprint_detects_single_row_change_and_dup_pair(spark):
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.operators.versioning import (
        table_fingerprint,
    )

    rep = F.concat_ws("|", F.col("id").cast("string"), F.col("v"))
    base = [(i, "x") for i in range(100)]
    f0 = table_fingerprint(
        spark.createDataFrame(base, "id int, v string"), rep
    ).collect()[0]
    # one value flipped
    changed = base[:50] + [(50, "y")] + base[51:]
    f1 = table_fingerprint(
        spark.createDataFrame(changed, "id int, v string"), rep
    ).collect()[0]
    assert f1["xor_sig"] != f0["xor_sig"]
    # a duplicated PAIR of an existing row: XOR fold cancels (x^x=0) but
    # count+modsum catch it — the documented reason for the second fold
    dup_pair = base + [base[0], base[0]]
    f2 = table_fingerprint(
        spark.createDataFrame(dup_pair, "id int, v string"), rep
    ).collect()[0]
    assert f2["xor_sig"] == f0["xor_sig"]
    assert (f2["n_rows"], f2["modsum_sig"]) != (f0["n_rows"], f0["modsum_sig"])


# ------------------------------------------- B6: append-chain increments --
def test_append_chain_reads_union_and_increment_reads_delta(spark):
    root = tempfile.mkdtemp(prefix="corpus_ver_chain_")
    ids = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("doc_id")
    )
    assert V.write_snapshot(ids(0, 10), root) == 1  # full root
    assert V.append_snapshot(ids(10, 15), root) == 2
    assert V.append_snapshot(ids(15, 22), root) == 3
    # chain reads union every ancestor directory
    assert V.read_snapshot(spark, root).count() == 22
    assert V.read_snapshot(spark, root, version=2).count() == 15
    # increments read ONLY the delta directories
    inc = V.read_snapshot_increment(spark, root, since_version=1)
    assert sorted(r.doc_id for r in inc.collect()) == list(range(10, 22))
    inc2 = V.read_snapshot_increment(spark, root, 2, 3)
    assert sorted(r.doc_id for r in inc2.collect()) == list(range(15, 22))
    # since == to: empty with the right schema
    assert V.read_snapshot_increment(spark, root, 3, 3).count() == 0


def test_increment_across_reroot_raises(spark):
    import pytest

    root = tempfile.mkdtemp(prefix="corpus_ver_reroot_")
    ids = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("doc_id")
    )
    V.write_snapshot(ids(0, 10), root)  # v1 full
    V.append_snapshot(ids(10, 12), root)  # v2 append
    V.write_snapshot(ids(0, 30), root)  # v3 FULL REWRITE (re-root)
    V.append_snapshot(ids(30, 33), root)  # v4 append on the new root
    # within the new chain: fine
    assert V.read_snapshot_increment(spark, root, 3, 4).count() == 3
    # across the re-root: a consumer at v2 must NOT get a silent delta
    with pytest.raises(ValueError, match="re-rooted"):
        V.read_snapshot_increment(spark, root, 2, 4)


def test_append_without_root_is_a_full_snapshot(spark):
    root = tempfile.mkdtemp(prefix="corpus_ver_seed_")
    d = spark.range(7).select(F.col("id").alias("doc_id"))
    assert V.append_snapshot(d, root) == 1
    assert V.read_snapshot(spark, root).count() == 7


def test_vacuum_keeps_chain_bases_of_kept_versions(spark, tmp_path):
    root = str(tmp_path / "chainvac")
    ids = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("doc_id")
    )
    V.write_snapshot(ids(0, 10), root)  # v1: base of the chain
    V.append_snapshot(ids(10, 15), root)  # v2: chained to v1
    V.append_snapshot(ids(15, 18), root)  # v3: chained to v2
    # keep_last=1 keeps only v3 as a SNAPSHOT — but its data lives in
    # v1+v2+v3, so nothing may be deleted
    assert V.vacuum_snapshots(spark, root, keep_last=1) == []
    assert V.read_snapshot(spark, root).count() == 18
    # a full rewrite re-roots; now the old chain IS reclaimable
    V.write_snapshot(ids(0, 20), root)  # v4 full
    removed = V.vacuum_snapshots(spark, root, keep_last=1)
    assert removed == [1, 2, 3]
    assert V.read_snapshot(spark, root).count() == 20


def test_compact_chain_reroots_and_frees_history(spark, tmp_path):
    root = str(tmp_path / "compact")
    ids = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("doc_id")
    )
    V.write_snapshot(ids(0, 10), root)
    V.append_snapshot(ids(10, 15), root)
    V.append_snapshot(ids(15, 18), root)
    v = V.compact_chain(spark, root)
    assert v == 4
    assert V.read_snapshot(spark, root).count() == 18
    # the old chain is now reclaimable
    assert V.vacuum_snapshots(spark, root, keep_last=1) == [1, 2, 3]
    assert V.read_snapshot(spark, root).count() == 18
    # appends resume on the new root; increments work within it
    V.append_snapshot(ids(18, 20), root)
    assert V.read_snapshot_increment(spark, root, v).count() == 2
