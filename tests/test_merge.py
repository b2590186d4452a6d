"""MERGE upsert + SCD2 history operator semantics (operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.operators.merge import merge_upsert, scd2_history


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300)],
        "k int, name string, v int",
    )


def _changes(spark):
    return spark.createDataFrame(
        [
            (2, "b2", 250, "U"),  # update existing key
            (3, None, 0, "D"),  # delete existing key
            (4, "d", 400, "I"),  # insert new key
            (9, None, 0, "D"),  # delete of absent key is a no-op
        ],
        "k int, name string, v int, op string",
    )


def test_merge_insert_update_delete(spark):
    out = merge_upsert(_base(spark), _changes(spark), keys=["k"])
    rows = {r.k: (r.name, r.v) for r in out.collect()}
    assert rows == {1: ("a", 100), 2: ("b2", 250), 4: ("d", 400)}


def test_merge_is_idempotent_for_upserts(spark):
    """Re-applying the same non-delete batch leaves the table unchanged."""
    ch = _changes(spark).filter(F.col("op") != "D")
    once = merge_upsert(_base(spark), ch, keys=["k"])
    twice = merge_upsert(once, ch, keys=["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_empty_batch_is_identity(spark):
    ch = _changes(spark).limit(0)
    out = merge_upsert(_base(spark), ch, keys=["k"])
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, _base(spark).collect())
    )


def test_scd2_intervals_and_current_flag(spark):
    ev = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (1, 30, "z"), (2, 15, "q")],
        "ent int, ts long, val string",
    )
    hist = scd2_history(ev, "ent", "ts", "val").orderBy("ent", "valid_from")
    rows = [(r.ent, r.valid_from, r.valid_to, r.is_current) for r in hist.collect()]
    assert rows == [
        (1, 10, 20, False),
        (1, 20, 30, False),
        (1, 30, None, True),
        (2, 15, None, True),
    ]


def test_scd2_intervals_tile_without_gaps(spark):
    """Each entity's intervals chain: valid_to == next valid_from."""
    ev = spark.createDataFrame(
        [(1, t, str(t)) for t in (5, 1, 9, 3)], "ent int, ts long, val string"
    )
    hist = scd2_history(ev, "ent", "ts", "val").orderBy("valid_from").collect()
    for prev, nxt in zip(hist, hist[1:]):
        assert prev.valid_to == nxt.valid_from
    assert hist[-1].valid_to is None and hist[-1].is_current


def test_merge_last_wins_with_order_col(spark):
    """A batch carrying several ops for one key reduces last-wins when
    order_col is given; a trailing D suppresses earlier I/U for the key."""
    base = _base(spark)
    ch = spark.createDataFrame(
        [
            (2, "b2", 250, "U", 1),
            (2, "b3", 260, "U", 2),  # later update wins
            (4, "d", 400, "I", 1),
            (4, None, 0, "D", 2),  # trailing delete suppresses the insert
        ],
        "k int, name string, v int, op string, seq int",
    )
    out = merge_upsert(base, ch, keys=["k"], order_col="seq")
    rows = {r.k: (r.name, r.v) for r in out.collect()}
    assert rows == {1: ("a", 100), 2: ("b3", 260), 3: ("c", 300)}


# ------------------------------------------- partitioned snapshot MERGE
def _leaf_files(root):
    import os

    out = {}
    for leaf in sorted(os.listdir(root)):
        if not leaf.startswith("part_bucket="):
            continue
        d = os.path.join(root, leaf)
        out[leaf] = {
            f: os.stat(os.path.join(d, f)).st_mtime_ns
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        }
    return out


def test_partitioned_merge_leaves_untouched_buckets(spark, tmp_path):
    """A targeted merge rewrites ONLY the bucket leaves the batch touches:
    every other leaf keeps the identical files (paths AND mtimes)."""
    from project_obsidian_core_spark.operators.merge import (
        merge_into_partitioned,
        read_partitioned_snapshot,
        write_partitioned_snapshot,
    )

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(k, f"n{k}", k * 10) for k in range(100)], "k int, name string, v int"
    )
    write_partitioned_snapshot(base, snap, keys=["k"], n_buckets=8)
    before = _leaf_files(snap)
    assert len(before) > 1

    ch = spark.createDataFrame(
        [(7, "seven", 777, "U"), (100, "new", 1000, "I"), (13, None, 0, "D")],
        "k int, name string, v int, op string",
    )
    # full_rewrite_frac=1.0 pins the TARGETED path (3 keys can land in 3
    # of 8 buckets, above the adaptive default's fallback threshold)
    touched = merge_into_partitioned(
        spark, snap, ch, keys=["k"], n_buckets=8, full_rewrite_frac=1.0
    )
    after = _leaf_files(snap)

    touched_leaves = {f"part_bucket={b}" for b in touched}
    for leaf, files in before.items():
        if leaf not in touched_leaves:
            assert after[leaf] == files, f"untouched {leaf} was rewritten"
    for leaf in touched_leaves:
        assert before.get(leaf) != after.get(leaf)

    rows = {
        r.k: (r.name, r.v)
        for r in read_partitioned_snapshot(spark, snap).collect()
    }
    assert rows[7] == ("seven", 777)
    assert rows[100] == ("new", 1000)
    assert 13 not in rows
    assert len(rows) == 100  # 100 base - 1 delete + 1 insert


def test_partitioned_merge_matches_full_merge(spark, tmp_path):
    """Targeted per-leaf rewrite == plain merge_upsert on the same data."""
    from project_obsidian_core_spark.operators.merge import (
        merge_into_partitioned,
        read_partitioned_snapshot,
        write_partitioned_snapshot,
    )

    snap = str(tmp_path / "snap")
    base = _base(spark)
    write_partitioned_snapshot(base, snap, keys=["k"], n_buckets=4)
    merge_into_partitioned(spark, snap, _changes(spark), keys=["k"], n_buckets=4)
    got = sorted(
        map(tuple, read_partitioned_snapshot(spark, snap).select("k", "name", "v").collect())
    )
    want = sorted(
        map(tuple, merge_upsert(base, _changes(spark), keys=["k"]).collect())
    )
    assert got == want


def test_partitioned_merge_adaptive_full_rewrite(spark, tmp_path):
    """A batch touching more than full_rewrite_frac of the buckets falls
    back to the single-job full rewrite: the result is identical to
    merge_upsert, the layout stays bucketed, and no per-leaf working dirs
    are left behind."""
    import os

    from project_obsidian_core_spark.operators.merge import (
        merge_into_partitioned,
        merge_upsert,
        read_partitioned_snapshot,
        write_partitioned_snapshot,
    )

    snap = str(tmp_path / "snap")
    base = spark.createDataFrame(
        [(k, f"n{k}", k * 10) for k in range(200)], "k int, name string, v int"
    )
    write_partitioned_snapshot(base, snap, keys=["k"], n_buckets=8)
    # 40 random-ish keys spread over ~all 8 buckets -> way past 8/4 = 2
    ch = spark.createDataFrame(
        [(k * 5 + 1, f"u{k}", k, "U") for k in range(40)],
        "k int, name string, v int, op string",
    )
    touched = merge_into_partitioned(spark, snap, ch, keys=["k"], n_buckets=8)
    assert len(touched) > 2  # adaptive threshold actually crossed

    got = sorted(
        map(tuple, read_partitioned_snapshot(spark, snap).select("k", "name", "v").collect())
    )
    want = sorted(map(tuple, merge_upsert(base, ch, keys=["k"]).collect()))
    assert got == want
    # bucketed layout preserved; sibling working dirs cleaned up
    assert any(d.startswith("part_bucket=") for d in os.listdir(snap))
    parent = os.path.dirname(snap)
    assert not any(".merge_full" in d for d in os.listdir(parent))


def test_partitioned_merge_full_rewrite_crash_recovery(spark, tmp_path):
    """Crash windows of the sibling-dir full rewrite: a snapshot stranded
    in <path>.merge_full_old (crash between the two root renames) is
    restored; stale sibling dirs are dropped when the snapshot exists."""
    import os
    import shutil

    from project_obsidian_core_spark.operators.merge import (
        read_partitioned_snapshot,
        recover_partitioned_merge,
        write_partitioned_snapshot,
    )

    snap = str(tmp_path / "snap")
    write_partitioned_snapshot(
        spark.createDataFrame([(k, k * 10) for k in range(20)], "k int, v int"),
        snap,
        keys=["k"],
        n_buckets=4,
    )
    before = sorted(map(tuple, read_partitioned_snapshot(spark, snap).collect()))

    # crash between rename(path -> old) and rename(tmp -> path)
    os.rename(snap, f"{snap}.merge_full_old")
    os.makedirs(f"{snap}.merge_full_tmp/leftover", exist_ok=True)
    actions = recover_partitioned_merge(spark, snap)
    assert actions["_merge_full_old"] == "restored_snapshot"
    assert actions["_merge_full_tmp"] == "dropped_incomplete_full_rewrite"
    after = sorted(map(tuple, read_partitioned_snapshot(spark, snap).collect()))
    assert after == before

    # crash after publish but before dropping the old copy
    shutil.copytree(snap, f"{snap}.merge_full_old")
    actions = recover_partitioned_merge(spark, snap)
    assert actions["_merge_full_old"] == "dropped_stale_full_old"
    assert not os.path.exists(f"{snap}.merge_full_old")


def test_partitioned_merge_crash_recovery(spark, tmp_path):
    """A leaf stranded in .merge_trash (crash between the two renames) is
    restored by recover_partitioned_merge; stale trash is dropped."""
    import os
    import shutil

    from project_obsidian_core_spark.operators.merge import (
        read_partitioned_snapshot,
        recover_partitioned_merge,
        write_partitioned_snapshot,
    )

    snap = str(tmp_path / "snap")
    write_partitioned_snapshot(
        spark.createDataFrame(
            [(k, k * 10) for k in range(20)], "k int, v int"
        ),
        snap,
        keys=["k"],
        n_buckets=4,
    )
    before = sorted(map(tuple, read_partitioned_snapshot(spark, snap).collect()))
    leaves = [d for d in os.listdir(snap) if d.startswith("part_bucket=")]
    victim = leaves[0]
    os.makedirs(f"{snap}/.merge_trash", exist_ok=True)
    shutil.move(f"{snap}/{victim}", f"{snap}/.merge_trash/{victim}")
    os.makedirs(f"{snap}/.merge_tmp/leftover", exist_ok=True)

    actions = recover_partitioned_merge(spark, snap)
    assert actions[victim] == "restored_from_trash"
    assert not os.path.exists(f"{snap}/.merge_tmp")
    after = sorted(map(tuple, read_partitioned_snapshot(spark, snap).collect()))
    assert after == before


def test_snapshot_diff_roundtrip_and_classification(spark):
    """snapshot_diff is the inverse of merge_upsert: applying the derived
    feed to the old snapshot reconstructs the new one; ops classify as
    I (new key), U (changed row), D (gone key); unchanged keys are absent."""
    from project_obsidian_core_spark.operators.merge import snapshot_diff

    old = _base(spark)  # keys 1,2,3
    new = spark.createDataFrame(
        [(1, "a", 100), (2, "b2", 250), (4, "d", 400)],
        "k int, name string, v int",
    )
    feed = snapshot_diff(old, new, keys=["k"])
    ops = {r.k: r.op for r in feed.collect()}
    assert ops == {2: "U", 3: "D", 4: "I"}  # key 1 unchanged -> absent
    # D rows carry the old image
    d_row = feed.filter("k = 3").collect()[0]
    assert (d_row.name, d_row.v) == ("c", 300)

    rebuilt = merge_upsert(old, feed, keys=["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_snapshot_diff_null_safe_comparison(spark):
    """NULL-to-value and value-to-NULL transitions register as updates;
    NULL-to-NULL does not."""
    from project_obsidian_core_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, 1), (2, "x", 2), (3, None, 3)], "k int, name string, v int"
    )
    new = spark.createDataFrame(
        [(1, "now", 1), (2, None, 2), (3, None, 3)], "k int, name string, v int"
    )
    feed = snapshot_diff(old, new, keys=["k"])
    rows = {r.k: r for r in feed.collect()}
    assert {k: r.op for k, r in rows.items()} == {1: "U", 2: "U"}
    # key 3: NULL == NULL, unchanged

    # The U row's image is the NEW side even when the new value is NULL —
    # selecting by nullness (coalesce) would resurrect the old value.
    assert rows[2].name is None
    assert rows[1].name == "now"

    # Round-trip invariant holds through a value -> NULL update.
    rebuilt = merge_upsert(old, feed, keys=["k"])
    assert sorted(
        map(tuple, rebuilt.collect())
    ) == sorted(map(tuple, new.collect()))


def test_partitioned_merge_range_bucketing_touches_one_leaf(spark, tmp_path):
    """With range bucket_sql and a clustered batch, exactly one leaf is
    touched and every other leaf keeps its files — the CDC shape where
    targeting beats a full rewrite."""
    from project_obsidian_core_spark.operators.merge import (
        merge_into_partitioned,
        read_partitioned_snapshot,
        write_partitioned_snapshot,
    )

    snap = str(tmp_path / "snap")
    bucket_sql = "cast(k div 25 as int)"  # keys 0-99 -> 4 range leaves
    base = spark.createDataFrame(
        [(k, k * 10) for k in range(100)], "k int, v int"
    )
    write_partitioned_snapshot(
        base, snap, keys=["k"], n_buckets=4, bucket_sql=bucket_sql
    )
    before = _leaf_files(snap)

    ch = spark.createDataFrame(
        [(90, 900_0, "U"), (95, 950_0, "U"), (99, 990_0, "U")],
        "k int, v int, op string",
    )
    touched = merge_into_partitioned(
        spark, snap, ch, keys=["k"], n_buckets=4, bucket_sql=bucket_sql
    )
    assert touched == [3]  # all three keys live in the last range leaf
    after = _leaf_files(snap)
    for leaf, files in before.items():
        if leaf != "part_bucket=3":
            assert after[leaf] == files
    rows = {r.k: r.v for r in read_partitioned_snapshot(spark, snap).collect()}
    assert rows[90] == 9000 and rows[99] == 9900 and len(rows) == 100


# -------------------------------------------------------- merge-on-read ---
def test_mor_latest_batch_wins_and_deletes_fold(spark, tmp_path):
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.operators.merge import (
        append_mor_delta,
        read_mor,
        write_mor_base,
    )

    path = str(tmp_path / "mor")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    write_mor_base(base, path)
    # batch 1: update k=1, delete k=2, insert k=4
    b1 = spark.createDataFrame(
        [(1, "a1", "U"), (2, "b", "D"), (4, "d", "I")], "k long, v string, op string"
    )
    append_mor_delta(b1, path, seq=1)
    # batch 2: re-update k=1 (overrides), delete the batch-1 insert k=4,
    # resurrect k=2 with an insert
    b2 = spark.createDataFrame(
        [(1, "a2", "U"), (4, "d", "D"), (2, "b2", "I")], "k long, v string, op string"
    )
    append_mor_delta(b2, path, seq=2)
    got = {
        r["k"]: r["v"]
        for r in read_mor(spark, path, keys=["k"]).collect()
    }
    assert got == {1: "a2", 2: "b2", 3: "c"}


def test_mor_intra_batch_order_col(spark, tmp_path):
    """A micro-batch carrying several rows for one key folds by the CDC
    log offset when ``order_col`` is given: the highest-offset row wins
    (two same-op updates are no longer an arbitrary pick, and a later
    update beats an earlier insert). The offset column is batch-only
    bookkeeping and must not leak into the reconstructed table."""
    from project_obsidian_core_spark.operators.merge import (
        append_mor_delta,
        read_mor,
        write_mor_base,
    )

    path = str(tmp_path / "mor_ord")
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    write_mor_base(base, path)
    batch = spark.createDataFrame(
        [
            (1, "u_first", "U", 10),
            (1, "u_last", "U", 30),   # two same-op rows: offset decides
            (2, "inserted", "I", 11),
            (2, "updated", "U", 12),  # later update beats the insert
        ],
        "k long, v string, op string, off long",
    )
    append_mor_delta(batch, path, seq=1)
    out = read_mor(spark, path, keys=["k"], order_col="off")
    assert out.columns == ["k", "v"]
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "u_last", 2: "updated"}


def test_mor_op_tiebreak_prefers_update_without_order_col(spark, tmp_path):
    """Without an order_col a duplicate-key batch falls back to op DESC:
    U > I > D, so an update is never shadowed by a same-key insert."""
    from project_obsidian_core_spark.operators.merge import (
        append_mor_delta,
        read_mor,
        write_mor_base,
    )

    path = str(tmp_path / "mor_tie")
    write_mor_base(spark.createDataFrame([(9, "x")], "k long, v string"), path)
    batch = spark.createDataFrame(
        [(9, "ins", "I"), (9, "upd", "U")], "k long, v string, op string"
    )
    append_mor_delta(batch, path, seq=1)
    got = {r["k"]: r["v"] for r in read_mor(spark, path, keys=["k"]).collect()}
    assert got == {9: "upd"}


def test_mor_base_side_is_never_shuffled(spark, tmp_path):
    from project_obsidian_core_spark.operators.merge import (
        append_mor_delta,
        read_mor,
        write_mor_base,
    )

    path = str(tmp_path / "mor")
    write_mor_base(
        spark.range(0, 1000).selectExpr("id AS k", "'x' AS v"), path
    )
    append_mor_delta(
        spark.createDataFrame([(1, "y", "U")], "k long, v string, op string"),
        path,
        seq=1,
    )
    plan = (
        read_mor(spark, path, keys=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the touched-key anti join must broadcast: the base never hashes
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_mor_compaction_threshold_and_equivalence(spark, tmp_path):
    from project_obsidian_core_spark.operators.merge import (
        append_mor_delta,
        compact_mor,
        mor_ledger_stats,
        read_mor,
        write_mor_base,
    )

    path = str(tmp_path / "mor")
    write_mor_base(
        spark.range(0, 2000).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS v"),
        path,
    )
    append_mor_delta(
        spark.createDataFrame(
            [(5, "x", "U"), (2001, "y", "I"), (7, "z", "D")],
            "k long, v string, op string",
        ),
        path,
        seq=1,
    )
    before = {
        r["k"]: r["v"] for r in read_mor(spark, path, keys=["k"]).collect()
    }
    # tiny delta, high threshold -> no action
    out = compact_mor(spark, path, keys=["k"], threshold_frac=0.9)
    assert out["action"] == "skipped"
    # force compaction
    out = compact_mor(spark, path, keys=["k"], threshold_frac=0.0)
    assert out["action"] == "compacted"
    # ledger gone, base is the folded view, and a fresh delta still applies
    assert mor_ledger_stats(spark, path)["delta_bytes"] == 0
    # a compacted table reads fine with no ledger at all
    no_ledger = {
        r["k"]: r["v"] for r in read_mor(spark, path, keys=["k"]).collect()
    }
    assert no_ledger == before
    after = {
        r["k"]: r["v"]
        for r in spark.read.parquet(f"{path}/base").collect()
    }
    assert after == before
    append_mor_delta(
        spark.createDataFrame([(5, "x2", "U")], "k long, v string, op string"),
        path,
        seq=2,
    )
    again = {
        r["k"]: r["v"] for r in read_mor(spark, path, keys=["k"]).collect()
    }
    assert again[5] == "x2" and len(again) == len(before)
