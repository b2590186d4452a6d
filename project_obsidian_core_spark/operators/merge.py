"""MERGE (CDC upsert) and SCD2 history operators.

The reference engine is append-only (Druid rollup ingest; see SURVEY §2.1
S9/S10), but any table-maintenance story at 100 TB needs a MERGE primitive:
apply a batch of keyed inserts / updates / deletes to a base snapshot. This
is the Delta-Lake/Iceberg `MERGE INTO` semantics expressed as pure DataFrame
algebra, so it runs on plain parquet snapshots (operators/versioning.py
provides the atomic-publish side).

Scale notes
-----------
- The change batch is almost always orders of magnitude smaller than the
  base.  ``merge_upsert`` therefore broadcasts the change-key side of the
  anti join when small (Spark's AQE does this automatically under the
  broadcast threshold) — the base table is then NEVER shuffled: one scan,
  one broadcast probe, one union.
- With a large change batch both sides shuffle once on the merge key —
  exactly the minimum any engine pays for keyed reconciliation.
- ``scd2_history`` is a per-key ordered window (lead) — one shuffle on the
  entity key; no global window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Change-operation column values understood by merge_upsert.
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    order_col: str | None = None,
) -> DataFrame:
    """Apply a keyed CDC batch to a base snapshot (MERGE INTO semantics).

    ``changes`` carries the full new row image plus an ``op_col`` marker:
    ``I`` (insert a new key), ``U`` (replace the row for an existing key),
    ``D`` (remove the key). Rows of ``base`` whose key is untouched pass
    through unchanged; the change row wins for touched keys.

    PRECONDITION: ``changes`` must carry AT MOST ONE row per key (the
    contract Delta/Iceberg ``MERGE INTO`` enforces by raising on multiple
    matches). With several rows per key the anti-join ∪ union would emit
    them all, leaving duplicate keys in the snapshot. If the batch may
    contain intra-batch key collisions (e.g. a log-compacted CDC feed),
    pass ``order_col``: the batch is first reduced last-wins per key by
    that ordering (ties broken by ``op_col`` so the reduction is
    deterministic), which also makes a trailing ``D`` correctly suppress
    earlier ``I``/``U`` rows for the same key.

    Semantics match ``MERGE INTO base USING changes ON keys
    WHEN MATCHED AND op='D' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND op<>'D' THEN INSERT *``.

    Plan: base LEFT ANTI (touched keys) ∪ change rows with op≠D. The anti
    probe side is just the key columns of ``changes`` — tiny, broadcastable;
    the base is scanned once and never shuffled when the batch is small.
    The optional last-wins reduction is a window over the (small) change
    batch only — the base never pays for it.
    """
    key_cols = list(keys)
    if order_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), F.col(op_col).desc()
        )
        changes = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    touched = changes.select(*key_cols).distinct()
    untouched = base.join(touched, key_cols, "left_anti")
    applied = changes.filter(F.col(op_col) != OP_DELETE).drop(op_col)
    if order_col is not None and order_col not in base.columns:
        # batch-only sequencing column (e.g. a CDC log offset): not part of
        # the snapshot row image
        applied = applied.drop(order_col)
    return untouched.unionByName(applied)


def scd2_history(
    events: DataFrame,
    entity_col: str,
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build SCD2 validity intervals from a keyed change-event stream.

    Each event row becomes one history row: ``valid_from`` = its own
    ``order_col``; ``valid_to`` = the NEXT event's (lead) for the same
    entity, NULL for the current row; ``is_current`` marks the open
    interval. Deterministic total order via ``tiebreak_col``.
    """
    w = Window.partitionBy(entity_col).orderBy(order_col, tiebreak_col)
    return events.select(
        "*",
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w).alias("valid_to"),
        F.lead(order_col).over(w).isNull().alias("is_current"),
    )


# ------------------------------------------- partitioned snapshot MERGE
#: partition directory column for bucketed snapshots.
BUCKET_COL = "part_bucket"


def _bucket_expr(keys: Sequence[str], n_buckets: int, bucket_sql: str | None):
    """Deterministic key → bucket expression.

    Default: non-negative Murmur3 of the keys mod N — uniform, but a CDC
    batch of B random keys then touches ~min(B, N) leaves, so targeting
    only beats a full rewrite when batches are much smaller than the
    bucket count. ``bucket_sql`` (a SQL expression over the key columns
    yielding an int in [0, N)) opts into RANGE/date bucketing instead —
    when updates cluster on recent keys (the common CDC shape), a batch
    touches O(1) leaves regardless of batch size. Writer and merger must
    use the SAME expression; the bucket is a storage-layout detail, never
    part of the data contract (readers drop it).
    """
    if bucket_sql is not None:
        return F.expr(bucket_sql).cast("int")
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
        "int"
    )


def write_partitioned_snapshot(
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    n_buckets: int,
    bucket_sql: str | None = None,
) -> None:
    """Publish ``df`` as a key-bucketed parquet snapshot:
    ``path/part_bucket=K/``. The layout targeted merges rewrite per-leaf.

    Rows are clustered by bucket before the write (one shuffle): without
    it every task writes a sliver into every leaf dir — tasks x buckets
    tiny files that tax every subsequent read."""
    df.withColumn(
        BUCKET_COL, _bucket_expr(keys, n_buckets, bucket_sql)
    ).repartition(n_buckets, F.col(BUCKET_COL)).write.partitionBy(
        BUCKET_COL
    ).mode("overwrite").parquet(path)


def read_partitioned_snapshot(spark, path: str) -> DataFrame:
    """Read a bucketed snapshot, hiding the layout column."""
    return spark.read.parquet(path).drop(BUCKET_COL)


def merge_into_partitioned(
    spark,
    path: str,
    changes: DataFrame,
    keys: Sequence[str],
    n_buckets: int,
    op_col: str = "op",
    order_col: str | None = None,
    bucket_sql: str | None = None,
    full_rewrite_frac: float = 0.25,
) -> list[int]:
    """MERGE a CDC batch into a bucketed snapshot, rewriting ONLY the
    bucket leaves the batch touches (round-5 verdict: the streaming CDC
    fold must not rewrite the whole snapshot per micro-batch).

    LAYOUT CHOICE (round-7 verdict): targeting only wins when the batch
    touches a small fraction of the leaves. The intended CDC layout is
    RANGE bucketing via ``bucket_sql`` (updates cluster on recent keys →
    a batch touches O(1) leaves regardless of size); the hash default
    spreads B random keys over ~min(B, N) leaves, where targeting is a
    full rewrite PLUS per-leaf rename round-trips. The touched-bucket
    count is therefore checked FIRST: when the batch touches more than
    ``full_rewrite_frac`` of the buckets (soak-measured crossover:
    hash-random 200-key batches touched 62/64 leaves and paid 6.99 s vs
    0.66 s for a plain rewrite at 2 M rows), the merge falls back to a
    single-job full rewrite published with two root renames.

    Targeted path — one distributed job plus per-leaf metadata renames:

    1. The batch's touched buckets are computed from its keys (distinct
       bucket ids, at most ``n_buckets`` values — a bounded collect).
    2. ONLY those leaves are read back (the ``part_bucket`` filter is
       partition pruning: untouched directories are never opened) and
       merged with the batch via :func:`merge_upsert`.
    3. The merged relation is written in one job to a dot-prefixed working
       dir (invisible to partition discovery), partitioned by bucket.
    4. Each touched leaf is swapped in via the two-rename protocol of
       operators/maintenance.py (old leaf → ``.merge_trash``, rewrite →
       leaf, drop trash). Untouched leaves keep their exact files.

    CONSISTENCY CONTRACT (precise, not "atomically old or new"): each
    individual rename is atomic, but between a leaf's two renames readers
    see that bucket ABSENT (momentarily zero rows), and the multi-leaf
    loop is not transactional — a crash mid-loop leaves some leaves new,
    some old, and possibly one aside in ``.merge_trash``. Recovery is
    :func:`recover_partitioned_merge` (restores any aside leaf — which
    can resurrect a fully-deleted bucket) followed by a REPLAY of the
    same batch: the merge is idempotent, so replay converges every leaf
    to the new state. Single-writer is assumed throughout.

    At 100 TB the targeted rewrite cost per micro-batch is |touched
    buckets| × bucket size, not the table size; pick ``n_buckets`` so one
    bucket ≈ one task's worth of data. Returns the touched bucket ids.

    (The native-Spark alternative — dynamic partition overwrite — does the
    same targeted replacement in one commit but without the per-leaf
    trash/restore window; this explicit protocol matches the compaction
    machinery so one recovery sweep serves both.)
    """
    from project_obsidian_core_spark.operators.maintenance import _fs_and_path

    changes_b = changes.withColumn(
        BUCKET_COL, _bucket_expr(keys, n_buckets, bucket_sql)
    )
    touched = sorted(
        r[0] for r in changes_b.select(BUCKET_COL).distinct().collect()
    )
    if not touched:
        return []

    if len(touched) > max(1, int(n_buckets * full_rewrite_frac)):
        _merge_full_rewrite(
            spark, path, changes_b.drop(BUCKET_COL), keys, n_buckets,
            op_col, order_col, bucket_sql,
        )
        return touched

    current = (
        spark.read.parquet(path)
        .filter(F.col(BUCKET_COL).isin(touched))
        .drop(BUCKET_COL)
    )
    merged = merge_upsert(
        current, changes_b.drop(BUCKET_COL), keys, op_col, order_col
    ).withColumn(BUCKET_COL, _bucket_expr(keys, n_buckets, bucket_sql))

    tmp_root = f"{path}/.merge_tmp"
    # one write partition per touched bucket (a bucket is sized to ~one
    # task): keeps the leaf to one file instead of tasks x |touched|
    merged.repartition(len(touched), F.col(BUCKET_COL)).write.partitionBy(
        BUCKET_COL
    ).mode("overwrite").parquet(tmp_root)

    fs, _, jvm = _fs_and_path(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    for b in touched:
        leaf = f"{BUCKET_COL}={b}"
        leaf_p = P(f"{path}/{leaf}")
        tmp_p = P(f"{tmp_root}/{leaf}")
        aside_p = P(f"{path}/.merge_trash/{leaf}")
        fs.delete(aside_p, True)
        fs.mkdirs(aside_p.getParent())
        had_leaf = fs.exists(leaf_p)
        if had_leaf and not fs.rename(leaf_p, aside_p):
            raise IOError(f"merge: could not move {leaf} aside")
        if fs.exists(tmp_p):
            if not fs.rename(tmp_p, leaf_p):
                if had_leaf:
                    fs.rename(aside_p, leaf_p)
                raise IOError(f"merge: could not publish rewrite of {leaf}")
        # else: every row of this bucket was deleted — leaf stays absent
        fs.delete(aside_p, True)
    fs.delete(P(tmp_root), True)
    fs.delete(P(f"{path}/.merge_trash"), True)
    return touched


def _merge_full_rewrite(
    spark,
    path: str,
    changes: DataFrame,
    keys: Sequence[str],
    n_buckets: int,
    op_col: str,
    order_col: str | None,
    bucket_sql: str | None,
) -> None:
    """Single-job whole-snapshot merge published with two ROOT renames.

    Used when the batch touches most buckets (hash layout + random keys):
    read everything, merge, write the new bucketed snapshot to a SIBLING
    working dir, then swap ``path`` aside and the rewrite in. Exactly two
    renames total instead of 2×|touched| — and one plain write job. The
    rewrite keeps the bucketed layout so later small batches can target.

    Crash window: between the two renames ``path`` is absent entirely;
    :func:`recover_partitioned_merge` restores from the sibling
    ``<path>.merge_full_old`` (then replay the idempotent batch).
    """
    from project_obsidian_core_spark.operators.maintenance import _fs_and_path

    current = spark.read.parquet(path).drop(BUCKET_COL)
    merged = merge_upsert(current, changes, keys, op_col, order_col).withColumn(
        BUCKET_COL, _bucket_expr(keys, n_buckets, bucket_sql)
    )
    tmp_root = f"{path}.merge_full_tmp"
    # cluster rows by bucket before the partitioned write: without it every
    # task writes into all n_buckets leaf dirs (tasks x buckets small
    # files + committer overhead — soak-measured 6-15 s vs ~1 s at 2 M
    # rows); one shuffle keyed on the bucket keeps file count ~ n_buckets
    merged.repartition(n_buckets, F.col(BUCKET_COL)).write.partitionBy(
        BUCKET_COL
    ).mode("overwrite").parquet(tmp_root)

    fs, _, jvm = _fs_and_path(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    old_root = P(f"{path}.merge_full_old")
    fs.delete(old_root, True)
    if not fs.rename(P(path), old_root):
        raise IOError(f"merge: could not move snapshot {path} aside")
    if not fs.rename(P(tmp_root), P(path)):
        fs.rename(old_root, P(path))
        raise IOError(f"merge: could not publish full rewrite of {path}")
    fs.delete(old_root, True)


def recover_partitioned_merge(spark, path: str) -> dict[str, str]:
    """Repair a bucketed snapshot after a merge crash; idempotent.

    Mirrors maintenance.recover_compaction for the single-level bucket
    layout: a leaf present in ``.merge_trash`` but missing at the root is
    restored; one also present at the root means the swap completed and
    the trash copy is dropped; ``.merge_tmp`` leftovers are deleted (the
    next merge rewrites from live data). Returns {leaf: action}.
    """
    from project_obsidian_core_spark.operators.maintenance import _fs_and_path

    fs, _, jvm = _fs_and_path(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    actions: dict[str, str] = {}
    trash_root = P(f"{path}/.merge_trash")
    if fs.exists(trash_root):
        for d in fs.listStatus(trash_root):
            leaf = d.getPath().getName()
            leaf_p = P(f"{path}/{leaf}")
            if fs.exists(leaf_p):
                fs.delete(d.getPath(), True)
                actions[leaf] = "dropped_stale_trash"
            else:
                if not fs.rename(d.getPath(), leaf_p):
                    raise IOError(f"recovery: could not restore {leaf}")
                actions[leaf] = "restored_from_trash"
        if len(list(fs.listStatus(trash_root))) == 0:
            fs.delete(trash_root, True)
    tmp_root = P(f"{path}/.merge_tmp")
    if fs.exists(tmp_root):
        fs.delete(tmp_root, True)
        actions.setdefault("_merge_tmp", "dropped_incomplete_rewrite")
    # full-rewrite (sibling-dir) crash windows
    full_old = P(f"{path}.merge_full_old")
    if fs.exists(full_old):
        if fs.exists(P(path)):
            fs.delete(full_old, True)
            actions["_merge_full_old"] = "dropped_stale_full_old"
        else:
            if not fs.rename(full_old, P(path)):
                raise IOError(f"recovery: could not restore snapshot {path}")
            actions["_merge_full_old"] = "restored_snapshot"
    full_tmp = P(f"{path}.merge_full_tmp")
    if fs.exists(full_tmp):
        fs.delete(full_tmp, True)
        actions["_merge_full_tmp"] = "dropped_incomplete_full_rewrite"
    return actions


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Derive the CDC batch between two snapshot versions — the INVERSE of
    :func:`merge_upsert`: ``merge_upsert(old, snapshot_diff(old, new, k),
    k)`` reconstructs ``new`` exactly (pinned by test).

    Emits one row per changed key with ``op_col`` ∈ I/U/D: inserts and
    updates carry the NEW row image, deletes the OLD one (merge ignores a
    delete's non-key columns). Unchanged keys emit nothing — comparison is
    null-safe equality over all non-key columns.

    This is the change-data-feed generator a lakehouse exposes (Delta CDF
    semantics computed from plain snapshots): a full outer join keyed on
    the merge keys, one shuffle per side (or a broadcast when either
    version is small), comparisons all JVM-side.
    """
    key_cols = list(keys)
    data_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(*key_cols, *data_cols).withColumn("_in_old", F.lit(True))
    n = new.select(*key_cols, *data_cols).withColumn("_in_new", F.lit(True))
    for c in data_cols:
        o = o.withColumnRenamed(c, f"_old_{c}")
    joined = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    for c in data_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_old_{c}"))
    op = (
        F.when(F.col("_in_old").isNull(), F.lit(OP_INSERT))
        .when(F.col("_in_new").isNull(), F.lit(OP_DELETE))
        .when(changed, F.lit(OP_UPDATE))
    )
    # Image selection is by JOIN SIDE, never by value nullness: an update
    # that sets a column to NULL must emit NULL (coalesce would resurrect
    # the old value and break the merge∘diff round-trip invariant).
    out_cols = [
        F.when(F.col("_in_new").isNotNull(), F.col(c))
        .otherwise(F.col(f"_old_{c}"))
        .alias(c)
        for c in data_cols
    ]
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*key_cols, *out_cols, op_col)
    )


# ------------------------------------------------------- merge-on-read ----
def write_mor_base(df: DataFrame, path: str) -> None:
    """Write the merge-on-read base snapshot (plain parquet at
    ``{path}/base``). See :func:`read_mor` for the read-side contract."""
    df.write.mode("overwrite").parquet(f"{path}/base")


def append_mor_delta(changes: DataFrame, path: str, seq: int) -> None:
    """Append one CDC delta batch (rows carry an ``op`` ∈ I/U/D column)
    as ``{path}/deltas/seq={seq}`` — an O(|batch|) write that never
    touches the base.  ``seq`` must be monotically increasing; it is the
    total order the read side folds batches in."""
    changes.write.mode("overwrite").parquet(f"{path}/deltas/seq={seq}")


def read_mor(
    spark,
    path: str,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Merge-on-read reconstruction: the OTHER side of the lakehouse
    write/read amortization from ``merge_into_partitioned`` (Hudi MOR /
    Iceberg v2 delete-file reads vs copy-on-write).  CoW pays the rewrite
    at ingest so reads are plain scans; MOR writes only the delta files
    (``append_mor_delta``) and reconstructs at read time:

    - per key, the LATEST delta row across all batches wins (row_number
      over (key) ordered by seq DESC, then — like ``merge_upsert`` —
      ``order_col`` DESC when a batch can carry duplicate keys (a CDC
      log offset within the micro-batch), then op DESC so an update
      beats a same-key insert instead of the reverse — note this tiebreak
      ALSO resolves a same-batch delete+insert for one key (no
      ``order_col``) to the insert winning ('I' > 'D' > nothing), which
      flipped the pre-r9 delete-wins behavior; without an ``order_col``
      two same-op rows for one key in one batch have no defined order —
      so whenever a batch mixes ops on one key, land key-unique batches
      or pass ``order_col`` to make the intent explicit);
    - base rows whose key was ever touched are anti-joined away (the
      touched-key set is delta-sized → broadcast; the base is scanned
      once and NEVER shuffled);
    - surviving latest rows with op ≠ D union in.

    Cost model at 100 TB: ingest O(|batch|) instead of O(touched
    partitions); every read pays one delta-side window + broadcast
    anti-join — cheap while deltas are small, degrading as they pile up,
    which is exactly when a compaction (one ``merge_into_partitioned``
    of the folded deltas, then drop the delta dir) resets the ledger.
    """
    keyl = list(keys)
    base = spark.read.parquet(f"{path}/base")
    # a freshly-compacted table has no ledger: the base IS the table
    sc = spark.sparkContext
    hp = sc._jvm.org.apache.hadoop.fs.Path(f"{path}/deltas")
    if not hp.getFileSystem(sc._jsc.hadoopConfiguration()).exists(hp):
        return base
    deltas = spark.read.option("basePath", f"{path}/deltas").parquet(
        f"{path}/deltas"
    )
    order = [F.col("seq").desc()]
    if order_col is not None:
        order.append(F.col(order_col).desc())
    order.append(F.col("op").desc())
    w = Window.partitionBy(*keyl).orderBy(*order)
    latest = (
        deltas.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(*keyl)
    kept = base.join(F.broadcast(touched), keyl, "left_anti")
    live = latest.filter(F.col("op") != OP_DELETE).drop("op", "seq")
    if order_col is not None and order_col not in base.columns:
        # batch-only sequencing column (CDC log offset): not part of the
        # reconstructed table shape
        live = live.drop(order_col)
    return kept.unionByName(live)


def mor_ledger_stats(spark, path: str) -> dict:
    """Byte sizes of a MOR table's base and delta ledger (Hadoop FS walk —
    driver-side metadata only, no data read)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path

    def du(p: str) -> int:
        hp = P(p)
        fs = hp.getFileSystem(conf)
        if not fs.exists(hp):
            return 0
        return fs.getContentSummary(hp).getLength()

    base_b = du(f"{path}/base")
    delta_b = du(f"{path}/deltas")
    return {"base_bytes": base_b, "delta_bytes": delta_b}


def compact_mor(
    spark,
    path: str,
    keys: Sequence[str],
    threshold_frac: float = 0.25,
) -> dict:
    """Fold the delta ledger back into the base when it has grown past
    ``threshold_frac`` of the base size — the compaction cadence the
    round-8 soak recommends (the MOR read penalty is flat in BATCH COUNT
    but the fold cost scales with ledger BYTES, so bytes is the trigger).

    Protocol mirrors :func:`operators.maintenance.compact_partition`'s
    crash-safe swap: the folded snapshot is written under a dot-prefixed
    working dir (invisible to discovery), then two metadata renames swap
    it in and the old base+ledger land in a trash dir deleted last — a
    crash mid-swap leaves either the old table intact or the old data
    recoverable, never a half-folded view.

    Returns ``{"action": "compacted" | "skipped", ...stats}``.
    """
    stats = mor_ledger_stats(spark, path)
    if (
        stats["delta_bytes"] == 0
        or stats["delta_bytes"] < threshold_frac * stats["base_bytes"]
    ):
        return {"action": "skipped", **stats}
    folded = read_mor(spark, path, keys)
    tmp = f"{path}/.mor_compact_tmp/base"
    folded.write.mode("overwrite").parquet(tmp)

    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    root = P(path)
    fs = root.getFileSystem(conf)
    trash = P(f"{path}/.mor_compact_trash")
    fs.delete(trash, True)
    fs.mkdirs(trash)
    if not fs.rename(P(f"{path}/base"), P(f"{path}/.mor_compact_trash/base")):
        raise IOError(f"mor compaction: could not move {path}/base aside")
    if not fs.rename(P(tmp), P(f"{path}/base")):
        fs.rename(P(f"{path}/.mor_compact_trash/base"), P(f"{path}/base"))
        raise IOError(f"mor compaction: could not publish folded base")
    fs.rename(P(f"{path}/deltas"), P(f"{path}/.mor_compact_trash/deltas"))
    fs.delete(trash, True)
    fs.delete(P(f"{path}/.mor_compact_tmp"), True)
    return {"action": "compacted", **stats}
