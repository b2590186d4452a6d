"""Versioned corpus snapshots: poor-man's time travel for training sets.

A training run must be able to name the EXACT dataset it saw ("corpus
v12"), re-read it bit-for-bit months later, and never observe a snapshot
mid-write. Full table formats (Iceberg/Delta) solve this with manifest
trees; the same guarantees at corpus granularity need only:

- each snapshot written under ``v=<n>/`` (data files never mutated),
- a tiny JSON manifest naming the snapshot's files + row count,
- ``_LATEST`` updated by atomic rename AFTER the manifest lands — readers
  either see the previous version or the complete new one, never a torn
  write.

All metadata I/O goes through the Hadoop FileSystem API (same as
operators/maintenance.py), so the root may be any Spark-reachable scheme
(file://, hdfs://, s3a://). The ``_LATEST`` publish uses FileContext's
rename-with-OVERWRITE — atomic on HDFS and local filesystems; on S3
(no atomic rename) pair this with a conditional-put layer or single-writer
discipline. Version allocation (max(existing)+1) is likewise
last-writer-wins under concurrency: with multiple concurrent writers on
different hosts, front it with an external lock or allocate ids centrally
— the manifest/atomic-publish machinery below is safe either way (a lost
race surfaces as ``errorifexists`` on the version directory, never as a
corrupt snapshot).

Scale notes: the manifest holds file names, not data — O(files). Readers
load by explicit file list, so a snapshot read is immune to concurrent
writers adding v=n+1 alongside (no directory-listing races).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_MANIFEST.json"
_LATEST = "_LATEST"


def _fs(spark: SparkSession, path: str):
    """(FileSystem, jvm, Path-class) for ``path`` — any Hadoop scheme."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(conf), jvm, jvm.org.apache.hadoop.fs.Path


def _read_text(spark: SparkSession, path: str) -> str | None:
    fs, jvm, P = _fs(spark, path)
    p = P(path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _write_text(spark: SparkSession, path: str, content: str) -> None:
    fs, _, P = _fs(spark, path)
    out = fs.create(P(path), True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _rename_overwrite(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic publish: FileContext rename with Options.Rename.OVERWRITE
    (the same primitive Spark's own checkpoint/commit protocols use)."""
    jvm = spark.sparkContext._jvm
    gateway = spark.sparkContext._gateway
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    src_p = P(src)
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        src_p.getFileSystem(conf).getUri(), conf
    )
    opts = gateway.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(src_p, P(dst), opts)


def _publish_version(
    df: DataFrame, root: str, base: int | None, epoch: int | None = None
) -> int:
    """Shared write path: data files → manifest (optionally chained to
    ``base``) → atomic ``_LATEST`` rename. A crash before the rename
    leaves a dangling (unreferenced) version directory, never a corrupt
    latest."""
    spark = df.sparkSession
    fs, _, P = _fs(spark, root)
    root_p = P(root)
    fs.mkdirs(root_p)
    # allocate past BOTH the published latest and any dangling directory a
    # crashed writer left behind — otherwise the next write collides with
    # the dangling v=N forever (errorifexists) and snapshots wedge
    existing = []
    for st in fs.listStatus(root_p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v=") and name[2:].isdigit():
            existing.append(int(name[2:]))
    version = max([latest_version(root, spark), *existing], default=0) + 1
    vdir = f"{root}/v={version}"
    df.write.mode("errorifexists").parquet(vdir)
    files = sorted(
        st.getPath().getName()
        for st in fs.listStatus(P(vdir))
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    )
    n_rows = spark.read.parquet(vdir).count()
    manifest = {"version": version, "files": files, "n_rows": n_rows}
    if base is not None:
        manifest["base"] = base
    if epoch is not None:
        # writer-supplied commit marker (e.g. a streaming epoch id): lets a
        # replayed foreachBatch recognize its own already-published batch
        manifest["epoch"] = epoch
    _write_text(spark, f"{vdir}/{_MANIFEST}", json.dumps(manifest))
    tmp = f"{root}/.{_LATEST}.tmp.{version}"
    _write_text(spark, tmp, str(version))
    _rename_overwrite(spark, tmp, f"{root}/{_LATEST}")  # atomic publish
    return version


def write_snapshot(df: DataFrame, root: str) -> int:
    """Write the next corpus version as a FULL snapshot; returns its
    number.  See :func:`_publish_version` for the crash-safety contract.
    """
    return _publish_version(df, root, base=None)


def append_snapshot(df: DataFrame, root: str) -> int:
    """B6: publish the next version as an APPEND over the current latest —
    the new directory holds only ``df``'s rows, and the manifest's
    ``base`` pointer chains to the previous version, so readers of v=N
    transparently union the whole chain while the WRITE cost is O(batch),
    not O(corpus).

    This is the manifest-tree move (Iceberg/Delta appends) at corpus
    granularity, and what makes :func:`read_snapshot_increment` possible:
    consumers that already processed v=M read ONLY the directories of
    (M, N] — the incremental-ETL contract a 100 TB ingest pipeline needs
    (re-reading the corpus per batch is the thing this exists to avoid).

    With no published latest this degrades to a full snapshot (the chain
    root).  Chains re-root at every :func:`write_snapshot` (a full
    rewrite — compaction's output, a backfill) — increments across a
    re-root raise rather than silently double-count.
    """
    spark = df.sparkSession
    latest = latest_version(root, spark)
    return _publish_version(df, root, base=latest if latest > 0 else None)


def append_snapshot_once(df: DataFrame, root: str, epoch: int) -> int | None:
    """Exactly-once append for streaming sinks: publish ``df`` chained to
    the latest version UNLESS the latest version already carries this
    ``epoch`` marker (a foreachBatch replay re-delivering its last
    committed batch).  Returns the published version, or None when the
    epoch was already committed.  Checking only the LATEST manifest
    suffices: Structured Streaming replays at most the last uncommitted
    epoch, never earlier ones."""
    spark = df.sparkSession
    latest = latest_version(root, spark)
    if latest > 0:
        man = _manifest(spark, root, latest)
        if man is not None and man.get("epoch") == epoch:
            return None
    return _publish_version(
        df, root, base=latest if latest > 0 else None, epoch=epoch
    )


def read_snapshot_increment(
    spark: SparkSession, root: str, since_version: int, to_version: int | None = None
) -> DataFrame:
    """Rows ADDED between two versions of an append chain: exactly the
    files of versions (since, to], validated by walking ``to``'s base
    pointers back to ``since``.  Raises ``ValueError`` if the walk hits a
    full snapshot first (the chain was re-rooted by a rewrite — an
    increment would be meaningless), so a consumer can fall back to a
    full re-read explicitly instead of double-counting silently.
    """
    to = latest_version(root, spark) if to_version is None else to_version
    if since_version > to:
        raise ValueError(f"since={since_version} is newer than to={to}")
    paths: list[str] = []
    cur: int | None = to
    while cur is not None and cur != since_version:
        man = _manifest(spark, root, cur)
        if man is None:
            raise FileNotFoundError(f"no manifest for version {cur} under {root}")
        paths.extend(f"{root}/v={cur}/{f}" for f in man["files"])
        cur = man.get("base")
    if cur != since_version:
        raise ValueError(
            f"versions ({since_version}, {to}] are not an append chain "
            "(a full rewrite re-rooted it); re-read the full snapshot "
            "instead"
        )
    if not paths:  # since == to
        return read_snapshot(spark, root, to).limit(0)
    return spark.read.parquet(*paths)


def latest_version(root: str, spark: SparkSession | None = None) -> int:
    """The last published version (0 if none)."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("latest_version needs an active SparkSession")
    text = _read_text(spark, f"{root}/{_LATEST}")
    return int(text.strip()) if text else 0


def _manifest(spark: SparkSession, root: str, version: int) -> dict | None:
    text = _read_text(spark, f"{root}/v={version}/{_MANIFEST}")
    return json.loads(text) if text else None


def _chain_files(spark: SparkSession, root: str, version: int) -> list[str]:
    """Absolute data paths of a version, following append-chain ``base``
    pointers: an appended version's data physically spans every ancestor
    directory back to the last full snapshot."""
    paths: list[str] = []
    cur: int | None = version
    while cur is not None:
        man = _manifest(spark, root, cur)
        if man is None:
            raise FileNotFoundError(
                f"no manifest for version {cur} under {root}"
            )
        paths.extend(f"{root}/v={cur}/{f}" for f in man["files"])
        cur = man.get("base")
    return paths


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned (or the latest published) snapshot by its manifest's
    explicit file list — never by directory listing, so concurrent writers
    and dangling partial versions are invisible.  Append-chain versions
    (:func:`append_snapshot`) transparently include their ancestors'
    files."""
    v = latest_version(root, spark) if version is None else version
    return spark.read.parquet(*_chain_files(spark, root, v))


def vacuum_snapshots(
    spark: SparkSession, root: str, keep_last: int = 2
) -> list[int]:
    """Retention sweep: delete version directories older than the newest
    ``keep_last`` PUBLISHED-or-earlier versions; returns what was removed.

    Rules (the time-travel retention contract):

    - the published latest is always kept, whatever ``keep_last`` says;
    - versions NEWER than the published latest are kept too — they are a
      concurrent writer's in-flight publish, not garbage (its ``_LATEST``
      rename may land any moment);
    - a dangling directory (no manifest — a crashed writer at or below
      the published latest) is garbage and is removed unconditionally: it
      never occupies one of the ``keep_last`` slots, so it cannot displace
      a readable version from the retention horizon;
    - idempotent: a second sweep deletes nothing;
    - append-chain safe: directories a KEPT version's manifest chain
      references (``base`` pointers) are kept too, without consuming
      ``keep_last`` slots — retention counts snapshots, not directories.

    Readers pinned to a vacuumed version get ``FileNotFoundError`` from
    :func:`read_snapshot` — retention is the documented trade of
    time-travel depth for storage; at 100 TB each kept version is a full
    snapshot copy, so ``keep_last`` IS the storage multiplier.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs, _, P = _fs(spark, root)
    root_p = P(root)
    if not fs.exists(root_p):
        return []
    latest = latest_version(root, spark)
    versions = sorted(
        int(st.getPath().getName()[2:])
        for st in fs.listStatus(root_p)
        if st.isDirectory()
        and st.getPath().getName().startswith("v=")
        and st.getPath().getName()[2:].isdigit()
    )
    # Only manifest-bearing (readable) versions may occupy keep slots: a
    # dangling dir below the horizon is a crashed writer, and letting it
    # consume a slot would silently evict a READABLE version and shrink
    # time-travel depth below keep_last.
    readable = {
        v
        for v in versions
        if v <= latest and fs.exists(P(f"{root}/v={v}/{_MANIFEST}"))
    }
    eligible = sorted(readable)
    keep = set(eligible[-keep_last:]) | {latest}
    # Append-chain closure: a kept version's DATA may physically live in
    # ancestor directories (append_snapshot's base pointers) — deleting a
    # base would corrupt a kept snapshot, so bases ride along without
    # consuming keep_last slots.
    frontier = list(keep)
    while frontier:
        v = frontier.pop()
        man = _manifest(spark, root, v)
        base = man.get("base") if man else None
        if base is not None and base not in keep:
            keep.add(base)
            frontier.append(base)
    removed = []
    for v in versions:
        if v <= latest and v not in keep:
            fs.delete(P(f"{root}/v={v}"), True)
            removed.append(v)
    return removed


def table_fingerprint(
    df: "DataFrame",
    repr_col: "Column",
    group_cols: Sequence[str] = (),
) -> "DataFrame":
    """Order-independent content fingerprint — the cheap "is this table
    bit-identical over there" check behind snapshot replication audits,
    pre/post-migration diffs and cross-engine parity gates (exactly what
    this repo's own oracle harness does row-by-row, collapsed to one
    commutative signature per group).

    ``repr_col`` must be a CANONICAL string rendering of the row (caller
    fixes column order, number formatting, null encoding). Each row maps
    to a 60-bit md5-derived int (``shared_hash60`` — reproducible in ANSI
    SQL), and per group the report carries: exact row count, the XOR fold
    of hashes, a modular-sum fold (``sum(h mod 1000003)``), and min/max
    hash. XOR alone is blind to duplicated row PAIRS (x⊕x=0); the
    modular sum alone wraps; together with the count a divergence in any
    multiset of rows is detected with ~2^-60 collision odds.

    All four folds are commutative + associative → one partial-aggregated
    scan, no shuffle beyond the tiny per-group reduce, no sort, no
    window. At 100 TB this is scan-bound — the minimum possible cost for
    a content check — and two clusters can each compute their side
    independently and compare ~bytes.
    """
    from project_obsidian_core_spark.datapipe.text import shared_hash60

    keys = list(group_cols)
    rows = df.select(*keys, shared_hash60(repr_col).alias("_h"))
    return rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_h)").alias("xor_sig"),
        F.sum(F.col("_h") % 1_000_003).alias("modsum_sig"),
        F.min("_h").alias("min_hash"),
        F.max("_h").alias("max_hash"),
    )


def compact_chain(spark: SparkSession, root: str) -> int:
    """B7: re-root an append chain — one full rewrite of the current
    snapshot published as a FULL version (no ``base`` pointer), after
    which every pre-compaction directory is reclaimable by
    :func:`vacuum_snapshots` and the read-side chain walk resets to
    O(1) manifests.

    The amortization contract mirrors MOR compaction (operators/merge.py):
    appends stay O(batch) forever, and the full-rewrite cost is paid once
    per compaction cycle instead of per publish.  Incremental consumers
    (:func:`read_snapshot_increment`) whose cursor predates the re-root
    get the documented ValueError and fall back to a full re-read — the
    same contract as a Kafka topic compaction crossing their offset.
    """
    return write_snapshot(read_snapshot(spark, root), root)
