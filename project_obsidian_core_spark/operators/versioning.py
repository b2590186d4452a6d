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

Scale notes: the manifest holds file names, not data — O(files). Readers
load by explicit file list, so a snapshot read is immune to concurrent
writers adding v=n+1 alongside (no directory-listing races).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_MANIFEST.json"
_LATEST = "_LATEST"


def write_snapshot(df: DataFrame, root: str) -> int:
    """Write the next corpus version; returns its number.

    Order of operations is the crash-safety contract: data files → manifest
    → atomic ``_LATEST`` rename. A crash before the rename leaves a
    dangling (unreferenced) version directory, never a corrupt latest.
    """
    os.makedirs(root, exist_ok=True)
    # allocate past BOTH the published latest and any dangling directory a
    # crashed writer left behind — otherwise the next write collides with
    # the dangling v=N forever (errorifexists) and snapshots wedge
    existing = [
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    version = max([latest_version(root), *existing], default=0) + 1
    vdir = os.path.join(root, f"v={version}")
    df.write.mode("errorifexists").parquet(vdir)
    files = sorted(
        f for f in os.listdir(vdir) if f.endswith(".parquet")
    )
    spark = df.sparkSession
    n_rows = spark.read.parquet(vdir).count()
    manifest = {"version": version, "files": files, "n_rows": n_rows}
    with open(os.path.join(vdir, _MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    tmp = os.path.join(root, f"{_LATEST}.tmp.{version}")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(root, _LATEST))  # atomic publish
    return version


def latest_version(root: str) -> int:
    """The last published version (0 if none)."""
    try:
        with open(os.path.join(root, _LATEST)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned (or the latest published) snapshot by its manifest's
    explicit file list — never by directory listing, so concurrent writers
    and dangling partial versions are invisible."""
    v = latest_version(root) if version is None else version
    vdir = os.path.join(root, f"v={v}")
    with open(os.path.join(vdir, _MANIFEST)) as fh:
        manifest = json.load(fh)
    paths = [os.path.join(vdir, f) for f in manifest["files"]]
    return spark.read.parquet(*paths)
