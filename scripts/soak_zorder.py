"""Round-7 soak: Z-order clustering vs single-column sort for
multi-dimensional data skipping.

10M rows with two independent uniform dimensions (x, y), written three
ways (same 64 files each):

  a) unsorted (hash-ish arrival order)   — no pruning on either dim
  b) range-sorted by x                   — perfect pruning on x, none on y
  c) z-ordered on (x, y)                 — box pruning on BOTH dims

The skipping metric is objective, not timing-based: pyarrow reads every
row-group footer and counts the groups whose [min, max] box INTERSECTS a
1% x 1% box predicate (what any stats-based reader must scan). Spark
wall time for the same filtered count() is reported alongside.

Usage: python scripts/soak_zorder.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.operators.layout import (  # noqa: E402
    write_zordered,
    zorder_value,
)
from project_obsidian_core_spark.session import build_session  # noqa: E402

N = 10_000_000
DOMAIN = 1_000_000  # x, y uniform in [0, DOMAIN)
N_FILES = 64
# 1% x 1% box predicate
X_LO, X_HI = 400_000, 410_000
Y_LO, Y_HI = 700_000, 710_000


#: predicates: 1% box on both dims, 1% range on x alone, on y alone.
PREDICATES = {
    "box": {"x": (X_LO, X_HI), "y": (Y_LO, Y_HI)},
    "x-only": {"x": (X_LO, X_HI)},
    "y-only": {"y": (Y_LO, Y_HI)},
}


def rowgroups_scanned(path: str, pred: dict) -> tuple[int, int]:
    """(total row groups, groups whose stats intersect every range in
    ``pred``) — what any min/max-stats reader must scan."""
    total = hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            stats = {
                rg.column(c).path_in_schema: rg.column(c).statistics
                for c in range(rg.num_columns)
            }
            total += 1
            if all(
                stats[c].min <= hi and stats[c].max >= lo
                for c, (lo, hi) in pred.items()
            ):
                hit += 1
    return total, hit


def timed_count(spark, path: str, pred: dict) -> tuple[float, int]:
    df = spark.read.parquet(path)
    for c, (lo, hi) in pred.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main() -> None:
    spark = build_session(app_name="soak-zorder")
    # two independent uniform dims from a splitmix-style mix of id
    df = spark.range(N).select(
        F.expr(f"cast(hash(id, 1) as bigint) % {DOMAIN}").alias("x"),
        F.expr(f"cast(hash(id, 2) as bigint) % {DOMAIN}").alias("y"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"))

    tmp = tempfile.mkdtemp(prefix="soak_z_")
    paths = {k: f"{tmp}/{k}" for k in ("unsorted", "xsort", "zorder")}

    df.repartition(N_FILES).write.mode("overwrite").parquet(paths["unsorted"])
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(paths["xsort"])
    )
    write_zordered(
        df,
        paths["zorder"],
        [("x", 0, DOMAIN), ("y", 0, DOMAIN)],
        bits=16,
        n_files=N_FILES,
    )

    for name, path in paths.items():
        for pname, pred in PREDICATES.items():
            total, hit = rowgroups_scanned(path, pred)
            wall, n = timed_count(spark, path, pred)
            print(
                f"{name:9s} {pname:7s}: row-groups scanned {hit}/{total} "
                f"({100.0 * hit / total:.1f}%), filtered count={n}, "
                f"spark wall {wall:.2f}s"
            )
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
