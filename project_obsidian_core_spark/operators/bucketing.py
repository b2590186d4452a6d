"""Bucketed-table write path — co-located joins without a shuffle.

The reference relies on Druid segment pruning; the Spark-native equivalent
for *join* locality is bucketing: write both fact tables bucketed and
sorted on the join key, and every subsequent equi-join on that key planned
over the saved tables is exchange-free (SortMergeJoin reads co-located
buckets directly). At 100 TB this converts the nightly "join snapshots to
deltas" or "join qan facts to digest dims" from a full dual shuffle into a
local merge per bucket.

Rules encoded here:
- bucket counts must MATCH on both sides (or be integer multiples) for
  Spark to elide the exchange;
- `sortBy` on the same key also elides the per-bucket sort at read time;
- bucketed output goes through `saveAsTable` (bucket metadata lives in the
  catalog; a plain parquet path write silently drops it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and sorted) on ``bucket_cols``.

    ``path`` makes it an external table at that location (the warehouse dir
    is a static conf — per-test/tmp locations must come through here)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    force_sortmerge: bool = False,
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.

    With matching bucket specs the planned sort-merge join has NO shuffle
    Exchange on either side (pinned by tests/test_bucketing.py — the plan
    is asserted, not assumed). ``force_sortmerge`` adds the MERGE hint:
    useful when one side is small enough that the planner would broadcast
    (which bypasses bucket locality entirely — fine, but then you are not
    measuring the co-located path).
    """
    left = spark.table(left_table)
    if force_sortmerge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
