"""Partitioned corpus sink: layout, pruning, and file-count control."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import pipeline as P


def _corpus(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("fr").alias("lang"),
        F.when(F.col("id") % 10 == 0, "val").otherwise("train").alias("split"),
    )


def test_write_corpus_layout_and_pruning(spark):
    tmp = tempfile.mkdtemp(prefix="corpus_sink_")
    P.write_corpus(_corpus(spark), tmp)
    # directory layout: split=.../lang=...
    assert glob.glob(f"{tmp}/split=train/lang=en/*.parquet")
    assert glob.glob(f"{tmp}/split=val/lang=fr/*.parquet")
    # read-back with a split filter must prune to the val directories only
    back = spark.read.parquet(tmp).filter(F.col("split") == "val")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 20
    assert "PartitionFilters: [isnotnull(split" in plan or "split#" in plan
    # the scan's file listing must not include train partitions
    files = back.select(F.input_file_name()).distinct().collect()
    assert all("split=val" in r[0] for r in files)


def test_write_corpus_file_count_control(spark):
    tmp = tempfile.mkdtemp(prefix="corpus_sink_files_")
    # 180 train docs with target 50 rows/file -> ceil(180/50)=4 salt buckets
    P.write_corpus(_corpus(spark), tmp, target_file_rows=50)
    train_en = glob.glob(f"{tmp}/split=train/lang=en/*.parquet")
    assert 1 < len(train_en) <= 8  # spread across salt buckets, not one giant file
    # round-trip is lossless
    back = spark.read.parquet(tmp)
    assert back.count() == 200
    assert back.select(F.sum("doc_id")).collect()[0][0] == sum(range(200))


def test_write_corpus_schema_evolution(spark):
    import tempfile

    tmp = tempfile.mkdtemp(prefix="corpus_evolve_")
    v1 = _corpus(spark, n=40)
    P.write_corpus(v1, tmp, mode="append")
    # a later pipeline version adds a column; append with mergeSchema read
    v2 = _corpus(spark, n=40).withColumn(
        "quality", (F.col("doc_id") % 10).cast("double") / 10
    ).withColumn("doc_id", F.col("doc_id") + 1000)
    P.write_corpus(v2, tmp, mode="append")
    back = spark.read.option("mergeSchema", "true").parquet(tmp)
    assert back.count() == 80
    assert "quality" in back.columns
    # old rows surface the new column as null, new rows carry values
    old = back.filter("doc_id < 1000")
    assert old.filter(F.col("quality").isNotNull()).count() == 0
    assert back.filter("doc_id >= 1000").filter(
        F.col("quality").isNull()
    ).count() == 0


def test_write_corpus_null_partition_value_not_dropped(spark):
    import tempfile

    tmp = tempfile.mkdtemp(prefix="corpus_nullpart_")
    rows = [(1, "t", "en", "train"), (2, "t", None, "train")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "split"])
    P.write_corpus(df, tmp, target_file_rows=10)
    # the NULL-lang row must land in the default partition, not vanish
    back = spark.read.parquet(tmp)
    assert back.count() == 2
    assert back.filter(F.col("lang").isNull()).count() == 1


def test_write_corpus_zorder_clusters_within_partitions(spark):
    """zorder_cols clusters files INSIDE each directory partition: a small
    box probe on the z dimensions must skip most files by parquet footer
    min/max, while the partition layout and row contents stay identical."""
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="corpus_sink_z_")
    docs = (
        spark.range(4000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 617).alias("x"),
            (F.col("id") * 31 % 1009).alias("y"),
            F.when(F.col("id") % 10 == 0, "val").otherwise("train").alias("split"),
            F.lit("en").alias("lang"),
        )
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        P.write_corpus(
            docs,
            tmp,
            zorder_cols=[("x", 0, 617), ("y", 0, 1009)],
            zorder_bits=8,
            zorder_tasks=8,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    # layout + contents intact
    assert glob.glob(f"{tmp}/split=train/lang=en/*.parquet")
    back = spark.read.parquet(tmp)
    assert back.count() == 4000
    # footer-stat pruning on BOTH z dimensions inside the train partition:
    # a ~1.5% box should intersect well under half of the files
    files = glob.glob(f"{tmp}/split=train/lang=en/*.parquet")
    assert len(files) >= 4  # range shuffle spread the stratum over tasks
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            cols = {
                md.row_group(rg).column(i).path_in_schema: md.row_group(rg)
                .column(i)
                .statistics
                for i in range(md.row_group(rg).num_columns)
            }
            if (
                cols["x"].min <= 80
                and cols["x"].max >= 0
                and cols["y"].min <= 120
                and cols["y"].max >= 0
            ):
                hit += 1
                break
    assert hit < len(files) / 2, (hit, len(files))
