"""Custom Python DataSource: schema, determinism, shard parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.sources import pysource as PS


def _read(spark, shards=4, dps=16):
    PS.register(spark)
    return (
        spark.read.format(PS.FORMAT_NAME)
        .option("shards", shards)
        .option("docs_per_shard", dps)
        .load()
    )


def test_pysource_rows_and_schema(spark):
    df = _read(spark)
    assert [f.name for f in df.schema.fields] == ["doc_id", "shard", "text", "crawl_hash"]
    assert df.count() == 64
    # determinism: same options -> identical rows
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark).collect()))
    assert a == b
    # content matches the (seed, doc_id) formula
    row = df.filter("doc_id = 5").collect()[0]
    import hashlib

    digest = hashlib.md5(b"crawl:5").hexdigest()
    assert row["text"] == digest and row["crawl_hash"] == int(digest[:15], 16)


def test_pysource_one_task_per_shard(spark):
    df = _read(spark, shards=4, dps=16)
    parts = (
        df.select("shard", F.spark_partition_id().alias("pid"))
        .distinct()
        .collect()
    )
    # every shard maps to exactly one input partition, and no partition
    # serves two shards — the source parallelizes as declared
    shard_to_pid = {}
    for r in parts:
        shard_to_pid.setdefault(r["shard"], set()).add(r["pid"])
    assert len(shard_to_pid) == 4
    assert all(len(p) == 1 for p in shard_to_pid.values())
    pids = [next(iter(p)) for p in shard_to_pid.values()]
    assert len(set(pids)) == 4
