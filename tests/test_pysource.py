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


# ----------------------------- R10: streaming reader contracts ---------
def test_stream_reader_drains_to_batch_equivalence(spark):
    import tempfile

    from project_obsidian_core_spark.sources.pysource import register

    register(spark)
    tmp = tempfile.mkdtemp(prefix="pysrc_stream_")
    opts = {"seed": "s1", "shards": 4, "batch_docs": 16, "max_docs": 80}
    stream = spark.readStream.format("obsidian_crawl")
    for k, v in opts.items():
        stream = stream.option(k, str(v))
    q = (
        stream.load()
        .writeStream.format("memory")
        .queryName("pysrc_stream")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = spark.table("pysrc_stream")
    assert got.count() == 80
    # streaming rows == batch-source rows for the same (seed, doc range):
    # shard differs by design (stream shards by doc_id % shards), so
    # compare the deterministic content columns
    batch = (
        spark.read.format("obsidian_crawl")
        .option("seed", "s1")
        .option("shards", 5)
        .option("docs_per_shard", 16)
        .load()
    )
    g = {(r.doc_id, r.text, r.crawl_hash) for r in got.collect()}
    b = {(r.doc_id, r.text, r.crawl_hash) for r in batch.collect()}
    assert g == b


def test_stream_reader_offsets_replay_deterministically():
    from project_obsidian_core_spark.sources.pysource import (
        CrawlShardStreamReader,
    )

    r = CrawlShardStreamReader({"seed": "s2", "batch_docs": 10, "max_docs": 25})
    off0 = r.initialOffset()
    rows1, off1 = r.read(off0)
    rows1 = list(rows1)  # list already; kept for clarity
    assert off1 == {"pos": 10} and len(rows1) == 10
    # replay of the committed range is bit-identical (exactly-once contract)
    assert list(r.readBetweenOffsets(off0, off1)) == rows1
    # drain: past max_docs the offset stops advancing
    _, off2 = r.read({"pos": 25})
    assert off2 == {"pos": 25}
    # tail batch is truncated at max_docs
    rows3, off3 = r.read({"pos": 20})
    assert off3 == {"pos": 25} and len(list(rows3)) == 5
