"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
partition-parallel synthetic crawl-shard source.

Demonstrates the engine's newest extension surface — a pure-Python batch
source that Spark schedules like any other scan: ``partitions()`` returns
one split per crawl shard, each executor materializes only its shard, and
nothing flows through the driver. The row content is a deterministic
function of (seed, doc_id) built from md5, so the driver-gated oracle
reproduces the entire scan in SQL — a correctness check most custom
connectors never get.

Real deployments swap the generator body for actual shard fetches (WARC
readers, S3 listings); the scheduling/partitioning shape is the part that
carries.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

FORMAT_NAME = "obsidian_crawl"

CRAWL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("crawl_hash", T.LongType()),
    ]
)


def _row(seed: str, doc_id: int) -> tuple[int, int, str, int]:
    digest = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return doc_id, -1, digest, int(digest[:15], 16)  # shard filled by caller


class _ShardPartition(InputPartition):
    def __init__(self, shard: int):
        self.shard = shard


class CrawlShardReader(DataSourceReader):
    def __init__(self, options):
        self.seed = options.get("seed", "crawl")
        self.shards = int(options.get("shards", 8))
        self.docs_per_shard = int(options.get("docs_per_shard", 64))

    def partitions(self):
        return [_ShardPartition(s) for s in range(self.shards)]

    def read(self, partition):
        base = partition.shard * self.docs_per_shard
        for i in range(self.docs_per_shard):
            doc_id, _, text, h = _row(self.seed, base + i)
            yield (doc_id, partition.shard, text, h)


class CrawlShardSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return CRAWL_SCHEMA

    def reader(self, schema):
        return CrawlShardReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the format with this session.

    Only the already-registered error is swallowed; anything else (e.g. a
    Spark build without the Python DataSource API) propagates now instead
    of resurfacing later as an unrelated DATA_SOURCE_NOT_FOUND.
    """
    try:
        spark.dataSource.register(CrawlShardSource)
    except Exception as exc:
        if "EXISTS" not in str(exc).upper():
            raise
