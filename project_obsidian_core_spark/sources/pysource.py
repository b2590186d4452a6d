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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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

    def simpleStreamReader(self, schema):
        return CrawlShardStreamReader(self.options)


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


# ------------------------- R10: streaming Python DataSource (Spark 4) --
class CrawlShardStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the crawl source: each micro-batch emits the next
    ``batch_docs`` documents until ``max_docs``, with the offset = the
    document counter.

    The exactly-once story is the part that carries to real connectors:
    offsets are DURABLE PROGRESS (checkpointed by the engine), and
    ``readBetweenOffsets`` re-derives a batch's rows deterministically
    from its offset range — a restarted query replays its last
    uncommitted batch bit-identically (rows are a pure function of
    (seed, doc_id), the same property the batch reader's oracle uses).
    A real deployment maps offsets to WARC byte ranges / Kafka offsets /
    ingest-ledger sequence numbers; the replay contract is unchanged.
    """

    def __init__(self, options):
        self.seed = options.get("seed", "crawl")
        self.shards = int(options.get("shards", 8))
        self.batch_docs = int(options.get("batch_docs", 32))
        self.max_docs = int(options.get("max_docs", 128))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, lo: int, hi: int) -> list:
        # a LIST, not a generator: the engine pickles the prefetched batch
        # to ship it to executors (generators fail planPartitions)
        out = []
        for doc_id in range(lo, hi):
            did, _, text, h = _row(self.seed, doc_id)
            out.append((did, did % self.shards, text, h))
        return out

    def read(self, start: dict):
        # iter(list): the engine requires an ITERATOR (it calls next() to
        # prefetch) that is also PICKLABLE (it ships the cached batch to
        # executors) — a generator satisfies the first but not the second,
        # a bare list the second but not the first; a list_iterator does both
        pos = int(start["pos"])
        if pos >= self.max_docs:
            return iter([]), start  # drained: offset does not advance
        end = min(pos + self.batch_docs, self.max_docs)
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["pos"]), int(end["pos"])))
