"""Driver-facing wrapper for JSONL corpus ingestion.

The fixture round-trips the documents table through JSONL with a
deterministic corruption (every ``doc_id % CORRUPT_MOD == 0`` line
truncated); the corruption rule lives in doc_id arithmetic, so the oracle
states the expected survivor set directly against the parquet view without
touching the JSONL path — same fixture technique as the streaming and OTLP
gates (fixture materialization memoized per-process).
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.plans.common import load
from project_obsidian_core_spark.sources import corpus as SC

#: every Nth doc's JSONL line is truncated in the fixture
CORRUPT_MOD = 50

_RUN_IDS = itertools.count()
_SRC_CACHE: dict[str, str] = {}


def jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL (with deterministic corruption) → schema-first
    PERMISSIVE read → quarantine split → clean rows."""
    src = _SRC_CACHE.get(sf_dir)
    if src is None:
        src = tempfile.mkdtemp(prefix=f"obsidian_jsonl_{next(_RUN_IDS)}_") + "/docs"
        SC.write_jsonl(load(spark, sf_dir, "documents"), src, corrupt_mod=CORRUPT_MOD)
        _SRC_CACHE[sf_dir] = src
    good, _bad = SC.split_corrupt(SC.read_jsonl_corpus(spark, src))
    return good.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


ORACLE_jsonl_ingest = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id % {CORRUPT_MOD} <> 0
ORDER BY doc_id
"""


# ------------------------------------------- custom Python DataSource scan
#: crawl-source dimensions for the driver-gated scan
CRAWL_SHARDS = 8
CRAWL_DOCS_PER_SHARD = 64
CRAWL_SEED = "crawl"


def pysource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom Python DataSource (one split per shard) and
    aggregate per shard — the oracle regenerates the same rows in SQL from
    the (seed, doc_id) formula, checking the connector end-to-end."""
    from project_obsidian_core_spark.sources import pysource as PS

    PS.register(spark)
    df = (
        spark.read.format(PS.FORMAT_NAME)
        .option("seed", CRAWL_SEED)
        .option("shards", CRAWL_SHARDS)
        .option("docs_per_shard", CRAWL_DOCS_PER_SHARD)
        .load()
    )
    # 60-bit hashes summed over a shard overflow int64 — fold each through
    # a prime modulus first (same reduction in the oracle)
    return (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("crawl_hash") % 1_000_000_007).alias("hash_sum"),
            F.sum(F.length("text")).alias("text_len_sum"),
        )
        .orderBy("shard")
    )


ORACLE_pysource_scan = f"""
WITH g AS (
    SELECT i AS doc_id,
           i // {CRAWL_DOCS_PER_SHARD} AS shard,
           md5('{CRAWL_SEED}:' || CAST(i AS VARCHAR)) AS text
    FROM generate_series(0, {CRAWL_SHARDS * CRAWL_DOCS_PER_SHARD - 1}) t(i)
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(CAST('0x' || substr(text, 1, 15) AS BIGINT) % 1000000007)
            AS BIGINT) AS hash_sum,
       CAST(sum(length(text)) AS BIGINT) AS text_len_sum
FROM g
GROUP BY shard
ORDER BY shard
"""


# ---------------------------------------------------------- CSV ingestion
_CSV_SRC_CACHE: dict[str, str] = {}


def csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → headered CSV (with deterministic corruption) →
    schema-first PERMISSIVE read → quarantine split → clean rows."""
    src = _CSV_SRC_CACHE.get(sf_dir)
    if src is None:
        src = tempfile.mkdtemp(prefix=f"obsidian_csv_{next(_RUN_IDS)}_") + "/docs"
        SC.write_csv_corpus(
            load(spark, sf_dir, "documents"), src, corrupt_mod=CORRUPT_MOD
        )
        _CSV_SRC_CACHE[sf_dir] = src
    good, _bad = SC.split_corrupt(SC.read_csv_corpus(spark, src))
    return good.select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")


ORACLE_csv_ingest = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id % {CORRUPT_MOD} <> 0
ORDER BY doc_id
"""
