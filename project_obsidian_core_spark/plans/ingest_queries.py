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


def corpus_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two parquet generations with EVOLVED schemas (v1: doc_id/text/source
    only — the columns a year-old pipeline wrote; v2: today's full five)
    read as one relation via ``mergeSchema`` + typed defaults
    (:func:`sources.corpus.read_evolving_corpus`), then a per-lang
    summary. The oracle restates union-by-name + default semantics
    directly over the documents view, so the gate pins Spark's
    footer-reconciliation behavior against the semantic spec.
    """
    key = f"evolve:{sf_dir}"
    src = _SRC_CACHE.get(key)
    if src is None:
        src = tempfile.mkdtemp(prefix=f"obsidian_evolve_{next(_RUN_IDS)}_")
        docs = load(spark, sf_dir, "documents")
        docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "text", "source"
        ).write.mode("overwrite").parquet(f"{src}/gen=v1")
        docs.filter(F.col("doc_id") % 2 == 1).write.mode("overwrite").parquet(
            f"{src}/gen=v2"
        )
        _SRC_CACHE[key] = src
    evolved = SC.read_evolving_corpus(
        spark,
        f"{src}/gen=v1",
        f"{src}/gen=v2",
        added_defaults={"lang": "und", "n_chars": -1},
    )
    return (
        evolved.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_n_chars"),
            F.count("text").alias("n_text"),
        )
        .orderBy("lang")
    )


ORACLE_corpus_schema_evolution = """
WITH evolved AS (
    SELECT doc_id, text, source, 'und' AS lang, CAST(-1 AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, text, source, lang, n_chars
    FROM documents WHERE doc_id % 2 = 1
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
       count(text) AS n_text
FROM evolved
GROUP BY lang
ORDER BY lang
"""


# ------------------------------------------------------------ ORC ---------
_ORC_CACHE: dict[str, str] = {}


def orc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-format breadth: orders round-tripped through ORC (Spark's
    other built-in columnar sink besides parquet) and re-aggregated — the
    gate proves type fidelity across the format boundary, including the
    timestamp column (TZ handling is where ORC↔parquet migrations
    actually break: the µs bounds below are derived from the ROUND-TRIPPED
    timestamps, so any instant shift fails the hash). The oracle computes
    the same aggregate straight from the parquet view — if ORC preserved
    every value, the two are indistinguishable.

    At 100 TB the read path matters as much as the write: ORC carries the
    same column pruning + predicate pushdown + stripe-level min/max
    statistics as parquet, so the scan shape (pushed filter, pruned
    schema) is identical — only the container differs.
    """
    from project_obsidian_core_spark.plans.common import cents

    src = _ORC_CACHE.get(sf_dir)
    if src is None:
        src = (
            tempfile.mkdtemp(prefix=f"obsidian_orc_{next(_RUN_IDS)}_")
            + "/orders_orc"
        )
        load(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_orderpriority",
            cents("o_totalprice").alias("price_cents"),
            "o_orderdate",
        ).write.mode("overwrite").orc(src)
        _ORC_CACHE[sf_dir] = src
    o = spark.read.orc(src)
    return (
        o.filter(F.col("o_orderstatus") != "P")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_cents").alias("total_cents"),
            F.min(F.unix_micros(F.col("o_orderdate"))).alias("min_order_us"),
            F.max(F.unix_micros(F.col("o_orderdate"))).alias("max_order_us"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_orc_ingest = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS total_cents,
       min(epoch_us(o_orderdate)) AS min_order_us,
       max(epoch_us(o_orderdate)) AS max_order_us,
       count(DISTINCT o_custkey) AS n_customers
FROM orders
WHERE o_orderstatus != 'P'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
