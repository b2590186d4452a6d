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
