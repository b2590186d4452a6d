"""JSONL corpus ingestion: the wire format crawled corpora actually arrive
in (one JSON document per line), read with explicit schema + corrupt-record
capture.

Why explicit schema: `spark.read.json` without one runs a full inference
pass over the data — a second 100 TB scan before the first real one. Why
PERMISSIVE + `_corrupt_record`: a crawl shard with one truncated line must
not kill the job (FAILFAST) nor silently drop rows (DROPMALFORMED); the
corrupt lines land in a quarantine column for routing to a repair queue.

Mirrors the OTLP receiver's structure (sources/otlp.py): schema-first
parse, serialize→parse identity as the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents-table wire schema plus the quarantine column
CORRUPT_COL = "_corrupt_record"

DOCUMENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def write_jsonl(df: DataFrame, path: str, corrupt_mod: int | None = None) -> None:
    """Serialize a documents relation to JSONL. With ``corrupt_mod``,
    deterministically truncate every ``doc_id % corrupt_mod == 0`` line —
    the test fixture for the quarantine path (real crawls provide their own
    corruption)."""
    line = F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))
    if corrupt_mod is not None:
        line = F.when(
            F.col("doc_id") % corrupt_mod == 0, F.substring(line, 1, 10)
        ).otherwise(line)
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_jsonl_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Schema-first PERMISSIVE JSONL read with corrupt-record capture.

    Implemented as text-scan + ``from_json`` (the OTLP receiver's pattern)
    rather than ``spark.read.json``: the raw-JSON reader forbids plans whose
    referenced columns are only the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is exactly
    what the quarantine branch needs. The text scan has no such restriction
    and the parse stays a per-row JVM expression.
    """
    parsed = spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            DOCUMENT_JSON_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j")
    )
    return parsed.select("j.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the quarantine column, quarantined raw lines)."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
