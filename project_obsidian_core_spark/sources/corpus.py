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


def write_csv_corpus(
    df: DataFrame, path: str, corrupt_mod: int | None = None
) -> None:
    """Serialize a documents relation to headered CSV. With
    ``corrupt_mod``, deterministically mangle every
    ``doc_id % corrupt_mod == 0`` row (non-numeric doc_id) — the fixture
    for the malformed-row quarantine path."""
    out = df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "lang",
        "source",
        F.col("n_chars").cast("string").alias("n_chars"),
    )
    if corrupt_mod is not None:
        out = out.withColumn(
            "doc_id",
            F.when(
                F.col("doc_id").cast("long") % corrupt_mod == 0,
                F.concat(F.lit("id_"), F.col("doc_id")),
            ).otherwise(F.col("doc_id")),
        )
    out.write.mode("overwrite").option("header", "true").csv(path)


#: the header line write_csv_corpus emits (filtered back out on read)
CSV_HEADER = "doc_id,lang,source,n_chars"


def read_csv_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Schema-first PERMISSIVE CSV read with malformed-row capture.

    Same contract as :func:`read_jsonl_corpus` for the other wire format
    corpora arrive in: explicit schema (no 100 TB inference pass),
    PERMISSIVE mode so a bad row quarantines instead of killing the job
    (FAILFAST) or vanishing (DROPMALFORMED). A type-mismatched field nulls
    out and the raw line lands in the corrupt column.

    Implemented as text-scan + ``from_csv`` for the same reason as the
    JSONL path: the raw CSV reader forbids plans that reference only the
    corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which the
    quarantine branch does. Header lines are filtered out of the text scan.
    """
    raw = spark.read.text(path).filter(F.col("value") != CSV_HEADER)
    parsed = raw.select(
        F.from_csv(
            F.col("value"),
            "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, "
            f"{CORRUPT_COL} STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("c")
    )
    return parsed.select("c.*")


# ------------------------------------------------------ schema evolution --
def read_evolving_corpus(
    spark: SparkSession, *paths: str, added_defaults: dict | None = None
) -> DataFrame:
    """Read parquet generations whose schemas EVOLVED (columns added over
    time) as one relation — the long-lived-corpus reality: yesterday's
    shards lack the columns today's pipeline writes.

    ``mergeSchema`` unions the file schemas (old files yield NULL for
    columns they predate — Spark reconciles footers per file, no rewrite
    of old generations); ``added_defaults`` then coalesces chosen columns
    to a typed default so downstream operators never special-case the
    old generation.

    Scale notes: schema merging reads FOOTERS of every file at planning
    time — on a 10⁶-file corpus pin the merged schema explicitly
    (``spark.read.schema(merged)``) and skip the discovery cost; the
    per-row behavior (NULL backfill, default coalesce) is identical and
    stays in whole-stage codegen.
    """
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    for col, default in (added_defaults or {}).items():
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return df
