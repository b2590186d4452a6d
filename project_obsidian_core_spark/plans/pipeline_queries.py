"""Driver-gated wrappers for the corpus-management operators
(:mod:`datapipe.pipeline`): deterministic splits, hash sampling,
sessionization, sequence packing.

Oracle SQL is generated from the same constants as the Spark operators
(split weights, salts, gap, context length) so the two sides cannot drift.
The shared 60-bit md5 hash (plans/common.py rules) makes split/sample
membership bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import pipeline as P
from project_obsidian_core_spark.datapipe.text import with_quality_score
from project_obsidian_core_spark.plans.common import cents, load
from project_obsidian_core_spark.plans.datapipe_queries import ORACLE_text_quality

# ---------------------------------------------------------------- split ---
_SPLITS = P.DEFAULT_SPLITS
_SPLIT_SALT = "split"
_SAMPLE_SALT = "sample"
_SAMPLE_RATE = 200  # per mille
_SESSION_GAP = "30 minutes"
_SESSION_GAP_US = 30 * 60 * 1_000_000
_CTX_LEN = 256


def _sql_hash60(expr: str) -> str:
    """DuckDB twin of datapipe.text.shared_hash60."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment for every document."""
    docs = load(spark, sf_dir, "documents")
    return P.assign_splits(docs, splits=_SPLITS, salt=_SPLIT_SALT).select(
        "doc_id", "source", "split"
    ).orderBy("doc_id")


def _split_case_sql(bucket_expr: str) -> str:
    parts, cum = [], 0
    for name, weight in _SPLITS:
        cum += weight
        parts.append(f"WHEN {bucket_expr} < {cum} THEN '{name}'")
    return "CASE " + " ".join(parts) + " ELSE 'train' END"


ORACLE_corpus_split = f"""
SELECT doc_id,
       source,
       {_split_case_sql(_sql_hash60(f"'{_SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)") + " % 1000")} AS split
FROM documents
ORDER BY doc_id
"""


def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% Bernoulli sample of the corpus."""
    docs = load(spark, sf_dir, "documents")
    return P.hash_sample(docs, _SAMPLE_RATE, salt=_SAMPLE_SALT).select(
        "doc_id", "source"
    ).orderBy("doc_id")


ORACLE_corpus_sample = f"""
SELECT doc_id, source
FROM documents
WHERE {_sql_hash60(f"'{_SAMPLE_SALT}:' || CAST(doc_id AS VARCHAR)")} % 1000 < {_SAMPLE_RATE}
ORDER BY doc_id
"""


# ------------------------------------------------------ exact-k sample ----
_SAMPLE_K = 100


def corpus_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: deterministic EXACT-k sample — the k smallest md5-60 hash
    values (:func:`datapipe.pipeline.hash_sample_exact`).  Executes as
    TakeOrderedAndProject (per-partition top-k heaps + a P·k driver
    merge — no global sort, no data shuffle); nested: the k'-smallest
    set is a prefix of the k-smallest.  Oracle: the identical hash,
    ORDER BY ... LIMIT k."""
    docs = load(spark, sf_dir, "documents")
    return (
        P.hash_sample_exact(docs, _SAMPLE_K, salt=_SAMPLE_SALT)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


ORACLE_corpus_sample_topk = f"""
SELECT doc_id, source
FROM (
    SELECT doc_id, source
    FROM documents
    ORDER BY {_sql_hash60(f"'{_SAMPLE_SALT}:' || CAST(doc_id AS VARCHAR)")},
             doc_id
    LIMIT {_SAMPLE_K}
)
ORDER BY doc_id
"""


# ---------------------------------------------------------- sessionize ----
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions over events with per-session aggregates."""
    ev = load(spark, sf_dir, "events")
    sess = P.sessionize(ev, entity_col="user_id", ts_col="ts", gap=_SESSION_GAP)
    out = P.session_stats(
        sess, entity_col="user_id", ts_col="ts", value_col=cents("value")
    )
    return out.orderBy("user_id", "session_idx")


ORACLE_sessionize_events = f"""
WITH flagged AS (
    SELECT user_id, ts,
           CAST(round(value * 100, 0) AS BIGINT) AS cents,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS is_start
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    -- window SUM over ints is HUGEINT in DuckDB; session_idx is an OUTPUT
    -- column here, so cast back to BIGINT or the driver-side fetch encodes
    -- it differently from Spark's LongType (r03 hash mismatch)
    SELECT *,
           CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
    FROM flagged
)
SELECT user_id, session_idx,
       min(epoch_us(ts)) AS session_start_us,
       max(epoch_us(ts)) AS session_end_us,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_sum
FROM sess
GROUP BY 1, 2
ORDER BY user_id, session_idx
"""


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` sessions over events — the
    streaming-capable twin of :func:`sessionize_events`. Boundary semantics
    differ at exactly-gap spacing (see datapipe/pipeline.py docstring), so
    the oracle's new-session condition is ``>=`` where the lag form uses
    ``>``."""
    ev = load(spark, sf_dir, "events")
    out = P.sessionize_window(
        ev, entity_col="user_id", ts_col="ts", gap=_SESSION_GAP,
        value_col=cents("value"),
    )
    return out.select(
        "user_id", "session_start_us", "session_end_us", "n_events", "value_sum"
    ).orderBy("user_id", "session_start_us")


ORACLE_session_window_stats = f"""
WITH flagged AS (
    SELECT user_id, ts,
           CAST(round(value * 100, 0) AS BIGINT) AS cents,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS is_start
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT *,
           sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM flagged
)
SELECT user_id,
       min(epoch_us(ts)) AS session_start_us,
       max(epoch_us(ts)) AS session_end_us,
       count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS value_sum
FROM sess
GROUP BY user_id, session_idx
ORDER BY user_id, session_start_us
"""


# ------------------------------------------------------------- packing ----
def corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing of whitespace-token counts into
    _CTX_LEN-token contexts, sharded by source."""
    docs = load(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    out = P.pack_sequential(with_tokens, _CTX_LEN)
    return out.orderBy("source", "doc_id")


ORACLE_corpus_pack = f"""
WITH t AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
p AS (
    SELECT *,
           -- CAST: window SUM of BIGINT is HUGEINT in DuckDB; pack_id /
           -- pack_offset derive from it, so cast back to BIGINT or the
           -- driver-side fetch encodes them differently from Spark's
           -- LongType (r03 hash mismatch)
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS prefix
    FROM t
)
SELECT doc_id, source, n_tokens,
       prefix // {_CTX_LEN} AS pack_id,
       prefix % {_CTX_LEN} AS pack_offset
FROM p
ORDER BY source, doc_id
"""


# ----------------------------------------------- end-to-end composition ---
_QUALITY_THRESH = 0.5

#: the quality-score relation, reused verbatim from the text_quality oracle
#: (strip its driver-facing ORDER BY for CTE embedding)
_QUALITY_CTE = ORACLE_text_quality.rsplit("ORDER BY", 1)[0]


def prepare_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-prep pipeline as ONE logical plan: quality filter →
    exact-dedup keep-first → train split → sequence packing.

    Each stage is the already-gated operator (text.with_quality_score,
    md5 keep-first groups, pipeline.assign_splits, pipeline.pack_sequential)
    composed declaratively, so Catalyst plans the whole thing end-to-end:
    the quality score and split hash are per-row projections fused with the
    scan; the only shuffles are the dedup groupBy and the per-shard packing
    window — at 100 TB this is scan → 2 exchanges, no materialization
    between stages.
    """
    docs = load(spark, sf_dir, "documents")
    quality = with_quality_score(docs).select("doc_id", "quality_score")
    kept = docs.join(quality, "doc_id").filter(
        F.col("quality_score") >= _QUALITY_THRESH
    )
    first = kept.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = kept.join(first.select("doc_id"), "doc_id")
    train = P.assign_splits(deduped, splits=_SPLITS, salt=_SPLIT_SALT).filter(
        F.col("split") == "train"
    )
    with_tokens = train.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return P.pack_sequential(with_tokens, _CTX_LEN).orderBy("source", "doc_id")


ORACLE_prepare_training_set = f"""
WITH q AS ({_QUALITY_CTE}),
kept AS (
    SELECT d.doc_id, d.text, d.source
    FROM documents d JOIN q USING (doc_id)
    WHERE q.quality_score >= {_QUALITY_THRESH}
),
first AS (
    SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
dd AS (SELECT k.* FROM kept k JOIN first USING (doc_id)),
tr AS (
    SELECT * FROM dd
    WHERE {_split_case_sql(_sql_hash60(f"'{_SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)") + " % 1000")} = 'train'
),
t AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM tr
),
p AS (
    SELECT *,
           -- CAST: window SUM of BIGINT is HUGEINT in DuckDB; pack_id /
           -- pack_offset derive from it, so cast back to BIGINT or the
           -- driver-side fetch encodes them differently from Spark's
           -- LongType (r03 hash mismatch)
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS prefix
    FROM t
)
SELECT doc_id, source, n_tokens,
       prefix // {_CTX_LEN} AS pack_id,
       prefix % {_CTX_LEN} AS pack_offset
FROM p
ORDER BY source, doc_id
"""


def sessionize_presplit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-entity-safe presplit sessionization, checked against the
    IDENTICAL lag-window oracle as sessionize_events — boundary stitching
    must reproduce plain sessionize exactly."""
    ev = load(spark, sf_dir, "events")
    sess = P.sessionize_presplit(
        ev, entity_col="user_id", ts_col="ts", gap=_SESSION_GAP
    )
    out = P.session_stats(
        sess, entity_col="user_id", ts_col="ts", value_col=cents("value")
    )
    return out.orderBy("user_id", "session_idx")


# -------------------------------------------- first-fit greedy packing ----
def corpus_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit greedy packing (no document splitting) of whitespace-token
    counts, sharded by source — the applyInPandas recurrence checked
    against a DuckDB RECURSIVE CTE running the identical fold, upgrading
    the operator from golden-tested to oracle-gated."""
    docs = load(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    out = P.pack_greedy(with_tokens, _CTX_LEN)
    return out.orderBy("shard", "doc_key")


ORACLE_corpus_pack_greedy = f"""
WITH RECURSIVE t AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_key, source AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
), rec AS (
    -- state BEFORE row rn is (after_pack, after_fill) of rn-1; placement:
    -- overflow opens a new pack; landing exactly on ctx closes the pack
    SELECT shard, rn, doc_key, n_tokens,
           CAST(0 AS BIGINT) AS pack_id,
           CAST(0 AS BIGINT) AS pack_fill,
           CASE WHEN n_tokens >= {_CTX_LEN} THEN 1 ELSE 0 END AS after_pack,
           CASE WHEN n_tokens >= {_CTX_LEN} THEN 0 ELSE n_tokens END AS after_fill
    FROM t WHERE rn = 1
    UNION ALL
    SELECT o.shard, o.rn, o.doc_key, o.n_tokens,
           CASE WHEN r.after_fill > 0 AND r.after_fill + o.n_tokens > {_CTX_LEN}
                THEN r.after_pack + 1 ELSE r.after_pack END AS pack_id,
           CASE WHEN r.after_fill > 0 AND r.after_fill + o.n_tokens > {_CTX_LEN}
                THEN 0 ELSE r.after_fill END AS pack_fill,
           CASE WHEN (CASE WHEN r.after_fill > 0
                                AND r.after_fill + o.n_tokens > {_CTX_LEN}
                           THEN 0 ELSE r.after_fill END) + o.n_tokens >= {_CTX_LEN}
                THEN (CASE WHEN r.after_fill > 0
                                AND r.after_fill + o.n_tokens > {_CTX_LEN}
                           THEN r.after_pack + 1 ELSE r.after_pack END) + 1
                ELSE (CASE WHEN r.after_fill > 0
                                AND r.after_fill + o.n_tokens > {_CTX_LEN}
                           THEN r.after_pack + 1 ELSE r.after_pack END)
                END AS after_pack,
           CASE WHEN (CASE WHEN r.after_fill > 0
                                AND r.after_fill + o.n_tokens > {_CTX_LEN}
                           THEN 0 ELSE r.after_fill END) + o.n_tokens >= {_CTX_LEN}
                THEN 0
                ELSE (CASE WHEN r.after_fill > 0
                                AND r.after_fill + o.n_tokens > {_CTX_LEN}
                           THEN 0 ELSE r.after_fill END) + o.n_tokens
                END AS after_fill
    FROM rec r JOIN t o ON o.shard = r.shard AND o.rn = r.rn + 1
)
SELECT doc_key, shard, n_tokens, pack_id, pack_fill
FROM rec
ORDER BY shard, doc_key
"""


def corpus_pack_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing packing of whitespace-token counts, sharded by
    source — the packing policy next to first-fit `corpus_pack_greedy`
    and prefix-sum `corpus_pack`, with the classic 11/9·OPT+2/3 bin
    bound; the multi-bin fold is checked against a DuckDB RECURSIVE CTE
    carrying the open-bin fill LIST through the identical recurrence
    (best fit = fullest eligible bin, first-occurrence tie-break)."""
    docs = load(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    out = P.pack_best_fit(with_tokens, _CTX_LEN)
    return out.orderBy("shard", "doc_key")


ORACLE_corpus_pack_bfd = f"""
WITH RECURSIVE t AS (
    SELECT CAST(doc_id AS VARCHAR) AS doc_key, source AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           row_number() OVER (PARTITION BY source
                              ORDER BY len(string_split(text, ' ')) DESC,
                                       doc_id) AS rn
    FROM documents
), rec AS (
    SELECT shard, rn, doc_key, n_tokens,
           CAST(1 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_fill,
           [n_tokens] AS fills
    FROM t WHERE rn = 1
    UNION ALL
    SELECT o.shard, o.rn, o.doc_key, o.n_tokens,
           coalesce(CAST(list_position(r.fills,
               list_max(list_filter(r.fills, f -> f + o.n_tokens <= {_CTX_LEN}))) AS BIGINT), len(r.fills) + 1) AS pack_id,
           coalesce(list_max(list_filter(r.fills, f -> f + o.n_tokens <= {_CTX_LEN})), 0) AS pack_fill,
           CASE WHEN list_max(list_filter(r.fills, f -> f + o.n_tokens <= {_CTX_LEN})) IS NULL
                THEN list_append(r.fills, o.n_tokens)
                ELSE [CASE WHEN k = list_position(r.fills, list_max(list_filter(r.fills, f -> f + o.n_tokens <= {_CTX_LEN})))
                           THEN r.fills[k] + o.n_tokens
                           ELSE r.fills[k] END
                      for k in generate_series(1, len(r.fills))] END AS fills
    FROM rec r JOIN t o ON o.shard = r.shard AND o.rn = r.rn + 1
)
SELECT doc_key, shard, n_tokens, pack_id, pack_fill
FROM rec
ORDER BY shard, doc_key
"""


# -------------------------------------------------------------- shuffle ---
_SHUFFLE_SEED = 13
_SHUFFLE_SHARDS = 8
_SHUFFLE_WIDTH = ((1 << 60) + _SHUFFLE_SHARDS - 1) // _SHUFFLE_SHARDS


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: seeded deterministic global corpus shuffle
    (:func:`datapipe.pipeline.corpus_shuffle`) — the reproducible
    training-order permutation between packing and the sink.  Shards are
    hash-range buckets so shard ∘ within-shard order IS the global key
    order and the whole permutation costs one exchange; ``global_pos``
    composes per-shard ranks with broadcast shard offsets (never a
    one-task global sort).  Oracle: DuckDB over the identical
    engine-portable md5-60 key."""
    docs = load(spark, sf_dir, "documents")
    return (
        P.corpus_shuffle(
            docs, seed=_SHUFFLE_SEED, n_shards=_SHUFFLE_SHARDS
        )
        .select("doc_id", "source", "shard", "pos", "global_pos")
        .orderBy("doc_id")
    )


ORACLE_corpus_shuffle = f"""
WITH keyed AS (
    SELECT doc_id, source,
           {_sql_hash60(f"'shuffle:{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")} AS k
    FROM documents
)
SELECT doc_id, source,
       k // {_SHUFFLE_WIDTH} AS shard,
       CAST(row_number() OVER (PARTITION BY k // {_SHUFFLE_WIDTH}
                               ORDER BY k, doc_id) AS BIGINT) AS pos,
       CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS global_pos
FROM keyed
ORDER BY doc_id
"""


# ----------------------------------------------------------- interleave ---
_ILV_SCALE = P._INTERLEAVE_SCALE


def corpus_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: deterministic stride-scheduled mixture interleaving
    (:func:`datapipe.pipeline.interleave_order`) — the training order
    where every prefix carries each source at its mixture weight,
    in exact integer arithmetic.  Weights here derive formulaically
    from the source id (50k + 10k·(id mod 5) ppm — five weight tiers)
    so the plan is SF-independent; production callers attach whatever
    weight column the mixture plan produced.  Oracle: identical
    windows + integer stride in DuckDB."""
    docs = load(spark, sf_dir, "documents")
    weighted = docs.withColumn(
        "weight_ppm",
        (
            F.lit(50_000)
            + F.lit(10_000)
            * (F.regexp_extract("source", r"src(\d+)", 1).cast("long") % 5)
        ).cast("long"),
    )
    return (
        P.interleave_order(weighted)
        .select("doc_id", "source", "weight_ppm", "src_rank", "slot_key")
        .orderBy("doc_id")
    )


ORACLE_corpus_interleave = f"""
WITH k AS (
    SELECT doc_id, source,
           CAST(50000 + 10000 *
                (CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) % 5)
                AS BIGINT) AS weight_ppm,
           {_sql_hash60("'shuffle:' || CAST(doc_id AS VARCHAR)")} AS ik
    FROM documents
), r AS (
    SELECT doc_id, source, weight_ppm,
           CAST(row_number() OVER (PARTITION BY source ORDER BY ik, doc_id)
                AS BIGINT) AS src_rank
    FROM k
)
SELECT doc_id, source, weight_ppm, src_rank,
       (2 * src_rank - 1) * {_ILV_SCALE} // (2 * weight_ppm) AS slot_key
FROM r
ORDER BY doc_id
"""


def corpus_interleave_presplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14b: the hot-source-safe presplit interleave, checked against
    the IDENTICAL DuckDB oracle as `corpus_interleave` — the mitigation
    cannot drift from the plain operator's semantics (the
    events_asof_join_presplit pattern)."""
    docs = load(spark, sf_dir, "documents")
    weighted = docs.withColumn(
        "weight_ppm",
        (
            F.lit(50_000)
            + F.lit(10_000)
            * (F.regexp_extract("source", r"src(\d+)", 1).cast("long") % 5)
        ).cast("long"),
    )
    return (
        P.interleave_order_presplit(weighted, n_subs=16)
        .select("doc_id", "source", "weight_ppm", "src_rank", "slot_key")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- chunk ---
_CHUNK_SIZE = 480
_CHUNK_OVERLAP = 120
_CHUNK_STRIDE = _CHUNK_SIZE - _CHUNK_OVERLAP


def corpus_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size character chunking of every document
    (:func:`datapipe.pipeline.chunk_documents`): the RAG/embedding-index
    prep step. Narrow map-only plan — per-row sequence+explode with
    JVM-side substring, zero shuffles."""
    docs = load(spark, sf_dir, "documents")
    return P.chunk_documents(
        docs, size=_CHUNK_SIZE, overlap=_CHUNK_OVERLAP
    ).orderBy("doc_id", "chunk_idx")


ORACLE_corpus_chunk = f"""
WITH d AS (
    SELECT doc_id, text,
           greatest(1, (length(text) - {_CHUNK_OVERLAP} + {_CHUNK_STRIDE} - 1)
                       // {_CHUNK_STRIDE}) AS n_chunks
    FROM documents
), c AS (
    SELECT doc_id, text,
           unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
    FROM d
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       substr(text, chunk_idx * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE}) AS chunk_text,
       CAST(length(substr(text, chunk_idx * {_CHUNK_STRIDE} + 1, {_CHUNK_SIZE}))
            AS BIGINT) AS n_chars
FROM c
ORDER BY doc_id, chunk_idx
"""


# --------------------------------------- C25: packing efficiency report --
def corpus_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25: the packing-quality dashboard over the C4 sequential packer —
    per source: contexts produced, exact token utilization in ppm
    (tokens ÷ (contexts·CTX)), tail waste, and how many documents
    STRADDLE a context boundary (the cross-document-attention
    contamination count the packing strategy trades against padding).
    The report a 100 TB pretraining run reads before committing a
    packing config — padding waste is compute waste at cluster scale.

    Composability gate: the packed relation is the already-gated C4
    operator reused verbatim; the report is one aggregate over it, so
    drift in EITHER the packer or the report fails this row.  Straddle
    test is pure integer arithmetic: a doc straddles iff its tokens
    cross a context boundary (pack_offset + n_tokens > CTX), counting
    multi-boundary docs once (they still break exactly one attention
    contract per crossing; the COUNT here is "docs needing masking").
    """
    docs = load(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = P.pack_sequential(with_tokens, _CTX_LEN)
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.max(
                F.col("pack_id") * F.lit(_CTX_LEN) + F.col("pack_offset")
                + F.col("n_tokens")
            ) + F.lit(_CTX_LEN) - 1).alias("_end"),
            F.sum(
                F.when(
                    F.col("pack_offset") + F.col("n_tokens") > _CTX_LEN, 1
                ).otherwise(0)
            ).alias("n_straddlers"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr(f"_end div {_CTX_LEN}").alias("n_contexts"),
            F.expr(
                f"total_tokens * 1000000 div ((_end div {_CTX_LEN}) * {_CTX_LEN})"
            ).alias("utilization_ppm"),
            F.expr(
                f"(_end div {_CTX_LEN}) * {_CTX_LEN} - total_tokens"
            ).alias("waste_tokens"),
            "n_straddlers",
        )
        .orderBy("source")
    )


ORACLE_corpus_pack_efficiency = f"""
WITH t AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), p AS (
    SELECT *,
           CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS prefix
    FROM t
), packed AS (
    SELECT doc_id, source, n_tokens,
           prefix // {_CTX_LEN} AS pack_id,
           prefix % {_CTX_LEN} AS pack_offset
    FROM p
), agg AS (
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(max(pack_id * {_CTX_LEN} + pack_offset + n_tokens)
                + {_CTX_LEN} - 1 AS BIGINT) AS _end,
           CAST(sum(CASE WHEN pack_offset + n_tokens > {_CTX_LEN}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
    FROM packed GROUP BY source
)
SELECT source, n_docs, total_tokens,
       _end // {_CTX_LEN} AS n_contexts,
       total_tokens * 1000000 // ((_end // {_CTX_LEN}) * {_CTX_LEN})
           AS utilization_ppm,
       (_end // {_CTX_LEN}) * {_CTX_LEN} - total_tokens AS waste_tokens,
       n_straddlers
FROM agg
ORDER BY source
"""


# -------- A71: session entry/exit profile (queued for r11) ----------------
# Registration note: queued for round 11 (r10 gate window full); the r11
# registry block should add:
#   ("events_session_entry_exit", pl.events_session_entry_exit,
#    pl.ORACLE_events_session_entry_exit)
def events_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A71: entry/exit-page analysis over the gap sessions — which event
    type OPENS sessions, which CLOSES them, and the bounce count
    (single-event sessions) per (entry, exit) cell: the landing/exit
    product report every funnel review starts from, here over the same
    session definition the rest of the repo gates (lag-gap > 30 min,
    the `sessionize_events` rule).

    Exactness: entry/exit are the rn=1 rows of the (ts, event_id)
    total order inside each session (the A38 tie rule — never a bare
    min(ts) that goes nondeterministic on equal timestamps); counts are
    plain int64.  Scale: sessionization + the two row_numbers ride ONE
    per-user exchange; the profile re-aggregates ≤|sessions| rows to
    ≤|types|² cells.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    sess = P.sessionize(ev, entity_col="user_id", ts_col="ts", gap=_SESSION_GAP)
    wkey = Window.partitionBy("user_id", "session_idx")
    rn_a = F.row_number().over(wkey.orderBy("ts", "event_id"))
    rn_d = F.row_number().over(
        wkey.orderBy(F.desc("ts"), F.desc("event_id"))
    )
    marked = sess.select(
        "user_id",
        "session_idx",
        "event_type",
        rn_a.alias("rn_a"),
        rn_d.alias("rn_d"),
    )
    per_sess = marked.groupBy("user_id", "session_idx").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
        F.max(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias(
            "exit_type"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_sess.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                F.when(F.col("n_events") == 1, 1).otherwise(0)
            ).cast("long").alias("n_bounces"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
        .orderBy("entry_type", "exit_type")
    )


ORACLE_events_session_entry_exit = f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_US}
                THEN 1 ELSE 0 END AS is_start
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
    SELECT *,
           CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
    FROM flagged
), marked AS (
    SELECT user_id, session_idx, event_type,
           row_number() OVER (PARTITION BY user_id, session_idx
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY user_id, session_idx
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM sess
), per_sess AS (
    SELECT user_id, session_idx,
           max(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
           max(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
           count(*) AS n_events
    FROM marked GROUP BY 1, 2
)
SELECT entry_type, exit_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       CAST(sum(n_events) AS BIGINT) AS total_events
FROM per_sess
GROUP BY 1, 2
ORDER BY entry_type, exit_type
"""


# ------------------------------------ P10: mixture-balancing sampler ------
# Registration note: REGISTERED r12 (Block R12 queue drain; was queued via
# scripts/check_queued.py). Registry row:
#   ("corpus_mixture_sample", pl.corpus_mixture_sample,
#    pl.ORACLE_corpus_mixture_sample)
_MIX_SALT = "mixsample"


def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: the EXECUTOR between `corpus_mixture_plan` (which computes
    target proportions) and `corpus_sample` (uniform rate): balance the
    corpus across sources by deterministic per-SOURCE-rate Bernoulli —
    every source downsampled to the smallest source's mass
    (rate_ppm(s) = min_count·10⁶ div count_s), keep iff
    hash60(salt:doc_id) mod 10⁶ < rate_ppm(source).  The per-doc hash
    makes the sample REPRODUCIBLE and INCREMENTAL (a re-run over a
    grown corpus keeps exactly the previously-kept docs whose source
    rate did not change) — the property random() sampling loses and
    training-data pipelines need for cache reuse.

    All integer: counts, rates in exact ppm, the keep predicate a
    modular compare.  Output = per-source audit (n_total, rate_ppm,
    n_kept, plus the realized kept-fraction in ppm) — |sources| rows.

    Scale: one per-source count aggregate (broadcast back, |sources|
    rows), one stateless filter projection over the corpus, one final
    |sources| aggregate.  No windows, no joins beyond the broadcast.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    min_cnt = per_src.agg(F.min("n_total").alias("min_cnt"))
    rates = per_src.crossJoin(F.broadcast(min_cnt)).select(
        "source",
        "n_total",
        F.expr("min_cnt * 1000000 div n_total").alias("rate_ppm"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{_MIX_SALT}:"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    kept = (
        docs.join(F.broadcast(rates), "source")
        .withColumn("_keep", (h % 1000000) < F.col("rate_ppm"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("_keep"), 1).otherwise(0)).alias("n_kept"),
        )
    )
    return (
        rates.join(kept, "source")
        .select(
            "source",
            "n_total",
            "rate_ppm",
            "n_kept",
            F.expr("n_kept * 1000000 div n_total").alias("realized_ppm"),
        )
        .orderBy("source")
    )


ORACLE_corpus_mixture_sample = f"""
WITH per_src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_total
    FROM documents GROUP BY source
), rates AS (
    SELECT source, n_total,
           CAST((SELECT min(n_total) FROM per_src) * 1000000 // n_total
                AS BIGINT) AS rate_ppm
    FROM per_src
), kept AS (
    SELECT d.source,
           CAST(sum(CASE WHEN
               {_sql_hash60(f"'{_MIX_SALT}:' || CAST(doc_id AS VARCHAR)")}
               % 1000000 < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r ON d.source = r.source
    GROUP BY d.source
)
SELECT rates.source, n_total, rate_ppm, n_kept,
       CAST(n_kept * 1000000 // n_total AS BIGINT) AS realized_ppm
FROM rates JOIN kept ON rates.source = kept.source
ORDER BY rates.source
"""


# ---------------- P15: largest-remainder quota apportionment (staged r13) --
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("corpus_quota_apportion", pl.corpus_quota_apportion,
#    pl.ORACLE_corpus_quota_apportion)
_QUOTA_TOTAL = 10_000


def corpus_quota_apportion(
    spark: SparkSession, sf_dir: str, budget: int = _QUOTA_TOTAL
) -> DataFrame:
    """P15: Hamilton largest-remainder apportionment of a fixed sample
    budget across (source, lang) strata — the missing step between the
    mixture plan (rates in ppm, realized counts only in expectation) and
    P13's exact-k selector: a proportional INTEGER quota per stratum
    that sums to the budget EXACTLY (floor share + one extra to the
    largest remainders), so `hash_sample_exact(k=quota_i)` per stratum
    yields a reproducible stratified sample of exactly the budgeted
    size.  Hamilton is the unique remainder method that never violates
    quota; ties break by stratum key so the apportionment is total.

    All integer arithmetic (`K·nᵢ div N`, remainders ranked by window)
    over the strata relation — a REDUCED table (|sources|·|langs| rows,
    here ≤100) that one count-aggregate exchange produces; the global
    remainder-rank window rides that reduced relation, the A73-style
    positional-semantics call every apportionment method requires
    (ranking remainders IS a global order statement)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    strata = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = strata.agg(F.sum("n_docs").alias("n_total"))
    based = strata.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "n_total",
        F.expr(f"{budget} * n_docs div n_total").alias("base_quota"),
        F.expr(f"({budget} * n_docs) % n_total").alias("remainder"),
    )
    w_rem = Window.orderBy(F.col("remainder").desc(), "source", "lang")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        based.withColumn("rem_rank", F.row_number().over(w_rem))
        .withColumn("n_extras", F.lit(budget) - F.sum("base_quota").over(w_all))
        .select(
            "source",
            "lang",
            "n_docs",
            "base_quota",
            "remainder",
            F.col("rem_rank").cast("long").alias("rem_rank"),
            F.when(F.col("rem_rank") <= F.col("n_extras"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("extra"),
            (
                F.col("base_quota")
                + F.when(F.col("rem_rank") <= F.col("n_extras"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("quota"),
        )
        .orderBy("source", "lang")
    )


ORACLE_corpus_quota_apportion = f"""
WITH strata AS (
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source, lang
), based AS (
    SELECT source, lang, n_docs,
           {_QUOTA_TOTAL} * n_docs // (SELECT sum(n_docs) FROM strata)
               AS base_quota,
           ({_QUOTA_TOTAL} * n_docs) % (SELECT sum(n_docs) FROM strata)
               AS remainder
    FROM strata
), ranked AS (
    SELECT *,
           CAST(row_number() OVER (ORDER BY remainder DESC, source, lang)
                AS BIGINT) AS rem_rank,
           {_QUOTA_TOTAL} - sum(base_quota) OVER () AS n_extras
    FROM based
)
SELECT source, lang, n_docs,
       CAST(base_quota AS BIGINT) AS base_quota,
       CAST(remainder AS BIGINT) AS remainder,
       rem_rank,
       CAST(CASE WHEN rem_rank <= n_extras THEN 1 ELSE 0 END AS BIGINT)
           AS extra,
       CAST(base_quota + CASE WHEN rem_rank <= n_extras THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM ranked
ORDER BY source, lang
"""


# -------------------- P16: token-budget epoch plan (staged r13) -----------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("corpus_epoch_plan", pl.corpus_epoch_plan,
#    pl.ORACLE_corpus_epoch_plan)
_EPOCH_BUDGET_TOKENS = 2_000_000
_EPOCH_CAP_PPM = 4_000_000  # repeat cap: at most 4 epochs of any source


def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16: the token-budget epoch plan — the planning table between the
    mixture weights and the actual sampler (the LLaMA/DoReMi data-recipe
    step): given a total training-token budget and per-source mixture
    weights, how many tokens does each source owe (`target_tokens`),
    how many PASSES over the source is that (`epochs_ppm` — above 10⁶
    means repeating data), and what does the standard repeat cap (≤4
    epochs) actually deliver (`granted_tokens`, `deficit_tokens` — the
    shortfall the recipe must re-allocate or eat)?  Weights derive
    formulaically from the source id exactly as `corpus_interleave`
    (50k + 10k·(id mod 5) ppm) so the two plans compose.

    All integer arithmetic: token counts are exact whitespace-token
    sums, targets are `budget·wᵢ div Σw`, epochs and grants integer
    ppm/min — no float anywhere.  Scale: one count-aggregate exchange
    to the |sources|-row relation; everything after is arithmetic on
    that reduced table."""
    docs = load(spark, sf_dir, "documents")
    src = (
        docs.select(
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens_total"),
        )
        .withColumn(
            "weight_ppm",
            (
                F.lit(50_000)
                + F.lit(10_000)
                * (F.regexp_extract("source", r"src(\d+)", 1).cast("long") % 5)
            ).cast("long"),
        )
    )
    tot = src.agg(F.sum("weight_ppm").alias("w_sum"))
    return (
        src.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_tokens",
            F.expr(f"{_EPOCH_BUDGET_TOKENS} * weight_ppm div w_sum"),
        )
        .withColumn(
            "epochs_ppm",
            F.expr("target_tokens * 1000000 div tokens_total"),
        )
        .withColumn(
            "granted_tokens",
            F.least(
                F.col("target_tokens"),
                F.expr(f"tokens_total * {_EPOCH_CAP_PPM} div 1000000"),
            ),
        )
        .select(
            "source",
            "n_docs",
            "tokens_total",
            "weight_ppm",
            "target_tokens",
            "epochs_ppm",
            (F.col("epochs_ppm") > 1_000_000).alias("needs_repeat"),
            "granted_tokens",
            (F.col("target_tokens") - F.col("granted_tokens")).alias(
                "deficit_tokens"
            ),
        )
        .orderBy("source")
    )


ORACLE_corpus_epoch_plan = f"""
WITH src AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_total,
           CAST(50000 + 10000 *
                (CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) % 5)
                AS BIGINT) AS weight_ppm
    FROM documents GROUP BY source
), t AS (
    SELECT *,
           {_EPOCH_BUDGET_TOKENS} * weight_ppm
               // (SELECT sum(weight_ppm) FROM src) AS target_tokens
    FROM src
)
SELECT source, n_docs, tokens_total, weight_ppm,
       CAST(target_tokens AS BIGINT) AS target_tokens,
       CAST(target_tokens * 1000000 // tokens_total AS BIGINT) AS epochs_ppm,
       target_tokens * 1000000 // tokens_total > 1000000 AS needs_repeat,
       CAST(least(target_tokens,
                  tokens_total * {_EPOCH_CAP_PPM} // 1000000) AS BIGINT)
           AS granted_tokens,
       CAST(target_tokens
            - least(target_tokens,
                    tokens_total * {_EPOCH_CAP_PPM} // 1000000) AS BIGINT)
           AS deficit_tokens
FROM t
ORDER BY source
"""


# ------------- P17: exact-count stratified sample (staged r13) ------------
# Registration note: REGISTERED r14 (Block R14 queue drain; was staged
# round 13 when that gate window closed full).  Registry row:
#   ("corpus_stratified_exact", pl.corpus_stratified_exact,
#    pl.ORACLE_corpus_stratified_exact)
_STRAT_SALT = "stratx"
#: must stay <= the smallest gate corpus (sf0.01: 500 docs) so Hamilton
#: quotas are fillable (budget <= N implies quota_i <= n_i) and the
#: selection is a real subset, not the identity
_STRAT_BUDGET = 300


def corpus_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17: the exact-count stratified sample P15's quotas exist FOR —
    Hamilton apportionment fixes how many documents each (source, lang)
    stratum owes (summing EXACTLY to the budget), then each stratum
    takes its quota as the hash-order smallest (the P13 exact-k
    primitive applied per stratum): the output is a reproducible sample
    of exactly the budgeted size with exact proportional allocation —
    what the rate-based `corpus_stratified_sample` (size only in
    expectation) and the min-count-balanced mixture sampler cannot
    promise.  Composition is the point: three gated operators (P15
    quota, P13 selector, this join) sharing one arithmetic.

    Exactness: quota table is P15's (same constants), selection ranks
    the portable md5-60 hash with doc_id tie-break — a total order.
    Scale: the quota table is a ≤|strata|-row broadcast; selection is
    one rank window per stratum (the P13 per-partition top-k shape,
    parallel across strata); output exactly `budget` rows whenever budget <= corpus size
    (budget <= N guarantees every Hamilton quota is fillable)."""
    from project_obsidian_core_spark.datapipe.text import shared_hash60
    from pyspark.sql import Window

    quotas = corpus_quota_apportion(
        spark, sf_dir, budget=_STRAT_BUDGET
    ).select("source", "lang", "quota")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        shared_hash60(
            F.concat(F.lit(f"{_STRAT_SALT}:"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    w = Window.partitionBy("source", "lang").orderBy("h", "doc_id")
    return (
        docs.join(F.broadcast(quotas), ["source", "lang"])
        .withColumn("strat_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("strat_rank") <= F.col("quota"))
        .select("doc_id", "source", "lang", "strat_rank", "quota")
        .orderBy("doc_id")
    )


ORACLE_corpus_stratified_exact = f"""
WITH strata AS (
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source, lang
), based AS (
    SELECT source, lang, n_docs,
           {_STRAT_BUDGET} * n_docs // (SELECT sum(n_docs) FROM strata)
               AS base_quota,
           ({_STRAT_BUDGET} * n_docs) % (SELECT sum(n_docs) FROM strata)
               AS remainder
    FROM strata
), ranked_q AS (
    SELECT *,
           CAST(row_number() OVER (ORDER BY remainder DESC, source, lang)
                AS BIGINT) AS rem_rank,
           {_STRAT_BUDGET} - sum(base_quota) OVER () AS n_extras
    FROM based
), quotas AS (
    SELECT source, lang,
           CAST(base_quota + CASE WHEN rem_rank <= n_extras THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM ranked_q
), hashed AS (
    SELECT d.doc_id, d.source, d.lang, q.quota,
           {_sql_hash60(f"'{_STRAT_SALT}:' || CAST(doc_id AS VARCHAR)")} AS h
    FROM documents d JOIN quotas q USING (source, lang)
), sel AS (
    SELECT doc_id, source, lang, quota,
           CAST(row_number() OVER (PARTITION BY source, lang
                                   ORDER BY h, doc_id) AS BIGINT)
               AS strat_rank
    FROM hashed
)
SELECT doc_id, source, lang, strat_rank, quota
FROM sel
WHERE strat_rank <= quota
ORDER BY doc_id
"""


# ---------------- P18: curriculum schedule (round 14) ---------------------
# Registration note: REGISTERED r14 (Block R14b).  Registry row:
#   ("corpus_curriculum", pl.corpus_curriculum,
#    pl.ORACLE_corpus_curriculum)
_CURR_SEED = 7
_CURR_STAGES = 4
_CURR_SHARDS = 64


def corpus_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18: curriculum-learning training order — easiest→hardest stages
    (count-quantiles of the exact milli-average token length, ties
    sharing a stage) with a seeded deterministic shuffle inside each
    stage; see :func:`datapipe.pipeline.corpus_curriculum`.  The whole
    schedule is one exchange: stage + shard offsets compose broadcast
    reduced relations exactly like P12's shuffle, and
    ``curriculum_pos`` equals the (stage, hash, key) global row number
    without a global sort."""
    return (
        P.corpus_curriculum(
            load(spark, sf_dir, "documents"),
            n_stages=_CURR_STAGES,
            seed=_CURR_SEED,
            n_shards=_CURR_SHARDS,
        )
        .orderBy("curriculum_pos")
    )


ORACLE_corpus_curriculum = f"""
WITH k AS (
    SELECT doc_id,
           1000 * (length(text) - len(string_split(text, ' ')) + 1)
               // len(string_split(text, ' ')) AS difficulty_milli,
           {_sql_hash60(f"'curriculum:{_CURR_SEED}:' || CAST(doc_id AS VARCHAR)")} AS k
    FROM documents
), st AS (
    SELECT *,
           1 + ({_CURR_STAGES} * count(*) OVER (
                   ORDER BY difficulty_milli
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
               // count(*) OVER () AS stage
    FROM k
)
SELECT doc_id, difficulty_milli, CAST(stage AS INT) AS stage,
       CAST(row_number() OVER (ORDER BY stage, k, doc_id) AS BIGINT)
           AS curriculum_pos
FROM st
ORDER BY curriculum_pos
"""


# ---------------- P19: temperature-scaled mixture (staged r15) ------------
# Registration note: REGISTERED r15 (Block R15 queue drain; was staged
# via scripts/check_queued.py).  Registry row:
#   ("corpus_mixture_temperature", pl.corpus_mixture_temperature,
#    pl.ORACLE_corpus_mixture_temperature)
_TEMP_TARGET = 1_000_000


def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19: temperature-scaled sampling mixture at τ = 1/2 — the
    multilingual-pretraining classic (raw proportional sampling starves
    low-resource sources; sampling ∝ n^τ with τ<1 flattens the mixture;
    τ=1/2 is the square-root scaling mBERT/XLM popularized).  τ=1/2 is
    the one temperature with an EXACT integer formulation: the weight
    is the INTEGER SQRT of micro-scaled token counts — computed as
    floor(sqrt(x)) with a ±1 integer-comparison adjustment, so the
    correctly-rounded float sqrt can never leak an off-by-one across
    engines (the A95 Fisher rule, hardened) — and the ppm shares are
    the P15 Hamilton largest-remainder apportionment over those exact
    weights (sums to 10⁶ exactly, ties by source).

    Scale: one scan → ≤|sources| token-count aggregate; everything
    after rides that reduced relation (the P15 boundedness argument).
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    src_n = docs.groupBy("source").agg(
        F.sum(F.expr("size(split(text, ' '))")).alias("n_tokens")
    )

    def isqrt(x: str) -> str:
        w1 = f"CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
        return (
            f"CASE WHEN ({w1} + 1) * ({w1} + 1) <= {x} THEN {w1} + 1 "
            f"WHEN {w1} * {w1} <= {x} THEN {w1} ELSE {w1} - 1 END"
        )

    weighted = src_n.select(
        "source",
        "n_tokens",
        F.expr(isqrt("n_tokens * 1000000")).alias("w"),
    )
    tot = weighted.agg(
        F.sum("n_tokens").alias("n_total"), F.sum("w").alias("w_total")
    )
    based = weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "w",
        F.expr(f"1000000 * n_tokens div n_total").alias("raw_share_ppm"),
        F.expr(f"{_TEMP_TARGET} * w div w_total").alias("base_share"),
        F.expr(f"({_TEMP_TARGET} * w) % w_total").alias("remainder"),
    )
    w_rem = Window.orderBy(F.col("remainder").desc(), "source")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        based.withColumn("rem_rank", F.row_number().over(w_rem))
        .withColumn(
            "n_extras", F.lit(_TEMP_TARGET) - F.sum("base_share").over(w_all)
        )
        .select(
            "source",
            "n_tokens",
            "w",
            "raw_share_ppm",
            (
                F.col("base_share")
                + F.when(
                    F.col("rem_rank") <= F.col("n_extras"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("temp_share_ppm"),
        )
        .withColumn(
            "flatten_ppm", F.col("temp_share_ppm") - F.col("raw_share_ppm")
        )
        .orderBy("source")
    )


def _isqrt_sql(x: str) -> str:
    w1 = f"CAST(floor(sqrt(CAST({x} AS DOUBLE))) AS BIGINT)"
    return (
        f"CASE WHEN ({w1} + 1) * ({w1} + 1) <= {x} THEN {w1} + 1 "
        f"WHEN {w1} * {w1} <= {x} THEN {w1} ELSE {w1} - 1 END"
    )


ORACLE_corpus_mixture_temperature = f"""
WITH src AS (
    SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens
    FROM documents GROUP BY source
), wtd AS (
    SELECT source, n_tokens,
           {_isqrt_sql("n_tokens * 1000000")} AS w
    FROM src
), tot AS (
    SELECT sum(n_tokens) AS n_total, sum(w) AS w_total FROM wtd
), based AS (
    SELECT source, n_tokens, w,
           1000000 * n_tokens // tot.n_total AS raw_share_ppm,
           {_TEMP_TARGET} * w // tot.w_total AS base_share,
           ({_TEMP_TARGET} * w) % tot.w_total AS remainder
    FROM wtd CROSS JOIN tot
), ranked AS (
    SELECT *,
           row_number() OVER (ORDER BY remainder DESC, source) AS rem_rank,
           {_TEMP_TARGET} - sum(base_share) OVER () AS n_extras
    FROM based
)
SELECT source, n_tokens, CAST(w AS BIGINT) AS w,
       CAST(raw_share_ppm AS BIGINT) AS raw_share_ppm,
       CAST(base_share + CASE WHEN rem_rank <= n_extras THEN 1 ELSE 0 END
            AS BIGINT) AS temp_share_ppm,
       CAST(base_share + CASE WHEN rem_rank <= n_extras THEN 1 ELSE 0 END
            - raw_share_ppm AS BIGINT) AS flatten_ppm
FROM ranked
ORDER BY source
"""


# ------------- P20: shard-balance audit of the P12 sharding (round 15) ----
def corpus_shard_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P20: balance audit of the P12 hash-range sharding — the
    pre-flight a 1000-writer job runs BEFORE committing to a shard
    layout (one hot shard = one straggler task and one oversized
    output file): per shard, the doc count, whitespace-token sum, and
    exact-ppm shares of each, plus ``is_hot`` at 2× the fair share
    (10⁶ div n_shards).

    Exactness: shard = the P12 60-bit md5 hash-range bucket verbatim
    (same seed, same width); counts/token sums int64; shares truncating
    integer ppm.  Scale: one narrow projection (in-row token count, no
    explode) + ONE map-side-combined ≤n_shards-group aggregate; the
    share join is a broadcast of a 1-row total.  Since r16 the shard
    key is the stateless hash-range expression directly (identical to
    corpus_shuffle's, no rank windows to prune) and the three stages
    are shared fns so the T50 streaming twin cannot drift."""
    docs = load(spark, sf_dir, "documents")
    return shard_report(shard_sums(shard_stats(docs)))


def shard_stats(docs: DataFrame) -> DataFrame:
    """Per-row (shard, n_tok) — the P12 hash-range bucket as a pure
    stateless expression (same seed/width as corpus_shuffle), shared
    verbatim by the batch plan and the T50 streaming monitor."""
    from project_obsidian_core_spark.datapipe.text import shared_hash60

    key = shared_hash60(
        F.concat(
            F.lit(f"shuffle:{_SHUFFLE_SEED}:"),
            F.col("doc_id").cast("string"),
        )
    )
    return docs.select(
        key.alias("_k"),
        F.expr("size(split(text, ' '))").alias("n_tok"),
    ).select(
        F.expr(f"_k div {_SHUFFLE_WIDTH}").alias("shard"), "n_tok"
    )


def shard_sums(per: DataFrame) -> DataFrame:
    """≤n_shards-group commutative integer sums — a complete-mode
    streaming aggregation merges to the identical relation."""
    return per.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("token_sum"),
    )


def shard_report(per: DataFrame) -> DataFrame:
    """The P20 share/is_hot derivation over the reduced relation."""
    tot = per.agg(
        F.sum("n_docs").alias("td"), F.sum("token_sum").alias("tt")
    )
    fair = 1_000_000 // _SHUFFLE_SHARDS
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "token_sum",
            F.expr("n_docs * 1000000 div td").alias("doc_share_ppm"),
            F.expr("token_sum * 1000000 div tt").alias("token_share_ppm"),
            (
                F.expr("token_sum * 1000000 div tt") > F.lit(2 * fair)
            ).alias("is_hot"),
        )
        .orderBy("shard")
    )


ORACLE_corpus_shard_skew = f"""
WITH keyed AS (
    SELECT {_sql_hash60(f"'shuffle:{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")}
               // {_SHUFFLE_WIDTH} AS shard,
           len(string_split(text, ' ')) AS n_tok
    FROM documents
), per AS (
    SELECT shard, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS token_sum
    FROM keyed GROUP BY shard
), tot AS (
    SELECT CAST(sum(n_docs) AS BIGINT) AS td,
           CAST(sum(token_sum) AS BIGINT) AS tt
    FROM per
)
SELECT shard,
       CAST(n_docs AS BIGINT) AS n_docs,
       token_sum,
       n_docs * 1000000 // td AS doc_share_ppm,
       token_sum * 1000000 // tt AS token_share_ppm,
       token_sum * 1000000 // tt > {2 * (1_000_000 // _SHUFFLE_SHARDS)}
           AS is_hot
FROM per, tot
ORDER BY shard
"""


# ---------- P21: dedup yield curve over the scan order (round 15) ---------
def corpus_dedup_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P21: how fast dedup SATURATES — the planning curve for a
    crawl-ingest budget ("the second half of this source is 80%
    duplicates — stop paying for it"): scanning the corpus in the P12
    deterministic hash order, the cumulative unique-content count and
    duplicate rate at each scan decile.

    Exactness: scan position is the P12 `global_pos` (shard-composed,
    one exchange, never a global sort); content identity is the D1 md5
    hash; a position is "new" iff it is its hash group's MINIMUM
    global_pos; a first occurrence belongs to the SMALLEST decile d
    with fp <= scan_pos(d) = ((d+1)·n) div 10, i.e. decile =
    (fp·10 − 1) div n — membership and the reported scan_pos use the
    SAME edge rounding, so n_unique_cum ≤ scan_pos holds for every n
    (r15 ADVICE: the old ((fp−1)·10) div n edge could count a first
    occurrence at scan_pos+1 into decile d when 10 ∤ n, pushing
    dup_rate_ppm slightly negative on a near-unique corpus).

    Scale: corpus_shuffle's one exchange + one (hash → min pos)
    map-side-combined aggregate; everything after rides ≤10 rows."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    ordered = P.corpus_shuffle(
        docs, seed=_SHUFFLE_SEED, n_shards=_SHUFFLE_SHARDS
    ).select("global_pos", F.md5("text").alias("h"))
    firsts = ordered.groupBy("h").agg(F.min("global_pos").alias("fp"))
    tot = ordered.agg(F.count(F.lit(1)).alias("n"))
    per_decile = (
        firsts.crossJoin(F.broadcast(tot))
        .select(F.expr("(fp * 10 - 1) div n").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("uniq_in"))
    )
    # full 10-row spine: on a dup-heavy corpus the late deciles contain
    # ZERO first occurrences and a bare groupBy would drop their
    # checkpoint rows (found in the r15 soak at 10x replication)
    spine = (
        spark.range(10)
        .select(F.col("id").alias("decile"))
        .crossJoin(F.broadcast(tot))
    )
    per_decile = spine.join(per_decile, "decile", "left").select(
        "decile", "n", F.coalesce("uniq_in", F.lit(0)).alias("uniq_in")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_decile.withColumn("n_unique_cum", F.sum("uniq_in").over(wc))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.expr("((decile + 1) * n) div 10").alias("scan_pos"),
            "n_unique_cum",
            F.expr(
                "(((decile + 1) * n) div 10 - n_unique_cum) * 1000000"
                " div (((decile + 1) * n) div 10)"
            ).alias("dup_rate_ppm"),
        )
        .orderBy("decile")
    )


ORACLE_corpus_dedup_yield = f"""
WITH keyed AS (
    SELECT doc_id, md5(text) AS h,
           {_sql_hash60(f"'shuffle:{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")} AS k
    FROM documents
), ordered AS (
    SELECT h, CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT)
                  AS global_pos
    FROM keyed
), firsts AS (
    SELECT h, min(global_pos) AS fp FROM ordered GROUP BY h
), tot AS (
    SELECT count(*) AS n FROM ordered
), per_decile0 AS (
    SELECT (fp * 10 - 1) // n AS decile, count(*) AS uniq_in
    FROM firsts, tot GROUP BY (fp * 10 - 1) // n
), per_decile AS (
    SELECT g.d AS decile, tot.n, coalesce(p.uniq_in, 0) AS uniq_in
    FROM (SELECT unnest(generate_series(0, 9)) AS d) g
    CROSS JOIN tot
    LEFT JOIN per_decile0 p ON p.decile = g.d
)
SELECT CAST(decile AS INT) AS decile,
       CAST(((decile + 1) * n) // 10 AS BIGINT) AS scan_pos,
       CAST(sum(uniq_in) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS n_unique_cum,
       CAST(
           (((decile + 1) * n) // 10
            - sum(uniq_in) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING))
           * 1000000 // (((decile + 1) * n) // 10) AS BIGINT)
           AS dup_rate_ppm
FROM per_decile
ORDER BY decile
"""


# -------- P22: dedup-aware mixture weights (round 16) ---------------------
def corpus_mixture_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P22: the mixture plan computed on UNIQUE content — raw
    proportional weights over-pay duplicate-heavy sources twice (once
    in storage, once in the mixture: a source that is 80% duplicates
    contributes 80% fewer novel tokens than its raw share claims, and
    P21's yield curve shows exactly this saturation).  Per source:
    raw and unique token counts, the Hamilton ppm share under each,
    and the shift — the number a data-recipe review reads to decide
    whether a source's weight survives dedup.

    Semantics: content identity is the D1 md5; the KEEPER of a dup
    group is its min-doc_id member (min_by/arg_min — deterministic,
    ids unique), and the keeper's SOURCE gets the group's tokens, so
    cross-source duplication shifts weight toward whichever source
    crawled the content first — the same rule the D-family excision
    operators apply.  Both apportionments are the P15 largest-remainder
    rule (sums to 10⁶ exactly, remainder-desc/source tie-break).

    Scale: one scan → one (hash → keeper) map-side-combined aggregate
    + one ≤|sources| raw aggregate; every window rides the ≤|sources|
    relation."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        F.md5("text").alias("h"),
        F.expr("size(split(text, ' '))").cast("long").alias("nt"),
    )
    raw = keyed.groupBy("source").agg(F.sum("nt").alias("n_raw"))
    keep = keyed.groupBy("h").agg(
        F.expr("min_by(source, doc_id)").alias("source"),
        F.expr("min_by(nt, doc_id)").alias("nt"),
    )
    uniq = keep.groupBy("source").agg(F.sum("nt").alias("n_uniq"))
    per = raw.join(uniq, "source", "left").select(
        "source", "n_raw", F.coalesce("n_uniq", F.lit(0)).alias("n_uniq")
    )
    tot = per.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_uniq").alias("t_uniq")
    )
    based = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_raw",
        "n_uniq",
        F.expr("1000000 * n_raw div t_raw").alias("base_r"),
        F.expr("(1000000 * n_raw) % t_raw").alias("rem_r"),
        F.expr("1000000 * n_uniq div t_uniq").alias("base_u"),
        F.expr("(1000000 * n_uniq) % t_uniq").alias("rem_u"),
    )
    wr = Window.orderBy(F.col("rem_r").desc(), "source")
    wu = Window.orderBy(F.col("rem_u").desc(), "source")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        based.withColumn("rk_r", F.row_number().over(wr))
        .withColumn("rk_u", F.row_number().over(wu))
        .withColumn("ex_r", F.lit(1_000_000) - F.sum("base_r").over(w_all))
        .withColumn("ex_u", F.lit(1_000_000) - F.sum("base_u").over(w_all))
        .select(
            "source",
            "n_raw",
            "n_uniq",
            (
                F.col("base_r")
                + F.when(F.col("rk_r") <= F.col("ex_r"), 1).otherwise(0)
            ).alias("raw_share_ppm"),
            (
                F.col("base_u")
                + F.when(F.col("rk_u") <= F.col("ex_u"), 1).otherwise(0)
            ).alias("dedup_share_ppm"),
        )
        .withColumn(
            "shift_ppm", F.col("dedup_share_ppm") - F.col("raw_share_ppm")
        )
        .orderBy("source")
    )


ORACLE_corpus_mixture_dedup = """
WITH keyed AS (
    SELECT source, doc_id, md5(text) AS h,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
    FROM documents
), raw AS (
    SELECT source, sum(nt) AS n_raw FROM keyed GROUP BY source
), keep AS (
    SELECT h, arg_min(source, doc_id) AS source, arg_min(nt, doc_id) AS nt
    FROM keyed GROUP BY h
), uniq AS (
    SELECT source, sum(nt) AS n_uniq FROM keep GROUP BY source
), per AS (
    SELECT r.source, r.n_raw, coalesce(u.n_uniq, 0) AS n_uniq
    FROM raw r LEFT JOIN uniq u ON r.source = u.source
), tot AS (
    SELECT sum(n_raw) AS t_raw, sum(n_uniq) AS t_uniq FROM per
), based AS (
    SELECT source, n_raw, n_uniq,
           1000000 * n_raw // t_raw AS base_r,
           (1000000 * n_raw) % t_raw AS rem_r,
           1000000 * n_uniq // t_uniq AS base_u,
           (1000000 * n_uniq) % t_uniq AS rem_u
    FROM per, tot
), ranked AS (
    SELECT *,
           row_number() OVER (ORDER BY rem_r DESC, source) AS rk_r,
           row_number() OVER (ORDER BY rem_u DESC, source) AS rk_u,
           1000000 - sum(base_r) OVER () AS ex_r,
           1000000 - sum(base_u) OVER () AS ex_u
    FROM based
)
SELECT source,
       CAST(n_raw AS BIGINT) AS n_raw,
       CAST(n_uniq AS BIGINT) AS n_uniq,
       CAST(base_r + CASE WHEN rk_r <= ex_r THEN 1 ELSE 0 END AS BIGINT)
           AS raw_share_ppm,
       CAST(base_u + CASE WHEN rk_u <= ex_u THEN 1 ELSE 0 END AS BIGINT)
           AS dedup_share_ppm,
       CAST(base_u + CASE WHEN rk_u <= ex_u THEN 1 ELSE 0 END
            - base_r - CASE WHEN rk_r <= ex_r THEN 1 ELSE 0 END AS BIGINT)
           AS shift_ppm
FROM ranked
ORDER BY source
"""


# -------- P23: small-shard compaction plan (round 16) ---------------------
_COMPACT_SHARDS = 64
_COMPACT_SALT = "compact"


def corpus_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P23: the SMALL-FILES compaction planner — the operational
    counterpart of P20's skew audit (P20 finds the 1000-writer
    imbalance; this one plans the fix): given per-shard byte totals
    over a {_COMPACT_SHARDS}-way hash sharding, pack shards into merge
    groups under a cap of TWICE the fair share via the P11 best-fit-
    decreasing fold — the exact planning step a lakehouse compaction
    service (or Spark's own OPTIMIZE-style file rewriter) runs before
    touching any data, on a relation whose size is the SHARD COUNT,
    not the corpus.

    Semantics: bytes proxy = Σ n_chars per shard (the committed column,
    so the plan is pinned to table metadata alone); cap = (2·total)
    div {_COMPACT_SHARDS}; an oversized shard cannot fit any bin and
    isolates as its own group (BFD opens it a bin no later item can
    enter) — pass-through needs no special case.  BFD order is bytes
    DESC, shard ASC — deterministic, and the DuckDB twin replays the
    identical recurrence (the P11 recursive-CTE pattern).

    Scale: one corpus scan → one ≤{_COMPACT_SHARDS}-group aggregate;
    the packing fold runs on that bounded relation (single task); the
    one driver collect is the 1-row total that parameterizes the cap —
    a reduced-relation guard, not a data path."""
    from project_obsidian_core_spark.datapipe.text import shared_hash60

    docs = load(spark, sf_dir, "documents")
    per = (
        docs.select(
            F.pmod(
                shared_hash60(
                    F.concat(
                        F.lit(f"{_COMPACT_SALT}:"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                F.lit(_COMPACT_SHARDS),
            ).alias("shard"),
            F.col("n_chars"),
        )
        .groupBy("shard")
        .agg(F.sum("n_chars").alias("bytes_"))
    )
    total = per.agg(F.sum("bytes_").alias("t")).collect()[0]["t"]
    cap = (2 * int(total)) // _COMPACT_SHARDS
    items = per.select(
        F.col("shard").alias("doc_id"),
        F.lit("all").alias("source"),
        F.col("bytes_").alias("n_tokens"),
    )
    out = P.pack_best_fit(items, cap)
    return out.select(
        F.col("doc_key").cast("long").alias("shard"),
        F.col("n_tokens").alias("bytes_"),
        F.col("pack_id").alias("merge_group"),
        F.col("pack_fill").alias("fill_before"),
    ).orderBy("shard")


def _compaction_oracle() -> str:
    cap = f"(2 * tot.t) // {_COMPACT_SHARDS}"
    fit = "list_max(list_filter(r.fills, f -> f + o.bytes_ <= r.cap))"
    return f"""
WITH RECURSIVE per AS (
    SELECT {_sql_hash60(f"'{_COMPACT_SALT}:' || CAST(doc_id AS VARCHAR)")}
               % {_COMPACT_SHARDS} AS shard,
           CAST(sum(n_chars) AS BIGINT) AS bytes_
    FROM documents GROUP BY 1
), tot AS (
    SELECT CAST(sum(bytes_) AS BIGINT) AS t FROM per
), t AS (
    SELECT per.shard, per.bytes_, {cap} AS cap,
           row_number() OVER (ORDER BY per.bytes_ DESC, per.shard) AS rn
    FROM per, tot
), rec AS (
    SELECT shard, bytes_, cap, rn,
           CAST(1 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_fill,
           [bytes_] AS fills
    FROM t WHERE rn = 1
    UNION ALL
    SELECT o.shard, o.bytes_, r.cap, o.rn,
           coalesce(CAST(list_position(r.fills, {fit}) AS BIGINT),
                    len(r.fills) + 1) AS pack_id,
           coalesce({fit}, 0) AS pack_fill,
           CASE WHEN {fit} IS NULL
                THEN list_append(r.fills, o.bytes_)
                ELSE [CASE WHEN k = list_position(r.fills, {fit})
                           THEN r.fills[k] + o.bytes_
                           ELSE r.fills[k] END
                      for k in generate_series(1, len(r.fills))] END AS fills
    FROM rec r JOIN t o ON o.rn = r.rn + 1
)
SELECT CAST(shard AS BIGINT) AS shard, bytes_,
       pack_id AS merge_group, pack_fill AS fill_before
FROM rec
ORDER BY shard
"""


ORACLE_corpus_compaction_plan = _compaction_oracle()
