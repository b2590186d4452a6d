"""Corpus-management operators for training-data pipelines.

The ops a 100 TB pretraining pipeline runs after cleaning/dedup and before
training: deterministic train/val/test splitting, hash-based sampling,
event sessionization, and sequence packing of tokenized documents into
fixed-length contexts.

Scale notes
-----------
- Split/sample are per-row JVM expressions over the shared 60-bit md5 hash
  (:func:`datapipe.text.shared_hash60`): no shuffle, no RNG state, stable
  under re-runs and cluster re-partitioning — the property that matters for
  reproducible training sets.
- Sessionization is one window over (entity, time) — a single shuffle on
  the entity key, the minimum possible; gap detection is a lag diff, the
  same shape as the QAN snapshot delta (operators/delta.py).
- Packing ships two variants: :func:`pack_sequential` (prefix-sum bin
  assignment, pure SQL window — documents may span bin boundaries, the
  "concat-then-chunk" packing most LLM data loaders use) and
  :func:`pack_greedy` (first-fit within a shard via ``applyInPandas`` —
  no document splitting). Both partition by shard first, so packing
  parallelizes per shard and never shuffles document text — only
  (doc_id, n_tokens) metadata moves.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from project_obsidian_core_spark.datapipe.text import shared_hash60

# ------------------------------------------------------------ split -------

#: default split weights (per mille, summing to 1000)
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 980),
    ("val", 10),
    ("test", 10),
)


def split_column(
    key: Column, splits: Iterable[tuple[str, int]] = DEFAULT_SPLITS, salt: str = "split"
) -> Column:
    """Deterministic split assignment from a stable key column.

    ``hash60(salt || key) % 1000`` against cumulative per-mille thresholds.
    Salting decorrelates the split hash from any other hash of the same key
    (dedup buckets, shard assignment); changing the salt resamples every
    split membership at once.
    """
    bucket = shared_hash60(F.concat(F.lit(salt + ":"), key)) % 1000
    expr = None
    cum = 0
    for name, weight in splits:
        cum += weight
        cond = bucket < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit("train"))


def assign_splits(
    df: DataFrame,
    key_col: str = "doc_id",
    splits: Iterable[tuple[str, int]] = DEFAULT_SPLITS,
    salt: str = "split",
) -> DataFrame:
    """Attach a `split` column keyed on ``key_col`` (cast to string)."""
    return df.withColumn(
        "split", split_column(F.col(key_col).cast("string"), splits, salt)
    )


def hash_sample(
    df: DataFrame, rate_permille: int, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli(rate/1000) sample — the reproducible
    alternative to `df.sample()`: membership depends only on (salt, key),
    so re-runs, retries, and different partitionings select identical rows.
    """
    bucket = shared_hash60(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    ) % 1000
    return df.filter(bucket < rate_permille)


def hash_sample_exact(
    df: DataFrame, k: int, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic EXACT-k sample: the k rows with the smallest
    ``hash60(salt || key)`` — the "give me exactly 100k docs for eval"
    primitive :func:`hash_sample` (Bernoulli, size only in expectation)
    cannot provide, and the reproducible alternative to reservoir
    sampling (whose result depends on encounter order).  Membership
    depends only on (salt, key, k), and the k'-smallest set is a PREFIX
    of the k-smallest for k' < k — nested samples for free (eval
    subsets of a larger eval set).

    Executes as ``ORDER BY key LIMIT k`` = TakeOrderedAndProject: each
    partition keeps its local top-k heap, the driver merges P·k
    candidates — no global sort, no shuffle of the data rows; at 100 TB
    the cost is one scan plus a P·k driver merge (keep k ≤ ~10⁶).
    Ties are broken by ``key_col`` (total order even under a 60-bit
    hash collision).
    """
    key = shared_hash60(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    )
    return (
        df.withColumn("_sk", key)
        .orderBy("_sk", key_col)
        .limit(k)
        .drop("_sk")
    )


# ------------------------------------------------------- sessionize -------
def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the entity's previous event exceeds ``gap``.

    One shuffle (window on the entity key). `session_idx` is the running
    count of session starts per entity; (entity, session_idx) is the
    session key. At 100 TB the window holds only one entity's events per
    task — skew comes from hot entities, which AQE's skew-join handling
    does not cover for windows; for those use
    :func:`sessionize_presplit` (identical output, tasks bounded by
    events-per-entity-per-period; 3.2× faster on an 8M-event hot entity,
    SCALE.md).
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # gap comparison in exact µs (timestamp arithmetic stays integral)
    gap_us = F.expr(f"unix_micros(timestamp'1970-01-01 00:00:00' + INTERVAL {gap})")
    diff_us = F.expr(f"unix_micros({ts_col})") - F.unix_micros(prev_ts)
    is_start = prev_ts.isNull() | (diff_us > gap_us)
    return df.withColumn(
        "session_idx",
        F.sum(is_start.cast("long")).over(
            Window.partitionBy(entity_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def sessionize_presplit(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    period: str = "1 day",
) -> DataFrame:
    """Hot-entity-safe :func:`sessionize`: identical output, bounded tasks.

    The plain formulation windows on the entity key alone, so an entity
    with 10⁸ events becomes ONE task (AQE skew handling covers joins, not
    windows). This variant splits each entity's events into ``period``
    buckets, sessionizes per (entity, period) — tasks now bounded by
    events-per-entity-per-period — and stitches across boundaries with a
    window over the per-(entity, period) SUMMARY relation (one row per
    bucket, events/period smaller by that factor):

    * a period's first session merges with the previous period's last iff
      the timestamp gap across the boundary is ≤ ``gap`` (actual
      timestamps, so empty periods in between break sessions correctly);
    * global ``session_idx`` = (sessions in earlier periods) − (boundary
      merges so far) + local idx — each merge removes exactly one session
      boundary.

    Two shuffles over the events (the (entity, period) window + the
    summary join on the same keys) instead of one; the summary window
    shuffles only the tiny bucket relation. Equivalence with
    :func:`sessionize` is pinned property-style in tests.
    """
    us = F.unix_micros(F.col(ts_col))
    period_us = F.expr(
        f"unix_micros(timestamp'1970-01-01 00:00:00' + INTERVAL {period})"
    )
    gap_us = F.expr(f"unix_micros(timestamp'1970-01-01 00:00:00' + INTERVAL {gap})")
    ev = df.withColumn("_p", F.floor(us / period_us).cast("long"))

    # local sessionize within (entity, period)
    wp = Window.partitionBy(entity_col, "_p").orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(wp)
    diff_us = us - F.unix_micros(prev_ts)
    is_start = prev_ts.isNull() | (diff_us > gap_us)
    local = ev.withColumn(
        "_local_idx",
        F.sum(is_start.cast("long")).over(
            wp.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )

    # per-(entity, period) summary: tiny relation, one row per bucket
    summary = local.groupBy(entity_col, "_p").agg(
        F.max("_local_idx").alias("_n_sessions"),
        F.min(ts_col).alias("_first_ts"),
        F.max(ts_col).alias("_last_ts"),
    )
    ws = Window.partitionBy(entity_col).orderBy("_p")
    prev_last = F.lag("_last_ts").over(ws)
    merge = (
        prev_last.isNotNull()
        & ((F.unix_micros(F.col("_first_ts")) - F.unix_micros(prev_last)) <= gap_us)
    ).cast("long")
    summary = summary.select(
        entity_col,
        "_p",
        F.coalesce(
            F.sum("_n_sessions").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_offset"),
        F.sum(merge).over(ws.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "_merges"
        ),
    )

    out = local.join(summary, [entity_col, "_p"]).withColumn(
        "session_idx", F.col("_offset") - F.col("_merges") + F.col("_local_idx")
    )
    return out.select(*df.columns, "session_idx")


def sessionize_window(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: Column | None = None,
) -> DataFrame:
    """Gap sessions via Spark's native ``session_window`` — the
    streaming-capable form of :func:`sessionize` (works under a watermark
    as a stateful streaming aggregation with mergeable session state).

    Same session boundaries as the lag-window formulation for strictly
    increasing per-entity timestamps, with one semantic edge: an event at
    *exactly* ``gap`` after its predecessor starts a NEW session here
    (session_window merges only strictly-closer events), where
    :func:`sessionize`'s strict ``>`` comparison keeps it. Emits
    (entity, session_start_us, session_end_us=last event, n_events
    [, value_sum]); session_window's native `end` is last-event + gap, so
    the last-event time is re-derived with max().
    """
    aggs = [
        F.min(F.expr(f"unix_micros({ts_col})")).alias("session_start_us"),
        F.max(F.expr(f"unix_micros({ts_col})")).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return (
        df.groupBy(F.session_window(ts_col, gap), entity_col)
        .agg(*aggs)
        .drop("session_window")
    )


def session_stats(sessions: DataFrame, entity_col: str = "user_id",
                  ts_col: str = "ts", value_col: Column | None = None) -> DataFrame:
    """Per-session aggregates over a sessionized frame."""
    aggs = [
        F.min(F.expr(f"unix_micros({ts_col})")).alias("session_start_us"),
        F.max(F.expr(f"unix_micros({ts_col})")).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return sessions.groupBy(entity_col, "session_idx").agg(*aggs)


# ---------------------------------------------------------- packing -------
def pack_sequential(
    df: DataFrame,
    ctx_len: int,
    tokens_col: str = "n_tokens",
    shard_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk packing: within a shard, documents are laid out in
    ``order_col`` order and cut into ``ctx_len``-token contexts; a document
    may span a boundary (standard GPT-style pretraining packing).

    `pack_id` = which context this document *starts* in; `pack_offset` =
    its token offset inside that context. One window per shard — a single
    shuffle on the shard key, token counts only.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.select(
        order_col,
        shard_col,
        F.col(tokens_col),
        F.floor(prefix / ctx_len).cast("long").alias("pack_id"),
        (prefix % ctx_len).cast("long").alias("pack_offset"),
    )


def chunk_documents(
    docs: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size character chunking — the context-window prep
    step for embedding/RAG indexing and long-document pretraining: each
    document becomes ``ceil((len - overlap) / stride)`` chunks (≥ 1) of up
    to ``size`` chars, consecutive chunks sharing ``overlap`` chars
    (``stride = size - overlap``).

    Emits (id, chunk_idx, chunk_text, n_chars). Fully narrow — a per-row
    ``sequence``+``explode`` with fan-out bounded by len/stride and
    JVM-side ``substring``; NO shuffle, no Python. At 100 TB this is a
    map-only pass that runs at scan speed; chunk count is derived
    arithmetically (exact ints), so the plan needs no second pass over
    the text.
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.expr(
            f"(length({text_col}) - {overlap} + {stride} - 1) div {stride}"
        ),
    )
    return (
        docs.select(
            id_col,
            text_col,
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(
                f"substring({text_col}, chunk_idx * {stride} + 1, {size})"
            ).alias("chunk_text"),
        )
        .withColumn("n_chars", F.length("chunk_text").cast("long"))
    )


_PACK_SCHEMA_SUFFIX = [
    T.StructField("pack_id", T.LongType()),
    T.StructField("pack_fill", T.LongType()),
]


def pack_greedy(
    df: DataFrame,
    ctx_len: int,
    tokens_col: str = "n_tokens",
    shard_col: str = "source",
    order_col: str = "doc_id",
    max_shard_rows: int | None = None,
) -> DataFrame:
    """First-fit packing without document splitting: walk the shard in
    ``order_col`` order; a document that would overflow the current context
    opens a new one. Oversized documents (> ctx_len) get a context alone.

    The recurrence (current fill carries across rows) is not expressible as
    a closed-form window, so it runs as Arrow-batched ``applyInPandas`` per
    shard — the same pattern as the streaming snapshot fold
    (streaming/delta_stream.py). Only (order, tokens) columns move; at
    100 TB the text stays in place and the assignment joins back on
    ``order_col``.

    ``max_shard_rows`` is the hot-shard guard rail (same contract as
    dedup's ``max_bucket``/``max_block``): a shard larger than the cap is
    split on a salted sub-key into ceil(n / cap) sub-shards and packed per
    sub-shard, so one giant shard cannot serialize the stage into a single
    task. Pack ids are namespaced ``sub * 2 * max_shard_rows + local`` (a
    sub-shard opens at most one pack per row; the hash salt balances only
    approximately, so the namespace is twice the cap and the fn asserts
    the sub-shard fits — r12 ADVICE: the exact-cap width could collide
    when a sub-shard overshoots) — globally
    unique within the shard and deterministic. The trade is the same as the
    dedup caps: packing is first-fit per SUB-shard rather than across the
    whole shard, costing at most ceil(n/cap) partially-filled tail
    contexts — noise against n/cap full ones — in exchange for bounded
    task size.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_key", T.StringType()),
            T.StructField("shard", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
        ]
        + _PACK_SCHEMA_SUFFIX
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__order").reset_index(drop=True)
        if max_shard_rows is not None and len(pdf) > 2 * max_shard_rows:
            raise ValueError(
                f"sub-shard holds {len(pdf)} docs > namespace width "
                f"{2 * max_shard_rows}; raise max_shard_rows"
            )
        base = int(pdf["__sub"].iloc[0]) * 2 * (max_shard_rows or 0)
        pack_id, fill = base, 0
        ids, fills = [], []
        for n in pdf["__tokens"].astype("int64"):
            if fill > 0 and fill + n > ctx_len:
                pack_id += 1
                fill = 0
            ids.append(pack_id)
            fills.append(fill)
            fill += int(n)
            if fill >= ctx_len:
                pack_id += 1
                fill = 0
        return pd.DataFrame(
            {
                "doc_key": pdf["__order"].astype(str),
                "shard": pdf["__shard"].astype(str),
                "n_tokens": pdf["__tokens"].astype("int64"),
                "pack_id": ids,
                "pack_fill": fills,
            }
        )

    slim = df.select(
        F.col(order_col).alias("__order"),
        F.col(shard_col).alias("__shard"),
        F.col(tokens_col).cast("long").alias("__tokens"),
    )
    if max_shard_rows is None:
        slim = slim.withColumn("__sub", F.lit(0))
    else:
        # shard sizes via a window (NULL-safe, like write_corpus); the salt
        # spreads a hot shard over ceil(n / cap) groups
        n = F.count(F.lit(1)).over(Window.partitionBy("__shard"))
        n_subs = F.greatest(
            F.ceil(n / F.lit(max_shard_rows)).cast("long"), F.lit(1)
        )
        slim = slim.withColumn(
            "__sub",
            F.pmod(shared_hash60(F.col("__order").cast("string")), n_subs),
        )
    return slim.groupBy("__shard", "__sub").applyInPandas(_pack, schema=out_schema)


def pack_best_fit(
    df: DataFrame,
    ctx_len: int,
    tokens_col: str = "n_tokens",
    shard_col: str = "source",
    order_col: str = "doc_id",
    max_shard_rows: int | None = None,
) -> DataFrame:
    """Best-fit-decreasing (BFD) packing without document splitting — the
    classic bin-packing heuristic (≤ 11/9·OPT + 2/3 bins) next to
    :func:`pack_greedy`'s first-fit-in-corpus-order: documents sort by
    token count DESCENDING (``order_col`` as the tie-break), and each one
    lands in the FULLEST already-open context it still fits (ties → the
    lowest-numbered pack, the deterministic rule the oracle mirrors via
    first-occurrence ``list_position``); no fit opens a new context.
    First-fit preserves corpus order (cheap, streaming-friendly); BFD
    trades a sort + open-bin state for measurably fewer
    partially-filled contexts — the policy choice every packing pipeline
    prices.

    Same execution shape and ``max_shard_rows`` hot-shard guard as
    ``pack_greedy`` (salted sub-shards, namespaced pack ids); state per
    task is the open-bin fill list — O(packs in the sub-shard), bounded
    by the cap.  The best-fit lookup is a BISECT over the sorted
    (fill, -bin) list (r12 verdict #7 — the linear open-bin scan was the
    one per-row Python loop with an avoidable O(bins) factor): the
    rightmost entry with ``fill ≤ ctx_len − n`` is the fullest eligible
    bin, and storing ``-bin`` makes the tuple order resolve equal fills
    to the LOWEST-numbered pack — the identical deterministic rule the
    oracle mirrors via first-occurrence ``list_position``.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_key", T.StringType()),
            T.StructField("shard", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
        ]
        + _PACK_SCHEMA_SUFFIX
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pdf = pdf.sort_values(
            ["__tokens", "__order"], ascending=[False, True]
        ).reset_index(drop=True)
        if max_shard_rows is not None and len(pdf) > 2 * max_shard_rows:
            raise ValueError(
                f"sub-shard holds {len(pdf)} docs > namespace width "
                f"{2 * max_shard_rows}; raise max_shard_rows"
            )
        base = int(pdf["__sub"].iloc[0]) * 2 * (max_shard_rows or 0)
        # open bins as a SORTED list of (fill, -bin_idx): the rightmost
        # entry with fill ≤ ctx_len − n is the fullest eligible bin, and
        # -bin_idx resolves equal fills to the lowest-numbered pack
        open_bins: list[tuple[int, int]] = []
        n_bins = 0
        ids, before = [], []
        for n in pdf["__tokens"].astype("int64"):
            n = int(n)
            j = bisect.bisect_right(open_bins, (ctx_len - n, 1)) - 1
            if j < 0:
                n_bins += 1
                bisect.insort(open_bins, (n, -n_bins))
                ids.append(base + n_bins)
                before.append(0)
            else:
                f, neg = open_bins.pop(j)
                ids.append(base - neg)
                before.append(f)
                bisect.insort(open_bins, (f + n, neg))
        return pd.DataFrame(
            {
                "doc_key": pdf["__order"].astype(str),
                "shard": pdf["__shard"].astype(str),
                "n_tokens": pdf["__tokens"].astype("int64"),
                "pack_id": ids,
                "pack_fill": before,
            }
        )

    slim = df.select(
        F.col(order_col).alias("__order"),
        F.col(shard_col).alias("__shard"),
        F.col(tokens_col).cast("long").alias("__tokens"),
    )
    if max_shard_rows is None:
        slim = slim.withColumn("__sub", F.lit(0))
    else:
        n = F.count(F.lit(1)).over(Window.partitionBy("__shard"))
        n_subs = F.greatest(
            F.ceil(n / F.lit(max_shard_rows)).cast("long"), F.lit(1)
        )
        slim = slim.withColumn(
            "__sub",
            F.pmod(shared_hash60(F.col("__order").cast("string")), n_subs),
        )
    return slim.groupBy("__shard", "__sub").applyInPandas(_pack, schema=out_schema)


# ----------------------------------------------------- corpus shuffle -----

#: hash-range width per shard for :func:`corpus_shuffle` — shared_hash60
#: is uniform on [0, 2^60), so ``key // width`` buckets it evenly
_HASH60_SPAN = 1 << 60


def corpus_shuffle(
    df: DataFrame,
    seed: int = 0,
    n_shards: int = 64,
    key_col: str = "doc_id",
) -> DataFrame:
    """Seeded deterministic global corpus shuffle — the standard
    pretraining step between packing and the sink: training order must
    be a reproducible permutation (same seed ⇒ identical order across
    reruns, retries, and cluster re-partitionings; different seed ⇒ a
    fresh permutation), which ``df.orderBy(rand())`` cannot give.

    The permutation key is ``hash60('shuffle:{seed}:' || key)`` — the
    same engine-portable 60-bit md5 hash as split/sample, so the oracle
    reproduces the order bit-exactly.  Shards are HASH-RANGE buckets
    (``key // (2^60 / n_shards)``), so shard order ∘ within-shard order
    IS the global key order and the whole shuffle is ONE exchange: rows
    move to their shard, each task sorts ~N/n_shards rows, no global
    sort.  ``global_pos`` composes per-shard ranks with shard offsets
    from an n_shards-row aggregate broadcast back — never a one-task
    global window.

    Output adds ``shard`` (0-based), ``pos`` (1-based rank within the
    shard) and ``global_pos`` (1-based rank in the full permutation).
    """
    width = (_HASH60_SPAN + n_shards - 1) // n_shards
    key = shared_hash60(
        F.concat(F.lit(f"shuffle:{seed}:"), F.col(key_col).cast("string"))
    )
    # integer div (never `/`: float division loses precision on 60-bit keys)
    keyed = df.withColumn("_sk", key).withColumn(
        "shard", F.expr(f"_sk div {width}")
    )
    pos = F.row_number().over(
        # hash-collision ties break on the key column: total, deterministic
        Window.partitionBy("shard").orderBy("_sk", key_col)
    )
    ranked = keyed.withColumn("pos", pos.cast("long"))
    # shard offsets: an n_shards-row aggregate; the global window over it
    # is a reduced relation (≤ n_shards rows), then broadcast back
    counts = keyed.groupBy("shard").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "shard",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), "shard")
        .withColumn("global_pos", (F.col("_off") + F.col("pos")).cast("long"))
        .drop("_sk", "_off")
    )


#: slot-key scale for :func:`interleave_order` — integer stride
#: resolution; (2·rank)·SCALE must fit int64, so ranks up to ~4.6e9
_INTERLEAVE_SCALE = 1_000_000_000


def interleave_order(
    df: DataFrame,
    weight_ppm_col: str = "weight_ppm",
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic mixture INTERLEAVING — the step between the mixture
    plan (which decides per-source shares) and the sink: produce one
    global training order where source ``s`` occupies a share of any
    prefix proportional to its weight, instead of the
    source-concatenated order a partitioned write gives (which trains
    epochs of one source before the next — the curriculum bug mixture
    weights exist to avoid).

    Classic STRIDE SCHEDULING in exact integers: within each source,
    documents rank by the seeded shuffle hash (``hash60(salt||key)``,
    the corpus_shuffle key — reproducible, partitioning-independent);
    document ``r`` of a source with weight ``w`` ppm lands at
    ``slot_key = (2r−1)·SCALE div (2w)`` — the r-th multiple of the
    source's stride, centered.  Sorting by ``(slot_key, source,
    src_rank)`` interleaves every source at its weight: any prefix of K
    slots holds ≈ K·wₛ/Σw documents of source s (off by at most one
    stride).  All integer arithmetic — bit-identical across engines.

    Cost: ONE shuffle (the per-source rank window; hot-source skew has
    the same presplit escape as sessionize), then slot_key is a
    map-side expression; writing the order is a ``repartitionByRange``
    on slot_key (Spark's range sampler handles the data-dependent
    domain).  Expects ``weight_ppm_col`` already attached (ratios are
    what matter; weights need not sum to 10⁶).
    """
    key = shared_hash60(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    )
    ranked = df.withColumn("_ik", key).withColumn(
        "src_rank",
        F.row_number()
        .over(Window.partitionBy(source_col).orderBy("_ik", key_col))
        .cast("long"),
    )
    return ranked.withColumn(
        "slot_key",
        F.expr(
            f"(2 * src_rank - 1) * {_INTERLEAVE_SCALE}"
            f" div (2 * {weight_ppm_col})"
        ),
    ).drop("_ik")


def interleave_order_presplit(
    df: DataFrame,
    weight_ppm_col: str = "weight_ppm",
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "shuffle",
    n_subs: int = 64,
) -> DataFrame:
    """Hot-source-safe twin of :func:`interleave_order` — IDENTICAL
    output, but the per-source rank never runs as one task: at 100 TB a
    dominant source (a web crawl is often >80% of the corpus) would
    serialize the plain version's ``Window.partitionBy(source)`` into a
    single sorter.

    The fix is the corpus_shuffle idiom applied inside each source: the
    rank key is the seeded hash, and hash-RANGE sub-buckets
    (``key // (2^60/n_subs)``) preserve its order, so
    ``rank = local rank within (source, sub) + Σ counts of lower
    subs`` — an (n_sources · n_subs)-row offset aggregate broadcast
    back, exactly the sessionize_presplit / shuffle-offsets trade:
    tasks bounded by ~|source|/n_subs rows, one extra tiny broadcast.
    """
    width = (_HASH60_SPAN + n_subs - 1) // n_subs
    key = shared_hash60(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    )
    keyed = df.withColumn("_ik", key).withColumn(
        "_sub", F.expr(f"_ik div {width}")
    )
    local = F.row_number().over(
        Window.partitionBy(source_col, "_sub").orderBy("_ik", key_col)
    )
    ranked = keyed.withColumn("_lr", local.cast("long"))
    counts = keyed.groupBy(source_col, "_sub").agg(
        F.count(F.lit(1)).alias("_n")
    )
    offsets = counts.select(
        source_col,
        "_sub",
        F.coalesce(
            F.sum("_n").over(
                Window.partitionBy(source_col)
                .orderBy("_sub")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), [source_col, "_sub"])
        .withColumn("src_rank", (F.col("_off") + F.col("_lr")).cast("long"))
        .withColumn(
            "slot_key",
            F.expr(
                f"(2 * src_rank - 1) * {_INTERLEAVE_SCALE}"
                f" div (2 * {weight_ppm_col})"
            ),
        )
        .drop("_ik", "_sub", "_lr", "_off")
    )


# --------------------------------------------------------- corpus sink ----


def write_corpus(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("split", "lang"),
    target_file_rows: int | None = None,
    mode: str = "overwrite",
    zorder_cols: Sequence[tuple[str, int, int]] | None = None,
    zorder_bits: int = 12,
    zorder_tasks: int | None = None,
) -> None:
    """Write a curated corpus partitioned by (split, lang) — the layout a
    training job reads: split pruning is free (a val-only eval reads 1% of
    files) and language mixtures are selectable at the directory level.

    ``target_file_rows`` bounds BOTH failure modes of partitioned writes:
    a naive ``repartition(partition_cols)`` puts each (split, lang) in ONE
    task — the small-files problem inverted into a giant-file +
    one-straggler-task problem at 100 TB — so a salt spreads each partition
    over ceil(rows/target) tasks; ``maxRecordsPerFile`` then caps file size
    within whatever task layout the shuffle produced.

    ``zorder_cols`` (``(column, lo, hi)`` specs, see
    :func:`operators.layout.zorder_value`) replaces the salted spread with
    Z-CURVE clustering INSIDE each directory partition: rows range-shuffle
    on ``(*partition_cols, z)`` — big strata still split across many tasks
    (the range sampler sees the z spread), so no straggler — and sort by z
    within tasks, so every file carries tight min/max footer stats on ALL
    the z dimensions. This is the composition the L1 soak calls out for
    100 TB: split/lang stay directory partitions (exact pruning), z-order
    covers the residual multi-column selectivity inside them.
    """
    out = df
    if zorder_cols is not None:
        from project_obsidian_core_spark.operators.layout import zorder_value

        z = df.withColumn("_z", zorder_value(zorder_cols, zorder_bits))
        # explicit task count pins the file granularity (AQE would coalesce
        # a small write into one task and erase the z-local file layout);
        # default leaves it to shuffle.partitions + AQE, right at scale
        range_args = ([zorder_tasks] if zorder_tasks else []) + [
            *partition_cols,
            "_z",
        ]
        out = (
            z.repartitionByRange(*range_args)
            .sortWithinPartitions(*partition_cols, "_z")
            .drop("_z")
        )
    elif target_file_rows is not None:
        from pyspark.sql.window import Window

        # stratum sizes via a window, NOT a self-join: an inner join on the
        # partition columns evaluates NULL = NULL as false and silently
        # drops rows with a NULL key (which the plain write path would
        # still deliver to __HIVE_DEFAULT_PARTITION__). Windows group NULLs.
        n = F.count(F.lit(1)).over(Window.partitionBy(*partition_cols))
        out = (
            df.withColumn(
                "_salt",
                F.pmod(
                    shared_hash60(F.col("doc_id").cast("string")),
                    F.greatest(
                        F.ceil(n / F.lit(target_file_rows)).cast("long"),
                        F.lit(1),
                    ),
                ),
            )
            .repartition(*partition_cols, "_salt")
            .drop("_salt")
        )
    writer = out.write.mode(mode)
    if target_file_rows is not None:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    writer.partitionBy(*partition_cols).parquet(path)


def corpus_curriculum(
    df: DataFrame,
    n_stages: int = 4,
    seed: int = 0,
    n_shards: int = 64,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum-learning scheduler: easiest→hardest stage ordering with
    a reproducible shuffle INSIDE each stage — the training-order
    counterpart of :func:`corpus_shuffle` when the run warms up on easy
    text first (curriculum learning) instead of a flat permutation.

    Difficulty is the exact-int milli-average token length
    (``1000·(chars − n_tok + 1) div n_tok`` over the shared
    space-split tokenization) — longer words ⇒ harder text, the classic
    cheap proxy.  Stages are COUNT-QUANTILES with ties sharing a stage:
    ``stage = 1 + (n_stages · |docs with difficulty < v|) div total`` —
    deterministic, exchange-free for the docs themselves (the
    boundary table is computed on the ≤|distinct difficulty values|
    reduced relation, bounded by the milli-length range, and broadcast
    back).

    The schedule position composes three broadcast offsets exactly like
    :func:`corpus_shuffle`: stage offset (≤n_stages-row aggregate) +
    within-stage hash-range shard offset (≤n_stages·n_shards rows) +
    per-(stage, shard) rank — so the whole curriculum is ONE exchange
    and ``curriculum_pos`` equals ``row_number() OVER (ORDER BY stage,
    hash, key)`` without a global sort.
    """
    width = (_HASH60_SPAN + n_shards - 1) // n_shards
    difficulty = F.expr(
        f"1000 * (length({text_col}) - size(split({text_col}, ' ')) + 1)"
        f" div size(split({text_col}, ' '))"
    )
    base = df.select(
        F.col(key_col),
        difficulty.alias("difficulty_milli"),
        shared_hash60(
            F.concat(F.lit(f"curriculum:{seed}:"), F.col(key_col).cast("string"))
        ).alias("_sk"),
    )
    # stage boundaries on the reduced distinct-difficulty relation
    vc = base.groupBy("difficulty_milli").agg(F.count(F.lit(1)).alias("_n"))
    wv = Window.orderBy("difficulty_milli").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = vc.agg(F.sum("_n").alias("_total"))
    stages = (
        vc.withColumn("_before", F.coalesce(F.sum("_n").over(wv), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .select(
            "difficulty_milli",
            (
                F.lit(1)
                + F.expr(f"({n_stages} * _before) div _total")
            ).cast("int").alias("stage"),
        )
    )
    staged = base.join(F.broadcast(stages), "difficulty_milli").withColumn(
        "shard", F.expr(f"_sk div {width}")
    )
    rank = F.row_number().over(
        Window.partitionBy("stage", "shard").orderBy("_sk", key_col)
    )
    ranked = staged.withColumn("_rank", rank.cast("long"))
    # (stage, shard) counts -> cumulative offsets in (stage, shard) order;
    # a ≤ n_stages·n_shards reduced relation, broadcast back
    counts = staged.groupBy("stage", "shard").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("stage", "shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "stage",
        "shard",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), ["stage", "shard"])
        .withColumn("curriculum_pos", (F.col("_off") + F.col("_rank")).cast("long"))
        .select(key_col, "difficulty_milli", "stage", "curriculum_pos")
    )
