"""D18/D19: exact duplicated-SPAN detection over a document corpus.

The suffix-array substring dedup of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better" — they drop any 50-token
span that repeats verbatim) assumes the whole corpus fits one machine's
suffix array.  The Spark-native re-expression is fixed-length token
WINDOWS with stride 1: a duplicated span of length >= k always contains
a duplicated k-token window, so grouping identical windows across
documents finds every such span (with positions), at the cost of
reporting a long shared span as its overlapping k-windows.

Reference parity: the reference corpus tooling dedups whole rows /
shingled near-dups only (fortxun/project-obsidian-core scripts/, no
substring pass); this module is part of the §2.11 training-data
extension surface, not a port.

Scale design (100 TB / 1000 executors)
--------------------------------------
- Window construction is a per-row array expression (split + transform
  + slice) inside WholeStageCodegen — no Python, no join; the explode
  is the unavoidable one-row-per-window fan-out (~n_tokens rows/doc,
  the same cardinality the suffix array would index).
- The production path hashes each window to int64 *before* the
  exchange (``hashed=True``): the shuffle carries (doc_id, gh) pairs —
  16 bytes/window — never window text.  The duplicated-window set is a
  partial-agg count over gh, and coverage is a shuffle hash join of two
  int64-keyed relations; AQE handles skew (boilerplate spans hash to
  hot keys the same way hot LSH buckets do).
- The string path exists for the oracle gate (window text comparable in
  SQL) and for human-readable span reports (`dup_spans`), where the
  output is TakeOrdered-limited, not corpus-sized.
- The md5-derived 60-bit hash is shared with the DuckDB oracle
  (datapipe.text.shared_hash60); a real deployment would swap in
  xxhash64 for scan-rate hashing — the plan shape is identical.

Determinism: tokenisation is whitespace-normalised split; hashes are
md5-derived; no floats anywhere (coverage is exact ppm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe.text import shared_hash60

#: default window length in tokens.  Lee et al. use 50 on web corpora;
#: the synthetic gate corpus has ~100-token docs, so tests/gates pass
#: k=8 explicitly — the operator takes k, nothing is tuned to the gate.
SPAN_K = 50


def token_windows(
    df: DataFrame,
    k: int = SPAN_K,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """All k-token windows (stride 1) per document.

    Output: (id_col, start_pos [1-based token index], gram) — or
    (id_col, start_pos, gh) when ``hashed`` (the window text never
    leaves the map side).  Documents shorter than k tokens emit no
    rows.  The ``size >= k`` filter is load-bearing: Spark's
    ``sequence(1, n)`` generates DESCENDING sequences for n < 1, which
    would fabricate windows for short docs.
    """
    toks = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    d = df.select(F.col(id_col), toks.alias("toks")).where(F.size("toks") >= k)
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {k - 1}),"
        f" i -> concat_ws(' ', slice(toks, i, {k})))"
    )
    w = d.select(
        id_col, F.posexplode(grams).alias("pos0", "gram")
    ).select(
        id_col, (F.col("pos0") + 1).alias("start_pos"), "gram"
    )
    if hashed:
        w = w.select(id_col, "start_pos", shared_hash60(F.col("gram")).alias("gh"))
    return w


def dup_spans(
    df: DataFrame,
    k: int = SPAN_K,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token windows appearing in >= min_docs DISTINCT documents.

    Output: (gram, n_docs, n_occ) — the verbatim-repeated spans a
    substring-dedup pass would excise.  One exchange (hash-partitioned
    partial counts per gram); callers cap the result with an
    orderBy+limit (TakeOrderedAndProject), never a global sort.
    """
    w = token_windows(df, k=k, text_col=text_col, id_col=id_col)
    return (
        w.groupBy("gram")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def dup_span_coverage(
    df: DataFrame,
    k: int = SPAN_K,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span coverage: what fraction of a doc's
    k-token windows repeat verbatim in >= min_docs distinct docs.

    Output: (id_col, n_windows, n_dup_windows, dup_ppm) — exact-int
    parts-per-million; docs with >= k tokens only (shorter docs have no
    windows to classify).  This is the per-doc statistic a curation
    pass thresholds on ("drop docs that are mostly boilerplate").

    Plan: hashed windows (int64 gh) -> [exchange 1] gh-keyed distinct-
    doc count to derive the duplicated-gh set -> [exchange 2] windows
    join dup-set on gh (both sides already gh-keyed; the dup set
    carries one boolean-free column) -> [exchange 3] per-doc count
    fold.  All shuffle keys are 8-byte ints; window text dies map-side.
    """
    w = token_windows(df, k=k, text_col=text_col, id_col=id_col, hashed=True)
    dup = (
        w.groupBy("gh")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("gh")
    )
    flagged = w.join(dup.withColumn("is_dup", F.lit(1)), "gh", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.coalesce(F.sum("is_dup"), F.lit(0)).alias("n_dup_windows"),
        )
        .select(
            id_col,
            "n_windows",
            "n_dup_windows",
            F.expr("(n_dup_windows * 1000000L) DIV n_windows").alias("dup_ppm"),
        )
    )


def excise_dup_spans(
    df: DataFrame,
    k: int = SPAN_K,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """D20: the substring-dedup TRANSFORMATION — rewrite each document
    with corpus-duplicated spans removed, keeping exactly one canonical
    occurrence per span (Lee et al. 2022 drop repeated spans from all
    but one position; canonical here = smallest (doc_id, start_pos),
    a total order so the choice is deterministic).

    A token is removed iff it is covered by a NON-canonical occurrence
    of a duplicated k-window; overlapping windows union naturally
    through the coverage test.  Output: (id_col, n_tokens, n_removed,
    clean_text) for every doc with >= 1 window (shorter docs pass
    through with n_removed = 0).

    Plan: the D18 window relation -> gram-keyed dup flag + canonical
    row_number (one exchange on gram) -> per-doc collect of removal
    starts (one exchange on doc) -> join back to the token arrays and
    rebuild text with a per-row filter expression (codegen: exists()
    over the bounded starts array per token).  No token-level shuffle:
    tokens only ever travel inside their row's array; what shuffles is
    one row per WINDOW OCCURRENCE, the same cardinality D18 already
    pays, then one bounded starts-array per doc.
    """
    from pyspark.sql.window import Window

    toks = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    base = df.select(F.col(id_col), toks.alias("toks"))
    w = token_windows(df, k=k, text_col=text_col, id_col=id_col)
    per_gram = Window.partitionBy("gram")
    order = Window.partitionBy("gram").orderBy(id_col, "start_pos")
    flagged = w.select(
        id_col,
        "start_pos",
        F.size(F.collect_set(id_col).over(per_gram)).alias("n_docs"),
        F.row_number().over(order).alias("occ_rank"),
    )
    removals = flagged.where(
        (F.col("n_docs") >= min_docs) & (F.col("occ_rank") > 1)
    ).groupBy(id_col).agg(F.collect_set("start_pos").alias("starts"))
    joined = base.join(removals, id_col, "left").select(
        id_col,
        "toks",
        F.coalesce("starts", F.expr("array()")).alias("starts"),
    )
    kept = F.expr(
        f"filter(transform(toks, (t, i0) -> "
        f"  case when exists(starts, s -> i0 + 1 >= s and i0 + 1 < s + {k})"
        f"       then null else t end), t -> t is not null)"
    )
    return joined.select(
        F.col(id_col),
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def span_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = SPAN_K,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_bench: bool = True,
) -> DataFrame:
    """D21: span-level benchmark decontamination — for each corpus doc,
    WHICH k-token windows also appear verbatim in the benchmark set,
    and where.  The X6 n-gram screen answers "is this doc contaminated";
    this answers "which spans", enabling span excision instead of doc
    drops (the D20 move applied cross-table) and auditor drill-down.

    Output per corpus doc with >= 1 window: (id_col, n_windows,
    n_contaminated, first_hit_pos [NULL if clean], n_bench_docs
    [distinct benchmark docs sharing >= 1 window]).

    Plan: both sides reduce to hashed windows map-side; the benchmark
    side collapses to DISTINCT (gh, bench_id) and — benchmarks being
    orders of magnitude smaller than training corpora — broadcasts by
    default, so the corpus never shuffles at all: scan -> explode ->
    broadcast probe -> per-doc partial agg.  Set broadcast_bench=False
    to fall back to a shuffle hash join when the "benchmark" is itself
    corpus-sized.
    """
    cw = token_windows(corpus, k=k, text_col=text_col, id_col=id_col, hashed=True)
    bw = (
        token_windows(benchmark, k=k, text_col=text_col, id_col=id_col, hashed=True)
        .select("gh", F.col(id_col).alias("bench_id"))
        .distinct()
    )
    if broadcast_bench:
        bw = F.broadcast(bw)
    hits = cw.join(bw, "gh", "left")
    return (
        hits.groupBy(id_col)
        .agg(
            F.countDistinct("start_pos").alias("n_windows"),
            F.countDistinct(
                F.when(F.col("bench_id").isNotNull(), F.col("start_pos"))
            ).alias("n_contaminated"),
            F.min(
                F.when(F.col("bench_id").isNotNull(), F.col("start_pos"))
            ).alias("first_hit_pos"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )
