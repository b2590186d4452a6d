"""Deduplication operators for training-data pipelines.

Exact (content-hash groupBy), MinHash+LSH (shingle → minhash signature →
band → bucket self-join → exact-jaccard verify), SimHash signatures, blocked
n-gram Jaccard, and embedding-cosine near-dup — the standard toolkit for
dedup on web-scale corpora (Lee et al. 2021 "Deduplicating Training Data
Makes Language Models Better"; Broder 1997 resemblance sketches).

Scale design (100 TB / 1000 executors)
--------------------------------------
- Signatures (shingle sets, minhash arrays, simhash) are *per-row array
  expressions*: computed inside WholeStageCodegen at scan speed, no explode
  of the shingle space, no Python.
- The only wide operation in MinHash-LSH is the band-bucket self-join: rows
  shuffle on (band_idx, band_key) — cardinality = n_docs × n_bands, and the
  join fan-out is bounded by bucket size (near-dup cluster size), not by
  n_docs². Pathological clusters (boilerplate pages) produce hot keys →
  enable AQE skew-join or cap bucket size with a count filter before the
  self-join (`max_bucket` parameter).
- Exact-jaccard verification joins candidate pairs back to the shingle sets
  (two co-partitioned hash joins on doc_id) — candidates are rare, so this
  stage is tiny compared to the scan.
- Blocked n-gram Jaccard / cosine dedup do O(block²) work *within* blocks
  only; block keys (source, label, LSH bucket) keep blocks O(10³) rows, so
  a block never exceeds one task.

Determinism: minhash permutations are fixed (a_j·x + b_j) mod P with
hard-seeded constants; the 60-bit base hash is md5-derived (datapipe.text);
all jaccards are int/int divisions.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1: keeps (a·x + b) products inside int64.
MINHASH_P = 2_147_483_647
#: 12 minhashes in 4 bands of 3 — tuned so a 0.9-jaccard pair collides with
#: p≈1-(1-0.9³)⁴≈0.995 while a 0.02-jaccard pair collides with p≈3e-5.
MINHASH_K = 12
MINHASH_BAND_ROWS = 3
MINHASH_BANDS = MINHASH_K // MINHASH_BAND_ROWS
#: word-shingle width for the resemblance set.
SHINGLE_W = 3
#: char n-gram width for blocked Jaccard.
NGRAM_W = 4
#: simhash signature bits.
SIMHASH_BITS = 32

_rng = random.Random(20260813)
#: fixed universal-hash coefficients shared by the Spark operator and the SQL
#: oracle generator (regenerating with the same seed is part of the contract).
MINHASH_COEF: list[tuple[int, int]] = [
    (_rng.randrange(1, MINHASH_P), _rng.randrange(0, MINHASH_P))
    for _ in range(MINHASH_K)
]


# ----------------------------------------------------------- shared pieces
def _hash60_sql_expr(s: str) -> str:
    """Spark SQL text of the shared 60-bit hash (datapipe.text.shared_hash60)."""
    return f"cast(conv(substr(md5({s}), 1, 15), 16, 10) as bigint)"


def shingle_set(text_col: str = "text", w: int = SHINGLE_W) -> Column:
    """Distinct word-w-shingles as an array column (per-row, no explode).

    The tokenization is bound ONCE per row via a single-element
    ``transform(array(split(..)), tk -> ..)`` wrapper: Spark does not
    hoist lambda-invariant subexpressions out of higher-order functions,
    so the naive ``i -> slice(split(text), i, w)`` form re-ran the full
    regex split once per shingle position — O(L²) per row (measured 4.4×
    slower at sf0.1; r16 optimization round).  Same values bit-for-bit.
    """
    return F.expr(
        f"array_distinct(element_at(transform(array(split({text_col}, ' ')),"
        f" tk -> transform(sequence(1, greatest(size(tk) - {w - 1}, 1)),"
        f"   i -> array_join(slice(tk, i, {w}), ' '))), 1))"
    )


def shingle_hashes(sh_col: str = "sh") -> Column:
    """60-bit hash of each shingle, pre-reduced mod P for the permutations."""
    return F.expr(
        f"transform({sh_col}, s -> {_hash60_sql_expr('s')} % {MINHASH_P}L)"
    )


def minhash_signature(h_col: str = "hs") -> Column:
    """Array of K minhash values: min over (a_j·x + b_j) mod P."""
    mins = ", ".join(
        f"array_min(transform({h_col}, x -> ({a}L * x + {b}L) % {MINHASH_P}L))"
        for a, b in MINHASH_COEF
    )
    return F.expr(f"array({mins})")


def band_keys(mh_col: str = "mh") -> Column:
    """Concatenated minhash values per band: array of MINHASH_BANDS strings."""
    r = MINHASH_BAND_ROWS
    keys = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"element_at({mh_col}, {band * r + row + 1})" for row in range(r))
        + ")"
        for band in range(MINHASH_BANDS)
    )
    return F.expr(f"array({keys})")


# ------------------------------------------------------------- exact dedup
def exact_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5 content-hash groups with keeper = min(doc_id).

    One hash-shuffle on a 32-char key; at scale this is the cheapest and
    first dedup pass (bitwise duplicates dominate crawl corpora)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


# ----------------------------------------------------------- minhash + LSH
def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    max_bucket: int | None = None,
    release: bool = False,
) -> DataFrame:
    """MinHash-LSH candidate pairs verified with exact shingle Jaccard.

    Returns (doc_a, doc_b, jaccard) for every pair sharing ≥1 LSH band,
    doc_a < doc_b, with the *exact* resemblance attached. Callers filter on
    jaccard for their dedup threshold.

    ``max_bucket`` caps band-bucket size: a bucket of n rows fans out
    n(n-1)/2 candidate pairs, so one boilerplate cluster (every page sharing
    a template) turns the self-join quadratic. Oversized buckets are dropped
    *before* the join — the count rides a window over the same
    (band_idx, band_key) partitioning the join shuffles on, so the cap adds
    no extra shuffle. Pairs inside a dropped bucket still surface through
    any of their other, smaller bands; buckets that exceed a sane cap
    (10³-10⁴) are near-identical boilerplate already collapsed by
    :func:`exact_groups` in a pipeline. Default None preserves exhaustive
    candidates for the oracle gate.

    The signature relation is persisted: it feeds both sides of the band
    self-join plus two verification joins, and without materialization
    Spark recomputes the md5+minhash subtree once per branch (measured 4×
    at sf0.1). This is the "build the LSH index once" step — at 100 TB it
    becomes an intermediate table (checkpoint / staged parquet), not an
    in-memory cache. Cache lifetime: CacheManager dedups identical plans,
    so repeat calls over the same corpus share one entry; distinct corpora
    each add one until LRU eviction — clear with
    ``spark.catalog.clearCache()`` between corpora in long-lived sessions.
    ``release=True`` instead eagerly materializes the pair relation and
    unpersists the signatures before returning (the ``release_after``
    contract) — REQUIRED for repeated calls over *distinct* inputs in one
    long-lived session, e.g. the streaming ingest sink's per-micro-batch
    within-batch dedup, where each batch's distinct plan would otherwise
    add a cache entry that lives for the whole query (r9 ADVICE; the same
    leak ``minhash_candidates_incremental`` already guards against).
    """
    sigs = (
        df.select("doc_id", shingle_set(text_col).alias("sh"))
        .withColumn("hs", shingle_hashes("sh"))
        .withColumn("mh", minhash_signature("hs"))
        .withColumn("bands", band_keys("mh"))
        .select("doc_id", "sh", "bands")
        .persist()
    )
    buckets = sigs.select(
        "doc_id",
        F.posexplode("bands").alias("band_idx", "band_key"),
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        buckets = (
            buckets.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("__bucket_n") <= max_bucket)
            .drop("__bucket_n")
        )
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sh = sigs.select("doc_id", "sh")
    pairs = cand.join(
        sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"),
        "doc_a",
    ).join(
        sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"),
        "doc_b",
    )
    out = pairs.select(
        "doc_a",
        "doc_b",
        (
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b"))
        ).alias("jaccard"),
    )
    if release:
        from project_obsidian_core_spark.functions.cache import release_after

        return release_after(out, sigs)
    return out


def minhash_containment_pairs(
    df: DataFrame, text_col: str = "text", max_bucket: int | None = None
) -> DataFrame:
    """Directed shingle containment over MinHash-LSH candidate pairs — the
    scale path for the asymmetric (short-doc-inside-long-doc) near-dup
    rule.

    :func:`ngram_containment_pairs` scores all pairs inside a fixed block
    — right for pre-blocked corpora, quadratic in block size. This variant
    draws candidates from the LSH band buckets instead (the same
    ``max_bucket``-guarded machinery as :func:`minhash_candidates`), so the
    pair count is bounded by bucket geometry, not corpus shape, and the
    signature relation is built once. Containment is exact ppm integers on
    the verified word-shingle sets.
    """
    sigs = (
        df.select("doc_id", shingle_set(text_col).alias("sh"))
        .withColumn("hs", shingle_hashes("sh"))
        .withColumn("mh", minhash_signature("hs"))
        .withColumn("bands", band_keys("mh"))
        .select("doc_id", "sh", "bands")
        .persist()
    )
    buckets = sigs.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_key")
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        buckets = (
            buckets.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("__bucket_n") <= max_bucket)
            .drop("__bucket_n")
        )
    cand = (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sh = sigs.select("doc_id", "sh")
    pairs = cand.join(
        sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"),
        "doc_a",
    ).join(
        sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"),
        "doc_b",
    )
    out = pairs.select(
        "doc_a",
        "doc_b",
        F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("n_inter"),
        F.size("sh_a").cast("long").alias("n_a"),
        F.size("sh_b").cast("long").alias("n_b"),
    ).select(
        "doc_a",
        "doc_b",
        F.expr("(n_inter * 1000000L) div n_a").alias("cont_a_ppm"),
        F.expr("(n_inter * 1000000L) div n_b").alias("cont_b_ppm"),
        F.greatest(
            F.expr("(n_inter * 1000000L) div n_a"),
            F.expr("(n_inter * 1000000L) div n_b"),
        ).alias("cont_max_ppm"),
    )
    from project_obsidian_core_spark.functions.cache import release_after

    return release_after(out, sigs)


def minhash_candidates_incremental(
    df: DataFrame,
    new_col: str = "is_new",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental near-dup detection: each NEW document's MinHash-LSH
    matches against the EXISTING corpus — the daily-ingest pattern (dedup
    today's crawl against the accumulated corpus without re-pairing the
    corpus with itself).

    Returns (doc_new, doc_old, jaccard) for every (new, existing) pair
    sharing ≥1 band. Plan: one signature pass over the union (at scale the
    existing side's signatures are the staged LSH index table, read not
    recomputed), then a band equi-join whose LEFT side is only the new
    batch — the join output is |new|-bounded, never corpus². Same
    ``max_bucket`` guard as :func:`minhash_candidates`.
    """
    sigs = (
        df.select("doc_id", F.col(new_col).alias("_new"), shingle_set(text_col).alias("sh"))
        .withColumn("hs", shingle_hashes("sh"))
        .withColumn("mh", minhash_signature("hs"))
        .withColumn("bands", band_keys("mh"))
        .select("doc_id", "_new", "sh", "bands")
        .persist()
    )
    buckets = sigs.select(
        "doc_id", "_new", F.posexplode("bands").alias("band_idx", "band_key")
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_key")
        buckets = (
            buckets.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("__bucket_n") <= max_bucket)
            .drop("__bucket_n")
        )
    new_b = buckets.filter(F.col("_new")).drop("_new")
    old_b = buckets.filter(~F.col("_new")).drop("_new")
    cand = (
        new_b.alias("a")
        .join(
            old_b.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(
            F.col("a.doc_id").alias("doc_new"),
            F.col("b.doc_id").alias("doc_old"),
        )
        .distinct()
    )
    sh = sigs.select("doc_id", "sh")
    out = (
        cand.join(
            sh.withColumnRenamed("doc_id", "doc_new").withColumnRenamed("sh", "sh_a"),
            "doc_new",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_old").withColumnRenamed("sh", "sh_b"),
            "doc_old",
        )
        .select(
            "doc_new",
            "doc_old",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    # the persisted signature relation would otherwise outlive the call:
    # the streaming ingest sink invokes this once per micro-batch with a
    # fresh plan each time (the corpus chain grows), so cached entries
    # accumulate for the life of the query without this release
    from project_obsidian_core_spark.functions.cache import release_after

    return release_after(out, sigs)


# ----------------------------------------------------------------- simhash
def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document SIMHASH_BITS-bit SimHash over distinct token hashes.

    bit b is set iff the majority of token hashes have bit b set (the
    +1/-1 vote of Charikar 2002 with unit weights). Pure per-row expression
    generated as SIMHASH_BITS filtered-count terms.
    """
    d = df.select(
        "doc_id",
        F.expr(
            f"transform(array_distinct(split({text_col}, ' ')), "
            f"s -> {_hash60_sql_expr('s')} % 4294967296L)"
        ).alias("_h"),
    )
    n = F.size("_h")
    terms = []
    for b in range(SIMHASH_BITS):
        cnt = F.expr(f"size(filter(_h, x -> (x div {2**b}L) % 2 = 1))")
        terms.append(F.when(cnt * 2 > n, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long")))
    sim = terms[0]
    for t in terms[1:]:
        sim = sim + t
    return d.select("doc_id", n.cast("long").alias("n_tokens"), sim.alias("simhash"))


# -------------------------------------------------- blocked n-gram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str = "source",
    text_col: str = "text",
    w: int = NGRAM_W,
    max_block: int | None = None,
    hashed_grams: bool = False,
) -> DataFrame:
    """Exact char-n-gram Jaccard for all pairs *within* a block.

    The block key bounds the quadratic term; at scale the block is an LSH
    bucket or a crawl shard, never the whole corpus. ``max_block`` is the
    guard rail for when it isn't: blocks above the cap are dropped before
    the self-join (same co-partitioned window trick as
    :func:`minhash_candidates`'s ``max_bucket``) — re-block oversized
    groups on a finer key instead of letting one block go O(n²).

    ``hashed_grams=True`` intersects xxhash64-hashed gram sets (int64
    arrays) instead of string arrays — the pairwise intersections are the
    entire cost of this operator, and primitive-long set probes cut the
    sf0.1 wall 2x on top of the union-free identity below (55.5 → 13.9 s
    total; bench round 7). Scores are identical unless two distinct grams
    collide in 64 bits (~2⁻⁶⁴ per pair-union — negligible, but the
    string path remains the default for the exactness-critical gate).

    r17: the hashed path computes the intersections in a ``mapInArrow``
    stage (guide §4.2 — hand whole Arrow batches to vectorized native
    code) instead of per-pair ``array_intersect``: Spark's expression
    boxes every long into an ``OpenHashSet[Any]`` probe (~25 µs per
    ~300-element pair — the r16 probes put the JVM expression floor at
    ~15.5 s for the sf0.1 pair population, with HOF merge loops 7x worse).

    The unit of work shipped to Python is a CHUNK PAIR, not a doc pair:
    docs hash into ``NGRAM_CHUNK_K`` chunks per block, chunks join on the
    block key (c_x <= c_y), and one numpy matmul per chunk-pair row
    computes the whole |X|x|Y| intersection grid at once.  A first r17
    attempt shipped the two gram arrays per PAIR row and regressed 3x
    (15.9 -> 46 s): the pair fan-out duplicates every doc's grams
    O(block) times across the Arrow boundary (~2.9 GB at sf0.1), and
    the transfer — not the intersection — becomes the cost.  Chunk-pair
    grouping ships each doc's grams exactly K times (~50 MB), keeps the
    quadratic spread over blocks x C(K+1,2) tasks (the join fan-out's
    parallelism, unlike a per-block fold), and bounds per-task memory by
    the chunk size, not the block size.  The pair set, scores, and
    output rows are identical — the string twin's unit test pins
    hashed == string bit-exactly.
    """
    gram_of = (
        f"xxhash64(substring({text_col}, i, {w}))"
        if hashed_grams
        else f"substring({text_col}, i, {w})"
    )
    grams = F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(length({text_col}) - {w - 1}, 1)),"
        f"  i -> {gram_of}))"
    )
    t = df.select("doc_id", F.col(block_col).alias("block"), grams.alias("gr"))
    if max_block is not None:
        from pyspark.sql import Window

        wnd = Window.partitionBy("block")
        t = (
            t.withColumn("__block_n", F.count(F.lit(1)).over(wnd))
            .filter(F.col("__block_n") <= max_block)
            .drop("__block_n")
        )
    if hashed_grams:
        import pyspark.sql.types as ST

        cg = (
            t.withColumn(
                "c", F.expr(f"pmod(xxhash64(doc_id), {NGRAM_CHUNK_K})")
            )
            .groupBy("block", "c")
            .agg(
                # sort_array keeps the doc->grams alignment deterministic
                # (struct sort compares doc_id first)
                F.expr("sort_array(collect_list(struct(doc_id, gr)))").alias(
                    "ds"
                )
            )
        )
        cp = (
            cg.alias("x")
            .join(
                cg.alias("y"),
                (F.col("x.block") == F.col("y.block"))
                & (F.col("x.c") <= F.col("y.c")),
            )
            .select(
                F.col("x.block").alias("block"),
                (F.col("x.c") == F.col("y.c")).alias("same_chunk"),
                F.col("x.ds").alias("xs"),
                F.col("y.ds").alias("ys"),
            )
        )
        out_schema = ST.StructType(
            [
                ST.StructField("block", t.schema["block"].dataType),
                ST.StructField("doc_a", t.schema["doc_id"].dataType),
                ST.StructField("doc_b", t.schema["doc_id"].dataType),
                ST.StructField("jaccard", ST.DoubleType()),
            ]
        )
        return cp.mapInArrow(_chunk_pair_jaccard_arrow, schema=out_schema)
    # |A∪B| = |A| + |B| − |A∩B| (the gram arrays are already distinct):
    # one intersection per pair and three int sizes — never materializing
    # the union ARRAY, which copied ~|A|+|B| strings per pair and made
    # this the most expensive query in the suite (55.5 s → 9.9 s at
    # sf0.1, 623k pairs; bench round 7)
    inter = F.size(F.array_intersect("a.gr", "b.gr"))
    return (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                inter.cast("double")
                / (F.size("a.gr") + F.size("b.gr") - inter)
            ).alias("jaccard"),
        )
    )


#: chunks per block for the hashed-gram pair kernel: each doc's grams cross
#: the Arrow boundary exactly K times, per-task memory is bounded by the
#: CHUNK size (block/K docs), and the block's quadratic spreads over
#: C(K+1, 2) independent chunk-pair tasks.
NGRAM_CHUNK_K = 8


def _chunk_side(col, r):
    """Unpack one row's doc array: (doc_ids int64[], gram lengths int64[],
    flat grams int64[])."""
    import numpy as np
    import pyarrow.compute as pc

    docs = col.slice(r, 1).flatten()  # StructArray of this row's docs
    ids = docs.field("doc_id").to_numpy()
    gr = docs.field("gr")
    lens = pc.list_value_length(gr).to_numpy().astype(np.int64)
    flat = gr.flatten().to_numpy()
    return ids, lens, flat


def _chunk_pair_jaccard_arrow(batches):
    """``mapInArrow`` kernel for the chunk-pair relation
    (block, same_chunk, xs, ys) → (block, doc_a, doc_b, jaccard).

    Per row: index the union of both sides' gram hashes (``np.unique``),
    scatter each side into a docs x grams 0/1 matrix, and one sgemm
    (``X @ Y.T``) yields EVERY pair's exact intersection count — counts
    are ≤ |grams| < 2²⁴ so float32 accumulation is exact.  Same-chunk
    rows keep the strict upper triangle (ds is doc_id-sorted, so i < j
    ⟺ doc_id_i < doc_id_j); cross-chunk rows keep the full grid with
    (doc_a, doc_b) = (min, max).  The score is the same IEEE double
    division ``inter / (|A| + |B| − inter)`` the JVM expression
    performed — bit-identical output (unit-pinned against the
    string-gram path); the divisor is never 0 because every doc has ≥ 1
    gram (the ``greatest(..., 1)`` floor upstream)."""
    import numpy as np
    import pyarrow as pa

    for rb in batches:
        if rb.num_rows == 0:
            continue
        blocks = rb.column(0)
        same = rb.column(1).to_numpy(zero_copy_only=False)
        out_blk, out_a, out_b, out_j = [], [], [], []
        for r in range(rb.num_rows):
            xd, xl, xf = _chunk_side(rb.column(2), r)
            yd, yl, yf = _chunk_side(rb.column(3), r)
            if not len(xd) or not len(yd):
                continue
            uniq, inv = np.unique(
                np.concatenate([xf, yf]), return_inverse=True
            )
            xm = np.zeros((len(xd), uniq.size), dtype=np.float32)
            xm[np.repeat(np.arange(len(xd)), xl), inv[: len(xf)]] = 1.0
            if same[r]:
                ym, yd2, yl2 = xm, xd, xl
            else:
                ym = np.zeros((len(yd), uniq.size), dtype=np.float32)
                ym[np.repeat(np.arange(len(yd)), yl), inv[len(xf):]] = 1.0
                yd2, yl2 = yd, yl
            inter = (xm @ ym.T).astype(np.int64)
            if same[r]:
                ii, jj = np.triu_indices(len(xd), k=1)
            else:
                ii, jj = np.indices((len(xd), len(yd2)))
                ii, jj = ii.ravel(), jj.ravel()
            da, db = xd[ii], yd2[jj]
            lo = np.minimum(da, db)
            hi = np.maximum(da, db)
            iv = inter[ii, jj]
            jac = iv / (xl[ii] + yl2[jj] - iv)
            out_blk.append(
                pa.array([blocks[r].as_py()] * len(lo), type=blocks.type)
            )
            out_a.append(lo)
            out_b.append(hi)
            out_j.append(jac)
        if not out_a:
            continue
        yield pa.RecordBatch.from_arrays(
            [
                pa.concat_arrays(out_blk),
                pa.array(np.concatenate(out_a)),
                pa.array(np.concatenate(out_b)),
                pa.array(np.concatenate(out_j), type=pa.float64()),
            ],
            names=["block", "doc_a", "doc_b", "jaccard"],
        )


def ngram_containment_pairs(
    df: DataFrame,
    block_col: str = "source",
    text_col: str = "text",
    w: int = NGRAM_W,
    max_block: int | None = None,
) -> DataFrame:
    """Directed n-gram containment within a block: how much of each doc's
    shingle set lies inside the other's.

    Containment (|A∩B| / |A|) catches the asymmetric near-dup Jaccard
    misses: a short document pasted inside a long one scores ~1.0 from the
    short side while its Jaccard stays near |A|/|B|. This is the dedup rule
    for quote-inclusion / boilerplate-wrapping cases a pretraining corpus
    is full of.

    Same scale story as :func:`ngram_jaccard_pairs`: the block key bounds
    the quadratic, ``max_block`` guards hot blocks, shingle sets are built
    once per row at scan. Output adds exact parts-per-million integer
    scores (hash-stable) for both directions.
    """
    grams = F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(length({text_col}) - {w - 1}, 1)),"
        f"  i -> substring({text_col}, i, {w})))"
    )
    t = df.select("doc_id", F.col(block_col).alias("block"), grams.alias("gr"))
    if max_block is not None:
        from pyspark.sql import Window

        wnd = Window.partitionBy("block")
        t = (
            t.withColumn("__block_n", F.count(F.lit(1)).over(wnd))
            .filter(F.col("__block_n") <= max_block)
            .drop("__block_n")
        )
    inter = F.size(F.array_intersect("a.gr", "b.gr")).cast("long")
    return (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("n_inter"),
            F.size("a.gr").cast("long").alias("n_a"),
            F.size("b.gr").cast("long").alias("n_b"),
        )
        .select(
            "block",
            "doc_a",
            "doc_b",
            F.expr("(n_inter * 1000000L) div n_a").alias("cont_a_ppm"),
            F.expr("(n_inter * 1000000L) div n_b").alias("cont_b_ppm"),
        )
    )


# ------------------------------------------------- embedding cosine dedup
def embedding_cosine_pairs(
    emb: DataFrame, block_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Blocked pairwise cosine similarity over an embedding column.

    Norms are computed once per vector at scan (not per pair); the block
    join is the only shuffle. Output: (block, vec_a, vec_b, cos_sim).
    """
    from project_obsidian_core_spark.datapipe import vectors as V

    t = emb.select(
        "vec_id",
        F.col(block_col).alias("block"),
        F.col(vec_col).alias("v"),
        V.norm(F.col(vec_col)).alias("nrm"),
    )
    return (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            V.cosine_prenormed(
                V.dot(F.col("a.v"), F.col("b.v")), F.col("a.nrm"), F.col("b.nrm")
            ).alias("cos_sim"),
        )
    )


# --------------------------------------------- dedup cluster assignment ---
def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 20
) -> DataFrame:
    """Transitive near-dup clusters: min-label propagation over the
    candidate-pair graph. Returns (doc_id, cluster) where cluster is the
    smallest doc_id reachable through pairs — the canonical keeper.

    Driver-coordinated iteration (one shuffle per round, rounds = graph
    diameter): near-dup components are shallow (boilerplate clusters are
    star-shaped), so this converges in a handful of rounds. For web-scale
    graphs with long chains, use :func:`connected_components_ls`
    (large-star/small-star, Kiveris et al. 2014) — provably O(log² n)
    rounds regardless of diameter.

    Each round's labels are **localCheckpoint**ed: persist alone truncates
    recomputation but not the logical plan, and an iterated join lineage
    doubles per round until plan rendering itself OOMs. Checkpointing cuts
    the lineage at every iteration (use a reliable `checkpoint()` on a real
    cluster for executor-loss tolerance).

    Convergence detection is folded into the label update: the new-label
    projection carries a ``changed`` flag, so the per-round driver action
    is a scan-only aggregate over the just-checkpointed partitions — no
    extra join against the previous labels.
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().persist()
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("nl")), "b"
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nmin"))
            .select(F.col("a").alias("node"), "nmin")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                    "new_label"
                ),
                (F.coalesce("nmin", F.col("label")) < F.col("label")).alias("changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.agg(F.sum(F.col("changed").cast("long"))).first()[0]
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if not changed:
            break
    # labels are checkpoint-backed, so the edge cache is no longer referenced
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster"))


def _symmetric(edges: DataFrame) -> DataFrame:
    """Undirected closure of an (a, b) edge relation, self-loops dropped."""
    fwd = edges.filter(F.col("a") != F.col("b"))
    return fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. 2014, Alg. 2).

    For each node u with neighborhood Γ(u): connect every LARGER neighbor
    v > u to m = min(Γ(u) ∪ {u}). Input must be the symmetric closure;
    output is a directed (child > parent is NOT guaranteed mid-stream)
    edge list with self-loops removed.
    """
    m = edges.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        edges.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges larger→smaller, then for each node u
    connect all of its smaller neighbors (and u itself) to their minimum."""
    oriented = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    m = oriented.groupBy("a").agg(F.min("b").alias("m"))
    out = (
        oriented.join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(m.select(F.col("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return out


def connected_components_ls(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Web-scale connected components via alternating large-star /
    small-star rounds (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond"). Returns (doc_id, cluster) with cluster = the
    component's minimum doc_id — identical contract (and results) to
    :func:`connected_components`.

    Why this exists alongside min-label propagation: label propagation
    needs `diameter` rounds, so a 10⁶-node path graph needs 10⁶ shuffles.
    Large-star/small-star contracts long chains geometrically —
    **O(log² n) rounds on any graph** — at the cost of rewriting the edge
    list (same asymptotic shuffle volume per round). Use it when
    candidate-pair graphs may chain (tile/substring dedup, transitive
    boilerplate), keep plain propagation for shallow star-shaped graphs.

    Convergence: at the fixed point every component is a star centered at
    its minimum; a round that changes nothing leaves the edge fingerprint
    (count + order-independent xxhash64 sum) unchanged, which is the
    per-round driver check — one scan-only aggregate over checkpointed
    edges, no join-based diff. Each round localCheckpoints to cut the
    iterated-join lineage (reliable checkpoint on a real cluster).
    """
    base = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # isolated self-pairs (a == b) contribute a node but no edge
    nodes = (
        base.select(F.col("a").alias("node"))
        .union(base.select(F.col("b").alias("node")))
        .distinct()
        .persist()
    )
    edges = _symmetric(base).localCheckpoint()
    prev_fp: tuple[int, int] | None = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star reasons about full neighborhoods, so re-symmetrize the
        # (directed) small-star output at the top of every round
        edges = _small_star(_large_star(_symmetric(edges))).localCheckpoint()
        # bit_xor, not sum: order-independent, immune to ANSI overflow, and
        # exact on a distinct edge set
        fp_row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
        ).first()
        fp = (fp_row["n"], fp_row["h"])
        if fp == prev_fp:
            break
        prev_fp = fp
    if stats is not None:
        stats["rounds"] = rounds
    # at convergence edges are (child, center) star edges; centers and
    # isolated nodes label themselves
    labels = edges.select(F.col("a").alias("node"), F.col("b").alias("cluster"))
    out = (
        nodes.join(labels, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("cluster", F.col("node")).alias("cluster"),
        )
    )
    from project_obsidian_core_spark.functions.cache import release_after

    return release_after(out, nodes)


#: simhash pairing: band count and the Hamming-distance acceptance radius.
#: 4 bands of 8 bits guarantee (pigeonhole) that any pair within Hamming 3
#: shares at least one intact band — recall 1.0 at the chosen radius.
SIMHASH_BANDS = 4
SIMHASH_HAMMING_MAX = 3


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    hamming_max: int = SIMHASH_HAMMING_MAX,
    max_bucket: int | None = None,
    staged: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash: band-bucketed candidate join, then an
    exact popcount filter ``bit_count(a XOR b) <= hamming_max``.

    The MinHash complement: SimHash buckets catch small *bit-level* drifts
    (token swaps barely move the majority vote) where MinHash needs shingle
    overlap. Plan shape mirrors minhash_candidates: explode to
    (band_idx, band_val) keys, equi-self-join within buckets (quadratic
    only in bucket size, guarded by ``max_bucket``), distinct, popcount.

    ``staged`` (r17): both self-join sides derive from the signature
    relation, and Spark duplicates the subtree — the 32-term majority-vote
    signature build ran TWICE (plan evidence: 2 ``split`` sites, 4
    document scans).  The default persists ``sigs`` and releases it via
    :func:`functions.cache.release_after` (the prefix/minhash pattern);
    ``staged=False`` keeps the lazy plan for inspection.
    """
    bits = SIMHASH_BITS // SIMHASH_BANDS
    sigs = simhash_signatures(df, text_col).select("doc_id", "simhash")
    if staged:
        sigs = sigs.persist()
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(f"(simhash div {2 ** (bits * b)}L) % {2 ** bits}L").alias(
                            "band_val"
                        ),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band_idx", "bk.band_val")
    if max_bucket is not None:
        sizes = bands.groupBy("band_idx", "band_val").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        bands = bands.join(
            F.broadcast(sizes.filter(F.col("_bn") <= max_bucket)),
            ["band_idx", "band_val"],
        ).drop("_bn")
    a = bands.select(
        F.col("band_idx"),
        F.col("band_val"),
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
    )
    b = bands.select(
        F.col("band_idx"),
        F.col("band_val"),
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
    )
    cands = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    hamming = F.bit_count(F.expr("sim_a ^ sim_b"))
    out = (
        cands.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= hamming_max)
        .select("doc_a", "doc_b", "hamming")
    )
    if staged:
        from project_obsidian_core_spark.functions.cache import release_after

        return release_after(out, sigs)
    return out


def embedding_lsh_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
    dim: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding near-dup candidate pairs blocked by SIGN-LSH bucket —
    the label-free scale path of :func:`embedding_cosine_pairs` (label
    blocking presumes a label exists; a raw crawl corpus has none).

    Buckets come from the parameterized hash geometry
    (similarity.lsh_bucket): near-identical vectors agree on every
    hyperplane sign, so true near-dups share a bucket with high
    probability while the pair space is bucket-quadratic, not
    corpus-quadratic. ``bits`` sizes the buckets (round-6 rule:
    bits ≈ log2(corpus / target_bucket)); ``max_bucket`` drops
    pathological buckets the same way the MinHash band guard does.
    Output matches embedding_cosine_pairs: (block, vec_a, vec_b,
    cos_sim) with block = bucket id.
    """
    from project_obsidian_core_spark.datapipe import similarity as S
    from project_obsidian_core_spark.datapipe import vectors as V

    t = emb.select(
        "vec_id",
        S.lsh_bucket(vec_col, bits, dim).alias("block"),
        F.col(vec_col).alias("v"),
        V.norm(F.col(vec_col)).alias("nrm"),
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("block")
        t = (
            t.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("__bucket_n") <= max_bucket)
            .drop("__bucket_n")
        )
    return (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.block").alias("block"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            V.cosine_prenormed(
                V.dot(F.col("a.v"), F.col("b.v")), F.col("a.nrm"), F.col("b.nrm")
            ).alias("cos_sim"),
        )
    )


# ------------------------------------------------------- LSH recall audit --
def lsh_recall(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.1,
    max_eval: int = 1000,
) -> DataFrame:
    """Sampled recall audit of MinHash-LSH candidate generation against
    the EXACT all-pairs ground truth — the companion measurement to the
    band/row geometry choice (the S-curve says what recall *should* be;
    this measures what it *is* on your corpus).

    The all-pairs truth join is a deliberate bounded quadratic: recall
    evaluation is a SAMPLED audit over ≤~10³ documents (the broadcast
    nested-loop below is the honest plan for an inequality pair join at
    that size), never a full-corpus pass — at 100 TB you audit a random
    slice per ingest batch and trend the ppm. Found pairs are already
    exact-verified (minhash_candidates attaches true Jaccard), so found
    ⊆ truth and the report is pure counting: one row,
    (n_truth, n_found, n_missed, recall_ppm), all exact ints.

    ``max_eval`` is the operator-level guard the other quadratic-prone
    operators here already carry (``max_bucket`` / ``max_block`` /
    ``check_capacity``): the audit RAISES rather than silently running
    an all-pairs join over an unbounded corpus a caller forgot to
    sample. Pass a larger value deliberately if you mean it.
    """
    n_docs = df.count()
    if max_eval is not None and n_docs > max_eval:
        raise ValueError(
            f"lsh_recall: {n_docs} documents exceeds max_eval={max_eval}; "
            "the exact all-pairs truth join is quadratic. Audit a sampled "
            "slice instead (e.g. df.filter(...) / df.sample(...) down to "
            "~10^3 docs, trending recall_ppm per batch), or raise "
            "max_eval explicitly if the quadratic is intended."
        )
    sh = df.select("doc_id", shingle_set(text_col).alias("sh"))
    if threshold > 0:
        # Bucket-fold truth (r16 optimization round): any pair with
        # J >= threshold > 0 shares at least one shingle, so the exact
        # intersection size per qualifying pair is a COUNT over the
        # per-shingle doc buckets — Σ_s C(df_s, 2) pair emissions
        # (measured 50k vs the 499,500 boxed array_intersect calls of
        # the all-pairs nested-loop at the 1000-doc sf0.1 sample; truth
        # wall 22.6 s → ~1 s).  String-exact: the fold groups by the
        # shingle STRING, no hashing anywhere, identical jacc doubles.
        # Worst case (near-identical corpus) degrades to the same
        # quadratic the all-pairs form always paid — max_eval above is
        # the guard either way.
        ex = sh.select(
            "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("s")
        )
        buckets = ex.groupBy("s").agg(
            F.collect_list(F.struct("doc_id", "n")).alias("ds")
        )
        # r17 (ADVICE): posexplode each bucket element before pairing so a
        # bucket shared by the whole audit sample materializes ≤ B structs
        # per row instead of one C(B,2) array — per-row memory O(B), same
        # pairs, same task-local compute (max_eval stays the work bound)
        co = (
            buckets.select("ds", F.posexplode("ds").alias("i", "x"))
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(ds, i + 2, size(ds)), y ->"
                        "  struct(least(x.doc_id, y.doc_id) AS doc_a,"
                        "         greatest(x.doc_id, y.doc_id) AS doc_b,"
                        "         x.n + y.n AS n_sum))"
                    )
                ).alias("p")
            )
            .groupBy("p.doc_a", "p.doc_b", "p.n_sum")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        truth = co.select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("n_sum") - F.col("inter"))
            ).alias("jacc"),
        ).filter(F.col("jacc") >= threshold)
    else:
        # threshold 0 means zero-overlap pairs qualify too — only the
        # all-pairs join can enumerate those
        a, b = sh.alias("a"), sh.alias("b")
        inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
        union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
        pairs = a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        truth = pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union).alias("jacc"),
        ).filter(F.col("jacc") >= threshold)
    found = (
        minhash_candidates(df, text_col=text_col)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", F.col("doc_b").alias("f_b"))
    )
    joined = truth.join(
        found,
        (truth.doc_a == found.doc_a) & (truth.doc_b == found.f_b),
        "left",
    ).select(truth.doc_a, truth.doc_b, found.f_b)
    return (
        joined.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("f_b").alias("n_found"),
        )
        .select(
            "n_truth",
            "n_found",
            (F.col("n_truth") - F.col("n_found")).alias("n_missed"),
            F.expr("n_found * 1000000 div n_truth").alias("recall_ppm"),
        )
    )


# ------------------------------------------- prefix-filter exact join --
def prefix_filter_pairs(
    df: DataFrame,
    threshold_ppm: int = 600_000,
    text_col: str = "text",
    w: int = SHINGLE_W,
    max_bucket: int = 4096,
    staged: bool = True,
) -> DataFrame:
    """EXACT-COMPLETE threshold Jaccard self-join via prefix filtering
    (SSJoin, Chaudhuri et al. ICDE'06 / PPJoin, Xiao et al. WWW'08) —
    every pair with shingle Jaccard >= threshold, no blocking column, no
    LSH recall loss.

    This is the exactness counterpart to :func:`minhash_candidates` on
    the SAME word-``w``-shingle space: LSH trades recall for scan-bounded
    cost (the S-curve misses borderline pairs; `lsh_recall` measures it);
    the prefix filter is *provably complete*.  Completeness: order every
    shingle set by one global total order (document frequency ascending,
    ties lexicographic — any total order works, rarest-first minimizes
    candidates).  If J(A,B) >= t then |A∩B| >= ceil(t·|A|) (Jaccard >= t
    bounds the intersection from below by t·union >= t·|A|), so the
    globally-smallest shared shingle cannot hide in A's last
    ceil(t·|A|)-1 positions — it sits inside A's first
    |A| - ceil(t·|A|) + 1 shingles (the *prefix*), and symmetrically
    inside B's.  Candidates = pairs sharing >= 1 *prefix* shingle.

    Scale (100 TB): the only exploded relation is the PREFIX (a
    (1-t)-fraction of each set); the candidate self-join shuffles on
    shingle, and because prefixes hold each document's globally RAREST
    shingles, bucket sizes are bounded by the document frequency of rare
    shingles — the frequency ordering is itself the skew mitigation (a
    boilerplate shingle shared by 10^6 docs is almost never in anyone's
    prefix).  Measured at sf0.01/t=0.6: 116 candidates vs 124,750
    all-pairs (1000x), all 25 true pairs found (= brute-force ground
    truth).  The size filter t·max(|A|,|B|) <= min(|A|,|B|) prunes
    before the verify; verification is two co-partitioned hash joins on
    doc_id + one array intersection per surviving candidate.  All
    arithmetic is exact int64 (ppm scores, ceil via (a+b-1) div b).

    ``max_bucket`` (r17): execution-time cap on the per-prefix-token
    bucket size.  The in-bucket pair comprehension is quadratic in the
    bucket, and the rarest-first ordering bounds it only statistically —
    an oversized bucket now fails loudly with re-blocking/salting
    guidance instead of silently degrading to a single-task quadratic.

    ``staged`` (r17): the shingle relation feeds FOUR branches of one
    plan (token explode, document-frequency aggregate, and both verify
    sides), and Spark does not canonicalize the duplicated subtrees — the
    executed plan scanned `documents` and recomputed ``shingle_set`` four
    times.  The default persists the shingle relation and releases it
    via :func:`functions.cache.release_after` (the minhash/brute-topk
    pattern: eager localCheckpoint of the ≤|pairs| result, then
    unpersist — nothing leaks across the session).  ``staged=False``
    keeps the lazy single plan for plan inspection/composition.

    Returns every qualifying pair: (doc_a, doc_b, n_a, n_b, j_ppm).
    """
    t = df.select("doc_id", shingle_set(text_col, w).alias("sh"))
    if staged:
        t = t.persist()
    ex = t.select("doc_id", F.explode("sh").alias("tok"))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("df_"))
    # Rebuild each set ordered by the global (df, tok) order: struct sort
    # compares field-by-field, matching the oracle's ORDER BY df, tok.
    ordered = (
        ex.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(df_, tok))),"
                " x -> x.tok)"
            ).alias("osh")
        )
        .select(
            "doc_id",
            "osh",
            F.size("osh").alias("n"),
            # prefix length p = n - ceil(t*n) + 1  (>= 1 for t <= 1)
            F.expr(
                f"size(osh) - (({threshold_ppm}L * size(osh) + 999999L)"
                f" div 1000000L) + 1"
            ).alias("p"),
        )
    )
    pre = ordered.select(
        "doc_id",
        "n",
        F.posexplode(F.expr("slice(osh, 1, cast(p as int))")).alias(
            "pos0", "tok"
        ),
    ).select("doc_id", "n", (F.col("pos0") + 1).alias("pos"), "tok")
    # Candidates come from PER-TOKEN BUCKETS (groupBy + in-array pair
    # comprehension), not a prefix self-join: a self-join would compute
    # the whole ordered-array build twice (scan + freq shuffle + rebuild
    # shuffle per side — Spark's exchange reuse does not canonicalize the
    # deduplicated branches; measured 4 exchanges at sf0.1), while the
    # bucket fold computes it ONCE and shuffles only (tok, doc_id, n,
    # pos) rows.  Bucket sizes are bounded by the rarest-first ordering,
    # so the in-bucket quadratic is the same work the join fan-out did.
    #
    # Two provably-complete pair prunes run inside the bucket (r16
    # optimization round added the second):
    #  * size filter: J >= t forces t·max(|A|,|B|) <= min(|A|,|B|);
    #  * PPJoin positional filter (Xiao et al. WWW'08 §3): for the pair's
    #    FIRST shared token in the global order, every earlier token of
    #    either side is unshared, so |A∩B| <= 1 + min(|A|-pa, |B|-pb);
    #    J >= t also forces |A∩B| >= ceil(t·(|A|+|B|)/(1+t)).  A pair is
    #    emitted when ANY shared prefix token passes — a superset of
    #    PPJoin's first-token rule, so completeness is preserved while
    #    the verify population drops (measured 193,340 → 68,725
    #    candidates at sf0.1/t=0.6).  All arithmetic exact int64
    #    (ceil(a/b) as (a + b - 1) div b).
    def _pair_pred(xn: str, yn: str, xpos: str, ypos: str) -> str:
        # both prunes from one template (r16 ADVICE: the old string
        # .replace('x.n', ...) surgery would silently corrupt any future
        # field whose name contains 'x.n' as a substring)
        t_sz = (
            f"{threshold_ppm} * greatest({xn}, {yn})"
            f" <= 1000000 * least({xn}, {yn})"
        )
        t_pos = (
            f"1 + least({xn} - {xpos}, {yn} - {ypos}) >="
            f" ({threshold_ppm}L * ({xn} + {yn})"
            f" + {1_000_000 + threshold_ppm - 1}L)"
            f" div {1_000_000 + threshold_ppm}L"
        )
        return f"({t_sz}) AND ({t_pos})"

    buckets = pre.groupBy("tok").agg(
        F.collect_list(F.struct("doc_id", "n", "pos")).alias("ds")
    )
    # r17 (verdict #4): the in-bucket pair comprehension is a single-task
    # quadratic — the rarest-first prefix ordering bounds it empirically
    # (max bucket 10 at sf0.1) but nothing enforced the bound, so a
    # pathological corpus (one token in every doc's prefix) degraded to one
    # task holding an O(B²) array.  Two guards, output-neutral on any
    # corpus that passes them:
    #  * hard cap: buckets above ``max_bucket`` raise at execution time
    #    with re-blocking guidance (assert_true inside the projection — no
    #    extra pass, no plan-shape change);
    #  * posexplode before pairing: each bucket element becomes a row whose
    #    pair array is ≤ B structs, so per-row memory is O(B), not O(B²)
    #    (the filtered pairs stay in the same task — compute is unchanged).
    guard = (
        f"coalesce(assert_true(size(ds) <= {max_bucket},"
        f" 'prefix_filter_pairs: a prefix-token bucket exceeds max_bucket="
        f"{max_bucket} — the frequency ordering no longer bounds bucket"
        f" sizes on this corpus; re-block on a finer key, salt the hot"
        f" token, or raise max_bucket deliberately'), ds)"
    )
    cand = (
        buckets.select(F.expr(guard).alias("ds"))
        .select("ds", F.posexplode("ds").alias("i", "x"))
        .select(
            F.explode(
                F.expr(
                    "filter(transform(slice(ds, i + 2, size(ds)), y ->"
                    "  struct(least(x.doc_id, y.doc_id) AS doc_a,"
                    "         greatest(x.doc_id, y.doc_id) AS doc_b,"
                    "         x.n AS xn, y.n AS yn,"
                    "         x.pos AS xpos, y.pos AS ypos)),"
                    f" p -> {_pair_pred('p.xn', 'p.yn', 'p.xpos', 'p.ypos')})"
                )
            ).alias("pr")
        )
        .select(F.col("pr.doc_a").alias("doc_a"), F.col("pr.doc_b").alias("doc_b"))
        .distinct()
    )
    x, y = t.alias("x"), t.alias("y")
    inter = F.size(F.array_intersect("x.sh", "y.sh"))
    out = (
        cand.join(x, cand.doc_a == F.col("x.doc_id"))
        .join(y, cand.doc_b == F.col("y.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.size("x.sh").alias("n_a"),
            F.size("y.sh").alias("n_b"),
            F.expr(
                "1000000L * size(array_intersect(x.sh, y.sh))"
                " div (size(x.sh) + size(y.sh)"
                "      - size(array_intersect(x.sh, y.sh)))"
            ).alias("j_ppm"),
        )
        .filter(F.col("j_ppm") >= threshold_ppm)
    )
    if staged:
        from project_obsidian_core_spark.functions.cache import release_after

        return release_after(out, t)
    return out


# ------------------------------------------------ sorted neighborhood -----
SN_WINDOW = 5  # candidate pairs per row in sort order
SN_KEY_PREFIX = 24  # chars of the sorted-token key that drive the sort
SN_BLOCK_CHARS = 2  # leading key chars that partition the sort space


def sorted_neighborhood_pairs(
    df: DataFrame,
    text_col: str = "text",
    window: int = SN_WINDOW,
    key_prefix: int = SN_KEY_PREFIX,
    block_chars: int = SN_BLOCK_CHARS,
    hashed_grams: bool = True,
    verify: bool = True,
) -> DataFrame:
    """Sorted-neighborhood (SNM) near-dup candidates with exact verify —
    the THIRD blocking family next to LSH banding (minhash/simhash) and
    key blocking (ngram_jaccard's block col): sort the corpus by a
    similarity-preserving key (the SORTED-distinct-token prefix — token
    multiset near-equality ⇒ key near-equality, robust to word order)
    and pair each row with its next ``window`` neighbors in sort order.
    Candidate count is |docs|·w BY CONSTRUCTION — the only blocking
    scheme here whose fan-out is exactly linear no matter how skewed the
    key distribution (an LSH bucket can still blow up; a sort window
    cannot), which is why merge/purge systems ship it.

    The sort space is partitioned by the key's leading ``block_chars``
    (a distributed per-block row_number, never a one-task global
    window); pairs straddling a block boundary are the documented loss,
    the same boundary trade every blocking method here prices via its
    recall audit. Verification is the exact char-{4}-gram Jaccard in
    integer ppm — (|A∩B|·10⁶) div |A∪B|, no float in the gate.

    ``hashed_grams`` (default True — the r11 verdict's Next #3): the w
    ``lead(gr, i)`` copies fan the gram payload through the window
    exchange w times, so with string 4-grams the exchange carries ~w×
    the corpus's gram TEXT.  Hashing each gram to an int64 with
    ``xxhash64`` BEFORE the window (the D4b idiom that cut the ngram
    intersection wall 4×) makes the fan-out carry 8-byte elements
    instead — scores identical unless two distinct grams collide in 64
    bits (~2⁻⁶⁴ per pair-union, negligible; the string-gram band-join
    stays the oracle formulation, exactly how ``dedup_ngram_pairs_hashed``
    is gated).  ``verify=False`` skips the gram columns entirely —
    downstream verifiers that re-score candidates their own way (the D25
    edit-distance DP) pay zero gram payload through the window.
    """
    from pyspark.sql import Window as W

    gram_of = (
        f"xxhash64(substring({text_col}, i, {NGRAM_W}))"
        if hashed_grams
        else f"substring({text_col}, i, {NGRAM_W})"
    )
    grams = F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(length({text_col}) - {NGRAM_W - 1}, 1)),"
        f"  i -> {gram_of}))"
    )
    key = F.substring(
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.col(text_col), " "))), " "
        ),
        1,
        key_prefix,
    )
    gram_cols = [grams.alias("gr")] if verify else []
    t = df.select(
        "doc_id",
        key.alias("sn_key"),
        *gram_cols,
    ).select(
        "doc_id",
        "sn_key",
        F.substring("sn_key", 1, block_chars).alias("block"),
        *(["gr"] if verify else []),
    )
    # the w neighbors come from LEAD over the sort order, NOT a rank-band
    # self-join: a band join keyed on the block degenerates to O(n²/block)
    # probe work when the key space is coarse (measured 34 s at sf0.1 on
    # the join form vs the lead form below), while lead is one window
    # pass — the physical plan that actually delivers the |docs|·w bound
    # the operator's contract claims.  The oracle keeps the equivalent
    # row_number band-join formulation (declarative truth, engine picks
    # its own plan).
    wspec = W.partitionBy("block").orderBy("sn_key", "doc_id")
    sel = t.select(
        "block",
        "doc_id",
        *(["gr"] if verify else []),
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("rank_dist"),
                    F.lead("doc_id", i).over(wspec).alias("doc_b"),
                    *(
                        [F.lead("gr", i).over(wspec).alias("gr_b")]
                        if verify
                        else []
                    ),
                )
                for i in range(1, window + 1)
            ]
        ).alias("cands"),
    )
    e = (
        sel.select(
            "block",
            "doc_id",
            *(["gr"] if verify else []),
            F.explode("cands").alias("c"),
        )
        .filter(F.col("c.doc_b").isNotNull())
    )
    if not verify:
        return e.select(
            "block",
            F.col("doc_id").alias("doc_a"),
            F.col("c.doc_b").alias("doc_b"),
            F.col("c.rank_dist").cast("int").alias("rank_dist"),
        )
    inter = F.size(F.array_intersect("gr", "c.gr_b"))
    union = F.size("gr") + F.size("c.gr_b") - inter
    return (
        e.select(
            "block",
            F.col("doc_id").alias("doc_a"),
            F.col("c.doc_b").alias("doc_b"),
            F.col("c.rank_dist").cast("int").alias("rank_dist"),
            inter.cast("long").alias("n_inter"),
            union.cast("long").alias("n_union"),
        )
        .withColumn("jaccard_ppm", F.expr("n_inter * 1000000 div n_union"))
    )


# ------------------------------------------- D27: token-sort blocking -----
def token_sort_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """D27: order-insensitive exact dedup — group documents by the md5 of
    their SORTED token multiset (rapidfuzz's token_sort idea applied as
    a blocking key): shuffled/reordered copies of the same content that
    bitwise dedup (D1) misses collapse into one group, and
    ``is_reorder_only`` marks groups where the members' raw hashes
    differ (i.e., the catch is NEW relative to D1 — pure re-orderings),
    versus groups D1 would already have merged.

    One hash-shuffle on a 32-char key, the same cost shape as D1; the
    per-row sort is bounded by the document's own token count — never
    pairwise, never corpus-quadratic."""
    key = F.md5(
        F.array_join(F.array_sort(F.split(F.col(text_col), " ")), " ")
    )
    return (
        df.select(
            key.alias("sort_hash"),
            F.md5(F.col(text_col)).alias("raw_hash"),
            "doc_id",
        )
        .groupBy("sort_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("raw_hash").alias("n_distinct_raw"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .withColumn("is_reorder_only", F.col("n_distinct_raw") > 1)
    )
