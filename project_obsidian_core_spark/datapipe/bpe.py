"""Distributed BPE merge learning over the word-frequency table.

The step between token counting and a trained tokenizer: learn byte-pair
merges from the corpus. The scale insight is that BPE training never
touches the corpus after one pass — it operates on the WORD-FREQUENCY
table (10⁵-10⁶ rows for web corpora, weighted by count), which is tiny
relative to 100 TB of text. One explode+groupBy builds that table; every
merge round is then arithmetic on a small relation with the chosen pair
broadcast back as a 1-row join.

Merge semantics: standard greedy left-to-right, INCLUDING self-pairs
(a == b) — the same semantics as Sennrich-style / tokenizer-library BPE.
Pair counting enumerates every adjacent symbol pair (so "aaaa" contributes
3 to the (a, a) count, exactly like the reference implementations), and
the merge consumes matches left-to-right. For a ≠ b matches cannot
overlap (overlap at i, i+1 would force arr[i+1] to equal both halves), so
each position is decided locally. For a == b, left-to-right greediness
means positions at EVEN offset within a maximal run of the symbol start a
merge and odd offsets are consumed — run parity, computed per position
from the distance to the last non-`a` symbol. Both cases are one indexed
``transform`` — vectorizable identically in Spark and the SQL oracle; the
parity probe is O(run) per position, bounded by word length (words, not
documents — the relation is the word-frequency table).

Determinism: pair totals are exact int64; each round's winner is the
(total desc, pair asc) lexicographic top-1 — a total order, so Spark and
DuckDB pick the same pair every round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: number of merge rounds learned by the driver-gated query
BPE_ROUNDS = 3


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the one corpus-wide pass BPE training needs."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def initial_segmentation(words: DataFrame) -> DataFrame:
    """Each word as its character array."""
    return words.select("word", "cnt", F.split("word", "").alias("seg"))


def _adjacent_pairs(seg: Column) -> Column:
    n = F.size(seg)
    idx = F.sequence(F.lit(1), n - 1)
    pairs = F.transform(
        idx,
        lambda i: F.concat(
            F.element_at(seg, i), F.lit(" "), F.element_at(seg, i + 1)
        ),
    )
    return F.when(n >= 2, pairs).otherwise(F.expr("cast(array() as array<string>)"))


def top_pair(segs: DataFrame) -> DataFrame:
    """The highest-weight adjacent pair (self-pairs included): 1 row
    (pair, total).

    TakeOrderedAndProject, not a global sort. Counting is Sennrich-style:
    every adjacent position contributes, so a run "aaaa" adds 3 to
    (a, a) even though only 2 merges can apply — matching the reference
    tokenizer-training algorithms.
    """
    pairs = segs.select("cnt", F.explode(_adjacent_pairs(F.col("seg"))).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("total"))
        .orderBy(F.desc("total"), F.asc("pair"))
        .limit(1)
    )


def apply_merge(segs: DataFrame) -> DataFrame:
    """Merge every (left, right) occurrence left-to-right greedily.

    The chosen pair arrives broadcast as columns ``pair``/``total``.

    * a ≠ b: matches cannot overlap, so position i either dies (right
      half of a match), becomes the merged symbol (left half), or
      survives unchanged — decided locally.
    * a == b (self-pair): left-to-right greediness is run parity. For a
      position inside a maximal run of `a`, ``offset = i - last_non - 1``
      where ``last_non`` is the last index ≤ i holding a different
      symbol (0 if none). Odd offsets were consumed by the merge starting
      one to the left; even offsets start a merge if a partner follows,
      else survive as the run's odd tail.

    One indexed transform + null filter either way; both branches have
    bit-identical SQL twins in the oracle.
    """
    left = F.split(F.col("pair"), " ").getItem(0)
    right = F.split(F.col("pair"), " ").getItem(1)
    seg = F.col("seg")
    n = F.size(seg)

    def _non_self(i: Column) -> Column:
        return (
            F.when(
                (i > 1)
                & (F.element_at(seg, i - 1) == left)
                & (F.element_at(seg, i) == right),
                F.lit(None).cast("string"),
            )
            .when(
                (i < n)
                & (F.element_at(seg, i) == left)
                & (F.element_at(seg, i + 1) == right),
                F.concat(left, right),
            )
            .otherwise(F.element_at(seg, i))
        )

    def _self(i: Column) -> Column:
        last_non = F.coalesce(
            F.array_max(
                F.filter(
                    F.sequence(F.lit(1), i), lambda j: F.element_at(seg, j) != left
                )
            ),
            F.lit(0),
        )
        offset = i - last_non - 1
        return (
            F.when(F.element_at(seg, i) != left, F.element_at(seg, i))
            .when(offset % 2 == 1, F.lit(None).cast("string"))
            .when((i < n) & (F.element_at(seg, i + 1) == left), F.concat(left, right))
            .otherwise(F.element_at(seg, i))
        )

    merged = F.filter(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.when(left == right, _self(i)).otherwise(_non_self(i)),
        ),
        lambda x: x.isNotNull(),
    )
    return segs.select("word", "cnt", merged.alias("seg"))


def learn_merges(df: DataFrame, rounds: int = BPE_ROUNDS, text_col: str = "text") -> DataFrame:
    """Learn ``rounds`` BPE merges; returns (round, pair, total)."""
    segs = initial_segmentation(word_counts(df, text_col))
    out: DataFrame | None = None
    for r in range(1, rounds + 1):
        top = top_pair(segs)
        this = top.select(F.lit(r).alias("round"), "pair", "total")
        out = this if out is None else out.unionByName(this)
        # localCheckpoint bounds lineage: without it every round's top_pair
        # replays ALL previous rounds' merges (same rationale as
        # dedup.connected_components). The word table is tiny, so the
        # materialization cost is noise even at web scale.
        segs = apply_merge(segs.crossJoin(F.broadcast(top))).localCheckpoint()
    return out


def segment_words(df: DataFrame, rounds: int = BPE_ROUNDS, text_col: str = "text") -> DataFrame:
    """(word, cnt, seg) after ``rounds`` learned merges — the trained
    tokenizer's segmentation table (tiny; broadcasts to encoders)."""
    segs = initial_segmentation(word_counts(df, text_col))
    for _ in range(rounds):
        # per-round localCheckpoint: see learn_merges
        segs = apply_merge(
            segs.crossJoin(F.broadcast(top_pair(segs)))
        ).localCheckpoint()
    return segs


def encode_stats(df: DataFrame, rounds: int = BPE_ROUNDS, text_col: str = "text") -> DataFrame:
    """Per-document BPE token counts under the learned merges: the
    compression measurement that decides whether a tokenizer is worth its
    vocab size. Encoding = broadcast-join each document word against the
    segmentation table — the corpus shuffles zero times."""
    segs = segment_words(df, rounds, text_col).select(
        "word", F.size("seg").cast("long").alias("word_tokens")
    )
    words = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    return (
        words.join(F.broadcast(segs), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("word_tokens").alias("n_bpe_tokens"),
        )
    )
