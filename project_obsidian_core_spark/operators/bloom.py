"""Explicit Bloom-filter runtime join filter (J17).

The 100 TB join problem this solves: a fact-side scan (orders, lineitem)
feeds a shuffle join against a SELECTIVE dimension subset; without a
runtime filter every fact row pays the shuffle, even the ~99% that no dim
key will ever match.  Spark's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects exactly this
rewrite when statistics allow; this operator states it EXPLICITLY so the
pruning is guaranteed (and testable) rather than cost-model-dependent:

1. ``build_bloom`` folds the dim keys into an m-bit bitmap with k seeded
   xxhash64 probes — one partial-aggregated pass over the (already
   selective) build side, ``bit_or`` per 64-bit word, then a BOUNDED
   driver collect of <= m/64 rows (8 KiB at the default geometry — a
   control-plane read like the LSH capacity pre-flight, never data-sized).
2. ``might_contain`` compiles the bitmap into a LITERAL array predicate —
   k hash probes + array indexing, fully inside WholeStageCodegen, no
   join, no Python — which the caller applies to the fact side BEFORE its
   shuffle.  Filter pushdown carries it to the scan.

Correctness contract: a Bloom filter has NO false negatives (the k probe
positions are deterministic functions of the key), so the pre-filter keeps
every true match; the actual join afterwards removes the false positives.
The joined result is therefore BIT-IDENTICAL to the plain join — which is
exactly what the gate oracle asserts (the oracle is the plain join; the
bloom path must not change a single row).

Geometry: FP rate ~= (1 - e^(-k·n/m))^k; the default (m = 2^16 bits,
k = 4) holds ~0.1% FP to n ~= 3000 build keys.  Size m to the build-side
cardinality, not the fact side — the filter only has to be cheap relative
to the shuffle it avoids (8 KiB broadcast vs terabytes of shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bitmap geometry: 2^16 bits = 1024 int64 words = 8 KiB.
BLOOM_M_BITS = 1 << 16
#: fixed probe seeds — deterministic, shared with any oracle/replica.
BLOOM_SEEDS = (101, 211, 307, 401)


def _positions(key: Column, m_bits: int, seeds: tuple[int, ...]) -> list[Column]:
    """The k deterministic probe positions of a key (pmod keeps them
    non-negative; xxhash64's seed argument gives k independent hashes)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits)).cast("long")
        for s in seeds
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> list[int]:
    """Fold ``df[key_col]`` into an m-bit Bloom bitmap; returns the
    m_bits/64 int64 words (python list, ready for :func:`might_contain`).

    One scan of the build side: explode the k probe positions per key,
    project (word_idx, bit), ``bit_or`` per word (partial-aggregated), and
    collect the <= m_bits/64 surviving words — a bounded control-plane
    collect, independent of build-side row count.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m_bits, seeds))).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r.w] = r.bits
    return out


def might_contain(
    key_col: str,
    words: list[int],
    m_bits: int = BLOOM_M_BITS,
    seeds: tuple[int, ...] = BLOOM_SEEDS,
) -> Column:
    """Membership predicate over the bitmap from :func:`build_bloom` —
    k hash probes + literal-array indexing, codegen-friendly, NULL-safe
    (NULL keys test false, matching inner-join semantics)."""
    arr = F.lit(words)
    key = F.col(key_col)
    cond = F.lit(True)
    for p in _positions(key, m_bits, seeds):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, (p % 64).cast("int")) == 1)
    return key.isNotNull() & cond
