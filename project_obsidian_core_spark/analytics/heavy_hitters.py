"""Two-pass exact φ-heavy hitters — sketch-pruned candidates, exact verify.

The canonical distributed heavy-hitters construction (Misra-Gries '82 /
the "local candidates + exact recount" scheme every production top-K
pipeline uses): a single full `groupBy(key).count()` over a 100 TB stream
shuffles ONE ROW PER DISTINCT KEY — at URL/token/user cardinalities that
is the whole corpus again. Instead:

- **Pass 1 (candidates)**: each Arrow batch emits the keys that are
  φ-heavy *within the batch*. By the pigeonhole/weighted-average argument,
  any key with global frequency > φ·n is φ-heavy in at least one batch
  (if freq_p(k) ≤ φ·n_p everywhere then Σ gives freq(k) ≤ φ·n), so the
  candidate set has NO false negatives. Each batch emits at most ⌊1/φ⌋
  keys, so candidates ≤ batches/φ — broadcast-sized by construction.
  Per-batch memory is bounded by the Arrow batch size
  (`spark.sql.execution.arrow.maxRecordsPerBatch`), which plays the role
  of the classic Misra-Gries counter budget.
- **Pass 2 (exact verify)**: broadcast-semi-join the corpus against the
  candidate set and count exactly — the shuffle now carries only
  candidate keys. False positives from pass 1 die here; the output is
  EXACTLY the keys with freq > φ·n, bit-identical to the direct
  group-by-all formulation (which is the oracle).

Exactness contract: thresholds compare scaled integers
(``cnt·denom > n·num`` for φ = num/denom), never floats.

Measured crossover (scripts/soak_r8.py, 5M rows / ~2M distinct keys,
local[32]): the candidate pass streams every row through an Arrow hop
(~1 s), while the in-process shuffle it avoids costs almost nothing —
so on a single node the naive partial-aggregated ``groupBy(key)`` plan
wins (0.63 s vs 1.5 s). The two-pass shape is for the cluster regime
where shuffle BYTES bind: one row per distinct key over the network at
URL/token cardinalities is corpus-sized, and pruning it to
``batches/φ`` candidates is the win. Pick per deployment; both are
exact. (The vocab-bounded sibling in datapipe/text.py covers the case
where |keys| is small enough to shuffle outright.)
"""

from __future__ import annotations

from collections.abc import Iterator
from fractions import Fraction

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _batch_candidates(phi: Fraction, key: str):
    num, den = phi.numerator, phi.denominator

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            counts = pdf[key].value_counts()
            # batch-local φ-heavy: cnt/len > num/den  <=>  cnt*den > len*num
            hot = counts[counts * den > len(pdf) * num]
            if len(hot):
                yield pd.DataFrame({key: hot.index})

    return gen


def heavy_hitters(
    df: DataFrame,
    key: str = "key",
    phi: Fraction = Fraction(1, 100),
) -> DataFrame:
    """Keys of ``df`` with frequency strictly greater than ``phi``·n.

    Returns (key, cnt, n_rows, share_ppm) — share_ppm an exact integer
    ``cnt·10⁶ div n``. Output is exact (see module docstring): the sketch
    only prunes the key space the verify pass shuffles.
    """
    keyed = df.select(key)
    cands = keyed.mapInPandas(
        _batch_candidates(phi, key), schema=f"{key} {dict(df.dtypes)[key]}"
    ).distinct()
    total = keyed.groupBy().agg(F.count(F.lit(1)).alias("n_rows"))
    counts = (
        keyed.join(F.broadcast(cands), key, "left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    num, den = phi.numerator, phi.denominator
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * den > F.col("n_rows") * num)
        .withColumn(
            "share_ppm",
            F.expr("cnt * 1000000 div n_rows"),
        )
    )
