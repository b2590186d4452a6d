"""Cache-lifetime helper for operators that stage an intermediate relation.

Several datapipe operators persist a staged relation (LSH signatures, the
quantized embedding table) because it feeds multiple joins of one logical
plan. A bare ``.persist()`` with no release leaks executor storage across a
long-lived session — the 122-query correctness/bench suites run in ONE JVM,
so leaked blocks accumulate (round-5 advice). The pattern here: eagerly
materialize the (small) result via ``localCheckpoint``, then drop the staged
blocks — the caller gets a checkpoint-backed DataFrame whose lineage no
longer references the cache.

``localCheckpoint`` is the right tool because these operators are already
driver-coordinated (they exist to bound candidate generation, and their
outputs — top-k lists, candidate pairs, cluster labels — are orders of
magnitude smaller than the staged input). On a real cluster swap in
``checkpoint()`` for executor-loss tolerance, exactly as the iterative
connected-components docstrings prescribe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_after(result: DataFrame, *staged: DataFrame) -> DataFrame:
    """Materialize ``result`` eagerly, then unpersist every ``staged``
    relation backing it. Returns the checkpoint-backed result."""
    out = result.localCheckpoint(eager=True)
    for df in staged:
        df.unpersist()
    return out
