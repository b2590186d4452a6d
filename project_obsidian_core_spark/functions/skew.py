"""Skew-mitigation helpers: salted two-phase aggregation.

AQE's skew-join splitting handles joins, but a groupBy over a power-law key
(one hot digest receiving most of the traffic — boilerplate statements do
this in real QAN data) still funnels the hot key's rows into one reducer.
The classic fix is salting: aggregate on (key, salt) first so the hot key's
work spreads over N reducers, then aggregate the N partials.

Only algebraic aggregates (sum/count/min/max — exactly the rollup
operators, qan_db_ingestion.json metricsSpec) can be two-phased like this;
avg must be decomposed into sum+count by the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase aggregation immune to key skew.

    ``aggs`` maps output column -> (op, input column) with op in
    {sum, count, min, max}. Phase 1 groups on (keys..., salt) where salt is
    a uniform pseudo-random bucket per row (derived from a hash of the full
    row's monotonic id — deterministic per partition layout, and any
    uniform distribution is correct: salting only affects placement, not
    results). Phase 2 merges the ≤ salt_buckets partials per key.
    """
    phase1_exprs: list[Column] = []
    phase2_exprs: list[Column] = []
    for out, (op, col) in aggs.items():
        if op not in _MERGE and op != "count":
            raise ValueError(f"non-algebraic op not supported: {op}")
        partial = F.count(F.lit(1)) if op == "count" else getattr(F, op)(col)
        phase1_exprs.append(partial.alias(f"__p_{out}"))
        phase2_exprs.append(_MERGE[op](f"__p_{out}").alias(out))

    salted = df.withColumn(
        "__salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
    )
    partials = salted.groupBy(*keys, "__salt").agg(*phase1_exprs)
    return partials.groupBy(*keys).agg(*phase2_exprs)
