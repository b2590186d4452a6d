"""Table-level data-quality report — the ingestion gate a 100 TB pipeline
runs before publishing a snapshot (null/range/enum/uniqueness contracts).

The reference trusts its scrape SQL to emit well-formed rows (SURVEY §2.1);
at lake scale the contract must be CHECKED, cheaply: every non-unique rule
compiles to a conditional aggregate in ONE reduction over ONE scan (rule
count does not add passes).  Each ``unique`` rule is computed as its OWN
two-level aggregation (groupBy key -> count>1 -> one-row sum) rather than
a ``countDistinct`` inside the shared aggregation: k distinct aggregates
in one agg make Spark Expand every input row (k+1)x through the shuffle —
a ~4x amplification at 100 TB for a 3-unique report — while k separate
group-counts are k ordinary partial-aggregated shuffles on already-narrow
key columns, unioned as driver-sized single rows.  Output is one row per
rule so the report can gate a publish step without materializing anything.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rule kinds understood by dq_report.
RULE_KINDS = ("not_null", "range", "in_set", "unique")


def dq_report(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Evaluate declarative quality rules; one output row per rule.

    ``rules`` entries::

        ("not_null", col)             NULL values violate
        ("range", col, lo, hi)        NULL or outside [lo, hi] violates
        ("in_set", col, values)       NULL or not in ``values`` violates
        ("unique", col)               each duplicate row beyond the first

    Returns (rule, n_violations, n_rows) — exact int64 counts.  A rule's
    name is ``{kind}:{col}``; when two rules share kind and column (e.g.
    two ``range`` rules with different bounds) later duplicates get a
    ``#{i}`` suffix (their position in ``rules``) so every rule stays
    addressable in the report.
    """
    aggs: list = []
    names: list[str] = []
    unique_rules: list[tuple[str, str]] = []  # (name, col)
    seen: set[str] = set()
    for i, r in enumerate(rules):
        kind, col = r[0], r[1]
        key = f"{kind}:{col}"
        if key in seen:
            key = f"{kind}:{col}#{i}"
        seen.add(key)
        if kind == "not_null":
            e = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        elif kind == "range":
            lo, hi = r[2], r[3]
            e = F.sum(
                F.when(
                    F.col(col).isNull()
                    | (F.col(col) < F.lit(lo))
                    | (F.col(col) > F.lit(hi)),
                    1,
                ).otherwise(0)
            )
        elif kind == "in_set":
            vals = list(r[2])
            e = F.sum(
                F.when(
                    F.col(col).isNull() | ~F.col(col).isin(vals), 1
                ).otherwise(0)
            )
        elif kind == "unique":
            unique_rules.append((key, col))
            continue
        else:
            raise ValueError(f"unknown rule kind: {kind!r}")
        aggs.append(e.cast("long").alias(key))
        names.append(key)
    if not names and not unique_rules:
        raise ValueError("dq_report needs at least one rule")

    # One scan, one reduce: n_rows + every non-unique rule.
    row = df.agg(F.count(F.lit(1)).alias("_n_rows"), *aggs)
    if names:
        stack = ", ".join(f"'{n}', `{n}`" for n in names)
        out = row.select(
            F.expr(
                f"stack({len(names)}, {stack}) as (rule, n_violations)"
            ),
            F.col("_n_rows").alias("n_rows"),
        )
    else:
        out = None

    # Each unique rule: two-level agg (no Expand), joined to the 1-row
    # total via a broadcast of two single-row relations.
    n_rows_row = row.select(F.col("_n_rows").alias("n_rows"))
    for key, col in unique_rules:
        dup = (
            df.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(
                F.coalesce(F.sum(F.col("_c") - F.lit(1)), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
            .select(F.lit(key).alias("rule"), "n_violations")
        )
        u = dup.crossJoin(F.broadcast(n_rows_row))
        out = u if out is None else out.unionByName(u)
    return out.select("rule", "n_violations", "n_rows")


def profile(df: DataFrame, columns: Sequence[tuple[str, "F.Column"]]) -> DataFrame:
    """One-pass column profiling report — (column, n_rows, n_nulls,
    n_distinct, min_repr, max_repr) per profiled column, all exact.

    ``columns`` maps each output column name to a CANONICAL STRING
    representation expression.  Canonical means (a) injective, so distinct
    counts over the repr equal distinct counts over the value, and (b)
    order-preserving (zero-padded numerics, ISO timestamps), so
    lexicographic min/max equal the typed min/max.  NULL values must stay
    NULL through the repr.

    The shape is the Expand-trap dodge at profiling scale: k exact
    ``countDistinct`` aggregates in one pass would Expand every input row
    (k+1)x through the shuffle (the dq_report docstring's 100 TB
    amplification).  Instead the table melts ONCE into (column, repr)
    long rows — an explicit, partial-aggregation-friendly k× Generate —
    and two stacked hash aggregates do the rest: groupBy(column, repr)
    with map-side combine collapses the melt to ~Σ distinct-cardinalities
    rows BEFORE the shuffle, then groupBy(column) reduces to k report
    rows.  Null/row counts ride the first aggregate's partial counts.
    """
    k = len(columns)
    reprs = df.select(
        *[expr.alias(f"__repr_{i}") for i, (_, expr) in enumerate(columns)]
    )
    stack_args = ", ".join(
        f"'{name}', __repr_{i}" for i, (name, _) in enumerate(columns)
    )
    melted = reprs.select(
        F.expr(f"stack({k}, {stack_args}) AS (column, value)")
    )
    per_value = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_value.groupBy("column").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(0)).alias(
            "n_nulls"
        ),
        F.count(F.col("value")).alias("n_distinct"),
        F.min("value").alias("min_repr"),
        F.max("value").alias("max_repr"),
    )
