"""Table-level data-quality report — the ingestion gate a 100 TB pipeline
runs before publishing a snapshot (null/range/enum/uniqueness contracts).

The reference trusts its scrape SQL to emit well-formed rows (SURVEY §2.1);
at lake scale the contract must be CHECKED, cheaply: every rule here
compiles to a conditional aggregate in ONE reduction over ONE scan (rule
count does not add passes), except uniqueness which adds the unavoidable
distinct shuffle on its key. Output is one row per rule — driver-sized —
so the report can gate a publish step without materializing anything.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rule kinds understood by dq_report.
RULE_KINDS = ("not_null", "range", "in_set", "unique")


def dq_report(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Evaluate declarative quality rules in one pass.

    ``rules`` entries::

        ("not_null", col)             NULL values violate
        ("range", col, lo, hi)        NULL or outside [lo, hi] violates
        ("in_set", col, values)       NULL or not in ``values`` violates
        ("unique", col)               each duplicate row beyond the first

    Returns (rule, n_violations, n_rows) — one row per rule, exact int64
    counts. All non-unique rules fold into a single aggregation (map-side
    partials, one reduce); each ``unique`` adds one count-distinct.
    """
    aggs, names = [], []
    for r in rules:
        kind, col = r[0], r[1]
        key = f"{kind}:{col}"
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
            e = F.count(col) - F.countDistinct(col)
        else:
            raise ValueError(f"unknown rule kind: {kind!r}")
        aggs.append(e.cast("long").alias(key))
        names.append(key)
    if not names:
        raise ValueError("dq_report needs at least one rule")
    row = df.agg(F.count(F.lit(1)).alias("_n_rows"), *aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return row.select(
        F.expr(
            f"stack({len(names)}, {stack}) as (rule, n_violations)"
        ),
        F.col("_n_rows").alias("n_rows"),
    ).select("rule", "n_violations", "n_rows")
