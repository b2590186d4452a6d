"""2-D Pareto frontier (skyline) without the dominance self-join.

"Which offers are not beaten on BOTH price and quality?" is the skyline
query (Börzsönyi et al., ICDE 2001). The textbook formulation is a
NOT-EXISTS dominance self-join — O(n²) pairs, hopeless at lake scale.
For two criteria the frontier has a sort-order characterization that
Spark computes with two windows and zero joins:

sort each group by the minimized column ascending; a row is on the
frontier iff

- its maximized value strictly exceeds every strictly-cheaper row's
  (running ``max`` over a RANGE frame ending 1 BEFORE the current key —
  value-based, so equal-price rows are excluded from their own baseline),
- and it ties the best maximized value within its own price point
  (equal-price rows with smaller value are dominated by that point's
  best; exact ties are mutually non-dominating and all kept).

Cost: one shuffle per window partition key — the group columns — and a
per-partition sort; at 100 TB the skyline of each group streams through
one task's window state (two running aggregates, O(1) memory beyond the
sort). Both window frames are value-RANGE frames with identical
semantics in Spark and ANSI SQL, so the operator is oracle-gateable
bit-exact.

Reference parity: the reference has no multi-objective operator; this
extends §2.11's analytics family (the "best tradeoff curve" question its
dashboards answer by eyeballing scatter plots).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    group_cols: Sequence[str],
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """Rows of ``df`` on the per-group Pareto frontier: no other row in
    the group is ≤ on ``minimize_col`` AND ≥ on ``maximize_col`` with at
    least one strict inequality. Input columns pass through unchanged."""
    keys = list(group_cols)
    # best maximized value among STRICTLY cheaper rows (value-based RANGE
    # frame: same-price peers are not "cheaper")
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(minimize_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # best maximized value at this exact price point
    w_tie = Window.partitionBy(*keys, minimize_col)
    prev_best = F.max(maximize_col).over(w_prev)
    tie_best = F.max(maximize_col).over(w_tie)
    return (
        df.withColumn("_prev", prev_best)
        .withColumn("_tie", tie_best)
        .filter(
            (F.col(maximize_col) == F.col("_tie"))
            & (
                F.col("_prev").isNull()
                | (F.col(maximize_col) > F.col("_prev"))
            )
        )
        .drop("_prev", "_tie")
    )
