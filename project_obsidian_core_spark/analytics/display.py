"""Notebook display helpers — parity with the reference notebooks' client
code (02-Query_Analysis.ipynb cell-4 `format_sample`; cell-12 /
01-Connect_and_Metrics.ipynb cell-10 client-side pandas pivot for
plotting).

Two variants of each: a driver-side one matching the reference line for
line (the result sets these format are post-aggregate and tiny), and a
Spark-column one so the same shaping can run distributed when the "display"
is actually a sink (e.g. writing a dashboard extract at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NO_SAMPLE = "[No sample available]"


def format_sample(sample, max_length: int = 80) -> str:
    """Truncate one query sample for display
    (02-Query_Analysis.ipynb cell-4)."""
    try:
        import pandas as pd

        missing = sample is None or pd.isna(sample)
    except Exception:
        missing = sample is None
    if missing or not str(sample).strip():
        return NO_SAMPLE
    sample = str(sample).strip()
    if len(sample) > max_length:
        return sample[:max_length] + "..."
    return sample


def format_sample_col(col: Column | str, max_length: int = 80) -> Column:
    """Column form of :func:`format_sample` — CASE + substring, JVM-side."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return (
        F.when(c.isNull() | (c == ""), F.lit(NO_SAMPLE))
        .when(
            F.length(c) > max_length,
            F.concat(F.substring(c, 1, max_length), F.lit("...")),
        )
        .otherwise(c)
    )


def series_pivot(
    df: DataFrame,
    index_col: str = "time_bucket",
    name_col: str = "metric_name",
    value_col: str = "avg_value",
    names: list[str] | None = None,
) -> DataFrame:
    """Long metric series → wide plot frame (one column per series name) —
    the Spark form of the notebook's `metrics_df.pivot(...)`
    (01-Connect_and_Metrics.ipynb cell-10).

    Pass ``names`` when known: an explicit pivot-value list skips the
    distinct-discovery job (one pass instead of two).
    """
    p = df.groupBy(index_col).pivot(name_col, names)
    return p.agg(F.first(value_col)).orderBy(index_col)


def to_plot_frame(
    df: DataFrame,
    index_col: str = "time_bucket",
    name_col: str = "metric_name",
    value_col: str = "avg_value",
    names: list[str] | None = None,
):
    """Pivot + collect to pandas for plotting — the notebook's
    `pivot_df.reset_index()` equivalent. Only call on post-aggregate
    (bounded) series results."""
    return series_pivot(df, index_col, name_col, value_col, names).toPandas()
