from project_obsidian_core_spark.analytics.qan import (
    compare_systems,
    query_trend,
    top_by_multiple_metrics,
    top_queries,
)
from project_obsidian_core_spark.analytics.metrics import (
    buffer_hit_ratio,
    distinct_metrics,
    metric_series,
)

__all__ = [
    "top_queries",
    "query_trend",
    "top_by_multiple_metrics",
    "compare_systems",
    "buffer_hit_ratio",
    "metric_series",
    "distinct_metrics",
]
