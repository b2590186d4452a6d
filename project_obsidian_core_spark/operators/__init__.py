from project_obsidian_core_spark.operators.delta import (
    compute_deltas,
    mysql_deltas,
    pg_deltas,
)
from project_obsidian_core_spark.operators.rollup import (
    metrics_rollup,
    qan_rollup,
)

__all__ = ["compute_deltas", "mysql_deltas", "pg_deltas", "qan_rollup", "metrics_rollup"]
