"""obsidian-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of fortxun/project-obsidian-core.

The reference is a database query-analytics (QAN) monitoring pipeline:
cumulative-counter snapshots (MySQL performance_schema digests, PostgreSQL
pg_stat_statements) -> counter-reset-aware per-interval deltas -> time-bucketed
dimensional rollup fact tables (qan_db, metrics_db) -> analytics SQL (top-N,
trends, window ranking, derived ratios), governed by an adaptive EWMA polling
controller.

This package re-expresses those capabilities Spark-first:

- ``schemas``      -- StructType declarations for every table (SURVEY §1).
- ``operators``    -- the snapshot-delta operator (batch window-lag form) and
                      rollup materialization (SURVEY §2.3 J1, §2.4 A1/A2).
- ``analytics``    -- the notebook query surface: top_queries, query_trend,
                      top_by_multiple_metrics, compare_systems, metric series,
                      buffer-hit ratio (SURVEY §2.2-§2.8).
- ``streaming``    -- Structured Streaming delta with keyed state, plus the
                      pure-Python adaptive governor (SURVEY §2.9).
- ``sources``      -- snapshot/table readers (parquet fixtures; JDBC gated).
- ``datapipe``     -- large-scale training-data operators beyond reference
                      parity: dedup, similarity search, text analysis,
                      multimodal plumbing.
- ``functions``    -- unit conversions and guarded-math helpers (SURVEY §2.8).
"""

__version__ = "0.1.0"
