from project_obsidian_core_spark.sources.tables import (
    TESTDATA_TABLES,
    load_table,
    load_tables,
)

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables"]
