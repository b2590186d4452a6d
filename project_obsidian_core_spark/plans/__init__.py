from project_obsidian_core_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
