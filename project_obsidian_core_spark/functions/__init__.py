from project_obsidian_core_spark.functions.units import (
    clamp01,
    guarded_div,
    ms_to_s,
    ps_to_ms,
    ps_to_s,
    ratio_of_sums,
)

__all__ = ["ps_to_s", "ps_to_ms", "ms_to_s", "clamp01", "guarded_div", "ratio_of_sums"]
