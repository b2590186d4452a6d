"""Gate-window invariants for the driver correctness contract: the driver
records only the FIRST 50 registry entries, so ordering is load-bearing.
These pins fail loudly if a refactor reorders the window."""

from __future__ import annotations

import glob
import json
import os

import bench as bench_mod
from project_obsidian_core_spark.plans.registry import ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _official_green() -> set[str]:
    green = set()
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(p) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if row.get("hash_match") and not row.get("err"):
                green.add(name)
    return green


def test_no_row_queries_lead_the_gate():
    """Queries with no green row in ANY official CORRECTNESS_r*.json MUST
    occupy the leading slots (they can't earn a row from the tail)."""
    green = _official_green()
    names = list(QUERIES)
    unrecorded = {n for n in names if n not in green}
    assert set(names[: len(unrecorded)]) == unrecorded


def test_every_unrecorded_query_is_inside_the_50_window():
    """Anything without an official green row must sit in the first 50
    slots, or it can never get one."""
    green = _official_green()
    window = set(list(QUERIES)[:50])
    unrecorded = [n for n in QUERIES if n not in green]
    outside = [n for n in unrecorded if n not in window]
    assert not outside, f"unrecorded queries outside the gate window: {outside}"


def test_every_query_has_an_oracle():
    assert set(ORACLES) == set(QUERIES)


def test_bench_covers_registry_with_documented_exclusions():
    """bench times every registered query; stream_cdc_merge is the one
    name outside BENCH_QUERIES, timed via the harness-normalized
    _time_cdc_merge path instead (merge work, replay harness excluded)."""
    timed = set(bench_mod.BENCH_QUERIES)
    assert timed <= set(QUERIES)
    missing = set(QUERIES) - timed
    assert missing == {"stream_cdc_merge"}, missing
    assert callable(bench_mod._time_cdc_merge)
    assert len(bench_mod.BENCH_QUERIES) == len(timed)  # no duplicates
