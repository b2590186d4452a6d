"""Physical-plan pins for the round-2 operators' scale-critical shapes.

These are regression guards: the measured 74 s -> 3 s decontaminate fix and
the windowless vocab rank are properties of the PLAN, not the output, so an
innocent-looking refactor can silently undo them while every value test
stays green. Asserting on the executed plan keeps the fix load-bearing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"tok{i % 7} tok{i % 5} tok{i % 3} tok{i % 11} end", "en", "s0")
            for i in range(60)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_probes_via_broadcast_hash_join(docs):
    plan = _plan(C.decontaminate(docs, n=2))
    # the bench-set probe must be a hash join, not a per-row array scan or
    # nested loop (the 74 s at sf0.1 failure mode)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_stats_aggregates_with_partial_combine(docs):
    plan = _plan(C.repetition_stats(docs))
    # explode feeds a hash aggregate (map-side combine), not a per-row loop
    assert "HashAggregate" in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_stratified_sample_broadcasts_stratum_counts(docs):
    plan = _plan(C.stratified_sample(docs))
    assert "BroadcastHashJoin" in plan  # counts side must broadcast


def test_tile_dedup_windows_are_hash_partitioned(docs):
    plan = _plan(C.tile_dedup(docs))
    # the first-occurrence window must be partitioned (no global window)
    assert "Window" in plan
    assert "No Partition Defined" not in plan


def test_decontaminate_scan_is_pruned(docs, tmp_path):
    # through parquet, the gram projection must prune to doc_id + text
    p = str(tmp_path / "docs")
    docs.write.parquet(p)
    spark = docs.sparkSession
    out = C.decontaminate(spark.read.parquet(p), n=2)
    scan = _plan(out)
    assert "lang" not in scan.split("ReadSchema")[1][:200]
