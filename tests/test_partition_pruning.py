"""Scale-contract checks on the physical plan: partition pruning + pushdown.

The 100 TB story depends on (a) hour-partitioned fact tables turning time
predicates into partition pruning and (b) filters reaching the parquet scan.
These tests pin that by inspecting the executed plan, not by trusting docs.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark import schemas
from project_obsidian_core_spark.operators import delta as OD
from project_obsidian_core_spark.operators import rollup as OR

PS = 1_000_000_000_000


@pytest.fixture(scope="module")
def qan_path(spark, tmp_path_factory):
    """qan_db spanning 3 distinct hours."""
    tmp = str(tmp_path_factory.mktemp("qan_hours"))
    rows = []
    for h in (8, 9, 10):
        for tick in (0, 1):
            ts = dt.datetime(2026, 3, 1, h, 30 + tick, 0)
            rows.append(
                ("my-1", ts, "shop", "dg", "SELECT 1",
                 100 + h * 10 + tick * 5, (100 + h) * PS, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0)
            )
    snaps = spark.createDataFrame(rows, schemas.MYSQL_SNAPSHOT_SCHEMA)
    OR.write_qan(OD.mysql_deltas_to_qan(OD.mysql_deltas(snaps)), tmp, mode="overwrite")
    return tmp


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_time_predicate_prunes_hour_partitions(spark, qan_path):
    df = spark.read.parquet(qan_path).filter(
        (F.col("event_date") == "2026-03-01") & (F.col("event_hour") == 9)
    )
    plan = _executed_plan(df)
    # partition columns never reach the data filters; they prune at planning
    assert "PartitionFilters" in plan
    assert "event_hour" in plan.split("PartitionFilters")[1].split("]")[0]
    # and only the matching hour's rows are read (deltas at 9:30 and 9:31)
    assert df.count() == 2
    assert {r["event_hour"] for r in df.select("event_hour").collect()} == {9}


def test_data_predicate_pushed_to_parquet(spark, qan_path):
    df = spark.read.parquet(qan_path).filter(F.col("calls_delta") > 3)
    plan = _executed_plan(df)
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "calls_delta" in pushed and "GreaterThan" in pushed


def test_column_pruning_reaches_scan(spark, qan_path):
    df = spark.read.parquet(qan_path).select("statement_digest", "calls_delta")
    plan = _executed_plan(df)
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "calls_delta" in read_schema
    # a 37-column table must not be fully read for a 2-column projection
    assert "total_timer_wait_delta" not in read_schema
    assert "statement_sample" not in read_schema
