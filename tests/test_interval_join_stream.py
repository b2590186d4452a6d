"""Stream-stream interval join vs the batch range join on one fixture."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from project_obsidian_core_spark.operators import temporal_joins as TJ
from project_obsidian_core_spark.streaming import interval_join as IJ
from project_obsidian_core_spark.streaming.delta_stream import run_replay


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def test_stream_pairs_equal_batch_pairs(spark):
    rows = [
        (1, 10, _ts(5), "anchor", 0),
        (2, 10, _ts(4), "probe", 100),   # inside (5-2, 5]
        (3, 10, _ts(5), "probe", 200),   # at anchor (<=)
        (4, 10, _ts(3), "probe", 300),   # exactly span before -> excluded
        (5, 10, _ts(7), "probe", 400),   # after -> excluded
        (6, 99, _ts(5), "probe", 500),   # other key
    ]
    tmp = tempfile.mkdtemp(prefix="ij_test_")
    src = f"{tmp}/src"
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "kind", "v"])
    df.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    span_s = 120
    anchors_b = spark.read.parquet(src).filter(F.col("kind") == "anchor").select(
        "event_id", "user_id", "ts"
    )
    probes_b = spark.read.parquet(src).filter(F.col("kind") == "probe").select(
        "user_id", "ts", "v"
    )
    batch = sorted(
        (r["event_id"], r["probe_v"])
        for r in TJ.range_join(
            anchors_b, probes_b, on="user_id", span_us=span_s * 1_000_000
        ).collect()
    )

    anchors_s = (
        spark.readStream.schema(schema).parquet(src)
        .filter(F.col("kind") == "anchor").select("event_id", "user_id", "ts")
    )
    probes_s = (
        spark.readStream.schema(schema).parquet(src)
        .filter(F.col("kind") == "probe").select("user_id", "ts", "v")
    )
    pairs = IJ.interval_join(anchors_s, probes_s, on="user_id", span_seconds=span_s)
    run_replay(pairs, f"{tmp}/ckpt", sink_path=f"{tmp}/out", query_name="ij_test")
    stream = sorted(
        (r["a_event_id"], r["p_v"]) for r in spark.read.parquet(f"{tmp}/out").collect()
    )

    assert batch == [(1, 100), (1, 200)]
    assert stream == batch
