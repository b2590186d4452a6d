"""Streaming stateful delta: reference semantics T2-T5 across micro-batches.

Replays a snapshot sequence file-by-file through applyInPandasWithState with
a persistent checkpoint: pass 2 resumes from pass 1's state store, proving
the cross-batch state carry (the reference's SnapshotStore surviving ticks).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from project_obsidian_core_spark.streaming import delta_stream as DS

METRICS = [("count_star", T.LongType()), ("bytes", T.LongType())]
SNAP_SCHEMA = T.StructType(
    [
        T.StructField("instance_id", T.StringType()),
        T.StructField("snapshot_ts", T.TimestampType()),
        T.StructField("digest", T.StringType()),
        T.StructField("count_star", T.LongType()),
        T.StructField("bytes", T.LongType()),
    ]
)

TS = [dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=60 * i) for i in range(4)]


def _write(spark, rows, path):
    spark.createDataFrame(rows, SNAP_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, ckpt, sink):
    """Run one availableNow pass; return ALL rows accumulated in the sink
    (memory sinks can't recover checkpoints, so passes append to parquet)."""
    stream = spark.readStream.schema(SNAP_SCHEMA).parquet(src)
    deltas = DS.stateful_deltas(stream, ["digest"], METRICS, activity_col="count_star")
    DS.run_replay(deltas, ckpt, sink_path=sink)
    return {
        (r["instance_id"], r["digest"], r["snapshot_ts"]): r
        for r in spark.read.parquet(sink).collect()
    }


def test_stream_semantics_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    # ---- pass 1: snapshots t0, t1 ------------------------------------
    _write(spark, [("i1", TS[0], "q1", 100, 1000), ("i1", TS[0], "q2", 5, 50)], src)
    _write(spark, [("i1", TS[1], "q1", 160, 1600), ("i1", TS[1], "q2", 5, 50)], src)
    out1 = _run(spark, src, ckpt, sink)

    # T2: t0 emits nothing; t1: q1 delta, q2 filtered by activity (P3)
    assert set(out1) == {("i1", "q1", TS[1])}
    r = out1[("i1", "q1", TS[1])]
    assert r["count_star_delta"] == 60 and r["bytes_delta"] == 600
    assert r["time_period_seconds"] == pytest.approx(60.0)

    # ---- pass 2 (same checkpoint): t2 with reset + new key + new inst -
    _write(
        spark,
        [
            ("i1", TS[2], "q1", 30, 300),      # counter reset (T3): 30 < 160
            ("i1", TS[2], "q3", 7, 70),        # new key (T4): full value
            ("i2", TS[2], "q1", 999, 9990),    # new instance: first snapshot, T2
        ],
        src,
    )
    out2 = _run(spark, src, ckpt, sink)
    assert set(out2) - set(out1) == {("i1", "q1", TS[2]), ("i1", "q3", TS[2])}
    reset = out2[("i1", "q1", TS[2])]
    assert reset["count_star_delta"] == 30 and reset["bytes_delta"] == 300
    assert reset["time_period_seconds"] == pytest.approx(60.0)  # t2 - t1
    newkey = out2[("i1", "q3", TS[2])]
    assert newkey["count_star_delta"] == 7 and newkey["bytes_delta"] == 70

    # ---- pass 3: i2's second snapshot now emits ----------------------
    _write(spark, [("i2", TS[3], "q1", 1000, 10000)], src)
    out3 = _run(spark, src, ckpt, sink)
    assert set(out3) - set(out2) == {("i2", "q1", TS[3])}
    assert out3[("i2", "q1", TS[3])]["count_star_delta"] == 1


def test_multiple_snapshots_in_one_batch_fold_in_order(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    rows = [
        ("i1", TS[0], "q1", 10, 100),
        ("i1", TS[1], "q1", 25, 250),
        ("i1", TS[2], "q1", 45, 450),
    ]
    _write(spark, rows, src)  # one file -> one micro-batch
    out = _run(spark, src, ckpt, str(tmp_path / "out"))
    assert {(k[2], v["count_star_delta"]) for k, v in out.items()} == {
        (TS[1], 15),
        (TS[2], 20),
    }


def test_bigint_key_column_round_trips_state(spark, tmp_path):
    # a LongType key must survive the array<array<string>> state schema:
    # values are canonicalized to str at the boundary, so the cross-batch
    # dict probe still hits and deltas (not full values) come back
    schema = T.StructType(
        [
            T.StructField("instance_id", T.StringType()),
            T.StructField("snapshot_ts", T.TimestampType()),
            T.StructField("digest_id", T.LongType()),
            T.StructField("count_star", T.LongType()),
        ]
    )
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    def put(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        deltas = DS.stateful_deltas(
            stream, ["digest_id"], [("count_star", T.LongType())]
        )
        DS.run_replay(deltas, ckpt, sink_path=sink)
        return {
            (r["digest_id"], r["snapshot_ts"]): r
            for r in spark.read.parquet(sink).collect()
        }

    put([("i1", TS[0], 123456789012345, 100)])
    run()  # first snapshot: state written, nothing emitted
    put([("i1", TS[1], 123456789012345, 170)])
    out = run()  # second pass resumes from checkpointed bigint-keyed state
    assert set(out) == {("123456789012345", TS[1])}
    assert out[("123456789012345", TS[1])]["count_star_delta"] == 70


def test_null_metric_degrades_to_null_delta(spark, tmp_path):
    # A NULL secondary metric must not kill the stream (TypeError on
    # None < prev); it degrades to a null delta like the batch path.
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    rows = [
        ("i1", TS[0], "q1", 10, 100),
        ("i1", TS[1], "q1", 25, None),  # bytes went null mid-stream
        ("i1", TS[2], "q1", 45, 500),   # and comes back (prev bytes=None -> full value)
    ]
    _write(spark, rows, src)
    out = _run(spark, src, ckpt, str(tmp_path / "out"))
    assert out[("i1", "q1", TS[1])]["count_star_delta"] == 15
    assert out[("i1", "q1", TS[1])]["bytes_delta"] is None
    assert out[("i1", "q1", TS[2])]["count_star_delta"] == 20
    assert out[("i1", "q1", TS[2])]["bytes_delta"] == 500


def test_idempotent_sink_overwrites_same_epoch(spark, tmp_path):
    sink = str(tmp_path / "sink")
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    write = DS.idempotent_parquet_sink(sink)
    write(df, 7)
    write(df, 7)  # retried epoch must not double-count
    assert spark.read.parquet(sink).count() == 1
