"""Watermarked streaming rollup: on-time aggregation, late-row dropping."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from project_obsidian_core_spark.streaming import windowed as W

SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("instance_id", T.StringType()),
        T.StructField("db_system", T.StringType()),
        T.StructField("metric_name", T.StringType()),
        T.StructField("metric_value", T.DoubleType()),
        T.StructField("metric_max", T.DoubleType()),
        T.StructField("metric_min", T.DoubleType()),
    ]
)

T0 = dt.datetime(2026, 3, 1, 12, 0, 0)


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, ckpt, sink):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = W.streaming_metrics_rollup(stream, watermark="30 seconds", granularity="1 minute")
    q = (
        agg.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, eid: df.write.mode("overwrite").parquet(f"{sink}/_b={eid}"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    try:
        return {
            (r["window_start"], r["metric_name"]): r
            for r in spark.read.parquet(sink).collect()
        }
    except Exception:
        return {}


def _row(ts, value, name="mysql.questions"):
    return (ts, "i1", "mysql", name, value, value, value)


def test_windows_finalize_and_late_rows_drop(spark, tmp_path):
    src, ckpt, sink = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")

    # batch 1: two rows in minute-0, watermark driver at minute-5
    _write(spark, [_row(T0, 5.0), _row(T0 + dt.timedelta(seconds=20), 7.0),
                   _row(T0 + dt.timedelta(minutes=5), 1.0)], src)
    out1 = _run(spark, src, ckpt, sink)
    key0 = (T0, "mysql.questions")
    assert key0 in out1  # minute-0 window finalized (watermark = 5min-30s)
    assert out1[key0]["metric_value"] == 12.0
    assert out1[key0]["metric_max"] == 7.0 and out1[key0]["metric_min"] == 5.0
    assert out1[key0]["n_rows"] == 2
    # minute-5 window is NOT final yet (watermark hasn't passed its end)
    assert (T0 + dt.timedelta(minutes=5), "mysql.questions") not in out1

    # batch 2: a straggler for minute-0 — behind the watermark, dropped
    _write(spark, [_row(T0 + dt.timedelta(seconds=30), 100.0),
                   _row(T0 + dt.timedelta(minutes=6), 2.0)], src)
    out2 = _run(spark, src, ckpt, sink)
    # the late 100.0 must not re-open or alter the finalized minute-0 window
    finalized = [k for k in out2 if k[0] == T0]
    assert finalized == [key0]
    assert out2[key0]["metric_value"] == 12.0


def test_stream_dedup_drops_redelivered_rows(spark, tmp_path):
    src, ckpt, sink = str(tmp_path / "ds"), str(tmp_path / "dc"), str(tmp_path / "do")
    ev_schema = T.StructType(
        [
            T.StructField("time", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )

    def write(rows):
        spark.createDataFrame(rows, ev_schema).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(ev_schema).parquet(src)
        deduped = W.dedup_event_stream(stream, ["event_id"], watermark="1 hour")
        q = (
            deduped.writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, eid: df.write.mode("overwrite").parquet(f"{sink}/_b={eid}"))
            .outputMode("append")
            .start()
        )
        q.processAllAvailable(); q.stop(); q.awaitTermination()
        return spark.read.parquet(sink).collect()

    write([(T0, 1, 1.0), (T0, 1, 1.0), (T0, 2, 2.0)])   # in-batch duplicate
    out1 = run()
    assert sorted(r["event_id"] for r in out1) == [1, 2]

    # redelivery in a later micro-batch, inside the watermark horizon
    write([(T0, 1, 1.0), (T0 + dt.timedelta(minutes=1), 3, 3.0)])
    out2 = run()
    assert sorted(r["event_id"] for r in out2) == [1, 2, 3]
