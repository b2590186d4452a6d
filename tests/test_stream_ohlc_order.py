"""stream_ohlc's core claim: the struct-min/max open/close aggregation is
arrival-order independent — two replays of the SAME rows split into
micro-batches in OPPOSITE orders must produce identical candles."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _candles(spark, tmp_path, rows, tag):
    src = str(tmp_path / f"src_{tag}")
    # one file per row -> maxFilesPerTrigger=1 forces one row per batch,
    # in file order: writing reversed rows reverses the arrival order
    for i, r in enumerate(rows):
        spark.createDataFrame([r], "ts timestamp, v long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = stream.groupBy(
        (F.expr("unix_micros(ts) div 300000000") * 300).alias("bucket")
    ).agg(
        F.min(F.struct("ts", "v")).alias("_open"),
        F.max(F.struct("ts", "v")).alias("_close"),
        F.sum("v").alias("volume"),
    )
    name = f"ohlc_order_{tag}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return sorted(
        (r["bucket"], r["_open"]["v"], r["_close"]["v"], r["volume"])
        for r in spark.table(name).collect()
    )


def test_opposite_arrival_orders_agree(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(seconds=10 * i), (i * 37) % 100) for i in range(8)
    ]
    fwd = _candles(spark, tmp_path, rows, "fwd")
    rev = _candles(spark, tmp_path, list(reversed(rows)), "rev")
    assert fwd == rev
    assert fwd  # non-empty
