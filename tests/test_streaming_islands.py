"""Stateful streaming islands: pure-fold edge cases and shuffled-replay
equivalence against the batch interval_merge operator."""

from __future__ import annotations

import datetime as dt
import random

import numpy as np

from project_obsidian_core_spark.streaming.interval_state import (
    fold_interval,
    streaming_islands,
)

T0 = dt.datetime(2024, 1, 1)


def _fold_all(pairs):
    s = np.empty(0, dtype=np.int64)
    e = np.empty(0, dtype=np.int64)
    n = np.empty(0, dtype=np.int64)
    for a, b in pairs:
        s, e, n = fold_interval(s, e, n, a, b)
    return list(zip(s.tolist(), e.tolist(), n.tolist()))


def test_fold_insert_merge_touch_contain():
    assert _fold_all([(10, 20)]) == [(10, 20, 1)]
    # disjoint before / after
    assert _fold_all([(10, 20), (30, 40), (0, 5)]) == [
        (0, 5, 1), (10, 20, 1), (30, 40, 1),
    ]
    # touching merges (end == next start)
    assert _fold_all([(10, 20), (20, 30)]) == [(10, 30, 2)]
    # containment keeps the outer bounds
    assert _fold_all([(10, 50), (20, 30)]) == [(10, 50, 2)]
    # one interval bridges three islands
    assert _fold_all([(0, 5), (10, 15), (20, 25), (4, 21)]) == [(0, 25, 4)]


def test_shuffled_replay_matches_batch(spark, tmp_path):
    from project_obsidian_core_spark.operators.intervals import interval_merge

    rng = random.Random(88)
    rows = []
    for k in ("a", "b"):
        for _ in range(40):
            s = rng.randrange(0, 600)
            rows.append((k, s, s + rng.randrange(5, 60)))
    # batch truth
    bdf = spark.createDataFrame(
        [
            (k, T0 + dt.timedelta(minutes=s), T0 + dt.timedelta(minutes=e))
            for k, s, e in rows
        ],
        "k string, s timestamp, e timestamp",
    )
    truth = sorted(
        (
            r["k"],
            int((r["island_start"] - T0).total_seconds() // 60),
            int((r["island_end"] - T0).total_seconds() // 60),
            r["n_intervals"],
        )
        for r in interval_merge(bdf, ["k"], "s", "e").collect()
    )
    # streaming replay in SHUFFLED order, multiple files -> multiple batches
    shuffled = rows[:]
    rng.shuffle(shuffled)
    src = str(tmp_path / "src")
    chunk = 10
    for i in range(0, len(shuffled), chunk):
        spark.createDataFrame(
            [
                (k, s * 60_000_000, e * 60_000_000)
                for k, s, e in shuffled[i : i + chunk]
            ],
            "k string, start_us long, end_us long",
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("k string, start_us long, end_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_islands(stream, ["k"])
    q = (
        out.writeStream.format("memory")
        .queryName("islands_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    emitted = spark.table("islands_replay").collect()
    latest = {}
    for r in emitted:
        latest[r["k"]] = max(latest.get(r["k"], 0), r["version"])
    got = sorted(
        (
            r["k"],
            r["island_start_us"] // 60_000_000,
            r["island_end_us"] // 60_000_000,
            r["n_intervals"],
        )
        for r in emitted
        if r["version"] == latest[r["k"]]
    )
    assert got == truth


def test_non_string_group_key(spark, tmp_path):
    """The emitted schema takes key field types from the input relation:
    grouping by a LONG host_id must round-trip, not die in Arrow
    conversion against a hardcoded string field."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(7, 0, 600_000_000), (7, 540_000_000, 900_000_000), (8, 0, 60_000_000)],
        "host_id long, start_us long, end_us long",
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("host_id long, start_us long, end_us long")
        .parquet(src)
    )
    out = streaming_islands(stream, ["host_id"])
    assert out.schema["host_id"].dataType.simpleString() == "bigint"
    q = (
        out.writeStream.format("memory")
        .queryName("islands_longkey")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = sorted(
        (r["host_id"], r["island_start_us"], r["island_end_us"], r["n_intervals"])
        for r in spark.table("islands_longkey").collect()
    )
    assert got == [(7, 0, 900_000_000, 2), (8, 0, 60_000_000, 1)]


def test_watermark_eviction_finals_plus_live_equal_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.operators.intervals import interval_merge

    # time-ordered feed: bursts of overlapping intervals separated by
    # wide gaps, so earlier islands close long before the stream ends
    rows = []
    for burst in range(6):
        base = burst * 1000  # minutes; gaps >> interval widths
        for j in range(8):
            s = base + j * 3
            rows.append(("a", s, s + 5))
    bdf = spark.createDataFrame(
        [
            (k, T0 + dt.timedelta(minutes=s), T0 + dt.timedelta(minutes=e))
            for k, s, e in rows
        ],
        "k string, s timestamp, e timestamp",
    )
    truth = sorted(
        (
            int((r["island_start"] - T0).total_seconds() // 60),
            int((r["island_end"] - T0).total_seconds() // 60),
            r["n_intervals"],
        )
        for r in interval_merge(bdf, ["k"], "s", "e").collect()
    )
    base_us = int(T0.timestamp()) * 1_000_000
    src = str(tmp_path / "src")
    for i in range(0, len(rows), 8):  # one burst per file -> per batch
        spark.createDataFrame(
            [
                (k, base_us + s * 60_000_000, base_us + e * 60_000_000)
                for k, s, e in rows[i : i + 8]
            ],
            "k string, start_us long, end_us long",
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("k string, start_us long, end_us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.col("start_us")))
        .withWatermark("ts", "1 minute")
    )
    from project_obsidian_core_spark.streaming.interval_state import (
        streaming_islands,
    )

    out = streaming_islands(stream, ["k"], evict=True)
    q = (
        out.writeStream.format("memory")
        .queryName("islands_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    emitted = spark.table("islands_evict").collect()
    finals = [r for r in emitted if r["is_final"]]
    assert finals, "watermark eviction never fired"
    live = [r for r in emitted if not r["is_final"]]
    vmax = max(r["version"] for r in live)
    current = finals + [r for r in live if r["version"] == vmax]
    got = sorted(
        (
            (r["island_start_us"] - base_us) // 60_000_000,
            (r["island_end_us"] - base_us) // 60_000_000,
            r["n_intervals"],
        )
        for r in current
    )
    assert got == truth


# The MOR streaming sink test lives here to reuse this module's replay
# helpers' style; it pins the fourth corner of the CDC quadrant.
def test_streaming_mor_sink_matches_batch_merge(spark, tmp_path):
    from project_obsidian_core_spark.operators.merge import (
        merge_upsert,
        read_mor,
        write_mor_base,
    )
    from project_obsidian_core_spark.streaming.mor_sink import mor_delta_sink

    path = str(tmp_path / "mor")
    base = spark.range(0, 500).selectExpr(
        "id AS k", "CAST(id % 11 AS STRING) AS v"
    )
    write_mor_base(base, path)
    # a CDC change feed: updates, deletes, inserts across several batches
    changes = [
        (i, f"u{i}", "U") if i % 3 == 0 else
        (i, "x", "D") if i % 3 == 1 else
        (500 + i, f"n{i}", "I")
        for i in range(0, 120)
    ]
    src = str(tmp_path / "feed")
    for i in range(0, len(changes), 30):
        spark.createDataFrame(
            changes[i : i + 30], "k long, v string, op string"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("k long, v string, op string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            mor_delta_sink(path, keys=["k"], compact_threshold_frac=None)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["k"]: r["v"] for r in read_mor(spark, path, keys=["k"]).collect()}
    # batch truth: one-shot MERGE of the whole feed (keys are disjoint
    # across ops here, so one batch == the sequential fold)
    cdf = spark.createDataFrame(changes, "k long, v string, op string")
    truth = {
        r["k"]: r["v"]
        for r in merge_upsert(base, cdf, keys=["k"]).collect()
    }
    assert got == truth
    # compacting sink variant: same result, ledger folded away
    path2 = str(tmp_path / "mor2")
    write_mor_base(base, path2)
    q2 = (
        spark.readStream.schema("k long, v string, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            mor_delta_sink(path2, keys=["k"], compact_threshold_frac=0.0)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    got2 = {
        r["k"]: r["v"] for r in read_mor(spark, path2, keys=["k"]).collect()
    }
    assert got2 == truth
