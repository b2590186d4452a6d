"""T17 streaming discovery timeline: shuffled replay ≡ batch A38, and the
retroactive-rank case an emit-on-first-sight design would get wrong."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from project_obsidian_core_spark.streaming.discovery_state import (
    fold_first_seen,
    streaming_discovery,
)


def _batch_timeline(spark, df):
    """The A38 batch formulation over the same rows (ts_us ints)."""
    first = df.groupBy("user_id", "event_type").agg(
        F.min(F.struct(F.unix_micros("ts").alias("ts_us"), "event_id")).alias("f")
    )
    w = Window.partitionBy("user_id").orderBy("f.ts_us", "f.event_id")
    return {
        (r.user_id, r.event_type): (r.ts_us, r.eid, r.rank)
        for r in first.select(
            "user_id",
            "event_type",
            F.col("f.ts_us").alias("ts_us"),
            F.col("f.event_id").alias("eid"),
            F.row_number().over(w).alias("rank"),
        ).collect()
    }


def _final_rows(spark, table):
    """Max-version rows per user (the superseding-emission read rule)."""
    t = spark.table(table)
    w = Window.partitionBy("user_id")
    return {
        (r.user_id, r.event_type): (r.first_ts_us, r.first_event_id, r.discovery_rank)
        for r in t.withColumn("vmax", F.max("version").over(w))
        .filter(F.col("version") == F.col("vmax"))
        .collect()
    }


def test_fold_out_of_order_min(spark):
    seen = {}
    fold_first_seen(seen, [("a", 100, 5), ("b", 50, 9)])
    fold_first_seen(seen, [("a", 60, 7)])   # earlier arrival, late batch
    fold_first_seen(seen, [("a", 60, 3)])   # same ts, smaller id wins
    assert seen == {"a": (60, 3), "b": (50, 9)}


def test_shuffled_replay_matches_batch(spark, tmp_path):
    rng = random.Random(42)
    t0 = 1_700_000_000
    rows = []
    eid = 0
    for u in range(6):
        for i in range(40):
            eid += 1
            rows.append(
                (
                    eid,
                    datetime.datetime.utcfromtimestamp(t0 + rng.randrange(5000)),
                    u,
                    rng.choice(["view", "click", "purchase", "signup"]),
                )
            )
    rng.shuffle(rows)  # arrival order unrelated to event time
    src = str(tmp_path / "src")
    chunk = 60
    for i in range(0, len(rows), chunk):
        spark.createDataFrame(
            rows[i : i + chunk], ["event_id", "ts", "user_id", "event_type"]
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_discovery(stream)
        .writeStream.format("memory")
        .queryName("disc_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    batch_df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    assert _final_rows(spark, "disc_replay") == _batch_timeline(spark, batch_df)


def test_retroactive_rank_reshuffle_is_superseded(spark, tmp_path):
    # batch 1: user sees B then A (ranks B=1, A=2); batch 2 delivers a LATE
    # earlier A occurrence -> final ranks must flip to A=1, B=2
    t0 = 1_700_000_000
    b1 = [
        (10, datetime.datetime.utcfromtimestamp(t0 + 100), 1, "B"),
        (11, datetime.datetime.utcfromtimestamp(t0 + 200), 1, "A"),
    ]
    b2 = [(12, datetime.datetime.utcfromtimestamp(t0 + 50), 1, "A")]
    src = str(tmp_path / "src")
    for rows in (b1, b2):
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_discovery(stream)
        .writeStream.format("memory")
        .queryName("disc_retro")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    final = _final_rows(spark, "disc_retro")
    assert final[(1, "A")][2] == 1 and final[(1, "A")][0] == (t0 + 50) * 1_000_000
    assert final[(1, "B")][2] == 2
    # and the pre-correction emission existed (version superseded, not absent)
    all_rows = spark.table("disc_retro").collect()
    assert any(r.event_type == "A" and r.discovery_rank == 2 for r in all_rows)
