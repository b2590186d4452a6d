"""T19 streaming priority sample: commutative-fold invariance, O(k)
state, batch equivalence through the real stream operator."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from project_obsidian_core_spark.streaming.sample_state import (
    fold_topk,
    streaming_priority_sample,
)


def test_fold_is_order_and_split_invariant():
    rng = random.Random(4)
    triples = [(rng.randrange(10**9), i, 1 + rng.randrange(50)) for i in range(500)]
    ref = sorted(triples, key=lambda t: (t[0], t[1]))[:7]
    for trial in range(5):
        shuffled = triples[:]
        rng.shuffle(shuffled)
        sample: list = []
        i = 0
        while i < len(shuffled):
            step = rng.randrange(1, 120)
            fold_topk(sample, 7, shuffled[i : i + step])
            i += step
        assert sample == ref
        assert len(sample) == 7  # O(k) forever


def test_fold_partial_fill():
    sample: list = []
    fold_topk(sample, 5, [(10, 1, 2), (3, 2, 9)])
    assert sample == [(3, 2, 9), (10, 1, 2)]


def test_stream_equals_batch_sampler(spark, tmp_path):
    from project_obsidian_core_spark.datapipe.curation import priority_sample

    rng = random.Random(21)
    rows = [(i, f"g{i % 3}", 1 + rng.randrange(200)) for i in range(300)]
    batch = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    expect = sorted(
        (r["grp"], r["doc_id"], r["prio"])
        for r in priority_sample(batch, 5, F.col("w"), group_cols=("grp",)).collect()
    )

    src = str(tmp_path / "src")
    for i in range(0, len(rows), 60):
        spark.createDataFrame(
            rows[i : i + 60], "doc_id long, grp string, w long"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, grp string, w long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_priority_sample(stream, 5, F.col("w"), group_col="grp")
    q = (
        out.writeStream.format("memory")
        .queryName("ps_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    emitted = spark.table("ps_replay")
    from pyspark.sql import Window

    w = Window.partitionBy("grp")
    latest = emitted.withColumn("_m", F.max("version").over(w)).filter(
        F.col("version") == F.col("_m")
    )
    got = sorted((r["grp"], r["id"], r["prio"]) for r in latest.collect())
    assert got == expect
