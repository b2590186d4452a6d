"""Space-Saving streaming top-k: sketch guarantees (presence of every
true heavy key, estimate bounds, bounded summary size) on a skewed
multi-batch replay, plus pure-fold unit checks."""

from __future__ import annotations

import random
from collections import Counter

from project_obsidian_core_spark.streaming.topk_state import (
    fold_space_saving,
    streaming_topk,
)


def test_fold_guarantees_small():
    # capacity 3, stream: a x5, b x3, c x2, d x1, e x4 folded one by one
    s = {}
    stream = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"] + ["e"] * 4
    for k in stream:
        fold_space_saving(s, 3, [(k, 1)])
    n = len(stream)
    true = Counter(stream)
    assert len(s) == 3
    for k, (est, err) in s.items():
        # overestimate-only, by at most the recorded error
        assert true[k] <= est <= true[k] + err
    # any key with freq > n/capacity must be present
    for k, c in true.items():
        if c > n / 3:
            assert k in s


def test_streaming_replay_bounds(spark, tmp_path):
    rng = random.Random(7)
    rows = []
    for i in range(4000):
        if i % 10 < 6:
            rows.append(f"hot_{i % 12}")        # 60% over 12 hot keys
        else:
            rows.append(f"tail_{rng.randrange(100000)}")  # huge key space
    true = Counter(rows)
    src = str(tmp_path / "src")
    chunk = 500
    for i in range(0, len(rows), chunk):
        spark.createDataFrame(
            [(k,) for k in rows[i : i + chunk]], "key string"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_topk(stream, n_shards=4, capacity=32)
    q = (
        out.writeStream.format("memory")
        .queryName("topk_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    emitted = spark.table("topk_replay").collect()
    vmax: dict[int, int] = {}
    for r in emitted:
        vmax[r["shard"]] = max(vmax.get(r["shard"], 0), r["version"])
    final = [r for r in emitted if r["version"] == vmax[r["shard"]]]
    # summary size bound: capacity per shard
    per_shard = Counter(r["shard"] for r in final)
    assert all(c <= 32 for c in per_shard.values())
    est = {r["key"]: (r["est_count"], r["err_bound"]) for r in final}
    # every hot key present with a sound bracket
    for k, c in true.items():
        if k.startswith("hot_"):
            assert k in est, k
            e, b = est[k]
            assert c <= e <= c + b
    # every reported estimate is an overestimate by at most its bound
    for k, (e, b) in est.items():
        assert true[k] <= e <= true[k] + b
