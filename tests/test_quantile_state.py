"""Deterministic-KLL streaming quantiles: exact-regime order statistics,
compaction-regime rank-error bounds, replay determinism, state
round-trip, ladder size bounds — pure-python and through the stream."""

from __future__ import annotations

import random
from math import ceil

from project_obsidian_core_spark.streaming.quantile_state import (
    KllSketch,
    streaming_quantiles,
)

QS = (0.5, 0.9, 0.99)


def _true_rank_band(sorted_vals, v):
    """(min_rank, max_rank) of value v in the sorted list (1-based)."""
    import bisect

    lo = bisect.bisect_left(sorted_vals, v) + 1
    hi = bisect.bisect_right(sorted_vals, v)
    return lo, hi


def test_exact_regime_is_lower_order_statistic():
    rng = random.Random(3)
    vals = [rng.randrange(-(10**6), 10**6) for _ in range(1000)]
    s = KllSketch(capacity=2048)
    s.add_many(vals)
    assert s.err_bound == 0
    srt = sorted(vals)
    for q in QS + (0.01, 1.0):
        assert s.quantile(q) == srt[max(1, ceil(q * len(vals))) - 1]


def test_compaction_rank_error_within_emitted_bound():
    rng = random.Random(5)
    vals = [rng.randrange(10**9) for _ in range(20000)]
    s = KllSketch(capacity=64)
    # feed in uneven chunks to exercise repeated multi-level compaction
    i = 0
    while i < len(vals):
        step = rng.randrange(1, 700)
        s.add_many(vals[i : i + step])
        i += step
    assert s.err_bound > 0
    srt = sorted(vals)
    for q in QS:
        got = s.quantile(q)
        target = max(1, ceil(q * len(vals)))
        lo, hi = _true_rank_band(srt, got)
        # some achievable rank of the returned value is within the bound
        dist = 0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
        assert dist <= s.err_bound, (q, dist, s.err_bound)


def test_same_splits_fold_identically_and_state_roundtrips():
    rng = random.Random(9)
    vals = [rng.randrange(10**6) for _ in range(5000)]
    splits = [vals[i : i + 333] for i in range(0, len(vals), 333)]
    a, b = KllSketch(64), KllSketch(64)
    for chunk in splits:
        a.add_many(chunk)
        # b round-trips through dump/load between every chunk (the state
        # boundary every micro-batch crosses)
        b.add_many(chunk)
        b = KllSketch.load(64, *b.dump())
    assert a.dump() == b.dump()
    for q in QS:
        assert a.quantile(q) == b.quantile(q)


def test_ladder_stays_bounded():
    s = KllSketch(capacity=32)
    s.add_many(range(100_000))
    # every buffer respects capacity after compaction settles
    assert all(len(b) <= 32 for b in s.buffers)
    # ladder depth is logarithmic: 100k items at c=32 -> ~log2(100k/32)+2
    assert len(s.buffers) <= 14


def test_streaming_compaction_regime_bounds(spark, tmp_path):
    """End-to-end through applyInPandasWithState at a compacting
    capacity: err_bound > 0 is emitted and the drained quantiles honour
    it against the exact batch answer."""
    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = [("s", rng.randrange(10**6)) for _ in range(3000)]
    src = str(tmp_path / "src")
    chunk = 600
    for i in range(0, len(rows), chunk):
        spark.createDataFrame(
            rows[i : i + chunk], "series string, v long"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("series string, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_quantiles(stream, "series", "v", capacity=128)
    q = (
        out.writeStream.format("memory")
        .queryName("quant_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    emitted = spark.table("quant_replay")
    vmax = emitted.agg(F.max("version")).collect()[0][0]
    latest = {r["q_pct"]: r for r in emitted.where(F.col("version") == vmax).collect()}
    srt = sorted(v for _, v in rows)
    assert latest[50]["n"] == len(rows)
    assert latest[50]["err_bound"] > 0
    for pct, row in latest.items():
        target = max(1, ceil(pct / 100 * len(rows)))
        lo, hi = _true_rank_band(srt, row["value"])
        dist = 0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
        assert dist <= row["err_bound"]
