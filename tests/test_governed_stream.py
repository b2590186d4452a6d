"""Integration: a live writeStream whose trigger cadence follows the
governor (§3.2 closed loop, adaptive/mysql_collector.go:136-229).

Replays a load ramp through a real file-source streaming query
(maxFilesPerTrigger=1 → one status scrape per micro-batch) and asserts the
interval transitions: base → backoff → 60 s critical jump → recovery to
base after the load drops. trigger_scale compresses governor seconds into
trigger milliseconds so the test runs in wall-clock seconds.
"""

from __future__ import annotations

import random
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from project_obsidian_core_spark.streaming.governed_stream import GovernedStreamRunner
from project_obsidian_core_spark.streaming.governor import (
    MAXIMUM_INTERVAL_S,
    AdaptiveGovernor,
)

SCHEMA = T.StructType(
    [
        T.StructField("threads_running", T.LongType()),
        T.StructField("threads_connected", T.LongType()),
        T.StructField("slow_queries_diff", T.LongType()),
        T.StructField("questions_diff", T.LongType()),
    ]
)

_file_seq = iter(range(10_000))


def _write_status(src: str, running: int, connected: int, slow: int, questions: int):
    """One scrape file == one micro-batch (maxFilesPerTrigger=1)."""
    table = pa.table(
        {
            "threads_running": pa.array([running], pa.int64()),
            "threads_connected": pa.array([connected], pa.int64()),
            "slow_queries_diff": pa.array([slow], pa.int64()),
            "questions_diff": pa.array([questions], pa.int64()),
        }
    )
    pq.write_table(table, f"{src}/scrape-{next(_file_seq):05d}.parquet")


def _wait_until(cond, timeout_s: float, what: str):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if cond():
            return
        time.sleep(0.05)
    pytest.fail(f"timed out waiting for {what}")


def test_governed_trigger_follows_load_ramp(spark, tmp_path):
    src = tmp_path / "status_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def start_query(trigger_s, foreach_batch_fn):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        ms = max(1, int(round(trigger_s * 1000)))
        return (
            stream.writeStream.option("checkpointLocation", ckpt)
            .trigger(processingTime=f"{ms} milliseconds")
            .foreachBatch(foreach_batch_fn)
            .start()
        )

    gov = AdaptiveGovernor(base_interval_s=0.5, jitter_percent=0.0, rng=random.Random(1))
    runner = GovernedStreamRunner(
        gov, start_query, trigger_scale=0.02, poll_s=0.02
    )
    stop = threading.Event()
    t = threading.Thread(target=runner.run, args=(120.0, stop), daemon=True)
    t.start()
    try:
        # phase 1: idle — interval stays at base
        for _ in range(3):
            _write_status(str(src), 0, 10, 0, 100)
        _wait_until(lambda: len(runner.loads_seen) >= 3, 30, "idle scrapes")
        assert runner.applied_intervals == [0.5]

        # phase 2: saturation (load 1.0 per scrape) — fast EMA climbs through
        # the backoff band into the critical jump
        for _ in range(10):
            _write_status(str(src), 10, 10, 50, 50)
        _wait_until(
            lambda: MAXIMUM_INTERVAL_S in runner.applied_intervals,
            40,
            "critical 60s interval",
        )
        ramp = runner.applied_intervals
        assert ramp[0] == 0.5
        # cadence only ever slowed during the ramp (hysteresis-gated)
        assert all(a < b for a, b in zip(ramp, ramp[1:]))

        # phase 3: load vanishes — one calm scrape drops fast EMA under the
        # high-load threshold and the interval snaps back to base
        for _ in range(4):
            _write_status(str(src), 0, 10, 0, 100)
        _wait_until(
            lambda: runner.applied_intervals[-1] == 0.5, 40, "recovery to base"
        )
        # back at base cadence the remaining calm scrapes drain quickly
        _wait_until(lambda: len(runner.loads_seen) >= 17, 30, "all scrapes")
    finally:
        stop.set()
        t.join(timeout=30)

    # every scrape was processed exactly once across ≥2 query restarts
    # (same checkpoint pins offsets — a restart is a cadence change, not a
    # reprocess); a crash-replayed batch could only add samples, never lose
    assert len(runner.loads_seen) >= 17
    assert len(runner.applied_intervals) >= 3
