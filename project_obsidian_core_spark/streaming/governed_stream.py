"""Governor-driven streaming collection — §3.2's last step.

The reference resets its collection ticker from the governor's
interval-change callback (adaptive/mysql_collector.go:136-145; the
collection loop re-reads the interval after every scrape,
adaptive_collector.go:148-229). The Structured-Streaming analogue: the
scrape cadence IS the micro-batch trigger, so the governor modulates the
query's ``processingTime`` trigger —

- every micro-batch computes the load scalar from its own rows (the A11
  composite) inside ``foreachBatch`` and feeds it to
  :class:`~project_obsidian_core_spark.streaming.governor.AdaptiveGovernor`;
- when the governor's hysteresis gate actually APPLIES a new interval, its
  ``interval_change_callback`` fires; the runner then restarts the query
  with the new trigger against the SAME checkpoint, so state (offsets,
  stateful operators) carries across the cadence change exactly like the
  reference's ticker reset carries its SnapshotStore;
- restarts happen on the runner's thread, never inside the batch function
  (the callback only records the pending interval).

Scale notes: the load aggregation is one tiny job per micro-batch (an AVG
over the batch), and the restart is control-plane only — no data is
reprocessed because the checkpoint pins offsets. At fleet scale one runner
governs one source stream, mirroring one reference collector per database.

Not oracle-expressible (a stateful control loop over wall-clock triggers),
so it is pinned by the load-ramp integration test
(tests/test_governed_stream.py) rather than a driver-gate SQL oracle.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from project_obsidian_core_spark.streaming.governor import (
    AdaptiveGovernor,
    calculate_load,
)

#: start_query(trigger_interval_s, foreach_batch_fn) -> StreamingQuery
StartQuery = Callable[[float, Callable[[DataFrame, int], None]], object]


def status_batch_load(batch_df: DataFrame) -> float | None:
    """A11 composite load from a micro-batch of status scrapes.

    Expects columns ``threads_running``, ``threads_connected``,
    ``slow_queries_diff``, ``questions_diff``; returns the mean per-row
    composite, or None for an empty batch (no governor update — the
    reference skips ticks whose scrape failed).
    """
    rows = (
        batch_df.select(
            F.avg("threads_running").alias("tr"),
            F.avg("threads_connected").alias("tc"),
            F.avg("slow_queries_diff").alias("sd"),
            F.avg("questions_diff").alias("qd"),
        )
        .collect()
    )
    if not rows or rows[0]["tc"] is None:
        return None
    r = rows[0]
    return calculate_load(r["tr"], r["tc"], r["sd"], r["qd"])


class GovernedStreamRunner:
    """Run a streaming query whose trigger cadence follows the governor.

    ``start_query`` owns source/sink wiring and MUST reuse one checkpoint
    dir across calls (that is what makes a restart a cadence change rather
    than a reprocess). ``trigger_scale`` compresses governor seconds into
    trigger seconds for tests (1.0 in production).
    """

    def __init__(
        self,
        governor: AdaptiveGovernor,
        start_query: StartQuery,
        load_from_batch: Callable[[DataFrame], float | None] = status_batch_load,
        batch_sink: Callable[[DataFrame, int], None] | None = None,
        trigger_scale: float = 1.0,
        poll_s: float = 0.05,
    ) -> None:
        self.governor = governor
        self.start_query = start_query
        self.load_from_batch = load_from_batch
        self.batch_sink = batch_sink
        self.trigger_scale = trigger_scale
        self.poll_s = poll_s
        self.applied_intervals: list[float] = []
        self.loads_seen: list[float] = []
        self._pending_interval: float | None = None
        # guards _pending_interval: written by the foreachBatch thread,
        # read-and-cleared by the runner thread — without the lock a write
        # landing between the runner's read and clear would be lost and the
        # query would idle on a stale cadence until the governor re-fires
        self._pending_lock = threading.Lock()
        governor.interval_change_callback = self._on_interval_change

    # -- called from the micro-batch thread --------------------------------
    def _foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        load = self.load_from_batch(batch_df)
        if load is not None:
            self.loads_seen.append(load)
            self.governor.process_load_metrics(load)
        if self.batch_sink is not None:
            self.batch_sink(batch_df, epoch_id)

    def _on_interval_change(self, new_interval_s: float) -> None:
        # hysteresis already passed inside the governor; just record — the
        # restart happens on the runner thread, not the batch thread
        with self._pending_lock:
            self._pending_interval = new_interval_s

    # -- runner thread ------------------------------------------------------
    def run(self, duration_s: float, stop_event=None) -> None:
        """Drive the governed query for ``duration_s`` wall seconds."""
        interval = self.governor.get_raw_interval()
        query = self.start_query(interval * self.trigger_scale, self._foreach_batch)
        self.applied_intervals.append(interval)
        deadline = time.monotonic() + duration_s
        try:
            while time.monotonic() < deadline:
                if stop_event is not None and stop_event.is_set():
                    return
                with self._pending_lock:  # atomic take: no lost update
                    pending, self._pending_interval = self._pending_interval, None
                if pending is not None:
                    query.stop()
                    query.awaitTermination()
                    query = self.start_query(
                        pending * self.trigger_scale, self._foreach_batch
                    )
                    self.applied_intervals.append(pending)
                time.sleep(self.poll_s)
        finally:
            query.stop()
            query.awaitTermination()
