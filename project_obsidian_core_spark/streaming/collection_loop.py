"""Adaptive collection loop — the reference's ticker pipeline (T1, §3.2).

``qanProcessor.Start`` spawns one goroutine per database with a
``time.Ticker``; in adaptive mode the tick interval is re-read from the
governor after every collection (adaptive_collector.go:148-229). The Spark
equivalent is a driver-side loop: each tick performs one scrape→delta→emit
cycle (a bounded Spark job), feeds the measured load to the governor, and
sleeps the governor's jittered interval until the next tick.

Injectable clock/sleep make the loop deterministic under test; in
production ``run(stop_event=...)`` is the long-running collection thread.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from project_obsidian_core_spark.streaming.governor import AdaptiveGovernor


class AdaptiveCollectionLoop:
    """Drive collect→load→governor→sleep ticks.

    ``collect_fn`` performs one full collection cycle (scrape the source,
    run the delta pass, append to the rollup) and returns the load scalar
    it observed ∈ [0,1] — the composite of §A11/T10, or 0.0 when load
    cannot be measured.
    """

    def __init__(
        self,
        governor: AdaptiveGovernor,
        collect_fn: Callable[[], float],
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.governor = governor
        self.collect_fn = collect_fn
        self._sleep = sleep
        self.ticks = 0

    def run_once(self) -> float:
        """One tick: collect, update the governor, return the *jittered*
        interval to sleep before the next tick."""
        load = self.collect_fn()
        self.governor.process_load_metrics(load)
        self.ticks += 1
        return self.governor.get_current_interval()

    def run(self, max_ticks: int | None = None, stop_event=None) -> None:
        """Tick until ``max_ticks`` or ``stop_event`` (threading.Event)."""
        while max_ticks is None or self.ticks < max_ticks:
            if stop_event is not None and stop_event.is_set():
                return
            interval = self.run_once()
            self._sleep(interval)
