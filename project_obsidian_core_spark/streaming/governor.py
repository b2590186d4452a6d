"""Adaptive polling governor — dual-EWMA load tracking driving exponential
collection-interval backoff (SURVEY §2.9 T6-T9, §3.2).

Re-expression of the reference's control-plane algorithm
(adaptive/governor.go:17-391, adaptive/mysql_collector.go:88-113,
docs/adaptive-monitoring.md): pure Python because this is *driver-side*
control logic — it modulates how often the streaming collection triggers,
which no distributed operator can do. The EWMA recurrence is order-dependent
and non-associative, so it must fold sequentially anyway (cardinality =
#instances — tiny).

Wiring into Spark: compute the per-batch load scalar from the metrics
stream inside ``foreachBatch`` (the `qan_load_score` plan is the A11
formula), feed it to :meth:`AdaptiveGovernor.process_load_metrics`, and
apply the returned cadence to the next trigger (restart the trigger or gate
work inside the batch function). State persists as JSON exactly like the
reference so a restarted driver resumes its backoff posture.
"""

from __future__ import annotations

import json
import math
import os
import random
import time
from dataclasses import dataclass

# Reference constants (governor.go:17-34).
HIGH_LOAD_THRESHOLD = 0.7
CRITICAL_LOAD_THRESHOLD = 0.9
FAST_EMA_ALPHA = 0.3
SLOW_EMA_ALPHA = 0.05
MINIMUM_INTERVAL_S = 0.5
MAXIMUM_INTERVAL_S = 60.0
DEFAULT_JITTER_PERCENT = 0.1
STATE_FILE_NAME = "governor_state.json"
#: hysteresis: apply a new interval only if it differs >10% (governor.go:224)
HYSTERESIS = 0.1
#: persisted state older than this is ignored on restore (governor.go:360)
STATE_MAX_AGE_S = 3600.0
#: state snapshot cadence (governor.go:184-188)
SAVE_EVERY_S = 60.0


class EMA:
    """Exponentially weighted moving average (governor.go:38-92).

    First sample initializes the value directly; afterwards
    ``ema += alpha * (x - ema)``.
    """

    def __init__(self, alpha: float) -> None:
        self.alpha = alpha
        self.value = 0.0
        self._initialized = False

    def update(self, x: float) -> None:
        if not self._initialized:
            self.value = x
            self._initialized = True
            return
        self.value = self.value + self.alpha * (x - self.value)

    def set_value(self, x: float) -> None:
        self.value = x
        self._initialized = True

    def reset(self) -> None:
        self.value = 0.0
        self._initialized = False


def calculate_load(
    threads_running: int,
    threads_connected: int,
    slow_queries_diff: int,
    questions_diff: int,
) -> float:
    """Composite load ∈ [0,1] (adaptive/mysql_collector.go:88-113, A11):
    0.7·(threads_running/threads_connected) + 0.3·(slow/questions),
    each ratio clamped to 1, zero when nothing is connected."""
    if threads_connected <= 0:
        return 0.0
    thread_ratio = min(threads_running / threads_connected, 1.0)
    slow_ratio = 0.0
    if questions_diff > 0:
        slow_ratio = min(slow_queries_diff / questions_diff, 1.0)
    return thread_ratio * 0.7 + slow_ratio * 0.3


@dataclass
class GovernorState:
    """Persisted governor posture (governor.go:94-100)."""

    fast_ema_value: float
    slow_ema_value: float
    interval_s: float
    timestamp: float  # unix seconds

    def to_json(self) -> str:
        return json.dumps(
            {
                "fast_ema_value": self.fast_ema_value,
                "slow_ema_value": self.slow_ema_value,
                "interval_ns": int(self.interval_s * 1e9),
                "timestamp": self.timestamp,
            }
        )

    @classmethod
    def from_json(cls, data: str) -> GovernorState:
        d = json.loads(data)
        return cls(
            fast_ema_value=d["fast_ema_value"],
            slow_ema_value=d["slow_ema_value"],
            interval_s=d["interval_ns"] / 1e9,
            timestamp=d["timestamp"],
        )


class AdaptiveGovernor:
    """Threshold + hysteresis interval controller (governor.go:103-260).

    - fast EMA > 0.9  → jump to the 60 s maximum;
    - 0.7 < fast ≤ 0.9 → base · 2^(fast/0.7 − 1), capped at the maximum;
    - otherwise        → base interval;
    - a computed interval is *applied* only when it differs from the current
      one by more than 10% (hysteresis against flapping);
    - reads add ±(jitter/2) uniform noise, floored at 500 ms, to
      de-synchronize pollers across a fleet.
    """

    def __init__(
        self,
        base_interval_s: float = 1.0,
        state_dir: str | None = None,
        jitter_percent: float = DEFAULT_JITTER_PERCENT,
        rng: random.Random | None = None,
        clock=time.time,
    ) -> None:
        self.base_interval_s = max(base_interval_s, MINIMUM_INTERVAL_S)
        self.fast_ema = EMA(FAST_EMA_ALPHA)
        self.slow_ema = EMA(SLOW_EMA_ALPHA)
        self.current_interval_s = self.base_interval_s
        self.jitter_percent = min(max(jitter_percent, 0.0), 0.5)
        self.state_dir = state_dir
        self._rng = rng or random.Random()
        self._clock = clock
        self._last_save = 0.0
        self.interval_change_callback = None
        if state_dir:
            self.restore_state()

    # ------------------------------------------------------------- control
    def process_load_metrics(self, load: float) -> float:
        """Feed one load sample; returns the (raw) current interval."""
        load = min(max(load, 0.0), 1.0)
        self.fast_ema.update(load)
        self.slow_ema.update(load)
        self._adjust_interval()
        now = self._clock()
        if now - self._last_save > SAVE_EVERY_S:
            self.save_state()
            self._last_save = now
        return self.current_interval_s

    def _adjust_interval(self) -> None:
        fast = self.fast_ema.value
        if fast > CRITICAL_LOAD_THRESHOLD:
            new = MAXIMUM_INTERVAL_S
        elif fast > HIGH_LOAD_THRESHOLD:
            multiplier = math.pow(2, fast / HIGH_LOAD_THRESHOLD - 1)
            new = min(self.base_interval_s * multiplier, MAXIMUM_INTERVAL_S)
        else:
            new = self.base_interval_s
        if abs(new - self.current_interval_s) / self.current_interval_s > HYSTERESIS:
            self.current_interval_s = new
            if self.interval_change_callback is not None:
                self.interval_change_callback(new)

    def get_current_interval(self) -> float:
        """Interval with ±(jitter/2) uniform noise, floored at the minimum."""
        interval = self.current_interval_s
        if self.jitter_percent > 0:
            jitter_range = interval * self.jitter_percent
            interval += jitter_range * (0.5 - self._rng.random())
            interval = max(interval, MINIMUM_INTERVAL_S)
        return interval

    def get_raw_interval(self) -> float:
        return self.current_interval_s

    def reset(self) -> None:
        self.fast_ema.reset()
        self.slow_ema.reset()
        self.current_interval_s = self.base_interval_s
        if self.state_dir:
            try:
                os.remove(os.path.join(self.state_dir, STATE_FILE_NAME))
            except OSError:
                pass
        if self.interval_change_callback is not None:
            self.interval_change_callback(self.base_interval_s)

    # --------------------------------------------------------- persistence
    def save_state(self) -> None:
        """Atomic JSON snapshot (tmp + rename, governor.go:292-336)."""
        if not self.state_dir:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        state = GovernorState(
            fast_ema_value=self.fast_ema.value,
            slow_ema_value=self.slow_ema.value,
            interval_s=self.current_interval_s,
            timestamp=self._clock(),
        )
        path = os.path.join(self.state_dir, STATE_FILE_NAME)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(state.to_json())
        os.rename(tmp, path)

    def restore_state(self) -> bool:
        """Restore unless the file is missing or older than 1 h
        (governor.go:339-391). Returns True when state was applied."""
        if not self.state_dir:
            return False
        path = os.path.join(self.state_dir, STATE_FILE_NAME)
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            return False
        if self._clock() - mtime > STATE_MAX_AGE_S:
            return False
        try:
            with open(path) as f:
                state = GovernorState.from_json(f.read())
        except (OSError, ValueError, KeyError):
            return False
        self.fast_ema.set_value(state.fast_ema_value)
        self.slow_ema.set_value(state.slow_ema_value)
        self.current_interval_s = state.interval_s
        self._last_save = state.timestamp
        return True


# ---------------------------------------------------------------- T10 -----
@dataclass
class StatusSample:
    """One global_status scrape (adaptive/mysql_collector.go:14-23, S5)."""

    threads_running: int
    threads_connected: int
    questions: int
    slow_queries: int
    uptime: int
    ts: float  # unix seconds


@dataclass
class StatusDiff:
    """Rates derived from two consecutive samples
    (adaptive/mysql_collector.go:45-85, T10)."""

    questions_diff: int
    slow_queries_diff: int
    elapsed_seconds: float
    qps: float
    slow_qps: float
    load: float


def _counter_delta(curr: int, prev: int) -> int:
    """Reset-aware counter difference (same T3 rule as the snapshot delta)."""
    return curr - prev if curr >= prev else curr


def status_diff(prev: StatusSample, curr: StatusSample) -> StatusDiff:
    """Diff two status scrapes into rates + the composite load scalar.

    Elapsed time is guarded to 1 s when non-positive
    (mysql/adaptive_collector.go:212-216) so rates never divide by zero.
    """
    elapsed = curr.ts - prev.ts
    if elapsed <= 0:
        elapsed = 1.0
    qd = _counter_delta(curr.questions, prev.questions)
    sd = _counter_delta(curr.slow_queries, prev.slow_queries)
    return StatusDiff(
        questions_diff=qd,
        slow_queries_diff=sd,
        elapsed_seconds=elapsed,
        qps=qd / elapsed,
        slow_qps=sd / elapsed,
        load=calculate_load(curr.threads_running, curr.threads_connected, sd, qd),
    )
