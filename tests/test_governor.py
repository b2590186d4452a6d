"""Governor golden tests — vectors from the reference's hand-computed
expectations (adaptive/governor_test.go) and threshold/persistence behavior.
No Spark session needed: this is pure driver-side control logic.
"""

from __future__ import annotations

import random

import pytest

from project_obsidian_core_spark.streaming import governor as G


# ------------------------------------------------------------------ EMA ---
def test_ema_golden_vectors():
    # governor_test.go EMA expectations: first sample initializes; then
    # 0.3*200 + 0.7*100 = 130; 0.3*300 + 0.7*130 = 181
    ema = G.EMA(0.3)
    ema.update(100)
    assert ema.value == 100
    ema.update(200)
    assert ema.value == pytest.approx(130.0)
    ema.update(300)
    assert ema.value == pytest.approx(181.0)


def test_ema_reset_and_set():
    ema = G.EMA(0.5)
    ema.update(10)
    ema.reset()
    ema.update(42)          # first sample after reset initializes again
    assert ema.value == 42
    ema.set_value(7.0)
    ema.update(9.0)
    assert ema.value == pytest.approx(8.0)


# ------------------------------------------------------------- load A11 ---
def test_load_formula():
    # 0.7*thread_ratio + 0.3*slow_ratio, clamped (mysql_collector.go:88-113)
    assert G.calculate_load(5, 10, 0, 100) == pytest.approx(0.35)
    assert G.calculate_load(10, 10, 50, 100) == pytest.approx(0.85)
    assert G.calculate_load(20, 10, 200, 100) == pytest.approx(1.0)  # both clamp
    assert G.calculate_load(5, 0, 0, 100) == 0.0                     # no conns
    assert G.calculate_load(5, 10, 7, 0) == pytest.approx(0.35)      # no questions


# -------------------------------------------------------------- control ---
def _gov(**kw):
    return G.AdaptiveGovernor(base_interval_s=1.0, rng=random.Random(1), **kw)


def test_normal_load_keeps_base_interval():
    g = _gov()
    for _ in range(10):
        g.process_load_metrics(0.3)
    assert g.get_raw_interval() == 1.0


def test_critical_load_jumps_to_max():
    g = _gov()
    for _ in range(20):
        g.process_load_metrics(1.0)  # fast EMA converges to 1 > 0.9
    assert g.get_raw_interval() == G.MAXIMUM_INTERVAL_S


def test_high_load_exponential_backoff():
    g = _gov()
    # drive the fast EMA to exactly 0.8 (constant input -> EMA == input)
    for _ in range(50):
        g.process_load_metrics(0.8)
    expected = 1.0 * 2 ** (0.8 / 0.7 - 1)  # governor.go:209-211
    assert g.get_raw_interval() == pytest.approx(expected, rel=1e-6)


def test_hysteresis_blocks_small_changes():
    g = _gov()
    g.current_interval_s = 1.0
    g.fast_ema.set_value(0.71)  # new interval = 2^(0.71/0.7-1) ≈ 1.0099 — <10% off
    g._adjust_interval()
    assert g.get_raw_interval() == 1.0  # unchanged
    g.fast_ema.set_value(0.95)
    g._adjust_interval()
    assert g.get_raw_interval() == G.MAXIMUM_INTERVAL_S


def test_interval_change_callback():
    g = _gov()
    seen = []
    g.interval_change_callback = seen.append
    for _ in range(20):
        g.process_load_metrics(1.0)
    assert seen and seen[-1] == G.MAXIMUM_INTERVAL_S


def test_jitter_bounds_and_floor():
    g = _gov()
    vals = {g.get_current_interval() for _ in range(200)}
    assert all(0.95 <= v <= 1.05 for v in vals)  # ±(10%/2) around 1 s
    assert len(vals) > 1
    g.current_interval_s = G.MINIMUM_INTERVAL_S
    assert all(
        g.get_current_interval() >= G.MINIMUM_INTERVAL_S for _ in range(200)
    )


# ---------------------------------------------------------- persistence ---
def test_state_round_trip(tmp_path):
    clock = lambda: 1000.0
    g = G.AdaptiveGovernor(base_interval_s=1.0, state_dir=str(tmp_path), clock=clock)
    for _ in range(20):
        g.process_load_metrics(1.0)
    g.save_state()

    g2 = G.AdaptiveGovernor(
        base_interval_s=1.0, state_dir=str(tmp_path), clock=lambda: 1500.0
    )
    assert g2.get_raw_interval() == G.MAXIMUM_INTERVAL_S
    assert g2.fast_ema.value == pytest.approx(g.fast_ema.value)
    assert g2.slow_ema.value == pytest.approx(g.slow_ema.value)


def test_stale_state_not_restored(tmp_path):
    g = G.AdaptiveGovernor(base_interval_s=1.0, state_dir=str(tmp_path))
    for _ in range(20):
        g.process_load_metrics(1.0)
    g.save_state()
    # a restore 2 h later sees a stale file (mtime-based, governor.go:360)
    import os
    path = tmp_path / G.STATE_FILE_NAME
    old = os.path.getmtime(path) - 7200
    os.utime(path, (old, old))
    g2 = G.AdaptiveGovernor(base_interval_s=1.0, state_dir=str(tmp_path))
    assert g2.get_raw_interval() == 1.0  # fresh start


def test_reset_restores_base_and_removes_state(tmp_path):
    g = G.AdaptiveGovernor(base_interval_s=1.0, state_dir=str(tmp_path))
    for _ in range(20):
        g.process_load_metrics(1.0)
    g.save_state()
    g.reset()
    assert g.get_raw_interval() == 1.0
    assert not (tmp_path / G.STATE_FILE_NAME).exists()


# ----------------------------------------------------------------- T10 ----
def test_status_diff_rates_and_reset():
    a = G.StatusSample(2, 10, 1000, 10, 500, ts=100.0)
    b = G.StatusSample(5, 10, 1600, 22, 560, ts=160.0)
    d = G.status_diff(a, b)
    assert d.questions_diff == 600 and d.slow_queries_diff == 12
    assert d.qps == pytest.approx(10.0)
    assert d.slow_qps == pytest.approx(0.2)
    assert d.load == pytest.approx(0.7 * 0.5 + 0.3 * (12 / 600))
    # counter reset (server restart): full current value is the diff
    c = G.StatusSample(5, 10, 50, 1, 10, ts=220.0)
    d2 = G.status_diff(b, c)
    assert d2.questions_diff == 50 and d2.slow_queries_diff == 1
    # non-positive elapsed guards to 1 s
    d3 = G.status_diff(b, G.StatusSample(5, 10, 1700, 23, 561, ts=160.0))
    assert d3.elapsed_seconds == 1.0 and d3.qps == 100.0
