"""Round-15 operator units: T42 streaming forecast backtest.

The registered oracle gate (stream_forecast_backtest vs the A94 batch
oracle, EXACT at sf0.001 + sf0.01) is the integration proof; these units
pin the pure re-derivation function's semantics — the batch formulas'
edge behavior that the gate data may not exercise every round.
"""

from __future__ import annotations

from project_obsidian_core_spark.streaming.sequence_state import (
    FORECAST_BT_MIN_POINTS,
    _div_trunc,
    _round_half_up,
    forecast_backtest_from_series,
)

A, B = 0.3, 0.1  # HOLT_ALPHA / HOLT_BETA


def _batch_reference(sums, alpha=A, beta=B):
    """Independent reimplementation of the A94 expression tree (the SQL
    oracle's recursive shape, written differently from the production
    fold) to catch transcription errors in either."""
    ys = [float(y) for y in sums]
    n = len(ys)
    n_train = n - (n * 1) // 5
    n_test = n - n_train
    lvl, tr = ys[0], ys[1] - ys[0]
    for x in ys[2:n_train]:
        new_lvl = alpha * x + (1.0 - alpha) * (lvl + tr)
        tr = beta * (new_lvl - lvl) + (1.0 - beta) * tr
        lvl = new_lvl
    e_h = sum(
        _round_half_up(abs(ys[i] - (lvl + (i + 1 - n_train) * tr)))
        for i in range(n_train, n)
    )
    e_n = sum(
        _round_half_up(abs(ys[i] - ys[n_train - 1])) for i in range(n_train, n)
    )
    imp = _div_trunc((e_n - e_h) * 1_000_000, e_n) if e_n > 0 else 0
    return (n_train, n_test, lvl, tr, e_h // n_test, e_n // n_test, imp)


def test_matches_independent_reference_on_trend_series():
    sums = [100, 210, 330, 420, 540, 660, 750, 880, 990, 1100]
    assert forecast_backtest_from_series(sums, A, B) == _batch_reference(sums)


def test_matches_reference_when_trend_hurts():
    # a mean-reverting series: the naive carry-forward wins and
    # improvement_ppm must go NEGATIVE via truncation-toward-zero
    sums = [1000, 1, 999, 3, 1001, 2, 998, 5, 1002, 1]
    got = forecast_backtest_from_series(sums, A, B)
    assert got == _batch_reference(sums)
    assert got[-1] < 0, "trend must hurt on a mean-reverting series"


def test_below_min_points_returns_none():
    assert forecast_backtest_from_series([1] * (FORECAST_BT_MIN_POINTS - 1), A, B) is None
    assert forecast_backtest_from_series([1] * FORECAST_BT_MIN_POINTS, A, B) is not None


def test_round_half_up_matches_spark_not_bankers():
    # Spark round(0.5) = 1 (HALF_UP); Python's round(0.5) = 0 (banker's)
    assert _round_half_up(0.5) == 1
    assert _round_half_up(1.5) == 2
    assert _round_half_up(2.5) == 3
    assert round(0.5) == 0  # the trap the helper exists to avoid


def test_div_trunc_matches_spark_div_on_negatives():
    # Spark/DuckDB div truncate toward zero; Python // floors
    assert _div_trunc(-7, 2) == -3
    assert (-7) // 2 == -4  # the trap
    assert _div_trunc(7, 2) == 3
    assert _div_trunc(-6, 3) == -2


def test_late_bucket_moves_the_split_point():
    # 9 points: n_train = 9 - 1 = 8, n_test = 1.  A 10th (late, EARLIEST
    # bucket) makes n_train = 8, n_test = 2 AND shifts every train value
    # right by one — the "no partial fold survives" property.
    base = [100, 210, 330, 420, 540, 660, 750, 880, 990]
    with_late = [50] + base
    r9 = forecast_backtest_from_series(base, A, B)
    r10 = forecast_backtest_from_series(with_late, A, B)
    assert (r9[0], r9[1]) == (8, 1)
    assert (r10[0], r10[1]) == (8, 2)
    assert r10 == _batch_reference(with_late)
    assert r9[2] != r10[2], "level must re-derive over the shifted train fold"


# ---------------------------- T43: streaming HHI --------------------------
from project_obsidian_core_spark.streaming.sequence_state import (  # noqa: E402
    hhi_from_series,
)


def test_hhi_monopoly_is_full_concentration():
    # one supplier: share = 1000 milli, HHI = 10^6, band high
    assert hhi_from_series([12345]) == (1, 12345, 1_000_000, "high")


def test_hhi_equal_split_bands():
    # 10 equal suppliers: share 100 each, HHI = 10*100^2 = 100,000 → unconcentrated
    assert hhi_from_series([5] * 10) == (10, 50, 100_000, "unconcentrated")
    # 5 equal suppliers: share 200 each, HHI = 200,000 → moderate
    assert hhi_from_series([7] * 5) == (5, 35, 200_000, "moderate")


def test_hhi_share_truncation_matches_batch_div():
    # rev 1,1,1 of 3: share = 333 (truncating), HHI = 3*333² = 332,667
    assert hhi_from_series([1, 1, 1]) == (3, 3, 332_667, "high")


def test_hhi_empty_and_zero_state():
    assert hhi_from_series([]) is None
    assert hhi_from_series([0, 0]) is None


# ------------------------ T46: streaming dwell grid ------------------------
from project_obsidian_core_spark.streaming.sequence_state import (  # noqa: E402
    dwells_from_series,
)


def test_dwell_grid_basic():
    # sorted (ts_us, type): dwell attributed to the EARLIER event's type
    ts = [0, 2_000_000, 5_000_000]
    types = ["view", "click", "purchase"]
    assert dwells_from_series(ts, types) == {
        ("view", 2): 1,
        ("click", 3): 1,
    }


def test_dwell_late_event_splits_an_existing_dwell():
    # base: view@0 -> purchase@10s gives ("view", 10)
    base = dwells_from_series([0, 10_000_000], ["view", "purchase"])
    assert base == {("view", 10): 1}
    # a LATE click@4s splits it into ("view", 4) + ("click", 6) — the
    # property that forces full re-derivation per emit
    split = dwells_from_series(
        [0, 4_000_000, 10_000_000], ["view", "click", "purchase"]
    )
    assert split == {("view", 4): 1, ("click", 6): 1}
    assert ("view", 10) not in split


def test_dwell_truncating_seconds_matches_batch_div():
    # 1.9 s gap -> 1 s dwell (truncation, the batch div semantics)
    assert dwells_from_series([0, 1_900_000], ["a", "b"]) == {("a", 1): 1}


def test_dwell_empty_and_single():
    assert dwells_from_series([], []) == {}
    assert dwells_from_series([5], ["a"]) == {}
