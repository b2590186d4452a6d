"""gap_fill_minutes semantics: carry-forward on the minute grid, and the
NULL-valued-sample distinction (round-7 advice): a genuine sample whose
value is NULL must keep is_filled=false and its NULL value — only grid
MISSES are interpolated."""

from __future__ import annotations

import datetime as dt

from project_obsidian_core_spark.analytics.metrics import gap_fill_minutes

_MIN_US = 60_000_000


def _metrics(spark, rows):
    """rows: (instance_id, metric_name, minute_index, value|None)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (inst, name, base + dt.timedelta(minutes=m), val)
            for inst, name, m, val in rows
        ],
        "instance_id string, metric_name string, time timestamp, "
        "metric_value double",
    )


def test_gap_fill_carry_forward_basic(spark):
    df = _metrics(
        spark,
        [
            ("i1", "qps", 0, 10.0),
            ("i1", "qps", 3, 40.0),  # minutes 1-2 missing
        ],
    )
    out = {
        r.minute_us: (r.value, r.is_filled)
        for r in gap_fill_minutes(df).collect()
    }
    assert len(out) == 4
    t0 = min(out)
    assert out[t0] == (10.0, False)
    assert out[t0 + _MIN_US] == (10.0, True)
    assert out[t0 + 2 * _MIN_US] == (10.0, True)
    assert out[t0 + 3 * _MIN_US] == (40.0, False)


def test_gap_fill_null_sample_not_marked_filled(spark):
    """A present minute with a NULL value is NOT a gap: it keeps its NULL
    and is_filled=false; later missing minutes carry the last NON-NULL
    value past it."""
    df = _metrics(
        spark,
        [
            ("i1", "qps", 0, 5.0),
            ("i1", "qps", 1, None),  # genuine sample, NULL value
            ("i1", "qps", 3, 7.0),   # minute 2 missing
        ],
    )
    out = {
        r.minute_us: (r.value, r.is_filled)
        for r in gap_fill_minutes(df).collect()
    }
    assert len(out) == 4
    t0 = min(out)
    assert out[t0] == (5.0, False)
    assert out[t0 + _MIN_US] == (None, False)      # present, not filled
    assert out[t0 + 2 * _MIN_US] == (5.0, True)    # carries past the NULL
    assert out[t0 + 3 * _MIN_US] == (7.0, False)
