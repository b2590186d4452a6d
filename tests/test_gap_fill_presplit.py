"""Equivalence of gap_fill_minutes and its per-(series, period) presplit
twin on adversarial data: gaps spanning whole empty periods, samples on
exact period boundaries, NULL-valued samples at period edges, and a
multi-period single series — the cases the boundary stitch must
reproduce exactly."""

from __future__ import annotations

import datetime as dt

from project_obsidian_core_spark.analytics.metrics import (
    gap_fill_minutes,
    gap_fill_minutes_presplit,
)

_MIN_US = 60_000_000
_HOUR_US = 3_600_000_000


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


def _collect(df):
    return sorted(
        (r.instance_id, r.metric_name, r.minute_us, r.value, r.is_filled)
        for r in df.collect()
    )


def test_presplit_gap_fill_equals_plain_on_boundary_cases(spark):
    rows = []
    # series A: samples in hour 0 and hour 5 -> hours 1-4 entirely empty
    # periods (split=1h, step=1min): carry must cross 4 empty periods
    rows += [("A", "m", 3, 1.0), ("A", "m", 5 * 60 + 7, 2.0)]
    # series B: samples exactly ON period boundaries (minute 60, 120)
    rows += [("B", "m", 60, 10.0), ("B", "m", 120, 20.0), ("B", "m", 61, 11.0)]
    # series C: NULL-valued sample as the LAST sample of a period, then a
    # gap — carry-in must skip the NULL back to the previous value
    rows += [
        ("C", "m", 10, 5.0),
        ("C", "m", 59, None),
        ("C", "m", 130, 6.0),
    ]
    # series D: all-NULL leading period
    rows += [("D", "m", 1, None), ("D", "m", 200, 7.0)]
    # series E: dense hot series over 3 periods
    rows += [("E", "m", i * 2, float(i)) for i in range(120)]

    df = _metrics(spark, rows)
    plain = _collect(gap_fill_minutes(df, step_us=_MIN_US))
    pre = _collect(
        gap_fill_minutes_presplit(df, step_us=_MIN_US, split_us=_HOUR_US)
    )
    assert pre == plain
    assert len(plain) > 400  # the grids actually exploded


def test_presplit_rejects_misaligned_split(spark):
    import pytest

    df = _metrics(spark, [("A", "m", 0, 1.0)])
    with pytest.raises(ValueError):
        gap_fill_minutes_presplit(df, step_us=7_000_000, split_us=_HOUR_US)
