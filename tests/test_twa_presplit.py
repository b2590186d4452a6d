"""Equivalence of metric_time_weighted_avg and its presplit twin on
adversarial synthetic data: duplicate timestamps at bucket boundaries,
empty day gaps, a hot series — the cases the (series, day) split plus
boundary stitch must reproduce exactly."""

from __future__ import annotations

import datetime as dt

from project_obsidian_core_spark.plans import metrics_queries as M

_DAY_US = 86_400_000_000


def _write_events(spark, tmp_path, rows):
    """rows: (user_id, event_type, us, value)."""
    df = spark.createDataFrame(
        [
            (
                i,
                dt.datetime.utcfromtimestamp(us / 1_000_000),
                uid,
                et,
                val,
                "{}",
            )
            for i, (uid, et, us, val) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_presplit_twa_equals_plain_on_boundary_cases(spark, tmp_path):
    t0 = 1_700_000_000_000_000  # µs, mid-bucket somewhere
    day_start = (t0 // _DAY_US + 1) * _DAY_US
    rows = []
    # hot series: 300 samples straddling 3 days incl. exact-boundary hits
    for i in range(300):
        rows.append((1, "view", day_start - 150 * 7_000_000 + i * 7_000_000, 1.00 + (i % 7)))
    # duplicate timestamps AT a bucket boundary (tiebreak by value; the
    # duplicate contributes a 0-weight interval in both formulations)
    rows += [
        (2, "click", day_start - 1_000_000, 5.00),
        (2, "click", day_start, 2.00),
        (2, "click", day_start, 9.00),
        (2, "click", day_start + 10_000_000, 1.00),
    ]
    # empty-day gap: samples two days apart (boundary weight spans the gap)
    rows += [
        (3, "view", day_start + 100, 4.00),
        (3, "view", day_start + 2 * _DAY_US + 100, 8.00),
    ]
    # single-sample series: no interval at all -> absent from both outputs
    rows += [(4, "scroll", day_start + 5, 7.00)]
    sf_dir = _write_events(spark, tmp_path, rows)

    plain = M.metric_time_weighted_avg(spark, sf_dir).collect()
    split = M.metric_time_weighted_avg_presplit(spark, sf_dir).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, split))
    series = {(r.instance, r.metric_name) for r in plain}
    assert ("4", "scroll") not in series  # no interval -> no row
    assert ("3", "view") in series  # gap-spanning boundary weight kept
