"""Series-pair-axis guard for the association matrices (A37/A62/A65).

The within-series pair work in the Pearson / xcorr / Kendall operators is
window-bounded, but the SERIES-pair axis is S²/2 (SCALE.md r10: 202M sign
pairs at just 40 series).  `_guard_series_pairs` mirrors the dedup family's
`max_bucket`/`max_eval`: a raising `max_series` pre-flight plus a
same-block-only `pair_block` restriction.  These tests pin:

- the pre-flight raises on an oversized synthetic series set (all three
  operators);
- `pair_block` restricts pairing to same-block series and leaves the
  surviving pairs' values bit-identical to the unblocked run;
- an oversized single BLOCK still raises (blocks can't smuggle the
  quadratic back in);
- the default path (no block) is unchanged — the gate queries still
  produce their oracle-checked output.
"""

from __future__ import annotations

import datetime

import pytest

from project_obsidian_core_spark.plans import metrics_queries as mq


def _events_df(spark, series):
    """series: {event_type: [(epoch_s, cents), ...]} → events-shaped df.

    Each distinct event_type becomes one metric series via the
    synthesize_metrics mapping ('postgresql.' || event_type)."""
    rows = []
    for ev, pts in series.items():
        for t, c in pts:
            rows.append((datetime.datetime.utcfromtimestamp(t), 1, ev, c / 100.0))
    df = spark.createDataFrame(rows, ["ts", "user_id", "event_type", "value"])
    return df.selectExpr(
        "ts", "cast(user_id as bigint) as user_id", "event_type", "value"
    )


def _with_events(spark, series, fn):
    real_load = mq.load
    mq.load = lambda s, d, t: _events_df(spark, series)
    try:
        return fn()
    finally:
        mq.load = real_load


def _mk_series(n, points=6, step=60):
    t0 = 1_700_000_000
    return {
        f"s{i:02d}": [
            (t0 + j * step, 10_000 + 100 * (i + 1) * j) for j in range(points)
        ]
        for i in range(n)
    }


@pytest.mark.parametrize(
    "op",
    [mq.metric_corr_matrix, mq.metric_xcorr, mq.metric_kendall_tau],
    ids=["pearson", "xcorr", "kendall"],
)
def test_max_series_preflight_raises(spark, op):
    series = _mk_series(6)
    with pytest.raises(RuntimeError, match="exceeds max_series=4"):
        _with_events(spark, series, lambda: op(spark, "unused", max_series=4))


def test_oversized_block_still_raises(spark):
    # all six series share one block: the block cap must still fire
    series = _mk_series(6)
    with pytest.raises(RuntimeError, match="block of 6 series"):
        _with_events(
            spark,
            series,
            lambda: mq.metric_corr_matrix(
                spark, "unused", max_series=4, pair_block="'all'"
            ),
        )


def test_pair_block_restricts_and_preserves_values(spark):
    # 4 series in 2 blocks of 2 (by name suffix parity): blocked run emits
    # exactly the same-block pairs, with values identical to the unblocked
    # run's corresponding rows
    series = _mk_series(4)
    blk = "pmod(cast(substring(metric_name, -1, 1) as int), 2)"
    full = _with_events(
        spark,
        series,
        lambda: mq.metric_corr_matrix(spark, "unused").collect(),
    )
    blocked = _with_events(
        spark,
        series,
        lambda: mq.metric_corr_matrix(
            spark, "unused", pair_block=blk
        ).collect(),
    )
    assert len(full) == 6  # C(4,2)
    same_block = {
        (r.metric_a, r.metric_b)
        for r in full
        if int(r.metric_a[-1]) % 2 == int(r.metric_b[-1]) % 2
    }
    assert {(r.metric_a, r.metric_b) for r in blocked} == same_block
    assert len(blocked) == 2  # (s00,s02) and (s01,s03)
    full_by_pair = {(r.metric_a, r.metric_b): r for r in full}
    for r in blocked:
        assert r == full_by_pair[(r.metric_a, r.metric_b)]


@pytest.mark.parametrize(
    "op",
    [mq.metric_xcorr, mq.metric_kendall_tau],
    ids=["xcorr", "kendall"],
)
def test_pair_block_matches_unblocked_subset(spark, op):
    # hour-apart points: kendall's hour grid needs distinct x per point
    series = _mk_series(4, points=8, step=3600)
    blk = "pmod(cast(substring(metric_name, -1, 1) as int), 2)"
    full = _with_events(spark, series, lambda: op(spark, "unused").collect())
    blocked = _with_events(
        spark, series, lambda: op(spark, "unused", pair_block=blk).collect()
    )
    want = [
        r for r in full if int(r.metric_a[-1]) % 2 == int(r.metric_b[-1]) % 2
    ]
    assert blocked == want and len(blocked) > 0


def test_default_path_unblocked_all_pairs(spark):
    # default kwargs: every cross pair present (gate behavior unchanged)
    series = _mk_series(5, step=3600)
    out = _with_events(
        spark,
        series,
        lambda: mq.metric_kendall_tau(spark, "unused").collect(),
    )
    assert len(out) == 10  # C(5,2)


def test_defer_guard_is_lazy_and_raises_at_execution(spark):
    """The r11 ADVICE flag: with defer_guard=True, building the plan for
    an over-cap corpus runs NO Spark job and raises nothing; the cap
    fires at execution time (in-plan assert_true filter), before the
    quadratic pair join consumes its input."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    series = _mk_series(6)
    # construction must not raise (and must not run the pre-flight job)
    df = _with_events(
        spark,
        series,
        lambda: mq.metric_corr_matrix(
            spark, "unused", max_series=4, defer_guard=True
        ),
    )
    with pytest.raises((Py4JJavaError, PySparkException)) as ei:
        df.collect()
    # r12 ADVICE: the deferred raise carries the MEASURED count, like the
    # eager RuntimeError does (6 series against the cap of 4)
    assert "series set of 6 series exceeds max_series=4" in str(ei.value)


def test_defer_guard_under_cap_matches_eager(spark):
    series = _mk_series(4)
    eager = _with_events(
        spark,
        series,
        lambda: mq.metric_corr_matrix(spark, "unused").collect(),
    )
    deferred = _with_events(
        spark,
        series,
        lambda: mq.metric_corr_matrix(
            spark, "unused", defer_guard=True
        ).collect(),
    )
    assert sorted(map(tuple, deferred)) == sorted(map(tuple, eager))
