"""OHLC candle downsample (analytics.metrics.ohlc): tie determinism and
the one-exchange plan property."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from project_obsidian_core_spark.analytics import metrics as MA


def _m(spark, rows):
    return spark.createDataFrame(
        rows, "time timestamp, metric_name string, metric_value long"
    )


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_ohlc_basic_candle(spark):
    rows = [
        (_t("2024-01-01 00:00:10"), "m", 5),
        (_t("2024-01-01 00:01:00"), "m", 9),
        (_t("2024-01-01 00:04:59"), "m", 2),
        (_t("2024-01-01 00:05:01"), "m", 7),  # next bucket
    ]
    out = {
        r["bucket_epoch_s"]: r
        for r in MA.ohlc(_m(spark, rows), bucket_s=300).collect()
    }
    first = out[1704067200]
    assert (first["open"], first["high"], first["low"], first["close"]) == (
        5, 9, 2, 2,
    )
    assert first["volume"] == 16 and first["n_samples"] == 3
    second = out[1704067500]
    assert (second["open"], second["close"], second["n_samples"]) == (7, 7, 1)


def test_ohlc_duplicate_timestamp_ties_are_deterministic(spark):
    # two samples at the SAME instant: open must take the smaller value,
    # close the larger (the documented (time, value) tiebreak) — the rule
    # that makes batch row_number and streaming struct-min/max coincide
    t = _t("2024-01-01 00:00:00")
    rows = [(t, "m", 8), (t, "m", 3)]
    r = MA.ohlc(_m(spark, rows), bucket_s=300).collect()[0]
    assert r["open"] == 3 and r["close"] == 8


def test_ohlc_plan_has_single_exchange(spark):
    df = _m(spark, [(_t("2024-01-01 00:00:00"), "m", 1)])
    plan = MA.ohlc(df)._jdf.queryExecution().executedPlan().toString()
    # both windows and the aggregate share one (metric, bucket) partitioning
    assert plan.count("Exchange") == 1, plan
