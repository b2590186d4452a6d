"""Display-helper parity (02-Query_Analysis.ipynb cell-4 format_sample;
01-Connect_and_Metrics.ipynb cell-10 client-side pivot)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from project_obsidian_core_spark.analytics import display as DSP


def test_format_sample_matches_reference_semantics():
    assert DSP.format_sample(None) == DSP.NO_SAMPLE
    assert DSP.format_sample(float("nan")) == DSP.NO_SAMPLE
    assert DSP.format_sample("   ") == DSP.NO_SAMPLE
    assert DSP.format_sample("  SELECT 1  ") == "SELECT 1"
    long = "x" * 100
    out = DSP.format_sample(long, max_length=80)
    assert out == "x" * 80 + "..." and len(out) == 83
    assert DSP.format_sample("short", max_length=80) == "short"


def test_format_sample_col_agrees_with_python(spark):
    vals = [None, "   ", "  SELECT 1  ", "y" * 100, "short"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = [r["o"] for r in df.select(DSP.format_sample_col("s").alias("o")).collect()]
    assert got == [DSP.format_sample(v) for v in vals]


def test_series_pivot_and_plot_frame(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 1, 0, 5)
    rows = [
        (t0, "mysql.questions", 10.0),
        (t0, "mysql.threads_running", 2.0),
        (t1, "mysql.questions", 20.0),
        # threads_running missing at t1 → NaN in the plot frame, like pandas
    ]
    df = spark.createDataFrame(rows, ["time_bucket", "metric_name", "avg_value"])
    pdf = DSP.to_plot_frame(df, names=["mysql.questions", "mysql.threads_running"])
    expected = (
        pd.DataFrame(rows, columns=["time_bucket", "metric_name", "avg_value"])
        .pivot(index="time_bucket", columns="metric_name", values="avg_value")
        .reset_index()
    )
    assert list(pdf.columns) == list(expected.columns)
    assert pdf["mysql.questions"].tolist() == [10.0, 20.0]
    assert pd.isna(pdf["mysql.threads_running"].iloc[1])
