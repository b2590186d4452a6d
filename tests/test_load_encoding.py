"""load() must normalize every testdata timestamp encoding to µs instants.

The driver has regenerated the testdata with different parquet timestamp
encodings across rounds (TIMESTAMP(NANOS) → read as ns-longs under
legacy.parquet.nanosAsLong; TIMESTAMP(MICROS, isAdjustedToUTC=false) →
read as TIMESTAMP_NTZ). Every downstream operator assumes an instant-typed
(`timestamp`) column; this pins the normalization for both encodings.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from project_obsidian_core_spark.plans.common import load

_TS = datetime.datetime(2001, 2, 3, 4, 5, 6, 789000)


def _check(spark, sf_dir_path):
    df = load(spark, str(sf_dir_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = df.select("ts").first().ts
    assert got == _TS  # wall-clock value preserved exactly under UTC
    # unix_micros (the operators' workhorse) must resolve
    assert df.select(F.unix_micros("ts")).first()[0] == int(
        _TS.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )


def test_load_casts_timestamp_ntz(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.createDataFrame(
        [(1, _TS)], "event_id long, ts timestamp_ntz"
    ).write.parquet(str(tmp_path / "events.parquet"))
    _check(spark, tmp_path)


def test_load_converts_nanos_longs(spark, tmp_path):
    ns = int(_TS.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6) * 1000
    spark.createDataFrame([(1, ns)], "event_id long, ts long").write.parquet(
        str(tmp_path / "events.parquet")
    )
    _check(spark, tmp_path)


def test_load_passes_through_instant_timestamps(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([(1, _TS)], "event_id long, ts timestamp")
    df.write.parquet(str(tmp_path / "events.parquet"))
    _check(spark, tmp_path)
