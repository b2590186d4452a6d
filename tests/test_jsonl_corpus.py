"""JSONL corpus source: round-trip identity and corrupt-line quarantine."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from project_obsidian_core_spark.sources import corpus as SC


def _docs(spark):
    rows = [
        (0, 'text with "quotes" and \\ backslash', "en", "s0", 34),
        (1, "plain text", "fr", "s1", 10),
        (2, "unicode éß中", "de", "s2", 10),
        (3, "more", "en", "s0", 4),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])


def test_jsonl_round_trip_identity(spark):
    tmp = tempfile.mkdtemp(prefix="jsonl_rt_") + "/d"
    df = _docs(spark)
    SC.write_jsonl(df, tmp)
    good, bad = SC.split_corrupt(SC.read_jsonl_corpus(spark, tmp))
    assert bad.count() == 0
    # serialize -> parse identity, including escapes and unicode
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, df.collect()))


def test_jsonl_corrupt_lines_quarantined_not_dropped(spark):
    tmp = tempfile.mkdtemp(prefix="jsonl_bad_") + "/d"
    SC.write_jsonl(_docs(spark), tmp, corrupt_mod=3)  # doc 0 and 3 truncated
    parsed = SC.read_jsonl_corpus(spark, tmp)
    good, bad = SC.split_corrupt(parsed)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 2  # quarantined, not silently dropped
    # the quarantine column holds the raw offending line for repair routing
    assert all(len(r[SC.CORRUPT_COL]) == 10 for r in bad.collect())


def test_csv_round_trip_and_quarantine(spark):
    tmp = tempfile.mkdtemp(prefix="csv_rt_") + "/d"
    df = _docs(spark).select("doc_id", "lang", "source", "n_chars")
    SC.write_csv_corpus(_docs(spark), tmp)
    good, bad = SC.split_corrupt(SC.read_csv_corpus(spark, tmp))
    assert bad.count() == 0
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, df.collect()))

    tmp2 = tempfile.mkdtemp(prefix="csv_bad_") + "/d"
    SC.write_csv_corpus(_docs(spark), tmp2, corrupt_mod=3)  # docs 0, 3 mangled
    good2, bad2 = SC.split_corrupt(SC.read_csv_corpus(spark, tmp2))
    assert sorted(r["doc_id"] for r in good2.collect()) == [1, 2]
    assert bad2.count() == 2  # malformed rows quarantined, not dropped
    assert all(r[SC.CORRUPT_COL].startswith("id_") for r in bad2.collect())
