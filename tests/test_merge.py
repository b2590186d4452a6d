"""MERGE upsert + SCD2 history operator semantics (operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_obsidian_core_spark.operators.merge import merge_upsert, scd2_history


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300)],
        "k int, name string, v int",
    )


def _changes(spark):
    return spark.createDataFrame(
        [
            (2, "b2", 250, "U"),  # update existing key
            (3, None, 0, "D"),  # delete existing key
            (4, "d", 400, "I"),  # insert new key
            (9, None, 0, "D"),  # delete of absent key is a no-op
        ],
        "k int, name string, v int, op string",
    )


def test_merge_insert_update_delete(spark):
    out = merge_upsert(_base(spark), _changes(spark), keys=["k"])
    rows = {r.k: (r.name, r.v) for r in out.collect()}
    assert rows == {1: ("a", 100), 2: ("b2", 250), 4: ("d", 400)}


def test_merge_is_idempotent_for_upserts(spark):
    """Re-applying the same non-delete batch leaves the table unchanged."""
    ch = _changes(spark).filter(F.col("op") != "D")
    once = merge_upsert(_base(spark), ch, keys=["k"])
    twice = merge_upsert(once, ch, keys=["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_empty_batch_is_identity(spark):
    ch = _changes(spark).limit(0)
    out = merge_upsert(_base(spark), ch, keys=["k"])
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, _base(spark).collect())
    )


def test_scd2_intervals_and_current_flag(spark):
    ev = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (1, 30, "z"), (2, 15, "q")],
        "ent int, ts long, val string",
    )
    hist = scd2_history(ev, "ent", "ts", "val").orderBy("ent", "valid_from")
    rows = [(r.ent, r.valid_from, r.valid_to, r.is_current) for r in hist.collect()]
    assert rows == [
        (1, 10, 20, False),
        (1, 20, 30, False),
        (1, 30, None, True),
        (2, 15, None, True),
    ]


def test_scd2_intervals_tile_without_gaps(spark):
    """Each entity's intervals chain: valid_to == next valid_from."""
    ev = spark.createDataFrame(
        [(1, t, str(t)) for t in (5, 1, 9, 3)], "ent int, ts long, val string"
    )
    hist = scd2_history(ev, "ent", "ts", "val").orderBy("valid_from").collect()
    for prev, nxt in zip(hist, hist[1:]):
        assert prev.valid_to == nxt.valid_from
    assert hist[-1].valid_to is None and hist[-1].is_current
