"""Property-based checks: as-of join vs a Python reference model, and
tile-dedup conservation invariants.

Hypothesis generates adversarial key/timestamp layouts (simultaneous rows,
keys missing from one side, duplicate left timestamps); the Spark operators
must agree with the obvious sequential model on every one of them.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import curation as C
from project_obsidian_core_spark.operators import temporal_joins as TJ

T0 = dt.datetime(2026, 4, 1)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small key/time domains force collisions (simultaneity, shared keys)
lefts = st.lists(
    st.tuples(st.sampled_from([1, 2]), st.integers(0, 8)), min_size=1, max_size=6
)
rights = st.lists(
    st.tuples(st.sampled_from([1, 2]), st.integers(0, 8), st.integers(0, 99)),
    min_size=0,
    max_size=6,
)


@given(lefts=lefts, rights=rights)
@settings(**_SETTINGS)
def test_asof_matches_sequential_model(spark, lefts, rights):
    # right side must be unique per (key, ts): the operator's documented
    # precondition — dedup by max value like the registered query does
    rmap: dict[tuple[int, int], int] = {}
    for k, t, v in rights:
        rmap[(k, t)] = max(rmap.get((k, t), -1), v)
    left_rows = [
        (i, k, T0 + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(lefts)
    ]
    right_rows = [
        (k, T0 + dt.timedelta(minutes=t), v) for (k, t), v in sorted(rmap.items())
    ]
    ldf = spark.createDataFrame(left_rows, ["event_id", "user_id", "ts"])
    if right_rows:
        rdf = spark.createDataFrame(right_rows, ["user_id", "ts", "v"])
    else:
        rdf = spark.createDataFrame([], "user_id long, ts timestamp, v long")
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_v"])
        for r in TJ.asof_join(ldf, rdf, on="user_id", value_cols=("v",)).collect()
    }
    assert len(out) == len(left_rows)  # left-outer: every left row survives
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, v) for (rk, rt), v in rmap.items() if rk == k and rt <= t]
        if cands:
            bt, bv = max(cands)
            assert out[i] == (T0 + dt.timedelta(minutes=bt), bv)
        else:
            assert out[i] == (None, None)


@given(lefts=lefts, rights=rights)
@settings(**_SETTINGS)
def test_asof_presplit_matches_plain(spark, lefts, rights):
    # a 2-minute period over 0-8 minute timestamps forces cross-boundary
    # carries (left rows whose period holds no earlier right row)
    rmap: dict[tuple[int, int], int] = {}
    for k, t, v in rights:
        rmap[(k, t)] = max(rmap.get((k, t), -1), v)
    left_rows = [
        (i, k, T0 + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(lefts)
    ]
    right_rows = [
        (k, T0 + dt.timedelta(minutes=t), v) for (k, t), v in sorted(rmap.items())
    ]
    ldf = spark.createDataFrame(left_rows, ["event_id", "user_id", "ts"])
    if right_rows:
        rdf = spark.createDataFrame(right_rows, ["user_id", "ts", "v"])
    else:
        rdf = spark.createDataFrame([], "user_id long, ts timestamp, v long")
    plain = {
        r["event_id"]: (r["asof_ts"], r["asof_v"])
        for r in TJ.asof_join(ldf, rdf, on="user_id", value_cols=("v",)).collect()
    }
    split = {
        r["event_id"]: (r["asof_ts"], r["asof_v"])
        for r in TJ.asof_join_presplit(
            ldf, rdf, on="user_id", value_cols=("v",), period="2 minutes"
        ).collect()
    }
    assert split == plain


sessions_events = st.lists(
    st.tuples(st.sampled_from(["u1", "u2"]), st.integers(0, 600)),
    min_size=1,
    max_size=25,
    unique=True,
)


@given(events=sessions_events)
@settings(**_SETTINGS)
def test_sessionize_presplit_matches_plain(spark, events):
    from project_obsidian_core_spark.datapipe import pipeline as P

    # 2-minute periods, 45 s gap, timestamps over 10 minutes: sessions
    # regularly span period boundaries and some periods are empty
    rows = [(u, T0 + dt.timedelta(seconds=s)) for u, s in events]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    plain = {
        (r["user_id"], r["ts"]): r["session_idx"]
        for r in P.sessionize(df, gap="45 seconds").collect()
    }
    split = {
        (r["user_id"], r["ts"]): r["session_idx"]
        for r in P.sessionize_presplit(
            df, gap="45 seconds", period="2 minutes"
        ).collect()
    }
    assert split == plain


texts = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=9).map(" ".join),
    min_size=1,
    max_size=5,
)


@given(texts=texts)
@settings(**_SETTINGS)
def test_tile_dedup_invariants(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = {r["doc_id"]: r.asDict() for r in C.tile_dedup(df, tile=2).collect()}
    assert set(rows) == set(range(len(texts)))
    total_tiles = 0
    seen: set[str] = set()
    for did, text in enumerate(texts):
        toks = text.split(" ")
        tiles = [" ".join(toks[i : i + 2]) for i in range(0, len(toks), 2)]
        total_tiles += len(tiles)
        expect_kept = 0
        for t in tiles:  # model: first-ever occurrence in (doc, tile) order
            if t not in seen:
                seen.add(t)
                expect_kept += 1
        assert rows[did]["n_tiles"] == len(tiles)
        assert rows[did]["n_kept"] == expect_kept
    # global conservation: kept tiles across docs = distinct tiles seen
    assert sum(r["n_kept"] for r in rows.values()) == len(seen)
    assert sum(r["n_tiles"] for r in rows.values()) == total_tiles
