"""Corpus-management operators (datapipe/pipeline.py): deterministic
splits/sampling, sessionization edges, and greedy packing invariants."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import pipeline as P


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"s{i % 3}", (i * 37) % 120 + 1) for i in range(200)],
        ["doc_id", "source", "n_tokens"],
    )


def test_split_deterministic_and_roughly_weighted(docs):
    a = {r["doc_id"]: r["split"] for r in P.assign_splits(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in P.assign_splits(docs).collect()}
    assert a == b  # rerun-stable
    counts = {s: list(a.values()).count(s) for s in ("train", "val", "test")}
    assert counts["train"] > 180  # 98% nominal
    assert set(a.values()) <= {"train", "val", "test"}

    # a different salt resamples membership
    c = {r["doc_id"]: r["split"] for r in P.assign_splits(docs, salt="v2").collect()}
    assert c != a


def test_hash_sample_reproducible_and_disjoint_from_salt(docs):
    s1 = {r["doc_id"] for r in P.hash_sample(docs, 300).collect()}
    s2 = {r["doc_id"] for r in P.hash_sample(docs, 300).collect()}
    assert s1 == s2
    assert 0 < len(s1) < 200
    # monotone: raising the rate only adds members
    s_more = {r["doc_id"] for r in P.hash_sample(docs, 600).collect()}
    assert s1 <= s_more


def test_sessionize_gap_edges(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)
    rows = [
        (1, mins(0)),    # session 1
        (1, mins(30)),   # exactly the gap → same session (strict >)
        (1, mins(61)),   # 31 min since last → session 2
        (2, mins(0)),    # separate entity → its own session 1
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["user_id"], r["ts"].minute + 60 * r["ts"].hour): r["session_idx"]
        for r in P.sessionize(df, gap="30 minutes").collect()
    }
    assert out[(1, 0)] == 1 and out[(1, 30)] == 1
    assert out[(1, 61)] == 2
    assert out[(2, 0)] == 1


def test_session_stats_aggregates(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 10), (1, t0 + dt.timedelta(minutes=5), 20)],
        ["user_id", "ts", "v"],
    )
    sess = P.sessionize(df, gap="30 minutes")
    r = P.session_stats(sess, value_col=F.col("v")).collect()[0]
    assert r["n_events"] == 2 and r["value_sum"] == 30
    assert r["session_end_us"] - r["session_start_us"] == 5 * 60 * 1_000_000


def test_pack_sequential_spans_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "s", 100), (2, "s", 100), (3, "s", 100)],
        ["doc_id", "source", "n_tokens"],
    )
    out = {r["doc_id"]: r for r in P.pack_sequential(df, 128).collect()}
    assert (out[1]["pack_id"], out[1]["pack_offset"]) == (0, 0)
    assert (out[2]["pack_id"], out[2]["pack_offset"]) == (0, 100)  # spans 0→1
    assert (out[3]["pack_id"], out[3]["pack_offset"]) == (1, 72)


def test_pack_greedy_first_fit_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "s", 100),
            (2, "s", 100),   # 200 > 128 → new pack
            (3, "s", 28),    # fits with doc 2 (100+28=128, exactly full)
            (4, "s", 1),     # previous pack closed at exactly ctx → new pack
            (5, "s", 300),   # oversized → its own pack
            (6, "s", 10),
        ],
        ["doc_id", "source", "n_tokens"],
    )
    rows = {int(r["doc_key"]): r for r in P.pack_greedy(df, 128).collect()}
    assert (rows[1]["pack_id"], rows[1]["pack_fill"]) == (0, 0)
    assert (rows[2]["pack_id"], rows[2]["pack_fill"]) == (1, 0)
    assert (rows[3]["pack_id"], rows[3]["pack_fill"]) == (1, 100)
    assert (rows[4]["pack_id"], rows[4]["pack_fill"]) == (2, 0)
    assert (rows[5]["pack_id"], rows[5]["pack_fill"]) == (3, 0)  # oversized alone
    assert (rows[6]["pack_id"], rows[6]["pack_fill"]) == (4, 0)


def test_pack_greedy_invariants(docs):
    ctx = 128
    out = P.pack_greedy(docs, ctx).collect()
    # no pack overflows unless it holds a single oversized doc
    fill = {}
    for r in out:
        key = (r["shard"], r["pack_id"])
        fill.setdefault(key, []).append(r["n_tokens"])
    for key, toks in fill.items():
        if len(toks) > 1:
            assert sum(toks) <= ctx, key
    # every doc assigned exactly once
    assert len(out) == docs.count()


def test_pack_greedy_max_shard_rows_splits_hot_shard(spark):
    # one 1e6-row shard with the cap → packing spreads over ~10 sub-shards
    # (tasks) instead of serializing into one; tokens conserved, invariants
    # hold, pack ids stay unique per doc set
    ctx, cap, n = 2048, 100_000, 1_000_000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("hot").alias("source"),
            (F.pmod(F.col("id") * 37, F.lit(500)) + 1).alias("n_tokens"),
        )
    )
    out = P.pack_greedy(df, ctx, max_shard_rows=cap).persist()
    assert out.count() == n  # every doc assigned exactly once
    # work actually split: multiple pack-id namespaces (sub-shards) in use
    n_subs = out.select(F.floor(F.col("pack_id") / cap)).distinct().count()
    assert n_subs >= 5
    # tokens conserved through the operator
    total_in = df.agg(F.sum("n_tokens")).first()[0]
    total_out = out.agg(F.sum("n_tokens")).first()[0]
    assert total_in == total_out
    # no multi-doc pack overflows the context
    over = (
        out.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("c"))
        .filter((F.col("c") > 1) & (F.col("t") > ctx))
        .count()
    )
    assert over == 0
    out.unpersist()


# ----------------------------------------------------------- properties ---
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

corpora = st.lists(
    st.tuples(st.integers(1, 500), st.integers(1, 400)),  # (doc_id, n_tokens)
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


def _greedy_model(docs, ctx):
    """Driver-side reference model of first-fit packing (same recurrence)."""
    out, pack_id, fill = {}, 0, 0
    for doc_id, n in sorted(docs):
        if fill > 0 and fill + n > ctx:
            pack_id, fill = pack_id + 1, 0
        out[doc_id] = (pack_id, fill)
        fill += n
        if fill >= ctx:
            pack_id, fill = pack_id + 1, 0
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpora, st.integers(64, 256))
def test_pack_greedy_matches_sequential_model(spark, docs, ctx):
    df = spark.createDataFrame(
        [(d, "s", n) for d, n in docs], ["doc_id", "source", "n_tokens"]
    )
    got = {
        int(r["doc_key"]): (r["pack_id"], r["pack_fill"])
        for r in P.pack_greedy(df, ctx).collect()
    }
    assert got == _greedy_model(docs, ctx)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpora, st.integers(64, 256))
def test_pack_sequential_conserves_tokens(spark, docs, ctx):
    df = spark.createDataFrame(
        [(d, "s", n) for d, n in docs], ["doc_id", "source", "n_tokens"]
    )
    rows = sorted(P.pack_sequential(df, ctx).collect(), key=lambda r: r["doc_id"])
    # prefix reconstruction: pack_id*ctx + offset is the running token sum
    running = 0
    for r in rows:
        assert r["pack_id"] * ctx + r["pack_offset"] == running
        running += r["n_tokens"]


def test_sessionize_window_matches_lag_form(spark):
    # same boundaries on non-degenerate spacing; native op is streaming-capable
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=m)) for m in (0, 10, 29, 75, 80)
    ] + [(2, t0)]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    lag_sessions = (
        P.session_stats(P.sessionize(df, gap="30 minutes"))
        .orderBy("user_id", "session_start_us")
        .collect()
    )
    win_sessions = (
        P.sessionize_window(df, gap="30 minutes")
        .orderBy("user_id", "session_start_us")
        .collect()
    )
    assert [
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in lag_sessions
    ] == [
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in win_sessions
    ]


def test_sessionize_window_streams_with_watermark(spark, tmp_path):
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2026, 3, 1, 12, 0, 0)
    src, ckpt, sink = str(tmp_path / "s"), str(tmp_path / "c"), str(tmp_path / "o")
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=5)),          # same session
        (1, t0 + dt.timedelta(hours=3)),            # watermark driver
    ]
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    agg = P.sessionize_window(
        stream.withWatermark("ts", "30 minutes"), gap="30 minutes"
    )
    q = (
        agg.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, eid: df.write.mode("overwrite").parquet(f"{sink}/_b={eid}"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    got = spark.read.parquet(sink).collect()
    # the 2-event session finalized once the watermark passed its close
    sess = [r for r in got if r["n_events"] == 2]
    assert len(sess) == 1
    assert sess[0]["session_end_us"] - sess[0]["session_start_us"] == 5 * 60 * 1_000_000


# ------------------------------------------------------------- chunking
def test_chunk_documents_boundaries_and_overlap(spark):
    """Chunk layout: stride spacing, shared overlap content, short docs
    yield exactly one chunk, reassembly covers the full text."""
    docs = spark.createDataFrame(
        [
            (1, "abcdefghij"),   # len 10: size 6 overlap 2 stride 4 -> 2 chunks
            (2, "abc"),          # shorter than size -> 1 chunk
            (3, "abcd"),         # == stride boundary -> 1 chunk
            (4, "abcdefg"),      # size+1 -> 2 chunks (tail not contained)
            (5, ""),             # empty -> 1 empty chunk
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chars)
        for r in P.chunk_documents(docs, size=6, overlap=2).collect()
    }
    assert out[(1, 0)] == ("abcdef", 6)
    assert out[(1, 1)] == ("efghij", 6)          # starts at stride 4
    assert out[(1, 0)][0][-2:] == out[(1, 1)][0][:2]  # shared overlap
    assert out[(2, 0)] == ("abc", 3)
    assert out[(3, 0)] == ("abcd", 4)
    assert out[(4, 0)] == ("abcdef", 6)
    assert out[(4, 1)] == ("efg", 3)
    assert out[(5, 0)] == ("", 0)
    assert len(out) == 7

    # reassembly: dropping each chunk's leading overlap reproduces the text
    txt = "".join(
        out[(1, i)][0][(2 if i else 0):] for i in range(2)
    )
    assert txt == "abcdefghij"


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        P.chunk_documents(docs, size=4, overlap=4)
    with pytest.raises(ValueError):
        P.chunk_documents(docs, size=4, overlap=-1)


# -------------------------- P11: best-fit-decreasing ----------------------
def test_pack_best_fit_matches_python_and_beats_first_fit(spark):
    """BFD against a direct python recompute, plus the policy claim: on
    this adversarial shard BFD uses strictly fewer bins than first-fit
    in corpus order (the reason the policy exists)."""
    from project_obsidian_core_spark.datapipe.pipeline import (
        pack_best_fit,
        pack_greedy,
    )

    # corpus order interleaves big/small so first-fit fragments
    toks = [60, 50, 45, 55, 30, 40, 10, 20, 35, 5]
    rows = [(i, "s", t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    ctx = 100
    got = {
        r["doc_key"]: (r["pack_id"], r["pack_fill"])
        for r in pack_best_fit(df, ctx).collect()
    }
    # python BFD with the same tie rules
    order = sorted(range(len(toks)), key=lambda i: (-toks[i], i))
    fills, want = [], {}
    for i in order:
        n = toks[i]
        best_idx, best_fill = -1, -1
        for k, f in enumerate(fills):
            if f + n <= ctx and f > best_fill:
                best_idx, best_fill = k, f
        if best_idx < 0:
            fills.append(n)
            want[str(i)] = (len(fills), 0)
        else:
            want[str(i)] = (best_idx + 1, fills[best_idx])
            fills[best_idx] += n
    assert got == want
    n_bfd = len({p for p, _ in got.values()})
    ff = pack_greedy(df, ctx).collect()
    n_ff = len({r["pack_id"] for r in ff})
    assert n_bfd < n_ff  # the policy pays for itself here
    # capacity respected
    per_bin = {}
    for i, (p, _) in got.items():
        per_bin[p] = per_bin.get(p, 0) + toks[int(i)]
    assert all(v <= ctx for v in per_bin.values())


def test_pack_best_fit_hot_shard_guard(spark):
    """max_shard_rows splits a hot shard into salted sub-shards with
    namespaced pack ids; every document still lands exactly once and no
    context overflows."""
    from project_obsidian_core_spark.datapipe.pipeline import pack_best_fit

    rows = [(i, "hot", 10 + (i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = pack_best_fit(df, 50, max_shard_rows=16).collect()
    assert len(out) == 40 and len({r["doc_key"] for r in out}) == 40
    per_bin = {}
    for r in out:
        per_bin[r["pack_id"]] = per_bin.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(v <= 50 for v in per_bin.values())


def test_pack_best_fit_bisect_matches_linear_reference(spark):
    """The r13 bisect rewrite of the open-bin lookup must reproduce the
    r12 linear scan exactly (fullest eligible bin, lowest pack id on
    ties) on a larger pseudo-random shard."""
    from project_obsidian_core_spark.datapipe.pipeline import pack_best_fit

    toks = [((i * 2654435761) >> 7) % 97 + 1 for i in range(300)]
    rows = [(i, "s", t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    ctx = 128
    got = {
        r["doc_key"]: (r["pack_id"], r["pack_fill"])
        for r in pack_best_fit(df, ctx).collect()
    }
    # the pre-r13 linear-scan reference
    order = sorted(range(len(toks)), key=lambda i: (-toks[i], i))
    fills, want = [], {}
    for i in order:
        n = toks[i]
        best_idx, best_fill = -1, -1
        for k, f in enumerate(fills):
            if f + n <= ctx and f > best_fill:
                best_idx, best_fill = k, f
        if best_idx < 0:
            fills.append(n)
            want[str(i)] = (len(fills), 0)
        else:
            want[str(i)] = (best_idx + 1, fills[best_idx])
            fills[best_idx] += n
    assert got == want


def test_pack_namespace_guard_raises_on_oversized_subshard(spark):
    """r12 ADVICE: the sub-shard namespace is 2× the cap and an overshoot
    must fail loudly instead of colliding pack ids silently."""
    import pytest

    from project_obsidian_core_spark.datapipe.pipeline import pack_greedy

    # cap 2 -> namespace width 4; 40 docs over ceil(40/2)=20 sub-shards
    # leaves ~2 per sub-shard (fine), but cap 1 with a constant hash key
    # cannot happen via pmod -- force the overshoot with n_subs=1 by
    # making every doc hash to the same sub: single doc_id repeated is
    # impossible (keys unique), so instead drive the guard directly with
    # a tiny cap where some salted sub-shard must exceed 2*cap.
    rows = [(i, "hot", 3) for i in range(64)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    with pytest.raises(Exception, match="namespace width|PythonException"):
        pack_greedy(df, 10, max_shard_rows=1).collect()


def test_corpus_shuffle_deterministic_permutation(spark):
    """P12 invariants: same seed ⇒ identical (shard, pos, global_pos)
    regardless of input partitioning; different seed ⇒ a different
    permutation; global_pos is a 1..n permutation consistent with
    (shard, pos) lexicographic order."""
    from project_obsidian_core_spark.datapipe.pipeline import corpus_shuffle

    n = 500
    docs = spark.createDataFrame(
        [(i, "s", "t") for i in range(n)], ["doc_id", "source", "text"]
    )
    cols = ["doc_id", "shard", "pos", "global_pos"]

    def run(df, seed):
        return {
            r["doc_id"]: (r["shard"], r["pos"], r["global_pos"])
            for r in corpus_shuffle(df, seed=seed, n_shards=8)
            .select(*cols)
            .collect()
        }

    a = run(docs, 1)
    b = run(docs.repartition(13), 1)  # partitioning must not matter
    assert a == b
    c = run(docs, 2)
    assert a != c  # a different seed reshuffles
    # permutation + consistency
    gp = sorted(v[2] for v in a.values())
    assert gp == list(range(1, n + 1))
    assert all(0 <= v[0] < 8 for v in a.values())
    by_sp = sorted(a.values())  # (shard, pos, global_pos)
    assert [v[2] for v in by_sp] == list(range(1, n + 1))


def test_corpus_shuffle_shard_files_reproducible(spark, tmp_path):
    """Same seed ⇒ the sharded sink holds identical per-shard ordered
    content across independent writes (the training-order pin)."""
    from project_obsidian_core_spark.datapipe.pipeline import corpus_shuffle

    docs = spark.createDataFrame(
        [(i, "s", f"d{i}") for i in range(200)], ["doc_id", "source", "text"]
    )

    def write_and_read(tag):
        out = corpus_shuffle(docs, seed=7, n_shards=4)
        path = str(tmp_path / tag)
        (
            out.repartition("shard")
            .sortWithinPartitions("shard", "pos")
            .write.partitionBy("shard")
            .parquet(path)
        )
        back = spark.read.parquet(path)
        return {
            s: [
                (r["doc_id"], r["text"])
                for r in back.filter(back["shard"] == s)
                .orderBy("pos")
                .collect()
            ]
            for s in range(4)
        }

    assert write_and_read("w1") == write_and_read("w2")


def test_hash_sample_exact_nested_and_partition_invariant(spark):
    """P13 invariants: exactly k rows; the k'-smallest set is a prefix
    of the k-smallest (nested samples); input partitioning does not
    change membership; plan is TakeOrderedAndProject (no global sort)."""
    from project_obsidian_core_spark.datapipe.pipeline import (
        hash_sample_exact,
    )

    docs = spark.createDataFrame(
        [(i, "s") for i in range(1000)], ["doc_id", "source"]
    )

    def ids(df, k):
        return {r["doc_id"] for r in hash_sample_exact(df, k).collect()}

    s100 = ids(docs, 100)
    assert len(s100) == 100
    assert ids(docs, 30) <= s100  # nested
    assert ids(docs.repartition(17), 100) == s100  # partitioning-invariant
    plan = hash_sample_exact(docs, 100)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_interleave_order_stride_shares_and_determinism(spark):
    """P14 invariants: any prefix of the slot-ordered stream carries
    each source at ~its weight share (off by at most one stride);
    deterministic under repartitioning; slot keys strictly increase
    within a source."""
    from project_obsidian_core_spark.datapipe.pipeline import (
        interleave_order,
    )

    rows = [(i, "a" if i % 3 else "b") for i in range(900)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"]).withColumn(
        "weight_ppm",
        F.when(F.col("source") == "a", F.lit(600_000)).otherwise(
            F.lit(300_000)
        ),
    )
    out = interleave_order(docs).collect()
    ordered = sorted(out, key=lambda r: (r["slot_key"], r["source"], r["src_rank"]))
    # prefix shares: a has 2x b's weight -> in any K-prefix,
    # count_a ~= 2*count_b (within one stride of each)
    for k in (30, 90, 300, 600):
        pa = sum(1 for r in ordered[:k] if r["source"] == "a")
        pb = k - pa
        assert abs(pa - 2 * pb) <= 3, (k, pa, pb)
    # per-source slot keys strictly increase with rank
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["src_rank"], r["slot_key"]))
    for s, pairs in by_src.items():
        pairs.sort()
        ks = [sk for _, sk in pairs]
        assert all(x < y for x, y in zip(ks, ks[1:])), s
    # partitioning invariance
    out2 = interleave_order(docs.repartition(13)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_interleave_presplit_matches_plain_on_skewed_corpus(spark):
    """P14b: the hot-source mitigation reproduces the plain operator
    exactly on a skewed corpus (one source 20x the other)."""
    from project_obsidian_core_spark.datapipe.pipeline import (
        interleave_order,
        interleave_order_presplit,
    )

    rows = [(i, "big" if i % 21 else "small") for i in range(2100)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"]).withColumn(
        "weight_ppm",
        F.when(F.col("source") == "big", F.lit(800_000)).otherwise(
            F.lit(200_000)
        ),
    )
    cols = ["doc_id", "source", "src_rank", "slot_key"]
    plain = sorted(map(tuple, interleave_order(docs).select(*cols).collect()))
    pre = sorted(
        map(
            tuple,
            interleave_order_presplit(docs, n_subs=8).select(*cols).collect(),
        )
    )
    assert plain == pre


def test_dedup_yield_decile_edges_when_ten_does_not_divide_n(spark, tmp_path):
    """P21 edge rounding (r15 ADVICE #1): decile membership and the
    reported scan_pos must use the SAME edge rounding — with n=13 the
    old ((fp-1)*10) div n membership counted a first occurrence at
    scan_pos+1 into the earlier decile, pushing n_unique_cum above
    scan_pos and dup_rate_ppm negative on a near-unique corpus."""
    from project_obsidian_core_spark.plans.pipeline_queries import (
        corpus_dedup_yield,
    )

    # 13 docs, 12 distinct texts (doc 12 repeats doc 0's text)
    rows = [(i, f"unique text number {i}") for i in range(12)]
    rows.append((12, "unique text number 0"))
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    out = [r.asDict() for r in corpus_dedup_yield(spark, str(tmp_path)).collect()]
    assert [r["decile"] for r in out] == list(range(10))
    prev_cum = 0
    for r in out:
        # the invariant the old rounding broke
        assert r["n_unique_cum"] <= r["scan_pos"], r
        assert r["dup_rate_ppm"] >= 0, r
        assert r["n_unique_cum"] >= prev_cum
        prev_cum = r["n_unique_cum"]
    assert out[-1]["scan_pos"] == 13
    assert out[-1]["n_unique_cum"] == 12
    assert out[-1]["dup_rate_ppm"] == 1_000_000 // 13
