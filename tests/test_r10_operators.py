"""Round-10 operator units: python/numpy reference checks for the
Theil-Sen / change-point / Holt trend ladder, the Q2/Q20 relational
reshapes, SNN edge strength, the embedding dimension profile, bigram
surprisal and the cohort revenue matrix (oracle gates prove cross-engine
exactness; these pin SEMANTICS against independent references)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------- hour-grid helper --
def _hour_grid(spark, sf_dir):
    """The (metric_name -> sorted [(hour, cents_sum)]) grid the three new
    metric operators share, rebuilt independently in python."""
    from project_obsidian_core_spark.plans.metrics_queries import (
        synthesize_metrics,
    )

    rows = (
        synthesize_metrics(spark, sf_dir)
        .select(
            "metric_name",
            F.expr("unix_micros(time) div 3600000000").alias("x"),
            "metric_value",
        )
        .collect()
    )
    grid: dict[str, dict[int, int]] = {}
    for r in rows:
        grid.setdefault(r["metric_name"], {})
        grid[r["metric_name"]][r["x"]] = (
            grid[r["metric_name"]].get(r["x"], 0) + r["metric_value"]
        )
    return {m: sorted(d.items()) for m, d in grid.items()}


def test_theil_sen_matches_python_reference(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_theil_sen,
    )

    grid = _hour_grid(spark, SF)
    got = {r["metric_name"]: r for r in metric_theil_sen(spark, SF).collect()}
    assert set(got) == set(grid)
    for m, pts in grid.items():
        slopes = sorted(
            float(y2 - y1) / float(x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        )
        r = got[m]
        assert r["n_buckets"] == len(pts)
        assert r["n_pairs"] == len(slopes)
        assert r["median_slope_cents_per_hour"] == slopes[
            math.ceil(len(slopes) / 2) - 1
        ]


def test_theil_sen_is_robust_where_ols_is_not():
    """The estimator property itself: one wild outlier moves the OLS
    slope arbitrarily but leaves the pairwise-median unmoved."""
    pts = [(x, 10 * x) for x in range(9)] + [(9, 100000)]
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
    )
    med = slopes[math.ceil(len(slopes) / 2) - 1]
    assert med == 10.0
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert ols > 1000  # dragged 100x by the single outlier


def test_changepoint_matches_python_reference(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_changepoint,
    )

    grid = _hour_grid(spark, SF)
    got = {r["metric_name"]: r for r in metric_changepoint(spark, SF).collect()}
    for m, pts in grid.items():
        ys = [y for _, y in pts]
        n, tot = len(ys), sum(ys)
        best = None
        s1 = 0
        for s in range(1, n):
            s1 += ys[s - 1]
            d = float(s1) * (n - s) - float(tot - s1) * s
            gain = d * d / float(s * (n - s) * n)
            if best is None or gain > best[0]:
                best = (gain, s)
        r = got[m]
        assert r["split_idx"] == best[1]
        assert r["gain"] == best[0]
        assert r["last_hour_of_seg1"] == pts[best[1] - 1][0]
        assert r["s1"] + r["s2"] == tot


def test_changepoint_finds_a_planted_step():
    """Closed-form sanity: on a clean step series the argmax gain sits
    exactly at the step boundary."""
    ys = [100] * 6 + [900] * 4
    n, tot = len(ys), sum(ys)
    gains = []
    s1 = 0
    for s in range(1, n):
        s1 += ys[s - 1]
        d = float(s1) * (n - s) - float(tot - s1) * s
        gains.append(d * d / float(s * (n - s) * n))
    assert gains.index(max(gains)) + 1 == 6


def test_holt_matches_python_recursion(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        HOLT_ALPHA,
        HOLT_BETA,
        metric_holt,
    )

    grid = _hour_grid(spark, SF)
    got = {r["metric_name"]: r for r in metric_holt(spark, SF).collect()}
    for m, pts in grid.items():
        ys = [float(y) for _, y in pts]
        lvl, tr = ys[0], ys[1] - ys[0]
        for x in ys[2:]:
            nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (lvl + tr)
            tr = HOLT_BETA * (nl - lvl) + (1 - HOLT_BETA) * tr
            lvl = nl
        r = got[m]
        assert r["n_buckets"] == len(ys)
        assert r["level"] == lvl
        assert r["trend"] == tr
        assert r["forecast_next"] == lvl + tr


def test_holt_tracks_a_linear_ramp():
    """On y = 5t the recursion converges to trend ~5 — the property the
    flat EWMA cannot have (its lag never closes on a ramp)."""
    from project_obsidian_core_spark.plans.metrics_queries import (
        HOLT_ALPHA,
        HOLT_BETA,
    )

    ys = [5.0 * t for t in range(1, 101)]
    lvl, tr = ys[0], ys[1] - ys[0]
    for x in ys[2:]:
        nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (lvl + tr)
        tr = HOLT_BETA * (nl - lvl) + (1 - HOLT_BETA) * tr
        lvl = nl
    assert abs(tr - 5.0) < 1e-6
    assert abs(lvl - ys[-1]) < 1e-6


# --------------------------------------------------------- SNN strength --
def test_snn_strength_on_known_graph(spark):
    """Two triangles sharing edge (1,2): the shared edge sees both apex
    nodes; spoke edges see exactly the opposite apex... hand-counted."""
    from project_obsidian_core_spark.datapipe.similarity import snn_strength

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): (r["n_shared"], r["deg_a"], r["deg_b"], r["snn_jaccard_ppm"])
        for r in snn_strength(edges).collect()
    }
    # degrees: 1->3, 2->3, 3->2, 4->2
    assert got[(1, 2)] == (2, 3, 3, 500_000)  # shares {3,4}; 2/(3+3-2)
    assert got[(1, 3)] == (1, 3, 2, 250_000)  # shares {2}
    assert got[(2, 3)] == (1, 3, 2, 250_000)
    assert got[(1, 4)] == (1, 3, 2, 250_000)
    assert got[(2, 4)] == (1, 3, 2, 250_000)


def test_snn_strength_pendant_edge_shares_nothing(spark):
    from project_obsidian_core_spark.datapipe.similarity import snn_strength

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    got = {(r["a"], r["b"]): r["n_shared"] for r in snn_strength(edges).collect()}
    assert got == {(1, 2): 0, (2, 3): 0}


# ---------------------------------------------------- relational reshapes --
def test_min_cost_supplier_matches_pandas(spark):
    import pandas as pd

    from project_obsidian_core_spark.plans.relational_queries import (
        min_cost_supplier,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    reg = pd.read_parquet(f"{SF}/region.parquet")
    part = part[(part.p_type == "STANDARD") & (part.p_size <= 15)]
    market = supp.merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    ).merge(reg[reg.r_name == "EUROPE"], left_on="n_regionkey", right_on="r_regionkey")
    off = li.merge(part, left_on="l_partkey", right_on="p_partkey").merge(
        market, left_on="l_suppkey", right_on="s_suppkey"
    )
    off["unit_e6"] = (
        off.l_extendedprice.mul(100).round().astype("int64") * 10_000
    ) // off.l_quantity.round().astype("int64")
    best = (
        off.groupby(["p_partkey", "s_suppkey"])["unit_e6"].min().reset_index()
    )
    mins = best.groupby("p_partkey")["unit_e6"].min().rename("min_u")
    best = best.join(mins, on="p_partkey")
    expected = {
        (int(r.p_partkey), int(r.s_suppkey)): int(r.unit_e6)
        for r in best[best.unit_e6 == best.min_u].itertuples()
    }
    got = {
        (r["p_partkey"], r["s_suppkey"]): r["min_unit_e6"]
        for r in min_cost_supplier(spark, SF).collect()
    }
    assert got == expected


def test_dominant_suppliers_matches_pandas(spark):
    import pandas as pd

    from project_obsidian_core_spark.plans.relational_queries import (
        dominant_suppliers,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    li = li[
        (li.l_shipdate >= "1997-01-01") & (li.l_shipdate < "1998-01-01")
    ].merge(
        part[part.p_name.str.startswith("red ")],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    li["qty"] = li.l_quantity.astype("int64")
    ps = li.groupby(["p_partkey", "l_suppkey"])["qty"].sum().reset_index()
    tot = ps.groupby("p_partkey")["qty"].sum().rename("part_qty")
    ps = ps.join(tot, on="p_partkey")
    dom = ps[ps.qty * 2 > ps.part_qty]
    exp = (
        dom.groupby("l_suppkey")
        .agg(n=("qty", "size"), q=("qty", "sum"))
        .reset_index()
    )
    expected = {
        int(r.l_suppkey): (int(r.n), int(r.q)) for r in exp.itertuples()
    }
    got = {
        r["s_suppkey"]: (r["n_dominant_parts"], r["dominated_qty"])
        for r in dominant_suppliers(spark, SF).collect()
    }
    assert got == expected


# ----------------------------------------------------- embedding profile --
def test_embedding_dim_stats_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from project_obsidian_core_spark.plans.datapipe_queries import (
        embedding_dim_stats,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb.embedding.to_numpy())  # (n, 64) float32
    q = np.floor(mat.astype("float64") * 1_000_000).astype("int64")
    got = embedding_dim_stats(spark, SF).collect()
    assert len(got) == q.shape[1]
    for r in got:
        col = q[:, r["dim"]]
        assert r["n"] == len(col)
        assert r["sum_micro"] == int(col.sum())
        assert r["min_micro"] == int(col.min())
        assert r["max_micro"] == int(col.max())
        s = int(col.sum())
        # Spark `div` (and DuckDB //) TRUNCATE toward zero on ints;
        # python // floors — mirror truncation here
        assert r["mean_micro"] == abs(s) // len(col) * (1 if s >= 0 else -1)


# ------------------------------------------------------ bigram surprisal --
def test_bigram_surprisal_hand_computed(spark):
    from project_obsidian_core_spark.datapipe.curation import (
        SURPRISAL_SCALE,
        bigram_surprisal_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b c"),
            (3, "z"),  # single token: zero bigrams, null mean
        ],
        "doc_id long, text string",
    )
    # unigrams: a=3, b=3, c=1, z=1; bigrams: (a,b)=3, (b,a)=1, (b,c)=1
    S = SURPRISAL_SCALE
    w_ab = (3 * S) // 3  # 1000
    w_ba = (3 * S) // 1  # 3000
    w_bc = (3 * S) // 1  # 3000
    got = {r["doc_id"]: r for r in bigram_surprisal_score(docs).collect()}
    assert got[1]["n_bigrams"] == 3
    assert got[1]["surprisal_q"] == w_ab + w_ba + w_ab
    assert got[2]["n_bigrams"] == 2
    assert got[2]["surprisal_q"] == w_ab + w_bc
    assert got[3]["n_bigrams"] == 0
    assert got[3]["surprisal_q"] == 0
    assert got[3]["mean_surprisal"] is None
    assert got[1]["mean_surprisal"] == (w_ab + w_ba + w_ab) / 3


def test_bigram_surprisal_flags_shuffled_text(spark):
    """The operator's reason to exist: same unigrams, unusual order →
    higher conditional surprisal than the fluent original."""
    from project_obsidian_core_spark.datapipe.curation import (
        bigram_surprisal_score,
    )

    fluent = "the cat sat on the mat " * 10
    shuffled = "cat the on sat mat the " * 10
    docs = spark.createDataFrame(
        [(1, fluent.strip()), (2, fluent.strip()), (3, shuffled.strip())],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["mean_surprisal"] for r in bigram_surprisal_score(docs).collect()}
    assert got[3] > got[1]


# -------------------------------------------------------- cohort revenue --
def test_cohort_revenue_matches_pandas(spark):
    import pandas as pd

    from project_obsidian_core_spark.plans.analytics_ext_queries import (
        customer_cohort_revenue,
    )

    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["m"] = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month - 1
    o["pc"] = o.o_totalprice.mul(100).round().astype("int64")
    o = o.join(o.groupby("o_custkey")["m"].min().rename("cohort"), on="o_custkey")
    mat = (
        o.groupby(["cohort", "m"])
        .agg(
            n_cust=("o_custkey", "nunique"),
            n_orders=("o_orderkey", "size"),
            rev=("pc", "sum"),
        )
        .reset_index()
        .sort_values(["cohort", "m"])
    )
    mat["cum"] = mat.groupby("cohort")["rev"].cumsum()
    expected = {
        (int(r.cohort), int(r.m)): (int(r.n_cust), int(r.n_orders), int(r.rev), int(r.cum))
        for r in mat.itertuples()
    }
    got = {
        (r["cohort_m"], r["m"]): (
            r["n_customers"],
            r["n_orders"],
            r["revenue_cents"],
            r["cum_revenue_cents"],
        )
        for r in customer_cohort_revenue(spark, SF).collect()
    }
    assert got == expected
    for (c, m), _ in got.items():
        assert m >= c


# ------------------------------------------------- ordered-sequence state --
def test_merge_sequence_is_arrival_order_independent():
    """T20's core claim: merging disjoint batches in ANY order rebuilds
    the identical (ts, event_id)-sorted sequence."""
    import itertools
    import random

    from project_obsidian_core_spark.streaming.sequence_state import (
        merge_sequence,
    )

    rng = random.Random(3)
    rows = [(rng.randrange(100), i, rng.choice("abc")) for i in range(30)]
    batches = [rows[0:7], rows[7:19], rows[19:30]]
    results = []
    for perm in itertools.permutations(range(3)):
        ts, eid, ty = [], [], []
        for b in perm:
            ts, eid, ty = merge_sequence(ts, eid, ty, batches[b])
        results.append((ts, eid, ty))
    assert all(r == results[0] for r in results)
    assert results[0][0] == sorted(results[0][0])  # ts sorted
    # and equals the one-shot sort of everything
    ts1, eid1, ty1 = merge_sequence([], [], [], rows)
    assert results[0] == (ts1, eid1, ty1)


def test_transition_counts_hand_checked():
    from project_obsidian_core_spark.streaming.sequence_state import (
        transition_counts,
    )

    assert transition_counts(["a", "b", "b", "a"]) == {
        ("a", "b"): 1,
        ("b", "b"): 1,
        ("b", "a"): 1,
    }
    assert transition_counts(["x"]) == {}
    assert transition_counts([]) == {}


def test_streaming_transitions_drained_state(spark):
    """Three users, events delivered in one batch via a tiny memory
    replay — drained max-version counts equal the direct batch lag."""
    import tempfile

    from pyspark.sql import functions as F  # noqa: F811

    from project_obsidian_core_spark.streaming.sequence_state import (
        streaming_transitions,
    )

    rows = [
        (1, 10, "2024-01-01 00:00:00", "a"),
        (2, 10, "2024-01-01 00:01:00", "b"),
        (3, 10, "2024-01-01 00:02:00", "a"),
        (4, 20, "2024-01-01 00:00:30", "b"),
        (5, 20, "2024-01-01 00:03:00", "b"),
    ]
    tmp = tempfile.mkdtemp(prefix="seqstate_")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, event_type string"
    ).select(
        "event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/src")
    schema = spark.read.parquet(f"{tmp}/src").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{tmp}/src")
    )
    out = streaming_transitions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("seqstate_unit")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    em = spark.table("seqstate_unit")
    got = {
        (r["user_id"], r["prev_type"], r["next_type"]): r["n"]
        for r in em.collect()
    }
    assert got == {
        (10, "a", "b"): 1,
        (10, "b", "a"): 1,
        (20, "b", "b"): 1,
    }


def test_funnel_progress_greedy_and_out_of_order():
    """T21 core: greedy-earliest anchored progress, and merge-insert of a
    LATE-ARRIVING anchor converges to the same answer."""
    from project_obsidian_core_spark.streaming.sequence_state import (
        funnel_progress,
        merge_sequence,
    )

    stages = ("view", "click", "purchase")
    W = 100
    # full completion inside the window
    ts = [10, 20, 30]
    ty = ["view", "click", "purchase"]
    assert funnel_progress(ts, ty, stages, W) == 3
    # purchase lands past the ANCHOR deadline -> stage 2 only
    assert funnel_progress([10, 20, 111], ty, stages, W) == 2
    # click AT the anchor instant does not count (strictly after), and
    # without a qualifying click the purchase can never be reached
    assert funnel_progress([10, 10, 30], ty, stages, W) == 1
    # no anchor at all
    assert funnel_progress([5], ["click"], stages, W) == 0
    # out-of-order arrival: later stages first, anchor in a later batch
    ts1, eid1, ty1 = merge_sequence([], [], [], [(20, 2, "click"), (30, 3, "purchase")])
    assert funnel_progress(ts1, ty1, stages, W) == 0
    ts2, eid2, ty2 = merge_sequence(ts1, eid1, ty1, [(10, 1, "view")])
    assert funnel_progress(ts2, ty2, stages, W) == 3


# ------------------------------------------------------------ runs test --
def test_runs_test_matches_python_reference(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_runs_test,
    )

    grid = _hour_grid(spark, SF)
    got = {r["metric_name"]: r for r in metric_runs_test(spark, SF).collect()}
    for m, pts in grid.items():
        ys = [y for _, y in pts]
        med = sorted(ys)[math.ceil(len(ys) / 2) - 1]
        signs = [1 if y > med else -1 for y in ys if y != med]
        n1 = signs.count(1)
        n2 = signs.count(-1)
        runs = 0 if not signs else 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        r = got[m]
        assert (r["n_plus"], r["n_minus"], r["n_runs"]) == (n1, n2, runs)
        if n1 > 0 and n2 > 0 and n1 + n2 > 1:
            n = n1 + n2
            mu = 1.0 + (2.0 * n1 * n2) / n
            s2 = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)) / (
                n * n * (n - 1.0)
            )
            assert abs(r["z"] - (runs - mu) / math.sqrt(s2)) < 1e-9


def test_runs_test_detects_clumping():
    """All plus then all minus = 2 runs, far below the random mean."""
    signs = [1] * 10 + [-1] * 10
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert runs == 2
    n1 = n2 = 10
    mu = 1.0 + (2.0 * n1 * n2) / 20
    assert runs < mu - 5  # strongly non-random


# ---------------------------------------------------------- type affinity --
def test_type_affinity_matches_pandas(spark):
    import pandas as pd

    from project_obsidian_core_spark.plans.behavior_queries import (
        events_type_affinity,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ut = ev[["user_id", "event_type"]].drop_duplicates()
    n_users = ev.user_id.nunique()
    per_t = ut.groupby("event_type").size()
    from itertools import combinations

    expected = {}
    sets = ut.groupby("user_id")["event_type"].agg(set)
    for t1, t2 in combinations(sorted(per_t.index), 2):
        n_both = int(sum(1 for s in sets if t1 in s and t2 in s))
        if n_both:
            expected[(t1, t2)] = (
                n_both,
                n_both * n_users * 1_000_000 // (int(per_t[t1]) * int(per_t[t2])),
            )
    got = {
        (r["t1"], r["t2"]): (r["n_both"], r["lift_ppm"])
        for r in events_type_affinity(spark, SF).collect()
    }
    assert got == expected


# --------------------------------------------------------------- RRF fuse --
def test_rrf_fusion_recovers_either_indexs_hits(spark):
    """Fusion containment: every fused top-k candidate came from one of
    the two rankers, scores are the exact integer RRF of their ranks,
    and a candidate found by BOTH outranks an equal-rank single-index
    candidate."""
    from project_obsidian_core_spark.plans.datapipe_queries import (
        RRF_K,
        _TOPK,
        knn_rrf_fusion,
        knn_ivf,
        knn_lsh,
    )

    lsh = {
        (r["q_id"], r["cand_id"]): r["rank"]
        for r in knn_lsh(spark, SF).collect()
    }
    ivf = {
        (r["q_id"], r["cand_id"]): r["rank"]
        for r in knn_ivf(spark, SF).collect()
    }
    fused = knn_rrf_fusion(spark, SF).collect()
    assert fused
    for r in fused:
        key = (r["q_id"], r["cand_id"])
        assert key in lsh or key in ivf
        exp = 0
        if key in lsh:
            assert r["rank_lsh"] == lsh[key]
            exp += 1_000_000 // (RRF_K + lsh[key])
        else:
            assert r["rank_lsh"] is None
        if key in ivf:
            assert r["rank_ivf"] == ivf[key]
            exp += 1_000_000 // (RRF_K + ivf[key])
        else:
            assert r["rank_ivf"] is None
        assert r["rrf_score"] == exp
        assert r["fused_rank"] <= _TOPK


# ---------------------------------------------------------- gap sessions --
def test_gap_sessions_hand_checked_and_bridge_merge():
    """T22 core: session splitting, and the late-straggler BRIDGE case —
    an event arriving between two finalized-looking sessions merges
    them on re-derivation."""
    from project_obsidian_core_spark.streaming.sequence_state import (
        gap_sessions,
        merge_sequence,
    )

    G = 100
    # two sessions: gap of 150 between t=20 and t=170
    rows = gap_sessions([10, 20, 170, 200], [1, 2, 3, 4], G)
    assert rows == [(1, 10, 20, 2, 3), (2, 170, 200, 2, 7)]
    # exactly-gap spacing does NOT split (strict >)
    assert gap_sessions([0, 100, 200], [1, 1, 1], G) == [(1, 0, 200, 3, 3)]
    assert gap_sessions([], [], G) == []
    # bridge: event at t=95 arrives late; 170-95=75 <= G and 95-20=75 <= G
    ts, eid, vals = merge_sequence([], [], [], [
        (10, 1, 1), (20, 2, 2), (170, 3, 3), (200, 4, 4)
    ])
    assert len(gap_sessions(ts, vals, G)) == 2
    ts, eid, vals = merge_sequence(ts, eid, vals, [(95, 5, 10)])
    assert gap_sessions(ts, vals, G) == [(1, 10, 200, 5, 20)]


# ------------------------------------------------------- cross-moments --
def test_embedding_crossmoments_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from project_obsidian_core_spark.plans.datapipe_queries import (
        embedding_crossmoments,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb.embedding.to_numpy())
    q = np.floor(mat.astype("float64") * 1_000_000).astype("int64")
    gram = q.T @ q  # (64, 64) exact in int64 at this scale
    got = embedding_crossmoments(spark, SF).collect()
    assert len(got) == 64 * 65 // 2
    for r in got:
        assert r["n"] == q.shape[0]
        assert r["sum_cross_micro2"] == int(gram[r["dim_i"], r["dim_j"]])


def test_crossmoments_feed_covariance_pca(spark):
    """The operator's purpose: means (N15) + cross-moments (N17) alone
    reconstruct the exact covariance numpy computes from raw data —
    the driver-side eigen-solve needs nothing else from the corpus."""
    import numpy as np
    import pandas as pd

    from project_obsidian_core_spark.plans.datapipe_queries import (
        embedding_crossmoments,
        embedding_dim_stats,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb.embedding.to_numpy())
    q = np.floor(mat.astype("float64") * 1_000_000).astype("int64")
    n = q.shape[0]
    sums = {r["dim"]: r["sum_micro"] for r in embedding_dim_stats(spark, SF).collect()}
    cross = {
        (r["dim_i"], r["dim_j"]): r["sum_cross_micro2"]
        for r in embedding_crossmoments(spark, SF).collect()
    }
    ref_cov = np.cov(q.T.astype("float64"), bias=True)
    for (i, j), s_ij in list(cross.items())[:200]:
        cov = s_ij / n - (sums[i] / n) * (sums[j] / n)
        assert abs(cov - ref_cov[i, j]) < 1e-3 * max(1.0, abs(ref_cov[i, j]))


# ------------------------------------------------------------ readability --
def test_readability_hand_computed(spark):
    from project_obsidian_core_spark.plans.curation_queries import (
        text_readability,
    )

    docs_txt = {
        1: "the cat sat. it was flat!",   # 6 words, 2 terminals, runs: e,a,a,i,a,a
        2: "xyz",                          # no vowels, no terminal -> floor 1
    }
    import project_obsidian_core_spark.plans.curation_queries as cq

    spark_df = None
    real_load = cq.load
    try:
        spark2 = spark
        spark_df = spark2.createDataFrame(
            list(docs_txt.items()), "doc_id long, text string"
        )
        cq.load = lambda s, d, t: spark_df
        got = {r["doc_id"]: r for r in text_readability(spark2, "unused").collect()}
    finally:
        cq.load = real_load
    r1 = got[1]
    assert r1["n_words"] == 6
    assert r1["n_sentences"] == 2
    # vowel runs in "the cat sat. it was flat!": e,a,a,i,a,a = 6
    assert r1["n_vowel_runs"] == 6
    assert abs(
        r1["flesch_score"] - (206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6))
    ) < 1e-9
    r2 = got[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_vowel_runs"]) == (1, 1, 0)


# ------------------------------------------------------------ elasticity --
def test_brand_elasticity_matches_pandas(spark):
    import pandas as pd

    from project_obsidian_core_spark.plans.relational_queries import (
        brand_price_elasticity,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    df = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey",
                  right_on="p_partkey")
    df["px"] = (
        df.l_extendedprice.mul(100).round().astype("int64")
        // df.l_quantity.astype("int64")
    ) // 100
    df["qy"] = df.l_quantity.astype("int64")
    got = {r["p_brand"]: r for r in brand_price_elasticity(spark, SF).collect()}
    for brand, g in df.groupby("p_brand"):
        x = (g.px - g.px.min()).to_numpy()
        y = (g.qy - g.qy.min()).to_numpy()
        n = len(g)
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        den = n * int((x * x).sum()) - int(x.sum()) ** 2
        r = got[brand]
        assert (r["n"], r["slope_num"], r["slope_den"]) == (n, num, den)
        if den:
            assert r["qty_per_dollar"] == num / den


# --------------------------------------------------------- assortativity --
def test_assortativity_known_graphs(spark):
    """A star is maximally disassortative (r = -1); an edge-regular
    graph (cycle) has zero variance -> NULL by the guard."""
    import math as _m

    def assort(edges):
        dedges = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
        deg = {}
        for s, _ in dedges:
            deg[s] = deg.get(s, 0) + 1
        dx = [deg[s] for s, _ in dedges]
        dy = [deg[t] for _, t in dedges]
        m = len(dedges)
        sx, sy = sum(dx), sum(dy)
        sxy = sum(a * b for a, b in zip(dx, dy))
        sxx = sum(a * a for a in dx)
        syy = sum(b * b for b in dy)
        num = m * sxy - sx * sy
        denx, deny = m * sxx - sx * sx, m * syy - sy * sy
        if denx <= 0 or deny <= 0:
            return None
        return num / (_m.sqrt(denx) * _m.sqrt(deny))

    star = [(0, i) for i in range(1, 6)]
    assert abs(assort(star) - (-1.0)) < 1e-12
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    assert assort(cycle) is None  # all degrees equal -> zero variance
    # mixed graph: value in (-1, 1)
    mixed = star + [(1, 2), (3, 4)]
    r = assort(mixed)
    assert -1 < r < 1


# --------------------------------------------------------- streaming EWMA --
def test_fold_bucket_sums_commutative_and_sorted():
    import itertools

    from project_obsidian_core_spark.streaming.sequence_state import (
        fold_bucket_sums,
    )

    batches = [[(5, 10), (3, 1)], [(5, 7), (1, 2)], [(3, 4)]]
    results = []
    for perm in itertools.permutations(range(3)):
        b, s = [], []
        for i in perm:
            b, s = fold_bucket_sums(b, s, batches[i])
        results.append((b, s))
    assert all(r == results[0] for r in results)
    assert results[0] == ([1, 3, 5], [2, 5, 17])


def test_ewma_pair_matches_batch_fold_semantics():
    """Bit-equality with the Spark aggregate expression's algebra:
    seeded with the first element, acc + a*(x - acc) per later element."""
    from project_obsidian_core_spark.streaming.sequence_state import ewma_pair

    sums = [100, 250, 90, 400]
    fast, slow = ewma_pair(sums, 0.3, 0.05)
    f = s = 100.0
    for x in (250.0, 90.0, 400.0):
        f = f + 0.3 * (x - f)
        s = s + 0.05 * (x - s)
    assert (fast, slow) == (f, s)
    assert ewma_pair([], 0.3, 0.05) == (None, None)
    assert ewma_pair([7], 0.3, 0.05) == (7.0, 7.0)


# ------------------------------------------------------ pack efficiency --
def test_pack_efficiency_matches_python(spark):
    import pandas as pd

    from project_obsidian_core_spark.plans.pipeline_queries import (
        _CTX_LEN,
        corpus_pack_efficiency,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["n_tokens"] = docs.text.str.split(" ").str.len()
    got = {r["source"]: r for r in corpus_pack_efficiency(spark, SF).collect()}
    for src, g in docs.groupby("source"):
        g = g.sort_values("doc_id")
        toks = g.n_tokens.to_list()
        total = sum(toks)
        n_ctx = -(-total // _CTX_LEN)  # ceil
        prefix = 0
        straddlers = 0
        for t in toks:
            if (prefix % _CTX_LEN) + t > _CTX_LEN:
                straddlers += 1
            prefix += t
        r = got[src]
        assert r["n_docs"] == len(g)
        assert r["total_tokens"] == total
        assert r["n_contexts"] == n_ctx
        assert r["utilization_ppm"] == total * 1_000_000 // (n_ctx * _CTX_LEN)
        assert r["waste_tokens"] == n_ctx * _CTX_LEN - total
        assert r["n_straddlers"] == straddlers


# ------------------------------------------------------- basket affinity --
def test_basket_affinity_matches_pandas(spark):
    import pandas as pd
    from itertools import combinations

    from project_obsidian_core_spark.plans.relational_queries import (
        orders_basket_affinity,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = op.l_orderkey.nunique()
    per_p = op.groupby("l_partkey").size()
    counts = {}
    for _, basket in op.groupby("l_orderkey")["l_partkey"]:
        for p1, p2 in combinations(sorted(basket), 2):
            counts[(p1, p2)] = counts.get((p1, p2), 0) + 1
    expected = {
        k: (
            v,
            v * n_orders * 1_000_000 // (int(per_p[k[0]]) * int(per_p[k[1]])),
        )
        for k, v in counts.items()
        if v >= 2
    }
    got = {
        (r["p1"], r["p2"]): (r["n_both"], r["lift_ppm"])
        for r in orders_basket_affinity(spark, SF).collect()
    }
    assert got == expected


# -------------------------------------------------------- vocab growth --
def test_vocab_growth_matches_python(spark):
    import pandas as pd

    from project_obsidian_core_spark.plans.curation_queries import (
        _VOCAB_GROWTH_FRACS,
        vocab_growth,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    n = len(docs)
    ids = docs.doc_id.to_list()
    first = {}
    for did, text in zip(docs.doc_id, docs.text):
        for t in text.split(" "):
            if t not in first or did < first[t]:
                first[t] = did
    got = {r["sixteenth"]: r for r in vocab_growth(spark, SF).collect()}
    prev_v = 0
    for k in _VOCAB_GROWTH_FRACS:
        c = math.ceil(n * k / 16.0)
        thr = ids[c - 1]
        v = sum(1 for d in first.values() if d <= thr)
        r = got[k]
        assert r["checkpoint_docs"] == c
        assert r["threshold_doc_id"] == thr
        assert r["vocab_size"] == v
        assert v >= prev_v  # monotone growth
        prev_v = v


# ---------------------------------------------------------- stickiness --
def test_stickiness_matches_pandas(spark):
    import pandas as pd

    from project_obsidian_core_spark.plans.behavior_queries import (
        _STICKY_WINDOW_DAYS,
        events_stickiness,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    # parquet timestamps land as datetime64[us] in pandas — go through a
    # Timedelta division rather than a unit-dependent int cast
    ev["day"] = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(days=1)
    ud = ev[["user_id", "day"]].drop_duplicates()
    got = {r["day"]: r for r in events_stickiness(spark, SF).collect()}
    for d in sorted(ud.day.unique()):
        dau = ud[ud.day == d].user_id.nunique()
        mau = ud[
            (ud.day <= d) & (ud.day > d - _STICKY_WINDOW_DAYS)
        ].user_id.nunique()
        r = got[d]
        assert (r["dau"], r["mau"]) == (dau, mau)
        assert r["stickiness_ppm"] == dau * 1_000_000 // mau
        assert r["stickiness_ppm"] <= 1_000_000


# ----------------------------------------------------- threshold sweep --
def test_threshold_sweep_monotone_and_bounded(spark):
    from project_obsidian_core_spark.plans.datapipe_queries import (
        dedup_threshold_sweep,
    )

    rows = dedup_threshold_sweep(spark, SF).collect()
    assert [r["threshold_permille"] for r in rows] == list(range(100, 1000, 100))
    counts = [r["n_pairs_at_or_above"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # monotone down
    assert all(c <= rows[0]["n_candidates"] for c in counts)


# -------------------------------------------------------- trigram paths --
def test_trigram_paths_hand_checked(spark):
    import project_obsidian_core_spark.plans.behavior_queries as bq

    rows = [
        (1, 10, "2024-01-01 00:00:00", "a", 0.0, "{}"),
        (2, 10, "2024-01-01 00:01:00", "b", 0.0, "{}"),
        (3, 10, "2024-01-01 00:02:00", "a", 0.0, "{}"),
        (4, 10, "2024-01-01 00:03:00", "b", 0.0, "{}"),
        (5, 20, "2024-01-01 00:00:00", "a", 0.0, "{}"),
        (6, 20, "2024-01-01 00:01:00", "b", 0.0, "{}"),
        (7, 20, "2024-01-01 00:02:00", "a", 0.0, "{}"),
    ]
    df = (
        spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts_s string, event_type string,"
            " value double, props string",
        )
        .selectExpr("event_id", "user_id", "cast(ts_s as timestamp) as ts",
                    "event_type", "value", "props")
    )
    real = bq.load
    bq.load = lambda s, d, t: df
    try:
        got = {
            (r["s1"], r["s2"], r["s3"]): r["n_paths"]
            for r in bq.events_trigram_paths(spark, "unused").collect()
        }
    finally:
        bq.load = real
    # user10: aba, bab; user20: aba  -> aba x2, bab x1
    assert got == {("a", "b", "a"): 2, ("b", "a", "b"): 1}


# --------------------------------------------------------- outliers ----
def test_embedding_outliers_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from project_obsidian_core_spark.plans.datapipe_queries import (
        _OUTLIER_TOPK,
        embedding_outliers,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb.embedding.to_numpy())
    q = np.floor(mat.astype("float64") * 1_000_000).astype("int64")
    s = q.sum(axis=0)
    n = q.shape[0]
    mu = np.abs(s) // n * np.sign(s)  # truncating div, matching engines
    d2 = ((q - mu) ** 2).sum(axis=1)
    order = sorted(range(n), key=lambda i: (-d2[i], emb.vec_id.iloc[i]))
    expected = [
        (int(emb.vec_id.iloc[i]), int(d2[i])) for i in order[:_OUTLIER_TOPK]
    ]
    got = [
        (r["vec_id"], r["dist2_micro2"])
        for r in embedding_outliers(spark, SF).collect()
    ]
    assert got == expected


# ----------------------------------------------------- family histogram --
def test_family_histogram_consistent_with_clusters(spark):
    from project_obsidian_core_spark.plans.datapipe_queries import (
        dedup_clusters,
        dedup_family_histogram,
    )

    cl = dedup_clusters(spark, SF).collect()
    sizes = {}
    for r in cl:
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    bands = {}
    for sz in sizes.values():
        b = "2" if sz <= 2 else ("3-10" if sz <= 10 else "11+")
        fam, docs, rem = bands.get(b, (0, 0, 0))
        bands[b] = (fam + 1, docs + sz, rem + sz - 1)
    got = {
        r["family_size_band"]: (r["n_families"], r["n_docs"], r["n_removable"])
        for r in dedup_family_histogram(spark, SF).collect()
    }
    assert got == bands
