"""Units for the round-14 operators (T37 streaming seasonal
decomposition — registered in Block R14b; the driver gate runs the A84
batch oracle verbatim against the drained stream, these pin the fold's
revision semantics and the pure re-derivation)."""

from __future__ import annotations

import pandas as pd
import pytest


class FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _decompose_reference(buckets, sums):
    """Independent recompute of the A84 formulas (no shared code)."""
    n = len(buckets)
    trend = []
    for i in range(n):
        lo, hi = max(0, i - 12), min(n, i + 12 + 1)
        trend.append((sum(sums[lo:hi]), hi - lo))
    detr = [
        25 * sums[i] - trend[i][0] if trend[i][1] == 25 else None
        for i in range(n)
    ]
    num, cnt = {}, {}
    for d, b in zip(detr, buckets):
        if d is not None:
            num[b % 24] = num.get(b % 24, 0) + d
            cnt[b % 24] = cnt.get(b % 24, 0) + 1
    seas = {h: num[h] / (25.0 * cnt[h]) for h in num}
    return trend, detr, seas


def test_seasonal_from_series_matches_reference_formulas():
    from project_obsidian_core_spark.streaming.sequence_state import (
        seasonal_from_series,
    )

    buckets = list(range(1000, 1060))  # 60 hours, full windows inside
    sums = [1000 + 37 * (i % 24) + (-1) ** i * 5 * i for i in range(60)]
    rows = seasonal_from_series(buckets, sums)
    trend, detr, seas = _decompose_reference(buckets, sums)
    assert len(rows) == 60
    for i, (b, v, t25, nw, d25, hod, s) in enumerate(rows):
        assert (b, v) == (buckets[i], sums[i])
        assert (t25, nw) == trend[i]
        assert d25 == detr[i]
        assert hod == b % 24
        assert s == seas.get(hod)
    # edge windows (< 25 rows) must carry NULL detrended values
    assert rows[0][4] is None and rows[-1][4] is None
    assert rows[12][4] is not None and rows[47][4] is not None


def test_seasonal_fold_late_bucket_revises_neighbors_and_means():
    """The T37 revision contract: a late bucket shifts the positional
    trend window of its 24 neighbors AND the global per-hod seasonal
    means — the new version re-emits the FULL decomposition and every
    re-emitted row reflects the shifted statistics."""
    from project_obsidian_core_spark.streaming.sequence_state import (
        make_seasonal_fn,
        seasonal_from_series,
    )

    fn = make_seasonal_fn()
    state = FakeState()
    # batch 1: hours 100..139 except 120 (one hole mid-series)
    hrs = [h for h in range(100, 140) if h != 120]
    b1 = pd.DataFrame({"bucket": hrs, "v": [100 + h for h in hrs]})
    out1 = list(fn(("m",), iter([b1]), state))[0]
    assert len(out1) == len(hrs)
    v1 = out1["version"][0]
    row_119_v1 = out1[out1["bucket"] == 119].iloc[0]
    # batch 2: the late hole arrives — positional windows shift
    b2 = pd.DataFrame({"bucket": [120], "v": [999_999]})
    out2 = list(fn(("m",), iter([b2]), state))[0]
    assert out2["version"][0] > v1
    assert len(out2) == len(hrs) + 1  # full re-emission, superset
    row_119_v2 = out2[out2["bucket"] == 119].iloc[0]
    # hour 119's 25-row window now contains the late blowout bucket
    assert row_119_v2["trend_sum25"] != row_119_v1["trend_sum25"]
    # and the emission equals the pure re-derivation of the held state
    buckets, sums, _ = state.get
    expect = seasonal_from_series(list(buckets), list(sums))
    got = list(
        zip(
            out2["bucket"],
            out2["v"],
            out2["trend_sum25"],
            out2["n_win"],
            [None if pd.isna(x) else int(x) for x in out2["detr25"]],
            out2["hod"],
            [None if pd.isna(x) else float(x) for x in out2["seasonal"]],
        )
    )
    assert [tuple(int(x) if isinstance(x, (int,)) else x for x in r) for r in expect] == [
        (int(b), int(v), int(t), int(n), d, int(h), s) for b, v, t, n, d, h, s in got
    ]


def test_seasonal_fold_empty_batch_emits_nothing():
    from project_obsidian_core_spark.streaming.sequence_state import (
        make_seasonal_fn,
    )

    fn = make_seasonal_fn()
    state = FakeState()
    out = list(fn(("m",), iter([pd.DataFrame({"bucket": [], "v": []})]), state))
    assert out == []
    assert not state.exists


def test_autoperiod_from_series_matches_reference():
    """Independent recompute of the A102 argmax over a synthetic series
    with a known period-24 component."""
    import math

    from project_obsidian_core_spark.streaming.sequence_state import (
        autoperiod_from_series,
    )

    buckets = list(range(500, 620))  # 120 hours = 5 days
    sums = [100_000 + 40_000 * (1 if (b % 24) < 12 else -1) + 77 * (b % 7)
            for b in buckets]
    row = autoperiod_from_series(buckets, sums)
    assert row is not None
    d_lag, d_acf, s_lag, s_acf, is_daily = row
    assert d_lag == 24 and is_daily is True
    assert d_acf is not None and d_acf > 0.9
    # reference recompute of the winning lag's correlation
    mn = min(sums)
    yc = {b: (y - mn) // 100 for b, y in zip(buckets, sums)}
    n = sa = sb = sab = saa = sbb = 0
    for b, ya in yc.items():
        yb = yc.get(b + 24)
        if yb is None:
            continue
        n += 1; sa += ya; sb += yb; sab += ya * yb; saa += ya * ya; sbb += yb * yb
    dx, dy = n * saa - sa * sa, n * sbb - sb * sb
    assert d_acf == float(n * sab - sa * sb) / math.sqrt(float(dx) * float(dy))


def test_autoperiod_fold_short_series_emits_nothing_then_reports():
    """No qualifying lag -> no emission; once lags exist every version
    emits (the series only grows, so the max-version drain is safe)."""
    import pandas as pd

    from project_obsidian_core_spark.streaming.sequence_state import (
        make_autoperiod_fn,
    )

    fn = make_autoperiod_fn()
    state = FakeState()
    out1 = list(fn(("m",), iter([pd.DataFrame({"bucket": [10], "v": [5]})]), state))
    assert out1 == []  # single bucket: no lag-2..36 pair
    b2 = pd.DataFrame({"bucket": list(range(11, 60)), "v": [100 * i for i in range(49)]})
    out2 = list(fn(("m",), iter([b2]), state))
    assert len(out2) == 1 and len(out2[0]) == 1
    assert out2[0]["dominant_lag"][0] is not None


def test_winsorize_from_series_matches_reference():
    """Independent nearest-rank recompute (A86 formulas)."""
    from project_obsidian_core_spark.streaming.sequence_state import (
        winsorize_from_series,
    )

    buckets = list(range(40))
    sums = [(7 * i * i - 300 * i + 5000) for i in range(40)]  # non-monotone
    n, p05, p95, n_lo, n_hi, s_raw, s_w, mean = winsorize_from_series(
        buckets, sums
    )
    order = sorted(zip(sums, buckets))
    i_lo, i_hi = (5 * 40 + 99) // 100, (95 * 40 + 99) // 100
    assert (p05, p95) == (order[i_lo - 1][0], order[i_hi - 1][0])
    assert n == 40 and s_raw == sum(sums)
    clipped = [max(p05, min(p95, v)) for v in sums]
    assert s_w == sum(clipped)
    assert n_lo == sum(1 for v in sums if v < p05)
    assert n_hi == sum(1 for v in sums if v > p95)
    assert mean == float(sum(clipped)) / 40.0
    assert winsorize_from_series([], []) is None


def test_range_rate_reset_semantics(spark):
    """Python recompute of the A104 windows for one metric, proving the
    reset branch (counter wrap) contributes `c_i` not a negative delta,
    and the window-opening sample contributes nothing."""
    from project_obsidian_core_spark.plans.metrics_queries import (
        _RATE_WIN,
        _RATE_WRAP,
        metric_range_rate,
        synthesize_metrics,
    )
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.001"
    rows = metric_range_rate(spark, SF).collect()
    assert rows
    # rebuild one metric's series driver-side
    name = rows[0]["metric_name"]
    hb = (
        synthesize_metrics(spark, SF)
        .filter(F.col("metric_name") == name)
        .groupBy(F.expr("unix_micros(time) div 3600000000").alias("bucket"))
        .agg(F.sum("metric_value").alias("v"))
        .orderBy("bucket")
        .collect()
    )
    cum = 0
    series = []
    for r in hb:
        cum += r["v"]
        series.append((r["bucket"], cum % _RATE_WRAP))
    wins = {}
    for i, (b, c) in enumerate(series):
        w = b // _RATE_WIN
        st = wins.setdefault(w, {"inc": 0, "resets": 0, "first": b, "last": b})
        st["first"], st["last"] = min(st["first"], b), max(st["last"], b)
        if i > 0 and series[i - 1][0] // _RATE_WIN == w:
            prev = series[i - 1][1]
            if c >= prev:
                st["inc"] += c - prev
            else:
                st["inc"] += c
                st["resets"] += 1
    got = {r["win"]: r for r in rows if r["metric_name"] == name}
    assert set(got) == set(wins)
    for w, st in wins.items():
        r = got[w]
        assert r["increase"] == st["inc"], (w, r, st)
        assert r["n_resets"] == st["resets"]
        span = st["last"] - st["first"]
        if span == 0:
            assert r["rate_per_hour"] is None
        else:
            assert r["rate_per_hour"] == float(st["inc"]) / float(span)


def test_hard_negatives_exclude_same_label_and_beat_rest(spark):
    """Every mined negative has a different label than its anchor, ranks
    are dense per anchor, and the top negative's similarity is >= every
    other different-label candidate's (spot-checked driver-side)."""
    from pyspark.sql import functions as F

    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.datapipe_queries import (
        _TOPK,
        knn_hard_negatives,
    )

    SF = "/root/testdata/sf0.001"
    rows = knn_hard_negatives(spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r["q_label"] != r["cand_label"]
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(x["rank"] for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= _TOPK
    # brute-force spot check for anchor 0 in pure python
    emb = {r["vec_id"]: (r["label"], r["embedding"]) for r in
           load(spark, SF, "embeddings").collect()}
    import math
    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(x) * float(x) for x in b))
        return dot / (na * nb)
    q_label, q_vec = emb[0]
    best = max(
        (cos(q_vec, v) for vid, (lb, v) in emb.items()
         if vid != 0 and lb != q_label),
    )
    import pytest as _pt
    got_top = max(r["cos_sim"] for r in by_q[0])
    assert got_top == _pt.approx(best, abs=1e-12)


def test_audio_clipping_run_length_recompute(spark):
    """Pure-python recompute of every audio doc's clipping counts and
    longest quiet run at sf0.001."""
    from project_obsidian_core_spark.datapipe import multimodal as M
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.datapipe_queries import (
        media_audio_clipping,
    )

    SF = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r for r in media_audio_clipping(spark, SF).collect()}
    media = M.attach_media(load(spark, SF, "documents")).filter(
        "media_type = 'audio'"
    )
    n_checked = 0
    for row in media.collect():
        b = bytes(row["content"])
        clipped = sum(1 for x in b if x <= M.CLIP_LO or x >= M.CLIP_HI)
        best = cur = 0
        for x in b:
            cur = cur + 1 if M.QUIET_LO <= x <= M.QUIET_HI else 0
            best = max(best, cur)
        g = got[row["doc_id"]]
        assert g["n_samples"] == len(b)
        assert g["n_clipped"] == clipped
        assert g["clip_ppm"] == clipped * 1_000_000 // len(b)
        assert g["longest_quiet_run"] == best
        n_checked += 1
    assert n_checked == len(got) and n_checked > 0


def test_curriculum_stage_monotone_and_position_permutation(spark):
    """Stages are monotone in difficulty (count-quantiles with shared
    ties), positions are an exact 1..N permutation ordered stage-major,
    and within a stage the order is the seeded hash permutation."""
    from project_obsidian_core_spark.plans.pipeline_queries import (
        _CURR_STAGES,
        corpus_curriculum,
    )

    SF = "/root/testdata/sf0.001"
    rows = corpus_curriculum(spark, SF).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r["curriculum_pos"] for r in rows) == list(range(1, n + 1))
    # stage-major: positions sorted => stages non-decreasing
    by_pos = sorted(rows, key=lambda r: r["curriculum_pos"])
    stages = [r["stage"] for r in by_pos]
    assert stages == sorted(stages)
    assert 1 <= min(stages) and max(stages) <= _CURR_STAGES
    # monotone in difficulty: every doc in stage s has difficulty <= any
    # doc in stage s+1 (ties may share a stage, never invert)
    import collections
    lo, hi = {}, {}
    for r in rows:
        lo[r["stage"]] = min(lo.get(r["stage"], 1 << 60), r["difficulty_milli"])
        hi[r["stage"]] = max(hi.get(r["stage"], -1), r["difficulty_milli"])
    ss = sorted(lo)
    for a, b in zip(ss, ss[1:]):
        assert hi[a] <= lo[b], (a, b, hi[a], lo[b])
    # equal difficulty -> equal stage (shared ties)
    stage_of = collections.defaultdict(set)
    for r in rows:
        stage_of[r["difficulty_milli"]].add(r["stage"])
    assert all(len(s) == 1 for s in stage_of.values())


def test_range_rate_from_series_matches_batch_unit():
    """The T40 re-derivation reproduces the same windows the A104 unit
    recomputes, including a forced wrap (reset) mid-window."""
    from project_obsidian_core_spark.streaming.sequence_state import (
        RANGE_RATE_WIN,
        RANGE_RATE_WRAP,
        range_rate_from_series,
    )

    buckets = list(range(600, 630))
    sums = [150_000] * 30  # cum crosses 2e6 every ~13 buckets -> resets
    rows = range_rate_from_series(buckets, sums)
    # reference: python cumsum + window fold
    cum, series = 0, []
    for b, v in zip(buckets, sums):
        cum += v
        series.append((b, cum % RANGE_RATE_WRAP))
    assert sum(r[6] for r in rows) >= 2  # resets happened
    for w, n, fb, lb, cf, cl, rs, inc, rate in rows:
        ref_inc = ref_rs = 0
        mem = [(b, c) for b, c in series if b // RANGE_RATE_WIN == w]
        assert n == len(mem) and (fb, lb) == (mem[0][0], mem[-1][0])
        assert (cf, cl) == (mem[0][1], mem[-1][1])
        for i, (b, c) in enumerate(series):
            if b // RANGE_RATE_WIN != w or i == 0:
                continue
            pb, pc = series[i - 1]
            if pb // RANGE_RATE_WIN != w:
                continue
            if c >= pc:
                ref_inc += c - pc
            else:
                ref_inc += c
                ref_rs += 1
        assert (inc, rs) == (ref_inc, ref_rs)
        assert rate == (float(inc) / float(lb - fb) if lb > fb else None)


def test_basket_pair_lift_identities(spark):
    """Support/confidence/lift identities recomputed driver-side, and
    the pair relation is symmetric-free (part_a < part_b)."""
    from project_obsidian_core_spark.plans.behavior_queries import (
        basket_pair_lift,
    )
    from project_obsidian_core_spark.plans.common import load

    SF = "/root/testdata/sf0.001"
    rows = basket_pair_lift(spark, SF).collect()
    assert rows
    lines = {
        (r["l_orderkey"], r["l_partkey"])
        for r in load(spark, SF, "lineitem").select(
            "l_orderkey", "l_partkey"
        ).distinct().collect()
    }
    baskets = {}
    for ok, pk in lines:
        baskets.setdefault(ok, set()).add(pk)
    N = len(baskets)
    from collections import Counter
    part_n = Counter(pk for _, pk in lines)
    for r in rows:
        assert r["part_a"] < r["part_b"]
        n_ab = sum(
            1 for ps in baskets.values()
            if r["part_a"] in ps and r["part_b"] in ps
        )
        assert r["n_ab"] == n_ab
        assert r["n_a"] == part_n[r["part_a"]]
        assert r["n_b"] == part_n[r["part_b"]]
        assert r["support_ppm"] == n_ab * 1_000_000 // N
        assert r["conf_a_to_b_ppm"] == n_ab * 1_000_000 // r["n_a"]
        assert r["lift_ppm"] == n_ab * N * 1_000_000 // (r["n_a"] * r["n_b"])


def test_embedding_pair_auc_matches_hand_auc(spark):
    """Recompute the AUC by brute pos-vs-neg comparison (the definition)
    and check the rank-identity path agrees exactly."""
    from project_obsidian_core_spark.datapipe import vectors as V
    from project_obsidian_core_spark.plans.datapipe_queries import (
        _AUC_SAMPLE,
        embedding_pair_auc,
    )
    from project_obsidian_core_spark.plans.common import load
    import hashlib
    import math

    SF = "/root/testdata/sf0.001"
    row = embedding_pair_auc(spark, SF).collect()[0]

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    vecs = load(spark, SF, "embeddings").collect()
    vecs.sort(key=lambda r: (h60(f"aucsample:{r['vec_id']}"), r["vec_id"]))
    sample = vecs[:_AUC_SAMPLE]
    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        return dot / (math.sqrt(sum(float(x)**2 for x in a)) * math.sqrt(sum(float(x)**2 for x in b)))
    pos, neg = [], []
    for i in range(len(sample)):
        for j in range(i + 1, len(sample)):
            a, b = sample[i], sample[j]
            if a["vec_id"] > b["vec_id"]:
                a, b = b, a
            c = cos(a["embedding"], b["embedding"])
            (pos if a["label"] == b["label"] else neg).append(c)
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    auc_ppm = (2 * wins + ties) * 1_000_000 // (2 * len(pos) * len(neg))
    assert row["auc_ppm"] == auc_ppm


def test_vocab_fertility_identities(spark):
    """Fertility identities recomputed from the gated token stats and
    lang predictions."""
    from pyspark.sql import functions as F
    from project_obsidian_core_spark.datapipe import text as T
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.curation_queries import vocab_fertility

    SF = "/root/testdata/sf0.001"
    rows = {r["lang_pred"]: r for r in vocab_fertility(spark, SF).collect()}
    docs = load(spark, SF, "documents")
    lang = {r["doc_id"]: r["lang_pred"] for r in T.with_lang_id(docs).collect()}
    cnt = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
           for r in T.with_token_stats(docs).collect()}
    agg = {}
    for d, lg in lang.items():
        ws, bpe = cnt[d]
        a = agg.setdefault(lg, [0, 0, 0])
        a[0] += 1; a[1] += ws; a[2] += bpe
    tws = sum(a[1] for a in agg.values())
    tbpe = sum(a[2] for a in agg.values())
    assert set(rows) == set(agg)
    for lg, (n, ws, bpe) in agg.items():
        r = rows[lg]
        assert (r["n_docs"], r["sum_ws"], r["sum_bpe"]) == (n, ws, bpe)
        assert r["fertility_ppm"] == bpe * 1_000_000 // ws
        assert r["rel_fertility_ppm"] == bpe * tws * 1_000_000 // (ws * tbpe)


def test_funnel_stage_latency_reference_recompute(spark):
    """Pure-python recompute of the transition latencies and nearest-rank
    quantiles at sf0.001."""
    from project_obsidian_core_spark.plans.behavior_queries import (
        _STAGES,
        funnel_stage_latency,
    )
    from project_obsidian_core_spark.plans.common import load

    SF = "/root/testdata/sf0.001"
    got = {r["transition"]: r for r in funnel_stage_latency(spark, SF).collect()}
    ev = [(r["user_id"], r["event_type"], r["ts"])
          for r in load(spark, SF, "events").collect()]

    def first_touch(stage, after):
        best = {}
        for u, et, ts in ev:
            if et != stage:
                continue
            if after is not None and (u not in after or ts < after[u]):
                continue
            if u not in best or ts < best[u]:
                best[u] = ts
        return best

    s1 = first_touch(_STAGES[0], None)
    s2 = first_touch(_STAGES[1], s1)
    s3 = first_touch(_STAGES[2], s2)
    for name, a, b in ((f"{_STAGES[0]}->{_STAGES[1]}", s1, s2),
                       (f"{_STAGES[1]}->{_STAGES[2]}", s2, s3)):
        lats = sorted(
            int((b[u] - a[u]).total_seconds()) for u in b if u in a
        )
        n = len(lats)
        r = got[name]
        assert r["n_converted"] == n
        assert r["p50_s"] == lats[(50 * n + 99) // 100 - 1]
        assert r["p90_s"] == lats[(90 * n + 99) // 100 - 1]
        assert r["mean_latency_s"] == float(sum(lats)) / float(n)


def test_mixture_temperature_invariants(spark):
    """Shares sum to exactly 1e6, the integer sqrt is exact, and the
    temperature flattens: every below-average source gains share."""
    import math

    from project_obsidian_core_spark.plans.pipeline_queries import (
        corpus_mixture_temperature,
    )

    SF = "/root/testdata/sf0.001"
    rows = corpus_mixture_temperature(spark, SF).collect()
    assert sum(r["temp_share_ppm"] for r in rows) == 1_000_000
    for r in rows:
        assert r["w"] == math.isqrt(r["n_tokens"] * 1_000_000)
        assert r["flatten_ppm"] == r["temp_share_ppm"] - r["raw_share_ppm"]
    mean_n = sum(r["n_tokens"] for r in rows) / len(rows)
    small = [r for r in rows if r["n_tokens"] < mean_n * 0.5]
    assert all(r["flatten_ppm"] > 0 for r in small)


def test_ttr_curve_decile_and_ppm_invariants(spark):
    from project_obsidian_core_spark.plans.curation_queries import text_ttr_curve

    SF = "/root/testdata/sf0.001"
    rows = sorted(text_ttr_curve(spark, SF).collect(), key=lambda r: r["decile"])
    assert rows and 1 <= rows[0]["decile"] and rows[-1]["decile"] <= 10
    # deciles partition by length: ranges must not overlap
    for a, b in zip(rows, rows[1:]):
        assert a["max_chars"] <= b["min_chars"]
    for r in rows:
        assert r["ttr_ppm"] == r["sum_distinct"] * 1_000_000 // r["sum_tokens"]


def test_conversion_paths_end_in_purchase_and_count(spark):
    from project_obsidian_core_spark.plans.behavior_queries import (
        events_conversion_paths,
    )
    from project_obsidian_core_spark.plans.common import load

    SF = "/root/testdata/sf0.001"
    rows = events_conversion_paths(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["path"].endswith("purchase")
        assert r["path_len"] == len(r["path"])
    # total path users across ALL paths == number of purchasing users
    ev = load(spark, SF, "events")
    n_purchasers = (
        ev.filter("event_type = 'purchase'").select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) <= n_purchasers


def test_centroid_probe_confusion_totals_and_exactness(spark):
    """Confusion matrix totals = corpus size; pure-python recompute of
    one vector's argmin at sf0.001."""
    import math

    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.datapipe_queries import (
        embedding_centroid_probe,
    )

    SF = "/root/testdata/sf0.001"
    rows = embedding_centroid_probe(spark, SF).collect()
    emb = load(spark, SF, "embeddings").collect()
    assert sum(r["n_vecs"] for r in rows) == len(emb)
    # python recompute: centroids + one vector's prediction
    by_label = {}
    for r in emb:
        q = [math.floor(float(v) * 1_000_000.0) for v in r["embedding"]]
        by_label.setdefault(r["label"], []).append(q)
    cent = {}
    for lb, vecs in by_label.items():
        n = len(vecs)
        cent[lb] = [int_div_trunc(sum(col), n) for col in zip(*vecs)]
    target = emb[0]
    tq = [math.floor(float(v) * 1_000_000.0) for v in target["embedding"]]
    best = min(
        (sum((a - b) ** 2 for a, b in zip(tq, c)), lb)
        for lb, c in cent.items()
    )
    # the predicted label for vec 0 must appear in its true_label row
    got = {(r["true_label"], r["pred_label"]) for r in rows}
    assert (target["label"], best[1]) in got


def int_div_trunc(a: int, b: int) -> int:
    """Spark `div` truncates toward zero (python // floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_nation_hhi_identities(spark):
    """HHI identities recomputed driver-side at sf0.001: shares from
    exact cents, truncating division, sum of squares, band edges."""
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.relational_queries import (
        nation_supplier_hhi,
    )

    SF = "/root/testdata/sf0.001"
    rows = {r["nation"]: r for r in nation_supplier_hhi(spark, SF).collect()}
    assert rows
    li = load(spark, SF, "lineitem").select("l_suppkey", "l_extendedprice").collect()
    supp = {r["s_suppkey"]: r["s_nationkey"]
            for r in load(spark, SF, "supplier").collect()}
    nat = {r["n_nationkey"]: r["n_name"]
           for r in load(spark, SF, "nation").collect()}
    rev = {}
    for r in li:
        nk = supp.get(r["l_suppkey"])
        if nk is None:
            continue
        key = (nat[nk], r["l_suppkey"])
        rev[key] = rev.get(key, 0) + round(r["l_extendedprice"] * 100)
    by_nation = {}
    for (n, s), v in rev.items():
        by_nation.setdefault(n, {})[s] = v
    for n, supps in by_nation.items():
        tot = sum(supps.values())
        hhi = sum(((v * 1000) // tot) ** 2 for v in supps.values())
        r = rows[n]
        assert r["n_suppliers"] == len(supps)
        assert r["revenue_cents"] == tot
        assert r["hhi"] == hhi
        band = ("unconcentrated" if hhi < 150_000
                else "moderate" if hhi <= 250_000 else "high")
        assert r["band"] == band
