"""Units for the ROUND-12-QUEUED operators (implemented + oracle-twinned
in round 11; registration deferred — the r11 gate window was committed to
5 promotions + 45 stale refreshes, see Block R11 in plans/registry.py and
scripts/check_queued.py, which gate-checks these against their DuckDB
oracles outside the registry)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# --------------------------------------------------- A73: customer RFM --
def test_customer_rfm_matches_python(spark):
    """Independent recompute of the value-quartile thresholds (ceil(k·n/4)
    order statistics) and every customer's scores."""
    from project_obsidian_core_spark.plans.behavior_queries import customer_rfm
    from project_obsidian_core_spark.plans.common import load

    rows = load(spark, SF, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias("pc"),
    ).collect()
    anchor = max(r["od"] for r in rows)
    pc: dict[int, list] = {}
    for r in rows:
        cur = pc.setdefault(r["o_custkey"], [None, 0, 0])
        cur[0] = r["od"] if cur[0] is None or r["od"] > cur[0] else cur[0]
        cur[1] += 1
        cur[2] += r["pc"]
    feats = {
        c: ((anchor - last).days, f, m) for c, (last, f, m) in pc.items()
    }

    def thresholds(vals):
        n = len(vals)
        sv = sorted(vals)
        return [sv[(k * n + 3) // 4 - 1] for k in (1, 2, 3)]

    tr = thresholds([v[0] for v in feats.values()])
    tf = thresholds([v[1] for v in feats.values()])
    tm = thresholds([v[2] for v in feats.values()])
    score = lambda v, t: 1 + sum(v > x for x in t)  # noqa: E731

    got = {r["c_custkey"]: r for r in customer_rfm(spark, SF).collect()}
    assert set(got) == set(feats)
    for c, (rd, fq, mc) in feats.items():
        row = got[c]
        assert (row["recency_days"], row["frequency"], row["monetary_cents"]) == (
            rd,
            fq,
            mc,
        )
        r_q, f_q, m_q = score(rd, tr), score(fq, tf), score(mc, tm)
        assert (row["r_q"], row["f_q"], row["m_q"]) == (r_q, f_q, m_q)
        assert row["rfm_code"] == (5 - r_q) * 100 + f_q * 10 + m_q
    # quartile populations: value ties can only OVERFILL a bucket, never
    # create an empty one on this data (sanity of the boundary arithmetic)
    for col in ("r_q", "f_q", "m_q"):
        seen = Counter(r[col] for r in got.values())
        assert set(seen) <= {1, 2, 3, 4} and seen[1] > 0 and seen[4] > 0


# -------------------------------------------- R28: part supplier census --
def test_part_supplier_counts_matches_python(spark):
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.relational_queries import (
        part_supplier_counts,
    )

    deny = {
        r["s_suppkey"]
        for r in load(spark, SF, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .collect()
    }
    part = {
        r["p_partkey"]: (r["p_brand"], r["p_type"], r["p_size"])
        for r in load(spark, SF, "part").collect()
        if r["p_brand"] != "Brand#13"
        and not r["p_type"].startswith("MEDIUM")
        and r["p_size"] in (1, 4, 9, 14, 19, 23, 36, 45)
    }
    pairs = {
        (r["l_partkey"], r["l_suppkey"])
        for r in load(spark, SF, "lineitem")
        .select("l_partkey", "l_suppkey")
        .collect()
        if r["l_suppkey"] not in deny
    }
    ref: dict[tuple, set] = {}
    for pk, sk in pairs:
        if pk in part:
            ref.setdefault(part[pk], set()).add(sk)
    got = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in part_supplier_counts(spark, SF).collect()
    }
    assert got == {k: len(v) for k, v in ref.items()}
    assert len(got) > 0


# ------------------------------------------ R29: Q13 order histogram --
def test_customer_order_histogram_includes_zero_bucket(spark):
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.relational_queries import (
        customer_order_histogram,
    )

    custs = {r["c_custkey"] for r in load(spark, SF, "customer").collect()}
    per = Counter()
    for r in load(spark, SF, "orders").collect():
        if r["o_orderpriority"] != "1-URGENT" and r["o_custkey"] in custs:
            per[r["o_custkey"]] += 1
    hist = Counter(per.values())
    hist[0] = len(custs) - len(per)
    got = {
        r["c_count"]: r["custdist"]
        for r in customer_order_histogram(spark, SF).collect()
    }
    assert got == {k: v for k, v in hist.items() if v > 0}
    # the Q13 signature: zero-order customers are IN the histogram when
    # any exist (the filtered-join-predicate decorrelation)
    if hist[0] > 0:
        assert got.get(0) == hist[0]
    assert sum(got.values()) == len(custs)


# ------------------------------------- A74: hour-of-day seasonality --
def test_metric_seasonal_hod_matches_python(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_seasonal_hod,
        synthesize_metrics,
    )

    rows = synthesize_metrics(spark, SF).select(
        "metric_name", F.hour("time").alias("hod"), "metric_value"
    ).collect()
    per: dict[tuple, list] = {}
    tot: dict[str, list] = {}
    for r in rows:
        a = per.setdefault((r["metric_name"], r["hod"]), [0, 0])
        a[0] += 1
        a[1] += r["metric_value"]
        b = tot.setdefault(r["metric_name"], [0, 0])
        b[0] += 1
        b[1] += r["metric_value"]
    got = {
        (r["metric_name"], r["hod"]): r
        for r in metric_seasonal_hod(spark, SF).collect()
    }
    assert set(got) == set(per)
    for k, (n, s) in per.items():
        row = got[k]
        nt, st = tot[k[0]]
        assert (row["n"], row["sum_cents"]) == (n, s)
        assert row["mean_cents"] == s / n
        assert row["seasonal_index"] == (s * nt) / (n * st)
    # seasonal indexes are a weighted mean-1 decomposition per series:
    # sum over slots of n_h·index_h == n_tot exactly in the int algebra
    for m, (nt, st) in tot.items():
        num = sum(
            per[(m2, h)][1] * nt
            for (m2, h) in per
            if m2 == m
        )
        assert num == st * nt  # Σ sum_h·n_tot == sum_tot·n_tot


# ------------------------------------------ X24: gram novelty --------
def test_text_gram_novelty_matches_python(spark):
    from project_obsidian_core_spark.plans.common import load
    from project_obsidian_core_spark.plans.curation_queries import (
        text_gram_novelty,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF, "documents").collect()
    }
    grams: dict[int, set] = {}
    for d, text in docs.items():
        toks = text.split(" ")
        grams[d] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    first: dict[str, int] = {}
    for d in sorted(grams):
        for g in grams[d]:
            if g not in first or d < first[g]:
                first[g] = min(first.get(g, d), d)
    got = {r["doc_id"]: r for r in text_gram_novelty(spark, SF).collect()}
    assert set(got) == set(docs)
    for d, gs in grams.items():
        row = got[d]
        n_novel = sum(1 for g in gs if first[g] == d)
        assert row["n_grams"] == len(gs)
        assert row["n_novel"] == n_novel
        if gs:
            assert row["novelty"] == n_novel / len(gs)
        else:
            assert row["novelty"] is None
    # the first document in id order is all-novel by definition
    d0 = min(d for d, gs in grams.items() if gs)
    assert got[d0]["novelty"] == 1.0


# -------------------------------- T26: streaming Bollinger breakouts --
def test_bollinger_from_series_matches_bruteforce():
    """The rolling S/Q scan must equal the literal window recomputation,
    for several shapes including all-ties and a planted blowout."""
    from project_obsidian_core_spark.streaming.sequence_state import (
        bollinger_from_series,
    )

    cases = [
        ([100] * 30, 5, 2),
        (list(range(40)), 7, 3),
        ([10, 11, 9, 10, 11, 9, 10, 500, 10, 11, 9, 10], 4, 3),
        ([5], 3, 2),
        ([], 3, 2),
    ]
    for ys, w, k in cases:
        buckets = [1000 + i for i in range(len(ys))]
        ref = []
        for i in range(len(ys)):
            win = ys[max(0, i - w) : i]
            if len(win) != w:
                continue
            n, s, q = len(win), sum(win), sum(v * v for v in win)
            dev = ys[i] * n - s
            var = n * q - s * s
            if dev * dev > k * k * var:
                ref.append((buckets[i], ys[i], dev, var, dev > 0))
        assert bollinger_from_series(buckets, ys, w, k) == ref, (ys, w, k)


def test_bollinger_fn_retracts_via_sentinel():
    """A late EARLY bucket that re-bases the window must retract the
    earlier breakout: the later version emits the NULL-hour sentinel so
    the max-version drain supersedes the stale breakout rows."""
    import pandas as pd

    from project_obsidian_core_spark.streaming.sequence_state import (
        make_bollinger_fn,
    )

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

    fn = make_bollinger_fn()
    state = FakeState()
    # batch 1: 24 flat hours then one blowout -> breakout at hour 124
    b1 = pd.DataFrame(
        {
            "bucket": list(range(100, 125)),
            "v": [10] * 24 + [10_000],
        }
    )
    out1 = list(fn(("m",), iter([b1]), state))
    assert len(out1) == 1 and list(out1[0]["hour"]) == [124]
    # batch 2: late deliveries INTO the blowout's own trailing window
    # (every odd bucket in 100..123 gains +9990, folding to 10_000) ->
    # window variance explodes, dev² no longer clears k²·var, breakout gone
    b2 = pd.DataFrame(
        {
            "bucket": list(range(101, 124, 2)),
            "v": [9_990] * 12,
        }
    )
    out2 = list(fn(("m",), iter([b2]), state))
    assert len(out2) == 1
    assert out2[0]["hour"].isna().all()  # the retraction sentinel
    assert int(out2[0]["version"].iloc[0]) > int(out1[0]["version"].iloc[0])


def test_stream_bollinger_drained_equals_batch(spark):
    """Drained max-version, non-sentinel rows must equal the batch A72
    operator exactly — the streaming↔batch equivalence the r12 driver
    gate will re-prove against the DuckDB oracle."""
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_bollinger,
    )
    from project_obsidian_core_spark.plans.streaming_queries import (
        stream_bollinger,
    )

    got = [tuple(r) for r in stream_bollinger(spark, SF).collect()]
    ref = [tuple(r) for r in metric_bollinger(spark, SF).collect()]
    assert got == ref
