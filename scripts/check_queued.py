"""Oracle-gate the ROUND-QUEUED (implemented, not yet registered)
operators — the same compare as scripts/oracle_check.py, against an
explicit (fn, oracle) list instead of the registry.

Operators land here when the driver's 50-slot gate window is full for
the current round (registration would displace the stale-row refresh).
Round 12 DRAINED the queue: all 27 r10/r11-queued operators were
registered at once (Block R12, plans/registry.py) per the r11 verdict's
Next #1 — the rotation's unrecorded-first rule gives each an official
green row immediately.  The queue is now EMPTY; new operators should be
registered directly while the unrecorded count stays under the 50-slot
window, and only staged here when it would overflow.

Usage: python scripts/check_queued.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import duckdb  # noqa: E402

from oracle_check import TABLES, approx_equal, sorted_rows  # noqa: E402


def queued():
    """name -> (query_fn, oracle_sql) for every implemented-but-unregistered
    operator (kept in lockstep with the 'Registration note' docstrings).

    Round 13 re-seeds it: the r13 gate window closed exactly full
    (6 new registrations + the 44-row r07-stale refresh), so every
    operator built after the close stages here and the r14 registry
    block registers the batch (the rotation's unrecorded-first rule
    gives each an official green row immediately).
    """
    from project_obsidian_core_spark.plans import analytics_ext_queries as x
    from project_obsidian_core_spark.plans import behavior_queries as b
    from project_obsidian_core_spark.plans import curation_queries as c
    from project_obsidian_core_spark.plans import datapipe_queries as d
    from project_obsidian_core_spark.plans import metrics_queries as m
    from project_obsidian_core_spark.plans import pipeline_queries as pl
    from project_obsidian_core_spark.plans import relational_queries as r
    from project_obsidian_core_spark.plans import streaming_queries as st

    return {
        # A84: additive trend/seasonal decomposition (exact-int detrend,
        # one-IEEE-division seasonal means)
        "metric_seasonal_decompose": (
            m.metric_seasonal_decompose,
            m.ORACLE_metric_seasonal_decompose,
        ),
        # A85: cohort LTV curve (first-order-month cohorts, cumulative
        # cents, per-member integer LTV)
        "customer_cohort_ltv": (
            r.customer_cohort_ltv,
            r.ORACLE_customer_cohort_ltv,
        ),
        # A86: winsorized robust stats (exact nearest-rank p05/p95 clip,
        # one-IEEE-division mean)
        "metric_winsorize": (
            m.metric_winsorize,
            m.ORACLE_metric_winsorize,
        ),
        # P15: Hamilton largest-remainder quota apportionment (exact
        # integer quotas summing to the budget)
        "corpus_quota_apportion": (
            pl.corpus_quota_apportion,
            pl.ORACLE_corpus_quota_apportion,
        ),
        # A87: KMV distinct-count sketch (portable md5-60 hash, one IEEE
        # division of exactly-representable ints)
        "events_kmv_distinct": (
            x.events_kmv_distinct,
            x.ORACLE_events_kmv_distinct,
        ),
        # A88: count-min sketch heavy hitters (fixed d·w memory,
        # deterministic portable buckets, one-sided overcount audited)
        "events_cms_heavy": (
            x.events_cms_heavy,
            x.ORACLE_events_cms_heavy,
        ),
        # A89: CUPED variance-reduced A/B means (exact-int moments, one
        # fixed IEEE expression tree)
        "events_cuped": (
            x.events_cuped,
            x.ORACLE_events_cuped,
        ),
        # N19: int8 scalar quantization audit (exact-int code sums,
        # per-element ppm error quantization before summation)
        "embedding_sq8": (
            d.embedding_sq8,
            d.ORACLE_embedding_sq8,
        ),
        # M13: difference hash + band report (gradient sibling of M11,
        # pure integer comparisons)
        "media_dhash": (
            d.media_dhash,
            d.ORACLE_media_dhash,
        ),
        # A90: SAX-style symbolic motifs (equi-depth positional symbols,
        # exact 3-gram counts)
        "metric_sax_motifs": (
            m.metric_sax_motifs,
            m.ORACLE_metric_sax_motifs,
        ),
        # A91: decile gains/lift table (positional deciles, integer-ppm
        # capture and lift)
        "customer_decile_lift": (
            r.customer_decile_lift,
            r.ORACLE_customer_decile_lift,
        ),
        # X28: RAKE keyword extraction (integer-ppm word scores, exact
        # phrase-score sums)
        "text_rake_keywords": (
            d.text_rake_keywords,
            d.ORACLE_text_rake_keywords,
        ),
        # T25: streaming CMS twin — gated on the A88 batch oracle
        # verbatim (mergeability proof)
        "stream_cms_heavy": (
            st.stream_cms_heavy,
            x.ORACLE_events_cms_heavy,
        ),
        # N20: Matryoshka prefix-dim recall audit (the N13 shape over a
        # slice projection)
        "knn_prefix_recall": (
            d.knn_prefix_recall,
            d.ORACLE_knn_prefix_recall,
        ),
        # A92: ABC class migration matrix (A76 value rule per period,
        # exact-int cross-multiplies)
        "customer_abc_migration": (
            b.customer_abc_migration,
            b.ORACLE_customer_abc_migration,
        ),
        # P16: token-budget epoch plan (integer targets/epochs/caps on
        # the reduced source relation)
        "corpus_epoch_plan": (
            pl.corpus_epoch_plan,
            pl.ORACLE_corpus_epoch_plan,
        ),
        # A93: open-order aging buckets (integer day arithmetic, cents)
        "orders_aging_buckets": (
            r.orders_aging_buckets,
            r.ORACLE_orders_aging_buckets,
        ),
        # N21: per-label centroid drift (micro-unit exact-int centroids)
        "embedding_centroid_drift": (
            d.embedding_centroid_drift,
            d.ORACLE_embedding_centroid_drift,
        ),
        # A94: Holt forecast backtest (A53 fold verbatim on the train
        # prefix, per-point cent-quantized holdout errors)
        "metric_forecast_backtest": (
            m.metric_forecast_backtest,
            m.ORACLE_metric_forecast_backtest,
        ),
        # V3: vocabulary coverage curve (exact cumulative token shares
        # at checkpoint ranks)
        "vocab_coverage_curve": (
            c.vocab_coverage_curve,
            c.ORACLE_vocab_coverage_curve,
        ),
        # T34: streaming KMV twin — gated on the A87 batch oracle
        # verbatim (k-minima mergeability proof)
        "stream_kmv_distinct": (
            st.stream_kmv_distinct,
            x.ORACLE_events_kmv_distinct,
        ),
        # A95: Laspeyres/Paasche/Fisher price index (scaled-int terms,
        # correctly-rounded IEEE sqrt for Fisher)
        "part_price_index": (
            x.part_price_index,
            x.ORACLE_part_price_index,
        ),
        # A96: U-shaped multi-touch attribution (integer 40/40/20 with
        # deterministic remainder; revenue-conserving)
        "events_attribution_ushape": (
            b.events_attribution_ushape,
            b.ORACLE_events_attribution_ushape,
        ),
        # A97: nation trade-profile cosine similarity (scaled-int cells,
        # exact dots, correctly-rounded sqrt)
        "nation_trade_similarity": (
            r.nation_trade_similarity,
            r.ORACLE_nation_trade_similarity,
        ),
        # T35: streaming last-touch attribution — gated on the A28 batch
        # oracle verbatim (3-scalar state per user)
        "stream_attribution": (
            st.stream_attribution,
            b.ORACLE_events_attribution,
        ),
        # A98: Syntetos-Boylan demand quadrant (exact cross-multiplied
        # ADI/CV2 classification)
        "part_demand_classes": (
            x.part_demand_classes,
            x.ORACLE_part_demand_classes,
        ),
        # D26: cross-source near-dup matrix (production minhash pairs,
        # per-pair ppm quantization before aggregation)
        "dedup_source_matrix": (
            d.dedup_source_matrix,
            d.ORACLE_dedup_source_matrix,
        ),
        # A99: KMV set algebra (union/Jaccard/intersection from merged
        # k-minima, audited vs exact)
        "events_kmv_setops": (
            x.events_kmv_setops,
            x.ORACLE_events_kmv_setops,
        ),
        # A100: Western-Electric SPC rules 1+4 (exact cross-multiplied
        # 3-sigma and 9-run tests, dollar-scaled)
        "metric_spc_rules": (
            m.metric_spc_rules,
            m.ORACLE_metric_spc_rules,
        ),
        # P17: exact-count stratified sample (P15 quotas x P13 hash-order
        # selection; exactly `budget` rows)
        "corpus_stratified_exact": (
            pl.corpus_stratified_exact,
            pl.ORACLE_corpus_stratified_exact,
        ),
        # T36: streaming SPC rules — gated on the A100 batch oracle
        # verbatim (global-statistic re-derivation per emit)
        "stream_spc_rules": (
            st.stream_spc_rules,
            m.ORACLE_metric_spc_rules,
        ),
        # A101: Markov stationary distribution (unrolled scaled-integer
        # power iteration, the N17 move on the behavior chain)
        "events_markov_stationary": (
            x.events_markov_stationary,
            x.ORACLE_events_markov_stationary,
        ),
        # X29: word burstiness / Fano factors (zeros via N, exact-int
        # variance ratio)
        "text_word_burstiness": (
            d.text_word_burstiness,
            d.ORACLE_text_word_burstiness,
        ),
        # A102: ACF-argmax dominant period (the input A84 assumes)
        "metric_autoperiod": (
            m.metric_autoperiod,
            m.ORACLE_metric_autoperiod,
        ),
        # Q19: HDR-style log2 latency histogram (bit-trick floor-log2,
        # no float log)
        "qan_latency_log2_histogram": (
            x.qan_latency_log2_histogram,
            x.ORACLE_qan_latency_log2_histogram,
        ),
        # A103: win-back cohorts by dormancy length (A85 month ints,
        # one lag window)
        "customer_winback": (
            r.customer_winback,
            r.ORACLE_customer_winback,
        ),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from project_obsidian_core_spark.session import build_session

    spark = build_session(app_name="queued-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    only = set(sys.argv[2:])
    failures = []
    for name, (fn, sql) in queued().items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0
        rel = con.sql(sql)
        d_cols = rel.columns
        d_rows = rel.fetchall()
        status = []
        odd = [
            f"{c}:{t}"
            for c, t in zip(d_cols, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")
        ]
        if odd:
            status.append(f"ORACLE-TYPE {odd}")
        if len(s_rows) != len(d_rows):
            status.append(f"ROWCOUNT {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            status.append(f"COLUMNS {sorted(s_cols)} vs {sorted(d_cols)}")
        if not status:
            a, b = sorted_rows(s_cols, s_rows), sorted_rows(d_cols, d_rows)
            if a == b:
                status.append("EXACT")
            elif approx_equal(a, b):
                status.append("APPROX(float-jitter!)")
            else:
                status.append("VALUE-MISMATCH")
                for i, (ra, rb) in enumerate(zip(a, b)):
                    if ra != rb:
                        status.append(f"first diff row {i}: spark={ra} duck={rb}")
                        break
        ok = status[0] == "EXACT"
        print(
            f"  {name:28s} rows={len(s_rows):7d} {'OK ' if ok else 'FAIL'} "
            f"{status[0]} spark={spark_s:.1f}s"
        )
        if not ok:
            failures.append((name, "; ".join(status)))
    if failures:
        print("\nFAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print("\nALL QUEUED QUERIES MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
