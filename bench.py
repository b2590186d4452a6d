"""Benchmark harness (driver contract).

Runs the headline queries from BASELINE.md ("Benchmark target") at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line.

Each query is materialized through the noop sink — full computation, no
driver-side collect cost — after a warmup query that absorbs session/JIT
startup.  Since r15 the run is BUDGET-BOUNDED (see main()'s docstring):
the 14-query round-1 contract subset runs FIRST at median-of-6 warm
repeats (SPARK_GRAFT_BENCH_REPEAT − 1; per-query MIN recorded
alongside) and prints its JSON line immediately; the tail runs cold +
1-2 warm inside $SPARK_GRAFT_BENCH_BUDGET_S with per-query cost
estimates from the previous round's BENCH_LOCAL.json deciding skips
and slack-funded extra runs.  Cold (first run: codegen, footer reads,
index builds) and warm are reported SEPARATELY — `queries`/`value` are
the warm path, `queries_cold`/`value_cold` the cold one.

Round-6 variance hardening (the r4→r5 uniform 1.48× could not be
attributed to host vs plan): the JSON now carries `queries_spread`
(per-query [min, max] across warm repeats, file JSON only), a `host`
fingerprint (cpu model, logical cpus, 1-min loadavg at start), and
`r1_ratio` — the warm total over the queries BENCH_r01.json also timed,
divided by the r01 recording, computed by the harness itself so a real
regression can't hide behind "the host was slow".
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from project_obsidian_core_spark.plans.registry import QUERIES  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402

#: the per-round benchmark suite (BASELINE.md "Queries to time")
BENCH_QUERIES = [
    "qan_top_digests",        # top-N group-by-sum (O1/A3)
    "qan_multi_metric_topn",  # window-rank + UNION ALL (W1/U1)
    "qan_trend_5m",           # time-bucketed trend (A6)
    "qan_rollup_minute",      # rollup materialization (A1)
    "qan_snapshot_delta",     # stateful snapshot-delta pass (J1/T2-T5)
    "pricing_summary",        # scan+agg workhorse
    "top_revenue_orders",     # selective 3-way join
    "regional_revenue",       # star join
    # training-data pipeline operators (SURVEY §7.2 phase 5)
    "text_quality",           # per-row text feature extraction
    "text_fingerprint",       # k-gram min-hash fingerprint
    "dedup_minhash_lsh",      # signature + band join + verify
    "dedup_clusters",         # iterative min-label connected components
    "knn_brute",              # broadcast cosine top-k
    "knn_lsh",                # multi-probe bucketed ANN
    "media_features",         # Arrow-batched mapInPandas decode
    "text_tfidf_topk",        # explode + broadcast idf join + per-doc top-k
    "stream_snapshot_delta",  # applyInPandasWithState availableNow replay
    "metric_series",          # windowed AVG series (A9)
    # round-2 additions
    "global_status_pivot",    # S5 KV→typed pivot scrape
    "otlp_metrics_parse",     # S11 OTLP/JSON receiver (from_json + explodes)
    "corpus_split",           # salted-hash split assignment
    "sessionize_events",      # gap sessions (lag window + agg)
    "corpus_pack",            # prefix-sum sequence packing
    "qan_latency_quantiles",  # exact per-digest percentiles (sort-heavy agg)
    "qan_new_digests",        # distinct-key anti join
    "prepare_training_set",   # composed corpus-prep pipeline (one plan)
    # corpus curation (round-2 batch 2)
    "corpus_decontaminate",   # broadcast benchmark n-gram set + per-row intersect
    "text_repetition_stats",  # per-row O(d·g) n-gram occurrence counting
    "pii_scan_redact",        # chained regexp scan/replace
    "vocab_build",            # explode + term-dim agg + windowless rank join
    "embedding_kmeans",       # 3 broadcast-argmin passes + 2 centroid shuffles
    "corpus_tile_dedup",      # explode + hash-window first-occurrence + reassembly
    "events_asof_join",       # union + carry-forward window (vs DuckDB native ASOF)
    "events_range_join",      # binned equi-join, constant fan-out
    "stream_range_join",      # watermarked stream-stream interval join replay
    "qan_anomaly_zscore",     # trailing-window exact-int z-score flags
    "media_resize",           # Arrow-batched nearest-neighbor pixel gather
    "text_surprisal",         # explode + broadcast count join + int sums
    "curation_report",        # all curation signals composed in one plan
    "prepare_training_set_v2",  # full curation chain -> packed contexts
    "bpe_merges",             # iterative top-pair merges on the word table
    # round-3 additions
    "events_funnel",          # ordered-stage conversion (chained equi-joins)
    "events_retention",       # cohort-day retention matrix
    "corpus_quality_filter",  # C4/Gopher composite gate, pure codegen
    "corpus_language_mixture",  # per-source mixture with exact ppm shares
    "customer_cumulative_spend",  # partitioned running total window
    "knn_graph_degree",       # symmetrized kNN graph degree histogram
    "dedup_clusters_ls",      # large-star/small-star connected components
    "corpus_pack_greedy",     # first-fit packing (applyInPandas fold)
    "knn_ivf_kmeans",         # IVF over the learned k-means quantizer
    "events_props_stats",     # JSON property extraction + histogram
    "stream_session_stats",   # streaming session_window replay
    # round-5 additions
    "promo_revenue",          # broadcast-dim conditional-share join (Q14)
    "large_order_customers",  # HAVING-subquery semi-join (Q18)
    "dormant_customers",      # scalar-subquery + anti join (Q22)
    "brand_type_revenue",     # OR-of-ANDs disjunctive pushdown (Q19)
    "orders_cdc_merge",       # MERGE upsert (anti join + union)
    "orders_scd2",            # lead-window SCD2 validity intervals
    "customer_trailing_revenue",  # value-RANGE window frame
    "knn_pq_adc",             # PQ codebooks + ADC top-k
    "dedup_containment_pairs",  # directed n-gram containment
    "stream_enrich_events",   # stream-static broadcast enrichment
    "events_sliding_active_users",  # overlapping-window exact distinct
    "metric_time_weighted_avg",  # interval-weighted avg_over_time
    "returned_item_customers",  # Q10: aggregate-then-attach top-N
    "customer_order_distribution",  # Q13: double aggregation
    "orders_asof_snapshot",   # SCD2 point-in-time read
    # round-6 additions
    "knn_lsh_scaled",         # parameterized LSH at bits=8 (256 buckets)
    "forecast_revenue",       # Q6: pure pushed-down filter + 1-row agg
    "nation_year_profit",     # Q9: 3 broadcast dims around the fact join
    "major_suppliers",        # Q11: share-of-total HAVING (broadcast scalar)
    "late_priority_lines",    # Q12: CASE-conditional counts after date math
    "part_supplier_variety",  # Q16: broadcast NOT-IN anti + 3-key distinct
    "sole_late_suppliers",    # Q21: decorrelated EXISTS/NOT-EXISTS
    # (stream_cdc_merge stays out: its checkpointed replay harness costs
    # ~12 s/run at sf0.1 — harness overhead, not plan cost; the
    # correctness gate covers it)
    "events_sliding_active_users_salted",  # salted two-level distinct
    "orders_snapshot_diff",   # CDC feed generation (inverse MERGE)
    "metric_gap_fill",        # carry-forward grid interpolation
    "metric_time_weighted_avg_presplit",  # hot-series-safe TWA twin
    "corpus_schema_evolution",  # mergeSchema generations + default backfill
    "dedup_embedding_lsh",    # label-free LSH-bucketed embedding near-dup
    # round-7: the rest of the registry (r6 verdict next-#8 — time the
    # full surface, not a subset). Grouped by family:
    "metric_gap_fill_presplit",  # per-(series, period) gap-fill twin
    "corpus_chunk",           # overlapping char chunking (narrow, no shuffle)
    "corpus_oov_rate",        # broadcast-vocab OOV coverage report
    "orders_zorder_stats",    # z-curve cell stats (narrow interleave expr)
    "orders_dq_report",       # one-pass declarative data-quality gate
    "qan_rollup_cascade",     # hour-from-minute rollup (lossless cascade)
    "knn_ivf_incremental",    # frozen-quantizer batch append (no retrain)
    "dedup_ngram_pairs_hashed",  # int64-hashed gram sets (4x the string path)
    "stream_chunk",           # stateless streaming chunking twin
    # QAN analytics surface
    "qan_compare_systems",
    "qan_hit_ratio_pivot",
    "qan_distinct_metrics",
    "qan_like_having",
    "qan_load_score",
    "qan_labels_json",
    "qan_query_profile",
    "qan_unique_queries_approx",
    "qan_moving_avg",
    "qan_grouping_sets",
    "qan_value_histogram",
    "qan_top_digests_salted",
    "qan_percent_rank",
    "qan_rollup_merge",
    "qan_top_movers",
    "corpus_length_ntile",
    "buffer_hit_ratio",
    # ingest formats
    "jsonl_ingest",
    "csv_ingest",
    "pysource_scan",
    # relational remainder
    "customer_order_stats",
    "cte_order_summary",
    "small_quantity_revenue",
    "top_supplier_revenue",
    "nation_trade_volume",
    "nation_market_share",
    "late_shipment_orders",
    # text/dedup remainder
    "text_token_stats",
    "text_lang_id",
    "dedup_exact",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_pairs",
    "dedup_embedding_cosine",
    "dedup_canonical",
    "dedup_incremental",
    # similarity/graph remainder
    "knn_ivf",
    "knn_pagerank",
    # corpus management remainder
    "bpe_encode_stats",
    "corpus_mixture_plan",
    "corpus_sample",
    "corpus_stratified_sample",
    "corpus_weighted_sample",
    "session_window_stats",
    "sessionize_presplit_events",
    # behavior remainder
    "events_user_paths",
    "events_asof_join_presplit",
    # media remainder
    "media_frame_sample",
    "media_resample_audio",
    # streaming twins (availableNow replay harnesses — wall time is
    # harness+plan; still timed so regressions surface)
    "stream_rollup_minute",
    "stream_top_digests",
    "stream_dedup_events",
    "stream_quality_filter",
    "stream_sliding_active_users",
    # round-8 additions
    "events_interval_peak",   # sweep-line interval concurrency
    "qan_anomaly_mad",        # robust median/MAD anomaly flags
    "corpus_inverted_index",  # capped posting-list index build
    "customer_entity_match",  # blocked edit-distance entity resolution
    "corpus_decontaminate_embedding",  # embedding-cosine decon screen
    "part_pareto_frontier",   # join-free 2-D skyline (two RANGE windows)
    "orders_bucketed_join",   # exchange-free bucketed fact-fact join (B1)
    "metric_ohlc",            # OHLC candles, one-exchange resample
    "stream_ohlc",            # streaming twin (struct-min/max open/close)
    "events_heavy_hitters",   # two-pass exact heavy hitters (sketch-pruned)
    "knn_triangles",          # degree-ordered triangle enumeration
    "orders_profile",         # Expand-free exact column profiling
    "events_attribution",     # last-touch attribution (one-window carry)
    "events_interval_merge",  # interval coalescing into islands
    "orders_checksum",        # order-independent snapshot fingerprint
    "lineitem_weighted_median",  # exact weighted median (prefix weights)
    "events_chisq",           # contingency + chi-square independence
    "orders_mor_merge",       # merge-on-read CDC fold (2 delta batches)
    "orders_drift_psi",       # PSI distribution-drift report
    "events_skew_report",     # join-key skew histogram (log2 buckets)
    "metric_seasonal_outliers",  # hour-profile residual anomalies
    "orc_ingest",             # ORC columnar round-trip fidelity
    "knn_recall_report",      # ANN recall@k audit vs exact truth
    "dedup_recall_report",    # LSH recall audit vs all-pairs Jaccard
    "qan_burn_rate",          # multi-window SLO burn-rate alert
    "qan_top_digests_other",  # top-N + other 100%-accounting rollup
    "dedup_prefix_pairs",     # prefix-filter exact-complete Jaccard join
    "events_ks_test",         # exact KS two-sample drift statistic
    "orders_bloom_join",      # explicit bloom runtime-filter join
    "metric_trend_slope",     # exact per-series OLS trend slope
    "knn_rp_recall",          # JL projection recall audit vs full space
    "metric_corr_matrix",     # exact metric-pair Pearson correlation
    "knn_communities",        # deterministic label-propagation (3 rounds)
    "events_k_anonymity",     # QI-sparsity privacy risk report
    "stream_ks_test",         # streaming KS twin (drained state)
    "stream_discovery_timeline",  # T17 drained discovery state (r9)
    "stream_islands",         # T13 drained island state (r9)
    "stream_topk_exact",      # T14 exact-capacity Space-Saving gate (r9)
    "metric_rolling_median",  # A39 exact trailing-median smoother (r9)
    "metric_cusum",           # A43 CUSUM drift statistic (r9)
    "events_markov_transitions",  # A40 transition matrix (r9)
    "events_sequence_funnel",  # A44 anchored-window funnel (r9)
    "metric_lttb",            # A45 LTTB plot downsample (r9)
    "qan_apdex",              # A46 Apdex score (r9)
    "customer_gini",          # A47 Gini concentration (r9)
    "customer_rfm_scores",    # A41 RFM quintiles (r9)
    "lineitem_abc_class",     # A42 ABC revenue classes (r9)
    "orders_benford",         # Q17 Benford digit screen (r9)
    "corpus_bigram_pmi",      # X20 collocation lift (r9)
    "corpus_dup_spans",       # D18 repeated-span windows (r9)
    "corpus_dup_span_coverage",  # D19 per-doc dup coverage, hashed (r9)
    "corpus_dsir_weights",    # Q18 DSIR importance lift-ppm (r9)
    "corpus_priority_sample",  # C24 fixed-k priority sampling (r9)
    "metric_acf",             # A48 lag-grid autocorrelation (r9)
    "stream_quantiles_exact",  # T18 deterministic-KLL quantile gate (r9)
    "corpus_excise_spans",    # D20 substring-dedup rewrite (r9)
    "orders_cube",            # A49 CUBE + grouping_id (r9)
    "corpus_decontaminate_spans",  # D21 span-level benchmark decon (r9)
    "stream_priority_sample",  # T19 streaming k-sample vs batch oracle (r9)
    "knn_clustering_coeff",   # G6 per-node clustering coefficient (r9)
    "events_funnel_latency",  # A50 funnel stage-latency stats (r9)
    "knn_mmr",                # N14 MMR diversified top-k (r9)
    "metric_ewma",            # W3 EWMA recursion oracle gate (r9)
    "dedup_kcore",            # G5 2-core peel on the near-dup graph (r10)
    "min_cost_supplier",      # Q2-shaped correlated-min sourcing (r10)
    "dominant_suppliers",     # Q20-shaped majority-share semi-join (r10)
    "metric_theil_sen",       # A51 robust pairwise-median slope (r10)
    "metric_changepoint",     # A52 two-segment SSE split (r10)
    "metric_holt",            # A53 coupled level+trend recursion (r10)
    "knn_snn_strength",       # G7 shared-NN edge strength (r10)
    "embedding_dim_stats",    # N15 per-dim embedding profile (r10)
    "text_bigram_surprisal",  # X21 conditional bigram surprisal (r10)
    "customer_cohort_revenue",  # A54 cohort LTV matrix (r10)
    "stream_markov_transitions",  # T20 order-reconstructing state (r10)
    "stream_sequence_funnel",  # T21 anchored funnel on sequence state (r10)
    "metric_runs_test",       # A55 Wald-Wolfowitz runs test (r10)
    "events_type_affinity",   # A56 type co-occurrence lift (r10)
    "knn_rrf_fusion",         # N16 integer RRF hybrid fusion (r10)
    "stream_sessionize",      # T22 gap sessions on sequence state (r10)
    "embedding_crossmoments",  # N17 exact Gram matrix (r10)
    "text_readability",       # X22 Flesch-ish readability (r10)
    "brand_price_elasticity",  # A57 exact-moment OLS demand slope (r10)
    "knn_assortativity",      # G8 degree assortativity (r10)
    "stream_ewma",            # T23 order-reconstructed float recursion (r10)
    "corpus_pack_efficiency",  # C25 packing utilization dashboard (r10)
    "orders_basket_affinity",  # R25 market-basket lift, support floor (r10)
    "vocab_growth",           # X23 Heaps-law vocabulary curve (r10)
    "events_stickiness",      # A58 DAU/MAU exact sliding distinct (r10)
    "dedup_threshold_sweep",  # D22 Jaccard operating curve (r10)
    "events_trigram_paths",   # A59 second-order path top-k (r10)
    "embedding_outliers",     # N18 centroid-distance outliers (r10)
    "dedup_family_histogram",  # D23 family-size distribution (r10)
    "lineitem_disjunctive_revenue",  # R26 Q19-shaped OR brackets (r10b)
    "customer_order_gaps",    # R27 purchase-cadence histogram (r10b)
    "events_burstiness",      # A60 Fano index of dispersion (r10b)
    "events_user_diversity",  # A61 Simpson behavioral diversity (r10b)
    "metric_xcorr",           # A62 signed-lag lead/lag xcorr (r10b)
    "metric_days_to_threshold",  # A63 capacity-exhaustion ETA (r10b)
    "events_mannwhitney",     # A64 rank-sum drift test (r10c)
    "metric_kendall_tau",     # A65 tau-b monotone association (r10c)
    "metric_pettitt",         # A66 rank-based change point (r10c)
    "metric_quantile_normalize",  # A67 cross-instance QN (r10c)
    "stream_asof_join",       # T24 as-of join served live (r10c)
    "metric_spearman",        # A68 Spearman rank association (r11)
    "metric_mann_kendall",    # A69 Mann-Kendall monotone trend (r11)
    "metric_bollinger",       # A71 Bollinger %B / bandwidth (r11)
    "orders_kaplan_meier",    # A70 KM repurchase survival (r11)
    "stream_pettitt",         # T25 Pettitt served live (r11)
    "events_discovery_timeline",  # exact running-distinct breakpoints
    "dedup_prefix_clusters",  # provably complete near-dup clusters
    # round-12 queue drain: the 27 r10/r11-staged operators (Block R12)
    "text_zipf_octaves",      # X26 Zipf rank-octave profile (r12)
    "knn_reciprocity",        # G9 kNN-graph mutual-edge fraction (r12)
    "events_session_entry_exit",  # A71 session entry/exit pages (r12)
    "customer_rfm",           # A73 RFM quartiles, bucket-refinement (r12)
    "part_supplier_counts",   # R28 Q16 reshape (r12)
    "customer_order_histogram",  # R29 Q13 reshape (r12)
    "metric_seasonal_hod",    # A74 hour-of-day seasonal profile (r12)
    "text_gram_novelty",      # X27 first-occurrence gram novelty (r12)
    "stream_bollinger",       # T26 Bollinger served live (r12)
    "metric_drawdown",        # A75 maximum drawdown (r12)
    "part_value_concentration",  # R30 Q11 reshape (r12)
    "lang_id_confusion",      # X25 lang-ID confusion audit (r12)
    "dedup_sorted_neighborhood",  # D24 SNM blocking candidates (r12)
    "stream_drawdown",        # T27 drawdown served live (r12)
    "knn_link_prediction",    # G10 common-neighbor link prediction (r12)
    "dedup_edit_distance",    # D25 edit-distance verify over SNM (r12)
    "customer_abc",           # A76 ABC/Pareto classes (r12)
    "stream_mannwhitney",     # T28 Mann-Whitney served live (r12)
    "knn_khop_reachability",  # G11 bounded h-hop reachability (r12)
    "corpus_mixture_sample",  # P10 mixture-balancing sampler (r12)
    "events_funnel_sweep",    # A77 funnel deadline sweep (r12)
    "media_audio_energy",     # M8 windowed audio energy (r12)
    "media_scene_cuts",       # M9 scene-cut SAD detector (r12)
    "metric_completeness_report",  # A79 completeness report (r12)
    "events_growth_accounting",  # A78 weekly growth accounting (r12)
    "events_mix_drift",       # A80 week-over-week mix drift (r12)
    "media_image_histogram",  # M10 image intensity histogram (r12)
    "stream_sessionize_evict",  # T22e evict-mode sessions, gated (r12b)
    "stream_funnel_evict",    # T21e evict-mode funnel, gated (r12b)
    "media_ahash",            # M11 perceptual aHash + dedup bands (r12b)
    "stream_cusum",           # T29 CUSUM curve served live (r12b)
    "stream_holt",            # T30 coupled level+trend live (r12b)
    "knn_closeness",          # G12 harmonic closeness, layered BFS (r12b)
    "orders_nelson_aalen",    # A82 cumulative hazard, exact-int (r12b)
    "stream_acf",             # T31 ACF lag table served live (r12b)
    "media_dedup_hamming",    # M12 Hamming verify over aHash bands (r12b)
    "stream_theil_sen",       # T32 robust trend served live (r12b)
    "orders_logrank",         # A83 two-cohort survival test (r12b)
    "corpus_pack_bfd",        # P11 best-fit-decreasing packing (r12b)
    "stream_asof_join_evict",  # T24e evict-mode as-of join, gated (r13)
    "corpus_shuffle",         # P12 seeded deterministic shuffle (r13)
    "dedup_snm_hashed",       # D24b hashed-gram SNM scale twin (r13)
    "corpus_sample_topk",     # P13 exact-k hash-order sample (r13)
    "corpus_interleave",      # P14 stride mixture interleaving (r13)
    "corpus_interleave_presplit",  # P14b hot-source-safe twin (r13)
    # round-14 queue drain: the 36 r13-staged operators (Block R14)
    "metric_seasonal_decompose",  # A84 trend/seasonal decomposition (r14)
    "customer_cohort_ltv",    # A85 cohort LTV curve (r14)
    "metric_winsorize",       # A86 winsorized robust stats (r14)
    "corpus_quota_apportion",  # P15 Hamilton quota apportionment (r14)
    "events_kmv_distinct",    # A87 KMV distinct-count sketch (r14)
    "events_cms_heavy",       # A88 count-min heavy hitters (r14)
    "events_cuped",           # A89 CUPED variance reduction (r14)
    "embedding_sq8",          # N19 int8 scalar quantization audit (r14)
    "media_dhash",            # M13 difference hash + bands (r14)
    "metric_sax_motifs",      # A90 SAX symbolic motifs (r14)
    "customer_decile_lift",   # A91 decile gains/lift table (r14)
    "text_rake_keywords",     # X28 RAKE keyword extraction (r14)
    "stream_cms_heavy",       # T33 CMS served live (r14)
    "knn_prefix_recall",      # N20 Matryoshka prefix recall (r14)
    "customer_abc_migration",  # A92 ABC migration matrix (r14)
    "corpus_epoch_plan",      # P16 token-budget epoch plan (r14)
    "orders_aging_buckets",   # A93 open-order aging buckets (r14)
    "embedding_centroid_drift",  # N21 per-label centroid drift (r14)
    "metric_forecast_backtest",  # A94 Holt forecast backtest (r14)
    "vocab_coverage_curve",   # V3 vocabulary coverage curve (r14)
    "stream_kmv_distinct",    # T34 KMV served live (r14)
    "part_price_index",       # A95 Laspeyres/Paasche/Fisher (r14)
    "events_attribution_ushape",  # A96 U-shaped attribution (r14)
    "nation_trade_similarity",  # A97 trade-profile cosine (r14)
    "stream_attribution",     # T35 last-touch attribution live (r14)
    "part_demand_classes",    # A98 Syntetos-Boylan quadrant (r14)
    "dedup_source_matrix",    # D26 cross-source near-dup matrix (r14)
    "events_kmv_setops",      # A99 KMV set algebra (r14)
    "metric_spc_rules",       # A100 Western-Electric SPC rules (r14)
    "corpus_stratified_exact",  # P17 exact-count stratified sample (r14)
    "stream_spc_rules",       # T36 SPC rules served live (r14)
    "events_markov_stationary",  # A101 Markov stationary dist (r14)
    "text_word_burstiness",   # X29 word burstiness Fano factors (r14)
    "metric_autoperiod",      # A102 ACF-argmax dominant period (r14)
    "qan_latency_log2_histogram",  # Q19 HDR log2 latency histogram (r14)
    "customer_winback",       # A103 win-back cohorts (r14)
    "stream_seasonal_decompose",  # T37 seasonal decomposition live (r14b)
    "stream_autoperiod",      # T38 dominant-period detector live (r14b)
    "stream_winsorize",       # T39 winsorized robust stats live (r14b)
    "metric_range_rate",      # A104 PromQL-style reset-aware rate (r14b)
    "knn_hard_negatives",     # N22 contrastive hard-negative mining (r14b)
    "media_audio_clipping",   # M14 clipping + dead-air screen (r14b)
    "corpus_curriculum",      # P18 curriculum-learning schedule (r14b)
    "stream_range_rate",      # T40 reset-aware rate served live (r14b)
    "basket_pair_lift",       # A105 market-basket association mining (r14b)
    "vocab_fertility",        # V4 tokenizer fertility by language (r14b)
    "embedding_pair_auc",     # N23 embedding-space ROC-AUC audit (r14b)
    # round-15 queue drain: the 7 r14-staged operators (Block R15)
    "funnel_stage_latency",   # A106 funnel stage-latency p50/p90 (r15)
    "corpus_mixture_temperature",  # P19 temperature-scaled mixture (r15)
    "stream_language_mixture",  # T41 live language-mixture monitor (r15)
    "text_ttr_curve",         # X30 TTR by length decile (r15)
    "events_conversion_paths",  # A107 top converting journeys (r15)
    "embedding_centroid_probe",  # N24 nearest-centroid probe (r15)
    "nation_supplier_hhi",    # A108 supplier HHI per nation (r15)
    "stream_forecast_backtest",  # T42 Holt backtest served live (r15b)
    "supplier_leadtime_quantiles",  # R31 lead-time nearest-rank grid (r15b)
    "metric_shesd",           # A109 seasonal-hybrid MAD screen (r15b)
    "dedup_token_sort",       # D27 sorted-token-multiset blocking (r15b)
    "media_keyframes",        # M15 keyframe argmax + motion profile (r15b)
    "text_token_anomalies",   # X31 tokenizer-bomb length screen (r15b)
    "embedding_pca_power",    # N25 integer power-iteration PCA (r15b)
    "stream_supplier_hhi",    # T43 supplier HHI served live (r15b)
    "corpus_shard_skew",      # P20 shard-balance pre-flight audit (r15b)
    "text_charclass_profile",  # X32 char-class corpus fingerprint (r15b)
    "events_dwell_time",      # A110 post-event dwell quantiles (r15b)
    "stream_token_anomalies",  # T44 tokenizer-bomb monitor live (r15b)
    "source_vocab_overlap",   # X33 cross-source vocab Jaccard matrix (r15b)
    "stream_charclass_profile",  # T45 char-class fingerprint live (r15b)
    "embedding_norm_deciles",  # N26 squared-norm decile curve (r15b)
    "corpus_dedup_yield",     # P21 dedup saturation curve (r15b)
    "stream_dwell_time",      # T46 dwell quantiles served live (r15b)
    # round-16 registrations
    "text_extract_content",   # X34 boilerplate strip / content extraction
    "stream_state_budget",    # T47 state-size budget (4 replays; cold-only)
    "stream_extract_content",  # T48 X34 boilerplate strip served live
    "embedding_angle_probe",  # N27 bounded pairwise-cosine histogram
    "corpus_mixture_dedup",   # P22 Hamilton shares on unique tokens
    "orders_gini_segment",    # A114 Gini via distinct-value grid ranks
    "stream_gini_segment",    # T49 Gini served live (shared grid/report)
    "corpus_compaction_plan",  # P23 BFD merge plan over shard sizes
    "orders_lorenz_deciles",  # A115 Lorenz curve via the A114 grid
    "text_template_lines",    # X35 line-frequency template detection
    "stream_shard_skew",      # T50 P20 shard-balance served live
    "dedup_group_histogram",  # D28 dup cluster-size distribution
    # stream_cdc_merge is timed via _time_cdc_merge below (merge work
    # only): its checkpointed replay rewrites a bucketed parquet snapshot
    # per micro-batch (~12 s/run at sf0.1, >90% filesystem publish/rename
    # harness, not plan cost), so the replay path itself stays untimed.
]


#: the round-1 contract subset: the 14 queries BENCH_r01.json timed — the
#: 2x-baseline ratio is computed over these, so they run FIRST (fresh
#: session, before the 340-query tail can age the JVM) at median-of-6
#: warm repeats with per-query MIN recorded alongside (r14 verdict #4);
#: the long tail gets cold + 2 warm (the suite is 354 queries now — 3
#: warm repeats across all of them is what outgrew the driver's wall
#: clock in r14 and produced the rc=124 artifact).
R1_SUBSET = [
    "qan_top_digests", "qan_multi_metric_topn", "qan_trend_5m",
    "qan_rollup_minute", "qan_snapshot_delta", "pricing_summary",
    "top_revenue_orders", "regional_revenue", "text_quality",
    "text_fingerprint", "dedup_minhash_lsh", "knn_brute", "knn_lsh",
    "media_features",
]

#: the dedup exactness tail (r12 verdict #3): these three read up to 2x
#: slower inside the shared 293-query session than in a dedicated one
#: (dedup_edit_distance 20.3 s in-suite vs 9.1 s dedicated, SCALE.md
#: r12) — session-age regime, not plan cost.  Since r16 (r15 verdict #1)
#: the dedicated pass covers the whole COLD-ONLY tier (see below), with
#: this list kept as the always-included seed.  The suite numbers stay
#: the canonical `queries` entries; the FRESH SESSION re-measurement
#: (subprocess, parent session stopped) lands in BENCH_LOCAL.json as
#: `queries_dedicated`.  SPARK_GRAFT_BENCH_DEDICATED=0 skips it.
DEDICATED_TAIL = [
    "dedup_edit_distance",
    "dedup_prefix_pairs",
    "dedup_recall_report",
]

#: COLD-ONLY tier (r15 verdict #1): queries whose prior-round in-suite
#: cost (max of warm, cold) meets this threshold run ONCE in the main
#: loop (the cold number) and get their warm number from the dedicated
#: fresh-session pass instead — the replay-harness gate queries
#: (stream_funnel_evict 45.8 s warm in r15) and the dedup exactness
#: tail were spending ~265 s/round of budget on in-suite warm repeats
#: whose regime the dedicated pass measures better anyway (the r15 #3
#: swing: 45.8 s in-suite vs 20.6 s fresh-session for the SAME query).
#: When the dedicated pass doesn't fit the remaining budget, the warm
#: slot falls back to the cold run with provenance recorded in
#: `warm_source` — never a stale number reported as fresh.
COLD_ONLY_EST_S = 8.0

#: queries KNOWN heavy at registration time, seeded into the cold-only
#: tier before any BENCH_LOCAL estimate exists (a new registration has
#: no prior warm, so the est-based membership can't catch it)
COLD_ONLY_SEED = {
    "stream_state_budget",  # T47: four stateful replays, ~55 s
}

#: documented skip-priority tiers (r15 verdict #1): when the budget
#: runs short, queries are sacrificed lowest-tier-first —
#:   1. contract subset (never skipped: runs first, fresh session)
#:   2. new registrations (no prior estimate — first official timing)
#:   3. carried queries (stale-refresh of round-over-round numbers)
#:   4. cold-only tier (harness twins + exactness audits; run LAST so
#:      est-gated skips land here first, and their warm regime is the
#:      dedicated pass's job anyway)


def _time_cdc_merge(spark, sf_dir: str) -> float:
    """Harness-normalized ``stream_cdc_merge`` timing: build the bucketed
    snapshot and change feed OUTSIDE the timer (the replay harness's
    checkpoint/file-stream machinery is >90% of its wall time), then time
    what the operator actually does per micro-batch — one
    ``merge_into_partitioned`` of the full change batch plus the
    snapshot read-back. This gives the one registry query the replay
    excludes a comparable per-round perf record (r7 verdict next-#7)."""
    import shutil
    import tempfile

    from project_obsidian_core_spark.operators.merge import (
        merge_into_partitioned,
        read_partitioned_snapshot,
        write_partitioned_snapshot,
    )
    from project_obsidian_core_spark.plans import cdc_queries as cdc

    tmp = tempfile.mkdtemp(prefix="obsidian_bench_cdc_")
    try:
        base = cdc._orders_snapshot(spark, sf_dir)
        snap = f"{tmp}/snapshot"
        write_partitioned_snapshot(base, snap, keys=["o_orderkey"], n_buckets=8)
        ch_path = f"{tmp}/changes"
        cdc._cdc_batch(base).write.parquet(ch_path)
        changes = spark.read.parquet(ch_path)
        t0 = time.time()
        merge_into_partitioned(
            spark, snap, changes, keys=["o_orderkey"], n_buckets=8
        )
        read_partitioned_snapshot(spark, snap).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _host_fingerprint() -> dict:
    """CPU model + logical count + 1-min loadavg — enough to tell one
    bench host/load regime from another when comparing rounds."""
    model = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for ln in fh:
                if ln.lower().startswith("model name"):
                    model = ln.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    # fixed-work CPU canary: ~100 ms of pure-python integer arithmetic.
    # Round-over-round bench ratios on this box have swung 1.0-1.5x with
    # NO code change (r10 session 4 measured untouched scan-bound queries
    # at 1.8x their r1 times in a fresh session while tiny queries held
    # 1.0x — shared-host regime drift). The canary makes the regime
    # measurable: compare spin_ms across BENCH_*.json before reading
    # anything into a suite-total movement.
    spins = []
    for _ in range(3):
        t0 = time.time()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        spins.append((time.time() - t0) * 1000)
    return {
        "cpu": model,
        "n_cpus": os.cpu_count(),
        "load1": load1,
        # min = host capability, max-min = steal/scaling jitter (observed
        # live: 130 vs 203 ms back-to-back while otherwise idle)
        "spin_ms_min": round(min(spins), 1),
        "spin_ms_max": round(max(spins), 1),
    }


def _r1_ratio(warm: dict[str, float], sf: float | None) -> float | None:
    """Warm-total ratio vs the round-1 recorded baseline over the common
    query subset (the driver's 2x contract). None if no r01 record or the
    scale factors differ (a cross-SF ratio would be meaningless)."""
    try:
        with open(os.path.join(REPO, "BENCH_r01.json")) as fh:
            rec = json.load(fh)
        # the driver wraps the printed line under "parsed"
        parsed = rec.get("parsed") or rec
        r1 = parsed.get("queries") or {}
        if parsed.get("sf") != sf:
            return None
    except (OSError, ValueError, AttributeError):
        return None
    common = [q for q in r1 if q in warm]
    base = sum(r1[q] for q in common)
    if not common or base <= 0:
        return None
    return round(sum(warm[q] for q in common) / base, 4)


def main() -> None:
    """Budget-bounded bench (r14 verdict #1: BENCH_r14.json was rc=124
    with parsed:null — the 346-query suite outgrew the driver's wall
    clock and the ONE printed JSON line never happened).  Structure:

    1. CONTRACT PHASE — the 14-query round-1 subset runs first, in the
       fresh session, at median-of-6 warm repeats with per-query MIN
       recorded alongside the median (r14 verdict #4).  The one-line
       JSON (r1_ratio / r1_ratio_min / r1_ratio_norm / spin_ms_min) is
       printed IMMEDIATELY after this phase, so the contract evidence
       exists even if everything after is killed mid-flight.
    2. TAIL PHASE — the remaining ~360 queries at cold + 1-2 warm, each
       iteration gated on the wall-clock budget.  The COLD-ONLY tier
       (prior in-suite warm >= COLD_ONLY_EST_S; the replay-harness gate
       queries + the dedup exactness tail) runs LAST and gets ONE run
       each — its warm numbers come from the dedicated fresh-session
       pass (provenance in `warm_source`; `value` sums whatever filled
       the warm slot, dedicated or cold fallback), and any est-gated
       skips land on this tier first (the documented skip priority:
       contract > new registrations > carried > cold-only tier).
       Each non-tier query is gated on
       ($SPARK_GRAFT_BENCH_BUDGET_S, default 2550 s — the driver cap is
       only bracketed by evidence: r13's ~2600 s run survived, r14's
       ~3100 s+ loop was killed, so stay on the proven-safe side).
       Per-query costs from the PREVIOUS round's committed
       BENCH_LOCAL.json estimate the remaining work, so extra warm
       runs only happen when there is slack for them AND every
       remaining query — a query is skipped (recorded in skipped_n)
       only when even its cold+warm pair no longer fits; queries whose
       estimated warm exceeds 8 s get ONE warm run (work-dominated;
       the dedicated fresh-session pass covers the dedup tail's
       variance).
    3. The cdc-merge timing, dedicated dedup pass and the FINAL line
       re-print only run inside the remaining budget; the final line
       supersedes the contract line when it prints.
    """
    t_start = time.time()
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "2550"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_session(app_name="obsidian-spark-bench")

    # per-query cost estimates from the previous round's committed
    # BENCH_LOCAL.json (read BEFORE this run overwrites it): used to
    # decide whether an extra warm run would starve later queries.
    est: dict[str, float] = {}
    est_warm: dict[str, float] = {}
    est_cold: dict[str, float] = {}
    prior: dict = {}
    try:
        with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
            prior = json.load(fh)
        if prior.get("sf") == sf:
            pw, pc = prior.get("queries", {}), prior.get("queries_cold", {})
            est_warm = {k: v for k, v in pw.items() if v}
            est_cold = {k: pc.get(k, pw[k]) for k in est_warm}
            est = {
                k: est_cold[k] + 2 * pw[k] for k in est_warm
            }
    except (OSError, ValueError):
        est = {}
    est_default = statistics.median(est.values()) if est else 3.0

    # COLD-ONLY tier membership (r15 verdict #1): prior in-suite warm at
    # or above the threshold, plus anything that was ALREADY cold-only
    # last round and whose cold still clears the bar (so a cheap
    # dedicated fresh-session warm can't oscillate a query out of the
    # tier), plus the classic dedup exactness tail.  The contract subset
    # and the separately-harnessed cdc timing never enter.
    prior_src = prior.get("warm_source", {}) if isinstance(prior, dict) else {}
    cold_only = {
        k
        for k in est_warm
        if est_warm[k] >= COLD_ONLY_EST_S
        or (k in prior_src and est_cold.get(k, 0.0) >= COLD_ONLY_EST_S)
    } | (set(DEDICATED_TAIL) & set(QUERIES)) | (COLD_ONLY_SEED & set(QUERIES))
    cold_only -= set(R1_SUBSET)
    cold_only.discard("stream_cdc_merge")
    for k in cold_only:
        # a cold-only query costs ONE run in the main loop
        if k in est:
            est[k] = est_cold.get(k, est_warm.get(k, est_default))

    # quiesce guard (round 11): a bench launched right after other Spark
    # sessions exit measured the FIRST queries (the r1 contract subset,
    # which runs first) at a uniform 1.4-2.0x their steady-state times —
    # r1_ratio 1.45 with a FAST cpu canary (spin 106 ms) and load1 1.89,
    # while the identical subset re-run on the idle host read 1.10.
    # Residual load / page-cache churn from exiting JVMs decays in ~1-2
    # minutes; wait it out (bounded) before timing anything.
    quiesce_s = 0
    while os.getloadavg()[0] > 1.0 and quiesce_s < 180:
        time.sleep(5)
        quiesce_s += 5

    # warmup: session init, parquet footer reads, codegen
    QUERIES["qan_distinct_metrics"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    host = _host_fingerprint()
    host["quiesce_s"] = quiesce_s
    warm: dict[str, float] = {}
    warm_min: dict[str, float] = {}
    warm_n: dict[str, int] = {}  # ACTUAL warm-run count (r15 ADVICE)
    warm_source: dict[str, str] = {}  # cold-only tier provenance
    cold: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    partial_path = os.path.join(REPO, "BENCH_LOCAL.partial.json")

    def run_once(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    def hygiene() -> None:
        # session hygiene between queries: memory-sink tables (one per
        # stream replay, holding every emitted row for the session's
        # life), cached/checkpointed blocks and dangling python refs
        # accumulate over a 350-query suite — the r9 run measured the
        # LAST ~35 suite positions at a median 2.35x their r8 times
        # while every earlier position sat at ~1.1x (position-
        # correlated, so session state, not host drift).  Isolate each
        # query's measurement from its predecessors' leftovers.
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
        gc.collect()

    def checkpoint() -> None:
        # checkpoint after every query: a timeout/kill mid-suite still
        # leaves every completed measurement on disk
        with open(partial_path, "w") as fh:
            fh.write(
                json.dumps(
                    {
                        "queries": warm,
                        "queries_min": warm_min,
                        "queries_cold": cold,
                        "host": host,
                        "sf": sf,
                    }
                )
                + "\n"
            )

    def remaining() -> float:
        return budget - (time.time() - t_start)

    # ---- phase 1: the contract subset, median-of-6 warm + per-query MIN
    contract_warm = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "7")) - 1
    for name in R1_SUBSET:
        runs = [run_once(name) for _ in range(1 + contract_warm)]
        cold[name] = round(runs[0], 4)
        warm_runs = runs[1:] or runs
        # transient-hiccup guard: a warm run slower than 1.5x cold is
        # physically suspect (cold includes IO + codegen) — re-time twice
        # and let the median wash the stall out.
        if min(warm_runs) > 1.5 * runs[0] + 0.2:
            warm_runs.extend(run_once(name) for _ in range(2))
        # r12 verdict #4: record EVERY warm run for the contract queries
        # so environment attribution is mechanical, not inferred.
        spread[name] = [round(r, 4) for r in warm_runs]
        warm[name] = round(statistics.median(warm_runs), 4)
        warm_min[name] = round(min(warm_runs), 4)
        warm_n[name] = len(warm_runs)
        hygiene()
        checkpoint()

    r1_ratio = _r1_ratio(warm, sf)
    r1_ratio_min = _r1_ratio(warm_min, sf)
    # Regime-normalized ratio (r13 verdict #7): r13's bench ran on a host
    # regime ~1.4x slower than r12's (spin canary 130.6-162.4 ms vs 97.7)
    # and the raw r1_ratio inflated from 1.06 to 1.45 with zero code diff.
    # Normalize by the fixed-work CPU canary against the r12 reference
    # reading so the artifact itself says "host, not code".  REF_SPIN_MS
    # is the recorded r12 fast-host canary (SCALE.md r13 regime note).
    REF_SPIN_MS = 97.7
    spin_ms = host.get("spin_ms_min")
    r1_ratio_norm = (
        round(r1_ratio * REF_SPIN_MS / spin_ms, 4)
        if r1_ratio is not None and spin_ms
        else None
    )

    def emit_line(extra: dict) -> None:
        # The driver records only the LAST 2000 chars of stdout and
        # json-parses the final line: r06's 80-query map (~2.3 KB)
        # overflowed it and the official record came back parsed:null.
        # The printed line therefore carries per-query times ONLY for the
        # round-1 contract subset (the 14 queries the 2x-baseline ratio
        # is computed over) plus the suite aggregates; every query's
        # warm/cold/spread detail is in BENCH_LOCAL.json.
        line = json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": round(sum(warm.values()), 2),
                "unit": "sec",
                "queries": {
                    q: round(warm[q], 2) for q in R1_SUBSET if q in warm
                },
                "queries_min": {
                    q: round(warm_min[q], 2)
                    for q in R1_SUBSET
                    if q in warm_min
                },
                "n_queries": len(warm),
                "value_cold": round(sum(cold.values()), 2),
                "r1_ratio": r1_ratio,
                "r1_ratio_min": r1_ratio_min,
                "r1_ratio_norm": r1_ratio_norm,
                "spin_ms_min": spin_ms,
                "load1": host["load1"],
                "detail": "BENCH_LOCAL.json",
                "sf": sf,
                **extra,
            },
            separators=(",", ":"),
        )
        assert len(line) < 1900, f"bench line too long: {len(line)}"
        print(line, flush=True)

    # the contract evidence, printed BEFORE the tail can be killed
    # (r14 verdict #1); superseded by the final line when that prints
    emit_line({"phase": "contract"})

    # ---- phase 2: the tail, budget-gated per query
    skipped: list[str] = []
    tail = [q for q in BENCH_QUERIES if q not in R1_SUBSET]
    # documented skip-priority ordering (r15 verdict #1): the cold-only
    # tier runs LAST, so when the budget runs short the est-gated skips
    # land on the harness twins / exactness audits first — never on new
    # registrations or carried stale-refresh numbers.
    tail = [q for q in tail if q not in cold_only] + [
        q for q in tail if q in cold_only
    ]
    # RESERVE covers the cdc-merge timing + the final-line epilogue
    RESERVE = 90.0
    # headroom the routine slack-funded extra runs may never consume —
    # the r15 verdict's >=300 s visible-slack target; the optional
    # dedicated pass (quality work, partial-result safe) MAY spend it,
    # which is why `slack_s` is measured BEFORE that pass starts.
    SLACK_FLOOR = 300.0
    rest_work = [0.0] * (len(tail) + 1)
    for i in range(len(tail) - 1, -1, -1):
        rest_work[i] = rest_work[i + 1] + est.get(tail[i], est_default)

    for i, name in enumerate(tail):
        q_est = est.get(name, est_default)
        if remaining() < RESERVE + 1.5 * q_est:
            skipped.append(name)
            continue

        if name in cold_only:
            # ONE run — the in-suite cold number.  The warm slot is
            # filled from the dedicated fresh-session pass after the
            # loop (or falls back to this run; see warm_source).
            cold[name] = round(run_once(name), 4)
            hygiene()
            checkpoint()
            continue

        def slack() -> float:
            # budget left beyond what every REMAINING query still needs
            # at its base cost: extra runs spend only this, so quality
            # never starves completeness (r14 verdict #1)
            return remaining() - RESERVE - rest_work[i + 1]

        runs = [run_once(name), run_once(name)]
        # >=8 s (estimated) queries are work-dominated: single warm run,
        # the dedicated pass covers their variance.  Everything else
        # gets a second warm run, plus a third when the slack allows it
        # (median-of-2 is just the mean; median-of-3 rejects a stall).
        work_dominated = est_warm.get(name, 0) >= 8.0
        if not work_dominated:
            # routine slack-funded 3rd runs must leave SLACK_FLOOR
            # untouched (r15 verdict #1: the round needs >=300 s of
            # VISIBLE headroom, not headroom silently converted into
            # extra repeats); the rarer hiccup/outlier guards below
            # still spend from the floor — they protect correctness of
            # the recorded number itself.
            if slack() > 2 * q_est + 30 + SLACK_FLOOR:
                runs.append(run_once(name))
            # transient-hiccup guard (r8: events_chisq recorded 18 s for
            # a 2 s query from one GC/host stall — a fake 8x regression)
            if min(runs[1:]) > 1.5 * runs[0] + 0.2 and slack() > 2 * q_est + 30:
                runs.extend(run_once(name) for _ in range(2))
        cold[name] = round(runs[0], 4)
        warm_runs = runs[1:]
        # observed-spread outlier rule (r10 verdict next-#6): a >2x gap
        # between two warm times is exactly the signature a real
        # regression would wear — buy one more observation and record
        # EVERY warm run for such queries so the round diff can see the
        # distribution.
        if (
            len(warm_runs) > 1
            and max(warm_runs) > 2 * min(warm_runs)
            and slack() > q_est + 30
        ):
            warm_runs.append(run_once(name))
            spread[name] = [round(r, 4) for r in warm_runs]
        else:
            spread[name] = [round(min(warm_runs), 4), round(max(warm_runs), 4)]
        warm[name] = round(statistics.median(warm_runs), 4)
        warm_min[name] = round(min(warm_runs), 4)
        warm_n[name] = len(warm_runs)
        hygiene()
        checkpoint()

    # stream_cdc_merge: merge work timed directly, replay harness excluded
    # (see _time_cdc_merge). cold = first run (includes codegen), warm =
    # median of two more.
    if remaining() > 120:
        cdc_runs = [_time_cdc_merge(spark, sf_dir) for _ in range(3)]
        cold["stream_cdc_merge"] = round(cdc_runs[0], 4)
        warm["stream_cdc_merge"] = round(statistics.median(cdc_runs[1:]), 4)
        warm_min["stream_cdc_merge"] = round(min(cdc_runs[1:]), 4)
        spread["stream_cdc_merge"] = [
            round(min(cdc_runs[1:]), 4),
            round(max(cdc_runs[1:]), 4),
        ]
        warm_n["stream_cdc_merge"] = 2
    else:
        skipped.append("stream_cdc_merge")

    # dedicated-session pass for the COLD-ONLY tier (r15 verdict #1;
    # grew out of the r12 dedup exactness tail): parent session stops
    # first so the subprocess measures a fresh-JVM regime.  The queue is
    # the cold-only tier with the streaming replay-harness queries first
    # (their in-suite/fresh-session swing is the number the round diff
    # needs), then by prior cost descending; the subprocess prints a
    # CUMULATIVE JSON line after every query so a budget timeout still
    # yields partial results.
    dedicated: dict = {}
    # the headroom measurement point: mandatory work (contract + tail +
    # cdc) is done, the optional dedicated pass hasn't spent anything yet
    slack_pre_dedicated = round(remaining(), 1)
    ded_queue = sorted(
        (q for q in cold_only if q in QUERIES and q in cold),
        key=lambda q: (not q.startswith("stream_"), -est_warm.get(q, 0.0)),
    )
    if (
        os.environ.get("SPARK_GRAFT_BENCH_DEDICATED", "1") != "0"
        and ded_queue
        and remaining() > 150
    ):
        spark.stop()
        import subprocess

        out = ""
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--dedicated"],
                capture_output=True,
                text=True,
                timeout=max(120, remaining() - 60),
                env={
                    **os.environ,
                    "SPARK_GRAFT_DEDICATED_QUERIES": ",".join(ded_queue),
                },
            )
            out = proc.stdout or ""
        except subprocess.TimeoutExpired as exc:
            out = exc.stdout if isinstance(exc.stdout, str) else ""
        except (OSError, subprocess.SubprocessError):
            out = ""
        for ln in reversed(out.strip().splitlines()):
            try:
                dedicated = json.loads(ln)
                break
            except ValueError:
                continue

    # fill the cold-only tier's warm slots: dedicated fresh-session
    # numbers when measured THIS round, else the cold run — provenance
    # in warm_source, never a stale number reported as fresh.
    for name in ded_queue:
        ded = dedicated.get(name)
        if ded and len(ded.get("runs", [])) > 1:
            wruns = ded["runs"][1:]
            warm[name] = round(statistics.median(wruns), 4)
            warm_min[name] = round(min(wruns), 4)
            spread[name] = [round(r, 4) for r in wruns]
            warm_n[name] = len(wruns)
            warm_source[name] = "dedicated"
        else:
            warm[name] = cold[name]
            warm_min[name] = cold[name]
            spread[name] = [cold[name]]
            warm_n[name] = 0
            warm_source[name] = "cold_fallback"

    full = json.dumps(
        {
            "metric": "bench_suite_seconds",
            "value": round(sum(warm.values()), 4),
            "unit": "sec",
            "queries": warm,
            "queries_min": warm_min,
            "value_cold": round(sum(cold.values()), 4),
            "queries_cold": cold,
            "queries_spread": spread,
            # fresh-session regime for the dedup exactness tail (r12
            # verdict #3): {name: {cold, warm, runs}} from --dedicated
            "queries_dedicated": dedicated,
            # machine-readable (r9 ADVICE); per_query carries the ACTUAL
            # warm-run count — the r15 constant "tail: 2" misstated the
            # 1-run work-dominated and 3-5-run hiccup-guard cases
            # (r15 ADVICE #3)
            "warm_repeats": {
                "r1_subset": contract_warm,
                "per_query": warm_n,
            },
            "warm_source": warm_source,
            "cold_only": sorted(cold_only),
            "skipped": skipped,
            "budget_s": budget,
            "slack_s": slack_pre_dedicated,
            "elapsed_s": round(time.time() - t_start, 1),
            "host": host,
            "r1_ratio": r1_ratio,
            "r1_ratio_min": r1_ratio_min,
            "r1_ratio_norm": r1_ratio_norm,
            "sf": sf,
        }
    )
    # Full detail (incl. per-query cold times) goes to a file the driver
    # can pick up intact; the printed line stays under the driver's
    # fixed-size stdout tail capture.  The previous round's file moves
    # to BENCH_LOCAL.prev.json first — it is an untracked judge artifact
    # and a plain overwrite destroyed the r14 copy (r15 build log).
    local_path = os.path.join(REPO, "BENCH_LOCAL.json")
    if os.path.exists(local_path):
        os.replace(local_path, os.path.join(REPO, "BENCH_LOCAL.prev.json"))
    with open(local_path, "w") as fh:
        fh.write(full + "\n")
    if os.path.exists(partial_path):
        os.remove(partial_path)
    # aggregate spread stats (full per-query spread lives in BENCH_LOCAL
    # only — ~2 KB that would push this line past the driver's tail capture)
    rels = sorted(
        (max(sp) - min(sp)) / w if w > 0 else 0.0
        for w, sp in ((warm[k], spread[k]) for k in warm if k in spread)
    )
    emit_line(
        {
            "spread_med_rel": round(rels[len(rels) // 2], 3) if rels else None,
            "spread_max_rel": round(rels[-1], 3) if rels else None,
            "skipped_n": len(skipped),
            "elapsed_s": round(time.time() - t_start, 1),
            # measured budget headroom (r15 verdict #1 asks for >=300 s):
            # slack_s is taken BEFORE the optional dedicated pass, which
            # exists to spend exactly this surplus on fresh-regime warm
            # numbers; slack_final_s is what it left behind.
            "slack_s": slack_pre_dedicated,
            "slack_final_s": round(remaining(), 1),
            "dedicated_n": len(dedicated),
        }
    )


def dedicated_main() -> None:
    """Fresh-session measurement of the cold-only tier (r12 verdict #3,
    widened by r15 verdict #1): one new JVM, the standard
    32-shuffle-partition session.  Queue comes from
    $SPARK_GRAFT_DEDICATED_QUERIES (comma-separated; falls back to
    DEDICATED_TAIL).  The classic dedup exactness tail keeps cold + 3
    warm runs; everything else gets cold + 1 warm — the parent only
    needs one fresh-regime warm number per replay-harness query.
    Prints a CUMULATIVE JSON line {name: {cold, warm, runs}} after
    EVERY query so a parent-side budget timeout still collects the
    completed prefix (the parent parses the LAST parseable line)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queue = [
        q
        for q in os.environ.get(
            "SPARK_GRAFT_DEDICATED_QUERIES", ",".join(DEDICATED_TAIL)
        ).split(",")
        if q in QUERIES
    ]
    spark = build_session(app_name="obsidian-spark-bench-dedicated")
    # brief quiesce: the parent suite's JVM just exited
    waited = 0
    while os.getloadavg()[0] > 1.0 and waited < 90:
        time.sleep(5)
        waited += 5
    QUERIES["qan_distinct_metrics"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, dict] = {}
    for name in queue:
        runs = []
        for _ in range(4 if name in DEDICATED_TAIL else 2):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
        out[name] = {
            "cold": round(runs[0], 4),
            "warm": round(statistics.median(runs[1:]), 4),
            "runs": [round(r, 4) for r in runs],
        }
        spark.catalog.clearCache()
        gc.collect()
        print(json.dumps(out), flush=True)


#: scan-heavy declared queries over `documents` only — the probe's
#: subjects — each with its own blow-up factor.  The per-row text queries
#: are O(rows) compute on the scan (the shape that MUST scale with cores
#: once the input amortizes fixed costs) and need a large factor because
#: sf0.1 `documents` is only 5000 rows / 1.5 MB of text; the minhash join
#: pipeline's pair space grows super-linearly, so a small factor already
#: dwarfs fixed costs there.
SCALE_PROBE_QUERIES = [
    ("text_fingerprint", 40),
    ("text_quality", 40),
    ("text_gram_novelty", 20),
    ("dedup_minhash_lsh", 5),
]


def scale_probe_worker_main() -> None:
    """One fresh JVM at master local[$SPARK_GRAFT_CPUS] timing the probe
    queries against $SPARK_GRAFT_PROBE_DIR (cold + 2 warm through the noop
    sink, same methodology as the main bench).  Prints one JSON line
    {query: [runs...]} for the parent to combine."""
    probe_dir = os.environ["SPARK_GRAFT_PROBE_DIR"]
    spark = build_session(app_name="obsidian-spark-scale-probe")
    QUERIES["qan_distinct_metrics"](
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ).write.format("noop").mode("overwrite").save()
    out: dict[str, list[float]] = {}
    for name, blowup in SCALE_PROBE_QUERIES:
        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"scale-probe:{name}:{i}")
            t0 = time.time()
            QUERIES[name](spark, f"{probe_dir}/bu{blowup}").write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(round(time.time() - t0, 4))
        out[name] = runs
    print("SCALE_PROBE_WORKER " + json.dumps(out), flush=True)


def _probe_blown_docs(spark, sf_dir: str, blowup: int):
    """Union of ``blowup`` doc_id-shifted copies of `documents` — distinct
    ids so dedup joins see a K x corpus, not K exact replicas of the pair
    space per block."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    shift = (docs.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    blown = docs
    for i in range(1, blowup):
        blown = blown.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        )
    return blown


def scale_probe_main() -> None:
    """``bench.py --scale-probe`` (r16 verdict #2): a scaling signal the
    sf0.1 bench cannot provide.  At sf0.1 scheduler/exchange fixed costs
    dominate — the 8-core run beats the 32-core run on every contract query
    (BENCH_r16_c8), so the driver's low-core ratio cannot separate a
    genuinely serial operator from an overhead-bound one.

    The probe blows `documents` up per query (SCALE_PROBE_QUERIES: union
    of doc_id-shifted copies, written ONCE to a fresh temp dir from the
    parquet inputs at probe time and deleted afterwards — nothing persists
    across invocations), then times the scan-heavy probe queries in TWO
    fresh subprocesses: one at the inherited $SPARK_GRAFT_CPUS and one at
    a quarter of it — the same env contract as the main bench, so
    `master` is still local[$SPARK_GRAFT_CPUS] inside each worker.  Prints
    ONE JSON line (separate invocation — the default bench path and its
    contract line are untouched):

      {"metric": "scale_probe_seconds",
       "cpus": {"lo": n, "hi": n},
       "queries": {name: {"blowup": K, "lo": s, "hi": s,
                          "ratio": lo/hi}}, ...}

    ratio ≈ hi_cores/lo_cores means perfect scaling; ratio ≈ 1 means the
    query is still fixed-cost-bound at this size; ratio < 1 at THIS size
    means genuinely serial work dominates.
    """
    import shutil
    import subprocess
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    hi = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    lo = max(2, hi // 4)
    probe_dir = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        spark = build_session(app_name="obsidian-spark-scale-probe-gen")
        for blowup in sorted({b for _, b in SCALE_PROBE_QUERIES}):
            (
                _probe_blown_docs(spark, sf_dir, blowup)
                .repartition(hi)
                .write.mode("overwrite")
                .parquet(f"{probe_dir}/bu{blowup}/documents.parquet")
            )
        spark.stop()
        results: dict[int, dict] = {}
        for cpus in (lo, hi):
            env = dict(os.environ)
            env["SPARK_GRAFT_CPUS"] = str(cpus)
            env["SPARK_GRAFT_PROBE_DIR"] = probe_dir
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-probe-worker"],
                capture_output=True,
                text=True,
                env=env,
                timeout=3600,
            )
            line = [
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("SCALE_PROBE_WORKER ")
            ]
            if not line:
                print(proc.stdout[-2000:], file=sys.stderr)
                print(proc.stderr[-4000:], file=sys.stderr)
                raise RuntimeError(f"scale-probe worker at {cpus} cpus failed")
            results[cpus] = json.loads(line[-1].split(" ", 1)[1])
        queries = {
            name: {
                "blowup": blowup,
                "lo": min(results[lo][name][1:]),
                "hi": min(results[hi][name][1:]),
                "ratio": round(
                    min(results[lo][name][1:]) / min(results[hi][name][1:]), 3
                ),
            }
            for name, blowup in SCALE_PROBE_QUERIES
        }
        print(
            json.dumps(
                {
                    "metric": "scale_probe_seconds",
                    "sf_dir": sf_dir,
                    "cpus": {"lo": lo, "hi": hi},
                    "queries": queries,
                    "runs": {str(c): results[c] for c in results},
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    if "--dedicated" in sys.argv[1:]:
        dedicated_main()
    elif "--scale-probe-worker" in sys.argv[1:]:
        scale_probe_worker_main()
    elif "--scale-probe" in sys.argv[1:]:
        scale_probe_main()
    else:
        main()
