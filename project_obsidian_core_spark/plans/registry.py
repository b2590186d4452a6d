"""Driver-contract registry: query name -> (callable, oracle SQL | None).

Aggregates every implemented SURVEY §2 query shape. Names are stable — the
driver records per-name correctness, so renames lose history.

ORDERING CONTRACT: the driver correctness gate records the FIRST 50
entries only (CORRECTNESS_r02.json stopped at slot 50).  Entries are
therefore ordered by gate priority, not by theme.  The standing rule:

  1. Queries with no official green row yet MUST lead — a tail slot can
     never earn one (pinned by tests/test_registry_gate.py).
  2. The remaining window slots re-record the queries whose newest
     official green row is OLDEST, so no row ages indefinitely.

Since round 9 the rotation is COMPUTED from the committed
CORRECTNESS_r*.json artifacts (see the sort at the bottom of this
module), so `_ENTRIES` itself stays grouped by theme and the order can
never go stale mid-round.
All registered queries pass the identical oracle locally
(`scripts/oracle_check.py`, bit-EXACT) regardless of position.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from project_obsidian_core_spark.plans import analytics_ext_queries as ax
from project_obsidian_core_spark.plans import behavior_queries as bh
from project_obsidian_core_spark.plans import cdc_queries as cdc
from project_obsidian_core_spark.plans import bpe_queries as bq
from project_obsidian_core_spark.plans import clustering_queries as km
from project_obsidian_core_spark.plans import curation_queries as cu
from project_obsidian_core_spark.plans import datapipe_queries as d
from project_obsidian_core_spark.plans import ingest_queries as ing
from project_obsidian_core_spark.plans import layout_queries as lay
from project_obsidian_core_spark.plans import metrics_queries as m
from project_obsidian_core_spark.plans import qan_queries as q
from project_obsidian_core_spark.plans import otlp_queries as o
from project_obsidian_core_spark.plans import pipeline_queries as pl
from project_obsidian_core_spark.plans import pq_queries as pq
from project_obsidian_core_spark.plans import relational_queries as r
from project_obsidian_core_spark.plans import temporal_queries as tj
from project_obsidian_core_spark.plans import status_queries as sq
from project_obsidian_core_spark.plans import streaming_queries as st

QueryFn = Callable[[SparkSession, str], DataFrame]

_ENTRIES: list[tuple[str, QueryFn, str | None]] = [
    # ------------------------------------------------------------------
    # Block R5 — round-5 additions (no official row yet — lead the gate).
    # Relational breadth: the remaining classic TPC-H join/subquery shapes
    ("promo_revenue", r.promo_revenue, r.ORACLE_promo_revenue),
    ("small_quantity_revenue", r.small_quantity_revenue, r.ORACLE_small_quantity_revenue),
    ("large_order_customers", r.large_order_customers, r.ORACLE_large_order_customers),
    ("brand_type_revenue", r.brand_type_revenue, r.ORACLE_brand_type_revenue),
    ("dormant_customers", r.dormant_customers, r.ORACLE_dormant_customers),
    ("top_supplier_revenue", r.top_supplier_revenue, r.ORACLE_top_supplier_revenue),
    ("nation_trade_volume", r.nation_trade_volume, r.ORACLE_nation_trade_volume),
    (
        "returned_item_customers",
        r.returned_item_customers,
        r.ORACLE_returned_item_customers,
    ),
    (
        "customer_order_distribution",
        r.customer_order_distribution,
        r.ORACLE_customer_order_distribution,
    ),
    # Value-RANGE window frame (trailing 30-day spend, tie-correct)
    (
        "customer_trailing_revenue",
        r.customer_trailing_revenue,
        r.ORACLE_customer_trailing_revenue,
    ),
    # CDC MERGE upsert + SCD2 history (operators/merge.py)
    ("orders_cdc_merge", cdc.orders_cdc_merge, cdc.ORACLE_orders_cdc_merge),
    ("orders_scd2", cdc.orders_scd2, cdc.ORACLE_orders_scd2),
    # Point-in-time (time-travel) read over the SCD2 history
    ("orders_asof_snapshot", cdc.orders_asof_snapshot, cdc.ORACLE_orders_asof_snapshot),
    # Product-quantization ANN (codebooks -> codes -> ADC top-k)
    ("knn_pq_adc", pq.knn_pq_adc, pq.ORACLE_knn_pq_adc),
    # Stream-static broadcast enrichment + stateless streaming curation twin
    ("stream_enrich_events", st.stream_enrich_events, st.ORACLE_stream_enrich_events),
    ("stream_quality_filter", st.stream_quality_filter, cu.ORACLE_corpus_quality_filter),
    # foreachBatch MERGE fold of a CDC stream == single-shot batch MERGE
    ("stream_cdc_merge", st.stream_cdc_merge, cdc.ORACLE_orders_cdc_merge),
    # Domain-mixture sampling plan (exact-int rates, scarcest source binds)
    ("corpus_mixture_plan", cu.corpus_mixture_plan, cu.ORACLE_corpus_mixture_plan),
    # Exact-integer PageRank over the symmetrized kNN graph
    ("knn_pagerank", d.knn_pagerank, d.ORACLE_knn_pagerank),
    # Interval-weighted avg_over_time (drifting scrape intervals, exact ints)
    (
        "metric_time_weighted_avg",
        m.metric_time_weighted_avg,
        m.ORACLE_metric_time_weighted_avg,
    ),
    # CSV wire-format ingestion with malformed-row quarantine
    ("csv_ingest", ing.csv_ingest, ing.ORACLE_csv_ingest),
    # Overlapping (sliding) window aggregation with exact distinct
    (
        "events_sliding_active_users",
        ax.events_sliding_active_users,
        ax.ORACLE_events_sliding_active_users,
    ),
    # Streaming twin: overlapping-window state merged across micro-batches
    (
        "stream_sliding_active_users",
        st.stream_sliding_active_users,
        ax.ORACLE_events_sliding_active_users,
    ),
    # Round-6 skew-guard twin: salted first-level (window,user) partials,
    # identical output checked against the SAME oracle
    (
        "events_sliding_active_users_salted",
        ax.events_sliding_active_users_salted,
        ax.ORACLE_events_sliding_active_users,
    ),
    # Asymmetric containment near-dup (short-doc-inside-long-doc rule)
    (
        "dedup_containment_pairs",
        d.dedup_containment_pairs,
        d.ORACLE_dedup_containment_pairs,
    ),
    # ------------------------------------------------------------------
    # Block 0 — r03 hash mismatches, now fixed (DuckDB window SUM returns
    # HUGEINT; the oracle SQL casts back to BIGINT so the driver-side fetch
    # encodes identically to Spark's LongType). These are the only five
    # registry entries without a green CORRECTNESS row — lead the gate.
    ("sessionize_events", pl.sessionize_events, pl.ORACLE_sessionize_events),
    ("corpus_pack", pl.corpus_pack, pl.ORACLE_corpus_pack),
    ("prepare_training_set", pl.prepare_training_set, pl.ORACLE_prepare_training_set),
    (
        "prepare_training_set_v2",
        cu.prepare_training_set_v2,
        cu.ORACLE_prepare_training_set_v2,
    ),
    (
        "sessionize_presplit_events",
        pl.sessionize_presplit_events,
        pl.ORACLE_sessionize_events,
    ),
    # ------------------------------------------------------------------
    # Block 1 — round-4 additions (keep inside the gate's first-50 window).
    # Streaming twins of the reference's core ingest + analytics paths,
    # each gated on the IDENTICAL batch oracle (streaming↔batch
    # mergeability of rollup / top-N state)
    ("stream_rollup_minute", st.stream_rollup_minute, q.ORACLE_qan_rollup_minute),
    ("stream_top_digests", st.stream_top_digests, q.ORACLE_qan_top_digests),
    # Relational breadth: Q8-shaped market share, Q4-shaped EXISTS semi-join
    ("nation_market_share", r.nation_market_share, r.ORACLE_nation_market_share),
    ("late_shipment_orders", r.late_shipment_orders, r.ORACLE_late_shipment_orders),
    # ------------------------------------------------------------------
    # Block 2 — official green row already on record (r01/r02/r03).
    # Training-data pipeline: multimodal binary plumbing (pandas decode)
    ("media_features", d.media_features, d.ORACLE_media_features),
    ("media_frame_sample", d.media_frame_sample, d.ORACLE_media_frame_sample),
    ("media_resize", d.media_resize, d.ORACLE_media_resize),
    ("media_resample_audio", d.media_resample_audio, d.ORACLE_media_resample_audio),
    # Training-data pipeline: corpus management (splits/sampling/sessions/packing)
    ("corpus_split", pl.corpus_split, pl.ORACLE_corpus_split),
    ("corpus_sample", pl.corpus_sample, pl.ORACLE_corpus_sample),
    ("session_window_stats", pl.session_window_stats, pl.ORACLE_session_window_stats),
    # Training-data pipeline: corpus curation (decontamination / repetition /
    # PII / balanced sampling / vocabulary)
    ("corpus_decontaminate", cu.corpus_decontaminate, cu.ORACLE_corpus_decontaminate),
    ("text_repetition_stats", cu.text_repetition_stats, cu.ORACLE_text_repetition_stats),
    ("pii_scan_redact", cu.pii_scan_redact, cu.ORACLE_pii_scan_redact),
    (
        "corpus_stratified_sample",
        cu.corpus_stratified_sample,
        cu.ORACLE_corpus_stratified_sample,
    ),
    (
        "corpus_weighted_sample",
        cu.corpus_weighted_sample,
        cu.ORACLE_corpus_weighted_sample,
    ),
    ("vocab_build", cu.vocab_build, cu.ORACLE_vocab_build),
    ("bpe_merges", bq.bpe_merges, bq.ORACLE_bpe_merges),
    ("bpe_encode_stats", bq.bpe_encode_stats, bq.ORACLE_bpe_encode_stats),
    ("corpus_tile_dedup", cu.corpus_tile_dedup, cu.ORACLE_corpus_tile_dedup),
    ("text_surprisal", cu.text_surprisal, cu.ORACLE_text_surprisal),
    ("curation_report", cu.curation_report, cu.ORACLE_curation_report),
    # Training-data pipeline: embedding clustering (quantized Lloyd k-means)
    ("embedding_kmeans", km.embedding_kmeans, km.ORACLE_embedding_kmeans),
    # Streaming stateful delta (applyInPandasWithState) vs batch-lag oracle
    ("stream_snapshot_delta", st.stream_snapshot_delta, st.ORACLE_stream_snapshot_delta),
    # Stream-stream interval join vs the BATCH range-join oracle (equivalence)
    ("stream_range_join", st.stream_range_join, tj.ORACLE_events_range_join),
    # ------------------------------------------------------------------
    # (round-3 additions — green rows in CORRECTNESS_r03)
    # Behavior analytics over events (funnel / cohort retention)
    ("events_funnel", bh.events_funnel, bh.ORACLE_events_funnel),
    ("events_retention", bh.events_retention, bh.ORACLE_events_retention),
    # Corpus curation: composite quality gate + language mixture report
    ("corpus_quality_filter", cu.corpus_quality_filter, cu.ORACLE_corpus_quality_filter),
    (
        "corpus_language_mixture",
        cu.corpus_language_mixture,
        cu.ORACLE_corpus_language_mixture,
    ),
    # Rank-distribution analytics + partitioned running total
    ("qan_percent_rank", ax.qan_percent_rank, ax.ORACLE_qan_percent_rank),
    (
        "customer_cumulative_spend",
        r.customer_cumulative_spend,
        r.ORACLE_customer_cumulative_spend,
    ),
    # kNN graph construction (degree histogram over the exact subgraph)
    ("knn_graph_degree", d.knn_graph_degree, d.ORACLE_knn_graph_degree),
    # Scale-variant twins checked against the SAME oracles as their plain
    # counterparts (the mitigation cannot drift from the semantics)
    ("dedup_clusters_ls", d.dedup_clusters_ls, d.ORACLE_dedup_clusters),
    (
        "events_asof_join_presplit",
        tj.events_asof_join_presplit,
        tj.ORACLE_events_asof_join,
    ),
    # Streaming native session_window vs the batch session oracle
    ("stream_session_stats", st.stream_session_stats, pl.ORACLE_session_window_stats),
    # Semi-structured JSON property analytics over events.props
    ("events_props_stats", ax.events_props_stats, ax.ORACLE_events_props_stats),
    # First-fit greedy packing vs a DuckDB RECURSIVE CTE of the same fold
    ("corpus_pack_greedy", pl.corpus_pack_greedy, pl.ORACLE_corpus_pack_greedy),
    # IVF ANN over the LEARNED k-means quantizer (composed Lloyd-CTE oracle)
    ("knn_ivf_kmeans", d.knn_ivf_kmeans, d.ORACLE_knn_ivf_kmeans),
    # Partial-rollup merge == full rollup (Druid rollup=true mergeability)
    ("qan_rollup_merge", q.qan_rollup_merge, q.ORACLE_qan_rollup_merge),
    # Streaming dedup of a doubled stream vs the batch distinct oracle
    ("stream_dedup_events", st.stream_dedup_events, st.ORACLE_stream_dedup_events),
    # Period-over-period movers + event-sequence transition mining
    ("qan_top_movers", ax.qan_top_movers, ax.ORACLE_qan_top_movers),
    ("events_user_paths", ax.events_user_paths, ax.ORACLE_events_user_paths),
    # Incremental (new-batch vs existing-corpus) near-dup detection
    ("dedup_incremental", d.dedup_incremental, d.ORACLE_dedup_incremental),
    # ------------------------------------------------------------------
    # (r01/r02 green rows)
    # QAN query shapes (SURVEY §2 — the reference's analytics surface)
    ("qan_top_digests", q.qan_top_digests, q.ORACLE_qan_top_digests),
    ("qan_top_digests_salted", q.qan_top_digests_salted, q.ORACLE_qan_top_digests_salted),
    ("qan_snapshot_delta", q.qan_snapshot_delta, q.ORACLE_qan_snapshot_delta),
    ("qan_rollup_minute", q.qan_rollup_minute, q.ORACLE_qan_rollup_minute),
    ("qan_trend_5m", q.qan_trend_5m, q.ORACLE_qan_trend_5m),
    ("qan_multi_metric_topn", q.qan_multi_metric_topn, q.ORACLE_qan_multi_metric_topn),
    ("qan_compare_systems", q.qan_compare_systems, q.ORACLE_qan_compare_systems),
    ("qan_hit_ratio_pivot", q.qan_hit_ratio_pivot, q.ORACLE_qan_hit_ratio_pivot),
    ("qan_distinct_metrics", q.qan_distinct_metrics, q.ORACLE_qan_distinct_metrics),
    ("qan_like_having", q.qan_like_having, q.ORACLE_qan_like_having),
    ("qan_load_score", q.qan_load_score, q.ORACLE_qan_load_score),
    ("qan_labels_json", q.qan_labels_json, q.ORACLE_qan_labels_json),
    ("qan_query_profile", q.qan_query_profile, q.ORACLE_qan_query_profile),
    # Exact countDistinct is the hash-checked contract; the HLL scale twin
    # (qan_unique_queries_hll) is pinned by a relative-error unit test.
    (
        "qan_unique_queries_approx",
        q.qan_unique_queries_approx,
        q.ORACLE_qan_unique_queries_approx,
    ),
    # Analytics-surface extensions: quantiles / anti-join / moving avg /
    # grouping sets / histogram
    ("qan_latency_quantiles", ax.qan_latency_quantiles, ax.ORACLE_qan_latency_quantiles),
    ("qan_new_digests", ax.qan_new_digests, ax.ORACLE_qan_new_digests),
    ("qan_moving_avg", ax.qan_moving_avg, ax.ORACLE_qan_moving_avg),
    ("qan_grouping_sets", ax.qan_grouping_sets, ax.ORACLE_qan_grouping_sets),
    ("qan_value_histogram", ax.qan_value_histogram, ax.ORACLE_qan_value_histogram),
    ("corpus_length_ntile", ax.corpus_length_ntile, ax.ORACLE_corpus_length_ntile),
    ("qan_anomaly_zscore", ax.qan_anomaly_zscore, ax.ORACLE_qan_anomaly_zscore),
    # S5: string-KV global-status scrape → typed pivot (adaptive sampler input)
    ("global_status_pivot", sq.global_status_pivot, sq.ORACLE_global_status_pivot),
    # S11: OTLP/JSON receiver parse (serialize → parse identity over events)
    ("otlp_metrics_parse", o.otlp_metrics_parse, o.ORACLE_otlp_metrics_parse),
    # JSONL corpus ingestion with corrupt-record quarantine
    ("jsonl_ingest", ing.jsonl_ingest, ing.ORACLE_jsonl_ingest),
    ("pysource_scan", ing.pysource_scan, ing.ORACLE_pysource_scan),
    # metrics_db analytics (A9/J2) over a synthesized long-metrics relation
    ("metric_series", m.metric_series, m.ORACLE_metric_series),
    ("buffer_hit_ratio", m.buffer_hit_ratio, m.ORACLE_buffer_hit_ratio),
    # Relational / workload-mix shapes (SURVEY §2.3 J3, §2.6)
    ("pricing_summary", r.pricing_summary, r.ORACLE_pricing_summary),
    ("top_revenue_orders", r.top_revenue_orders, r.ORACLE_top_revenue_orders),
    ("regional_revenue", r.regional_revenue, r.ORACLE_regional_revenue),
    ("customer_order_stats", r.customer_order_stats, r.ORACLE_customer_order_stats),
    ("cte_order_summary", r.cte_order_summary, r.ORACLE_cte_order_summary),
    # Temporal joins (as-of / binned range) — §2.3 extensions
    ("events_asof_join", tj.events_asof_join, tj.ORACLE_events_asof_join),
    ("events_range_join", tj.events_range_join, tj.ORACLE_events_range_join),
    # Training-data pipeline: text analysis (SURVEY §7.2 phase 5)
    ("text_token_stats", d.text_token_stats, d.ORACLE_text_token_stats),
    ("text_quality", d.text_quality, d.ORACLE_text_quality),
    ("text_lang_id", d.text_lang_id, d.ORACLE_text_lang_id),
    ("text_fingerprint", d.text_fingerprint, d.ORACLE_text_fingerprint),
    ("text_tfidf_topk", d.text_tfidf_topk, d.ORACLE_text_tfidf_topk),
    # Training-data pipeline: deduplication
    ("dedup_exact", d.dedup_exact, d.ORACLE_dedup_exact),
    ("dedup_minhash_lsh", d.dedup_minhash_lsh, d.ORACLE_dedup_minhash_lsh),
    ("dedup_simhash", d.dedup_simhash, d.ORACLE_dedup_simhash),
    ("dedup_simhash_pairs", d.dedup_simhash_pairs, d.ORACLE_dedup_simhash_pairs),
    ("dedup_ngram_pairs", d.dedup_ngram_pairs, d.ORACLE_dedup_ngram_pairs),
    ("dedup_embedding_cosine", d.dedup_embedding_cosine, d.ORACLE_dedup_embedding_cosine),
    ("dedup_clusters", d.dedup_clusters, d.ORACLE_dedup_clusters),
    ("dedup_canonical", d.dedup_canonical, d.ORACLE_dedup_canonical),
    # Training-data pipeline: similarity search
    ("knn_brute", d.knn_brute, d.ORACLE_knn_brute),
    ("knn_lsh", d.knn_lsh, d.ORACLE_knn_lsh),
    ("knn_ivf", d.knn_ivf, d.ORACLE_knn_ivf),
    # Round-6: the parameterized LSH geometry exercised at bits=8 (256
    # buckets) against an oracle generated from the same plane matrix
    ("knn_lsh_scaled", d.knn_lsh_scaled, d.ORACLE_knn_lsh_scaled),
    # Round-6 relational breadth: the remaining classic TPC-H shapes the
    # testdata's columns can express (Q6/Q9/Q11/Q12/Q16/Q21)
    ("forecast_revenue", r.forecast_revenue, r.ORACLE_forecast_revenue),
    ("nation_year_profit", r.nation_year_profit, r.ORACLE_nation_year_profit),
    ("major_suppliers", r.major_suppliers, r.ORACLE_major_suppliers),
    ("late_priority_lines", r.late_priority_lines, r.ORACLE_late_priority_lines),
    (
        "part_supplier_variety",
        r.part_supplier_variety,
        r.ORACLE_part_supplier_variety,
    ),
    ("sole_late_suppliers", r.sole_late_suppliers, r.ORACLE_sole_late_suppliers),
    # Round-6: CDC feed generation (inverse MERGE) + minute-grid gap fill
    ("orders_snapshot_diff", cdc.orders_snapshot_diff, cdc.ORACLE_orders_snapshot_diff),
    ("metric_gap_fill", m.metric_gap_fill, m.ORACLE_metric_gap_fill),
    # Round-6 scale-variant twin: per-(series, day) presplit lead windows,
    # identical output checked against the SAME oracle
    (
        "metric_time_weighted_avg_presplit",
        m.metric_time_weighted_avg_presplit,
        m.ORACLE_metric_time_weighted_avg,
    ),
    # Round-7 scale-variant twin: per-(series, period) gap-fill windows +
    # boundary stitch, identical output checked against the SAME oracle
    (
        "metric_gap_fill_presplit",
        m.metric_gap_fill_presplit,
        m.ORACLE_metric_gap_fill,
    ),
    # Round-7: overlapping character chunking (RAG/embedding-index prep)
    ("corpus_chunk", pl.corpus_chunk, pl.ORACLE_corpus_chunk),
    # Round-7: per-doc OOV rate vs the capped vocab (tokenizer coverage)
    ("corpus_oov_rate", cu.corpus_oov_rate, cu.ORACLE_corpus_oov_rate),
    # Round-7: Z-order layout key (quantize+interleave, engine-neutral)
    ("orders_zorder_stats", lay.orders_zorder_stats, lay.ORACLE_orders_zorder_stats),
    # Round-7: declarative data-quality gate (one-pass conditional aggs)
    ("orders_dq_report", lay.orders_dq_report, lay.ORACLE_orders_dq_report),
    # Round-7: hour-from-minute rollup cascade vs a raw-derived oracle
    ("qan_rollup_cascade", q.qan_rollup_cascade, q.ORACLE_qan_rollup_cascade),
    # Round-7: frozen-quantizer incremental IVF (batch append, no retrain)
    ("knn_ivf_incremental", d.knn_ivf_incremental, d.ORACLE_knn_ivf_incremental),
    # Round-7: hashed-gram jaccard scale twin (same oracle)
    (
        "dedup_ngram_pairs_hashed",
        d.dedup_ngram_pairs_hashed,
        d.ORACLE_dedup_ngram_pairs_full,
    ),
    # Round-7: stateless streaming chunking twin (same oracle as batch)
    ("stream_chunk", st.stream_chunk, pl.ORACLE_corpus_chunk),
    # Round-6: mergeSchema read over evolved parquet generations
    (
        "corpus_schema_evolution",
        ing.corpus_schema_evolution,
        ing.ORACLE_corpus_schema_evolution,
    ),
    # Round-6: label-free embedding near-dup (sign-LSH bucket blocks)
    ("dedup_embedding_lsh", d.dedup_embedding_lsh, d.ORACLE_dedup_embedding_lsh),
    # Round-8: sweep-line interval concurrency (new operator class)
    ("events_interval_peak", ax.events_interval_peak, ax.ORACLE_events_interval_peak),
    # Round-8: robust median/MAD anomaly flags (exact dyadic arithmetic)
    ("qan_anomaly_mad", ax.qan_anomaly_mad, ax.ORACLE_qan_anomaly_mad),
    # Round-8: posting-list inverted index (capped-before-buffering)
    (
        "corpus_inverted_index",
        d.corpus_inverted_index,
        d.ORACLE_corpus_inverted_index,
    ),
    # Round-8: blocked edit-distance entity resolution
    (
        "customer_entity_match",
        d.customer_entity_match,
        d.ORACLE_customer_entity_match,
    ),
    # Round-8: embedding-cosine benchmark decontamination
    (
        "corpus_decontaminate_embedding",
        cu.corpus_decontaminate_embedding,
        cu.ORACLE_corpus_decontaminate_embedding,
    ),
    # Round-8: per-group 2-D Pareto frontier (skyline, join-free)
    (
        "part_pareto_frontier",
        r.part_pareto_frontier,
        r.ORACLE_part_pareto_frontier,
    ),
    # ------------------------------------------------------------------
    # Block R8b — late round-8 additions.  These lead `_GATE_PRIORITY`
    # together with the early-round-8 block (unrecorded-first invariant);
    # the remaining gate slots re-record the r05 cohort.  All are
    # oracle-checked locally (scripts/oracle_check.py) from day one.
    # B1 upgrade: exchange-free bucketed fact-fact join, oracle-gated
    (
        "orders_bucketed_join",
        lay.orders_bucketed_join,
        lay.ORACLE_orders_bucketed_join,
    ),
    # A26: OHLC candle downsample + its arrival-order-independent
    # streaming twin (min/max over struct(time, v) == the batch tiebreak)
    ("metric_ohlc", m.metric_ohlc, m.ORACLE_metric_ohlc),
    ("stream_ohlc", st.stream_ohlc, m.ORACLE_metric_ohlc),
    # HH1: two-pass exact heavy hitters (sketch-pruned candidate shuffle)
    (
        "events_heavy_hitters",
        ax.events_heavy_hitters,
        ax.ORACLE_events_heavy_hitters,
    ),
    # G2: degree-ordered triangle enumeration on the kNN graph
    ("knn_triangles", d.knn_triangles, d.ORACLE_knn_triangles),
    # Q15: Expand-free exact column profiling (melt + two-level agg)
    ("orders_profile", lay.orders_profile, lay.ORACLE_orders_profile),
    # A28: last-touch attribution (one-window carry-forward, no range join)
    ("events_attribution", bh.events_attribution, bh.ORACLE_events_attribution),
    # A29: interval coalescing into islands (one-shuffle cover spans)
    (
        "events_interval_merge",
        ax.events_interval_merge,
        ax.ORACLE_events_interval_merge,
    ),
    # V2: order-independent snapshot fingerprint (replication parity check)
    ("orders_checksum", lay.orders_checksum, lay.ORACLE_orders_checksum),
    # A30: exact weighted median (single-exchange windowed prefix weights)
    (
        "lineitem_weighted_median",
        r.lineitem_weighted_median,
        r.ORACLE_lineitem_weighted_median,
    ),
    # A31: contingency + per-cell chi-square independence screen
    ("events_chisq", ax.events_chisq, ax.ORACLE_events_chisq),
    # J16: merge-on-read CDC (delta-file fold ≡ sequential MERGE)
    ("orders_mor_merge", cdc.orders_mor_merge, cdc.ORACLE_orders_mor_merge),
    # A32: PSI distribution-drift report (fixed-bin, one-scan)
    ("orders_drift_psi", ax.orders_drift_psi, ax.ORACLE_orders_drift_psi),
    # Q16: join-key skew diagnostic (log2 frequency histogram)
    ("events_skew_report", ax.events_skew_report, ax.ORACLE_events_skew_report),
    # A33: seasonal-baseline residual anomalies (broadcast hour profile)
    (
        "metric_seasonal_outliers",
        ax.metric_seasonal_outliers,
        ax.ORACLE_metric_seasonal_outliers,
    ),
    # S13: ORC columnar round-trip (type fidelity across the format boundary)
    ("orc_ingest", ing.orc_ingest, ing.ORACLE_orc_ingest),
    # N12: ANN recall@k audit (LSH vs exact ground truth, exact ppm)
    ("knn_recall_report", d.knn_recall_report, d.ORACLE_knn_recall_report),
    # D15: MinHash-LSH recall audit vs exact all-pairs Jaccard truth
    ("dedup_recall_report", d.dedup_recall_report, d.ORACLE_dedup_recall_report),
    # A34: SRE multi-window error-budget burn-rate alert (exact-int rates)
    ("qan_burn_rate", q.qan_burn_rate, q.ORACLE_qan_burn_rate),
    # O5: top-N + 'other' rollup (100%-accounting dashboard contract)
    (
        "qan_top_digests_other",
        q.qan_top_digests_other,
        q.ORACLE_qan_top_digests_other,
    ),
    # D16: prefix-filter EXACT-COMPLETE threshold Jaccard join (the
    # exactness counterpart to MinHash-LSH on the same shingle space)
    ("dedup_prefix_pairs", d.dedup_prefix_pairs, d.ORACLE_dedup_prefix_pairs),
    # A35: exact KS two-sample statistic (binning-free drift screen)
    ("events_ks_test", ax.events_ks_test, ax.ORACLE_events_ks_test),
    # J17: explicit Bloom runtime-filter join (plain-join oracle — the
    # no-false-negative property made bit-exact)
    ("orders_bloom_join", lay.orders_bloom_join, lay.ORACLE_orders_bloom_join),
    # A36: exact OLS trend slope per metric series (min-centered moments)
    ("metric_trend_slope", m.metric_trend_slope, m.ORACLE_metric_trend_slope),
    # N13: JL sign-projection dim reduction + recall audit vs full space
    ("knn_rp_recall", d.knn_rp_recall, d.ORACLE_knn_rp_recall),
    # A37: exact Pearson correlation matrix over aligned metric pairs
    ("metric_corr_matrix", m.metric_corr_matrix, m.ORACLE_metric_corr_matrix),
    # A39: exact trailing-window (lower) median smoother per series
    (
        "metric_rolling_median",
        m.metric_rolling_median,
        m.ORACLE_metric_rolling_median,
    ),
    # A43: two-sided CUSUM drift statistic (closed-form prefix-extrema
    # re-expression of the non-associative textbook recursion)
    ("metric_cusum", m.metric_cusum, m.ORACLE_metric_cusum),
    # A44: anchored-window sequence funnel (windowFunnel semantics;
    # greedy-earliest provably complete under the fixed deadline)
    (
        "events_sequence_funnel",
        bh.events_sequence_funnel,
        bh.ORACLE_events_sequence_funnel,
    ),
    # A45: LTTB-style plot downsample (mean-anchor variant, exact-int
    # triangle argmax)
    ("metric_lttb", m.metric_lttb, m.ORACLE_metric_lttb),
    # A46: Apdex satisfaction index (exact milli units)
    ("qan_apdex", ax.qan_apdex, ax.ORACLE_qan_apdex),
    # A47: Gini revenue concentration (distinct-value rank-sum fold;
    # the naive ranked formula is the oracle, equality proves the fold)
    ("customer_gini", ax.customer_gini, ax.ORACLE_customer_gini),
    # A40: first-order behavior transition matrix (exact ppm rows)
    (
        "events_markov_transitions",
        bh.events_markov_transitions,
        bh.ORACLE_events_markov_transitions,
    ),
    # A41: RFM quintile scoring over the reduced per-customer relation
    (
        "customer_rfm_scores",
        ax.customer_rfm_scores,
        ax.ORACLE_customer_rfm_scores,
    ),
    # A42: ABC/Pareto revenue classification (cross-multiplied int shares)
    (
        "lineitem_abc_class",
        ax.lineitem_abc_class,
        ax.ORACLE_lineitem_abc_class,
    ),
    # Q17: Benford first-digit conformance screen (shared ppm constants)
    ("orders_benford", ax.orders_benford, ax.ORACLE_orders_benford),
    # X20: collocation mining by exact integer lift (log-free PMI rank)
    ("corpus_bigram_pmi", d.corpus_bigram_pmi, d.ORACLE_corpus_bigram_pmi),
    # G4: deterministic label-propagation communities (unrolled rounds)
    ("knn_communities", d.knn_communities, d.ORACLE_knn_communities),
    # X19: k-anonymity risk report over a quasi-identifier tuple
    ("events_k_anonymity", cu.events_k_anonymity, cu.ORACLE_events_k_anonymity),
    # C23: streaming KS drift twin (drained complete-mode state; oracle =
    # the batch A35 SQL -> streaming<->batch equivalence)
    ("stream_ks_test", st.stream_ks_test, ax.ORACLE_events_ks_test),
    # T17 live twin: drained superseding-versioned discovery state must
    # equal the batch A38 plan (streaming <-> batch equivalence)
    (
        "stream_discovery_timeline",
        st.stream_discovery_timeline,
        bh.ORACLE_events_discovery_timeline,
    ),
    # T13 live twin: drained canonical island state vs the batch A29
    # sweep — arrival-order independence of the interval splice
    (
        "stream_islands",
        st.stream_islands,
        ax.ORACLE_events_interval_merge,
    ),
    # T14 gated at the exact-capacity operating point: no eviction ->
    # Space-Saving ≡ COUNT GROUP BY (err_bound=0 rides in the hash)
    (
        "stream_topk_exact",
        st.stream_topk_exact,
        st.ORACLE_stream_topk_exact,
    ),
    # A38: per-user discovery timeline (exact running-distinct breakpoints)
    (
        "events_discovery_timeline",
        bh.events_discovery_timeline,
        bh.ORACLE_events_discovery_timeline,
    ),
    # D17: provably complete near-dup clusters (D16 edges + D6 closure)
    (
        "dedup_prefix_clusters",
        d.dedup_prefix_clusters,
        d.ORACLE_dedup_prefix_clusters,
    ),
    # D18: verbatim repeated k-token spans (distributed stand-in for
    # suffix-array substring dedup, Lee et al. 2022)
    ("corpus_dup_spans", d.corpus_dup_spans, d.ORACLE_corpus_dup_spans),
    # D19: per-doc duplicated-span coverage over hashed windows (ppm)
    (
        "corpus_dup_span_coverage",
        d.corpus_dup_span_coverage,
        d.ORACLE_corpus_dup_span_coverage,
    ),
    # Q18: DSIR-style hashed-ngram importance weights (exact-int lift)
    ("corpus_dsir_weights", d.corpus_dsir_weights, d.ORACLE_corpus_dsir_weights),
    # C24: fixed-k priority sampling (budgeted weighted curation)
    (
        "corpus_priority_sample",
        cu.corpus_priority_sample,
        cu.ORACLE_corpus_priority_sample,
    ),
    # A48: per-series autocorrelation at lags 1..5 (bucket-grid exact)
    ("metric_acf", m.metric_acf, m.ORACLE_metric_acf),
    # T18: streaming deterministic-KLL quantiles, gated where the
    # ladder never compacts (sketch == sorted sample == SQL rank)
    (
        "stream_quantiles_exact",
        st.stream_quantiles_exact,
        st.ORACLE_stream_quantiles_exact,
    ),
    # D20: substring-dedup rewrite (excise non-canonical dup spans)
    ("corpus_excise_spans", d.corpus_excise_spans, d.ORACLE_corpus_excise_spans),
    # A49: full CUBE + grouping_id (multi-dim companion to the ROLLUP)
    ("orders_cube", ax.orders_cube, ax.ORACLE_orders_cube),
    # D21: span-level benchmark decontamination (which spans, where)
    (
        "corpus_decontaminate_spans",
        d.corpus_decontaminate_spans,
        d.ORACLE_corpus_decontaminate_spans,
    ),
    # T19: streaming priority sample — keep-k-smallest is a commutative
    # fold, so the drained state gates against the BATCH C24 oracle
    (
        "stream_priority_sample",
        st.stream_priority_sample,
        cu.ORACLE_corpus_priority_sample,
    ),
    # G6: per-node clustering coefficient (triangles / degree pairs)
    (
        "knn_clustering_coeff",
        d.knn_clustering_coeff,
        d.ORACLE_knn_clustering_coeff,
    ),
    # A50: funnel inter-stage latency order statistics
    (
        "events_funnel_latency",
        bh.events_funnel_latency,
        bh.ORACLE_events_funnel_latency,
    ),
    # N14: MMR diversity re-ranking over the exact candidate pool
    ("knn_mmr", d.knn_mmr, d.ORACLE_knn_mmr),
    # W3 gated: the governor EWMA recursion folded batch-side, proving
    # the float recursion cross-engine (previously unit-only)
    ("metric_ewma", m.metric_ewma, m.ORACLE_metric_ewma),
    # ------------------------------------------------------------------
    # Block R10 — round-10 additions (no official row yet — the derived
    # sort puts them in front automatically).
    # G5 gated: 2-core peel over the verified near-dup pair graph,
    # unrolled fixed-round DuckDB oracle (idempotent past fixpoint)
    ("dedup_kcore", d.dedup_kcore, d.ORACLE_dedup_kcore),
    # Q2/Q20-shaped: the last two classic TPC-H join shapes (partsupp
    # reshaped onto lineitem — exact-int unit price / majority share)
    ("min_cost_supplier", r.min_cost_supplier, r.ORACLE_min_cost_supplier),
    ("dominant_suppliers", r.dominant_suppliers, r.ORACLE_dominant_suppliers),
    # A51-A53: robust/regime/forecast trend ladder over the hour grid
    ("metric_theil_sen", m.metric_theil_sen, m.ORACLE_metric_theil_sen),
    ("metric_changepoint", m.metric_changepoint, m.ORACLE_metric_changepoint),
    # A53 gates the COUPLED two-state float recursion (Holt level+trend)
    ("metric_holt", m.metric_holt, m.ORACLE_metric_holt),
    # G7: shared-nearest-neighbor edge strength (wedge-bounded)
    ("knn_snn_strength", d.knn_snn_strength, d.ORACLE_knn_snn_strength),
    # N15: per-dimension embedding distribution profile (exact micro-units)
    ("embedding_dim_stats", d.embedding_dim_stats, d.ORACLE_embedding_dim_stats),
    # X21: conditional bigram surprisal (word-order fluency)
    (
        "text_bigram_surprisal",
        cu.text_bigram_surprisal,
        cu.ORACLE_text_bigram_surprisal,
    ),
    # A54: acquisition-cohort revenue/LTV matrix
    (
        "customer_cohort_revenue",
        ax.customer_cohort_revenue,
        ax.ORACLE_customer_cohort_revenue,
    ),
    # T20: ordered-sequence state — the first ORDER-DEPENDENT streaming
    # fold, gated on the batch A40 oracle (merge-sorted state makes the
    # drain arrival-order independent)
    (
        "stream_markov_transitions",
        st.stream_markov_transitions,
        bh.ORACLE_events_markov_transitions,
    ),
    # T21: second consumer of the ordered-sequence state — the A44
    # anchored funnel live, gated on the batch funnel oracle
    (
        "stream_sequence_funnel",
        st.stream_sequence_funnel,
        bh.ORACLE_events_sequence_funnel,
    ),
    # A55: Wald-Wolfowitz runs test (nonparametric randomness screen)
    ("metric_runs_test", m.metric_runs_test, m.ORACLE_metric_runs_test),
    # A56: event-type co-occurrence lift over user baskets
    (
        "events_type_affinity",
        bh.events_type_affinity,
        bh.ORACLE_events_type_affinity,
    ),
    # N16: integer reciprocal-rank fusion of the LSH + IVF indexes
    ("knn_rrf_fusion", d.knn_rrf_fusion, d.ORACLE_knn_rrf_fusion),
    # T22: third consumer of the ordered-sequence state — gap sessions
    # live with revision semantics, gated on the batch A25 oracle
    ("stream_sessionize", st.stream_sessionize, pl.ORACLE_sessionize_events),
    # N17: exact integer cross-moment (Gram) matrix — the PCA/whitening
    # input computed distributed, eigen-solve stays control-plane
    (
        "embedding_crossmoments",
        d.embedding_crossmoments,
        d.ORACLE_embedding_crossmoments,
    ),
    # X22: Flesch-shaped readability from exact integer counts
    ("text_readability", cu.text_readability, cu.ORACLE_text_readability),
    # A57: per-brand demand slope (exact-moment OLS on pricing)
    (
        "brand_price_elasticity",
        r.brand_price_elasticity,
        r.ORACLE_brand_price_elasticity,
    ),
    # G8: whole-graph degree assortativity (born-bounded moments)
    ("knn_assortativity", d.knn_assortativity, d.ORACLE_knn_assortativity),
    # T23: the order-reconstruction idea extended to FLOAT recursions —
    # streaming dual-EWMA gated on the batch W3 oracle
    ("stream_ewma", st.stream_ewma, m.ORACLE_metric_ewma),
    # C25: packing-efficiency dashboard over the gated C4 packer
    (
        "corpus_pack_efficiency",
        pl.corpus_pack_efficiency,
        pl.ORACLE_corpus_pack_efficiency,
    ),
    # R25: market-basket part affinity with a support floor
    (
        "orders_basket_affinity",
        r.orders_basket_affinity,
        r.ORACLE_orders_basket_affinity,
    ),
    # X23: Heaps-law vocabulary growth curve at /16 checkpoints
    ("vocab_growth", cu.vocab_growth, cu.ORACLE_vocab_growth),
    # A58: DAU / trailing-30d MAU stickiness (exact overlapping distinct)
    (
        "events_stickiness",
        bh.events_stickiness,
        bh.ORACLE_events_stickiness,
    ),
    # D22: Jaccard operating curve from one verified candidate pass
    (
        "dedup_threshold_sweep",
        d.dedup_threshold_sweep,
        d.ORACLE_dedup_threshold_sweep,
    ),
    # A59: second-order path structure the first-order matrix hides
    (
        "events_trigram_paths",
        bh.events_trigram_paths,
        bh.ORACLE_events_trigram_paths,
    ),
    # N18: farthest-from-centroid vectors (exact int distance², N15 composed)
    ("embedding_outliers", d.embedding_outliers, d.ORACLE_embedding_outliers),
    # D23: family-size histogram over the gated D6 clusters
    (
        "dedup_family_histogram",
        d.dedup_family_histogram,
        d.ORACLE_dedup_family_histogram,
    ),
    # ------------------------------------------------------------------
    # Block R10b — late round-10 additions (no official row yet).
    # TPC-H Q19-shaped disjunctive brackets + purchase-cadence histogram
    (
        "lineitem_disjunctive_revenue",
        r.lineitem_disjunctive_revenue,
        r.ORACLE_lineitem_disjunctive_revenue,
    ),
    ("customer_order_gaps", r.customer_order_gaps, r.ORACLE_customer_order_gaps),
    # Arrival burstiness (Fano) + Simpson behavioral diversity
    ("events_burstiness", bh.events_burstiness, bh.ORACLE_events_burstiness),
    (
        "events_user_diversity",
        bh.events_user_diversity,
        bh.ORACLE_events_user_diversity,
    ),    # Signed-lag cross-correlation (lead/lag) + days-to-threshold forecast
    ("metric_xcorr", m.metric_xcorr, m.ORACLE_metric_xcorr),
    (
        "metric_days_to_threshold",
        m.metric_days_to_threshold,
        m.ORACLE_metric_days_to_threshold,
    ),
    # ------------------------------------------------------------------
    # Block R10c — final round-10 additions (no official row yet).
    # A64: Mann-Whitney rank-sum drift test (the rank member of the
    # PSI/chi-square/KS drift family)
    ("events_mannwhitney", ax.events_mannwhitney, ax.ORACLE_events_mannwhitney),
    # A65: Kendall tau-b monotone-association matrix (rank twin of A37)
    ("metric_kendall_tau", m.metric_kendall_tau, m.ORACLE_metric_kendall_tau),
    # A66: Pettitt rank-based change point (robust twin of A52)
    ("metric_pettitt", m.metric_pettitt, m.ORACLE_metric_pettitt),
    # A67: cross-instance quantile normalization (batch-effect correction)
    (
        "metric_quantile_normalize",
        m.metric_quantile_normalize,
        m.ORACLE_metric_quantile_normalize,
    ),
    # T24: streaming as-of join over two-sided order-reconstructing state,
    # gated on the BATCH DuckDB-native-ASOF oracle
    ("stream_asof_join", st.stream_asof_join, tj.ORACLE_events_asof_join),
    # ------------------------------------------------------------------
    # Block R11 — round-11 registrations, STAGED per the r10 verdict's
    # gate-window arithmetic (Next #2 option b): the r10 queue held eight
    # operators but 50 registry rows' newest green is r06, so registering
    # all eight would displace eight stale-row refreshes to r12.  Five
    # register now (the two the verdict names as highest-information —
    # stream_pettitt, the first LIVE rank-recursion gate, and
    # metric_spearman, completing the association triad — plus the other
    # three metrics/relational family extensions); the remaining three
    # (text_zipf_octaves, knn_reciprocity, events_session_entry_exit)
    # stay in scripts/check_queued.py for r12, leaving 45 slots for the
    # r06 cohort this round.  All five were EXACT at sf0.01+sf0.1 via
    # check_queued.py on registration day (r10 session 4 + re-proven by
    # the r10 judge's independent rerun).
    # A68: Spearman rank correlation matrix (rank twin of A37 Pearson)
    ("metric_spearman", m.metric_spearman, m.ORACLE_metric_spearman),
    # A69: Mann-Kendall monotone trend test (rank twin of A51 Theil-Sen)
    ("metric_mann_kendall", m.metric_mann_kendall, m.ORACLE_metric_mann_kendall),
    # A72: Bollinger exact-int band-breakout detector
    ("metric_bollinger", m.metric_bollinger, m.ORACLE_metric_bollinger),
    # A70: Kaplan-Meier repurchase survival with right-censoring
    ("orders_kaplan_meier", r.orders_kaplan_meier, r.ORACLE_orders_kaplan_meier),
    # T25: streaming Pettitt over order-reconstructing state, gated on
    # the BATCH A66 oracle (rank statistics live)
    ("stream_pettitt", st.stream_pettitt, m.ORACLE_metric_pettitt),
    # ------------------------------------------------------------------
    # Block R12 — round-12 registrations: the FULL queue drain.  The r11
    # verdict (Next #1) prescribed registering all 27 check_queued-proven
    # operators at once — the rotation's unrecorded-first rule gives every
    # one an official green row in CORRECTNESS_r12 itself, and the
    # one-round displacement of stale-row refreshes is cheap because the
    # closing harness re-proves all registered rows bit-exact every round
    # anyway.  All 27 were EXACT at sf0.01 AND sf0.1 via check_queued.py
    # on registration day (r12 session 1, recorded in SCALE.md), incl.
    # events_mix_drift whose both-SF proof the r11 ADVICE asked for.
    # X26 (renumbered from the colliding X24*): Zipf rank-octave profile
    ("text_zipf_octaves", cu.text_zipf_octaves, cu.ORACLE_text_zipf_octaves),
    # G9: kNN-graph reciprocity (directed->mutual edge fraction)
    ("knn_reciprocity", d.knn_reciprocity, d.ORACLE_knn_reciprocity),
    # A71: session entry/exit page profile (rn=1 two-sided reads)
    (
        "events_session_entry_exit",
        pl.events_session_entry_exit,
        pl.ORACLE_events_session_entry_exit,
    ),
    # A73: customer RFM via bucket-refinement order statistics
    ("customer_rfm", bh.customer_rfm, bh.ORACLE_customer_rfm),
    # R28: TPC-H Q16 reshape (supplier counts w/ broadcast anti deny-list)
    ("part_supplier_counts", r.part_supplier_counts, r.ORACLE_part_supplier_counts),
    # R29: TPC-H Q13 reshape (zero-bucket-preserving order histogram)
    (
        "customer_order_histogram",
        r.customer_order_histogram,
        r.ORACLE_customer_order_histogram,
    ),
    # A74: seasonal hour-of-day metric profile
    ("metric_seasonal_hod", m.metric_seasonal_hod, m.ORACLE_metric_seasonal_hod),
    # X27: first-occurrence gram novelty (60-bit hashed grams)
    ("text_gram_novelty", cu.text_gram_novelty, cu.ORACLE_text_gram_novelty),
    # T26: streaming Bollinger bands vs the batch A72 oracle
    ("stream_bollinger", st.stream_bollinger, m.ORACLE_metric_bollinger),
    # A75: maximum drawdown (running-peak window, retention-bounded)
    ("metric_drawdown", m.metric_drawdown, m.ORACLE_metric_drawdown),
    # R30: TPC-H Q11 reshape (mean-relative value concentration)
    (
        "part_value_concentration",
        r.part_value_concentration,
        r.ORACLE_part_value_concentration,
    ),
    # X25: lang-ID confusion matrix audit (≤|langs|² groups)
    ("lang_id_confusion", d.lang_id_confusion, d.ORACLE_lang_id_confusion),
    # D24: sorted-neighborhood dedup candidates (|docs|·w hard-linear)
    (
        "dedup_sorted_neighborhood",
        d.dedup_sorted_neighborhood,
        d.ORACLE_dedup_sorted_neighborhood,
    ),
    # T27: streaming max-drawdown vs the batch A75 oracle
    ("stream_drawdown", st.stream_drawdown, m.ORACLE_metric_drawdown),
    # G10: common-neighbor link prediction (integer resource allocation)
    ("knn_link_prediction", d.knn_link_prediction, d.ORACLE_knn_link_prediction),
    # D25: edit-distance verify over SNM candidates (JVM levenshtein)
    ("dedup_edit_distance", d.dedup_edit_distance, d.ORACLE_dedup_edit_distance),
    # A76: customer ABC/Pareto classes (bucket-refinement, no global sort)
    ("customer_abc", bh.customer_abc, bh.ORACLE_customer_abc),
    # T28: streaming Mann-Whitney drift vs the batch A64 oracle
    ("stream_mannwhitney", st.stream_mannwhitney, ax.ORACLE_events_mannwhitney),
    # G11: bounded h-hop reachability (frontier DISTINCT between rounds)
    (
        "knn_khop_reachability",
        d.knn_khop_reachability,
        d.ORACLE_knn_khop_reachability,
    ),
    # P10: mixture-balancing sampler (deterministic per-doc Bernoulli)
    ("corpus_mixture_sample", pl.corpus_mixture_sample, pl.ORACLE_corpus_mixture_sample),
    # A77: funnel deadline sweep (4-row window literal × anchor relation)
    ("events_funnel_sweep", bh.events_funnel_sweep, bh.ORACLE_events_funnel_sweep),
    # M8: windowed audio energy (stateless Arrow projection)
    ("media_audio_energy", d.media_audio_energy, d.ORACLE_media_audio_energy),
    # M9: scene-cut SAD detector (stateless Arrow projection)
    ("media_scene_cuts", d.media_scene_cuts, d.ORACLE_media_scene_cuts),
    # A79: per-metric completeness/coverage report
    (
        "metric_completeness_report",
        m.metric_completeness_report,
        m.ORACLE_metric_completeness_report,
    ),
    # A78: weekly growth accounting (new/retained/resurrected/churned)
    (
        "events_growth_accounting",
        bh.events_growth_accounting,
        bh.ORACLE_events_growth_accounting,
    ),
    # A80: week-over-week L1 composition-drift timeline
    ("events_mix_drift", bh.events_mix_drift, bh.ORACLE_events_mix_drift),
    # M10: image intensity histogram (stateless Arrow projection)
    ("media_image_histogram", d.media_image_histogram, d.ORACLE_media_image_histogram),
    # ------------------------------------------------------------------
    # Block R12b — new round-12 work (no official row yet).
    # T22e: the first driver-GATED eviction path — evict-mode gap
    # sessionization over event-time-ordered chunk replay; drain =
    # finals ∪ per-user max-version live, same batch oracle as the
    # non-evicting T22 twin (r11 verdict Next #4)
    (
        "stream_sessionize_evict",
        st.stream_sessionize_evict,
        pl.ORACLE_sessionize_events,
    ),
    # T21e: evict-mode anchored funnel (tombstoned finals + pruned live
    # slices), same batch funnel oracle as the non-evicting T21
    (
        "stream_funnel_evict",
        st.stream_funnel_evict,
        bh.ORACLE_events_sequence_funnel,
    ),
    # M11: perceptual average hash + 16-bit dedup bands (exact-int aHash)
    ("media_ahash", d.media_ahash, d.ORACLE_media_ahash),
    # T29: streaming two-sided CUSUM curve vs the batch A43 oracle
    ("stream_cusum", st.stream_cusum, m.ORACLE_metric_cusum),
    # T30: streaming Holt level+trend vs the batch A53 oracle (first
    # COUPLED float recursion served live)
    ("stream_holt", st.stream_holt, m.ORACLE_metric_holt),
    # G12: bounded-horizon harmonic closeness (shortest-dist layered
    # frontier expansion, exact-int Σ 10⁶ div dist)
    ("knn_closeness", d.knn_closeness, d.ORACLE_knn_closeness),
    # A82: Nelson-Aalen cumulative hazard — the KM sibling whose
    # cumulative estimator (a SUM, not a product) is gate-exact
    ("orders_nelson_aalen", r.orders_nelson_aalen, r.ORACLE_orders_nelson_aalen),
    # T31: streaming lag-1..5 autocorrelation vs the batch A48 oracle
    ("stream_acf", st.stream_acf, m.ORACLE_metric_acf),
    # M12: exact Hamming verify over the M11 aHash bands
    ("media_dedup_hamming", d.media_dedup_hamming, d.ORACLE_media_dedup_hamming),
    # T32: streaming Theil-Sen robust trend vs the batch A51 oracle
    ("stream_theil_sen", st.stream_theil_sen, m.ORACLE_metric_theil_sen),
    # A83: log-rank two-cohort survival comparison timeline
    ("orders_logrank", r.orders_logrank, r.ORACLE_orders_logrank),
    # P11: best-fit-decreasing packing (multi-bin fold vs a list-state
    # recursive-CTE oracle)
    ("corpus_pack_bfd", pl.corpus_pack_bfd, pl.ORACLE_corpus_pack_bfd),
    # ------------------------------------------------------------------
    # Block R13 — round-13 registrations.
    # T24e: evict-mode as-of join drained vs the SAME DuckDB native ASOF
    # oracle as the batch events_asof_join — the last evict=True contract
    # gains a driver gate (r12 verdict Next #1); all three eviction paths
    # are now driver-verified
    (
        "stream_asof_join_evict",
        st.stream_asof_join_evict,
        tj.ORACLE_events_asof_join,
    ),
    # P12: seeded deterministic corpus shuffle — reproducible training
    # order as ONE hash-range exchange (r12 verdict Next #5)
    ("corpus_shuffle", pl.corpus_shuffle, pl.ORACLE_corpus_shuffle),
    # D24b: hashed-gram SNM scale twin vs the SAME string-gram oracle
    # (r12 ADVICE: the gated D24 pins strings so the gate is
    # deterministic; this row keeps the production hashed path covered)
    (
        "dedup_snm_hashed",
        d.dedup_snm_hashed,
        d.ORACLE_dedup_sorted_neighborhood,
    ),
    # P13: deterministic exact-k sample (hash-order top-k — the
    # reproducible reservoir-sampling replacement)
    (
        "corpus_sample_topk",
        pl.corpus_sample_topk,
        pl.ORACLE_corpus_sample_topk,
    ),
    # P14: stride-scheduled mixture interleaving — the training order
    # where every prefix carries each source at its weight (exact ints)
    (
        "corpus_interleave",
        pl.corpus_interleave,
        pl.ORACLE_corpus_interleave,
    ),
    # P14b: hot-source-safe presplit interleave vs the IDENTICAL oracle
    # (the presplit-twin pattern: the mitigation cannot drift)
    (
        "corpus_interleave_presplit",
        pl.corpus_interleave_presplit,
        pl.ORACLE_corpus_interleave,
    ),
    # ------------------------------------------------------------------
    # Block R14 — the round-13 staged queue, registered wholesale (the
    # proven R12 drain pattern; r13 verdict Next #1).  All 36 were
    # EXACT-verified at sf0.01 via scripts/check_queued.py in r13 and
    # re-verified by the judge; the rotation's unrecorded-first rule
    # gives each an official green row in CORRECTNESS_r14.
    # A84: additive trend/seasonal decomposition
    (
        "metric_seasonal_decompose",
        m.metric_seasonal_decompose,
        m.ORACLE_metric_seasonal_decompose,
    ),
    # A85: cohort LTV curve (first-order-month cohorts, cumulative cents)
    ("customer_cohort_ltv", r.customer_cohort_ltv, r.ORACLE_customer_cohort_ltv),
    # A86: winsorized robust stats (exact nearest-rank p05/p95 clip)
    ("metric_winsorize", m.metric_winsorize, m.ORACLE_metric_winsorize),
    # P15: Hamilton largest-remainder quota apportionment
    (
        "corpus_quota_apportion",
        pl.corpus_quota_apportion,
        pl.ORACLE_corpus_quota_apportion,
    ),
    # A87: KMV distinct-count sketch (portable md5-60 hash)
    ("events_kmv_distinct", ax.events_kmv_distinct, ax.ORACLE_events_kmv_distinct),
    # A88: count-min sketch heavy hitters (fixed d·w memory)
    ("events_cms_heavy", ax.events_cms_heavy, ax.ORACLE_events_cms_heavy),
    # A89: CUPED variance-reduced A/B means
    ("events_cuped", ax.events_cuped, ax.ORACLE_events_cuped),
    # N19: int8 scalar quantization audit
    ("embedding_sq8", d.embedding_sq8, d.ORACLE_embedding_sq8),
    # M13: difference hash + band report (gradient sibling of M11)
    ("media_dhash", d.media_dhash, d.ORACLE_media_dhash),
    # A90: SAX-style symbolic motifs (equi-depth positional symbols)
    ("metric_sax_motifs", m.metric_sax_motifs, m.ORACLE_metric_sax_motifs),
    # A91: decile gains/lift table (positional deciles, integer ppm)
    ("customer_decile_lift", r.customer_decile_lift, r.ORACLE_customer_decile_lift),
    # X28: RAKE keyword extraction (integer-ppm word scores)
    ("text_rake_keywords", d.text_rake_keywords, d.ORACLE_text_rake_keywords),
    # T33: streaming CMS twin — gated on the A88 batch oracle verbatim
    ("stream_cms_heavy", st.stream_cms_heavy, ax.ORACLE_events_cms_heavy),
    # N20: Matryoshka prefix-dim recall audit
    ("knn_prefix_recall", d.knn_prefix_recall, d.ORACLE_knn_prefix_recall),
    # A92: ABC class migration matrix (A76 value rule per period)
    (
        "customer_abc_migration",
        bh.customer_abc_migration,
        bh.ORACLE_customer_abc_migration,
    ),
    # P16: token-budget epoch plan
    ("corpus_epoch_plan", pl.corpus_epoch_plan, pl.ORACLE_corpus_epoch_plan),
    # A93: open-order aging buckets (integer day arithmetic, cents)
    ("orders_aging_buckets", r.orders_aging_buckets, r.ORACLE_orders_aging_buckets),
    # N21: per-label centroid drift (micro-unit exact-int centroids)
    (
        "embedding_centroid_drift",
        d.embedding_centroid_drift,
        d.ORACLE_embedding_centroid_drift,
    ),
    # A94: Holt forecast backtest (A53 fold on the train prefix)
    (
        "metric_forecast_backtest",
        m.metric_forecast_backtest,
        m.ORACLE_metric_forecast_backtest,
    ),
    # V3: vocabulary coverage curve (exact cumulative token shares)
    ("vocab_coverage_curve", cu.vocab_coverage_curve, cu.ORACLE_vocab_coverage_curve),
    # T34: streaming KMV twin — gated on the A87 batch oracle verbatim
    ("stream_kmv_distinct", st.stream_kmv_distinct, ax.ORACLE_events_kmv_distinct),
    # A95: Laspeyres/Paasche/Fisher price index
    ("part_price_index", ax.part_price_index, ax.ORACLE_part_price_index),
    # A96: U-shaped multi-touch attribution (integer 40/40/20)
    (
        "events_attribution_ushape",
        bh.events_attribution_ushape,
        bh.ORACLE_events_attribution_ushape,
    ),
    # A97: nation trade-profile cosine similarity
    (
        "nation_trade_similarity",
        r.nation_trade_similarity,
        r.ORACLE_nation_trade_similarity,
    ),
    # T35: streaming last-touch attribution — gated on the A28 batch oracle
    ("stream_attribution", st.stream_attribution, bh.ORACLE_events_attribution),
    # A98: Syntetos-Boylan demand quadrant
    ("part_demand_classes", ax.part_demand_classes, ax.ORACLE_part_demand_classes),
    # D26: cross-source near-dup matrix (production minhash pairs)
    ("dedup_source_matrix", d.dedup_source_matrix, d.ORACLE_dedup_source_matrix),
    # A99: KMV set algebra (union/Jaccard/intersection from merged minima)
    ("events_kmv_setops", ax.events_kmv_setops, ax.ORACLE_events_kmv_setops),
    # A100: Western-Electric SPC rules 1+4
    ("metric_spc_rules", m.metric_spc_rules, m.ORACLE_metric_spc_rules),
    # P17: exact-count stratified sample (P15 quotas × P13 hash order)
    (
        "corpus_stratified_exact",
        pl.corpus_stratified_exact,
        pl.ORACLE_corpus_stratified_exact,
    ),
    # T36: streaming SPC rules — gated on the A100 batch oracle verbatim
    ("stream_spc_rules", st.stream_spc_rules, m.ORACLE_metric_spc_rules),
    # A101: Markov stationary distribution (scaled-int power iteration)
    (
        "events_markov_stationary",
        ax.events_markov_stationary,
        ax.ORACLE_events_markov_stationary,
    ),
    # X29: word burstiness / Fano factors
    ("text_word_burstiness", d.text_word_burstiness, d.ORACLE_text_word_burstiness),
    # A102: ACF-argmax dominant period (the input A84 assumes)
    ("metric_autoperiod", m.metric_autoperiod, m.ORACLE_metric_autoperiod),
    # Q19: HDR-style log2 latency histogram (bit-trick floor-log2)
    (
        "qan_latency_log2_histogram",
        ax.qan_latency_log2_histogram,
        ax.ORACLE_qan_latency_log2_histogram,
    ),
    # A103: win-back cohorts by dormancy length (A85 month ints)
    ("customer_winback", r.customer_winback, r.ORACLE_customer_winback),
    # ------------------------------------------------------------------
    # Block R14b — new round-14 work (no official row yet).
    # T37: streaming seasonal decomposition — gated on the A84 batch
    # oracle verbatim (r13 verdict Next #5: A84's governor-style
    # consumers are streaming; the live path needed its own gate)
    (
        "stream_seasonal_decompose",
        st.stream_seasonal_decompose,
        m.ORACLE_metric_seasonal_decompose,
    ),
    # T38: streaming autoperiod — gated on the A102 batch oracle verbatim
    # (the second live twin the r13 verdict named)
    (
        "stream_autoperiod",
        st.stream_autoperiod,
        m.ORACLE_metric_autoperiod,
    ),
    # T39: streaming winsorized stats — gated on the A86 batch oracle
    # verbatim (nearest-rank bounds are global statistics)
    ("stream_winsorize", st.stream_winsorize, m.ORACLE_metric_winsorize),
    # A104: PromQL-style range rate (reset-aware increase over aligned
    # windows of a cumulative counter — the windowed member of the T2-T5
    # delta family)
    ("metric_range_rate", m.metric_range_rate, m.ORACLE_metric_range_rate),
    # N22: hard-negative mining (top-k nearest different-label candidates
    # — the contrastive-training companion of the kNN ladder)
    (
        "knn_hard_negatives",
        d.knn_hard_negatives,
        d.ORACLE_knn_hard_negatives,
    ),
    # M14: audio clipping / dead-air screen (exact-int capture-quality
    # gates: rail-pinned counts + longest quiet-band run)
    (
        "media_audio_clipping",
        d.media_audio_clipping,
        d.ORACLE_media_audio_clipping,
    ),
    # P18: curriculum-learning schedule (stage count-quantiles + seeded
    # within-stage shuffle, one exchange end-to-end)
    ("corpus_curriculum", pl.corpus_curriculum, pl.ORACLE_corpus_curriculum),
    # T40: streaming range rate — gated on the A104 batch oracle verbatim
    # (the counter is the running cumsum of the bucket-sum state)
    ("stream_range_rate", st.stream_range_rate, m.ORACLE_metric_range_rate),
    # A105: market-basket pair lift (association mining over order
    # baskets — support/confidence/lift in exact integer ppm)
    ("basket_pair_lift", bh.basket_pair_lift, bh.ORACLE_basket_pair_lift),
    # V4: tokenizer fertility by language (BPE tokens per word, the
    # multilingual-tokenizer audit; exact-ppm)
    ("vocab_fertility", cu.vocab_fertility, cu.ORACLE_vocab_fertility),
    # N23: embedding-space ROC-AUC audit (Mann-Whitney rank identity
    # in exact ints over the bounded hash-order pair sample)
    ("embedding_pair_auc", d.embedding_pair_auc, d.ORACLE_embedding_pair_auc),
    # ------------------------------------------------------------------
    # Block R15 — the round-14 staged queue, registered wholesale (r14
    # verdict Next #2: all 7 re-proven EXACT by the judge on the r14
    # tree via scripts/check_queued.py; the rotation's unrecorded-first
    # rule gives each an official green row immediately).
    # A106: funnel stage-latency distribution (nearest-rank p50/p90 from
    # the distinct-latency grid, KM-grid pattern)
    (
        "funnel_stage_latency",
        bh.funnel_stage_latency,
        bh.ORACLE_funnel_stage_latency,
    ),
    # P19: temperature-scaled mixture at tau=1/2 (exact integer sqrt
    # weights + P15 Hamilton shares summing to 1e6)
    (
        "corpus_mixture_temperature",
        pl.corpus_mixture_temperature,
        pl.ORACLE_corpus_mixture_temperature,
    ),
    # T41: live language-mixture monitor gated on the batch oracle
    # verbatim (complete-mode counts, shared share expression)
    (
        "stream_language_mixture",
        st.stream_language_mixture,
        cu.ORACLE_corpus_language_mixture,
    ),
    # X30: type-token ratio by length decile (P18 count-quantile stages
    # on the distinct-length grid, exact-ppm pooled TTR)
    ("text_ttr_curve", cu.text_ttr_curve, cu.ORACLE_text_ttr_curve),
    # A107: top converting journeys (total-order path strings truncated
    # at first purchase, exact counts, top-k)
    (
        "events_conversion_paths",
        bh.events_conversion_paths,
        bh.ORACLE_events_conversion_paths,
    ),
    # N24: nearest-centroid classification probe (exact-int Rocchio
    # confusion matrix, the N21 centroid idiom verbatim)
    (
        "embedding_centroid_probe",
        d.embedding_centroid_probe,
        d.ORACLE_embedding_centroid_probe,
    ),
    # A108: supplier HHI per nation (exact milli-share squares, DOJ
    # bands as integer compares)
    (
        "nation_supplier_hhi",
        r.nation_supplier_hhi,
        r.ORACLE_nation_supplier_hhi,
    ),
    # ------------------------------------------------------------------
    # Block R15b — new round-15 work (no official row yet).
    # T42: streaming Holt forecast backtest — gated on the A94 batch
    # oracle verbatim (r14 verdict Next #7: the governor's
    # fall-back-to-EWMA decision is a streaming decision)
    (
        "stream_forecast_backtest",
        st.stream_forecast_backtest,
        m.ORACLE_metric_forecast_backtest,
    ),
    # R31: supplier fulfillment lead-time quantiles (nearest-rank grid
    # on integer day arithmetic — the logistics KPI next to A108)
    (
        "supplier_leadtime_quantiles",
        r.supplier_leadtime_quantiles,
        r.ORACLE_supplier_leadtime_quantiles,
    ),
    # A109: seasonal-hybrid MAD anomaly screen (hod-median deseasonalize
    # then the 3×MAD robust rule — the S-H-ESD shape, all exact-int)
    ("metric_shesd", m.metric_shesd, m.ORACLE_metric_shesd),
    # D27: token-sort order-insensitive dedup (sorted-token-multiset
    # blocking key; is_reorder_only = new catches relative to D1)
    ("dedup_token_sort", d.dedup_token_sort, d.ORACLE_dedup_token_sort),
    # M15: per-video keyframe selection + motion profile (argmax over
    # the gated M9 SADs, lexicographic struct-max tie-break)
    ("media_keyframes", d.media_keyframes, d.ORACLE_media_keyframes),
    # X31: tokenizer-bomb screen (extreme max/mean token length flags +
    # nearest-rank p99 per source)
    (
        "text_token_anomalies",
        d.text_token_anomalies,
        d.ORACLE_text_token_anomalies,
    ),
    # N25: PCA top component by integer power iteration over the exact
    # N17 Gram (3 unrolled rounds, divisor-first rescaling)
    (
        "embedding_pca_power",
        d.embedding_pca_power,
        d.ORACLE_embedding_pca_power,
    ),
    # T43: streaming supplier HHI — gated on the A108 batch oracle
    # verbatim (per-supplier cent-sum state, full re-derive per emit)
    (
        "stream_supplier_hhi",
        st.stream_supplier_hhi,
        r.ORACLE_nation_supplier_hhi,
    ),
    # P20: shard-balance audit of the P12 hash-range sharding (ppm
    # shares + 2×-fair-share hot flag — the pre-flight before a
    # 1000-writer commit)
    (
        "corpus_shard_skew",
        pl.corpus_shard_skew,
        pl.ORACLE_corpus_shard_skew,
    ),
    # X32: character-class composition per source (length-difference
    # regexp counts, exact ppm — the cheapest corpus fingerprint)
    (
        "text_charclass_profile",
        cu.text_charclass_profile,
        cu.ORACLE_text_charclass_profile,
    ),
    # A110: post-event dwell-time quantiles (lead window per user +
    # the A106 nearest-rank grid per event type)
    ("events_dwell_time", bh.events_dwell_time, bh.ORACLE_events_dwell_time),
    # T44: streaming tokenizer-bomb monitor — gated on the X31 batch
    # oracle verbatim (shared stats/grid/report expressions, T41 rule)
    (
        "stream_token_anomalies",
        st.stream_token_anomalies,
        d.ORACLE_text_token_anomalies,
    ),
    # X33: cross-source vocabulary overlap matrix (term-keyed join,
    # per-term fan-out ≤ C(|sources|,2) — never source²-by-content)
    (
        "source_vocab_overlap",
        cu.source_vocab_overlap,
        cu.ORACLE_source_vocab_overlap,
    ),
    # T45: streaming char-class fingerprint — gated on the X32 batch
    # oracle verbatim (shared counts/sums/report expressions)
    (
        "stream_charclass_profile",
        st.stream_charclass_profile,
        cu.ORACLE_text_charclass_profile,
    ),
    # N26: embedding squared-norm decile curve (norm collapse/outlier
    # audit — exact micro²-int magnitudes, P18 count-quantile stages)
    (
        "embedding_norm_deciles",
        d.embedding_norm_deciles,
        d.ORACLE_embedding_norm_deciles,
    ),
    # P21: dedup yield curve over the P12 scan order (cumulative unique
    # content per scan decile — the crawl-budget saturation signal)
    (
        "corpus_dedup_yield",
        pl.corpus_dedup_yield,
        pl.ORACLE_corpus_dedup_yield,
    ),
    # T46: streaming dwell grid — gated on the A110 batch oracle
    # verbatim (per-user sequence state, full grid re-derive per emit,
    # shared dwell_report derivation)
    ("stream_dwell_time", st.stream_dwell_time, bh.ORACLE_events_dwell_time),
    # ------------------------------------------------------------------
    # round-16 additions
    # X34: main-content extraction / boilerplate strip (tag strip +
    # jusText length/link-density line rules over a deterministic
    # markup fixture; the stage X32 only detects — r15 verdict #4)
    (
        "text_extract_content",
        cu.text_extract_content,
        cu.ORACLE_text_extract_content,
    ),
    # T47: streaming state-size budget — one representative per state
    # family drained and SIZED (live measurements through the normal
    # emission path), gated against the retention contracts in SQL
    (
        "stream_state_budget",
        st.stream_state_budget,
        st.ORACLE_stream_state_budget,
    ),
    # T48: streaming content-extraction monitor — X34 served live via
    # the shared expression set, gated on the batch oracle verbatim
    (
        "stream_extract_content",
        st.stream_extract_content,
        cu.ORACLE_text_extract_content,
    ),
    # N27: pairwise-angle health probe — bounded hash-sampled pair
    # cosine histogram (the embedding-collapse alarm N25/N26 lack)
    (
        "embedding_angle_probe",
        d.embedding_angle_probe,
        d.ORACLE_embedding_angle_probe,
    ),
    # P22: dedup-aware mixture weights — Hamilton shares on raw vs
    # UNIQUE tokens (keeper = min-doc_id, cross-source shift visible)
    (
        "corpus_mixture_dedup",
        pl.corpus_mixture_dedup,
        pl.ORACLE_corpus_mixture_dedup,
    ),
    # A114: Gini concentration per segment — distinct-value-grid rank
    # sums (no per-row sort), the inequality complement of T43's HHI
    (
        "orders_gini_segment",
        r.orders_gini_segment,
        r.ORACLE_orders_gini_segment,
    ),
    # T49: streaming Gini monitor — A114 served live via the shared
    # grid/report expression set, gated on the batch oracle verbatim
    (
        "stream_gini_segment",
        st.stream_gini_segment,
        r.ORACLE_orders_gini_segment,
    ),
    # P23: small-shard compaction planner — P11 BFD fold over the
    # <=64-row shard-size relation, DuckDB recursive-CTE twin
    (
        "corpus_compaction_plan",
        pl.corpus_compaction_plan,
        pl.ORACLE_corpus_compaction_plan,
    ),
    # A115: Lorenz curve deciles — the curve behind A114's Gini, same
    # distinct-value grid, broadcast 10-row decile spine
    (
        "orders_lorenz_deciles",
        r.orders_lorenz_deciles,
        r.ORACLE_orders_lorenz_deciles,
    ),
    # X35: line-frequency template detection — the corpus-statistical
    # boilerplate rule composing with X34's per-line heuristics
    (
        "text_template_lines",
        cu.text_template_lines,
        cu.ORACLE_text_template_lines,
    ),
    # T50: streaming shard-skew monitor — P20 served live via the
    # shared stats/sums/report expression set, batch oracle verbatim
    (
        "stream_shard_skew",
        st.stream_shard_skew,
        pl.ORACLE_corpus_shard_skew,
    ),
    # D28: dedup group-size histogram — how duplication CLUSTERS (the
    # MinHash-banding tuning view next to P21's scan-order curve)
    (
        "dedup_group_histogram",
        d.dedup_group_histogram,
        d.ORACLE_dedup_group_histogram,
    ),
]

# ----------------------------------------------------------------------
# Gate rotation — DERIVED, not hardcoded (round 9).  The driver records
# only the first 50 entries, so ordering is load-bearing.  Earlier rounds
# hand-maintained `_GATE_PRIORITY` and the list went stale the moment the
# driver wrote the round's CORRECTNESS file (the r8 358/359 pytest red).
# Now the priority is computed from the same committed artifacts the
# invariant tests police:
#
#   1. Queries with NO green row in any CORRECTNESS_r*.json lead, in
#      registration order — a tail slot can never earn a first row.
#   2. Everything else is ordered by its NEWEST green round ascending
#      (stalest rows rotate back into the window first), registration
#      order as the tiebreak.
#
# When the driver lands a new CORRECTNESS file the order self-rotates for
# the next round; no mid-round hand edit, nothing to go stale.

import glob as _glob
import json as _json
import os as _os

_REPO_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def _newest_green_round() -> dict[str, int]:
    """query name -> newest round with an official green (hash-match,
    no-err) row, read from the committed driver artifacts."""
    newest: dict[str, int] = {}
    for path in _glob.glob(_os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        try:
            rnd = int(_os.path.basename(path).split("_r")[1].split(".")[0])
            rows = _json.load(open(path))
        except (ValueError, OSError, _json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if row.get("hash_match") and not row.get("err"):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


_NEWEST_GREEN = _newest_green_round()
_REG_ORDER = {name: i for i, (name, _, _) in enumerate(_ENTRIES)}
_ENTRIES.sort(
    key=lambda entry: (
        _NEWEST_GREEN.get(entry[0], 0),  # unrecorded (0) first, then stalest
        _REG_ORDER[entry[0]],
    )
)
QUERIES: dict[str, QueryFn] = {name: fn for name, fn, _ in _ENTRIES}
ORACLES: dict[str, str] = {name: sql for name, _, sql in _ENTRIES if sql is not None}
