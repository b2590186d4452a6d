"""Physical-plan pins for the round-2 operators' scale-critical shapes.

These are regression guards: the measured 74 s -> 3 s decontaminate fix and
the windowless vocab rank are properties of the PLAN, not the output, so an
innocent-looking refactor can silently undo them while every value test
stays green. Asserting on the executed plan keeps the fix load-bearing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_obsidian_core_spark.datapipe import curation as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"tok{i % 7} tok{i % 5} tok{i % 3} tok{i % 11} end", "en", "s0")
            for i in range(60)]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_probes_via_broadcast_hash_join(docs):
    plan = _plan(C.decontaminate(docs, n=2))
    # the bench-set probe must be a hash join, not a per-row array scan or
    # nested loop (the 74 s at sf0.1 failure mode)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_repetition_stats_aggregates_with_partial_combine(docs):
    plan = _plan(C.repetition_stats(docs))
    # explode feeds a hash aggregate (map-side combine), not a per-row loop
    assert "HashAggregate" in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_stratified_sample_broadcasts_stratum_counts(docs):
    plan = _plan(C.stratified_sample(docs))
    assert "BroadcastHashJoin" in plan  # counts side must broadcast


def test_tile_dedup_windows_are_hash_partitioned(docs):
    plan = _plan(C.tile_dedup(docs))
    # the first-occurrence window must be partitioned (no global window)
    assert "Window" in plan
    assert "No Partition Defined" not in plan


def test_decontaminate_scan_is_pruned(docs, tmp_path):
    # through parquet, the gram projection must prune to doc_id + text
    p = str(tmp_path / "docs")
    docs.write.parquet(p)
    spark = docs.sparkSession
    out = C.decontaminate(spark.read.parquet(p), n=2)
    scan = _plan(out)
    assert "lang" not in scan.split("ReadSchema")[1][:200]


# ------------------------------------------- round-3 flagship plan pins ---

SF_DIR = "/root/testdata/sf0.001"


def test_curation_report_single_composed_plan(spark):
    from project_obsidian_core_spark.plans import curation_queries as cu

    plan = _plan(cu.curation_report(spark, SF_DIR))
    # every small side broadcasts; nothing nested-loops or goes cartesian
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are deliberate 1-row broadcast
    # cross joins (corpus-level scalars joined onto every row)
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        assert "Cross" in frag[:40]  # "BuildRight, Cross" / "BuildLeft, Cross"
    assert "No Partition Defined" not in plan


def test_prepare_training_set_v2_single_composed_plan(spark):
    from project_obsidian_core_spark.plans import curation_queries as cu

    plan = _plan(cu.prepare_training_set_v2(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "No Partition Defined" not in plan


def test_bpe_round_shapes(spark):
    from project_obsidian_core_spark.datapipe import bpe as B

    docs = spark.createDataFrame(
        [(0, "aa ab aa baaab zoo zoo")], ["doc_id", "text"]
    )
    segs = B.initial_segmentation(B.word_counts(docs))
    top = B.top_pair(segs)
    # winner selection is TakeOrderedAndProject (limit 1), never a global sort
    assert "TakeOrderedAndProject" in _plan(top)
    merged = B.apply_merge(segs.crossJoin(F.broadcast(top)))
    mplan = _plan(merged)
    # the 1-row pair join must be the BROADCAST cross join, not a shuffle
    # cartesian product
    assert "CartesianProduct" not in mplan


def test_ivf_kmeans_no_shuffled_cartesian(spark):
    from project_obsidian_core_spark.plans import datapipe_queries as dq

    plan = _plan(dq.knn_ivf_kmeans(spark, SF_DIR))
    # centroid attach + query attach are deliberate 1-row/5-row broadcast
    # cross joins; nothing may fall back to a shuffle CartesianProduct
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_stream_range_join_uses_symmetric_hash_join(spark, tmp_path):
    from project_obsidian_core_spark.streaming.interval_join import interval_join

    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    schema = "user_id string, ts timestamp, value double"
    spark.createDataFrame([], schema).write.parquet(src_a)
    spark.createDataFrame([], schema).write.parquet(src_b)
    left = spark.readStream.schema(schema).parquet(src_a)
    right = spark.readStream.schema(schema).parquet(src_b)
    joined = interval_join(left, right, on="user_id", span_seconds=60)
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
        plan = q._jsq.explainInternal(True)
    finally:
        q.stop()
    # watermark-bounded stateful equi-join — never a nested loop
    assert "StreamingSymmetricHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ------------------------------------------- round-5 flagship plan pins ---


def test_cdc_merge_base_side_broadcast_anti(spark):
    from project_obsidian_core_spark.plans import cdc_queries as cdc

    plan = _plan(cdc.orders_cdc_merge(spark, SF_DIR))
    # the touched-key anti probe must be a broadcast hash join (LeftAnti):
    # the base table is never shuffled for a small CDC batch
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_pq_adc_broadcasts_codebook_and_queries(spark):
    from project_obsidian_core_spark.plans import pq_queries as pq

    plan = _plan(pq.knn_pq_adc(spark, SF_DIR))
    # codebook row + query distance tables attach via broadcast; the code
    # relation is scanned, never shuffled before the per-query top-k
    assert "CartesianProduct" not in plan
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        assert "Cross" in frag[:40] or "Inner" in frag[:40]
    # the per-query top-k window is partitioned by q_id, never global
    assert "No Partition Defined" not in plan


def test_trailing_revenue_single_partitioned_window(spark):
    from project_obsidian_core_spark.plans import relational_queries as r

    plan = _plan(r.customer_trailing_revenue(spark, SF_DIR))
    assert "Window" in plan
    assert "No Partition Defined" not in plan
    # RANGE frame: one pass, one shuffle on the customer key
    assert plan.count("Exchange hashpartitioning(o_custkey") <= 1


def test_large_order_customers_semi_join_broadcasts(spark):
    from project_obsidian_core_spark.plans import relational_queries as r

    plan = _plan(r.large_order_customers(spark, SF_DIR))
    # the qualifying-orderkey set and the customer dim both broadcast
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_promo_revenue_part_dim_broadcasts(spark):
    from project_obsidian_core_spark.plans import relational_queries as r

    plan = _plan(r.promo_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_returned_item_customers_aggregates_before_dim_attach(spark):
    from project_obsidian_core_spark.plans import relational_queries as r

    plan = _plan(r.returned_item_customers(spark, SF_DIR))
    # customer/nation broadcast onto the per-custkey AGGREGATE, never onto
    # the fact table: the HashAggregate must sit below the broadcast joins
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    agg_pos = plan.index("HashAggregate")
    bj_pos = plan.index("BroadcastHashJoin")
    assert agg_pos > bj_pos  # tree prints top-down: join above, agg below


def test_customer_order_distribution_two_aggregations(spark):
    from project_obsidian_core_spark.plans import relational_queries as r

    plan = _plan(r.customer_order_distribution(spark, SF_DIR))
    # the NOT LIKE filter reaches the orders scan
    assert "PushedFilters" in plan
    assert "CartesianProduct" not in plan


def test_time_weighted_avg_single_series_shuffle(spark):
    from project_obsidian_core_spark.plans import metrics_queries as m

    plan = _plan(m.metric_time_weighted_avg(spark, SF_DIR))
    # one partitioned lead window + hash aggregate; no global window
    assert "Window" in plan
    assert "No Partition Defined" not in plan


def test_forecast_revenue_filters_reach_scan(spark):
    from project_obsidian_core_spark.plans import relational_queries as r

    plan = _plan(r.forecast_revenue(spark, SF_DIR))
    # the Q6 point: every predicate pushes to the parquet scan, and the
    # whole query is scan -> partial agg -> 1-row final (no join, no sort)
    assert "PushedFilters" in plan
    assert "Join" not in plan


def test_part_supplier_variety_anti_join_broadcasts(spark):
    from project_obsidian_core_spark.plans import relational_queries as r

    plan = _plan(r.part_supplier_variety(spark, SF_DIR))
    # the NOT-IN exclusion must be a broadcast anti join, never a
    # nested-loop; the part dim broadcasts too
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sole_late_suppliers_decorrelates_without_cartesian(spark):
    from project_obsidian_core_spark.plans import relational_queries as r

    plan = _plan(r.sole_late_suppliers(spark, SF_DIR))
    # the EXISTS/NOT-EXISTS pair is aggregates + equi-joins: no cartesian,
    # supplier dim broadcast, ordered top-20 via TakeOrderedAndProject
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------- round-7 operator plans
def test_oov_rate_probes_vocab_via_broadcast(docs):
    """The vocab probe must be a broadcast hash join — never a shuffle of
    the exploded token relation against the <=cap-row vocab."""
    from project_obsidian_core_spark.datapipe.curation import build_vocab, oov_rate

    plan = _plan(oov_rate(docs, build_vocab(docs)))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_plan_is_narrow(docs):
    """Chunking is a map-only pass: no Exchange anywhere in the plan."""
    from project_obsidian_core_spark.datapipe.pipeline import chunk_documents

    plan = _plan(chunk_documents(docs, size=16, overlap=4))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the per-row explode


def test_zorder_value_plan_is_narrow_codegen(docs):
    """The z key is a pure projection inside whole-stage codegen."""
    from project_obsidian_core_spark.operators.layout import zorder_value

    df = docs.select("doc_id").withColumn(
        "z", zorder_value([("doc_id", 0, 100)], bits=8)
    )
    plan = _plan(df)
    assert "Exchange" not in plan
    # "*(n)" marks a whole-stage-codegen stage in the plan string; the
    # interleave expression must not fall out of codegen
    assert "*(1) Project" in plan


def test_dq_report_single_aggregation(spark):
    """All non-unique rules fold into one aggregation pass: exactly one
    pair of partial/final HashAggregate over the scan (2 occurrences),
    and no join."""
    from project_obsidian_core_spark.operators.quality import dq_report

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    plan = _plan(
        dq_report(df, [("not_null", "k"), ("range", "v", 0, 5), ("in_set", "v", [1, 2])])
    )
    assert plan.count("Join") == 0
    # partial + final aggregate of the single reduction
    assert "HashAggregate" in plan or "SortAggregate" in plan


# ------------------------------------------- round-8c operator shapes --
def test_bloom_probe_filters_before_join(spark):
    from project_obsidian_core_spark.operators import bloom as B

    dim = spark.createDataFrame([(k,) for k in range(0, 200, 5)], ["k"])
    fact = spark.createDataFrame([(i, i % 300) for i in range(2000)], ["rid", "k2"])
    words = B.build_bloom(dim, "k")
    pruned = fact.filter(B.might_contain("k2", words)).join(
        F.broadcast(dim), F.col("k2") == F.col("k")
    )
    plan = _plan(pruned)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the bitmap predicate must sit in a Filter below the join (scan-side),
    # not be deferred into/above the join
    join_pos = plan.find("BroadcastHashJoin")
    filt_pos = plan.find("getbit")
    assert filt_pos != -1 and filt_pos > join_pos  # below = printed after


def test_prefix_join_never_goes_cartesian(spark):
    from project_obsidian_core_spark.datapipe import dedup as D

    rows = [(i, f"w{i % 9} w{i % 7} w{i % 5} w{i % 3} w{i % 2} end") for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # staged=False keeps the lazy plan inspectable (the default is
    # checkpoint-backed — pinned below)
    plan = _plan(D.prefix_filter_pairs(docs, threshold_ppm=600_000, staged=False))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate generation shuffles/joins on the prefix token equality
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan
    # the default stages the four-branch shingle relation and returns a
    # checkpoint-backed result (r17 — the dsir staged pattern)
    ps = _plan(D.prefix_filter_pairs(docs, threshold_ppm=600_000))
    assert "ExistingRDD" in ps or "Scan ExistingRDD" in ps


def test_ks_test_windows_share_type_partitioning(spark):
    from project_obsidian_core_spark.plans import analytics_ext_queries as ax

    rows = [("m", i, float(i % 17)) for i in range(200)]
    df = spark.createDataFrame(rows, ["event_type", "user_id", "value"])
    real_load = ax.load
    ax.load = lambda s, d, t: df
    try:
        plan = _plan(ax.events_ks_test(spark, "unused"))
    finally:
        ax.load = real_load
    # windows must be partitioned (no global single-partition window)
    assert "Window" in plan
    assert "No Partition Defined" not in plan


def test_label_propagation_rounds_are_hash_joins(spark):
    from project_obsidian_core_spark.datapipe.similarity import label_propagation

    edges = spark.createDataFrame(
        [(i, (i + 1) % 30) for i in range(30)], ["a", "b"]
    )
    plan = _plan(label_propagation(edges, rounds=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _monkeypatched_plan(mod, fn_name, df, spark):
    real_load = mod.load
    mod.load = lambda s, d, t: df
    try:
        return _plan(getattr(mod, fn_name)(spark, "unused"))
    finally:
        mod.load = real_load


def test_rolling_median_single_series_exchange(spark):
    """A39: the corpus pays only the partially-combined bucket-aggregate
    exchange; the median window re-keys the REDUCED bucket relation (one
    more small exchange, never the raw rows), and the k-sort is an
    expression, not a UDF."""
    import datetime as dt

    from project_obsidian_core_spark.plans import metrics_queries as mq

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i % 3, "view", t0 + dt.timedelta(minutes=i), float(i % 13))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "value"])
    real_load = mq.load
    mq.load = lambda s, d, t: df
    try:
        plan = _plan(mq.metric_rolling_median(spark, "unused"))
    finally:
        mq.load = real_load
    # aggregate exchange (partial-combined) + reduced-relation window
    # exchange — and nothing more
    assert plan.count("Exchange hashpartitioning") == 2, plan
    # the aggregate really combines map-side before its shuffle
    assert "partial_sum" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cusum_windows_share_series_partitioning(spark):
    """A43: dev/prefix/extrema windows ALL share one metric-keyed
    exchange over the reduced bucket relation; the corpus pays only the
    partially-combined bucket aggregate."""
    import datetime as dt

    from project_obsidian_core_spark.plans import metrics_queries as mq

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i % 3, "view", t0 + dt.timedelta(minutes=i), float(i % 13))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "value"])
    real_load = mq.load
    mq.load = lambda s, d, t: df
    try:
        plan = _plan(mq.metric_cusum(spark, "unused"))
    finally:
        mq.load = real_load
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_sum" in plan, plan
    assert "No Partition Defined" not in plan


def test_markov_total_window_runs_on_reduced_relation(spark):
    """A40: the corpus pays only the user-keyed lag exchange plus the
    (prev,next) aggregate exchange; the row-total window partitions the
    ≤|types|² matrix, never the event stream."""
    import datetime as dt

    from project_obsidian_core_spark.plans import behavior_queries as bq

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i % 7, ["a", "b", "c"][i % 3], t0 + dt.timedelta(minutes=i), i)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "event_id"])
    real_load = bq.load
    bq.load = lambda s, d, t: df
    try:
        plan = _plan(bq.events_markov_transitions(spark, "unused"))
    finally:
        bq.load = real_load
    # lag shuffle (user) + matrix aggregate shuffle (prev,next) + the
    # prev-keyed total window that reuses the aggregate's output; no more
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "No Partition Defined" not in plan


def test_benford_expected_side_broadcasts(spark):
    from project_obsidian_core_spark.plans import analytics_ext_queries as ax

    rows = [(float(100 + i * 37),) for i in range(500)]
    df = spark.createDataFrame(rows, ["o_totalprice"])
    real_load = ax.load
    ax.load = lambda s, d, t: df
    try:
        plan = _plan(ax.orders_benford(spark, "unused"))
    finally:
        ax.load = real_load
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bigram_lift_builds_pairs_without_self_join(spark):
    """X20: bigrams come from an in-row zip — the only joins are the two
    broadcast unigram attaches and the broadcast total."""
    from project_obsidian_core_spark.datapipe.text import bigram_lift

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta alpha beta") for i in range(40)],
        ["doc_id", "text"],
    )
    plan = _plan(bigram_lift(docs, min_count=1))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    # the scalar total attaches as a broadcast nested loop over ONE row
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_acf_lag_join_is_hash_equi_not_band_nested_loop(spark):
    """A48: the lag must ride inside the equi-join key. The band-
    predicate self-join (bucket BETWEEN a+1 AND a+L) only equi-joins on
    metric_name and degenerates to B^2 per-series comparisons —
    measured 53 s vs 12 s at sf0.1 for identical output."""
    from project_obsidian_core_spark.plans.metrics_queries import acf_over_grid

    c = spark.createDataFrame(
        [("m", b, b * 3) for b in range(40)], "metric_name string, bucket long, yc long"
    )
    plan = c.sparkSession.createDataFrame([], "x int") and None  # noqa: F841
    p = acf_over_grid(c, 3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the explode feeding the probe side and a hash join on both keys
    assert "Generate" in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_dup_span_coverage_shuffles_hashes_not_text(spark):
    """D19: after the map side, exchanges must carry the int64 gh key —
    the window TEXT must not appear in any exchange's output schema."""
    from project_obsidian_core_spark.datapipe.spans import dup_span_coverage

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * j) % 9}" for j in range(12))) for i in range(30)],
        "doc_id long, text string",
    )
    p = dup_span_coverage(docs, k=4)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "gram" not in m.group(1), m.group(0)
    assert "gh" in p


def test_dsir_bucket_model_broadcasts_and_explodes_once(spark):
    """Q18: the B-row bucket model must broadcast to the scoring join,
    and the token-feature explode must appear ONCE (the bucket aggregate
    cascades off the (doc,b) partial, not a second scan)."""
    import pyspark.sql.functions as F

    from project_obsidian_core_spark.datapipe.dsir import dsir_importance

    docs = spark.createDataFrame(
        [(i, "a b c d e f", i % 2 == 0) for i in range(20)],
        "doc_id long, text string, tgt boolean",
    )
    p = (
        dsir_importance(docs, F.col("tgt"), staged=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in p
    # staged=True persists doc_feat so the explode RUNS once; the lazy
    # plan still PRINTS one Generate per consumer of the persisted
    # relation (3 = probe join + bucket model + totals) — pin that the
    # staged output is checkpoint-backed instead
    ps = (
        dsir_importance(docs, F.col("tgt"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" in ps or "Scan ExistingRDD" in ps


def test_priority_sample_grouped_is_one_window_no_join(spark):
    import pyspark.sql.functions as F

    from project_obsidian_core_spark.datapipe.curation import priority_sample

    docs = spark.createDataFrame(
        [(i, f"g{i % 3}", 5 + i) for i in range(30)], "doc_id long, grp string, w long"
    )
    p = (
        priority_sample(docs, 3, F.col("w"), group_cols=("grp",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in p
    assert "Window" in p


def test_priority_sample_global_is_take_ordered(spark):
    import pyspark.sql.functions as F

    from project_obsidian_core_spark.datapipe.curation import priority_sample

    docs = spark.createDataFrame(
        [(i, 5 + i) for i in range(30)], "doc_id long, w long"
    )
    p = (
        priority_sample(docs, 3, F.col("w"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in p  # never a global Sort


# ------------------------------------------------ round-10 plan pins -----
def _metric_df(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i % 3, "view" if i % 2 else "click", t0 + dt.timedelta(minutes=7 * i),
         float(i % 13))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts", "value"])


def _with_fake_load(mod, df, build):
    real = mod.load
    mod.load = lambda s, d, t: df
    try:
        return _plan(build())
    finally:
        mod.load = real


def test_theil_sen_builds_pairs_in_row_no_self_join(spark):
    """A51: the O(H²) pair set must come from higher-order functions on
    the per-series array — a per-pair self-join would shuffle H² rows
    per series and regress to the ACF band-join failure mode."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq, _metric_df(spark), lambda: mq.metric_theil_sen(spark, "unused")
    )
    assert "Join" not in plan, plan
    # grid aggregate + series collect: two exchanges, nothing more
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_changepoint_prefix_sums_ride_reduced_window(spark):
    """A52: prefix sums and the argmax window run on the ≤H-row grid —
    two exchanges (grid agg + series window), no join, no python."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq, _metric_df(spark), lambda: mq.metric_changepoint(spark, "unused")
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_sum" in plan, plan


def test_holt_folds_in_codegen_no_python(spark):
    """A53: the coupled recursion is a struct-accumulator `aggregate`
    expression — JVM-side, no Arrow/python eval, two exchanges."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq, _metric_df(spark), lambda: mq.metric_holt(spark, "unused")
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_runs_test_signs_and_runs_in_row(spark):
    """A55: signs/runs/counts all ride higher-order functions inside the
    per-series row — no join, no python, two exchanges."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq, _metric_df(spark), lambda: mq.metric_runs_test(spark, "unused")
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_dim_stats_single_partial_combined_exchange(spark):
    """N15: one posexplode into a partial-combined hash aggregate — the
    exchange carries 64×cores partial rows, never the exploded corpus."""
    from project_obsidian_core_spark.plans import datapipe_queries as dq

    emb = spark.createDataFrame(
        [(i, [float(i % 7) / 10 - 0.3] * 8) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    plan = _with_fake_load(
        dq, emb, lambda: dq.embedding_dim_stats(spark, "unused")
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_sum" in plan, plan
    assert "Generate" in plan, plan


def test_q2_q20_reshapes_scan_fact_once(spark):
    """R23/R24: the per-part min/total must ride a window over the
    reduced relation — the re-aggregated join draft recomputed the
    offers subplan, i.e. a SECOND full lineitem scan at 100 TB."""
    from project_obsidian_core_spark.plans import relational_queries as rq

    for fn in (rq.min_cost_supplier, rq.dominant_suppliers):
        df = fn(spark, "/root/testdata/sf0.001")
        plan = _plan(df)
        assert plan.count("lineitem.parquet") == 1, (fn.__name__, plan)
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan, (fn.__name__, plan)  # dims broadcast


def test_type_affinity_reduces_before_pairing(spark):
    """A56: the pair join runs on the distinct (user, type) relation and
    the count relations broadcast — no cartesian, no raw-corpus join."""
    from project_obsidian_core_spark.plans import behavior_queries as bq

    ev = _metric_df(spark).withColumnRenamed("value", "v").selectExpr(
        "user_id", "event_type", "ts", "monotonically_increasing_id() as event_id",
        "v as value", "'{}' as props"
    )
    plan = _with_fake_load(
        bq, ev, lambda: bq.events_type_affinity(spark, "unused")
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_rrf_fusion_is_one_outer_join_one_window(spark):
    """N16: after the two index probes the fuse itself adds exactly one
    join and one ranking window over |q|·2k rows."""
    from project_obsidian_core_spark.plans import datapipe_queries as dq

    df = dq.knn_rrf_fusion(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan or "full_outer" in plan.lower(), plan


def test_trigram_paths_single_window_take_ordered(spark):
    """A59: both lags share ONE user-keyed window sort; the top-k is
    TakeOrdered, never a global sort of the full path relation."""
    from project_obsidian_core_spark.plans import behavior_queries as bq

    ev = _metric_df(spark).selectExpr(
        "user_id", "event_type", "ts",
        "monotonically_increasing_id() as event_id", "value", "'{}' as props"
    )
    real = bq.load
    bq.load = lambda s, d, t: ev
    try:
        plan = _plan(bq.events_trigram_paths(spark, "unused"))
    finally:
        bq.load = real
    assert plan.count("Window") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_embedding_outliers_mean_broadcasts(spark):
    """N18: the 64-row centroid relation must broadcast onto the explode
    — a shuffled join here would re-key the full exploded corpus."""
    from project_obsidian_core_spark.plans import datapipe_queries as dq

    emb = spark.createDataFrame(
        [(i, [float(i % 7) / 10 - 0.3] * 8) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    plan = _with_fake_load(
        dq, emb, lambda: dq.embedding_outliers(spark, "unused")
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_stickiness_fans_out_reduced_relation_only(spark):
    """A58: the 30x fan-out explodes the DISTINCT (user, day) relation,
    never the raw event corpus — the Generate must sit above a
    distinct aggregate, and the plan stays python-free."""
    from project_obsidian_core_spark.plans import behavior_queries as bq

    ev = _metric_df(spark).selectExpr(
        "user_id", "event_type", "ts",
        "monotonically_increasing_id() as event_id", "value", "'{}' as props"
    )
    real = bq.load
    bq.load = lambda s, d, t: ev
    try:
        plan = _plan(bq.events_stickiness(spark, "unused"))
    finally:
        bq.load = real
    assert "Generate explode" in plan or "Generate" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the explode's child chain must include the distinct aggregate
    gen_pos = plan.find("Generate")
    assert "HashAggregate" in plan[gen_pos:], plan


def test_kendall_pair_space_stays_inside_join_groups(spark):
    """A65: exactly three joins — hour-grid alignment, the pair-keyed
    self-join whose within-group range predicate generates the C(n,2)
    pair space INSIDE codegen (window-bounded groups, the A48 rule's
    bounded case), and the broadcast n-per-pair attach.  The pair space
    must be consumed by a map-side-combined aggregate, never python
    (the interpreted HOF formulations measured 4-7x slower)."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    real = mq.load
    mq.load = lambda s, d, t: _metric_df(spark)
    try:
        df = mq.metric_kendall_tau(spark, "unused")
        plan = _plan(df)
        # the aligned grid `al` is consumed three times (pair left, pair
        # right, n-per-pair), so its alignment join plans three times →
        # 5 join nodes total
        assert (
            plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 5
        ), plan
        assert "partial_count" in plan or "partial_sum" in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the CORPUS work below the joins must execute ONCE: AQE dedupes
        # the identical grid-aggregate stages at runtime (visible only in
        # the final adaptive plan, hence collect first)
        df.collect()
        final = _plan(df)
        assert "ReusedExchange" in final or "ReusedQueryStage" in final, final
    finally:
        mq.load = real


def test_pettitt_rank_algebra_no_pair_loop(spark):
    """A66: the ΣΣ sgn pair sum must collapse to windows over the reduced
    grid — no join, no python, two exchanges (grid agg + series windows);
    the naive formulation is an O(H²)-per-split triple loop."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq, _metric_df(spark), lambda: mq.metric_pettitt(spark, "unused")
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quantile_normalize_reference_broadcasts(spark):
    """A67: the per-rank reference (≤ max-series-length rows) must come
    back as a BROADCAST join — a sort-merge join would shuffle the full
    grid a second time keyed on rank."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq,
        _metric_df(spark),
        lambda: mq.metric_quantile_normalize(spark, "unused"),
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mannwhitney_ranks_never_materialize(spark):
    """A64: ranks ride the per-(type, value) REDUCED relation — one
    corpus-wide aggregate exchange plus the per-type window exchange, no
    join, no python, no per-row rank materialization."""
    from project_obsidian_core_spark.plans import analytics_ext_queries as axq

    plan = _with_fake_load(
        axq,
        _metric_df(spark),
        lambda: axq.events_mannwhitney(spark, "unused"),
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_spearman_no_pair_space_one_alignment_join(spark):
    """A68 (queued): Spearman needs NO pair space at all — rank windows
    per series, ONE alignment join on the reduced grid, moments in one
    map-side-combined aggregate, no python."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq, _metric_df(spark), lambda: mq.metric_spearman(spark, "unused")
    )
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mann_kendall_pair_join_plus_broadcast_ties(spark):
    """A69 (queued): one pair-keyed self-join (window-bounded groups, the
    A65 shape) + one broadcast attach of the per-series tie sums."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq, _metric_df(spark), lambda: mq.metric_mann_kendall(spark, "unused")
    )
    assert plan.count("SortMergeJoin") == 1, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zipf_octaves_no_global_token_window(spark):
    """X21 (queued): the token relation must ONLY feed hash aggregates —
    the sole single-partition exchange carries the per-COUNT relation
    (≤|distinct counts| rows), and octave membership is a broadcast
    range join (plans as BroadcastNestedLoopJoin against the 41-row
    boundary table — correct for a non-equi predicate on a tiny side)."""
    import datetime as dt  # noqa: F401

    from project_obsidian_core_spark.plans import curation_queries as cuq

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{j % 17}" for j in range(i % 30 + 3)), "en", "s", 9)
            for i in range(50)
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    real = cuq.load
    cuq.load = lambda s, d, t: docs
    try:
        plan = _plan(cuq.text_zipf_octaves(spark, "unused"))
    finally:
        cuq.load = real
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kaplan_meier_timeline_windows_are_tiny(spark):
    """A70 (queued): the per-customer gap window rides the orders
    projection; the two single-partition exchanges carry only the
    ≤|distinct durations| timeline; omax attaches as a broadcast."""
    import datetime as dt

    from project_obsidian_core_spark.plans import relational_queries as rqq

    t0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (i, i % 7, "O", 10.0, t0 + dt.timedelta(days=i % 200))
            for i in range(300)
        ],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    )
    real = rqq.load
    rqq.load = lambda s, d, t: orders
    try:
        plan = _plan(rqq.orders_kaplan_meier(spark, "unused"))
    finally:
        rqq.load = real
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    assert plan.count("Exchange SinglePartition") == 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bollinger_rides_grid_windows_no_join(spark):
    """A72 (queued): the trailing band is two exchanges — grid aggregate
    + per-series window — no join, no python, breakout predicate in
    codegen integer algebra."""
    from project_obsidian_core_spark.plans import metrics_queries as mq

    plan = _with_fake_load(
        mq, _metric_df(spark), lambda: mq.metric_bollinger(spark, "unused")
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_session_entry_exit_one_user_exchange(spark):
    """A71 (queued): sessionization + the two row_numbers + the session
    fold all ride ONE per-user exchange; the profile re-aggregation is
    the only other one. No join, no python."""
    import datetime as dt

    from project_obsidian_core_spark.plans import pipeline_queries as pqq

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, i % 9, t0 + dt.timedelta(minutes=11 * i),
             "view" if i % 2 else "click", float(i % 13), "{}")
            for i in range(300)
        ],
        ["event_id", "user_id", "ts", "event_type", "value", "props"],
    )
    real = pqq.load
    pqq.load = lambda s, d, t: ev
    try:
        plan = _plan(pqq.events_session_entry_exit(spark, "unused"))
    finally:
        pqq.load = real
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_reciprocity_mutual_check_is_hash_join(spark):
    """G7 (queued): the reverse-pair mutual probe and the per-node attach
    must be HASH joins on the |V|·k directed relation; the only
    nested-loop joins are brute_force_topk's deliberate broadcast cross
    scoring (the knn_brute gate-slice pattern), never a shuffle
    cartesian, never python."""
    from project_obsidian_core_spark.plans import datapipe_queries as dqq

    emb = spark.createDataFrame(
        [(i, [float((i * j) % 7 - 3) for j in range(8)]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    real = dqq.load
    dqq.load = lambda s, d, t: emb
    try:
        plan = _plan(dqq.knn_reciprocity(spark, "unused"))
    finally:
        dqq.load = real
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 2, plan
    assert "CartesianProduct" not in plan, plan
    for frag in plan.split("BroadcastNestedLoopJoin")[1:]:
        assert "Cross" in frag[:40] or "Inner" in frag[:40]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_growth_no_collected_id_buffer(spark):
    """X23 (rewritten round 11, the r10 verdict's #1): the checkpoint
    thresholds are distributed order statistics — the plan must contain
    NO collect_list/sort_array (the corpus-sized single-buffer shape the
    rewrite removes).  The only single-partition work is the per-bucket
    count fold (|id-range|/4096 rows) and the final 5-row pivot; the
    threshold read is a (bucket, checkpoint)-partitioned row_number over
    ≤5 buckets' rows, and the vocab aggregate takes thresholds as a
    broadcast."""
    from project_obsidian_core_spark.plans import curation_queries as cuq

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * 7 + j) % 41}" for j in range(5)), "en", "s", 9)
            for i in range(200)
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    real = cuq.load
    cuq.load = lambda s, d, t: docs
    try:
        df = cuq.vocab_growth(spark, "unused")
        plan = _plan(df)
    finally:
        cuq.load = real
    assert "collect_list" not in plan, plan
    assert "sort_array" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # and the rewrite preserves the semantics on an in-memory corpus:
    # n=200 → thresholds at ranks 13, 25, 50, 100, 200 → doc ids 12, 24,
    # 49, 99, 199; vocab is 41 wrapping terms, all seen by doc 12's window
    rows = {r["sixteenth"]: r for r in df.collect()}
    assert [rows[k]["checkpoint_docs"] for k in (1, 2, 4, 8, 16)] == [
        13, 25, 50, 100, 200,
    ]
    assert [rows[k]["threshold_doc_id"] for k in (1, 2, 4, 8, 16)] == [
        12, 24, 49, 99, 199,
    ]
    assert rows[16]["vocab_size"] == 41


def test_customer_rfm_windows_are_bucket_partitioned(spark):
    """A73 (hardened round 11): the quartile thresholds are distributed
    order statistics — monetary_cents has ~|customers| distinct values,
    so the plan must contain NO cumulative window partitioned on the
    measure alone over the per-distinct-VALUE relation.  The only
    per-measure global window runs over the BUCKET fold (v div 4096 —
    value-range/4096 rows); the within-bucket fold is (measure, bkt, k)
    partitioned with ≤4096 distinct values per partition by
    construction; no collected buffers, no python evals."""
    from project_obsidian_core_spark.plans import behavior_queries as bq

    df = bq.customer_rfm(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "collect_list" not in plan and "sort_array" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # every window spec either includes the bucket key (the bounded
    # within-bucket fold) or runs on the bucket-fold relation whose sort
    # key is bkt — no windowspecdefinition sorting raw v without bkt
    # partitioning
    import re

    for m in re.finditer(r"Window \[[^\]]*windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "v#" in spec.split("],")[0]:
            assert "bkt" in spec, spec


def test_part_supplier_counts_broadcasts_deny_and_dim(spark):
    """R28: the NOT-IN deny list must decorrelate to a broadcast LEFT
    ANTI join and the part dim must broadcast — the fact side never
    shuffles for either."""
    from project_obsidian_core_spark.plans import relational_queries as rq

    plan = _plan(rq.part_supplier_counts(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_sorted_neighborhood_candidates_have_no_join(spark):
    """D24: the |docs|·w candidate stage must be LEAD windows, not a
    rank-band self-join (the join form degenerated to O(n²/block) probe
    work on coarse blocks — 34 s vs 13.8 s at sf0.1, SCALE.md)."""
    from project_obsidian_core_spark.plans import datapipe_queries as dq

    plan = _plan(dq.dedup_sorted_neighborhood(spark, "/root/testdata/sf0.001"))
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_customer_abc_windows_are_bucket_partitioned(spark):
    """A76: same contract as A73 — no window sorts raw per-customer
    values without the bucket key in its partitioning; the only
    unpartitioned window runs over the bucket fold."""
    import re

    from project_obsidian_core_spark.plans import behavior_queries as bq

    plan = _plan(bq.customer_abc(spark, "/root/testdata/sf0.001"))
    assert "collect_list" not in plan and "sort_array" not in plan
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        first = spec.split(",")[0]
        # a window ordered/partitioned on raw v must carry bkt
        if re.match(r"\s*v#\d+", first):
            assert "bkt" in spec, spec
