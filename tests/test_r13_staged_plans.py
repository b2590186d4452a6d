"""Plan-shape pins for the round-13 staged operators — the oracle gate
proves VALUES; these pin the physical properties the 100 TB story
depends on (broadcasts actually broadcast, pushdown actually reaches
the scan), so a regression in plan shape fails loudly before it becomes
a silent shuffle explosion."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cms_counters_broadcast_to_probe(spark):
    from project_obsidian_core_spark.plans.analytics_ext_queries import (
        events_cms_heavy,
    )

    plan = _plan(events_cms_heavy(spark, SF))
    # the 4096-row counter table must reach the candidate keys as a
    # broadcast, never a shuffle join
    assert "BroadcastHashJoin" in plan


def test_sq8_range_broadcast(spark):
    from project_obsidian_core_spark.plans.datapipe_queries import (
        embedding_sq8,
    )

    plan = _plan(embedding_sq8(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_winsorize_single_exchange_per_metric(spark):
    from project_obsidian_core_spark.plans.metrics_queries import (
        metric_winsorize,
    )

    plan = _plan(metric_winsorize(spark, SF))
    # the bounds join is a broadcast; the rank/clip windows share the
    # metric_name partitioning (no global window in this plan)
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan


def test_aging_filter_pushed_to_scan(spark):
    from project_obsidian_core_spark.plans.relational_queries import (
        orders_aging_buckets,
    )

    plan = _plan(orders_aging_buckets(spark, SF))
    assert "PushedFilters" in plan and "o_orderstatus" in plan


def test_rake_report_window_rides_reduced_relation(spark):
    from project_obsidian_core_spark.plans.datapipe_queries import (
        text_rake_keywords,
    )

    plan = _plan(text_rake_keywords(spark, SF))
    # corpus-sized aggregates are hash aggregates with partial combine
    assert plan.count("HashAggregate") >= 4
