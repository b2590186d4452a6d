"""Last-touch attribution: lookback expiry, per-user isolation, and
same-instant tie determinism (event_id order)."""

from __future__ import annotations

import datetime as dt

from project_obsidian_core_spark.plans import behavior_queries as BH


def _run(spark, rows, tmp_path):
    # materialize a synthetic events parquet so the query runs unmodified
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    p = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{p}/events.parquet")
    out = BH.events_attribution(spark, p)
    return {r["channel"]: (r["n_purchases"], r["revenue_cents"]) for r in out.collect()}


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_lookback_expiry_goes_direct(spark, tmp_path):
    rows = [
        (1, _t("2024-01-01 00:00:00"), 1, "click", 0.0, '{"k": 0}'),
        # 8 days later: the click is stale -> direct
        (2, _t("2024-01-09 00:00:01"), 1, "purchase", 5.0, '{"k": 1}'),
        # fresh view 1 minute before the second purchase
        (3, _t("2024-01-09 00:10:00"), 1, "view", 0.0, '{"k": 6}'),
        (4, _t("2024-01-09 00:11:00"), 1, "purchase", 7.0, '{"k": 2}'),
    ]
    got = _run(spark, rows, tmp_path)
    assert got == {"direct": (1, 500), "view_c2": (1, 700)}


def test_users_are_isolated_and_ties_break_by_event_id(spark, tmp_path):
    t = _t("2024-01-01 12:00:00")
    rows = [
        # user 1: click and purchase at the SAME instant — the click has a
        # smaller event_id, so it precedes the purchase in window order
        (10, t, 1, "click", 0.0, '{"k": 3}'),
        (11, t, 1, "purchase", 1.0, '{"k": 0}'),
        # user 2 has no touches at all
        (20, t, 2, "purchase", 2.0, '{"k": 0}'),
    ]
    got = _run(spark, rows, tmp_path)
    assert got == {"click_c3": (1, 100), "direct": (1, 200)}
