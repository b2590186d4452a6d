"""Oracle-gate the ROUND-QUEUED (implemented, not yet registered)
operators — the same compare as scripts/oracle_check.py, against an
explicit (fn, oracle) list instead of the registry.

Operators land here when the driver's 50-slot gate window is full for
the current round (registration would displace the stale-row refresh).
Round 11 promoted five of the eight r10-queued operators and
implemented twenty-three more; the twenty-six below are staged
r12-r17 at ≤5 registrations per round (see the Block R11/R12 comments in
plans/registry.py and the staging plan in SCALE.md).

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
    operator (kept in lockstep with the 'Registration note' docstrings)."""
    from project_obsidian_core_spark.plans import analytics_ext_queries as ax
    from project_obsidian_core_spark.plans import behavior_queries as b
    from project_obsidian_core_spark.plans import curation_queries as cu
    from project_obsidian_core_spark.plans import datapipe_queries as d
    from project_obsidian_core_spark.plans import metrics_queries as m
    from project_obsidian_core_spark.plans import pipeline_queries as pl
    from project_obsidian_core_spark.plans import relational_queries as r
    from project_obsidian_core_spark.plans import streaming_queries as st

    return {
        # held from r10 for the r12 window (see Block R11, registry.py)
        "text_zipf_octaves": (
            cu.text_zipf_octaves,
            cu.ORACLE_text_zipf_octaves,
        ),
        "knn_reciprocity": (d.knn_reciprocity, d.ORACLE_knn_reciprocity),
        "events_session_entry_exit": (
            pl.events_session_entry_exit,
            pl.ORACLE_events_session_entry_exit,
        ),
        # implemented in r11, queued for r12+ registration
        "customer_rfm": (b.customer_rfm, b.ORACLE_customer_rfm),
        "part_supplier_counts": (
            r.part_supplier_counts,
            r.ORACLE_part_supplier_counts,
        ),
        "customer_order_histogram": (
            r.customer_order_histogram,
            r.ORACLE_customer_order_histogram,
        ),
        "metric_seasonal_hod": (
            m.metric_seasonal_hod,
            m.ORACLE_metric_seasonal_hod,
        ),
        "text_gram_novelty": (
            cu.text_gram_novelty,
            cu.ORACLE_text_gram_novelty,
        ),
        "stream_bollinger": (st.stream_bollinger, m.ORACLE_metric_bollinger),
        "metric_drawdown": (m.metric_drawdown, m.ORACLE_metric_drawdown),
        "part_value_concentration": (
            r.part_value_concentration,
            r.ORACLE_part_value_concentration,
        ),
        "lang_id_confusion": (d.lang_id_confusion, d.ORACLE_lang_id_confusion),
        "dedup_sorted_neighborhood": (
            d.dedup_sorted_neighborhood,
            d.ORACLE_dedup_sorted_neighborhood,
        ),
        "stream_drawdown": (st.stream_drawdown, m.ORACLE_metric_drawdown),
        "knn_link_prediction": (
            d.knn_link_prediction,
            d.ORACLE_knn_link_prediction,
        ),
        "dedup_edit_distance": (
            d.dedup_edit_distance,
            d.ORACLE_dedup_edit_distance,
        ),
        "customer_abc": (b.customer_abc, b.ORACLE_customer_abc),
        "stream_mannwhitney": (
            st.stream_mannwhitney,
            ax.ORACLE_events_mannwhitney,
        ),
        "knn_khop_reachability": (
            d.knn_khop_reachability,
            d.ORACLE_knn_khop_reachability,
        ),
        "corpus_mixture_sample": (
            pl.corpus_mixture_sample,
            pl.ORACLE_corpus_mixture_sample,
        ),
        "events_funnel_sweep": (
            b.events_funnel_sweep,
            b.ORACLE_events_funnel_sweep,
        ),
        "media_audio_energy": (
            d.media_audio_energy,
            d.ORACLE_media_audio_energy,
        ),
        "media_scene_cuts": (d.media_scene_cuts, d.ORACLE_media_scene_cuts),
        "metric_completeness_report": (
            m.metric_completeness_report,
            m.ORACLE_metric_completeness_report,
        ),
        "events_growth_accounting": (
            b.events_growth_accounting,
            b.ORACLE_events_growth_accounting,
        ),
        "events_mix_drift": (b.events_mix_drift, b.ORACLE_events_mix_drift),
        "media_image_histogram": (
            d.media_image_histogram,
            d.ORACLE_media_image_histogram,
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
