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

    Round 15 DRAINED the r14 queue: the 7 operators staged at the r14
    close (A106 funnel_stage_latency, P19 corpus_mixture_temperature,
    T41 stream_language_mixture, X30 text_ttr_curve, A107
    events_conversion_paths, N24 embedding_centroid_probe, A108
    nation_supplier_hhi) were registered wholesale as Block R15
    (plans/registry.py) per the r14 verdict's Next #2 — the rotation's
    unrecorded-first rule gives each an official green row immediately.
    The queue is now EMPTY; new operators should be registered directly
    while the unrecorded count stays under the 50-slot window, and only
    staged here when it would overflow.
    """
    return {}


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
