"""r15 verdict #3 probe: stream_funnel_evict read 45.8 s in the r15
bench suite vs 20.6 s in a same-tree sibling session — 2.2x on the SAME
query, code and data.  Attribute it: fixed replay-chunk count vs GC vs
host regime.  Runs the query 4x in ONE fresh session (plus the spin
canary before/after and JVM GC time deltas), printing one JSON line per
run so the swing's shape (position-in-session vs host) is mechanical.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from project_obsidian_core_spark.plans.registry import QUERIES  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAME = os.environ.get("PROBE_QUERY", "stream_funnel_evict")
REPEATS = int(os.environ.get("PROBE_REPEATS", "4"))


def spin_ms() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    return round((time.perf_counter() - t0) * 1000, 1)


def gc_ms(spark) -> int:
    # sum of GC time across the local JVM's executors (driver == executor
    # in local mode): a per-run delta that dwarfs the wall delta says GC
    jsc = spark.sparkContext._jsc.sc()
    try:
        execs = jsc.statusTracker().getExecutorInfos()
        return sum(e.totalGCTime() for e in execs)
    except Exception:
        return -1


def main() -> None:
    spark = build_session(app_name="probe-funnel-swing")
    # absorb session startup on an unrelated cheap query
    QUERIES["qan_distinct_metrics"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    for i in range(REPEATS):
        s0 = spin_ms()
        g0 = gc_ms(spark)
        t0 = time.time()
        QUERIES[NAME](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        g1 = gc_ms(spark)
        s1 = spin_ms()
        print(
            json.dumps(
                {
                    "query": NAME,
                    "run": i,
                    "wall_s": round(wall, 2),
                    "gc_delta_ms": (g1 - g0) if g0 >= 0 else None,
                    "spin_before_ms": s0,
                    "spin_after_ms": s1,
                    "load1": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
