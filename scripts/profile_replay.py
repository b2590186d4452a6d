"""Profile streaming replay queries (guide §1): per-micro-batch duration
breakdown via StreamingQueryListener, plus wall time per query.

Usage: python scripts/profile_replay.py <query> [query ...]
       SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)

Prints per query: wall seconds, then per-batch durationMs components
(addBatch, getBatch, latestOffset, queryPlanning, walCommit, commitOffsets)
and state-store metrics from the progress events.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from project_obsidian_core_spark.plans.registry import QUERIES  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402


class ProgressTap(StreamingQueryListener):
    def __init__(self):
        self.events = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        try:
            self.events.append(json.loads(event.progress.json))
        except Exception:
            pass

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="obsidian-profile-replay")
    tap = ProgressTap()
    spark.streams.addListener(tap)
    # warmup
    QUERIES["qan_distinct_metrics"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        tap.events.clear()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        print(f"\n=== {name}: wall={wall:.2f}s  batches={len(tap.events)}")
        tot = {}
        for ev in tap.events:
            dur = ev.get("durationMs", {})
            rows = ev.get("numInputRows", 0)
            parts = " ".join(f"{k}={v}" for k, v in sorted(dur.items()))
            print(f"  batch={ev.get('batchId')} rows={rows} {parts}")
            for k, v in dur.items():
                tot[k] = tot.get(k, 0) + v
            for so in ev.get("stateOperators", []) or []:
                cm = so.get("customMetrics", {})
                print(
                    "    state: commitMs={} rowsTotal={} mem={} files={}".format(
                        so.get("commitTimeMs"),
                        so.get("numRowsTotal"),
                        so.get("memoryUsedBytes"),
                        cm.get("numStateStoreInstances", ""),
                    )
                )
        dur_sum = sum(tot.values()) / 1000.0
        print(f"  totals(s): {json.dumps({k: round(v/1000.0, 2) for k, v in sorted(tot.items())})}")
        print(f"  progress-accounted={dur_sum:.2f}s of wall={wall:.2f}s (gap={wall-dur_sum:.2f}s)")


if __name__ == "__main__":
    main()
