"""Benchmark harness (driver contract).

Runs the headline queries from BASELINE.md ("Benchmark target") at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line.

Each query is materialized through the noop sink — full computation, no
driver-side collect cost — after a warmup query that absorbs session/JIT
startup. Each query is timed SPARK_GRAFT_BENCH_REPEAT times (default 2)
and the minimum is reported: this measures the warm path (codegen cached,
parquet footers read, and for dedup_minhash_lsh the persisted LSH index
reused — intentional, since an LSH index is built once and queried many
times in production).
"""

from __future__ import annotations

import json
import os
import re
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
    "knn_brute",              # broadcast cosine top-k
    "knn_lsh",                # multi-probe bucketed ANN
    "media_features",         # Arrow-batched mapInPandas decode
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_session(app_name="obsidian-spark-bench")

    # warmup: session init, parquet footer reads, codegen
    QUERIES["qan_distinct_metrics"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(repeat):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
