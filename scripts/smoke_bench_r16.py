"""One-off smoke of the r16 bench restructure (cold-only tier +
dynamic dedicated pass).  Shrinks BENCH_QUERIES to a 8-query subset,
fabricates a prior BENCH_LOCAL.json whose estimates push two
replay-harness queries into the cold-only tier, runs bench.main() at
sf0.01 with a small budget, and asserts on the written artifact.
Backs up / restores the real BENCH_LOCAL files around the run
(caller also keeps copies in /tmp/benchbak)."""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

SUBSET = [
    "qan_distinct_metrics",
    "global_status_pivot",
    "metric_series",
    "stream_funnel_evict",
    "stream_sessionize_evict",
    "dedup_prefix_pairs",
]

local = os.path.join(REPO, "BENCH_LOCAL.json")
prev = os.path.join(REPO, "BENCH_LOCAL.prev.json")
bak = {p: p + ".smokebak" for p in (local, prev)}
for p, b in bak.items():
    if os.path.exists(p):
        shutil.copy(p, b)

try:
    # fabricated prior: sf matches the smoke run (0.01); the two stream_*
    # queries + dedup_prefix_pairs clear COLD_ONLY_EST_S
    fake_prior = {
        "sf": 0.01,
        "queries": {
            "qan_distinct_metrics": 0.4,
            "global_status_pivot": 0.4,
            "metric_series": 0.5,
            "stream_funnel_evict": 12.0,
            "stream_sessionize_evict": 9.0,
            "dedup_prefix_pairs": 10.0,
        },
        "queries_cold": {
            "qan_distinct_metrics": 0.6,
            "global_status_pivot": 0.6,
            "metric_series": 0.7,
            "stream_funnel_evict": 8.0,
            "stream_sessionize_evict": 7.0,
            "dedup_prefix_pairs": 11.0,
        },
    }
    with open(local, "w") as fh:
        json.dump(fake_prior, fh)

    bench.BENCH_QUERIES = SUBSET
    bench.R1_SUBSET = ["qan_distinct_metrics"]
    os.environ["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.01"
    os.environ["SPARK_GRAFT_BENCH_BUDGET_S"] = "420"
    os.environ["SPARK_GRAFT_BENCH_REPEAT"] = "3"

    bench.main()

    out = json.load(open(local))
    co = set(out["cold_only"])
    assert co == {
        "stream_funnel_evict",
        "stream_sessionize_evict",
        "dedup_prefix_pairs",
        # classic DEDICATED_TAIL members are always in the tier
        "dedup_edit_distance",
        "dedup_recall_report",
    }, co
    ws = out["warm_source"]
    # only tier members that actually RAN get a warm_source entry
    assert set(ws) <= co and ws, ws
    for q in ws:
        assert ws[q] in ("dedicated", "cold_fallback"), (q, ws[q])
        assert q in out["queries"] and q in out["queries_cold"], q
        if ws[q] == "dedicated":
            assert q in out["queries_dedicated"], q
            assert out["warm_repeats"]["per_query"][q] >= 1
        else:
            assert out["warm_repeats"]["per_query"][q] == 0
            assert out["queries"][q] == out["queries_cold"][q]
    pq = out["warm_repeats"]["per_query"]
    for q in out["queries"]:
        if q not in co and q != "stream_cdc_merge":
            assert pq.get(q, 0) >= 1, (q, pq.get(q))
    print("SMOKE OK", json.dumps({"warm_source": ws, "skipped": out["skipped"],
                                  "dedicated": list(out["queries_dedicated"])}))
finally:
    for p, b in bak.items():
        if os.path.exists(b):
            shutil.move(b, p)
        elif os.path.exists(p):
            os.remove(p)
