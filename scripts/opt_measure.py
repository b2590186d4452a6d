"""Optimization-round measurement harness (guide §1).

For each named query: capture .explain("formatted") to
plans/$SPARK_GRAFT_PLANS_ROUND/<q>_<tag>.txt (round dir defaults to r17 —
ADVICE r16: derive the directory instead of hardcoding one round) and time
the computation through the noop sink (cold + N warm, same methodology as
bench.py), with the job labelled in the UI.

Usage: python scripts/opt_measure.py <tag> <query> [query ...]
       SPARK_GRAFT_OPT_REPEAT=3  warm repeats (default 3)
       SPARK_GRAFT_SF_DIR        data dir (default /root/testdata/sf0.1)
       SPARK_GRAFT_PLANS_ROUND   plans subdir (default r17)

Prints one line per query:  <name> cold=<s> warm=[...] min=<s>
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from project_obsidian_core_spark.plans.registry import QUERIES  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_OPT_REPEAT", "3"))
    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17")
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = build_session(app_name=f"obsidian-opt-{tag}")
    # warmup: session init, parquet footers, codegen
    QUERIES["qan_distinct_metrics"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        runs = []
        for i in range(1 + repeat):
            spark.sparkContext.setJobDescription(f"{tag}:{name}:{i}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        # session hygiene between queries (mirrors bench.py)
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()
        out[name] = {
            "cold": runs[0],
            "warm": runs[1:],
            "warm_med": round(statistics.median(runs[1:]), 4) if runs[1:] else None,
            "warm_min": min(runs[1:]) if runs[1:] else None,
        }
        print(
            f"{name:32s} cold={runs[0]:7.2f} warm={runs[1:]} "
            f"min={min(runs[1:]) if runs[1:] else runs[0]:.2f}",
            flush=True,
        )
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
