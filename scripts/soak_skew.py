"""Hot-entity skew soak for the window-partitioned temporal operators
(VERDICT r2 item 7).

One entity with 10^6 events is the case AQE's skew-join splitting does NOT
cover: window operators (asof_join's carry-forward, sessionize's lag) put
the whole entity in ONE task. This soak measures each operator twice on
identical row counts:

- hot:    all 1M events on a single entity (worst case — one task works)
- spread: the same 1M events over 1,000 entities (the balanced baseline)

and, for the operators with a pre-split mitigation, the mitigated variant
on the HOT layout. Prints one JSON line per measurement; numbers land in
SCALE.md.

Usage: python scripts/soak_skew.py [n_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from project_obsidian_core_spark.datapipe import pipeline as P  # noqa: E402
from project_obsidian_core_spark.operators import temporal_joins as TJ  # noqa: E402
from project_obsidian_core_spark.session import build_session  # noqa: E402


def timed(name, action, **extra):
    t0 = time.time()
    n = action()
    print(json.dumps({"op": name, "sec": round(time.time() - t0, 2), "rows": n, **extra}))


def make_events(spark, n, entities):
    """n events, ~10 s apart, spread over `entities` users (1 = hot)."""
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("u"), (F.col("id") % entities)).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") / entities).cast("long") * 10
            ).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.col("id").alias("event_id"),
        )
        .repartition(32)
        .persist()
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    for label, entities in (("hot", 1), ("spread", 1000)):
        ev = make_events(spark, n, entities)
        ev.count()
        left = ev.filter(F.col("event_id") % 2 == 0)
        right = ev.filter(F.col("event_id") % 2 == 1)

        timed(
            f"asof_join[{label}]",
            lambda: TJ.asof_join(left, right, on="user_id").count(),
            events=n,
        )
        timed(
            f"range_join[{label}]",
            lambda: TJ.range_join(
                left, right, on="user_id", span_us=60_000_000
            ).count(),
            events=n,
        )
        timed(
            f"sessionize[{label}]",
            lambda: P.sessionize(ev, gap="1 minute")
            .agg(F.max("session_idx"))
            .collect()
            and n,
            events=n,
        )
        if hasattr(P, "sessionize_presplit") and label == "hot":
            timed(
                f"sessionize_presplit[{label}]",
                lambda: P.sessionize_presplit(ev, gap="1 minute")
                .agg(F.max("session_idx"))
                .collect()
                and n,
                events=n,
            )
        if hasattr(TJ, "asof_join_presplit") and label == "hot":
            timed(
                f"asof_join_presplit[{label}]",
                lambda: TJ.asof_join_presplit(left, right, on="user_id").count(),
                events=n,
            )
        ev.unpersist()


if __name__ == "__main__":
    main()
