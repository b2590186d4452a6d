"""Soak the watermark-eviction state bound (round 12): a long synthetic
stream of hourly session bursts for U users, replayed one burst per
micro-batch through BOTH session modes:

- evict=False (the keep-everything T22 twin): every emit re-describes the
  user's WHOLE session history, so the per-batch emitted-row volume (the
  observable proxy for state size) grows linearly with burst count.
- evict=True (T22e): closed sessions finalize once and leave state, so
  the per-batch live volume stays FLAT at O(users · open horizon).

Asserts: finals ∪ max-version live ≡ the batch sessionization (python
reference) at full length; final-batch live volume ≤ 2 rows/user; the
non-evict twin's final-batch volume ≥ bursts/2 rows/user (the contrast
that IS the claim).  Prints one JSON line for SCALE.md.

Usage: python scripts/soak_evict.py [users] [bursts]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_US = 1_700_000_000_000_000


def main() -> int:
    users = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    bursts = int(sys.argv[2]) if len(sys.argv) > 2 else 36

    from pyspark.sql import functions as F

    from project_obsidian_core_spark.session import build_session
    from project_obsidian_core_spark.streaming.sequence_state import (
        gap_sessions,
        streaming_gap_sessions,
    )

    spark = build_session(app_name="soak-evict", shuffle_partitions=16)
    tmp = tempfile.mkdtemp(prefix="soak_evict_")
    src = f"{tmp}/src"
    eid = 0
    rows_all = []
    for b in range(bursts):
        t0 = BASE_US + b * 3_600_000_000
        rows = []
        for u in range(users):
            for j in range(3):  # 3 events per burst, 10 s apart
                rows.append((u, eid, t0 + j * 10_000_000 + u, 100 * b + j))
                eid += 1
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts_us long, cents long"
        ).coalesce(1).write.mode("append").parquet(src)
        rows_all.extend(rows)
    gap_us = 60_000_000

    def run(evict: bool, qname: str):
        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts_us long, cents long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
        if evict:
            stream = stream.withWatermark("ts", "1 minute")
        out = streaming_gap_sessions(
            stream.select("user_id", "event_id", "ts", "cents"),
            gap_us,
            evict=evict,
        )
        t0 = time.time()
        q = (
            out.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt_{qname}")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        return spark.table(qname).collect(), time.time() - t0

    em_e, wall_e = run(True, "soak_evict")
    em_k, wall_k = run(False, "soak_keep")

    # per-version live volume = the observable state-size proxy
    def vol_by_version(em, live_only):
        v = {}
        for r in em:
            if live_only and r.asDict().get("is_final"):
                continue
            v[r["version"]] = v.get(r["version"], 0) + 1
        return v

    live_e = vol_by_version(em_e, True)
    live_k = vol_by_version(em_k, False)
    last_e = live_e[max(live_e)] / users
    last_k = live_k[max(live_k)] / users

    # drain correctness at full length
    finals = [r for r in em_e if r["is_final"]]
    live = [r for r in em_e if not r["is_final"]]
    vmax = {}
    for r in live:
        vmax[r["user_id"]] = max(vmax.get(r["user_id"], 0), r["version"])
    current = finals + [r for r in live if r["version"] == vmax[r["user_id"]]]
    got = sorted(
        (r["user_id"], r["session_idx"], r["session_start_us"],
         r["session_end_us"], r["n_events"], r["value_sum"])
        for r in current
    )
    per_user: dict[int, list] = {}
    for u, e, t, c in rows_all:
        per_user.setdefault(u, []).append((t, e, c))
    want = []
    for u, seq in per_user.items():
        seq.sort()
        for row in gap_sessions(
            [t for t, _, _ in seq], [c for _, _, c in seq], gap_us
        ):
            want.append((u, *row))
    assert got == sorted(want), "finals ∪ live != batch"
    fin_keys = [(r["user_id"], r["session_idx"]) for r in finals]
    assert len(fin_keys) == len(set(fin_keys)), "double finalization"
    assert last_e <= 2.0, f"evict live volume not bounded: {last_e}"
    assert last_k >= bursts / 2, f"keep twin unexpectedly small: {last_k}"

    print(json.dumps({
        "metric": "evict_soak",
        "users": users,
        "bursts": bursts,
        "events": len(rows_all),
        "final_batch_live_rows_per_user_evict": last_e,
        "final_batch_live_rows_per_user_keep": last_k,
        "n_finals": len(finals),
        "wall_evict_s": round(wall_e, 1),
        "wall_keep_s": round(wall_k, 1),
        "drain_equals_batch": True,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
