"""Round-10 soak: the two-sided as-of state (T24) at high per-key
activity.

The gate corpus holds ~13 clicks + ~13 purchases per user; a
pathological key (bot account, shared device id) can hold 10^5-10^6 of
each. This drives the pure production fold code (the
applyInPandasWithState wrapper only shuttles the same lists through
Arrow) through 10^5 clicks + 10^5 purchases on ONE key delivered in
1,000-row mixed micro-batches, measuring:

  * total two-sided fold wall (click merge is the soaked T20 timsort
    two-run merge; the purchase side is a dict max-fold + re-sort);
  * per-emit re-match cost (one bisect per click — O(C log P), the
    term that multiplies by EMITS, not by batches absorbed);
  * invariance: a shuffled batch order must produce identical final
    state and identical drained matches (the revision guarantee);
  * reference equality: the drained matches must equal a brute-force
    python as-of join.

Run: python scripts/soak_asof_state.py
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_obsidian_core_spark.streaming.sequence_state import (  # noqa: E402
    asof_lookup,
    fold_purchases,
    merge_sequence,
)

N_CLICKS = 100_000
N_PURCH = 100_000
BATCH = 1_000


def main() -> None:
    rng = random.Random(23)
    clicks = []
    t = 0
    for i in range(N_CLICKS):
        t += rng.randrange(1, 2_000_000)
        clicks.append((t, i, rng.randrange(100, 100_000)))
    purchases = []
    t = rng.randrange(0, 1_000_000)
    for i in range(N_PURCH):
        t += rng.randrange(1, 2_000_000)
        purchases.append((t, rng.randrange(100, 100_000)))

    rows = [("L",) + c for c in clicks] + [("R", p[0], -1, p[1]) for p in purchases]
    rng.shuffle(rows)
    batches = [rows[i : i + BATCH] for i in range(0, len(rows), BATCH)]

    t0 = time.time()
    c_ts, c_eid, c_c = [], [], []
    p_ts, p_c = [], []
    for b in batches:
        lf = [(r[1], r[2], r[3]) for r in b if r[0] == "L"]
        rt = [(r[1], r[3]) for r in b if r[0] == "R"]
        if lf:
            c_ts, c_eid, c_c = merge_sequence(c_ts, c_eid, c_c, lf)
        if rt:
            p_ts, p_c = fold_purchases(p_ts, p_c, rt)
    fold_s = time.time() - t0

    t0 = time.time()
    hits = asof_lookup(c_ts, p_ts, p_c)
    match_s = time.time() - t0

    # brute-force reference: two-pointer sweep over the sorted sides
    t0 = time.time()
    ref = []
    j = -1
    for ct in c_ts:
        while j + 1 < len(p_ts) and p_ts[j + 1] <= ct:
            j += 1
        ref.append((p_ts[j], p_c[j]) if j >= 0 else (None, None))
    sweep_s = time.time() - t0
    assert hits == ref, "bisect matches must equal the two-pointer sweep"

    # arrival-order invariance: a different shuffle rebuilds identical
    # state and identical drained matches
    rng2 = random.Random(99)
    rows2 = list(rows)
    rng2.shuffle(rows2)
    c2_ts, c2_eid, c2_c = [], [], []
    p2_ts, p2_c = [], []
    for i in range(0, len(rows2), BATCH):
        b = rows2[i : i + BATCH]
        lf = [(r[1], r[2], r[3]) for r in b if r[0] == "L"]
        rt = [(r[1], r[3]) for r in b if r[0] == "R"]
        if lf:
            c2_ts, c2_eid, c2_c = merge_sequence(c2_ts, c2_eid, c2_c, lf)
        if rt:
            p2_ts, p2_c = fold_purchases(p2_ts, p2_c, rt)
    assert (c2_ts, c2_eid, c2_c) == (c_ts, c_eid, c_c)
    assert (p2_ts, p2_c) == (p_ts, p_c)
    assert asof_lookup(c2_ts, p2_ts, p2_c) == hits

    n_matched = sum(1 for h in hits if h[0] is not None)
    print(
        f"asof-state soak: {N_CLICKS} clicks + {N_PURCH} purchases on one key, "
        f"{len(batches)} mixed batches of {BATCH}\n"
        f"  two-sided fold total: {fold_s:.1f}s "
        f"({len(rows) / fold_s:,.0f} rows/s absorbed)\n"
        f"  per-emit re-match (bisect): {match_s * 1000:.0f}ms for "
        f"{N_CLICKS} clicks ({N_CLICKS / match_s:,.0f} lookups/s)\n"
        f"  two-pointer sweep reference: {sweep_s * 1000:.0f}ms\n"
        f"  matched {n_matched}/{N_CLICKS}; shuffled-arrival state + "
        f"matches identical: OK"
    )


if __name__ == "__main__":
    main()
