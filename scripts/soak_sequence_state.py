"""Round-10 soak: the ordered-sequence state family (T20/T21/T22) at
high per-key activity.

The gate corpora hold ~100-600 events/user; a pathological key (bot
account, shared device id) can hold 10^5-10^6. This drives the pure
production fold code (the applyInPandasWithState wrappers only shuttle
the same lists through Arrow) through 10^6 events on ONE key delivered
in 1,000-row micro-batches, measuring:

  * total fold wall (the state re-sort is O(n log n)/batch today —
    the documented production upgrade is a linear merge of the sorted
    state with the sorted batch; this soak quantifies the gap);
  * invariance: a shuffled batch order must produce the identical
    final sequence, transitions, funnel progress and sessions;
  * derived-view costs (transition recount, funnel walk, session split
    are each O(n) per emit).

Run: python scripts/soak_sequence_state.py
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_obsidian_core_spark.streaming.sequence_state import (  # noqa: E402
    funnel_progress,
    gap_sessions,
    merge_sequence,
    transition_counts,
)

N = 1_000_000
BATCH = 1_000
STAGES = ("view", "click", "purchase")
GAP_US = 1_800_000_000


def main() -> None:
    rng = random.Random(17)
    rows = []
    t = 0
    for i in range(N):
        t += rng.randrange(1, 3_000_000)  # 0-3 s spacing -> many sessions
        rows.append((t, i, rng.choice(["view", "click", "purchase", "error"])))
    batches = [rows[i : i + BATCH] for i in range(0, N, BATCH)]

    t0 = time.time()
    ts, eid, ty = [], [], []
    for b in batches:
        ts, eid, ty = merge_sequence(ts, eid, ty, b)
    fold_s = time.time() - t0

    t0 = time.time()
    tr = transition_counts(ty)
    tr_s = time.time() - t0
    t0 = time.time()
    fp = funnel_progress(ts, ty, STAGES, GAP_US)
    fp_s = time.time() - t0
    vals = [1] * len(ts)
    t0 = time.time()
    sess = gap_sessions(ts, vals, GAP_US)
    sess_s = time.time() - t0

    # arrival-order invariance on a 50k-row slice (full-size shuffle
    # would double the soak wall for no extra evidence)
    small = rows[:50_000]
    sb = [small[i : i + BATCH] for i in range(0, len(small), BATCH)]
    ts1, _, ty1 = [], [], []
    for b in sb:
        ts1, _, ty1 = merge_sequence(ts1, _, ty1, b)
    shuffled = sb[:]
    rng.shuffle(shuffled)
    ts2, _, ty2 = [], [], []
    for b in shuffled:
        ts2, _, ty2 = merge_sequence(ts2, _, ty2, b)
    assert (ts1, ty1) == (ts2, ty2)
    assert transition_counts(ty1) == transition_counts(ty2)
    assert funnel_progress(ts1, ty1, STAGES, GAP_US) == funnel_progress(
        ts2, ty2, STAGES, GAP_US
    )
    assert gap_sessions(ts1, [1] * len(ts1), GAP_US) == gap_sessions(
        ts2, [1] * len(ts2), GAP_US
    )

    print(
        {
            "events": N,
            "batches": len(batches),
            "merge_fold_s": round(fold_s, 2),
            "events_per_s": int(N / fold_s),
            "transition_recount_s": round(tr_s, 3),
            "funnel_walk_s": round(fp_s, 3),
            "session_split_s": round(sess_s, 3),
            "n_transitions_kinds": len(tr),
            "funnel_progress": fp,
            "n_sessions": len(sess),
        }
    )
    print("ALL SEQUENCE-STATE SOAK ASSERTIONS PASS")


if __name__ == "__main__":
    main()
