"""Round-10 soak: the two r9 streaming sketches PAST their exact regime.

`stream_quantiles_exact` (T18) and `stream_topk_exact` (T14) gate at
operating points where the sketch is still exact (no compaction fired /
capacity never exceeded); the approximation regime was unit-pinned on
small vectors only. This soak drives both through >= 10^6 rows per key
— the regime a real stream lives in — and asserts the EMITTED error
bound against the MEASURED error, the same evidence style as the
span-dedup x32 soak (r9 verdict next-#8).

Both sketches are pure-Python classes (the applyInPandasWithState
wrappers only shuttle their state through Arrow), so the soak exercises
the exact production fold code without a Spark session, batch-at-a-time
like micro-batches would deliver.

Claims checked:

KLL (capacity c=4096, 2,000,000 values/key):
  * for each q, the rank of the returned value in the EXACT sorted data
    is within err_bound of the target rank ceil(q*n)  (the deterministic
    KLL guarantee: each compaction at level i shifts any rank by < 2^i);
  * state size stays <= 2c + c*log2(n/c) longs (the docstring bound).

Space-Saving (capacity m=64, 1,000,000 observations, zipf-ish keys over
a 20,000-key space folded in 1,000-row micro-batches):
  * est >= true for every summarized key (overcount-only);
  * est - true <= err_bound per key (the bequeathed-count bound);
  * err_bound <= n/m (the global Metwally bound);
  * EVERY key with true count > n/m is present in the summary.

Run: python scripts/soak_sketches.py
"""

from __future__ import annotations

import bisect
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_obsidian_core_spark.streaming.quantile_state import (  # noqa: E402
    QUANTILE_CAPACITY,
    QUANTILE_QS,
    KllSketch,
)
from project_obsidian_core_spark.streaming.topk_state import (  # noqa: E402
    fold_space_saving,
)


def soak_kll(n: int = 2_000_000, batch: int = 10_000, seed: int = 7) -> dict:
    rng = np.random.default_rng(seed)
    # heavy-tailed latencies in micro-units: the distribution shape a
    # qan latency stream actually has (bulk + long tail)
    data = (rng.lognormal(mean=8.0, sigma=1.6, size=n) * 1000).astype(np.int64)
    sketch = KllSketch(QUANTILE_CAPACITY)
    t0 = time.time()
    for i in range(0, n, batch):
        sketch.add_many(data[i : i + batch].tolist())
    fold_s = time.time() - t0
    exact = np.sort(data)
    state_longs = sum(len(b) for b in sketch.buffers)
    state_bound = 2 * QUANTILE_CAPACITY + QUANTILE_CAPACITY * math.ceil(
        math.log2(n / QUANTILE_CAPACITY)
    )
    assert state_longs <= state_bound, (state_longs, state_bound)
    rows = []
    for q in QUANTILE_QS:
        target = max(1, math.ceil(q * n))
        est = sketch.quantile(q)
        # measured rank error: distance from the target rank to the
        # nearest rank the returned value actually occupies
        lo = bisect.bisect_left(exact, est) + 1
        hi = bisect.bisect_right(exact, est)
        measured = 0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
        assert measured <= sketch.err_bound, (q, measured, sketch.err_bound)
        rows.append((q, est, int(exact[target - 1]), measured))
    return {
        "n": n,
        "fold_s": round(fold_s, 2),
        "rate_M_per_s": round(n / fold_s / 1e6, 2),
        "levels": len(sketch.buffers),
        "state_longs": state_longs,
        "state_bound": state_bound,
        "err_bound": sketch.err_bound,
        "per_q": rows,
    }


def soak_space_saving(
    n: int = 1_000_000,
    keyspace: int = 20_000,
    capacity: int = 64,
    batch: int = 1_000,
    seed: int = 11,
) -> dict:
    rng = np.random.default_rng(seed)
    # zipf-ish: heavy hitters + a long tail of singletons, the unbounded
    # key regime the sketch exists for
    keys = rng.zipf(a=1.3, size=n) % keyspace
    truth: dict[str, int] = {}
    for k in keys:
        truth[f"k{k}"] = truth.get(f"k{k}", 0) + 1
    summary: dict[str, tuple[int, int]] = {}
    t0 = time.time()
    for i in range(0, n, batch):
        seg = keys[i : i + batch]
        counts: dict[str, int] = {}
        for k in seg:
            counts[f"k{k}"] = counts.get(f"k{k}", 0) + 1
        fold_space_saving(summary, capacity, counts.items())
    fold_s = time.time() - t0
    global_bound = n // capacity
    worst_overshoot = 0
    for key, (est, err) in summary.items():
        true = truth.get(key, 0)
        assert est >= true, (key, est, true)
        assert est - true <= err, (key, est, true, err)
        assert err <= global_bound, (key, err, global_bound)
        worst_overshoot = max(worst_overshoot, est - true)
    missed = [
        k for k, c in truth.items() if c > global_bound and k not in summary
    ]
    assert not missed, missed
    heavy = sum(1 for c in truth.values() if c > global_bound)
    return {
        "n": n,
        "distinct_keys": len(truth),
        "capacity": capacity,
        "fold_s": round(fold_s, 2),
        "global_bound": global_bound,
        "heavy_hitters_guaranteed": heavy,
        "worst_overshoot": worst_overshoot,
        "worst_err_bound": max(err for _, err in summary.values()),
    }


if __name__ == "__main__":
    k = soak_kll()
    print("KLL:", {x: k[x] for x in k if x != "per_q"})
    for q, est, exact_v, measured in k["per_q"]:
        print(
            f"  q={q}: est={est} exact={exact_v} "
            f"measured_rank_err={measured} <= err_bound={k['err_bound']}"
        )
    s = soak_space_saving()
    print("SpaceSaving:", s)
    print("ALL SKETCH SOAK ASSERTIONS PASS")
