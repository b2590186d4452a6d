"""Property-based checks for the T24 two-sided as-of state: any batch
split AND arrival permutation of an interleaved click/purchase tape must
rebuild identical state and identical matches, and the bisect matcher
must equal an obvious sequential sweep model — on adversarial layouts
(duplicate timestamps, purchase ties needing the max fold, clicks before
any purchase)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_obsidian_core_spark.streaming.sequence_state import (
    asof_lookup,
    fold_purchases,
    merge_sequence,
)

_SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tight time domain forces ts collisions on both sides
clicks = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 999)),  # (ts, cents)
    min_size=0,
    max_size=12,
)
purchases = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 999)),
    min_size=0,
    max_size=12,
)


def _drive(tape, cut):
    """Fold a (side, ts, eid, cents) tape through the production folds in
    batches split at ``cut``-sized steps."""
    c_ts, c_eid, c_c = [], [], []
    p_ts, p_c = [], []
    for i in range(0, len(tape), max(1, cut)):
        b = tape[i : i + max(1, cut)]
        lf = [(r[1], r[2], r[3]) for r in b if r[0] == "L"]
        rt = [(r[1], r[3]) for r in b if r[0] == "R"]
        if lf:
            c_ts, c_eid, c_c = merge_sequence(c_ts, c_eid, c_c, lf)
        if rt:
            p_ts, p_c = fold_purchases(p_ts, p_c, rt)
    return (c_ts, c_eid, c_c, p_ts, p_c)


@settings(**_SETTINGS)
@given(clicks=clicks, purchases=purchases, seed=st.integers(0, 2**16))
def test_asof_state_is_arrival_and_batching_invariant(clicks, purchases, seed):
    import random

    tape = [("L", ts, i, c) for i, (ts, c) in enumerate(clicks)] + [
        ("R", ts, -1, c) for ts, c in purchases
    ]
    base = _drive(tape, 3)
    rng = random.Random(seed)
    shuffled = list(tape)
    rng.shuffle(shuffled)
    for cut in (1, 2, 5, len(tape) or 1):
        assert _drive(shuffled, cut) == base

    c_ts, c_eid, c_c, p_ts, p_c = base
    got = asof_lookup(c_ts, p_ts, p_c)

    # sequential model: per-ts max of purchases, then linear latest-≤ scan
    best: dict[int, int] = {}
    for ts, c in purchases:
        if ts not in best or c > best[ts]:
            best[ts] = c
    items = sorted(best.items())
    ref = []
    for t in c_ts:
        hit = None
        for pt, pc in items:
            if pt <= t:
                hit = (pt, pc)
            else:
                break
        ref.append(hit or (None, None))
    assert got == ref
