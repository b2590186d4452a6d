"""Property-based batch↔streaming delta equivalence.

The streaming stateful fold (applyInPandasWithState) and the batch lag
window implement the same recurrence; for ANY dense snapshot history they
must emit identical delta sets. Hypothesis generates adversarial histories
(resets, idle digests, digests appearing late, multiple instances); the
pandas fold is checked against the batch operator directly — cheap because
the streaming group function is called as a plain Python function, no
streaming query needed.
"""

from __future__ import annotations

import datetime as dt
import json

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from project_obsidian_core_spark.streaming import delta_stream as DS

T0 = dt.datetime(2026, 4, 1, 0, 0, 0)

# a history: per (instance, digest) a list of per-tick cumulative values,
# None = digest absent from that snapshot's scrape
value_lists = st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=1000)),
    min_size=2,
    max_size=6,
)
histories = st.dictionaries(
    st.tuples(st.sampled_from(["i1", "i2"]), st.sampled_from(["qa", "qb", "qc"])),
    value_lists,
    min_size=1,
    max_size=6,
)


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _reference_model(history):
    """Direct Python model of the reference semantics (snapshot.go:159-239)."""
    out = set()
    by_instance = {}
    for (inst, dg), vals in history.items():
        by_instance.setdefault(inst, {})[dg] = vals
    for inst, digests in by_instance.items():
        n_ticks = max(len(v) for v in digests.values())
        prev = None  # dict digest -> value at previous tick where instance scraped
        prev_tick = None
        for t in range(n_ticks):
            snap = {
                dg: vals[t]
                for dg, vals in digests.items()
                if t < len(vals) and vals[t] is not None
            }
            if not snap:
                continue  # instance not scraped this tick
            if prev is not None:
                for dg, curr in snap.items():
                    p = prev.get(dg)
                    delta = curr if (p is None or curr < p) else curr - p
                    if delta > 0:
                        out.add((inst, dg, t, delta, float((t - prev_tick) * 60)))
            prev, prev_tick = snap, t
    return out


def _fold_model(history):
    """Run the actual streaming group function per instance, one batch."""
    fn = DS.make_delta_fn(["digest"], ["count_star"], activity_col="count_star")
    rows = []
    for (inst, dg), vals in history.items():
        for t, v in enumerate(vals):
            if v is not None:
                rows.append(
                    {
                        "instance_id": inst,
                        "snapshot_ts": T0 + dt.timedelta(minutes=t),
                        "digest": dg,
                        "count_star": v,
                    }
                )
    out = set()
    df = pd.DataFrame(rows)
    if df.empty:
        return out
    for inst, group in df.groupby("instance_id"):
        state = _FakeState()
        for emitted in fn((inst,), iter([group]), state):
            for r in emitted.itertuples(index=False):
                tick = int((r.snapshot_ts - T0).total_seconds() // 60)
                out.add(
                    (inst, r.digest, tick, int(r.count_star_delta), float(r.time_period_seconds))
                )
    return out


@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(histories)
def test_stream_fold_matches_reference_model(history):
    assert _fold_model(history) == _reference_model(history)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(histories)
def test_fold_is_batch_split_invariant(history):
    """Folding the history in one batch == folding tick-by-tick with state
    carried between calls (micro-batch boundary invariance)."""
    fn = DS.make_delta_fn(["digest"], ["count_star"], activity_col="count_star")
    rows = []
    for (inst, dg), vals in history.items():
        for t, v in enumerate(vals):
            if v is not None:
                rows.append(
                    {
                        "instance_id": inst,
                        "snapshot_ts": T0 + dt.timedelta(minutes=t),
                        "digest": dg,
                        "count_star": v,
                    }
                )
    df = pd.DataFrame(rows)
    if df.empty:
        return
    one_shot, tick_wise = set(), set()
    for inst, group in df.groupby("instance_id"):
        st1 = _FakeState()
        for emitted in fn((inst,), iter([group]), st1):
            for r in emitted.itertuples(index=False):
                one_shot.add((inst, r.digest, str(r.snapshot_ts), int(r.count_star_delta)))
        st2 = _FakeState()
        for ts in sorted(group["snapshot_ts"].unique()):
            batch = group[group["snapshot_ts"] == ts]
            for emitted in fn((inst,), iter([batch]), st2):
                for r in emitted.itertuples(index=False):
                    tick_wise.add((inst, r.digest, str(r.snapshot_ts), int(r.count_star_delta)))
    assert one_shot == tick_wise
