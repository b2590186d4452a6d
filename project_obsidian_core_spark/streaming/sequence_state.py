"""T20: ordered-sequence state — the streaming answer for ORDER-DEPENDENT
per-entity analytics (Markov transitions, funnels, sessionization) when
micro-batches arrive in ARBITRARY order.

Every prior stateful operator here folds order-free state (counts,
sketches, k-min samples, interval covers). Transition counting is
different: it needs each user's events ADJACENT IN TIME, and a file
replay delivers batches in file order, not time order. The general
solution is order-RECONSTRUCTING state: per key, keep the (ts, id, type)
sequence itself, merge-insert each batch (a sorted merge — associative
and commutative over disjoint row sets, so ANY batch arrival order
rebuilds the identical sequence), and re-derive the transition counts
from the full sequence on every emit.

Emission follows the superseding contract (islands/top-k rule): each
batch re-emits the key's CURRENT per-(prev, next) counts with
``version`` = rows absorbed so far; readers take the max-version rows
per key. The drained state therefore equals the batch operator exactly
— `stream_markov_transitions` gates on the BATCH
`events_markov_transitions` oracle, the strongest streaming↔batch
equivalence available for an order-dependent fold.

Scale: state per user is that user's event sequence — O(activity), not
O(corpus); on an unbounded stream ``evict=True`` (round 11, the
interval_state contract) bounds it to the WATERMARK HORIZON with NO
semantic loss: a row below the watermark can never gain a new
predecessor (Spark drops late rows), so every adjacent pair whose
second element is below the horizon is frozen — it is emitted once
with ``is_final=True`` and its rows leave state, except the LAST
frozen row, which stays as the boundary anchor (its outgoing pair can
still change when the next in-horizon row arrives).  finals ∪
max-version live rows ≡ the batch operator exactly, test-pinned; the
per-batch O(state) re-sort shrinks to O(horizon activity).  Ties: the
sequence sorts by (ts, event_id), the A38 total-order rule the batch
window uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# --- per-group Python-boundary helpers (guide §4, r17 optimization) -------
# applyInPandasWithState calls the state fn once per key per micro-batch
# (~1.5k calls/batch here), so per-call constant costs dominate the replay
# tier's wall time.  Two measured sinks, both fixed without changing a
# single emitted value:
#  * building output frames from dicts of PYTHON LISTS makes pandas run
#    type inference per column (~0.3 ms/frame); preconverted numpy arrays
#    with copy=False halve it.  Only provably non-null columns may be
#    converted (np.asarray turns None into nan, which would silently
#    change a NULL into a value) — nullable columns keep their existing
#    list/pd.array paths.
#  * iterating pandas Series row by row yields numpy scalars (one Python
#    object + int() call per element); Series.tolist() is a single C
#    conversion to builtins, ~4x cheaper, and feeds the same pure fold.


def _i64(vals) -> np.ndarray:
    """int64 column from a list of non-null Python ints."""
    return np.asarray(vals, dtype=np.int64)


def _full(n: int, v: int) -> np.ndarray:
    """Constant int64 column."""
    return np.full(n, v, dtype=np.int64)


def _obj(vals: list) -> np.ndarray:
    """object column (strings) without element-wise inference."""
    a = np.empty(len(vals), dtype=object)
    a[:] = vals
    return a

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("eid", T.ArrayType(T.LongType())),
        T.StructField("types", T.ArrayType(T.StringType())),
        T.StructField("version", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("prev_type", T.StringType()),
        T.StructField("next_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)

#: evict-mode output — the superseding contract grows an ``is_final``
#: marker: readers take ALL final rows (each pair finalizes exactly once,
#: so they sum) plus the max-version live rows, mirroring interval_state
EVICT_OUTPUT_SCHEMA = T.StructType(
    [*OUTPUT_SCHEMA.fields, T.StructField("is_final", T.BooleanType())]
)


def merge_sequence(
    ts: list[int], eid: list[int], types: list[str], batch_rows
) -> tuple[list[int], list[int], list[str]]:
    """Merge-insert batch rows into the (ts, event_id)-sorted sequence,
    DEDUPLICATING on (ts, event_id): a re-delivered row (an
    at-least-once upstream replaying across restarts) is dropped, so the
    state is idempotent under replay rather than relying on the source's
    exactly-once contract (round-11 hardening; ties on the full key keep
    the first row in full-tuple sort order, deterministically).  Pure
    function; unit-tested directly.  Commutative over batches: the
    result is the sort of the DISTINCT union, however it arrives.

    Cost note (r10 soak, 10⁶ events/key in 10³ batches): ``sorted``
    over state+batch IS effectively a linear two-run merge — timsort
    detects the presorted state run and gallops — and measured FASTER
    (177 s) than an explicit ``heapq.merge`` (230 s, per-item generator
    overhead). The per-batch O(state) array rewrite is inherent to
    materialized sorted state; the production bound is the retention
    window (``evict=True`` below the watermark horizon, implemented in
    the consumers), not a cleverer merge."""
    merged = sorted(
        list(zip(ts, eid, types))
        + [(int(t), int(e), y) for t, e, y in batch_rows]
    )
    out_t: list[int] = []
    out_e: list[int] = []
    out_y: list[str] = []
    last: tuple[int, int] | None = None
    for t, e, y in merged:
        if (t, e) == last:
            continue
        last = (t, e)
        out_t.append(t)
        out_e.append(e)
        out_y.append(y)
    return out_t, out_e, out_y


def transition_counts(types: list[str]) -> dict[tuple[str, str], int]:
    """Adjacent-pair counts of a type sequence (the per-user slice of the
    A40 matrix)."""
    out: dict[tuple[str, str], int] = {}
    for prev, nxt in zip(types, types[1:]):
        out[(prev, nxt)] = out.get((prev, nxt), 0) + 1
    return out


def make_sequence_fn(evict: bool = False):
    """``evict=True`` enables watermark eviction (the interval_state
    contract): the sequence prefix with ts below the group-state
    watermark is FROZEN — Spark drops later-arriving rows below the
    watermark, so no future row can be inserted before or between
    frozen rows.  Every adjacent pair whose SECOND element is frozen is
    therefore final: its counts are emitted once with
    ``is_final=True``, and the frozen rows leave state except the LAST
    one, kept as the boundary anchor (a future in-horizon row can still
    insert directly after it, so the anchor's outgoing pair stays
    live).  finals ∪ max-version live ≡ the batch counts, test-pinned.
    Requires ``withWatermark`` upstream.

    QUIESCENT keys flush too (round 13, closing the same idle-key gap
    the r12 ADVICE called out for funnel/sessions): whenever more than
    the anchor remains, the key arms an EVENT-TIME TIMEOUT at the
    second element's timestamp — the exact instant the next pair can
    freeze — and the timeout runs the same eviction sweep with no input
    rows.  A timeout flush bumps ``version`` and re-emits the remaining
    live counts; when the remainder is the bare anchor (no live pairs),
    it emits ONE ``n=0`` version-marker row instead, because this
    family's drain is ADDITIVE (finals + max-version live counts) and
    the pre-flush live frame — which still carries the just-finalized
    pairs — must lose the max-version race or the drain double-counts.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        timed_out = evict and state.hasTimedOut
        if state.exists:
            ts, eid, types, version = state.get
            ts, eid, types = list(ts), list(eid), list(types)
        else:
            ts, eid, types, version = [], [], [], 0
        absorbed = 0
        if not timed_out:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                absorbed += len(pdf)
                ts, eid, types = merge_sequence(
                    ts, eid, types,
                    zip(
                        pdf["ts_us"].tolist(),
                        pdf["event_id"].tolist(),
                        pdf["event_type"].tolist(),
                    ),
                )
        if not absorbed and not timed_out:
            return
        version += absorbed

        def frame(items, final):
            n = len(items)
            cols = {
                "user_id": _full(n, user),
                "prev_type": _obj([p for (p, _), _ in items]),
                "next_type": _obj([q for (_, q), _ in items]),
                "n": _i64([c for _, c in items]),
                "version": _full(n, version),
            }
            if evict:
                cols["is_final"] = np.full(n, final, dtype=bool)
            return pd.DataFrame(cols, copy=False)

        if evict:
            import bisect

            wm_ms = state.getCurrentWatermarkMs()
            wm_us = wm_ms * 1000
            cut = bisect.bisect_left(ts, wm_us)

            def rearm():
                # the next pair freezes when the watermark passes the
                # SECOND element (cut > 1 needs ts[1] < wm); an
                # anchor-only key can't freeze anything without new data
                if len(ts) > 1:
                    state.setTimeoutTimestamp(
                        max(ts[1] // 1000 + 1, wm_ms + 1)
                    )

            if timed_out and cut <= 1:
                # spurious wake: nothing freezable yet
                rearm()
                state.update((ts, eid, types, version))
                return
            if timed_out:
                version += 1
            if cut > 1:
                finalized = transition_counts(types[:cut])
                ts, eid, types = ts[cut - 1 :], eid[cut - 1 :], types[cut - 1 :]
                if finalized:
                    yield frame(sorted(finalized.items()), True)
            rearm()
        state.update((ts, eid, types, version))
        counts = transition_counts(types)
        if counts:
            yield frame(sorted(counts.items()), False)
        elif evict and timed_out and ts:
            # n=0 version marker (see docstring): supersedes the stale
            # pre-flush live frame in the additive drain
            yield frame([((types[0], types[0]), 0)], False)

    return fn


def streaming_transitions(stream: DataFrame, evict: bool = False) -> DataFrame:
    """Wire the ordered-sequence state over an event stream; expects
    columns (user_id, event_id, ts, event_type).  ``evict=True`` (needs
    a watermarked source) bounds state to the watermark horizon and
    adds the ``is_final`` column — the unbounded-stream mode."""
    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").cast("string").alias("event_type"),
        # evict mode must RETAIN the watermark-tagged event-time column:
        # projecting it away severs the watermark and
        # getCurrentWatermarkMs() raises inside the state fn
        *([F.col("ts")] if evict else []),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_sequence_fn(evict=evict),
        outputStructType=EVICT_OUTPUT_SCHEMA if evict else OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        # evict mode wakes keys when their next pair can freeze so
        # quiescent users still flush (r13, the funnel/session pattern)
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )


# --------------------- T21: anchored-window funnel over the same state ----
FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("max_stage", T.IntegerType()),
        T.StructField("version", T.LongType()),
    ]
)

#: evict-mode funnel output — per user ONE final row ever; drain = finals
#: ∪ max-version live rows of users WITHOUT a final (unlike sessions,
#: finals and live rows describe the same per-user scalar, so a user with
#: a final row supersedes all their live history)
FUNNEL_EVICT_OUTPUT_SCHEMA = T.StructType(
    [*FUNNEL_OUTPUT_SCHEMA.fields, T.StructField("is_final", T.BooleanType())]
)

#: evict-mode funnel state — ``done`` is the tombstone: once a user's
#: funnel is finalized their event rows leave state and only the flag
#: remains (O(1) per finalized user; the event arrays are empty)
FUNNEL_EVICT_STATE_SCHEMA = T.StructType(
    [*STATE_SCHEMA.fields, T.StructField("done", T.BooleanType())]
)


def funnel_progress(
    ts: list[int], types: list[str], stages: tuple[str, ...], within_us: int
) -> int:
    """Greedy-earliest anchored-window funnel progress over one user's
    sorted sequence — the EXACT batch semantics (`analytics.behavior.
    sequence_funnel`): anchor = earliest stage-1 event, every later
    stage strictly after the previous pick and at or before
    anchor + within_us; greedy-earliest is optimal under the fixed
    global deadline. Pure function; unit-tested directly."""
    anchor = None
    for t, y in zip(ts, types):
        if y == stages[0]:
            anchor = t
            break
    if anchor is None:
        return 0
    deadline = anchor + within_us
    cur, reached = anchor, 1
    for stage in stages[1:]:
        nxt = None
        for t, y in zip(ts, types):
            if y == stage and cur < t <= deadline:
                nxt = t
                break
        if nxt is None:
            break
        cur = nxt
        reached += 1
    return reached


def make_funnel_fn(stages: tuple[str, ...], within_us: int, evict: bool = False):
    """``evict=True`` (r11 verdict Next #5): unlike the fold-family path
    statistics, the anchored funnel HAS a semantic horizon — once the
    anchor is below the watermark it is FROZEN (the final anchor is the
    earliest stage-1, and every future row has ts ≥ watermark > anchor),
    and once ``anchor + within < watermark`` no future row can land in
    the deadline window either, so ``max_stage`` can never change: emit
    it once with ``is_final=True``, drop the event rows, keep a 1-flag
    tombstone.  Until then state is PRUNED to the provably-live slice:

    * anchor frozen (anchor < wm), not expired → only ``[anchor,
      anchor+within]`` rows can still matter (rows before the anchor are
      non-stage-1 with t ≤ anchor, dead for progression; rows past the
      deadline can neither anchor earlier nor progress);
    * no anchor, or anchor ≥ wm (a future stage-1 could still precede
      it) → rows with ts < wm are dead: any final anchor a satisfies
      a ≥ wm or a = current anchor ≥ wm, and progression needs
      t > a ≥ wm > t — impossible.

    Both prunes are lossless for the final answer (re-inserted replayed
    rows land outside the live slice and change nothing), so finals ∪
    max-version live of unfinalized users ≡ the batch A44 greedy,
    unit-pinned in tests/test_sequence_evict.py.

    QUIESCENT keys finalize too (r12 ADVICE — the exact gap fixed for
    the as-of join in r12 but left NoTimeout here): whenever a live
    anchor exists the key arms an EVENT-TIME TIMEOUT at the one instant
    it can finalize without new data — the anchor's deadline falling
    below the watermark — so other keys' traffic advancing the watermark
    flushes it.  The timeout flush bumps ``version`` by 1 and emits ONLY
    the final row (nothing changed for the live view), so drains keep
    their finals-take-precedence contract.  Anchorless keys never arm
    (they cannot finalize without a new stage-1 row — no idle wakes)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        done = False
        timed_out = evict and state.hasTimedOut
        if state.exists:
            if evict:
                ts, eid, types, version, done = state.get
            else:
                ts, eid, types, version = state.get
            ts, eid, types = list(ts), list(eid), list(types)
        else:
            ts, eid, types, version = [], [], [], 0
        absorbed = 0
        if not timed_out:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                absorbed += len(pdf)
                if done:
                    continue  # tombstoned: the outcome is immutable
                ts, eid, types = merge_sequence(
                    ts, eid, types,
                    zip(
                        pdf["ts_us"].tolist(),
                        pdf["event_id"].tolist(),
                        pdf["event_type"].tolist(),
                    ),
                )
        if (not absorbed and not timed_out) or done:
            return
        version += absorbed

        def frame(stage, final):
            cols = {
                "user_id": [user],
                "max_stage": [stage],
                "version": [version],
            }
            if evict:
                cols["is_final"] = [final]
            return pd.DataFrame(cols)

        if evict:
            wm_ms = state.getCurrentWatermarkMs()
            wm_us = wm_ms * 1000
            anchor = None
            for t, y in zip(ts, types):
                if y == stages[0]:
                    anchor = t
                    break
            if anchor is not None and anchor + within_us < wm_us:
                if timed_out:
                    # the flush emission gets its own version so drains
                    # see it as the newest frame for this user
                    version += 1
                yield frame(
                    funnel_progress(ts, types, stages, within_us), True
                )
                state.update(([], [], [], version, True))
                return
            if anchor is not None and anchor < wm_us:
                lo, hi = anchor, anchor + within_us
            else:
                lo, hi = wm_us, None
            keep = [
                i
                for i, t in enumerate(ts)
                if t >= lo and (hi is None or t <= hi)
            ]
            stage_now = funnel_progress(ts, types, stages, within_us)
            ts = [ts[i] for i in keep]
            eid = [eid[i] for i in keep]
            types = [types[i] for i in keep]
            if anchor is not None:
                # wake at the exact event-time the anchor's deadline
                # falls below the watermark — the only instant this key
                # can finalize without new data (no periodic idle wakes)
                state.setTimeoutTimestamp(
                    max((anchor + within_us) // 1000 + 1, wm_ms + 1)
                )
            state.update((ts, eid, types, version, False))
            if not timed_out:
                yield frame(stage_now, False)
            return
        state.update((ts, eid, types, version))
        yield frame(funnel_progress(ts, types, stages, within_us), False)

    return fn


def streaming_sequence_funnel(
    stream: DataFrame, stages: tuple[str, ...], within_us: int,
    evict: bool = False,
) -> DataFrame:
    """T21: the A44 anchored-window funnel served live — SECOND consumer
    of the ordered-sequence state, proving the state shape generalizes
    (T20 derives adjacency, this derives stage progress; both re-emit
    from the reconstructed sequence, so out-of-order delivery of the
    anchor AFTER later stages still converges to the batch answer).
    ``evict=True`` (needs a watermarked source) finalizes users whose
    anchor + within < watermark and prunes dead rows from the rest —
    see :func:`make_funnel_fn` for the horizon proof."""
    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").cast("string").alias("event_type"),
        # keep the watermark-tagged column alive in evict mode
        *([F.col("ts")] if evict else []),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_funnel_fn(stages, within_us, evict=evict),
        outputStructType=(
            FUNNEL_EVICT_OUTPUT_SCHEMA if evict else FUNNEL_OUTPUT_SCHEMA
        ),
        stateStructType=(
            FUNNEL_EVICT_STATE_SCHEMA if evict else STATE_SCHEMA
        ),
        outputMode="append",
        # evict mode wakes keys when their anchor's deadline crosses the
        # watermark so quiescent users still finalize (r12 ADVICE)
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )


# ------------------- T22: gap sessionization over the same state shape ----
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("eid", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)

SESSION_EVICT_OUTPUT_SCHEMA = T.StructType(
    [*SESSION_OUTPUT_SCHEMA.fields, T.StructField("is_final", T.BooleanType())]
)

#: evict-mode state adds the count of sessions already finalized, so the
#: global 1-based session_idx survives their rows leaving state
SESSION_EVICT_STATE_SCHEMA = T.StructType(
    [*SESSION_STATE_SCHEMA.fields, T.StructField("closed_n", T.LongType())]
)


def gap_sessions(
    ts: list[int], vals: list[int], gap_us: int
) -> list[tuple[int, int, int, int, int]]:
    """Split a sorted sequence at gaps > gap_us — returns (session_idx,
    start_us, end_us, n_events, value_sum) rows, 1-based idx.  The exact
    batch lag-window semantics (`datapipe.pipeline.sessionize`): a new
    session starts when t − prev > gap (strict).  Pure; unit-tested.
    Session assignment depends only on ts order, so equal-ts ties can't
    move an event across a session boundary (gap 0 never exceeds the
    threshold) — the same reason the batch oracle needs no tiebreak."""
    out: list[tuple[int, int, int, int, int]] = []
    if not ts:
        return out
    idx, start, n, vsum, prev = 1, ts[0], 0, 0, None
    for t, v in zip(ts, vals):
        if prev is not None and t - prev > gap_us:
            out.append((idx, start, prev, n, vsum))
            idx, start, n, vsum = idx + 1, t, 0, 0
        n += 1
        vsum += int(v)
        prev = t
    out.append((idx, start, prev, n, vsum))
    return out


def make_session_fn(gap_us: int, evict: bool = False):
    """``evict=True``: a session whose end satisfies ``end + gap <
    watermark`` is CLOSED — every future row has ts ≥ watermark, so its
    distance to any row of that session strictly exceeds the gap: it
    can neither extend, join, nor split it.  Closed sessions form a
    prefix of the ordered session list; they are emitted once with
    ``is_final=True`` and their rows leave state; ``closed_n`` in state
    keeps the global 1-based session numbering exact.  Drain = finals ∪
    max-version live with FINALS TAKING PRECEDENCE by (user_id,
    session_idx) ≡ the batch sessionization, test-pinned: a timeout
    flush (below) finalizes sessions whose last live frame may remain
    the max-version one.

    QUIESCENT keys finalize too (r12 ADVICE): whenever open rows remain
    the key arms an EVENT-TIME TIMEOUT at the instant its tail session's
    gap expires — ``last_ts + gap`` crossing the watermark — so other
    keys' traffic flushes idle keys.  The timeout flush bumps
    ``version`` and emits only the finals (the open remainder, if any,
    is re-emitted live at the bumped version so the live view never
    re-carries a flushed session)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        closed_n = 0
        timed_out = evict and state.hasTimedOut
        if state.exists:
            if evict:
                ts, eid, vals, version, closed_n = state.get
            else:
                ts, eid, vals, version = state.get
            ts, eid, vals = list(ts), list(eid), list(vals)
        else:
            ts, eid, vals, version = [], [], [], 0
        absorbed = 0
        if not timed_out:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                absorbed += len(pdf)
                # same linear two-run merge as the type-sequence state (the
                # payload column is the cents value instead of the type)
                ts, eid, vals = merge_sequence(
                    ts, eid, vals,
                    zip(
                        pdf["ts_us"].tolist(),
                        pdf["event_id"].tolist(),
                        pdf["cents"].tolist(),
                    ),
                )
        if not absorbed and not timed_out:
            return
        version += absorbed
        rows = gap_sessions(ts, vals, gap_us)

        def frame(srows, final):
            n = len(srows)
            cols = {
                "user_id": _full(n, user),
                "session_idx": _i64([closed_n + r[0] for r in srows]),
                "session_start_us": _i64([r[1] for r in srows]),
                "session_end_us": _i64([r[2] for r in srows]),
                "n_events": _i64([r[3] for r in srows]),
                "value_sum": _i64([r[4] for r in srows]),
                "version": _full(n, version),
            }
            if evict:
                cols["is_final"] = np.full(n, final, dtype=bool)
            return pd.DataFrame(cols, copy=False)

        if evict:
            wm_ms = state.getCurrentWatermarkMs()
            wm_us = wm_ms * 1000
            n_closed = 0
            while (
                n_closed < len(rows)
                and rows[n_closed][2] + gap_us < wm_us
            ):
                n_closed += 1
            if timed_out and not n_closed:
                # spurious wake (clock skew between the armed target and
                # the strict < close test): re-arm and go quiet
                if ts:
                    state.setTimeoutTimestamp(
                        max((ts[-1] + gap_us) // 1000 + 1, wm_ms + 1)
                    )
                state.update((ts, eid, vals, version, closed_n))
                return
            if timed_out:
                # flush emissions get their own version so the drain's
                # max-version live view supersedes the pre-flush frame
                version += 1
            if n_closed:
                yield frame(rows[:n_closed], True)
                n_drop = sum(r[3] for r in rows[:n_closed])
                ts, eid, vals = ts[n_drop:], eid[n_drop:], vals[n_drop:]
                rows = [
                    (r[0] - n_closed, r[1], r[2], r[3], r[4])
                    for r in rows[n_closed:]
                ]
                closed_n += n_closed
            if ts:
                # wake at the exact event-time the open tail's gap
                # expires under the watermark (no periodic idle wakes);
                # an emptied key never re-arms — new data wakes it
                state.setTimeoutTimestamp(
                    max((ts[-1] + gap_us) // 1000 + 1, wm_ms + 1)
                )
            state.update((ts, eid, vals, version, closed_n))
        else:
            state.update((ts, eid, vals, version))
        if rows:
            yield frame(rows, False)

    return fn


def streaming_gap_sessions(
    stream: DataFrame, gap_us: int, evict: bool = False
) -> DataFrame:
    """T22: gap sessionization live — THIRD consumer of the
    order-reconstructing state (adjacency → T20, stage progress → T21,
    gap partitioning → T22): a session that a late-arriving middle
    event MERGES (two apparent sessions bridged by the straggler)
    re-splits correctly because sessions are re-derived from the merged
    sequence on every emit — the failure mode watermark-based
    session_window handles by dropping, this handles by revision.
    ``evict=True`` (needs a watermarked source) finalizes closed
    sessions out of state — the unbounded-stream mode.
    Expects (user_id, event_id, ts, cents)."""
    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("cents").cast("long").alias("cents"),
        # keep the watermark-tagged column alive in evict mode (see
        # streaming_transitions)
        *([F.col("ts")] if evict else []),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_us, evict=evict),
        outputStructType=(
            SESSION_EVICT_OUTPUT_SCHEMA if evict else SESSION_OUTPUT_SCHEMA
        ),
        stateStructType=(
            SESSION_EVICT_STATE_SCHEMA if evict else SESSION_STATE_SCHEMA
        ),
        outputMode="append",
        # evict mode wakes keys when their tail session's gap expires
        # under the watermark so quiescent users still close (r12 ADVICE)
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )


# ------------- T23: ordered float recursion (EWMA) over the same state ----
EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("sums", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("n_buckets", T.IntegerType()),
        T.StructField("ewma_fast", T.DoubleType()),
        T.StructField("ewma_slow", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)


def fold_bucket_sums(
    buckets: list[int], sums: list[int], batch_rows
) -> tuple[list[int], list[int]]:
    """Fold (bucket, value) rows into the per-bucket exact-int sums —
    COMMUTATIVE (integer addition), so unlike the raw sequences this
    state is arrival-order free by construction; kept sorted by bucket
    so the drain fold needs no re-sort. Pure; unit-tested."""
    acc = dict(zip(buckets, sums))
    for b, v in batch_rows:
        b = int(b)
        acc[b] = acc.get(b, 0) + int(v)
    items = sorted(acc.items())
    return [b for b, _ in items], [s for _, s in items]


def ewma_pair(sums: list[int], alpha_fast: float, alpha_slow: float):
    """The governor's dual-EWMA left fold over the bucket-ordered series
    — float ops in the SAME order as the batch `aggregate` expression
    and the DuckDB `list_reduce`, so all three agree bit-exactly
    (python floats ARE IEEE doubles). Pure; unit-tested."""
    if not sums:
        return None, None
    fast = slow = float(sums[0])
    for v in sums[1:]:
        x = float(v)
        fast = fast + alpha_fast * (x - fast)
        slow = slow + alpha_slow * (x - slow)
    return fast, slow


def make_ewma_fn(alpha_fast: float, alpha_slow: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        fast, slow = ewma_pair(sums, alpha_fast, alpha_slow)
        yield pd.DataFrame(
            {
                "metric_name": [metric],
                "n_buckets": [len(buckets)],
                "ewma_fast": [fast],
                "ewma_slow": [slow],
                "version": [version],
            }
        )

    return fn


def streaming_ewma(
    stream: DataFrame, alpha_fast: float = 0.3, alpha_slow: float = 0.05
) -> DataFrame:
    """T23: the W3 dual-EWMA recursion served LIVE — FOURTH consumer of
    the order-reconstruction idea, extended to FLOAT RECURSIONS: the
    state holds the exact-int per-bucket sums (commutative, arrival-
    order free), and the order-dependent float fold replays over the
    reconstructed series on every emit — so the drained value is the
    batch `metric_ewma` bit-exactly regardless of delivery order. The
    live-path contrast: the governor keeps ONE scalar per key and
    accepts arrival-order sensitivity; this operator buys exactness
    with window-bounded state (one long per bucket in retention).
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_ewma_fn(alpha_fast, alpha_slow),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------- T24: as-of join over the same order-reconstruction ------
ASOF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("c_ts", T.ArrayType(T.LongType())),
        T.StructField("c_eid", T.ArrayType(T.LongType())),
        T.StructField("c_cents", T.ArrayType(T.LongType())),
        T.StructField("p_ts", T.ArrayType(T.LongType())),
        T.StructField("p_cents", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)

ASOF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("last_purchase_us", T.LongType()),
        T.StructField("last_purchase_cents", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)

#: evict-mode as-of output — finals ∪ max-version live ≡ batch (lossless)
ASOF_EVICT_OUTPUT_SCHEMA = T.StructType(
    [*ASOF_OUTPUT_SCHEMA.fields, T.StructField("is_final", T.BooleanType())]
)


def fold_purchases(
    p_ts: list[int], p_cents: list[int], batch_rows
) -> tuple[list[int], list[int]]:
    """Fold (ts, cents) purchase rows into the per-ts MAX-cents map —
    the batch right side's groupBy(user, ts).max(cents), kept sorted by
    ts.  max() is commutative/idempotent, so arrival order (and replayed
    duplicates of a ts) can't change the drained map.  Pure; unit-tested."""
    acc = dict(zip(p_ts, p_cents))
    for t, v in batch_rows:
        t, v = int(t), int(v)
        prev = acc.get(t)
        acc[t] = v if prev is None or v > prev else prev
    items = sorted(acc.items())
    return [t for t, _ in items], [v for _, v in items]


def asof_lookup(
    c_ts: list[int], p_ts: list[int], p_cents: list[int]
) -> list[tuple[int | None, int | None]]:
    """For each click ts, the latest purchase (ts, cents) at or before
    it — one bisect per click over the sorted purchase map (the batch
    ASOF LEFT JOIN row by row).  Pure; unit-tested."""
    import bisect

    out: list[tuple[int | None, int | None]] = []
    for t in c_ts:
        i = bisect.bisect_right(p_ts, t)
        if i == 0:
            out.append((None, None))
        else:
            out.append((p_ts[i - 1], p_cents[i - 1]))
    return out


def _asof_lookup_np(
    c_ts: list[int], p_ts: list[int], p_cents: list[int]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized :func:`asof_lookup`: one ``np.searchsorted`` over the
    sorted purchase map instead of a Python ``bisect`` per click
    (``side='right'`` IS ``bisect_right``, so the picked indices are
    identical; unit-pinned against the scalar twin).  Returns
    ``(ts values, cents values, null mask)`` sized for direct
    ``pd.arrays.IntegerArray`` construction — values under the mask are
    padding the nullable column never exposes."""
    ct = np.asarray(c_ts, dtype=np.int64)
    idx = np.searchsorted(np.asarray(p_ts, dtype=np.int64), ct, side="right")
    mask = idx == 0
    if not p_ts:
        zeros = np.zeros(len(c_ts), dtype=np.int64)
        return zeros, zeros, mask
    safe = np.maximum(idx - 1, 0)
    vals = np.asarray(p_ts, dtype=np.int64)[safe]
    cents = np.asarray(p_cents, dtype=np.int64)[safe]
    return vals, cents, mask


def make_asof_fn(evict: bool = False):
    """``evict=True`` enables watermark eviction for the TWO-SIDED state
    (round 11, extending the interval_state contract to the as-of join):

    - a CLICK below the watermark is FINAL — any not-yet-seen purchase
      is either ≥ wm (strictly after the click, never as-of eligible)
      or < wm (dropped by Spark as late), so its match can never change
      again; it is emitted once with ``is_final=True`` and leaves state.
    - among PURCHASES below the watermark only the LATEST survives: for
      every live/future click (ts ≥ wm) the as-of winner among frozen
      purchases is their max-ts one — the rest are dominated forever.

    finals ∪ max-version live (finals taking precedence by event_id —
    a timeout flush finalizes clicks whose last live frame may remain
    the max-version one) ≡ the batch ASOF join exactly (no semantic
    loss — unlike the windowed twins, this eviction is lossless),
    test-pinned; state shrinks to the horizon's clicks plus the
    in-horizon purchases + one anchor purchase.  QUIESCENT keys flush
    too (the r11 ADVICE gap — ``if not absorbed: return`` alone never
    re-evaluated eviction for idle keys): evict mode registers an
    EVENT-TIME TIMEOUT at the precise next-evictable event time (the
    first live click, or the second-oldest purchase — r12 ADVICE
    replaced the wm+60s literal, which woke every idle key each
    micro-batch under larger watermark delays), so when the watermark
    advances past it on other keys' traffic the state fn fires with
    ``hasTimedOut`` and runs the same eviction sweep with no input
    rows, re-arming while anything evictable remains.  Requires
    ``withWatermark`` upstream."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        timed_out = evict and state.hasTimedOut
        if state.exists:
            c_ts, c_eid, c_cents, p_ts, p_cents, version = state.get
            c_ts, c_eid, c_cents = list(c_ts), list(c_eid), list(c_cents)
            p_ts, p_cents = list(p_ts), list(p_cents)
        else:
            c_ts, c_eid, c_cents, p_ts, p_cents, version = [], [], [], [], [], 0
        absorbed = 0
        if not timed_out:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                absorbed += len(pdf)
                # one numpy side-mask instead of two pandas boolean
                # row-subsets (per-group constant cost, guide §4)
                sides = pdf["side"].to_numpy()
                b_ts = pdf["ts_us"].tolist()
                b_cents = pdf["cents"].tolist()
                lmask = sides == "L"
                if lmask.any():
                    b_eid = pdf["event_id"].tolist()
                    c_ts, c_eid, c_cents = merge_sequence(
                        c_ts, c_eid, c_cents,
                        [
                            (t, e, v)
                            for t, e, v, is_l in zip(
                                b_ts, b_eid, b_cents, lmask.tolist()
                            )
                            if is_l
                        ],
                    )
                if not lmask.all():
                    p_ts, p_cents = fold_purchases(
                        p_ts, p_cents,
                        [
                            (t, v)
                            for t, v, is_l in zip(b_ts, b_cents, lmask.tolist())
                            if not is_l
                        ],
                    )
        if not absorbed and not timed_out:
            return
        version += absorbed

        def frame(cts, ceid, ccents, hits, final):
            n = len(cts)
            # hits = (values int64 array, null mask) from asof_lookup;
            # direct IntegerArray construction skips pd.array's per-element
            # inference while producing the identical nullable column
            h_vals, h_cents, h_mask = hits
            cols = {
                "user_id": _full(n, user),
                "event_id": _i64(ceid),
                "ts_us": _i64(cts),
                "cents": _i64(ccents),
                "last_purchase_us": pd.arrays.IntegerArray(h_vals, h_mask),
                "last_purchase_cents": pd.arrays.IntegerArray(h_cents, h_mask),
                "version": _full(n, version),
            }
            if evict:
                cols["is_final"] = np.full(n, final, dtype=bool)
            return pd.DataFrame(cols, copy=False)

        if evict:
            import bisect

            wm_ms = state.getCurrentWatermarkMs()
            wm_us = wm_ms * 1000
            cut = bisect.bisect_left(c_ts, wm_us)
            pcut = bisect.bisect_left(p_ts, wm_us)

            def next_evict_ms() -> int:
                # the exact event-time at which something NEW becomes
                # evictable — the first live click freezing (c_ts[0] <
                # wm) or the second purchase being dominated (p_ts[1] <
                # wm) — clamped above the current watermark.  Precise
                # re-arm instead of the r12 wm+60s literal (ADVICE):
                # under any watermark delay an idle key wakes exactly
                # once per state transition, never per micro-batch.
                cands = []
                if c_ts:
                    cands.append(c_ts[0])
                if len(p_ts) > 1:
                    cands.append(p_ts[1])
                return max(min(cands) // 1000 + 1, wm_ms + 1)

            if timed_out and cut == 0 and pcut <= 1:
                # idle key, nothing evictable yet: re-arm and go quiet
                if c_ts or len(p_ts) > 1:
                    state.setTimeoutTimestamp(next_evict_ms())
                state.update(
                    (c_ts, c_eid, c_cents, p_ts, p_cents, version)
                )
                return
            if timed_out:
                # a flush emission needs its own version so the drain's
                # max-version live view supersedes the pre-flush frame
                version += 1
            if cut > 0:
                # frozen clicks: matched against the FULL purchase map,
                # emitted exactly once, then evicted
                fh = _asof_lookup_np(c_ts[:cut], p_ts, p_cents)
                yield frame(c_ts[:cut], c_eid[:cut], c_cents[:cut], fh, True)
                c_ts, c_eid, c_cents = c_ts[cut:], c_eid[cut:], c_cents[cut:]
            # purchase purge: in-horizon ones plus the latest frozen one
            # (the only frozen purchase any future click can match)
            if pcut > 1:
                p_ts, p_cents = p_ts[pcut - 1 :], p_cents[pcut - 1 :]
            # re-arm while anything can still freeze (live clicks, or
            # in-horizon purchases that a later watermark dominates) —
            # at the precise next-evictable event time, not a literal
            if c_ts or len(p_ts) > 1:
                state.setTimeoutTimestamp(next_evict_ms())
        state.update((c_ts, c_eid, c_cents, p_ts, p_cents, version))
        if not c_ts:
            return
        hits = _asof_lookup_np(c_ts, p_ts, p_cents)
        # no-match columns are null for purchase-less users: pandas
        # nullable Int64 keeps them typed (an object column of Nones trips
        # the serializer's concat FutureWarning and loses the long dtype)
        yield frame(c_ts, c_eid, c_cents, hits, False)

    return fn


def streaming_asof_join(stream: DataFrame, evict: bool = False) -> DataFrame:
    """T24: the J-family as-of join served LIVE — FIFTH consumer of the
    order-reconstructing state, extended to TWO-SIDED state: per user
    the click sequence (order-reconstructed merge, T20's fold) AND the
    purchase (ts → max cents) map (commutative fold, T23's class) are
    the state, and every emit re-derives each click's latest-purchase-
    at-or-before match from the reconstructed sides.  A purchase
    arriving AFTER the click it should anchor (the failure mode a
    watermark-interval stream-stream join handles by dropping or
    widening) is handled by REVISION: the next emit re-matches every
    click, so the drained max-version rows equal the batch ASOF LEFT
    JOIN exactly — gated on the DuckDB native-ASOF oracle.

    Scale: state per user = that user's clicks + purchase map within
    the retention horizon, O(activity) not O(corpus); eviction below
    the watermark bounds both sides, losing only matches across the
    horizon (the same documented loss as every windowed twin here).
    Expects (user_id, event_id, ts, cents, side) with side ∈ {'L','R'}.
    """
    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("cents").cast("long").alias("cents"),
        F.col("side").cast("string").alias("side"),
        # evict mode must RETAIN the watermark-tagged event-time column:
        # projecting it away severs the watermark and
        # getCurrentWatermarkMs() raises inside the state fn
        *([F.col("ts")] if evict else []),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_asof_fn(evict=evict),
        outputStructType=ASOF_EVICT_OUTPUT_SCHEMA if evict else ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        # evict mode times out quiescent keys on watermark advance so
        # their frozen clicks flush and leave state (r11 ADVICE)
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if evict
            else GroupStateTimeout.NoTimeout
        ),
    )


# -------------- T25: streaming Pettitt over the bucket-sum state ----------
PETTITT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("n_buckets", T.IntegerType()),
        T.StructField("last_hour_of_seg1", T.LongType()),
        T.StructField("k_signed", T.LongType()),
        T.StructField("k_stat", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def pettitt_from_series(
    buckets: list[int], sums: list[int]
) -> tuple[int, int, int, int] | None:
    """The A66 rank-algebra Pettitt over a bucket-ordered int series:
    Δ_t = n − 2·(#strictly-less) − tie-size, K_t = prefix sum over time,
    argmax |K_t| over interior splits (earliest on ties).  Returns
    (n, last_bucket_of_seg1, k_signed, k_stat); None below 2 points.
    Pure; unit-tested against the batch operator's brute-force unit."""
    n = len(sums)
    if n < 2:
        return None
    from collections import Counter

    cnt = Counter(sums)
    less: dict[int, int] = {}
    acc = 0
    for v in sorted(cnt):
        less[v] = acc
        acc += cnt[v]
    k = 0
    best: tuple[int, int, int] | None = None
    for t in range(n - 1):
        v = sums[t]
        k += n - 2 * less[v] - cnt[v]
        cand = (-abs(k), buckets[t], k)
        if best is None or cand < best:
            best = cand
    return n, best[1], best[2], -best[0]


def make_pettitt_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        res = pettitt_from_series(buckets, sums)
        if res is None:
            return
        n, split, k_signed, k_stat = res
        yield pd.DataFrame(
            {
                "metric_name": [metric],
                "n_buckets": [n],
                "last_hour_of_seg1": [split],
                "k_signed": [k_signed],
                "k_stat": [k_stat],
                "version": [version],
            }
        )

    return fn


def streaming_pettitt(stream: DataFrame) -> DataFrame:
    """T25: the A66 rank-based change point served LIVE — SIXTH consumer
    of the state family, and the first RANK recursion: the state is the
    same exact-int per-bucket sums as T23 (commutative, arrival-order
    free), and every emit re-derives the FULL rank structure (strictly-
    less counts, tie sizes, the K_t walk) from the reconstructed series,
    because a single late bucket can re-rank every other point — the
    failure mode no incremental scalar state survives.  The drained
    max-version rows equal the batch `metric_pettitt` exactly.
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_pettitt_fn(),
        outputStructType=PETTITT_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------- T26: streaming Bollinger over the bucket-sum state ---------
BOLLINGER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("hour", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("dev_num", T.LongType()),
        T.StructField("var_num", T.LongType()),
        T.StructField("is_upper", T.BooleanType()),
        T.StructField("version", T.LongType()),
    ]
)

#: window/width defaults mirror the batch A72 operator
#: (plans/metrics_queries.py _BOLL_W/_BOLL_K) — the gate proves the twin
#: against that operator's oracle, so the constants must match.
BOLL_W = 24
BOLL_K = 3


def bollinger_from_series(
    buckets: list[int], sums: list[int], w: int = BOLL_W, k: int = BOLL_K
) -> list[tuple[int, int, int, int, bool]]:
    """The A72 exact-int Bollinger breakout scan over a bucket-ordered
    series: each point scores against the trailing-w window EXCLUDING
    itself (ROWS frame, positional like the batch window), breakout iff
    (y·n − S)² > k²·(n·Q − S²) — all int, no division, no sqrt.  Rolling
    S/Q maintained incrementally (one add + one subtract per step), so
    the scan is O(series), not O(series·w).  Returns breakout rows
    (bucket, y, dev_num, var_num, is_upper).  Pure; unit-tested against
    the batch operator."""
    n = len(sums)
    out: list[tuple[int, int, int, int, bool]] = []
    if n <= w:
        return out
    s = sum(sums[:w])
    q = sum(v * v for v in sums[:w])
    for i in range(w, n):
        y = sums[i]
        dev = y * w - s
        var = w * q - s * s
        if dev * dev > k * k * var:
            out.append((buckets[i], y, dev, var, dev > 0))
        s += y - sums[i - w]
        q += y * y - sums[i - w] * sums[i - w]
    return out


def make_bollinger_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        hits = bollinger_from_series(buckets, sums)
        # zero-breakout versions still emit ONE sentinel row (NULL hour):
        # a late bucket can RETRACT every breakout, and an empty emission
        # could never supersede an earlier version under the max-version
        # drain — the sentinel carries the version, the drain drops it.
        yield pd.DataFrame(
            {
                "metric_name": [metric] * max(len(hits), 1),
                "hour": pd.array([h[0] for h in hits] or [None], dtype="Int64"),
                "value_cents": pd.array(
                    [h[1] for h in hits] or [None], dtype="Int64"
                ),
                "dev_num": pd.array(
                    [h[2] for h in hits] or [None], dtype="Int64"
                ),
                "var_num": pd.array(
                    [h[3] for h in hits] or [None], dtype="Int64"
                ),
                "is_upper": pd.array(
                    [h[4] for h in hits] or [None], dtype="boolean"
                ),
                "version": [version] * max(len(hits), 1),
            }
        )

    return fn


def streaming_bollinger(stream: DataFrame) -> DataFrame:
    """T26: the A72 volatility-band breakout served LIVE — SEVENTH
    consumer of the bucket-sum state family: the state is the same
    exact-int per-hour sums (commutative fold, arrival-order free), and
    every emit re-scans the reconstructed series, because the trailing
    ROWS window is POSITIONAL — one late hour shifts every subsequent
    window's membership, so no incremental band state survives
    out-of-order delivery.  A late bucket can create, move, or RETRACT
    a breakout; the versioned-emission drain (max version per metric)
    resolves every revision, and the drained rows equal the batch
    `metric_bollinger` exactly.  Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_bollinger_fn(),
        outputStructType=BOLLINGER_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------- T27: streaming max drawdown over bucket-sum state --------
DRAWDOWN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("n_hours", T.LongType()),
        T.StructField("trough_hour", T.LongType()),
        T.StructField("peak_cents", T.LongType()),
        T.StructField("trough_cents", T.LongType()),
        T.StructField("drawdown_cents", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def drawdown_from_series(
    buckets: list[int], sums: list[int]
) -> tuple[int, int, int, int, int] | None:
    """The A75 running-peak scan over a bucket-ordered int series:
    peak = cumulative max, drawdown = peak − y, winner = earliest
    deepest (the batch operator's row_number(drawdown DESC, x ASC) = 1).
    Returns (n, trough_bucket, peak, trough, drawdown); None on empty.
    Pure; unit-tested against the batch operator."""
    if not sums:
        return None
    peak = None
    best: tuple[int, int, int, int] | None = None  # (-dd, x, peak, y)
    for x, y in zip(buckets, sums):
        peak = y if peak is None or y > peak else peak
        cand = (-(peak - y), x, peak, y)
        if best is None or cand < best:
            best = cand
    return len(sums), best[1], best[2], best[3], -best[0]


def make_drawdown_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        res = drawdown_from_series(buckets, sums)
        if res is None:
            return
        n, trough_x, peak, trough, dd = res
        yield pd.DataFrame(
            {
                "metric_name": [metric],
                "n_hours": [n],
                "trough_hour": [trough_x],
                "peak_cents": [peak],
                "trough_cents": [trough],
                "drawdown_cents": [dd],
                "version": [version],
            }
        )

    return fn


def streaming_drawdown(stream: DataFrame) -> DataFrame:
    """T27: the A75 maximum drawdown served LIVE — EIGHTH consumer of
    the bucket-sum state family: the state is the commutative exact-int
    per-hour sums, and every emit re-walks the running-peak scan,
    because the statistic is a PATH function of the whole ordered
    series — a late bucket BEFORE the current peak can raise every
    subsequent peak (deepening later drawdowns) or fill the trough
    itself, so no (peak, best) scalar pair survives out-of-order
    delivery. One row per (metric, version); drained max-version rows
    equal the batch `metric_drawdown` exactly.
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_drawdown_fn(),
        outputStructType=DRAWDOWN_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------- T29: streaming two-sided CUSUM over bucket-sum state -----
CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("bucket_epoch_s", T.LongType()),
        T.StructField("v_cents", T.LongType()),
        T.StructField("cusum_pos", T.LongType()),
        T.StructField("cusum_neg", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def cusum_from_series(
    buckets: list[int], sums: list[int]
) -> list[tuple[int, int, int, int]]:
    """The A43 closed-form two-sided CUSUM walk over a bucket-ordered
    int series: dev_n = v·n − Σv (n-scaled so the mean never divides),
    P = prefix sum of dev_n, S⁺ = P − min(0, running-min P),
    S⁻ = max(0, running-max P) − P.  Equal to the textbook
    ``S = max(0, S + dev)`` recursion (the batch operator's property
    unit); returns (bucket, v, cusum_pos, cusum_neg) rows.  Pure;
    unit-tested against the recursion and the batch operator."""
    n = len(sums)
    tot = sum(sums)
    out: list[tuple[int, int, int, int]] = []
    pfx = 0
    pmin = None
    pmax = None
    for x, y in zip(buckets, sums):
        pfx += y * n - tot
        pmin = pfx if pmin is None else min(pmin, pfx)
        pmax = pfx if pmax is None else max(pmax, pfx)
        out.append((x, y, pfx - min(0, pmin), max(0, pmax) - pfx))
    return out


def make_cusum_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        rows = cusum_from_series(buckets, sums)
        yield pd.DataFrame(
            {
                "metric_name": [metric] * len(rows),
                "bucket_epoch_s": [r[0] for r in rows],
                "v_cents": [r[1] for r in rows],
                "cusum_pos": [r[2] for r in rows],
                "cusum_neg": [r[3] for r in rows],
                "version": [version] * len(rows),
            }
        )

    return fn


def streaming_cusum(stream: DataFrame) -> DataFrame:
    """T29: the A43 two-sided CUSUM served LIVE — NINTH consumer of the
    bucket-sum state family and its second PATH statistic: every bucket's
    deviation is measured against the GLOBAL mean of the series so far,
    so one new (or late) bucket shifts every row's deviation — the whole
    curve is re-derived per emit, which is the semantics, not overhead
    (a scalar textbook-recursion state would silently keep stale means).
    Emits the full per-bucket curve per (metric, version); drained
    max-version rows equal the batch `metric_cusum` bit-exactly.
    Expects (metric_name, bucket, v) with bucket already in the batch
    operator's epoch-seconds grid."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_cusum_fn(),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------- T30: streaming Holt level+trend over bucket-sum state ------
HOLT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("n_buckets", T.IntegerType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("forecast_next", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)


def holt_from_series(
    sums: list[int], alpha: float, beta: float
) -> tuple[float, float] | None:
    """The A53 coupled level+trend recursion over a bucket-ordered int
    series — the identical IEEE chain the batch `aggregate` fold and the
    DuckDB recursive CTE evaluate (python floats are the same doubles;
    matching constants and operation order makes the drained values
    bit-exact).  Returns (level, trend); None below 2 points."""
    ys = [float(y) for y in sums]
    if len(ys) < 2:
        return None
    ca, cb = 1.0 - alpha, 1.0 - beta
    l, b = ys[0], ys[1] - ys[0]
    for x in ys[2:]:
        lnew = alpha * x + ca * (l + b)
        b = beta * (lnew - l) + cb * b
        l = lnew
    return l, b


def make_holt_fn(alpha: float, beta: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        res = holt_from_series(sums, alpha, beta)
        if res is None:
            return
        l, b = res
        yield pd.DataFrame(
            {
                "metric_name": [metric],
                "n_buckets": pd.Series([len(sums)], dtype="int32"),
                "level": [l],
                "trend": [b],
                "forecast_next": [l + b],
                "version": [version],
            }
        )

    return fn


def streaming_holt(
    stream: DataFrame, alpha: float, beta: float
) -> DataFrame:
    """T30: the A53 Holt double-exponential smoother served LIVE — the
    COUPLED two-state float recursion over the bucket-sum state family
    (T23 proved the single-state EWMA; this proves the level+trend pair
    whose two components feed each other): a late bucket re-seeds
    ``b₁ = y₂ − y₁`` and shifts every subsequent (l, b) step, so no
    scalar (l, b) state survives out-of-order delivery — each emit
    replays the recursion over the reconstructed series.  Drained
    max-version rows equal the batch `metric_holt` bit-exactly.
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_holt_fn(alpha, beta),
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------- T31: streaming autocorrelation over bucket-sum state -----
ACF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("lag", T.IntegerType()),
        T.StructField("n", T.LongType()),
        T.StructField("acf_num", T.LongType()),
        T.StructField("var_a_num", T.LongType()),
        T.StructField("var_b_num", T.LongType()),
        T.StructField("acf", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)


def acf_from_series(
    buckets: list[int], sums: list[int], max_lag: int
) -> list[tuple[int, int, int, int, int, float | None]]:
    """The A48 bucket-index-paired ACF over the reconstructed series:
    min-centered dollar-quantized values, exact-int moment sums per lag,
    one float division/sqrt per output row evaluating the identical
    IEEE chain as the batch operator (num → double, ÷ sqrt(dx·dy)).
    Returns (lag, n, acf_num, var_a_num, var_b_num, acf) rows for lags
    with at least one pair.  Pure; unit-tested."""
    import math

    if not sums:
        return []
    mn = min(sums)
    yc = {b: (y - mn) // 100 for b, y in zip(buckets, sums)}
    out = []
    for lag in range(1, max_lag + 1):
        n = sa = sb = sab = saa = sbb = 0
        for b, ya in yc.items():
            yb = yc.get(b + lag)
            if yb is None:
                continue
            n += 1
            sa += ya
            sb += yb
            sab += ya * yb
            saa += ya * ya
            sbb += yb * yb
        if not n:
            continue
        num = n * sab - sa * sb
        dx = n * saa - sa * sa
        dy = n * sbb - sb * sb
        acf = (
            float(num) / math.sqrt(float(dx) * float(dy))
            if dx > 0 and dy > 0
            else None
        )
        out.append((lag, n, num, dx, dy, acf))
    return out


def make_acf_fn(max_lag: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        rows = acf_from_series(buckets, sums, max_lag)
        if not rows:
            return
        yield pd.DataFrame(
            {
                "metric_name": [metric] * len(rows),
                "lag": pd.Series([r[0] for r in rows], dtype="int32"),
                "n": [r[1] for r in rows],
                "acf_num": [r[2] for r in rows],
                "var_a_num": [r[3] for r in rows],
                "var_b_num": [r[4] for r in rows],
                "acf": pd.array([r[5] for r in rows], dtype="float64"),
                "version": [version] * len(rows),
            }
        )

    return fn


def streaming_acf(stream: DataFrame, max_lag: int) -> DataFrame:
    """T31: the A48 lag-1..L autocorrelation served LIVE — bucket-sum
    state consumer where a single new/late bucket moves the global MIN
    (the centering anchor) and creates/destroys pairs at every lag, so
    the whole lag table is re-derived per emit from the commutative
    exact-int bucket sums.  Drained max-version rows equal the batch
    `metric_acf` bit-exactly (the float column evaluates the identical
    IEEE chain).  Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_acf_fn(max_lag),
        outputStructType=ACF_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------- T32: streaming Theil-Sen slope over bucket-sum state -------
THEILSEN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("n_buckets", T.IntegerType()),
        T.StructField("n_pairs", T.IntegerType()),
        T.StructField("median_slope_cents_per_hour", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)


def theil_sen_from_series(
    buckets: list[int], sums: list[int]
) -> tuple[int, float] | None:
    """The A51 median-of-pairwise-slopes estimator over the reconstructed
    hour series: every (i < j) slope as one IEEE double division of
    exact int64 deltas, lower order statistic at rank ceil(p/2) of the
    ascending sort — the identical element both batch engines pick.
    Vectorized in numpy (float64 division and sort are the same IEEE
    doubles).  Returns (n_pairs, median_slope); None below 2 points."""
    import numpy as np

    n = len(sums)
    if n < 2:
        return None
    x = np.asarray(buckets, dtype=np.float64)
    y = np.asarray(sums, dtype=np.float64)
    i, j = np.triu_indices(n, k=1)
    slopes = (y[j] - y[i]) / (x[j] - x[i])
    slopes.sort()
    p = len(slopes)
    return p, float(slopes[-(-p // 2) - 1])


def make_theilsen_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        res = theil_sen_from_series(buckets, sums)
        if res is None:
            return
        n_pairs, med = res
        yield pd.DataFrame(
            {
                "metric_name": [metric],
                "n_buckets": pd.Series([len(sums)], dtype="int32"),
                "n_pairs": pd.Series([n_pairs], dtype="int32"),
                "median_slope_cents_per_hour": [med],
                "version": [version],
            }
        )

    return fn


def streaming_theil_sen(stream: DataFrame) -> DataFrame:
    """T32: the A51 Theil-Sen robust trend served LIVE — a late bucket
    adds n−1 new pairwise slopes AND moves the median's rank, so the
    estimator is re-derived per emit from the commutative exact-int
    hour sums (the pair set is O(H²) in the RETENTION window, never the
    corpus — the same bound the batch operator documents).  Drained
    max-version rows equal the batch `metric_theil_sen` bit-exactly.
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_theilsen_fn(),
        outputStructType=THEILSEN_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------- T28: streaming Mann-Whitney U over two-cohort count maps ------
MANNWHITNEY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("da", T.ArrayType(T.LongType())),
        T.StructField("db", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)

MANNWHITNEY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_a", T.LongType()),
        T.StructField("n_b", T.LongType()),
        T.StructField("r_a_x2", T.LongType()),
        T.StructField("u_a_x2", T.LongType()),
        T.StructField("tie_term", T.LongType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)


def fold_value_counts(
    vals: list[float], da: list[int], db: list[int], batch_rows
) -> tuple[list[float], list[int], list[int]]:
    """Fold (value, is_a) rows into the two per-value cohort counters —
    COMMUTATIVE integer addition keyed on the exact double value (the
    batch A64 groups on the same raw column, so float equality is the
    shared key semantics); kept sorted by value so the drain walk needs
    no re-sort. Pure; unit-tested.

    NaN is REJECTED at the fold boundary (r11 ADVICE): Python dict keys
    use ``NaN != NaN`` so each NaN row would become its own counter and
    ``sorted()`` over NaN keys is order-unstable — silently diverging
    from the batch groupBy, which treats NaNs as equal.  A rank test
    over NaN observations has no defined semantics anyway; callers must
    filter or impute first (the gated plans project a non-null cents
    column, so the assert is unreachable there)."""
    import math

    acc: dict[float, list[int]] = {v: [x, y] for v, x, y in zip(vals, da, db)}
    for v, is_a in batch_rows:
        v = float(v)
        if math.isnan(v):
            raise ValueError(
                "fold_value_counts: NaN observation — rank statistics are"
                " undefined over NaN; filter or impute upstream"
            )
        cell = acc.setdefault(v, [0, 0])
        cell[0 if is_a else 1] += 1
    items = sorted(acc.items())
    return (
        [v for v, _ in items],
        [c[0] for _, c in items],
        [c[1] for _, c in items],
    )


def mannwhitney_from_counts(
    vals: list[float], da: list[int], db: list[int]
) -> tuple[int, int, int, int, int, float | None]:
    """The A64 exact rank algebra over the sorted per-value cohort
    counts: 2·R_A = Σ da·(2·below + t + 1), U·2 = 2·R_A − n_a(n_a+1),
    tie-corrected z as the identical IEEE chain the batch operator and
    its oracle evaluate (python floats are the same doubles; matching
    the operation order makes the drained z bit-exact).  Pure;
    unit-tested against the batch operator."""
    import math

    n_a = sum(da)
    n_b = sum(db)
    below = 0
    r_a_x2 = 0
    tie_term = 0
    for a, b in zip(da, db):
        t = a + b
        r_a_x2 += a * (2 * below + t + 1)
        tie_term += t * t * t - t
        below += t
    u_a_x2 = r_a_x2 - n_a * (n_a + 1)
    n = n_a + n_b
    z: float | None = None
    if n_a > 0 and n_b > 0 and n > 1 and tie_term < n * (n - 1) * (n + 1):
        z = (float(u_a_x2) - float(n_a) * float(n_b)) / (
            2.0
            * math.sqrt(
                float(n_a)
                * float(n_b)
                * ((float(n) + 1.0) - float(tie_term) / (float(n) * (float(n) - 1.0)))
                / 12.0
            )
        )
    return n_a, n_b, r_a_x2, u_a_x2, tie_term, z


def make_mannwhitney_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        etype = str(key[0])
        if state.exists:
            vals, da, db, version = state.get
            vals, da, db = list(vals), list(da), list(db)
        else:
            vals, da, db, version = [], [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            vals, da, db = fold_value_counts(
                vals, da, db, zip(pdf["value"].tolist(), pdf["is_a"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((vals, da, db, version))
        n_a, n_b, r2, u2, tie, z = mannwhitney_from_counts(vals, da, db)
        yield pd.DataFrame(
            {
                "event_type": [etype],
                "n_a": [n_a],
                "n_b": [n_b],
                "r_a_x2": [r2],
                "u_a_x2": [u2],
                "tie_term": [tie],
                "z": pd.array([z], dtype="float64"),
                "version": [version],
            }
        )

    return fn


def streaming_mannwhitney(stream: DataFrame) -> DataFrame:
    """T28: the A64 Mann-Whitney U served LIVE — the first TWO-SAMPLE
    rank test in the state family: the state is the pair of per-value
    cohort counters (commutative integer folds keyed on the exact
    value, arrival-order free), and every emit re-derives the full rank
    structure — one late value re-ranks every value above it, the same
    no-incremental-scalar argument as T25's one-sample Pettitt.  The
    drained max-version rows equal the batch `events_mannwhitney`
    bit-exactly, including the z chain (python doubles, identical
    operation order).  Expects (event_type, value, is_a)."""
    keyed = stream.select(
        F.col("event_type").cast("string").alias("event_type"),
        F.col("value").cast("double").alias("value"),
        F.col("is_a").cast("boolean").alias("is_a"),
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        make_mannwhitney_fn(),
        outputStructType=MANNWHITNEY_OUTPUT_SCHEMA,
        stateStructType=MANNWHITNEY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------- T34: streaming KMV distinct sketch ---------------------
KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("minima", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_state", T.LongType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)

#: must match the batch A87 constant (plans/analytics_ext_queries._KMV_K)
#: — the gate proves the twin against that operator's oracle.
KMV_K = 64


def make_kmv_fn(k: int = KMV_K):
    """Per-key fold keeping the k smallest DISTINCT hashes — the KMV
    merge is a sorted-unique union truncated at k, which is exactly why
    the sketch is mergeable: minima(A ∪ B) = trunc_k(minima(A) ∪
    minima(B)), associative and commutative, so micro-batch order and
    shard boundaries cannot change the drained state.  State is ≤ k
    int64s per key FOREVER (the bounded-state contract the exact
    distinct count cannot offer); when the state holds fewer than k
    entries it IS the full distinct-hash set and the estimate downstream
    is exact by definition."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        etype = str(key[0])
        if state.exists:
            minima, version = state.get
            cur = list(minima)
        else:
            cur, version = [], 0
        absorbed = 0
        incoming: set[int] = set()
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            incoming.update(pdf["h"].tolist())
        if not absorbed:
            return
        merged = sorted(set(cur) | incoming)[:k]
        version += absorbed
        state.update((merged, version))
        yield pd.DataFrame(
            {
                "event_type": [etype],
                "n_state": [len(merged)],
                "kth_hash": pd.array(
                    [merged[k - 1] if len(merged) >= k else None],
                    dtype="Int64",
                ),
                "version": [version],
            }
        )

    return fn


def streaming_kmv(stream: DataFrame, k: int = KMV_K) -> DataFrame:
    """T34: the A87 KMV cardinality sketch served LIVE — the bounded
    companion of T33's CMS (frequency) fold: counting DISTINCT keys
    exactly needs state that grows with the key space; the KMV state is
    ≤ k hashes per group whatever flows through, and the k-minima merge
    is associative/commutative so the drained kth-hash equals the batch
    scan's bit-exactly.  Expects (event_type, h) with h the portable
    md5-60 hash; versioned emission, max-version drain."""
    keyed = stream.select(
        F.col("event_type").cast("string").alias("event_type"),
        F.col("h").cast("long").alias("h"),
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        make_kmv_fn(k),
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------- T35: streaming last-touch attribution ------------------
ATTR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_id", T.LongType()),
        T.StructField("last_ch", T.StringType()),
    ]
)

ATTR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("cents", T.LongType()),
    ]
)


def make_lasttouch_fn(lookback_us: int):
    """Per-user fold carrying ONLY the most recent touch — the A28
    carry-forward window expressed as 3 fields of state per user,
    forever: each batch's rows apply in (ts, event_id) order (the same
    total order the batch window sorts by; the ordered-chunk transport
    guarantees cross-batch order), touches overwrite the state,
    purchases emit their attribution against it exactly once.  This is
    the degenerate-but-load-bearing end of the state-size spectrum the
    T2x family walks: sessions hold an open horizon, the as-of join a
    purchase map — last-touch needs three scalars, which is why
    real-time attribution is cheap at any scale."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts_us, last_id, last_ch = state.get
        else:
            last_ts_us, last_id, last_ch = None, None, None
        out_ch: list[str] = []
        out_cents: list[int] = []
        rows = []
        for pdf in pdfs:
            if len(pdf):
                rows.append(
                    zip(
                        pdf["ts_us"].tolist(),
                        pdf["event_id"].tolist(),
                        pdf["event_type"].tolist(),
                        pdf["touch_ch"].tolist(),
                        pdf["cents"].tolist(),
                    )
                )
        if not rows:
            return
        # plain-Python sort on (ts, event_id) replaces the per-group
        # pd.concat + sort_values (event_id is unique, so the key pair is
        # a total order — identical row order, ~5x less per-group cost)
        batch = [r for part in rows for r in part]
        batch.sort(key=lambda r: (r[0], r[1]))
        for ts_us, eid, etype, ch, cents_ in batch:
            if isinstance(ch, str) and ch:
                last_ts_us, last_id, last_ch = int(ts_us), int(eid), ch
            elif etype == "purchase":
                if (
                    last_ts_us is not None
                    and int(ts_us) - last_ts_us <= lookback_us
                ):
                    out_ch.append(last_ch)
                else:
                    out_ch.append("direct")
                out_cents.append(int(cents_))
        state.update((last_ts_us, last_id, last_ch))
        if out_ch:
            yield pd.DataFrame(
                {"channel": _obj(out_ch), "cents": _i64(out_cents)},
                copy=False,
            )

    return fn


def streaming_last_touch(stream: DataFrame, lookback_us: int) -> DataFrame:
    """T35: A28's last-touch attribution served LIVE.  Expects
    (user_id, ts_us, event_id, event_type, touch_ch, cents) with
    touch_ch NULL on non-touch rows; emits one (channel, cents) row per
    purchase, exactly once, in append mode — the channel report is a
    plain aggregation over the drained emissions."""
    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts_us").cast("long").alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type").cast("string").alias("event_type"),
        F.col("touch_ch").cast("string").alias("touch_ch"),
        F.col("cents").cast("long").alias("cents"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_lasttouch_fn(lookback_us),
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -------------- T36: streaming SPC rules over bucket-sum state ------------
SPC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("value_dollars", T.LongType()),
        T.StructField("side", T.LongType()),
        T.StructField("rule1", T.BooleanType()),
        T.StructField("rule4", T.BooleanType()),
        T.StructField("version", T.LongType()),
    ]
)

#: must match the batch A100 constant (plans/metrics_queries._SPC_RUN)
SPC_RUN = 9


def spc_from_series(
    buckets: list[int], cents_sums: list[int], run: int = SPC_RUN
) -> list[tuple[int, int, int, bool, bool]]:
    """The A100 exact-int SPC scan over a bucket-ordered cents series:
    dollar-rescale each bucket (`sum div 100`, the batch truncation),
    center-line rationals from the WHOLE series (n, S, Q), rule 1 =
    `(x·n−S)² > 9·(n·Q−S²)`, rule 4 = `run` consecutive strictly
    same-side points.  Returns violation rows
    (bucket, x, side, rule1, rule4).  Pure; unit-tested against the
    batch operator."""
    xs = [s // 100 for s in cents_sums]
    n = len(xs)
    if n == 0:
        return []
    s_tot = sum(xs)
    q_tot = sum(x * x for x in xs)
    var9 = 9 * (n * q_tot - s_tot * s_tot)
    sides = [
        (1 if x * n - s_tot > 0 else -1 if x * n - s_tot < 0 else 0)
        for x in xs
    ]
    out = []
    for i, x in enumerate(xs):
        dev = x * n - s_tot
        r1 = dev * dev > var9
        window = sides[max(0, i - run + 1): i + 1]
        r4 = len(window) == run and abs(sum(window)) == run
        if r1 or r4:
            out.append((buckets[i], x, sides[i], r1, r4))
    return out


def make_spc_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        hits = spc_from_series(buckets, sums)
        # NULL-bucket sentinel on zero-violation versions: a late bucket
        # shifts the GLOBAL center line, so earlier violations can
        # RETRACT — the sentinel carries the superseding version
        yield pd.DataFrame(
            {
                "metric_name": [metric] * max(len(hits), 1),
                "bucket": pd.array(
                    [h[0] for h in hits] or [None], dtype="Int64"
                ),
                "value_dollars": pd.array(
                    [h[1] for h in hits] or [None], dtype="Int64"
                ),
                "side": pd.array(
                    [h[2] for h in hits] or [None], dtype="Int64"
                ),
                "rule1": pd.array(
                    [h[3] for h in hits] or [None], dtype="boolean"
                ),
                "rule4": pd.array(
                    [h[4] for h in hits] or [None], dtype="boolean"
                ),
                "version": [version] * max(len(hits), 1),
            }
        )

    return fn


def streaming_spc(stream: DataFrame) -> DataFrame:
    """T36: the A100 Western-Electric rules served LIVE — consumer of
    the bucket-sum state family with a GLOBAL-statistic recursion: the
    center line and σ come from the whole control period, so one late
    bucket moves every point's test (create/move/RETRACT — hence the
    versioned-emission sentinel and max-version drain).  State is the
    same commutative exact-int cents sums as every family member;
    drained rows gate on the batch `metric_spc_rules` oracle verbatim.
    Expects (metric_name, bucket, v=cents)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_spc_fn(),
        outputStructType=SPC_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------ T37 ---------
SEASONAL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("trend_sum25", T.LongType()),
        T.StructField("n_win", T.LongType()),
        T.StructField("detr25", T.LongType()),
        T.StructField("hod", T.LongType()),
        T.StructField("seasonal", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)

#: must match the batch A84 window half-width (rowsBetween(-12, 12))
SEASONAL_HALF = 12


def seasonal_from_series(buckets: list[int], sums: list[int]):
    """A84's additive decomposition re-derived from the bucket-sum state
    — the same formulas as the batch plan, verbatim: trend = 25-row
    POSITIONAL centered sum over the present-bucket sequence, detrended
    value in exact ints (25·v − trend_sum25, only where the window is
    full), seasonal = per-hour-of-day mean of the detrended values as
    ONE IEEE division of exact-int aggregates.  Emits one row per
    present bucket: (bucket, v, trend_sum25, n_win, detr25, hod,
    seasonal)."""
    n = len(buckets)
    h = SEASONAL_HALF
    trend = []
    for i in range(n):
        lo, hi = max(0, i - h), min(n, i + h + 1)
        trend.append((sum(sums[lo:hi]), hi - lo))
    detr = [
        25 * sums[i] - trend[i][0] if trend[i][1] == 25 else None
        for i in range(n)
    ]
    hods = [b % 24 for b in buckets]
    num: dict[int, int] = {}
    cnt: dict[int, int] = {}
    for d, hod in zip(detr, hods):
        if d is not None:
            num[hod] = num.get(hod, 0) + d
            cnt[hod] = cnt.get(hod, 0) + 1
    seas = {hod: float(num[hod]) / (25.0 * float(cnt[hod])) for hod in num}
    return [
        (
            buckets[i],
            sums[i],
            trend[i][0],
            trend[i][1],
            detr[i],
            hods[i],
            seas.get(hods[i]),
        )
        for i in range(n)
    ]


def make_seasonal_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        rows = seasonal_from_series(buckets, sums)
        # every version emits the FULL per-bucket decomposition (a late
        # bucket shifts the trend window of its 24 neighbors and the
        # global seasonal means), so the max-version drain needs no
        # retraction sentinel: versions are always non-empty supersets
        yield pd.DataFrame(
            {
                "metric_name": [metric] * len(rows),
                "bucket": pd.array([r[0] for r in rows], dtype="Int64"),
                "v": pd.array([r[1] for r in rows], dtype="Int64"),
                "trend_sum25": pd.array([r[2] for r in rows], dtype="Int64"),
                "n_win": pd.array([r[3] for r in rows], dtype="Int64"),
                "detr25": pd.array([r[4] for r in rows], dtype="Int64"),
                "hod": pd.array([r[5] for r in rows], dtype="Int64"),
                "seasonal": pd.array([r[6] for r in rows], dtype="Float64"),
                "version": [version] * len(rows),
            }
        )

    return fn


def streaming_seasonal(stream: DataFrame) -> DataFrame:
    """T37: the A84 trend/seasonal decomposition served LIVE — another
    GLOBAL-statistic member of the bucket-sum state family (the r13
    verdict's Next #5): one late bucket moves the 25-row trend window of
    its positional neighbors AND the per-hour-of-day seasonal means, so
    each version re-emits the full decomposition and the drain keeps the
    max version per metric.  State is the same commutative exact-int
    bucket sums as every family member; drained rows gate on the batch
    `metric_seasonal_decompose` oracle verbatim.
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_seasonal_fn(),
        outputStructType=SEASONAL_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------ T38 ---------
AUTOPERIOD_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("dominant_lag", T.LongType()),
        T.StructField("dominant_acf", T.DoubleType()),
        T.StructField("second_lag", T.LongType()),
        T.StructField("second_acf", T.DoubleType()),
        T.StructField("is_daily", T.BooleanType()),
        T.StructField("version", T.LongType()),
    ]
)

#: must match the batch A102 constants (plans/metrics_queries._AP_*)
AUTOPERIOD_MIN_LAG = 2
AUTOPERIOD_MAX_LAG = 36


def autoperiod_from_series(buckets: list[int], sums: list[int]):
    """A102's ACF-argmax re-derived from the bucket-sum state — the A48
    exact-int moment machinery verbatim: min-centered dollar-quantized
    series, per-lag exact moment sums, the one-sqrt IEEE correlation
    expression (float(num) / sqrt(float(dx) * float(dy)) — the same
    fixed expression tree as the batch plan, so the doubles are
    bit-identical), argmax with lag tie-break and NULLS LAST.  Returns
    (dominant_lag, dominant_acf, second_lag, second_acf, is_daily) or
    None when no lag in [MIN, MAX] has a pair yet."""
    import math

    if not buckets:
        return None
    mn = min(sums)
    pos = {b: (y - mn) // 100 for b, y in zip(buckets, sums)}
    rows = []
    for lag in range(AUTOPERIOD_MIN_LAG, AUTOPERIOD_MAX_LAG + 1):
        n = sa = sb = sab = saa = sbb = 0
        for b, ya in pos.items():
            yb = pos.get(b + lag)
            if yb is None:
                continue
            n += 1
            sa += ya
            sb += yb
            sab += ya * yb
            saa += ya * ya
            sbb += yb * yb
        if n == 0:
            continue
        dx = n * saa - sa * sa
        dy = n * sbb - sb * sb
        acf = None
        if dx > 0 and dy > 0:
            acf = float(n * sab - sa * sb) / math.sqrt(float(dx) * float(dy))
        rows.append((lag, acf))
    if not rows:
        return None
    # row_number ORDER BY acf DESC NULLS LAST, lag ASC
    rows.sort(key=lambda r: (r[1] is None, -(r[1] or 0.0), r[0]))
    d_lag, d_acf = rows[0]
    s_lag, s_acf = rows[1] if len(rows) > 1 else (None, None)
    is_daily = None if d_lag is None else (23 <= d_lag <= 25)
    return (d_lag, d_acf, s_lag, s_acf, is_daily)


def make_autoperiod_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        row = autoperiod_from_series(buckets, sums)
        if row is None:
            # no qualifying lag yet; the series only grows, so once a
            # version emits, every later version emits too — the
            # max-version drain never resurrects a stale row
            return
        yield pd.DataFrame(
            {
                "metric_name": [metric],
                "dominant_lag": pd.array([row[0]], dtype="Int64"),
                "dominant_acf": pd.array([row[1]], dtype="Float64"),
                "second_lag": pd.array([row[2]], dtype="Int64"),
                "second_acf": pd.array([row[3]], dtype="Float64"),
                "is_daily": pd.array([row[4]], dtype="boolean"),
                "version": [version],
            }
        )

    return fn


def streaming_autoperiod(stream: DataFrame) -> DataFrame:
    """T38: the A102 dominant-period detector served LIVE — the
    bucket-sum state family's third global-statistic member (r13
    verdict Next #5): every late or new bucket can move the per-lag
    moment sums and re-order the ACF argmax, so each version re-emits
    the metric's one report row and the drain keeps the max version.
    Gated on the batch `metric_autoperiod` oracle verbatim.
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_autoperiod_fn(),
        outputStructType=AUTOPERIOD_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------ T39 ---------
WINSOR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("n_buckets", T.LongType()),
        T.StructField("p05", T.LongType()),
        T.StructField("p95", T.LongType()),
        T.StructField("n_clip_low", T.LongType()),
        T.StructField("n_clip_high", T.LongType()),
        T.StructField("sum_raw", T.LongType()),
        T.StructField("sum_winsor", T.LongType()),
        T.StructField("winsor_mean", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)

#: must match the batch A86 constants (plans/metrics_queries._WINS_*)
WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


def winsorize_from_series(buckets: list[int], sums: list[int]):
    """A86's winsorized robust statistics re-derived from the bucket-sum
    state — the batch formulas verbatim: EXACT nearest-rank p05/p95
    (rank ``(p·n + 99) div 100`` over the total (value, bucket) order),
    exact-int clipped sums, winsorized mean as ONE IEEE division.
    Returns the report tuple, or None for an empty series."""
    n = len(buckets)
    if n == 0:
        return None
    order = sorted(zip(sums, buckets))
    i_lo = (WINSOR_LO_PCT * n + 99) // 100
    i_hi = (WINSOR_HI_PCT * n + 99) // 100
    p05 = order[i_lo - 1][0]
    p95 = order[i_hi - 1][0]
    n_lo = sum(1 for v in sums if v < p05)
    n_hi = sum(1 for v in sums if v > p95)
    sum_raw = sum(sums)
    sum_w = sum(max(p05, min(p95, v)) for v in sums)
    return (
        n,
        p05,
        p95,
        n_lo,
        n_hi,
        sum_raw,
        sum_w,
        float(sum_w) / float(n),
    )


def make_winsorize_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        r = winsorize_from_series(buckets, sums)
        yield pd.DataFrame(
            {
                "metric_name": [metric],
                "n_buckets": pd.array([r[0]], dtype="Int64"),
                "p05": pd.array([r[1]], dtype="Int64"),
                "p95": pd.array([r[2]], dtype="Int64"),
                "n_clip_low": pd.array([r[3]], dtype="Int64"),
                "n_clip_high": pd.array([r[4]], dtype="Int64"),
                "sum_raw": pd.array([r[5]], dtype="Int64"),
                "sum_winsor": pd.array([r[6]], dtype="Int64"),
                "winsor_mean": pd.array([r[7]], dtype="Float64"),
                "version": [version],
            }
        )

    return fn


def streaming_winsorize(stream: DataFrame) -> DataFrame:
    """T39: the A86 winsorized robust statistics served LIVE — a fourth
    global-statistic member of the bucket-sum state family: every bucket
    moves the nearest-rank positional bounds, so each version re-emits
    the metric's one report row and the drain keeps the max version.
    Gated on the batch `metric_winsorize` oracle verbatim.
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_winsorize_fn(),
        outputStructType=WINSOR_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------------ T40 ---------
RANGE_RATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("win", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("first_bucket", T.LongType()),
        T.StructField("last_bucket", T.LongType()),
        T.StructField("counter_first", T.LongType()),
        T.StructField("counter_last", T.LongType()),
        T.StructField("n_resets", T.LongType()),
        T.StructField("increase", T.LongType()),
        T.StructField("rate_per_hour", T.DoubleType()),
        T.StructField("version", T.LongType()),
    ]
)

#: must match the batch A104 constants (plans/metrics_queries._RATE_*)
RANGE_RATE_WRAP = 2_000_000
RANGE_RATE_WIN = 6


def range_rate_from_series(buckets: list[int], sums: list[int]):
    """A104's reset-aware range windows re-derived from the bucket-sum
    state — the batch formulas verbatim: counter = running cumulative
    sum wrapped at RANGE_RATE_WRAP; per 6h-aligned window, increase =
    Σ reset-aware deltas between consecutive in-window samples (the T3
    rule — a wrapped counter contributes its new value), the
    window-opening sample contributes nothing, rate = ONE IEEE division
    (NULL on single-sample windows).  A late bucket shifts the cumsum
    of every later sample, so the whole window table revises per emit.
    Returns rows of (win, n_samples, first_bucket, last_bucket,
    counter_first, counter_last, n_resets, increase, rate_per_hour)."""
    cum = 0
    series = []
    for b, v in zip(buckets, sums):
        # Python % is always non-negative while the batch plan/oracle use
        # Spark/DuckDB % (sign follows the dividend) — they agree ONLY
        # while the cumulative sum stays >= 0.  Enforce the invariant the
        # bit-exactness depends on instead of assuming it (r14 advice): a
        # negative-sum metric source must fail loudly, not drift silently.
        if v < 0:
            raise ValueError(
                f"range_rate_from_series requires non-negative bucket sums "
                f"(counter semantics); got {v} at bucket {b}"
            )
        cum += v
        series.append((b, cum % RANGE_RATE_WRAP))
    wins: dict[int, dict] = {}
    for i, (b, c) in enumerate(series):
        w = b // RANGE_RATE_WIN
        st = wins.setdefault(
            w,
            {"n": 0, "fb": b, "lb": b, "cf": c, "cl": c, "rs": 0, "inc": 0},
        )
        st["n"] += 1
        if b < st["fb"]:
            st["fb"], st["cf"] = b, c
        if b > st["lb"]:
            st["lb"], st["cl"] = b, c
        if i > 0 and series[i - 1][0] // RANGE_RATE_WIN == w:
            prev = series[i - 1][1]
            if c >= prev:
                st["inc"] += c - prev
            else:
                st["inc"] += c
                st["rs"] += 1
    out = []
    for w in sorted(wins):
        st = wins[w]
        span = st["lb"] - st["fb"]
        rate = float(st["inc"]) / float(span) if span > 0 else None
        out.append(
            (
                w,
                st["n"],
                st["fb"],
                st["lb"],
                st["cf"],
                st["cl"],
                st["rs"],
                st["inc"],
                rate,
            )
        )
    return out


def make_range_rate_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        rows = range_rate_from_series(buckets, sums)
        yield pd.DataFrame(
            {
                "metric_name": [metric] * len(rows),
                "win": pd.array([r[0] for r in rows], dtype="Int64"),
                "n_samples": pd.array([r[1] for r in rows], dtype="Int64"),
                "first_bucket": pd.array([r[2] for r in rows], dtype="Int64"),
                "last_bucket": pd.array([r[3] for r in rows], dtype="Int64"),
                "counter_first": pd.array([r[4] for r in rows], dtype="Int64"),
                "counter_last": pd.array([r[5] for r in rows], dtype="Int64"),
                "n_resets": pd.array([r[6] for r in rows], dtype="Int64"),
                "increase": pd.array([r[7] for r in rows], dtype="Int64"),
                "rate_per_hour": pd.array(
                    [r[8] for r in rows], dtype="Float64"
                ),
                "version": [version] * len(rows),
            }
        )

    return fn


def streaming_range_rate(stream: DataFrame) -> DataFrame:
    """T40: the A104 PromQL-style range rate served LIVE — the
    bucket-sum state family member with the strongest revision
    coupling: the counter is the RUNNING CUMULATIVE sum, so one late
    bucket shifts every later sample's counter value and the whole
    window table re-derives per emit (versions are always non-empty
    supersets; the drain keeps the max version).  Gated on the batch
    `metric_range_rate` oracle verbatim.
    Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_range_rate_fn(),
        outputStructType=RANGE_RATE_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------- T42: streaming Holt forecast backtest (A94 served live) --------
FORECAST_BT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("n_train", T.IntegerType()),
        T.StructField("n_test", T.IntegerType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("mae_holt_cents", T.LongType()),
        T.StructField("mae_naive_cents", T.LongType()),
        T.StructField("improvement_ppm", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)

#: must match the batch A94 constants (plans/metrics_queries._BT_TEST_FRAC_*)
FORECAST_BT_FRAC_NUM = 1
FORECAST_BT_FRAC_DEN = 5
FORECAST_BT_MIN_POINTS = 5


def _round_half_up(x: float) -> int:
    """Spark's round(double, 0): BigDecimal(Double.toString(x)) with
    HALF_UP.  Python's repr() is the same shortest round-trip decimal
    rendering as Double.toString, so Decimal(repr(x)) sees the identical
    digits; banker's-rounding round() would disagree on exact .5."""
    import decimal

    return int(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )


def _div_trunc(a: int, b: int) -> int:
    """Spark/DuckDB integer ``div``: truncation toward zero (Python //
    floors, which differs on a negative numerator — improvement_ppm can
    be negative when the trend term is hurting)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def forecast_backtest_from_series(
    sums: list[int], alpha: float, beta: float
) -> tuple | None:
    """A94's holdout backtest re-derived from the bucket-sum state — the
    batch formulas verbatim: train fold = the A53 Holt recursion over
    the first n_train points (n_train = n − n·1 div 5), each holdout
    error HALF_UP-rounded to int64 cents BEFORE summation, MAE and
    improvement integer divisions.  A late bucket can shift the
    train/test split point itself, so the whole backtest re-derives per
    emit.  Returns (n_train, n_test, level, trend, mae_holt_cents,
    mae_naive_cents, improvement_ppm); None below 5 points."""
    ys = [float(y) for y in sums]
    n = len(ys)
    if n < FORECAST_BT_MIN_POINTS:
        return None
    n_train = n - _div_trunc(n * FORECAST_BT_FRAC_NUM, FORECAST_BT_FRAC_DEN)
    n_test = n - n_train
    ca, cb = 1.0 - alpha, 1.0 - beta
    l, b = ys[0], ys[1] - ys[0]
    for x in ys[2:n_train]:
        lnew = alpha * x + ca * (l + b)
        b = beta * (lnew - l) + cb * b
        l = lnew
    abs_holt = 0
    abs_naive = 0
    last_train = ys[n_train - 1]
    for i in range(n_train + 1, n + 1):  # 1-based, the batch sequence()
        abs_holt += _round_half_up(abs(ys[i - 1] - (l + (i - n_train) * b)))
        abs_naive += _round_half_up(abs(ys[i - 1] - last_train))
    improvement = (
        _div_trunc((abs_naive - abs_holt) * 1_000_000, abs_naive)
        if abs_naive > 0
        else 0
    )
    return (
        n_train,
        n_test,
        l,
        b,
        _div_trunc(abs_holt, n_test),
        _div_trunc(abs_naive, n_test),
        improvement,
    )


def make_forecast_backtest_fn(alpha: float, beta: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        res = forecast_backtest_from_series(sums, alpha, beta)
        if res is None:
            return
        n_train, n_test, l, b, mae_h, mae_n, imp = res
        yield pd.DataFrame(
            {
                "metric_name": [metric],
                "n_train": pd.Series([n_train], dtype="int32"),
                "n_test": pd.Series([n_test], dtype="int32"),
                "level": [l],
                "trend": [b],
                "mae_holt_cents": pd.Series([mae_h], dtype="int64"),
                "mae_naive_cents": pd.Series([mae_n], dtype="int64"),
                "improvement_ppm": pd.Series([imp], dtype="int64"),
                "version": [version],
            }
        )

    return fn


def streaming_forecast_backtest(
    stream: DataFrame, alpha: float, beta: float
) -> DataFrame:
    """T42: the A94 Holt forecast backtest served LIVE — the governor's
    fall-back-to-EWMA decision (improvement ≤ 0 means the trend term is
    hurting) is a streaming decision, so the family's forecasting audit
    needed a live twin (r14 verdict Next #7).  State is the commutative
    exact-int bucket sums; each emit re-derives the train/test split,
    the A53 train fold, the HALF_UP-rounded holdout errors and the
    integer MAE/improvement — a late bucket can move the split point
    itself, so no partial fold survives out-of-order delivery.  Drained
    max-version rows gate on the batch `metric_forecast_backtest`
    oracle verbatim.  Expects (metric_name, bucket, v)."""
    keyed = stream.select(
        F.col("metric_name").cast("string").alias("metric_name"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("metric_name").applyInPandasWithState(
        make_forecast_backtest_fn(alpha, beta),
        outputStructType=FORECAST_BT_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------- T43: streaming supplier HHI (A108 served live) -------------
HHI_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("nation", T.StringType()),
        T.StructField("n_suppliers", T.LongType()),
        T.StructField("revenue_cents", T.LongType()),
        T.StructField("hhi", T.LongType()),
        T.StructField("band", T.StringType()),
        T.StructField("version", T.LongType()),
    ]
)


def hhi_from_series(sums: list[int]) -> tuple | None:
    """A108's concentration math re-derived from per-supplier revenue
    state — the batch formulas verbatim: milli-shares by truncating
    integer division of exact cent sums, HHI an exact integer sum of
    their squares, DOJ bands integer compares.  A new lineitem for ANY
    supplier moves the total and therefore EVERY share, so the whole
    index re-derives per emit.  Returns (n_suppliers, revenue_cents,
    hhi, band); None on empty/zero-revenue state."""
    tot = sum(sums)
    if not sums or tot <= 0:
        return None
    hhi = 0
    for rev in sums:
        share = (rev * 1000) // tot  # non-negative: // == truncation
        hhi += share * share
    band = (
        "unconcentrated"
        if hhi < 150_000
        else ("moderate" if hhi <= 250_000 else "high")
    )
    return (len(sums), tot, hhi, band)


def make_hhi_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        nation = str(key[0])
        if state.exists:
            buckets, sums, version = state.get
            buckets, sums = list(buckets), list(sums)
        else:
            buckets, sums, version = [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            buckets, sums = fold_bucket_sums(
                buckets, sums, zip(pdf["bucket"].tolist(), pdf["v"].tolist())
            )
        if not absorbed:
            return
        version += absorbed
        state.update((buckets, sums, version))
        res = hhi_from_series(sums)
        if res is None:
            return
        n_supp, tot, hhi, band = res
        yield pd.DataFrame(
            {
                "nation": [nation],
                "n_suppliers": pd.Series([n_supp], dtype="int64"),
                "revenue_cents": pd.Series([tot], dtype="int64"),
                "hhi": pd.Series([hhi], dtype="int64"),
                "band": [band],
                "version": [version],
            }
        )

    return fn


def streaming_supplier_hhi(stream: DataFrame) -> DataFrame:
    """T43: the A108 supplier-concentration index served LIVE — the
    sourcing-risk KPI is exactly the kind of dashboard number a
    procurement monitor watches DURING ingestion (a market drifting
    into the 'high' band is an alert, not a quarterly report).  State
    is the bucket-sum family keyed (nation → per-supplier cent sums):
    commutative integer sums, so micro-batch merge order cannot change
    the drained value; every emit re-derives shares/HHI/band with the
    batch expressions verbatim (one new lineitem moves EVERY share —
    no incremental HHI survives).  Drained max-version rows gate on
    the batch `nation_supplier_hhi` oracle verbatim.
    Expects (nation, bucket=suppkey, v=cents)."""
    keyed = stream.select(
        F.col("nation").cast("string").alias("nation"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("v").cast("long").alias("v"),
    )
    return keyed.groupBy("nation").applyInPandasWithState(
        make_hhi_fn(),
        outputStructType=HHI_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------- T46: streaming post-event dwell grid (A110 served live) -------
DWELL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("eid", T.ArrayType(T.LongType())),
        T.StructField("types", T.ArrayType(T.StringType())),
        T.StructField("version", T.LongType()),
    ]
)

DWELL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("dwell_s", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def dwells_from_series(
    ts_us: list[int], types: list[str]
) -> dict[tuple[str, int], int]:
    """A110's dwell derivation over the (ts, event_id)-sorted sequence —
    the batch lead-window semantics verbatim: the gap to the NEXT event
    in integer seconds, attributed to the CURRENT event's type.  A late
    event landing BETWEEN two existing ones SPLITS their dwell into two
    shorter ones (the reason no per-pair increment survives out-of-order
    delivery — the whole grid re-derives per emit).  Timestamps are
    sorted ascending so the difference is non-negative and Python //
    equals the batch's truncating div.  Pure; unit-tested."""
    grid: dict[tuple[str, int], int] = {}
    for i in range(len(ts_us) - 1):
        key = (types[i], (ts_us[i + 1] - ts_us[i]) // 1_000_000)
        grid[key] = grid.get(key, 0) + 1
    return grid


def make_dwell_fn():
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        if state.exists:
            ts, eid, types, version = state.get
            ts, eid, types = list(ts), list(eid), list(types)
        else:
            ts, eid, types, version = [], [], [], 0
        absorbed = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            absorbed += len(pdf)
            ts, eid, types = merge_sequence(
                ts, eid, types,
                zip(
                    pdf["ts_us"].tolist(),
                    pdf["event_id"].tolist(),
                    pdf["event_type"].tolist(),
                ),
            )
        if not absorbed:
            return
        version += absorbed
        state.update((ts, eid, types, version))
        grid = dwells_from_series(ts, types)
        if not grid:
            return
        items = sorted(grid.items())
        n = len(items)
        yield pd.DataFrame(
            {
                "user_id": _full(n, user),
                "event_type": _obj([k[0] for k, _ in items]),
                "dwell_s": _i64([k[1] for k, _ in items]),
                "cnt": _i64([c for _, c in items]),
                "version": _full(n, version),
            },
            copy=False,
        )

    return fn


def streaming_dwell_grid(stream: DataFrame) -> DataFrame:
    """T46: the A110 dwell grid served LIVE — engagement drift ("users
    suddenly linger half as long after view") is a session-quality
    alarm, not a nightly report.  State is the (ts, event_id)-sorted
    per-user type sequence (the T20/T22 family); each emit re-derives
    the user's complete (type, dwell) multiset because one late event
    SPLITS an existing dwell — no incremental count survives
    out-of-order delivery.  Drained max-version user grids sum to the
    global grid; the report derivation is the batch's `dwell_report`
    verbatim, so the twin gates on the A110 oracle.
    Expects (user_id, ts_us, event_id, event_type)."""
    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts_us").cast("long").alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type").cast("string").alias("event_type"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_dwell_fn(),
        outputStructType=DWELL_OUTPUT_SCHEMA,
        stateStructType=DWELL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------- T47: per-user eviction state-size probe (round 16) ---------
#: r15 verdict #6: the twins' state bounds were unit-pinned but never
#: MEASURED in a driver-visible artifact.  This probe applies the
#: make_sequence_fn(evict=True) retention rule — watermark cut at
#: bisect_left + one below-watermark anchor — to the same ordered
#: replay and emits the per-key LIVE STATE ROW COUNT through the
#: normal output path, so the drained sizes are the real operational
#: numbers, not a formula.  The timeout re-arms at the exact next
#: state-transition instant (ts[1] crossing the watermark — the
#: production fns' next-freeze idiom; r17 replaced the wm+1 literal
#: that woke every key each micro-batch): every key holding more than
#: the anchor still sweeps at or before the final watermark whenever a
#: trim remains, so the drained sizes stay replay-chunk-independent and
#: exactly SQL-expressible (the `stream_state_budget` gate).
BUDGET_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("version", T.LongType()),
    ]
)

BUDGET_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_state", T.LongType()),
        T.StructField("version", T.LongType()),
    ]
)


def make_state_budget_fn():
    """Retention-rule mirror of ``make_sequence_fn(evict=True)``
    (sequence_state.py:122 — the bisect cut keeping ``ts[cut-1:]``:
    everything at/above the watermark plus ONE frozen anchor), reduced
    to the ts list since only SIZE is reported."""
    import bisect

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        timed_out = state.hasTimedOut
        if state.exists:
            ts, version = state.get
            ts = list(ts)
        else:
            ts, version = [], 0
        absorbed = 0
        if not timed_out:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                absorbed += len(pdf)
                # batch rows are unordered: one sort of state+batch (timsort
                # gallops over the presorted state run) replaces per-row
                # insort, and tolist() replaces per-element Series access
                ts = sorted(ts + pdf["ts_us"].tolist())
        if not absorbed and not timed_out:
            return
        version += absorbed + (1 if timed_out else 0)

        wm_ms = state.getCurrentWatermarkMs()
        cut = bisect.bisect_left(ts, wm_ms * 1000)
        if cut > 1:
            ts = ts[cut - 1 :]
        if len(ts) > 1:
            # exact re-arm (r17): the cut only advances when the watermark
            # passes ts[1] (cut > 1 ⟺ ts[1] < wm), so waking at that
            # instant — the sequence/session fns' proven idiom — sweeps at
            # every state TRANSITION instead of every watermark advance
            # (the r16 wm+1 literal woke all ~1.5k keys each micro-batch,
            # doubling the replay's per-group fixed cost).  The final
            # drained size is unchanged: a key whose ts[1] never falls
            # below the final watermark has nothing left to trim, and one
            # whose ts[1] does gets its sweep at or before the final
            # batch; the max-version drain still selects each key's last
            # emission.
            state.setTimeoutTimestamp(max(ts[1] // 1000 + 1, wm_ms + 1))
        state.update((ts, version))
        yield pd.DataFrame(
            {
                "user_id": _full(1, user),
                "n_state": _full(1, len(ts)),
                "version": _full(1, version),
            },
            copy=False,
        )

    return fn


def streaming_state_rows(stream: DataFrame) -> DataFrame:
    """Wire the state-size probe over a watermarked event stream;
    expects (user_id, ts).  Drain = max-version row per user."""
    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("ts"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        make_state_budget_fn(),
        outputStructType=BUDGET_OUTPUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
