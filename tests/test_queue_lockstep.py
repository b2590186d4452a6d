"""Queue ↔ docstring ↔ registry lockstep (round 11).

Every operator carrying a "Registration note: QUEUED" block in a plans
module must be gate-checked by scripts/check_queued.py, and must NOT
already be registered; conversely every check_queued entry must resolve
to a callable + oracle pair with disjoint-from-registry names.  This is
the mechanical guard against the failure mode the rotation cannot
catch: an implemented operator silently dropping out of both the
registry and the queue and never earning a driver row.
"""

from __future__ import annotations

import glob
import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _queued():
    spec = importlib.util.spec_from_file_location(
        "check_queued_mod", os.path.join(REPO, "scripts", "check_queued.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queued()


def _noted_names():
    """Names declared in 'Registration note: QUEUED ... Planned row:'
    comment blocks across the plans and streaming modules."""
    names = set()
    for path in glob.glob(
        os.path.join(REPO, "project_obsidian_core_spark", "plans", "*.py")
    ):
        src = open(path).read()
        for block in re.finditer(
            r"Registration note: QUEUED.*?Planned row:.*?\(\"([a-z0-9_]+)\"",
            src,
            re.S,
        ):
            names.add(block.group(1))
    return names


def test_every_queued_note_is_gate_checked():
    queued = set(_queued())
    noted = _noted_names()
    missing = noted - queued
    assert not missing, (
        f"operators with a QUEUED registration note but no check_queued "
        f"entry: {sorted(missing)}"
    )


def test_every_queue_entry_is_callable_with_oracle_and_unregistered():
    from project_obsidian_core_spark.plans.registry import QUERIES

    queued = _queued()
    # Empty queue is the GOOD state (round 12 drained it); entries only
    # return when unrecorded registrations would overflow the 50-slot
    # gate window.
    for name, (fn, sql) in queued.items():
        assert callable(fn), name
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        assert name not in QUERIES, (
            f"{name} is both queued and registered — drop it from "
            f"check_queued.py on promotion"
        )


def test_survey_operator_ids_are_unique():
    """SURVEY.md is the coverage ledger the judge counts from; duplicate
    operator IDs (the r11 X24*/M5*-M7* collisions) eventually cause a
    mis-count or a dropped row.  Every `| <ID> |` table row must carry a
    unique ID."""
    src = open(os.path.join(REPO, "SURVEY.md")).read()
    ids = re.findall(r"^\| ([A-Z]+\d+[a-z]?\*?) \|", src, re.M)
    dupes = sorted({i for i in ids if ids.count(i) > 1})
    assert not dupes, f"duplicate SURVEY operator IDs: {dupes}"


def test_queue_size_matches_staging_plan_scale():
    """SCALE.md's final staging inventory and the queue must agree on
    size — a drifted plan misleads the next round's registration."""
    queued = _queued()
    scale = open(os.path.join(REPO, "SCALE.md")).read()
    m = re.findall(r"queue =\s*(\d+) operators", scale)
    assert m, "SCALE.md staging inventory missing"
    assert int(m[-1]) == len(queued), (
        f"SCALE.md says {m[-1]} queued, check_queued has {len(queued)}"
    )
