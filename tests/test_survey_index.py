"""SURVEY_INDEX.md lockstep (r13 verdict Next #8, r15 verdict Next #2):
the committed index must equal a fresh regeneration from the registry +
staged queue — EXCEPT for the `green` round stamp, which is allowed to
drift FORWARD only.  The driver writes CORRECTNESS_rN.json after the
tree freezes, so at judge time a fresh regeneration legitimately sees a
newer green round than the committed file could have; that exact drift
(and the derived summary counts) is tolerated.  Any other difference —
a missing/extra query, a changed implementation site, an oracle flag
flip, a status change, or a green stamp moving BACKWARD — still fails
loud.
"""

from __future__ import annotations

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ROW = re.compile(r"^\| (`[^`]+`) \| (.+?) \| (yes|rows-only) \| (r\d+|-) \| (\w+) \|$")
_SUMMARY = re.compile(r"^\*\*\d+ registered\*\* \(\d+ with official green")


def _parse(text: str):
    """index text -> ({query: (impl, oracle, green_round_or_0, status)}, other_lines)"""
    rows: dict[str, tuple[str, str, int, str]] = {}
    other: list[str] = []
    for line in text.splitlines():
        m = _ROW.match(line)
        if m:
            name, impl, oracle, green, status = m.groups()
            rnd = 0 if green == "-" else int(green[1:])
            rows[name] = (impl, oracle, rnd, status)
        elif _SUMMARY.match(line):
            other.append("<summary>")  # counts derive from green stamps
        else:
            other.append(line)
    return rows, other


def test_survey_index_is_current():
    spec = importlib.util.spec_from_file_location(
        "survey_index_mod", os.path.join(REPO, "scripts", "survey_index.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    committed_rows, committed_other = _parse(
        open(os.path.join(REPO, "SURVEY_INDEX.md")).read()
    )
    fresh_rows, fresh_other = _parse(mod.generate())

    assert committed_other == fresh_other, (
        "SURVEY_INDEX.md non-row content is stale — run"
        " `python scripts/survey_index.py`"
    )
    assert set(committed_rows) == set(fresh_rows), (
        "SURVEY_INDEX.md row set is stale (added/removed queries) — run"
        " `python scripts/survey_index.py`; "
        f"missing={sorted(set(fresh_rows) - set(committed_rows))[:5]} "
        f"extra={sorted(set(committed_rows) - set(fresh_rows))[:5]}"
    )
    stale = []
    for name, (impl, oracle, green, status) in committed_rows.items():
        f_impl, f_oracle, f_green, f_status = fresh_rows[name]
        if (impl, oracle, status) != (f_impl, f_oracle, f_status):
            stale.append((name, "impl/oracle/status"))
        elif f_green < green:
            # a green stamp may only move FORWARD (driver landed a newer
            # CORRECTNESS file after the index was committed); backward
            # means the committed file was hand-edited or a CORRECTNESS
            # artifact disappeared.
            stale.append((name, f"green r{green:02d} -> r{f_green:02d}"))
    assert not stale, (
        "SURVEY_INDEX.md is stale beyond forward green-stamp drift — run"
        f" `python scripts/survey_index.py`; first offenders: {stale[:5]}"
    )
