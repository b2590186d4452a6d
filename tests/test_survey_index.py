"""SURVEY_INDEX.md lockstep (r13 verdict Next #8): the committed index
must equal a fresh regeneration from the registry + staged queue."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_survey_index_is_current():
    spec = importlib.util.spec_from_file_location(
        "survey_index_mod", os.path.join(REPO, "scripts", "survey_index.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    committed = open(os.path.join(REPO, "SURVEY_INDEX.md")).read()
    assert committed == mod.generate(), (
        "SURVEY_INDEX.md is stale — run `python scripts/survey_index.py`"
    )
