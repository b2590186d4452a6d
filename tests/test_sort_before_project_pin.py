"""Plan pin for the `_docs_by_id` sort-before-project invariant (r16
optimization; r16 ADVICE asked for this guard).

The r16 win: for the pure per-row text/dedup operators, sorting the RAW
documents relation BEFORE the expensive projection keeps the range
exchange's boundary-sampling job down to a bare scan (a trailing
``.orderBy`` above the projection re-executes the whole child plan for the
sampler — a hidden second full pass, guide §2.4).  The optimization is a
property of the PLAN, not the output: it is only correct while the wrapped
operators stay shuffle-free, row-order-preserving projections.  A future
edit that adds an exchange inside e.g. ``with_lang_id`` would silently
break both the optimization AND the output order, and the driver's
rotating oracle sample might not catch it for rounds.  This pin fails
loudly instead:

* exactly ONE Exchange in the whole plan — the rangepartitioning one;
* NOTHING below that exchange but the parquet scan (no split/regexp/hash
  work may sink under it, or the boundary sampler pays it again).
"""

from __future__ import annotations

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"

SORT_BEFORE_PROJECT_QUERIES = [
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "dedup_simhash",
    "corpus_quality_filter",
]


@pytest.mark.parametrize("name", SORT_BEFORE_PROJECT_QUERIES)
def test_projection_stays_above_the_range_exchange(spark, name):
    from project_obsidian_core_spark.plans.registry import QUERIES

    plan = (
        QUERIES[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange total, and it is the range sort's
    assert plan.count("Exchange") == 1, plan
    pos = plan.find("Exchange rangepartitioning")
    assert pos != -1, plan
    # below the exchange (printed after it): only the scan column chain —
    # none of the per-row feature machinery may have sunk under it
    below = plan[pos:]
    assert "Scan parquet" in below or "FileScan" in below, below
    for heavy in ("split(", "regexp", "xxhash", "transform(", "aggregate("):
        assert heavy not in below, (heavy, below)
    # and the sort really is on the raw relation: its input columns are the
    # scan's, i.e. the projection output names (scores, fingerprints...)
    # never appear between the exchange and the scan
    assert not re.search(r"(quality_score|fingerprint#|lang_pred|simhash)", below), below
