"""Every unpartitioned window must be bounded (r13 verdict Next #4).

A ``Window.orderBy(...)`` with no ``partitionBy`` funnels its whole input
through ONE task — fine on a reduced relation (an aggregate, a distinct
grid, an ≤n_shards offsets table), fatal on a corpus-sized one at 100 TB.
This test AST-enumerates every global-window construction site in the
package and pins it against a whitelist that records WHY that site's
input is bounded.  A new unpartitioned window that is not consciously
whitelisted (with its boundedness rationale) fails the suite — the
mechanical guard that keeps "every global window is a reduction" true as
operators accumulate.

The warning-spam half of the same verdict item lives in
``session.build_session``: the WindowExec logger is pinned to ERROR
because every registered site is proven bounded HERE, so the per-query
warning carries no information and buries real log lines.
"""

from __future__ import annotations

import ast
import glob
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "project_obsidian_core_spark")

#: (module relpath, enclosing function) -> why the window input is bounded.
#: |digests| ≤ 10^4 is the performance_schema digest-table cap the QAN
#: plans document; "grid" = a distinct-value/aggregate reduction computed
#: immediately upstream of the window.
WHITELIST: dict[tuple[str, str], str] = {
    ("datapipe/pipeline.py", "corpus_shuffle"): (
        "per-shard count offsets: ≤ n_shards rows (broadcast back; the "
        "corpus itself is never globally sorted)"
    ),
    ("datapipe/pipeline.py", "corpus_curriculum"): (
        "stage boundaries over the ≤|distinct difficulty values| grid "
        "(bounded by the milli-length range) and (stage, shard) offsets "
        "over ≤ n_stages·n_shards rows — both broadcast back; the "
        "corpus itself pays one exchange, never a global sort"
    ),
    ("plans/analytics_ext_queries.py", "qan_percent_rank"): (
        "per-digest aggregate: ≤ |digests| ≤ 10^4 rows"
    ),
    ("plans/analytics_ext_queries.py", "customer_rfm_scores"): (
        "per-customer aggregate for exact quintile ranks; the "
        "bucket-refinement scale twin is customer_rfm (A73)"
    ),
    ("plans/analytics_ext_queries.py", "lineitem_abc_class"): (
        "per-part revenue aggregate for the exact Pareto curve; the "
        "bucket-refinement scale twin is customer_abc (A76)"
    ),
    ("plans/analytics_ext_queries.py", "customer_gini"): (
        "per-customer spend aggregate (exact Lorenz prefix sums); "
        "documented reduced relation, A41/A42 bucket twins cover scale"
    ),
    ("plans/behavior_queries.py", "customer_abc"): (
        "value-bucket histogram: ≤ n_buckets rows (the bucket-refinement "
        "pattern itself — the window rides the bucket grid)"
    ),
    ("plans/curation_queries.py", "text_ttr_curve"): (
        "decile boundaries over the ≤|distinct doc lengths| grid "
        "(bounded by the char-length range), broadcast back — the P18 "
        "stage rule; docs themselves never globally sort"
    ),
    ("plans/curation_queries.py", "vocab_growth"): (
        "per-bucket first-occurrence counts: ≤ n_buckets rows"
    ),
    ("plans/curation_queries.py", "text_zipf_octaves"): (
        "per-term counts feed a rank only for the ≤ |vocab| term "
        "dimension (aggregate reduction, not the token stream)"
    ),
    ("plans/curation_queries.py", "vocab_coverage_curve"): (
        "per-term count aggregate: ≤ |vocab| rows (cumulative token "
        "shares over the ranked vocabulary)"
    ),
    ("plans/datapipe_queries.py", "embedding_norm_deciles"): (
        "cumulative counts over the ≤|distinct squared-norm values| grid "
        "(micro²-quantized magnitudes), broadcast decile assignment — "
        "the P18/X30 stage rule; vectors themselves never globally sort"
    ),
    ("plans/datapipe_queries.py", "embedding_pair_auc"): (
        "global rank over the C(80,2)=3160-pair bounded eval sample "
        "(fixed cost at any corpus size — the bounded-eval pattern)"
    ),
    ("plans/datapipe_queries.py", "text_rake_keywords"): (
        "per-keyword phrase scores: ≤ |distinct phrases| rows after the "
        "aggregate, top-k bounded"
    ),
    ("plans/pipeline_queries.py", "corpus_dedup_yield"): (
        "cumulative uniques over the ≤10-row decile relation (scan "
        "positions come from corpus_shuffle's shard-composed "
        "global_pos, never a global sort)"
    ),
    ("plans/pipeline_queries.py", "corpus_mixture_temperature"): (
        "remainder rank over the ≤|sources| weight table (the P15 "
        "Hamilton boundedness argument)"
    ),
    ("plans/pipeline_queries.py", "corpus_mixture_dedup"): (
        "two remainder ranks over the ≤|sources| weight table (the "
        "P15/P19 Hamilton boundedness argument; the corpus-sized work "
        "is the hash→keeper aggregate, which has no window)"
    ),
    ("plans/pipeline_queries.py", "corpus_quota_apportion"): (
        "per-(source,lang) quota table: ≤ |sources|·|langs| rows "
        "(Hamilton largest-remainder ranking)"
    ),
    ("plans/qan_queries.py", "qan_top_digests_other"): (
        "per-digest aggregate: ≤ |digests| ≤ 10^4 rows"
    ),
    ("plans/relational_queries.py", "_repurchase_risk_timeline"): (
        "distinct gap-duration grid: ≤ |distinct durations| rows "
        "(Kaplan-Meier risk table)"
    ),
    ("plans/relational_queries.py", "orders_nelson_aalen"): (
        "distinct event-time grid: ≤ |distinct durations| rows "
        "(cumulative hazard table)"
    ),
    ("plans/relational_queries.py", "orders_logrank"): (
        "distinct event-time grid: ≤ |distinct durations| rows "
        "(two-cohort risk table)"
    ),
    ("plans/relational_queries.py", "customer_decile_lift"): (
        "per-customer aggregate for exact deciles (gains table is 10 "
        "rows); same documented reduction as customer_rfm_scores"
    ),
}


#: every way a GLOBAL window spec can be rooted on the Window class
#: (r14 advice: ``Window.orderBy`` alone missed ``Window.rowsBetween`` /
#: ``Window.rangeBetween`` roots and zero-arg ``Window.partitionBy()``)
_GLOBAL_ROOT_ATTRS = {"orderBy", "rowsBetween", "rangeBetween"}


def _window_aliases(tree: ast.Module) -> set[str]:
    """Names the module binds to pyspark's Window class (incl. aliases)."""
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and (node.module or "").startswith(
            "pyspark.sql"
        ):
            for a in node.names:
                if a.name == "Window":
                    names.add(a.asname or a.name)
    return names or {"Window"}


def _observed_sites() -> dict[tuple[str, str], list[int]]:
    sites: dict[tuple[str, str], list[int]] = {}
    for path in sorted(glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True)):
        rel = os.path.relpath(path, PKG)
        tree = ast.parse(open(path).read())
        aliases = _window_aliases(tree)
        stack: list[str] = []

        def record(node):
            key = (rel, stack[-1] if stack else "<module>")
            sites.setdefault(key, []).append(node.lineno)

        class V(ast.NodeVisitor):
            def visit_FunctionDef(self, node):
                stack.append(node.name)
                self.generic_visit(node)
                stack.pop()

            visit_AsyncFunctionDef = visit_FunctionDef

            def visit_Attribute(self, node):
                if (
                    isinstance(node.value, ast.Name)
                    and node.value.id in aliases
                    and node.attr in _GLOBAL_ROOT_ATTRS
                ):
                    record(node)
                self.generic_visit(node)

            def visit_Call(self, node):
                # Window.partitionBy() with NO args is a global window too
                f = node.func
                if (
                    isinstance(f, ast.Attribute)
                    and f.attr == "partitionBy"
                    and isinstance(f.value, ast.Name)
                    and f.value.id in aliases
                    and not node.args
                    and not node.keywords
                ):
                    record(node)
                self.generic_visit(node)

        V().visit(tree)
    return sites


def test_every_global_window_site_is_whitelisted_as_bounded():
    observed = _observed_sites()
    new = set(observed) - set(WHITELIST)
    assert not new, (
        "NEW unpartitioned Window.orderBy sites — prove each input is a "
        f"bounded reduction and whitelist it with a rationale: "
        f"{sorted((m, f, observed[(m, f)]) for m, f in new)}"
    )
    gone = set(WHITELIST) - set(observed)
    assert not gone, f"whitelisted global-window sites no longer exist: {sorted(gone)}"


def test_windowexec_warning_is_silenced_by_build_session():
    """The rationale lives in the whitelist above; the per-query WARN spam
    (hundreds of lines per bench run) is therefore pure noise — the
    session builder must pin the WindowExec logger to ERROR."""
    src = open(os.path.join(PKG, "session.py")).read()
    assert "WindowExec" in src, "build_session no longer silences WindowExec"
