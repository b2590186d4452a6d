"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark and its ``oracle_sql()`` through
DuckDB on the same parquet dir, then compares row count, column names and an
order-insensitive value hash (rows sorted, columns sorted by name). Floats are
compared bit-exact first; on mismatch a 1e-9-relative retry distinguishes
"non-deterministic float" from "wrong values".

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
       python scripts/oracle_check.py --changed [base] [sf_dir]
       python scripts/oracle_check.py --rotate-sf01 N

--changed (r14 verdict #6: the full sweep is ~20 min at sf0.01 and
growing) selects only the queries whose plan module — or any package
module that plan module imports, one transitive closure — differs from
git ``base`` (default HEAD, i.e. uncommitted work).  Intra-round
iteration runs the changed subset; the round close still runs the full
sweep.

--rotate-sf01 N (r15 verdict #5: sf0.1 evidence ages — every operator
is gated at sf0.01+sf0.1 on registration day, but the standing sweep
runs at sf0.01 only) re-proves the N oracle-backed queries with the
OLDEST sf0.1 evidence against /root/testdata/sf0.1.  Evidence lives in
the committed SF01_LEDGER.json ({query: ISO date of last sf0.1 EXACT});
never-recorded queries rotate first, and EVERY oracle_check run against
an sf0.1 dir refreshes the ledger for its EXACT queries, so
registration-day gates count automatically.  Cadence: N≈25 per round
(SCALE.md r16).
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(v):
    if isinstance(v, float):
        return ("f", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return ("n",)
    return ("s", str(v))


def sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(normalize(r[i]) for i in idx) for r in rows)


def approx_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            if va[0] == "f" and vb[0] == "f":
                x, y = va[1], vb[1]
                if math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12):
                    continue
            return False
    return True


def _changed_queries(queries: dict, base: str) -> set[str]:
    """Names of registered queries whose defining plan module (or any
    package module in that module's import closure) changed vs ``base``."""
    import ast
    import subprocess

    PKG = "project_obsidian_core_spark"
    out = subprocess.run(
        ["git", "diff", "--name-only", base, "--", f"{PKG}/", "__spark_entry__.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    # brand-new plan files are untracked until their first commit —
    # `git diff` never lists them, and their queries were silently
    # skipped (r15 ADVICE #2)
    out += subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard", "--",
         f"{PKG}/", "__spark_entry__.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    changed_mods = {
        p[:-3].replace("/", ".") for p in out if p.endswith(".py")
    }
    # an edited pkg/__init__.py is imported as plain `pkg` — the
    # import-edge graph below records the bare package name, so the
    # ".__init__" suffix would never intersect it (r15 ADVICE #2)
    changed_mods |= {
        m[: -len(".__init__")]
        for m in changed_mods
        if m.endswith(".__init__")
    }
    if not changed_mods:
        return set()

    # one-hop-per-edge transitive closure over package-internal imports
    import glob as g

    deps: dict[str, set[str]] = {}
    for path in g.glob(os.path.join(REPO, PKG, "**", "*.py"), recursive=True):
        mod = os.path.relpath(path, REPO)[:-3].replace(os.sep, ".")
        deps[mod] = set()
        for node in ast.walk(ast.parse(open(path).read())):
            if isinstance(node, ast.ImportFrom) and (node.module or "").startswith(PKG):
                deps[mod].add(node.module)
                for a in node.names:
                    deps[mod].add(f"{node.module}.{a.name}")
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(PKG):
                        deps[mod].add(a.name)

    dirty = set(changed_mods)
    while True:
        grew = {
            mod
            for mod, imports in deps.items()
            if mod not in dirty and imports & dirty
        }
        if not grew:
            break
        dirty |= grew

    return {
        name for name, fn in queries.items() if fn.__module__ in dirty
    }


LEDGER_PATH = os.path.join(REPO, "SF01_LEDGER.json")


def _ledger_load() -> dict[str, str]:
    import json

    try:
        with open(LEDGER_PATH) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def main() -> int:
    argv = list(sys.argv[1:])
    changed_base = None
    rotate_n = 0
    if "--rotate-sf01" in argv:
        i = argv.index("--rotate-sf01")
        rotate_n = int(argv[i + 1])
        del argv[i : i + 2]
    if argv and argv[0] == "--changed":
        argv.pop(0)
        changed_base = "HEAD"
        if argv and not argv[0].startswith("/") and not argv[0].startswith("sf"):
            changed_base = argv.pop(0)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    if rotate_n:
        sf_dir = "/root/testdata/sf0.1"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from project_obsidian_core_spark.session import build_session

    spark = build_session(app_name="oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if rotate_n:
        ledger = _ledger_load()
        # never-recorded first (empty date sorts before any ISO date),
        # then oldest; dict order (the gate rotation) is the tiebreak
        rotatable = [n for n in queries if n in oracles]
        rotatable.sort(key=lambda n: ledger.get(n, ""))
        sel = set(rotatable[:rotate_n])
        print(
            f"sf0.1 rotation: {len(sel)} oldest-evidence queries "
            f"({sum(1 for n in sel if n not in ledger)} never recorded)"
        )
        only = sel | only
    if changed_base is not None:
        sel = _changed_queries(queries, changed_base)
        if not sel:
            print(f"NO REGISTERED QUERIES CHANGED vs {changed_base}")
            return 0
        print(f"{len(sel)} queries changed vs {changed_base}: {sorted(sel)}")
        only = sel | only
    unknown = only - set(queries)
    if unknown:
        # a typo'd or not-yet-registered name must be an ERROR: silently
        # skipping it makes "ALL QUERIES MATCH" meaningless for the caller
        print(f"UNKNOWN QUERY NAMES (not in registry): {sorted(unknown)}")
        return 2
    failures = []
    exact_names: list[str] = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(s_rows):7d}  (no oracle — rows-only) "
                  f"spark={spark_s:.1f}s")
            if len(s_rows) == 0:
                failures.append((name, "no rows from rows-only query"))
            continue
        t0 = time.time()
        rel = con.sql(oracles[name])
        d_cols = rel.columns
        d_rows = rel.fetchall()
        duck_s = time.time() - t0
        status = []
        # Python fetchall() maps HUGEINT/DECIMAL to plain ints, hiding the
        # type from this replica — but the driver's fetch path encodes them
        # differently from Spark's LongType (r03: five hash mismatches from
        # un-cast window SUMs). Fail loudly on any non-Spark-exact type.
        odd = [
            f"{c}:{t}"
            for c, t in zip(d_cols, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")
        ]
        if odd:
            status.append(f"ORACLE-TYPE {odd} (cast to BIGINT/DOUBLE in the SQL)")
        if len(s_rows) != len(d_rows):
            status.append(f"ROWCOUNT {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            status.append(f"COLUMNS {sorted(s_cols)} vs {sorted(d_cols)}")
        if not status:
            a, b = sorted_rows(s_cols, s_rows), sorted_rows(d_cols, d_rows)
            if a == b:
                status.append("EXACT")
            elif approx_equal(a, b):
                status.append("APPROX(float-jitter!)")
            else:
                status.append("VALUE-MISMATCH")
                for i, (ra, rb) in enumerate(zip(a, b)):
                    if ra != rb:
                        status.append(f"first diff row {i}: spark={ra} duck={rb}")
                        break
        ok = status[0] == "EXACT"
        if ok:
            exact_names.append(name)
        print(f"  {name:28s} rows={len(s_rows):7d} {'OK ' if ok else 'FAIL'} "
              f"{status[0]} spark={spark_s:.1f}s duck={duck_s:.2f}s")
        if not ok:
            failures.append((name, "; ".join(status)))

    # ANY run against the sf0.1 dir refreshes the evidence ledger for its
    # EXACT queries (registration-day gates count toward the rotation)
    if exact_names and os.path.basename(os.path.normpath(sf_dir)) == "sf0.1":
        import datetime
        import json

        ledger = _ledger_load()
        today = datetime.date.today().isoformat()
        for n in exact_names:
            ledger[n] = today
        with open(LEDGER_PATH, "w") as fh:
            json.dump(dict(sorted(ledger.items())), fh, indent=1)
            fh.write("\n")
        print(f"SF01_LEDGER.json: {len(exact_names)} entries stamped {today}")

    if failures:
        print("\nFAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print("\nALL QUERIES MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
