"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark and its ``oracle_sql()`` through
DuckDB on the same parquet dir, then compares row count, column names and an
order-insensitive value hash (rows sorted, columns sorted by name). Floats are
compared bit-exact first; on mismatch a 1e-9-relative retry distinguishes
"non-deterministic float" from "wrong values".

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from project_obsidian_core_spark.session import build_session

    spark = build_session(app_name="oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd or not-yet-registered name must be an ERROR: silently
        # skipping it makes "ALL QUERIES MATCH" meaningless for the caller
        print(f"UNKNOWN QUERY NAMES (not in registry): {sorted(unknown)}")
        return 2
    failures = []
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
        print(f"  {name:28s} rows={len(s_rows):7d} {'OK ' if ok else 'FAIL'} "
              f"{status[0]} spark={spark_s:.1f}s duck={duck_s:.2f}s")
        if not ok:
            failures.append((name, "; ".join(status)))

    if failures:
        print("\nFAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print("\nALL QUERIES MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
