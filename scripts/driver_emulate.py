"""Emulate the verification driver as closely as possible: a VANILLA
SparkSession (none of build_session's confs), default shuffle partitions,
machine timezone, then run named queries against the DuckDB oracle with the
driver's compare rule. Usage: python scripts/driver_emulate.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

sys.path.insert(0, REPO)
from scripts.oracle_check import TABLES, sorted_rows  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    names = sys.argv[1:]
    spark = SparkSession.builder.master("local[*]").appName("driver-emu").getOrCreate()
    import __spark_entry__ as em

    qs, os_ = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    rc = 0
    for n in names:
        sdf = qs[n](spark, SF_DIR)
        s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
        rel = con.sql(os_[n])
        d_cols, d_rows = rel.columns, rel.fetchall()
        a, b = sorted_rows(s_cols, s_rows), sorted_rows(d_cols, d_rows)
        ok = a == b
        print(f"{n:30s} rows={len(s_rows)} vs {len(d_rows)} "
              f"{'EXACT' if ok else 'MISMATCH'}")
        if not ok:
            rc = 1
            for i, (ra, rb) in enumerate(zip(a, b)):
                if ra != rb:
                    print(f"  first diff row {i}:\n    spark={ra}\n    duck ={rb}")
                    break
    return rc


if __name__ == "__main__":
    sys.exit(main())
