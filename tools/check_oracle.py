"""Local mimic of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    only = set(sys.argv[1:])
    # names only — an unknown arg (e.g. a would-be --sf flag) must fail
    # loudly, not silently filter every entry out; the scale is chosen
    # via SPARK_GRAFT_SF_DIR
    known = set(entrymod.queries())
    unknown = only - known
    if unknown:
        sys.exit(
            f"unknown entries: {sorted(unknown)} — arguments are entry "
            "names only; set the scale with SPARK_GRAFT_SF_DIR=<dir>"
        )
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    # the FULL oracle dict, including window-capacity holdbacks the
    # driver-facing oracle_sql() withholds — local verification must
    # cover everything that has an oracle
    from matcha_spark.suite import ORACLES as oracles

    # SPARK_GRAFT_ITER_ORACLES=1 (the sf1.0 sweep protocol): swap in
    # the Python-driven iterative DuckDB truths for entries whose
    # single-statement recursive SQL is dense-component-quadratic
    # (tools/iter_oracles.py; equivalence vs the driver-facing SQL is
    # pinned at sf0.01 by test_joins.py::test_iterative_oracle_equivalence)
    iterative = {}
    if os.environ.get("SPARK_GRAFT_ITER_ORACLES"):
        from iter_oracles import ITERATIVE as iterative
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            if not srows:
                print(f"WARN {name}: zero rows")
            continue
        try:
            if name in iterative:
                res = iterative[name](con)
            else:
                res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: columns {sc} vs {dc}")
        elif len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
        elif sr != dr:
            failures.append(name)
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {bad}")
        else:
            print(f"PASS {name} ({len(sr)} rows, {dt:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
