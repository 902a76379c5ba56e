"""Dtype-parity audit: Spark result schema vs DuckDB Arrow schema for
every oracle-backed suite entry.

Why: the correctness driver's value hash is sensitive to *value
representation*.  Integer-width differences (int32 vs int64) hash
equal (both sides surface Python ints), but a DuckDB DECIMAL column
does NOT — un-cast integer ``sum()`` widens to HUGEINT/DECIMAL(38,0)
and hashes as ``Decimal('7')`` against Spark's ``7``.  That exact
artifact cost five hash-green entries in round 7; this audit fails on
any decimal column in an oracle's output (and prints all other
dtype differences informationally) so the class can't recur.

Usage: python tools/dtype_audit.py [entry ...]   (default: all)
Exit 1 iff any oracle output column is decimal-typed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _spark_family(dt) -> str:
    s = dt.simpleString()
    return {
        "bigint": "int64",
        "int": "int32",
        "smallint": "int16",
        "float": "float32",
        "boolean": "bool",
        "timestamp_ntz": "timestamp",
    }.get(s, s)


def _arrow_family(t) -> str:
    s = str(t)
    if s.startswith("decimal"):
        return f"DECIMAL({s})"
    if s.startswith("timestamp"):
        return "timestamp"
    if s in ("large_string", "utf8", "large_utf8"):
        return "string"
    if s == "date32[day]":
        return "date"
    if s == "float":
        return "float32"
    return s


# width-only differences the driver's value hash provably tolerates
# (int32-vs-int64 entries were hash-green in prior driver rounds)
_TOLERATED = {
    ("int16", "int64"), ("int32", "int64"), ("int64", "int32"),
    ("int16", "int32"), ("int64", "int16"), ("int32", "int16"),
}


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dtype-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    names = [n for n in queries if n in oracles and (not only or n in only)]
    decimal_hits, notes, errors = [], [], []
    for name in names:
        try:
            sdf = queries[name](spark, SF_DIR)
            sk = {f.name: _spark_family(f.dataType) for f in sdf.schema.fields}
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            ok = {f.name: _arrow_family(f.type) for f in tbl.schema}
        except Exception as ex:  # pragma: no cover - env-specific
            errors.append((name, str(ex)[:160]))
            continue
        if set(sk) != set(ok):
            decimal_hits.append((name, f"column sets differ: {sorted(sk)} vs {sorted(ok)}"))
            continue
        for c in sk:
            if ok[c].startswith("DECIMAL"):
                decimal_hits.append((name, f"{c}: oracle emits {ok[c]} (cast it!)"))
            elif sk[c] != ok[c] and (sk[c], ok[c]) not in _TOLERATED:
                notes.append((name, f"{c}: spark {sk[c]} vs oracle {ok[c]}"))
    print(f"audited {len(names)} oracle-backed entries at {SF_DIR}")
    for n, m in notes:
        print(f"  note {n}: {m}")
    for n, m in errors:
        print(f"  ERROR {n}: {m}")
    if decimal_hits:
        for n, m in decimal_hits:
            print(f"  FAIL {n}: {m}")
        print(f"{len(decimal_hits)} decimal/schema failures")
        return 1
    print("OK: no decimal oracle outputs, no schema drift")
    return 0


if __name__ == "__main__":
    sys.exit(main())
