"""Capture `.explain("formatted")` output for named suite entries into
plans/<tag>/<name>_<suffix>.txt — the before/after plan artifacts the
optimization rounds commit (the judge reads these instead of running
Spark).

Usage: python tools/capture_plan.py <tag> <suffix> <entry> [entry ...]
e.g.:  python tools/capture_plan.py r18 before doc_nt_roundtrip
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag, suffix, *names = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from matcha_spark.suite import QUERIES

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted) at {SF_DIR}\n")
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
