"""Physical-plan audit (r12): assert the plan properties the scale
story depends on, instead of arguing them per round.

For a representative entry per plan class, capture
``df.explain("formatted")`` at sf0.01 and check:

- ``no_cartesian``: no CartesianProduct / BroadcastNestedLoopJoin node
  (entries that deliberately cross-join a 1-row broadcast scalar —
  the ``_sound`` twins' mean bound — are whitelisted explicitly);
- ``pushed``: at least one parquet scan carries non-empty
  ``PushedFilters`` (predicate reached the reader, not a post-scan
  Filter over a full scan);
- ``codegen``: the plan has WholeStageCodegen spans (expressions run
  JVM-side, not interpreted).  AQE assigns codegen ids only at
  execution, so the audit EXECUTES each entry (collect at sf0.01 —
  these results are all small) and inspects the final adaptive plan,
  i.e. the plan that actually ran;
- ``pruned:<col>``: no scan's ReadSchema contains the named column
  (column pruning dropped it — e.g. ``o_comment`` for orders-touching
  queries that never reference it);
- ``broadcast``: at least one BroadcastHashJoin (the dim side was
  broadcast — at sf0.01 this pins that size stats flow into the join
  strategy; at cluster scale the same stats keep small dims off the
  shuffle path).

Usage: python tools/plan_audit.py [entry ...]  (default: the curated
list below; exits 1 on any violated expectation)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# entry -> expectations.  One representative per plan class; every
# listed entry also gets no_cartesian unless explicitly waived.
EXPECT: dict[str, set[str]] = {
    # TPC-H: selective scan (q6), wide agg (q1), join tree + agg (q5),
    # top-k (q3), pre-agg-join (q18)
    "q6_forecast_revenue": {"pushed", "codegen", "pruned:l_comment"},
    "q1_pricing_summary": {"pushed", "codegen", "pruned:l_comment"},
    "q5_nation_revenue": {"pushed", "codegen", "pruned:o_comment", "broadcast"},
    "q3_top_revenue": {"pushed", "codegen", "pruned:l_comment"},
    "q18_large_volume_customers": {"pushed", "codegen", "broadcast"},
    # window / as-of
    "topk_orders_per_customer": {"codegen", "pruned:o_comment"},
    "asof_events_orders": {"codegen"},
    # BGP: predicate-filtered triple scans over the graph frame
    "bgp_customers_in_region": {"codegen"},
    # events: timestamp agg, range join, salted skew join
    "events_hourly": {"codegen"},
    "range_events_clicks": {"pushed", "codegen", "broadcast"},
    "events_salted_enrich": {"codegen", "broadcast"},
    # contamination: the benchmark set rides a broadcast, never a shuffle
    "doc_contamination": {"codegen", "broadcast"},
    # dedup / text: hash-groupBy over a narrow projection
    "dedup_exact_docs": {"codegen", "pruned:n_chars"},
    "doc_text_quality": {"codegen"},
    # embeddings: Arrow kernel over a 2-column scan
    "emb_cosine_topk": {"pruned:norm", "codegen"},
}

# deliberate 1-row broadcast scalars (Observation-style bound columns)
CARTESIAN_OK: set[str] = set()


def plan_of(df) -> str:
    df.collect()  # finalize the adaptive plan (assigns codegen ids)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_read_schemas(plan: str) -> list[str]:
    return [
        line.split("ReadSchema:", 1)[1]
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]


def audit_entry(name: str, plan: str) -> list[str]:
    problems = []
    want = EXPECT[name]
    if name not in CARTESIAN_OK and (
        "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    ):
        problems.append("cartesian/nested-loop join in plan")
    if "pushed" in want:
        pushes = [
            seg.split("]", 1)[0]
            for seg in plan.split("PushedFilters: [")[1:]
        ]
        if not any(p.strip() for p in pushes):
            problems.append("no non-empty PushedFilters on any scan")
    if "codegen" in want and "codegen id" not in plan:
        problems.append("no WholeStageCodegen spans")
    if "broadcast" in want and "BroadcastHashJoin" not in plan:
        problems.append("no BroadcastHashJoin (dim side hit the shuffle path)")
    for w in want:
        if w.startswith("pruned:"):
            col = w.split(":", 1)[1]
            hit = [s for s in scan_read_schemas(plan) if col in s]
            if hit:
                problems.append(f"column {col!r} not pruned from ReadSchema")
    return problems


def main() -> int:
    only = sys.argv[1:]
    names = only or list(EXPECT)
    unknown = [n for n in names if n not in EXPECT]
    if unknown:
        print(f"PROBLEM: no expectations declared for {unknown}")
        return 1
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from matcha_spark.suite import QUERIES

    rc = 0
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        problems = audit_entry(name, plan_of(df))
        if problems:
            rc = 1
            for p in problems:
                print(f"PROBLEM {name}: {p}")
        else:
            print(f"OK {name}")
    if rc == 0:
        print("OK: every audited plan meets its declared expectations")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
