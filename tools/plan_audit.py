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

The iterative family (coreness / pagerank / connected_components) is
audited separately (r13, verdict ask #8): their scale contract is a
per-round DRIVER-ACTION budget (one barrier per round, zero driver
reads per round) rather than a plan shape — see ``audit_iterative``.

Usage: python tools/plan_audit.py [entry ... | iterative]  (default:
the curated list below plus the iterative audit; exits 1 on any
violated expectation)
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
    # raw ingestion (r13): text-line scan + from_json projection — the
    # parse must inline into codegen, never a per-row python path.
    # (No pruning expectation: the entry EXECUTES its serialize+write
    # upstream eagerly, so the audited plan only scans the written
    # text files back — the documents-parquet scan is not in it, and a
    # pruned:<col> check against it would be vacuously green.)
    "doc_jsonl_ingest": {"codegen"},
    # CSV twin (r14): text-line scan + from_csv + header elimination —
    # same codegen expectation, same vacuous-pruning caveat
    "doc_csv_ingest": {"codegen"},
    # WARC (r14, holdback): the record walk is an Arrow mapInPandas
    # kernel by design (binaryFile, file-granular) — the expectation
    # pins that everything AROUND it (bucket agg, union, sort) still
    # compiles to codegen and nothing goes cartesian
    "doc_warc_ingest": {"codegen"},
    # span dedup (r14, rows-only): chunking is the Arrow CDC kernel;
    # the stats/join/window/summary layers above it must stay codegen
    # and nothing may go cartesian
    "doc_dup_spans": {"codegen"},
    # its oracle twin (r14, holdback): same chunk pipeline via the
    # shared _dup_spans_frames memo, plus the tail-overlap aggregate
    # and the scrub kernel — the boolean layers must stay codegen and
    # nothing may go cartesian
    "doc_dup_spans_planted": {"codegen"},
    # keep-best survivor selection (r14, holdback): shingle pipeline +
    # component groupBy + struct-argmax + join back — all codegen, no
    # window over the full corpus, nothing cartesian
    "dedup_keep_best_docs": {"codegen"},
    # winnowing fingerprints (r14, rows-only): k-gram hash stream +
    # window minima are JVM higher-order functions — the whole entry
    # must stay codegen (no Python kernel anywhere) and the
    # fingerprint self-join must never go cartesian
    "doc_winnow_pairs": {"codegen"},
    # IVF-PQ (r14, rows-only): the probe (query, cell) pairs must ride
    # a broadcast hash join against the coded corpus — a shuffle there
    # would defeat the pruning — and the rank/re-rank layers stay
    # codegen around the two Arrow kernels
    "emb_ivfpq_topk": {"codegen", "broadcast"},
    # winnowing oracle twin (r15): the planted corpus rides the same
    # all-codegen winnow kernel; the anchor fingerprint set and the
    # planted-id frame join back as BROADCASTs (they are bounded by
    # the plant arithmetic), never a shuffle of the fingerprint stream
    "doc_winnow_planted": {"codegen", "broadcast"},
    # composed-index sound twin (r15): same broadcast-probe contract
    # as emb_ivfpq_topk, three times over (approx + exhaustive + exact
    # arms), plus the recall-flag join layers in codegen
    "emb_ivfpq_recall_sound": {"codegen", "broadcast"},
    # temperature mixing (r15): rates inline as a CASE literal over a
    # 3-column projection — one narrow codegen filter, no join, no
    # shuffle, and the text column must be PRUNED from the scan
    "doc_temperature_mixture": {"codegen", "pruned:text"},
    # capped-arm planted entries (r17, verdict ask #5): two operator
    # arms + the under-cap evidence aggregate join back onto the
    # planted pair frame — those bounded flag frames must ride
    # BROADCAST hash joins (emb; the audio flags join 500-row frames
    # too but sit above mapInPandas fingerprint kernels, so only
    # codegen + no_cartesian is pinned there), and nothing in either
    # entry may go cartesian
    "emb_dup_pairs_lsh_planted": {"codegen", "broadcast"},
    "doc_audio_near_dup_planted": {"codegen"},
    # Bloom decontamination (r17, rows-only): the bit table is tiny by
    # construction (~10 bits/gram), so the probe join must ride a
    # BROADCAST hash join — a shuffle there would defeat the entire
    # point of compressing the probe set — and every layer (gramming,
    # bit_or build, mask compare, rollup) is JVM built-ins in codegen
    "doc_contamination_bloom": {"codegen", "broadcast"},
    # NB classifier filtering (r17, rows-only): classes/defaults/
    # priors are class-cardinality frames and must BROADCAST into the
    # token-keyed weight join; scoring layers (explode, rollup,
    # collect_list argmax) stay codegen, nothing cartesian (the two
    # deliberate 1-row broadcast cross-joins are the prior-only
    # fallback scalar — whitelisted)
    "doc_lang_classifier": {"codegen", "broadcast"},
}

# deliberate 1-row broadcast scalars (Observation-style bound columns):
# the winnow twin's min-planted-id anchor frame and the ANN sound
# twins' corpus-mean bound both join a single-row broadcast by design
CARTESIAN_OK: set[str] = {
    "doc_winnow_planted", "emb_ivfpq_recall_sound",
    # classifier fan-out: the class list (cardinality #classes) and
    # the 1-row prior-only fallback both cross-join as broadcasts by
    # design
    "doc_lang_classifier",
    # r18 promotion: the fp_env_ok scalar (one corpus-wide aggregate
    # row) broadcast-cross-joins onto the per-doc frame by design
    "doc_contamination_bloom",
}


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


# --- iterative family: per-round driver-action budget (r13, ask #8) ---
# The scale contract for the iterative operators is "ONE barrier per
# round, ZERO driver reads per round" — a change that sneaks an extra
# count()/collect() into the loop multiplies scheduler round-trips at
# cluster scale long before it shows in a local bench.  Raw Spark job
# counts are AQE-noisy (one query spawns a job per materialized
# exchange), so the tripwire counts EAGER DRIVER ACTIONS
# (localCheckpoint/checkpoint/collect/count/toPandas) during the
# operator call via a class patch, and pins both the absolute budget
# and the per-round increment between two run lengths.

# toArrow counts as a read: the r18 driver tails moved their edge
# collects to the Arrow transfer (graph._collect_rows) — the budget
# pins DRIVER TRANSFERS, whichever API carries them
_ACTIONS = ("localCheckpoint", "checkpoint", "collect", "count", "toPandas", "toArrow")


def _count_actions(fn) -> dict[str, int]:
    try:
        from pyspark.sql.classic.dataframe import DataFrame  # Spark 4.x
    except ImportError:  # pragma: no cover - Spark 3.x class layout
        from pyspark.sql import DataFrame
    counts: dict[str, int] = {m: 0 for m in _ACTIONS}
    orig = {m: getattr(DataFrame, m) for m in _ACTIONS}

    def mk(m, f):
        def wrapped(self, *a, **k):
            counts[m] += 1
            return f(self, *a, **k)

        return wrapped

    for m, f in orig.items():
        setattr(DataFrame, m, mk(m, f))
    try:
        fn()
    finally:
        for m, f in orig.items():
            setattr(DataFrame, m, f)
    counts["barriers"] = counts.pop("localCheckpoint") + counts.pop("checkpoint")
    counts["reads"] = (
        counts.pop("collect") + counts.pop("count") + counts.pop("toPandas")
        + counts.pop("toArrow")
    )
    return counts


def audit_iterative(spark) -> list[str]:
    from matcha_spark.operators.dedup import connected_components
    from matcha_spark.operators.graph import coreness, pagerank

    def path(n):
        return spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )

    problems: list[str] = []

    def check(tag, got, barriers, reads):
        if got["barriers"] != barriers:
            problems.append(
                f"{tag}: {got['barriers']} barriers, expected {barriers}"
            )
        if got["reads"] != reads:
            problems.append(
                f"{tag}: {got['reads']} driver reads, expected {reads}"
            )

    # coreness: h-index fixpoint on a path P_n makes its last change at
    # step ceil((n-2)/2)-ish; P8 detects at batch 3, P16 at batch 5
    # (unroll=2).  Budget: 1 barrier for the degree frame + 1 per
    # batch; the 3 driver reads are the bounded SETUP (r18: eager
    # memo-persist of the canonical + partitioned-symmetric edge sets,
    # plus the |V| broadcast-values decision), constant in rounds —
    # convergence still rides an Observation, zero reads per round.
    # small_cutoff=0 forces the DISTRIBUTED fixpoint (the scale
    # contract this budget pins); the driver-peel tail is budget-checked
    # separately below, like cc-smallpath.
    c8 = _count_actions(lambda: coreness(path(8), small_cutoff=0))
    c16 = _count_actions(lambda: coreness(path(16), small_cutoff=0))
    check("coreness(P8)", c8, barriers=1 + 3, reads=3)
    check("coreness(P16)", c16, barriers=1 + 5, reads=3)
    if c16["barriers"] - c8["barriers"] != 2:
        problems.append(
            "coreness: per-batch barrier increment != 1 "
            f"(P8→P16 delta {c16['barriers'] - c8['barriers']}, want 2)"
        )
    if c16["reads"] != c8["reads"]:
        problems.append(
            "coreness: driver reads grow with round count "
            f"({c8['reads']} @P8 vs {c16['reads']} @P16)"
        )

    # pagerank: fixed-iteration loop — 1 barrier per iteration + 1 for
    # the prepared edge frame; the 4 driver reads are the bounded SETUP
    # (node set + strength scalars), constant in iters: the
    # dangling-mass scalar rides an Observation per round (r12).
    p3 = _count_actions(lambda: pagerank(path(10), iters=3))
    p6 = _count_actions(lambda: pagerank(path(10), iters=6))
    check("pagerank(iters=3)", p3, barriers=1 + 3, reads=4)
    check("pagerank(iters=6)", p6, barriers=1 + 6, reads=4)
    if p6["reads"] != p3["reads"]:
        problems.append(
            "pagerank: driver reads grow with iteration count "
            f"({p3['reads']} @3 vs {p6['reads']} @6)"
        )

    # coreness below small_cutoff (r18): the driver-peel tail —
    # constant 0 barriers + exactly 3 bounded reads (memo-persist
    # count of the canonical edges, the cutoff count, the edge
    # collect) however long the path is
    k8 = _count_actions(lambda: coreness(path(8)))
    k16 = _count_actions(lambda: coreness(path(16)))
    check("coreness-smallpeel(P8)", k8, barriers=0, reads=3)
    check("coreness-smallpeel(P16)", k16, barriers=0, reads=3)

    # connected_components below small_cutoff: the documented driver
    # union-find path — constant 2 barriers + exactly 1 bounded read
    # (the observed-size-gated edge collect, r10) however long the
    # path is
    u5 = _count_actions(
        lambda: connected_components(path(5), src="src", dst="dst")
    )
    u17 = _count_actions(
        lambda: connected_components(path(17), src="src", dst="dst")
    )
    check("cc-smallpath(P5)", u5, barriers=2, reads=1)
    check("cc-smallpath(P17)", u17, barriers=2, reads=1)

    return problems


def main() -> int:
    only = sys.argv[1:]
    run_iter = (not only) or ("iterative" in only)
    names = [n for n in only if n != "iterative"] if only else list(EXPECT)
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
    from matcha_spark import suite
    from matcha_spark.suite import QUERIES

    # entries whose measured pipeline is cut_lineage'd once per call
    # (r18): the entry's own explain collapses to a LogicalRDD scan of
    # the checkpoint, so the pinned plan-class checks run against the
    # factored-out lazy pipeline instead — the plan that actually
    # executes inside the checkpoint
    audit_frame = {
        "doc_contamination_bloom": "_contamination_bloom_j",
    }

    rc = 0
    for name in names:
        # retired registry entries keep their suite functions (the
        # subsumption tests replay them), and their plan classes stay
        # audit-worthy — fall back to the module attribute
        fn = QUERIES.get(name, getattr(suite, name, None))
        if name in audit_frame:
            fn = getattr(suite, audit_frame[name])
        df = fn(spark, SF_DIR)
        problems = audit_entry(name, plan_of(df))
        if problems:
            rc = 1
            for p in problems:
                print(f"PROBLEM {name}: {p}")
        else:
            print(f"OK {name}")
    if run_iter:
        iter_problems = audit_iterative(spark)
        if iter_problems:
            rc = 1
            for p in iter_problems:
                print(f"PROBLEM iterative: {p}")
        else:
            print("OK iterative (coreness/pagerank/connected_components "
                  "per-round driver-action budgets hold)")
    if rc == 0:
        # truthful summary (review): say what actually ran — the
        # blanket line used to print even for an entry-less invocation
        parts = []
        if names:
            parts.append(f"{len(names)} entry plans")
        if run_iter:
            parts.append("the iterative driver-action audit")
        print(f"OK: {' + '.join(parts)} met every declared expectation")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
