"""Physical-plan property audits: the scale contract, codified.

Correct results are necessary but not sufficient — these assert the
*plan shapes* that survive a 100× scale-up: predicate/column pushdown to
the parquet scan, partial (map-side) aggregation, per-partition window
top-k pruning, no nested-loop joins in equi-join operators, and no
single-partition exchanges in hot paths.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_and_columns_pushed_to_scan(spark):
    from matcha_spark import relational as R

    plan = _plan(R.q6_forecast_revenue(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # column pruning: the scan reads only the 4 referenced columns
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_q1_has_partial_aggregation(spark):
    from matcha_spark import relational as R

    plan = _plan(R.q1_pricing_summary(spark, SF_DIR))
    # two HashAggregate levels = map-side partial + final (one shuffle)
    assert plan.count("HashAggregate") >= 2
    assert "SortAggregate" not in plan


def test_topk_window_group_limit(spark):
    from matcha_spark import relational as R

    plan = _plan(R.topk_orders_per_customer(spark, SF_DIR))
    # Spark's rank-limit pushdown: each partition keeps only k rows per
    # group before the shuffle instead of sorting everything
    assert "WindowGroupLimit" in plan


def test_asof_join_no_nested_loop(spark):
    from matcha_spark import relational as R

    plan = _plan(R.asof_events_orders(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sessionize_native_no_window_sort(spark):
    from matcha_spark import relational as R

    plan = _plan(R.events_sessionize_native(spark, SF_DIR))
    # built-in session_window sessionizes inside the aggregate (plus the
    # final presentation orderBy) — no Window operator pass
    assert "Window" not in plan.replace("session_window", "").replace(
        "WindowGroupLimit", ""
    )


def test_bgp_join_tree_no_single_partition(spark):
    from matcha_spark.suite import bgp_customers_in_region, bgp_optional_urgent_orders

    for q in (bgp_customers_in_region, bgp_optional_urgent_orders):
        plan = _plan(q(spark, SF_DIR))
        assert "SinglePartition" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__


def test_df_to_triples_one_scan_per_table(spark):
    """The generic frame source scans its input once for ALL predicates
    (explode encoding) — not once per predicate — and column pruning
    still reaches the parquet reader."""
    from pyspark.sql import functions as F

    from matcha_spark.functions.termcols import str_col, uri_col
    from matcha_spark.sources.frame import df_to_triples
    from matcha_spark.terms import from_term

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    t = df_to_triples(
        cust,
        uri_col("customer:", F.col("c_custkey")),
        {
            "name": str_col(F.col("c_name")),
            "mktsegment": str_col(F.col("c_mktsegment")),
        },
    )
    n_cust = cust.count()
    assert t.count() == 2 * n_cust
    plan = _plan(t)
    assert plan.count("Scan parquet") == 1
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "c_address" not in read_schema and "c_comment" not in read_schema
    # spot-check decode round-trip of one generated triple
    from matcha_spark.terms import kw

    row = t.orderBy(F.col("s.lex")).first()
    s, p = from_term(row.s), from_term(row.p)
    assert str(s).startswith("customer:")
    assert p in (kw("name"), kw("mktsegment"))


def test_tpch_graph_scans_each_table_once(spark):
    from matcha_spark.sources.tpch_graph import tpch_graph

    g = tpch_graph(spark, SF_DIR, cache=False)
    plan = _plan(g.df)
    # region, nation, customer, supplier: one scan each
    assert plan.count("Scan parquet") == 4


def test_q4_semi_join_shape(spark):
    """EXISTS compiles to a semi join (one output row per order, no
    multiplied intermediate) with the date filter pushed to the scan."""
    from matcha_spark import relational as R

    plan = _plan(R.q4_order_priority(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q22_anti_join_shape(spark):
    from matcha_spark import relational as R

    plan = _plan(R.q22_idle_customers(spark, SF_DIR))
    assert "LeftAnti" in plan


def test_q7_supplier_join_before_orders(spark):
    """Join-order audit: the nation-pair filter's selectivity (2 of 25
    nations) must prune lineitem via the supplier join BEFORE the
    orders/customer shuffles — at 100× the wrong order is ~12× wasted
    shuffle volume on orders/customer."""
    from matcha_spark import relational as R

    plan = _plan(R.q7_volume_shipping(spark, SF_DIR))
    # walk the operator tree top-down: the orders-side join key
    # (o_orderkey) must appear ABOVE the supplier-side key (s_suppkey) in
    # the executed plan string (executedPlan prints root first, so the
    # earlier-executed join prints later/deeper)
    supp_at = plan.index("s_suppkey")
    orders_at = plan.index("o_orderkey")
    assert orders_at < supp_at, "supplier⋈nation must sit below the orders join"
    assert "CartesianProduct" not in plan


def test_q2_single_fact_scan(spark):
    """The window-min formulation scans lineitem once; the naive
    correlated subquery would scan it twice."""
    from matcha_spark import relational as R

    plan = _plan(R.q2_min_cost_supplier(spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1


def test_sample_hash_no_shuffle(spark):
    """The md5-threshold filter is a pure narrow map: no Exchange in the
    whole plan — a 100 TB sample is one scan, zero shuffle."""
    from matcha_spark.operators.text import sample_hash
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(sample_hash(docs, 0.25))
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_tfidf_window_group_limit_and_partial_agg(spark):
    """Top-k term selection must prune per-partition (WindowGroupLimit)
    and the tf aggregation must have a map-side partial level."""
    from matcha_spark.operators.text import tfidf_top_terms
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(tfidf_top_terms(docs, k=3))
    assert "WindowGroupLimit" in plan
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan  # 1-row stats join is broadcast


def test_bm25_topk_and_vocab_filter_before_agg(spark):
    """BM25 must end in a top-k (TakeOrderedAndProject, never a global
    sort) and filter to the query vocabulary before aggregating."""
    from matcha_spark.operators.text import bm25_search
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(bm25_search(docs, ["spark", "table"], k=10))
    assert "TakeOrderedAndProject" in plan
    # the IN-list filter sits below the first aggregate in the plan tree
    # (string order proxy: the filter appears after the last HashAggregate
    # header in top-down printing)
    assert "spark" in plan and "CartesianProduct" not in plan


def test_ntriples_roundtrip_no_shuffle(spark):
    """Serialize and parse are both narrow maps — the only acceptable
    plan for a 100 TB dump."""
    from matcha_spark.sources.ntriples import ntlines_to_triples, triples_to_ntlines
    from matcha_spark.suite import _graph

    db = _graph(spark, SF_DIR)
    lines = triples_to_ntlines(db.df)
    assert "Exchange" not in _plan(lines)
    assert "Exchange" not in _plan(ntlines_to_triples(lines))


def test_funnel_pushes_event_type_to_scan(spark):
    """Each funnel stage must reach the parquet scan with its
    event_type equality (PushedFilters), not filter post-scan — at
    100 TB the stage input is one event type, not the full log."""
    from matcha_spark import relational as R

    plan = _plan(R.events_funnel(spark, SF_DIR))
    assert plan.count("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,") >= 3
    assert "CartesianProduct" not in plan


def test_stratified_sample_two_phase_no_full_group_sort(spark):
    """The per-group cap must never sort a whole group in one task: phase
    1 windows over (group, key-hash bucket) so a skewed group splits
    across bucket cells, and phase 2's group-only sort sees at most
    buckets x per_group survivors. Assert the bucketed exchange exists,
    sits BELOW the group-only exchange (executes first), and both phases
    get Catalyst's map-side partial WindowGroupLimit."""
    from matcha_spark.operators.text import stratified_sample
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(stratified_sample(docs, 5))
    assert plan.count("Window [row_number()") == 2
    bucketed = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "__bkt" in ln
    ]
    assert bucketed, "phase-1 exchange must partition by (group, __bkt)"
    group_only = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "__bkt" not in ln and "source" in ln
    ]
    assert group_only, "phase-2 exchange partitions by group only"
    assert plan.index(group_only[0]) < plan.index(bucketed[0]), (
        "bucketed exchange must execute before (print below) the group-only one"
    )
    assert plan.count("WindowGroupLimit") >= 4  # partial+final per phase


def test_stratified_sample_matches_single_window(spark):
    """Exactness of the two-phase rewrite: identical result set to the
    naive single global window, for several bucket counts (including
    buckets=1, the degenerate single-cell case)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from matcha_spark.operators.text import _hash_hex, stratified_sample
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    w = F.row_number().over(
        Window.partitionBy("source").orderBy(_hash_hex(F.col("doc_id"), ""), "doc_id")
    )
    naive = (
        docs.withColumn("__rn", w).where(F.col("__rn") <= 7).drop("__rn")
    )
    expected = sorted(tuple(r) for r in naive.collect())
    for buckets in (1, 4, 1024):
        got = sorted(
            tuple(r) for r in stratified_sample(docs, 7, buckets=buckets).collect()
        )
        assert got == expected, f"buckets={buckets} diverged"


def test_q19_disjunction_pushed_to_both_scans(spark):
    """Catalyst splits the 3-arm OR per side: each scan's PushedFilters
    carries the OR of its own columns' ranges, and the join is a single
    broadcast hash join (not a union of three scans)."""
    from matcha_spark import relational as R

    plan = _plan(R.q19_disjunctive_revenue(spark, SF_DIR))
    scans = [s for s in plan.split("FileScan parquet")[1:]]
    li = next(s for s in scans if "lineitem" in s[:400])
    pt = next(s for s in scans if "part.parquet" in s[:400])
    assert "Or(" in li.split("PushedFilters")[1][:300]
    assert "Or(" in pt.split("PushedFilters")[1][:300]
    assert plan.count("BroadcastHashJoin") == 1
    assert "CartesianProduct" not in plan


def test_q18_preaggregates_before_join(spark):
    """The HAVING pre-aggregation of lineitem happens BELOW the join
    (aggregate first, then join the survivors) and the lineitem scan is
    pruned to the 2 referenced columns."""
    from matcha_spark import relational as R

    plan = _plan(R.q18_large_volume_customers(spark, SF_DIR))
    join_at = plan.find("Join")
    agg_at = plan.find("HashAggregate(keys=[l_orderkey")
    assert join_at != -1 and agg_at != -1 and agg_at > join_at  # agg deeper
    li_scan = next(s for s in plan.split("FileScan parquet")[1:] if "lineitem" in s[:400])
    rs = li_scan.split("ReadSchema")[1][:200]
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs


def test_q13_left_outer_with_partial_aggs(spark):
    from matcha_spark import relational as R

    plan = _plan(R.q13_customer_distribution(spark, SF_DIR))
    assert "LeftOuter" in plan
    # both group-bys run partial+final (4 HashAggregate nodes)
    assert plan.count("HashAggregate") >= 4
    # the priority exclusion reaches the orders scan
    ord_scan = next(s for s in plan.split("FileScan parquet")[1:] if "orders" in s[:400])
    assert "o_orderpriority" in ord_scan.split("PushedFilters")[1][:300]


def test_q21_decorrelated_no_cartesian(spark):
    """Q21's EXISTS/NOT-EXISTS pair is one per-order aggregate joined
    back — no cartesian/nested-loop re-probe of lineitem, and the 'R'
    and status filters reach the scans."""
    from matcha_spark import relational as R

    plan = _plan(R.q21_waiting_suppliers(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "EqualTo(o_orderstatus,F)" in plan


def test_q15_q11_q20_single_fact_scan(spark):
    """memo_persist contract: the revenue/per-pair pre-aggregate feeds
    both the scalar total and the filter join off ONE lineitem scan —
    the second consumer reads the InMemoryRelation, not the parquet."""
    from matcha_spark import relational as R

    for q in (
        R.q15_top_supplier,
        R.q11_part_value_concentration,
        R.q20_excess_suppliers,
    ):
        plan = _plan(q(spark, SF_DIR))
        # both consumers (scalar agg + filter join) read the persisted
        # pre-aggregate; a broken memo gives each its own FileScan and
        # zero InMemoryTableScans.  (Counting raw FileScan fragments
        # would overcount: InMemoryRelation prints its cached plan —
        # including the one true fact scan — inline.)
        assert plan.count("InMemoryTableScan") >= 2, q.__name__


def test_select_agg_partial_aggregation(spark):
    """select_agg must compile to a partial+final hash aggregate over
    the solution stream (map-side combine before the group shuffle)."""
    from matcha_spark import kw, select_agg
    from matcha_spark.db import TriplesDB

    db = TriplesDB.from_triples(
        spark, [(kw(f"i{i}"), kw("size"), i) for i in range(20)]
    )
    out = select_agg([], {"n": ("count", None), "total": ("sum", "?v")},
                     [("?s", kw("size"), "?v")], db)
    plan = _plan(out)
    assert plan.count("HashAggregate") >= 2
    db.unpersist()


def test_dup_ngram_stats_shapes(spark):
    """Two hash aggregates (per-doc-gram, per-gram totals) + the rollup
    — no cartesian, no window; the docs scan reads only 2 columns."""
    from matcha_spark.operators.text import dup_ngram_stats
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(dup_ngram_stats(docs, n=5))
    assert "CartesianProduct" not in plan and "Window" not in plan
    assert plan.count("HashAggregate") >= 4  # 2 aggs x partial+final
    scans = [s for s in plan.split("FileScan parquet")[1:] if "documents" in s[:400]]
    assert scans and all(
        "lang" not in s.split("ReadSchema")[1][:200] for s in scans if "ReadSchema" in s
    )


def test_contamination_probe_side_broadcast(spark):
    """The probe-gram set must reach the corpus match as a broadcast
    (benchmarks are small by definition; shuffling corpus grams against
    them would be the 100 TB mistake)."""
    from matcha_spark.operators.text import benchmark_contamination
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    probes = docs.where("doc_id % 50 = 0").select("text")
    plan = _plan(benchmark_contamination(docs, probes, n=8))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


def test_unigram_logloss_no_cartesian_one_token_scan(spark):
    from matcha_spark.operators.text import unigram_logloss
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(unigram_logloss(docs))
    assert "CartesianProduct" not in plan
    # token stream memo-persisted: both consumers read the cache
    assert plan.count("InMemoryTableScan") >= 2


def test_token_windows_is_shuffle_free(spark):
    from matcha_spark.operators.text import token_windows
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(token_windows(docs, size=16, stride=8))
    # pure narrow map: explode over per-doc offsets, no Exchange at all
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode


def test_dedup_paragraphs_shapes(spark):
    from matcha_spark.operators.text import dedup_paragraphs
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(dedup_paragraphs(docs))
    assert "CartesianProduct" not in plan
    # canonical-first selection is ONE ranking window over the
    # paragraph stream, partitioned by the 8-byte hash key
    assert plan.count("Window") >= 1 and "xxhash64" in plan
    # no single-partition exchange anywhere in the pipeline
    assert "SinglePartition" not in plan


def test_dsir_importance_shapes(spark):
    from pyspark.sql import functions as F

    from matcha_spark.operators.text import dsir_importance
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(dsir_importance(docs, target=F.col("doc_id") % 50 == 0))
    assert "CartesianProduct" not in plan
    # the 3-scalar totals row joins in via broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # per-(doc,gram) and per-gram aggregates both run map-side partials
    assert plan.count("HashAggregate") >= 4


def test_cosine_range_search_is_shuffle_free(spark):
    from pyspark.sql import functions as F

    from matcha_spark.operators.similarity import cosine_range_search
    from matcha_spark.sources.tpch_graph import load_tables

    emb = load_tables(spark, SF_DIR, "embeddings")["embeddings"]
    plan = _plan(
        cosine_range_search(emb, emb.where(F.col("vec_id") < 3), threshold=0.3)
    )
    # threshold filtering happens inside the Arrow kernel: the plan is
    # scan -> mapInPandas, no Exchange and no Window
    assert "Exchange" not in plan and "Window" not in plan


def test_select_agg_order_limit_plans_take_ordered(spark):
    """select_agg(order_by=..., limit=k) must plan a TakeOrdered
    (per-partition top-k + merge), never a global sort."""
    from matcha_spark import TriplesDB, kw, select_agg

    db = TriplesDB.from_triples(
        spark, [(kw(f"s{i}"), kw("cat"), f"c{i % 5}") for i in range(50)]
    )
    out = select_agg(
        ["?c"], {"n": ("count", None)}, [("?s", kw("cat"), "?c")], db,
        order_by=["-n"], limit=3,
    )
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan
    db.unpersist()


def test_media_near_dup_no_cartesian(spark):
    """Video and audio near-dup pipelines stay equi-join shaped — no
    CartesianProduct and no nested-loop join anywhere in the plans."""
    from matcha_spark.suite import doc_audio_near_dup, doc_video_near_dup

    for fn in (doc_video_near_dup, doc_audio_near_dup):
        plan = _plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_exists_plans_semi_join(spark):
    """FILTER EXISTS compiles to a semi-join (never an inner join that
    would duplicate solutions, never a nested loop)."""
    from matcha_spark.suite import bgp_exists_repeat_customers

    plan = _plan(bgp_exists_repeat_customers(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan or "LeftSemi" in plan


def test_subquery_agg_is_partial(spark):
    """An aggregate subquery keeps map-side partial aggregation and
    joins the outer BGP with a hash join, not a nested loop."""
    from matcha_spark.suite import bgp_subquery_busy_nations

    plan = _plan(bgp_subquery_busy_nations(spark, SF_DIR))
    assert "partial_count" in plan  # map-side combine inside the subquery
    assert "BroadcastNestedLoopJoin" not in plan


def test_select_modifier_limit_is_take_ordered(spark):
    """ORDER BY + LIMIT on a plain select plans TakeOrdered (top-k per
    partition + merge), not a global Sort."""
    from matcha_spark.suite import bgp_select_top_names

    plan = _plan(bgp_select_top_names(spark, SF_DIR))
    assert "TakeOrdered" in plan


def test_chunk_packing_no_single_partition_window(spark):
    """The packing prefix sum must stay distributed: the window runs
    partition-local (partitioned by __pid), never as an empty-partition
    global window, and no SinglePartition exchange feeds it."""
    from matcha_spark.operators.text import chunk_packing
    from matcha_spark.sources.tpch_graph import load_tables

    docs = load_tables(spark, SF_DIR, "documents")["documents"]
    plan = _plan(chunk_packing(docs, budget=64))
    assert "__pid" in plan.split("Window")[1][:400]  # partition spec present
    assert "SinglePartition" not in plan
