"""The declared operator suite: every implemented operator exposed as a
``(spark, sf_dir) → DataFrame`` callable plus (where SQL-expressible)
an equivalent DuckDB oracle query.

This is the correctness surface the driver checks per-round
(``__spark_entry__.queries`` / ``oracle_sql``).  Column names/aliases
match between the Spark plans and the SQL exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import relational as R
from .db import merge_dbs
from .functions.termcols import lex, lex_as
from .operators import dedup as D
from .operators import similarity as S
from .operators import text as T
from .patterns import Optional, Values
from .query import ask, select_agg, select_df
from .sources.tpch_graph import KW, load_tables, tpch_graph

# r16 (verdict ask #5): default-on pair-budget pre-flight for every
# exact-shingle/fingerprint truth side in the suite.  50M pairs is
# ~300x the largest truth-side pair count at any shipped SF yet well
# under the ~1.5e8-pair cliff the r15 sf1.0 sweep measured on the
# 31-word-vocabulary synthetic corpus — a future scale-up or a
# degenerate corpus fails LOUDLY with the estimate (one cheap agg over
# the already-persisted shingle/fingerprint frame) instead of
# launching the exploding join.
_TRUTH_PAIR_BUDGET = 50_000_000

# bounded LRU over cached derived graphs: a long-lived session querying
# many (sf_dir, variant) combinations would otherwise pin every cached
# DataFrame in executor memory forever; evicted entries are unpersisted.
_GRAPH_CACHE: dict = {}
_GRAPH_CACHE_MAX = 8


def clear_graph_cache() -> None:
    """Unpersist and drop every cached derived graph — the suite-level
    analog of :func:`matcha_spark.cache.clear_memo`.  Bench cold mode
    calls both before each timed run so per-query numbers stop
    depending on which earlier entries happened to warm (or evict)
    which cache slots."""
    while _GRAPH_CACHE:
        _GRAPH_CACHE.popitem()[1].unpersist()


def _graph(spark, sf_dir, **kw):
    key = (sf_dir, tuple(sorted(kw.items())))
    if key not in _GRAPH_CACHE:
        if kw.get("include_orders"):
            # extend the cached base graph instead of rescanning the dims
            kw = dict(kw, base=_graph(spark, sf_dir))
        while len(_GRAPH_CACHE) >= _GRAPH_CACHE_MAX:
            _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE))).unpersist()
        _GRAPH_CACHE[key] = tpch_graph(spark, sf_dir, **kw)
    else:
        _GRAPH_CACHE[key] = _GRAPH_CACHE.pop(key)  # move to MRU position
    return _GRAPH_CACHE[key]


# ---------------------------------------------------------------------------
# BGP engine queries over the derived graph
# ---------------------------------------------------------------------------


def bgp_customers_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-pattern BGP (two hops + leaf labels) answered by the
    triples engine; oracle is the equivalent relational join."""
    db = _graph(spark, sf_dir)
    res = select_df(
        ["?cname"],
        [
            ("?c", KW["mktsegment"], "?seg"),
            ("?c", KW["nation"], "?n"),
            ("?n", KW["region"], "?r"),
            ("?r", KW["name"], "EUROPE"),
            ("?c", KW["name"], "?cname"),
        ],
        db,
    )
    return res.select(lex(F.col("`?cname`")).alias("cname"))


def bgp_nations_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    db = _graph(spark, sf_dir)
    res = select_df(
        ["?nname"],
        [
            ("?n", KW["name"], "?nname"),
            ("?n", KW["region"], "?r"),
            ("?r", KW["name"], "?rname"),
            Values("?rname", ["ASIA", "AFRICA"]),
        ],
        db,
    )
    return res.select(lex(F.col("`?nname`")).alias("nname"))


def bgp_optional_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL semantics against genuinely-missing data: BUILDING
    customers and their urgent orders, unbound → NULL."""
    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    res = select_df(
        ["?cname", "?okey"],
        [
            ("?c", KW["mktsegment"], "BUILDING"),
            ("?c", KW["name"], "?cname"),
            Optional([("?o", KW["customer"], "?c"), ("?o", KW["okey"], "?okey")]),
        ],
        db,
    )
    return res.select(
        lex(F.col("`?cname`")).alias("cname"),
        lex_as(F.col("`?okey`"), "bigint").alias("okey"),
    )


def bgp_select_top_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solution modifiers on a PLAIN select (r09): EUROPE customers by
    name descending, rows 4-15 — ORDER BY + OFFSET + LIMIT at the
    select-verb level (mirrors select_agg's modifiers; Catalyst plans a
    TakeOrdered, not a global sort)."""
    db = _graph(spark, sf_dir)
    res = select_df(
        ["?cname"],
        [
            ("?c", KW["mktsegment"], "?seg"),
            ("?c", KW["nation"], "?n"),
            ("?n", KW["region"], "?r"),
            ("?r", KW["name"], "EUROPE"),
            ("?c", KW["name"], "?cname"),
        ],
        db,
        order_by=["-?cname"],
        offset=3,
        limit=12,
    )
    return res.select(lex(F.col("`?cname`")).alias("cname"))


def bgp_subquery_busy_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 §12 subquery (r09): per-nation urgent-order counts
    computed in a nested aggregate SELECT (projection scoping hides
    ?o/?c), joined out to the nation name and FILTERed on the typed
    aggregate var in the outer query; oracle is the nested-SELECT
    relational twin."""
    from .patterns import Filter, SubSelect

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    res = select_df(
        ["?nname", "?cnt"],
        [
            SubSelect(
                ["?n"],
                [("?o", KW["customer"], "?c"), ("?c", KW["nation"], "?n")],
                aggs={"?cnt": ("count", "?o")},
            ),
            ("?n", KW["name"], "?nname"),
            Filter(lambda v: v["?cnt"]["num"] >= 50),
        ],
        db,
    )
    return res.select(
        lex(F.col("`?nname`")).alias("nname"),
        F.col("`?cnt`")["num"].cast("long").alias("cnt"),
    )


def bgp_exists_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER EXISTS (r09): AUTOMOBILE customers that have at least one
    1-URGENT order — the positive semi-join twin of
    bgp_not_exists_unurgent; oracle is the relational EXISTS."""
    from .patterns import Exists

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    res = select_df(
        ["?cname"],
        [
            ("?c", KW["mktsegment"], "AUTOMOBILE"),
            ("?c", KW["name"], "?cname"),
            Exists([("?o", KW["customer"], "?c")]),
        ],
        db,
    )
    return res.select(lex(F.col("`?cname`")).alias("cname"))


def bgp_values_rows_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-var inline data (r09, SPARQL VALUES (?a ?b) { ... }):
    customers matching the (region, segment) tuples jointly, with an
    UNDEF row admitting every AFRICA segment; oracle is the OR-of-
    conjunctions the mask-grouped joins implement."""
    from .patterns import ValuesRows

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?cname"],
        [
            ("?c", KW["mktsegment"], "?seg"),
            ("?c", KW["nation"], "?n"),
            ("?n", KW["region"], "?r"),
            ("?r", KW["name"], "?rname"),
            ("?c", KW["name"], "?cname"),
            ValuesRows(
                ("?rname", "?seg"),
                [("EUROPE", "BUILDING"), ("ASIA", "MACHINERY"), ("AFRICA", None)],
            ),
        ],
        db,
    )
    return res.select(lex(F.col("`?cname`")).alias("cname"))


def graph_components_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components oracle entry (r09): undirected min-label
    propagation over per-region nation chains (lead() successor edges
    within each region) — every region collapses to one component
    labeled by its smallest nation key.  Oracle replays the undirected
    reachability closure with a recursive CTE and takes the min
    reachable id per node."""
    from pyspark.sql import Window

    from .operators.dedup import connected_components

    n = load_tables(spark, sf_dir, "nation")["nation"]
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    edges = (
        n.select(
            F.col("n_nationkey").alias("src"),
            F.lead("n_nationkey").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    comp = connected_components(edges, src="src", dst="dst")
    return comp.select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
    )


def bgp_describe_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE-lite (r09): the symmetric one-hop sub-graph about
    nation:3 — its name/region triples plus every customer/supplier
    edge pointing at it — rendered as lexical rows; oracle unions the
    relational projections for the same node."""
    from .query import describe
    from .terms import URI

    db = _graph(spark, sf_dir)
    g = describe(URI("nation:3"), db)
    return g.select(
        lex(F.col("s")).alias("s"),
        lex(F.col("p")).alias("p"),
        lex(F.col("o")).alias("o"),
    )


def bgp_filter_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER over bound vars (extension absent from the reference):
    EUROPE customers whose name sorts above a cutoff."""
    from .patterns import Filter

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?cname"],
        [
            ("?c", KW["mktsegment"], "?seg"),  # restricts ?c to customers
            ("?c", KW["nation"], "?n"),
            ("?n", KW["region"], "?r"),
            ("?r", KW["name"], "EUROPE"),
            ("?c", KW["name"], "?cname"),
            Filter(lambda v: lex(v["?cname"]) > "Customer#000001000"),
        ],
        db,
    )
    return res.select(lex(F.col("`?cname`")).alias("cname"))


def bgp_not_exists_unurgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS negation (extension): BUILDING customers with no
    1-URGENT order in the graph."""
    from .patterns import NotExists

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    res = select_df(
        ["?cname"],
        [
            ("?c", KW["mktsegment"], "BUILDING"),
            ("?c", KW["name"], "?cname"),
            NotExists([("?o", KW["customer"], "?c")]),
        ],
        db,
    )
    return res.select(lex(F.col("`?cname`")).alias("cname"))


def bgp_minus_machinery_asia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL MINUS (r08): MACHINERY customers minus those whose nation
    lies in ASIA — the anti-join negation keyed on the shared ?c var.
    (With no shared vars MINUS removes nothing, SPARQL's dom-disjoint
    rule — pinned by pytest; this entry exercises the shared-var
    path against an EXCEPT-style oracle.)"""
    from .patterns import Minus

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?cname"],
        [
            ("?c", KW["mktsegment"], "MACHINERY"),
            ("?c", KW["name"], "?cname"),
            Minus(
                [
                    ("?c", KW["nation"], "?n"),
                    ("?n", KW["region"], "?r"),
                    ("?r", KW["name"], "ASIA"),
                ]
            ),
        ],
        db,
    )
    return res.select(lex(F.col("`?cname`")).alias("cname"))


def graph_closure_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure (property-path analog, absent from the
    reference): reachability over the nation-key successor chain."""
    from .operators.graph import transitive_closure

    n = load_tables(spark, sf_dir, "nation")["nation"]
    a, b = n.alias("a"), n.alias("b")
    edges = a.join(b, F.col("b.n_nationkey") == F.col("a.n_nationkey") + 1).select(
        F.col("a.n_nationkey").alias("src"), F.col("b.n_nationkey").alias("dst")
    )
    return transitive_closure(edges).orderBy("src", "dst")


def bgp_path_region_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED from the oracle registry in r12 (same answer set as the
    still-oracle-backed bgp_path_inv_region_members by construction;
    pinned by test_retired_entry_equivalences_r12).  Property-path Seq (SPARQL ``:nation/:region`` — extension absent
    from the reference): every entity (customer or supplier) whose
    nation lies in ASIA, by name.  The path compiles to an equi-join
    chain on the midpoint; oracle is the two relational join paths
    unioned."""
    from .patterns import Seq

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?ename"],
        [
            ("?e", Seq(KW["nation"], KW["region"]), "?r"),
            ("?r", KW["name"], "ASIA"),
            ("?e", KW["name"], "?ename"),
        ],
        db,
    )
    return res.select(lex(F.col("`?ename`")).alias("ename"))


def bgp_path_reach_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property-path closure over an alternative (SPARQL
    ``(:customer|:nation|:region)+``): all reachability pairs in the
    urgent-order entity hierarchy (order → customer → nation → region).
    Compiles to path-doubling closure over the unioned edge scans;
    oracle is a recursive CTE over the same union."""
    from .patterns import Alt, OneOrMore

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    res = select_df(
        ["?x", "?y"],
        [("?x", OneOrMore(Alt(KW["customer"], KW["nation"], KW["region"])), "?y")],
        db,
    )
    return res.select(
        lex(F.col("`?x`")).alias("src"), lex(F.col("`?y`")).alias("dst")
    )


def bgp_path_from_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-endpoint closure (r09): every entity that REACHES
    ``region:1`` through the urgent-order hierarchy — same edge union
    as ``bgp_path_reach_urgent``, but with the object GROUND the
    compiler takes the seeded-frontier evaluation
    (``operators.graph.seeded_reachability``, O(reachable) work)
    instead of materializing the all-pairs closure and filtering
    (O(V²) pairs).  Oracle is the recursive CTE seeded at the same
    node, walking edges backwards."""
    from .patterns import Alt, OneOrMore
    from .terms import URI

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    res = select_df(
        ["?x"],
        [
            (
                "?x",
                OneOrMore(Alt(KW["customer"], KW["nation"], KW["region"])),
                URI("region:1"),
            )
        ],
        db,
    )
    return res.select(lex(F.col("`?x`")).alias("src"))


def bgp_path_from_selective_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded closure from a selective VAR anchor (r10): the closure's
    object endpoint is a variable — but it is bound by a selective
    name pattern, so the compiler defers the closure to the end of the
    join tree and evaluates it as frontier reachability seeded from
    the computed anchor set (``explain_query`` shows a
    ``seeded_reach_*`` scan) instead of materializing the all-pairs
    closure and filtering (``plans/compiler._join_deferred_closure``).
    Semantically identical to ``bgp_path_from_seed`` with the seed
    delivered by a pattern instead of a literal."""
    from .patterns import Alt, OneOrMore

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    res = select_df(
        ["?x"],
        [
            ("?r", KW["name"], "AMERICA"),
            (
                "?x",
                OneOrMore(Alt(KW["customer"], KW["nation"], KW["region"])),
                "?r",
            ),
        ],
        db,
    )
    return res.select(lex(F.col("`?x`")).alias("src"))


def graph_distances_from_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded single-source shortest distances (r09): hop counts TO
    ``region:1`` over the urgent-order hierarchy — the reversed-edge
    seeded BFS (``operators.graph.seeded_shortest_paths``), O(reachable)
    work where the all-pairs min-plus closure computes O(V²) pairs to
    keep one source row.  Oracle: bounded recursive-CTE walk from the
    same node with a min rollup (the reversed graph is a tree — each
    entity has one parent — so the walk visits each node once)."""
    from .operators.graph import path_edges, seeded_shortest_paths
    from .patterns import Alt
    from .terms import URI, term_lit as _tl

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    edges = path_edges(db, Alt(KW["customer"], KW["nation"], KW["region"]))
    rev = edges.select(F.col("o").alias("s"), F.col("s").alias("o"))
    seeds = spark.range(1).select(_tl(URI("region:1")).alias("n"))
    # Alt-of-predicates edge relation: the filtered slice is memoized
    # in executor storage (r18) instead of a full-corpus parquet
    # materialization or per-round re-scans of the cached store
    out = seeded_shortest_paths(rev, seeds, src="s", dst="o", materialize_edges=False)
    return out.select(lex(F.col("n")).alias("src"), "dist")


def bgp_path_inv_region_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse property path (SPARQL ``^(:nation/:region)``): entities
    of ASIA reached *from* the region via the inverted two-step path —
    same answer set as ``bgp_path_region_members``, derived through
    ``Inv`` (a free column swap in the compiled edge set, no extra
    shuffle)."""
    from .patterns import Inv, Seq

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?ename"],
        [
            ("?r", KW["name"], "ASIA"),
            ("?r", Inv(Seq(KW["nation"], KW["region"])), "?e"),
            ("?e", KW["name"], "?ename"),
        ],
        db,
    )
    return res.select(lex(F.col("`?ename`")).alias("ename"))


def bgp_path_zom_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ZeroOrMore`` path (SPARQL ``:region*``): the region-edge
    closure UNION the zero-length path, which per SPARQL matches every
    *mentioned node* of the graph with itself.  Oracle replays the
    reflexive node domain (URIs + name/segment literals) plus the
    single-hop nation→region edges."""
    from .patterns import ZeroOrMore

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?x", "?y"],
        [("?x", ZeroOrMore(KW["region"]), "?y")],
        db,
    )
    return res.select(
        lex(F.col("`?x`")).alias("src"), lex(F.col("`?y`")).alias("dst")
    )


def bgp_path_zoo_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ZeroOrOne`` path (SPARQL ``:nation?``) with a bound subject:
    each BUILDING customer paired with itself (zero-length) and its
    nation (one hop).  The identity half of the edge set is pruned by
    the equi-join with the selective ``mktsegment`` scan."""
    from .patterns import ZeroOrOne

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?c", "?y"],
        [
            ("?c", KW["mktsegment"], "BUILDING"),
            ("?c", ZeroOrOne(KW["nation"]), "?y"),
        ],
        db,
    )
    return res.select(
        lex(F.col("`?c`")).alias("src"), lex(F.col("`?y`")).alias("dst")
    )


def bgp_path_negset_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated property set (SPARQL ``!(:name|:mktsegment)``): every
    edge whose predicate is neither label — i.e. the structural
    customer→nation, supplier→nation, nation→region links.  One scan
    with predicate *inequality* filters, no join."""
    from .patterns import NegSet

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?s", "?o"],
        [("?s", NegSet(KW["name"], KW["mktsegment"]), "?o")],
        db,
    )
    return res.select(
        lex(F.col("`?s`")).alias("src"), lex(F.col("`?o`")).alias("dst")
    )


def bgp_bind_segment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL BIND: extend solutions with a computed var (segment
    prefix) — stays a plain codegen projection in the Spark plan."""
    from .patterns import Bind
    from .functions.termcols import str_col

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?cname", "?prefix"],
        [
            ("?c", KW["mktsegment"], "?seg"),
            ("?c", KW["name"], "?cname"),
            Bind("?prefix", lambda v: str_col(F.substring(lex(v["?seg"]), 1, 3))),
        ],
        db,
    )
    return res.select(
        lex(F.col("`?cname`")).alias("cname"),
        lex(F.col("`?prefix`")).alias("seg_prefix"),
    )


def graph_shortest_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs shortest hop counts over the urgent-order entity
    hierarchy (same edge union as ``bgp_path_reach_urgent``); min-plus
    path doubling vs a bounded recursive-CTE min oracle."""
    from .operators.graph import path_edges, shortest_path_lengths
    from .patterns import Alt

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    edges = path_edges(db, Alt(KW["customer"], KW["nation"], KW["region"]))
    out = shortest_path_lengths(edges, src="s", dst="o")
    res = out.select(
        lex(F.col("s")).alias("src"), lex(F.col("o")).alias("dst"), "dist"
    )
    # the driver collects before this session ends; defer cleanup to the
    # session-exit temp sweep (local master) — the result is lazy over
    # the round parquet, so an eager cleanup here would break it
    return res


def graph_shortest_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted all-pairs shortest paths (r08): the urgent-order
    hierarchy with dyadic per-edge costs (exact in binary floating
    point, so the min-plus sums replay bit-identically in the oracle),
    plus a customer→region shortcut edge for BUILDING customers that
    UNDERCUTS the two-hop route (5.0 < 2.25 + 4.5) — the min-plus
    relaxation must genuinely choose between path costs, and the
    structural convergence probe (merged.dist < acc.dist) must fire."""
    from .operators.graph import shortest_path_lengths

    t = load_tables(spark, sf_dir, "orders", "customer", "supplier", "nation")
    mk = lambda pre, c: F.concat(F.lit(pre), F.col(c).cast("string"))  # noqa: E731
    edges = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            mk("order:", "o_orderkey").alias("src"),
            mk("customer:", "o_custkey").alias("dst"),
            F.lit(1.5).alias("w"),
        )
        .unionByName(
            t["customer"].select(
                mk("customer:", "c_custkey").alias("src"),
                mk("nation:", "c_nationkey").alias("dst"),
                F.lit(2.25).alias("w"),
            )
        )
        .unionByName(
            t["supplier"].select(
                mk("supplier:", "s_suppkey").alias("src"),
                mk("nation:", "s_nationkey").alias("dst"),
                F.lit(2.25).alias("w"),
            )
        )
        .unionByName(
            t["nation"].select(
                mk("nation:", "n_nationkey").alias("src"),
                mk("region:", "n_regionkey").alias("dst"),
                F.lit(4.5).alias("w"),
            )
        )
        .unionByName(
            t["customer"]
            .where(F.col("c_mktsegment") == "BUILDING")
            .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                mk("customer:", "c_custkey").alias("src"),
                mk("region:", "n_regionkey").alias("dst"),
                F.lit(5.0).alias("w"),
            )
        )
    )
    return shortest_path_lengths(edges, src="src", dst="dst", weight="w")


def graph_pagerank_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PageRank over the urgent-order hierarchy: rows-only (iterative
    # float ranks); pinned by a numpy power-iteration differential pytest
    from .operators.graph import pagerank, path_edges
    from .patterns import Alt

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    edges = path_edges(db, Alt(KW["customer"], KW["nation"], KW["region"]))
    out = pagerank(edges, src="s", dst="o", iters=6)
    return out.select(lex(F.col("node")).alias("node"), F.round("rank", 8).alias("rank"))


def bgp_construct_region_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed CONSTRUCT: materialize a derived graph (customer →
    region-name edges) without collecting; decoded to lex columns for
    the oracle."""
    from .query import construct_db
    from .terms import kw as _kw

    db = _graph(spark, sf_dir)
    g2 = construct_db(
        [("?c", _kw("region_name"), "?rname")],
        [
            ("?c", KW["mktsegment"], "?seg"),
            ("?c", KW["nation"], "?n"),
            ("?n", KW["region"], "?r"),
            ("?r", KW["name"], "?rname"),
        ],
        db,
    )
    return g2.df.select(
        lex(F.col("s")).alias("subj"), lex(F.col("o")).alias("region_name")
    )


def bgp_ask_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    db = _graph(spark, sf_dir)
    exists = ask([("?c", KW["mktsegment"], "BUILDING")], db)
    missing = ask([("?c", KW["mktsegment"], "NO-SUCH-SEGMENT")], db)
    return spark.createDataFrame([(exists, missing)], "found boolean, not_found boolean")


def bgp_agg_customers_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL-style GROUP BY over BGP solutions (``select_agg``):
    customers counted per region with distinct segments and a
    deterministic GROUP_CONCAT of the region's nations; oracle is the
    equivalent relational aggregate."""
    db = _graph(spark, sf_dir)
    out = select_agg(
        ["?rname"],
        {
            "n_customers": ("count", "?c"),
            "n_segments": ("count_distinct", "?seg"),
            "nations": ("group_concat_distinct", "?nname"),
        },
        [
            ("?c", KW["nation"], "?n"),
            ("?c", KW["mktsegment"], "?seg"),
            ("?n", KW["region"], "?r"),
            ("?n", KW["name"], "?nname"),
            ("?r", KW["name"], "?rname"),
        ],
        db,
        concat_sep=",",
    )
    return out.select(
        lex(F.col("`?rname`")).alias("rname"), "n_customers", "n_segments", "nations"
    )


def bgp_agg_urgent_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric aggregates (sum/avg/max over the int okey terms) grouped
    by the customer's nation, over the urgent-orders graph variant."""
    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    out = select_agg(
        ["?nname"],
        {
            "n_orders": ("count", "?o"),
            "sum_keys": ("sum", "?k"),
            "avg_key": ("avg", "?k"),
            "max_key": ("max", "?k"),
        },
        [
            ("?o", KW["customer"], "?c"),
            ("?o", KW["okey"], "?k"),
            ("?c", KW["nation"], "?n"),
            ("?n", KW["name"], "?nname"),
        ],
        db,
    )
    return out.select(
        lex(F.col("`?nname`")).alias("nname"),
        "n_orders",
        "sum_keys",
        F.round("avg_key", 4).alias("avg_key"),
        "max_key",
    )


def bgp_bind_term_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 scalar function library (r08, ``functions.termfns``):
    STRLEN / UCASE∘SUBSTR in BIND plus a STRENDS filter, all codegen
    over TERM structs — replayed by plain SQL string functions."""
    from .functions.termfns import t_strends, t_strlen, t_substr, t_ucase
    from .patterns import Bind, Filter

    db = _graph(spark, sf_dir)
    res = select_df(
        ["?cname", "?len", "?up3"],
        [
            ("?c", KW["mktsegment"], "AUTOMOBILE"),
            ("?c", KW["name"], "?cname"),
            Bind("?len", lambda v: t_strlen(v["?cname"])),
            Bind("?up3", lambda v: t_ucase(t_substr(v["?cname"], 1, 3))),
            Filter(lambda v: t_strends(v["?cname"], "1")),
        ],
        db,
    )
    from .functions.termcols import lex_as

    return res.select(
        lex(F.col("`?cname`")).alias("cname"),
        lex_as(F.col("`?len`"), "bigint").alias("name_len"),
        lex(F.col("`?up3`")).alias("prefix3"),
    )


def bgp_agg_top_urgent_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 solution modifiers over aggregated solutions
    (ORDER BY ... LIMIT at the verb level, r08): the five nations with
    the most urgent orders — descending count with the nation name as
    a deterministic tiebreaker.  The limit plans as a TakeOrdered, not
    a global sort."""
    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    out = select_agg(
        ["?nname"],
        {"n_orders": ("count", "?o")},
        [
            ("?o", KW["customer"], "?c"),
            ("?c", KW["nation"], "?n"),
            ("?n", KW["name"], "?nname"),
        ],
        db,
        order_by=["-n_orders", "?nname"],
        limit=5,
    )
    return out.select(lex(F.col("`?nname`")).alias("nname"), "n_orders")


def bgp_merge_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge-dbs set-union semantics: overlapping graphs dedupe."""
    t = load_tables(spark, sf_dir, "region", "nation")
    from .functions.termcols import str_col, uri_col

    def tri(df, s, pname, o):
        from .sources.tpch_graph import _kw_lit

        return df.select(s.alias("s"), _kw_lit(pname).alias("p"), o.alias("o"))

    g1 = tri(t["nation"], uri_col("nation:", F.col("n_nationkey")), "name", str_col(F.col("n_name"))).unionByName(
        tri(t["region"], uri_col("region:", F.col("r_regionkey")), "name", str_col(F.col("r_name")))
    )
    g2 = tri(t["region"], uri_col("region:", F.col("r_regionkey")), "name", str_col(F.col("r_name"))).unionByName(
        tri(t["nation"], uri_col("nation:", F.col("n_nationkey")), "region", uri_col("region:", F.col("n_regionkey")))
    )
    merged = merge_dbs(g1, g2)
    n = merged.df.count()
    merged.unpersist()
    return spark.createDataFrame([(n,)], "n_triples bigint")


# ---------------------------------------------------------------------------
# pipeline operators over documents / embeddings / events
# ---------------------------------------------------------------------------


def dedup_exact_docs(spark, sf_dir):
    return T.dedup_exact(load_tables(spark, sf_dir, "documents")["documents"])


def doc_fingerprint(spark, sf_dir):
    """RETIRED from the oracle registry in r15 (funding
    doc_winnow_planted; see the registry comment).  Its oracle was the
    per-doc ``md5(normalized text)`` value — strictly implied by the
    still-backed dedup_exact_docs, whose output EXPOSES the same fp
    values (same normalization chain, same md5) plus the group
    structure over them: dedup_exact(docs) is byte-identical to
    fingerprint(docs).groupBy(fp).agg(min, count) — the identity is
    computed in test_joins.py::test_retired_entry_equivalences_r15."""
    return T.fingerprint(load_tables(spark, sf_dir, "documents")["documents"])


def doc_token_count(spark, sf_dir):
    return T.token_count(load_tables(spark, sf_dir, "documents")["documents"])


def doc_text_quality(spark, sf_dir):
    return T.text_quality(load_tables(spark, sf_dir, "documents")["documents"])


def doc_lang_id(spark, sf_dir):
    return T.lang_id(load_tables(spark, sf_dir, "documents")["documents"])


# accuracy floor for doc_lang_classifier's ``acc_ok`` boolean (r18,
# verdict ask #3).  Calibration on the shipped fixtures with the
# planted per-label vocabulary cores (test_fixture_protocol.py::
# test_lang_classifier_floor_calibration): measured accuracy is 1.0
# at every shipped SF (the 18 planted core tokens dominate the zipf
# salad's weak lang correlation), vs a ~0.2 uniform-prior baseline —
# the floor sits 0.05 under the measurement and far above the
# baseline, so a weight-table sign bug or join drift fails the hash
# while fixture noise cannot.  Negative control: shuffled labels
# drop measured accuracy to the prior band, violating the floor.
_LANG_ACC_FLOOR = 0.95


def _lang_planted(docs):
    """The planted separable corpus doc_lang_classifier trains on
    (r18): each document carries its fixture ``lang`` label plus 3
    repeats of 6 label-specific core tokens (``qq<lang>0..5`` —
    disjoint vocabulary across labels, derived from the label value
    so no language list is hardcoded) appended to the organic text.
    The cores make the labels genuinely learnable — the r17 fixture's
    zipf salad correlated only weakly with ``lang`` (~0.43 self-train
    accuracy), so a scoring-sign bug could survive a rows-only gate;
    on the planted corpus accuracy is 1.0 and the oracle replays the
    full NB in SQL."""
    core = F.concat_ws(
        " ",
        *(
            [
                F.concat(F.lit("qq"), F.col("lang"), F.lit(str(k)))
                for k in range(6)
            ]
            * 3
        ),
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("label"),
        F.concat_ws(" ", F.col("text"), core).alias("text"),
    )


def doc_lang_classifier(spark, sf_dir):
    """Distributed Naive-Bayes classifier filtering (r17; PROMOTED
    rows-only -> hash-backed AND made discriminative in r18, verdict
    ask #3): train the token classifier on every 3rd document of the
    planted separable corpus (:func:`_lang_planted` — the fixture's
    ``lang`` labels plus disjoint per-label vocabulary cores, the
    classifier-gating shape where a small labeled seed set scores the
    whole corpus) and classify every document.

    Output: ``(doc_id, pred, margin, correct, acc_ok)`` — the argmax
    class and 4dp log-odds margin (the doc_bigram_logloss rounding
    pattern), per-doc correctness against the planted label, and a
    corpus-wide ``accuracy >= _LANG_ACC_FLOOR`` boolean.  The DuckDB
    oracle replays the ENTIRE pipeline — planted cores, tokenization,
    Laplace counts, log-sum scores, argmax with the same tie order,
    margin rounding, accuracy floor — so a smoothing drift, a sign
    bug, or a prior mix-up flips preds/margins and the hash; the
    floor asserts the classifier actually discriminates (calibrated
    per shipped SF with a shuffled-label negative control).  Numpy
    parity and fallback semantics stay pinned by
    ``test_operators.py::test_token_classifier_nb``."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    planted = _lang_planted(docs)
    seed = planted.where(F.col("doc_id") % 3 == 0)
    model = T.train_token_classifier(seed)
    preds = T.classify_tokens(planted, model)
    j = preds.join(planted.select("doc_id", "label"), "doc_id")
    acc = j.agg(
        (
            F.avg((F.col("pred") == F.col("label")).cast("double"))
            >= F.lit(_LANG_ACC_FLOOR)
        ).alias("__ok")
    )
    return j.crossJoin(F.broadcast(acc)).select(
        "doc_id",
        "pred",
        "margin",
        (F.col("pred") == F.col("label")).alias("correct"),
        F.col("__ok").alias("acc_ok"),
    )


def doc_quality_filter(spark, sf_dir):
    """RETIRED from the registry in r18 (funding the promoted
    doc_contamination_bloom oracle): quality_filter with no
    compression band is EXACTLY text_quality filtered by four
    threshold predicates, so the signal values stay hash-backed
    through the still-backed doc_text_quality and the gate semantics
    stay under a driver oracle inside doc_pipeline_curate's cascade
    (stage 3).  The filter identity is computed in
    test_joins.py::test_retired_entry_equivalences_r18."""
    return T.quality_filter(
        load_tables(spark, sf_dir, "documents")["documents"],
        min_tokens=40,
        max_punct_ratio=0.1,
        min_stopword_ratio=0.01,
    )


def doc_scrub_pii(spark, sf_dir):
    return T.scrub_pii(load_tables(spark, sf_dir, "documents")["documents"])


def doc_strip_boilerplate(spark, sf_dir):
    return T.strip_boilerplate(
        load_tables(spark, sf_dir, "documents")["documents"], min_doc_freq=3
    )


def doc_corpus_stats(spark, sf_dir):
    return T.corpus_stats(load_tables(spark, sf_dir, "documents")["documents"])


def doc_sample_hash(spark, sf_dir):
    """RETIRED from the oracle registry in r14 (funding doc_csv_ingest;
    the oracle was only the md5-threshold filter over documents — the
    SAME ``sample_hash`` kernel keeps oracle-backed coverage through
    ``orders_sample_consistent``, which runs it keyed on two tables and
    joins them, and the documents-side replay is pinned as a pure-Spark
    differential in
    test_joins.py::test_retired_entry_equivalences_r14)."""
    return T.sample_hash(
        load_tables(spark, sf_dir, "documents")["documents"], rate=0.25
    )


def doc_stratified_sample(spark, sf_dir):
    return T.stratified_sample(
        load_tables(spark, sf_dir, "documents")["documents"],
        per_group=15,
        group_col="source",
    )


def orders_sample_consistent(spark, sf_dir):
    """Cross-table consistent sampling: hash-sample orders AND lineitem
    on the SAME key (orderkey) at the same rate, join, and aggregate.
    Because the keep-decision is a pure function of the key, every
    sampled lineitem finds its order — referential integrity without
    coordination, the property that lets a pipeline sample documents
    and their embeddings/annotations independently on different
    machines and still line up."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = T.sample_hash(t["orders"], 0.2, key_col="o_orderkey")
    l = T.sample_hash(t["lineitem"], 0.2, key_col="l_orderkey")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.count_distinct(F.col("o_orderkey")).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


def doc_tfidf_top(spark, sf_dir):
    return T.tfidf_top_terms(
        load_tables(spark, sf_dir, "documents")["documents"], k=3
    )


def doc_bm25_search(spark, sf_dir):
    return T.bm25_search(
        load_tables(spark, sf_dir, "documents")["documents"],
        ["spark", "table", "sort"],
        k=10,
    )


def doc_nt_roundtrip(spark, sf_dir):
    """documents → N-Triples lines → parse → reconstruct the flat table.

    Identity against the source table proves serialize/parse are exact
    inverses over real data (every column round-trips through the term
    encoding and the ECHAR escaping); the oracle is simply the source
    table itself."""
    from .functions.termcols import int_col, str_col, uri_col
    from .sources.frame import df_to_triples
    from .sources.ntriples import ntlines_to_triples, triples_to_ntlines

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    db = df_to_triples(
        docs,
        uri_col("urn:doc:", F.col("doc_id")),
        {
            "text": str_col(F.col("text")),
            "lang": str_col(F.col("lang")),
            "source": str_col(F.col("source")),
            "n_chars": int_col(F.col("n_chars")),
        },
    )
    t = ntlines_to_triples(triples_to_ntlines(db))
    p_lex, o = F.col("p.lex"), F.col("o")
    return (
        t.groupBy(
            F.regexp_extract(F.col("s.lex"), r"^urn:doc:(\d+)$", 1)
            .cast("long")
            .alias("doc_id")
        )
        .agg(
            F.max(F.when(p_lex == "text", o["lex"])).alias("text"),
            F.max(F.when(p_lex == "lang", o["lex"])).alias("lang"),
            F.max(F.when(p_lex == "source", o["lex"])).alias("source"),
            F.max(F.when(p_lex == "n_chars", o["lex"].cast("long"))).alias("n_chars"),
        )
    )


def _ingest_scratch_dir(spark, sf_dir, kind):
    """Per-(kind, sf, session) scratch directory for the ingestion
    replay entries, plus the stale-sibling sweep (r13 advice): dirs
    left by PREVIOUS application ids are deleted at entry start — the
    current session's dir must survive the write because the summary
    DataFrame re-reads it lazily (same constraint as the closure
    materialization dirs), but a dead session's dir is pure garbage.
    SPARK_GRAFT_SCRATCH_DIR overrides the repo-local spark-warehouse
    default (a read-only package install must point this at shared
    scratch); the applicationId suffix isolates concurrent sessions —
    two check_oracle/driver runs on the same sf_dir must not race each
    other's mode="overwrite" against the other's read-back listing."""
    import os

    from .operators.graph import _fs_delete

    scratch = os.environ.get("SPARK_GRAFT_SCRATCH_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse",
    )
    prefix = "ingest_{}_{}_".format(
        kind, os.path.basename(os.path.normpath(sf_dir))
    )
    app_id = spark.sparkContext.applicationId
    try:  # sweep is best-effort and local-listing based: non-posix
        for name in os.listdir(scratch):  # scratch (s3a:/...) skips it
            if name.startswith(prefix) and not name.endswith(app_id):
                _fs_delete(spark, os.path.join(scratch, name))
    except OSError:
        pass
    return os.path.join(scratch, prefix + app_id)


def doc_jsonl_ingest(spark, sf_dir):
    """Raw-corpus ingestion end-to-end under the oracle (r13, verdict
    ask #6): the documents table is serialized to a JSONL drop
    directory with deterministic per-line corruption (doc_id % 23 == 0
    → a brace-prefixed malformed line; % 23 == 1 → the text key
    omitted), read back through ``read_jsonl_documents`` /
    ``jsonl_quarantine`` — the same line-scan + from_json projection
    the streaming twin runs — and summarized: per-lang doc counts and
    char totals from the good rows, per-reason counts from the
    quarantine.  The oracle replays the corruption predicate in pure
    SQL over the same table, so the good/quarantine SPLIT and the text
    fidelity (char-exact through JSON escape/unescape) are both
    driver-hash-pinned, not just pytest-fuzzed.  NULL text is
    classified ``missing_text`` EXPLICITLY in both the serializer and
    the oracle (r13 advice — ``to_json`` omits NULL fields, so the two
    sides would otherwise disagree on a NULL-text row the corruption
    predicate marked good; the current fixtures are NULL-free, but the
    entry must not depend on that)."""
    from .sources.corpus import jsonl_quarantine, read_jsonl_documents

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    line = F.to_json(F.struct("doc_id", "lang", "text"))
    raw = docs.select(
        F.when(F.col("doc_id") % 23 == 0, F.concat(F.lit("{"), line))
        .when(
            (F.col("doc_id") % 23 == 1) | F.col("text").isNull(),
            F.to_json(F.struct("doc_id", "lang")),
        )
        .otherwise(line)
        .alias("value")
    )
    out_dir = _ingest_scratch_dir(spark, sf_dir, "jsonl")
    raw.write.mode("overwrite").text(out_dir)
    kw = dict(id_field="doc_id", extra_fields={"lang": "string"})
    good = read_jsonl_documents(spark, out_dir, **kw)
    quar = jsonl_quarantine(spark, out_dir, **kw)
    g = good.groupBy(F.concat(F.lit("lang:"), "lang").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    q = (
        quar.groupBy(F.concat(F.lit("quarantine:"), "reason").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("total_chars", F.lit(None).cast("long"))
    )
    return g.unionByName(q).orderBy("bucket")


def doc_csv_ingest(spark, sf_dir):
    """CSV ingestion end-to-end under the oracle (r14, verdict ask #2
    — the CSV twin of :func:`doc_jsonl_ingest`, covering the last
    major batch source without a driver hash).  The documents table is
    serialized to a CSV drop directory with deterministic per-line
    corruption: doc_id % 23 == 0 → the text field dropped entirely
    (2 fields where the schema declares 3 — ``from_csv`` PERMISSIVE
    marks the record corrupt), % 23 == 1 or NULL text → an EMPTY
    trailing text field (parses to NULL text → ``missing_text``),
    otherwise a good row whose text is DECORATED with a ``,"\\``
    suffix and written always-quoted with backslash-escaping — the
    fixtures contain no separator/quote/escape characters, so without
    the decoration the quoting round-trip would be vacuously exercised.
    One header line is unioned in and must be eliminated by the
    header matcher; its count is re-derived through the
    ``csv_header_lines`` audit view (r13 advice) as the
    ``header:dropped`` bucket.  Read back through
    ``read_csv_documents`` / ``csv_quarantine`` — the same line-scan +
    ``from_csv`` projection the streaming twin runs — and summarized
    like the JSONL entry: per-lang counts + char totals over the
    decorated text from the good rows, per-reason counts from the
    quarantine.  The oracle replays the corruption predicate and the
    decoration in pure SQL, so the split, the header elimination, and
    the char-exact quote/escape fidelity are all driver-hash-pinned."""
    from .sources.corpus import (
        csv_header_lines,
        csv_quarantine,
        read_csv_documents,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    fields = {"doc_id": "bigint", "lang": "string", "text": "string"}
    decorated = F.concat(F.col("text"), F.lit(',"\\'))
    quoted = F.concat(
        F.lit('"'),
        F.replace(
            F.replace(decorated, F.lit("\\"), F.lit("\\\\")),
            F.lit('"'),
            F.lit('\\"'),
        ),
        F.lit('"'),
    )
    # NULL lang must not NULL-poison the concat'd line: an EMPTY csv
    # field reads back as NULL, and DuckDB's 'lang:' || NULL is NULL
    # too, so the empty-string write round-trips consistently (the
    # id/lang structural fields are written unquoted by design — only
    # text carries untrusted content)
    lang_safe = F.coalesce(F.col("lang"), F.lit(""))
    head = F.concat(F.col("doc_id").cast("string"), F.lit(","), lang_safe)
    raw = docs.select(
        F.when(F.col("doc_id") % 23 == 0, head)
        .when(
            (F.col("doc_id") % 23 == 1) | F.col("text").isNull(),
            F.concat(head, F.lit(",")),
        )
        .otherwise(F.concat(head, F.lit(","), quoted))
        .alias("value")
    ).unionAll(spark.createDataFrame([("doc_id,lang,text",)], "value string"))
    out_dir = _ingest_scratch_dir(spark, sf_dir, "csv")
    raw.write.mode("overwrite").text(out_dir)
    kw = dict(fields=fields, id_field="doc_id")
    good = read_csv_documents(spark, out_dir, **kw)
    quar = csv_quarantine(spark, out_dir, fields=fields)
    hdr = csv_header_lines(spark, out_dir, fields=fields)
    g = good.groupBy(F.concat(F.lit("lang:"), "lang").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    q = (
        quar.groupBy(F.concat(F.lit("quarantine:"), "reason").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("total_chars", F.lit(None).cast("long"))
    )
    h = hdr.agg(
        F.lit("header:dropped").alias("bucket"),
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(None).cast("long").alias("total_chars"),
    )
    return g.unionByName(q).unionByName(h).orderBy("bucket")


def doc_warc_ingest(spark, sf_dir):
    """WARC ingestion end-to-end under the oracle (r14, verdict ask #6
    — the last raw source without a driver hash; implemented r14,
    PUBLISHED from ORACLE_HOLDBACK with the r15 rotation, funded by
    the emb_l2_norms retirement).  The documents table is
    serialized to plain (uncompressed) ISO 28500 response records —
    one record per text() row, each ending ``\\r`` so the writer's
    ``\\n`` completes the ``\\r\\nWARC/`` resync boundary the parser
    hunts for after a rejected record — with deterministic per-record
    corruption: doc_id % 23 == 0 → ``Content-Length: oops``
    (``bad_content_length``, exercising mid-file RESYNC: the next
    record must still parse), % 23 == 1 or NULL text → a declared
    ``Content-Encoding: br`` nobody can undo (the record is emitted
    with EMPTY text and surfaces in ``warc_malformed`` as
    ``content_encoding_failed``), otherwise a well-formed HTTP 200
    text/plain response whose Content-Length is the OCTET length of
    the envelope + body.  Read back through ``read_warc_documents`` /
    ``warc_malformed`` — the real binaryFile + mapInPandas record
    walk — and summarized per lang bucket (lang rides in the
    WARC-Target-URI): emitted-row counts, char totals (encoding-failed
    rows contribute 0), and the SUM of the numeric ids recovered from
    WARC-Record-ID (pinning record-id fidelity), plus per-reason
    quarantine counts.  The oracle replays the corruption predicate in
    pure SQL, so the record framing, HTTP envelope strip, charset
    decode, resync behavior, and audit split are all hash-pinned."""
    from .sources.warc import read_warc_documents, warc_malformed

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lang = F.coalesce(F.col("lang"), F.lit("xx"))
    did = F.col("doc_id").cast("string")
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain; "
              "charset=utf-8\r\n\r\n"),
        F.col("text"),
    )
    http_enc = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n"
        "Content-Encoding: br\r\n\r\nBRBR"
    )

    def rec(clen, body):
        return F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: "
                  "<urn:doc:"),
            did,
            F.lit(">\r\nWARC-Target-URI: http://ex.org/"),
            lang,
            F.lit("/"),
            did,
            F.lit("\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: "),
            clen,
            F.lit("\r\n\r\n"),
            body,
            F.lit("\r"),
        )

    raw = docs.select(
        F.when(F.col("doc_id") % 23 == 0, rec(F.lit("oops"), F.lit("")))
        .when(
            (F.col("doc_id") % 23 == 1) | F.col("text").isNull(),
            rec(F.octet_length(F.lit(http_enc)).cast("string"),
                F.lit(http_enc)),
        )
        .otherwise(rec(F.octet_length(http).cast("string"), http))
        .alias("value")
    )
    out_dir = _ingest_scratch_dir(spark, sf_dir, "warc")
    raw.write.mode("overwrite").text(out_dir)
    good = read_warc_documents(spark, out_dir)
    bad = warc_malformed(spark, out_dir)
    g = good.groupBy(
        F.concat(
            F.lit("lang:"),
            F.regexp_extract("url", r"^http://ex\.org/([^/]+)/", 1),
        ).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(
            F.regexp_extract("doc_id", r"^urn:doc:(\d+)$", 1).cast("long")
        ).alias("sum_ids"),
    )
    q = (
        bad.groupBy(F.concat(F.lit("quarantine:"), "reason").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("total_chars", F.lit(None).cast("long"))
        .withColumn("sum_ids", F.lit(None).cast("long"))
    )
    return g.unionByName(q).orderBy("bucket")


def doc_media_features(spark, sf_dir):
    """RETIRED from the oracle registry in r12 (subsumed by the
    real-codec doc_png_features over the same kernel; pinned by
    test_retired_entry_equivalences_r12).  Multimodal plumbing, oracle-checked end-to-end: documents become
    binary payloads (utf-8 bytes), flow through the Arrow-batched
    ``image_features`` mapInPandas with the deterministic fake decoder
    (sha256-expansion — the real-codec seam stays stubbed), and the
    per-row feature means are re-derived in pure SQL from the digest
    hex, byte by byte.  Proves schema, batching, hashing, and the
    vectorized feature kernel — not just 'it ran'."""
    from .operators import multimodal as MM

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("png").alias("format"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = MM.image_features(media)
    return feats.select(
        "media_id",
        "sha256",
        F.posexplode("feature").alias("pos", "feat"),
    ).withColumn("feat", F.col("feat").cast("double"))


def doc_image_phash(spark, sf_dir):
    """Perceptual hashes of the fake-decoded document payloads:
    rows-only (the DCT + median threshold has no reasonable SQL twin;
    determinism is the checkable property here — one signature per doc,
    stable across runs).  The near-dup *pairs* path
    (``phash_near_dup_pairs``) is pinned by a pigeonhole-completeness
    pytest against brute force; on this corpus (no duplicate payloads,
    sha256 fake decoder → pseudo-random spectra) its correct output is
    empty."""
    from .operators import multimodal as MM

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return MM.image_phash(media)


def doc_video_near_dup(spark, sf_dir):
    """Video near-dup pairs over synthesized 'videos' (r08): each doc's
    UTF-8 bytes act as the container payload, duration set so frames
    tile it; every 10th doc is re-uploaded under a shifted id, so the
    expected output is exactly those planted pairs with full frame
    agreement.  Rows-only (per-frame pHash has no SQL twin); the
    pairing math is pinned by the planted pytest."""
    from .operators import multimodal as MM

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("fake").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(3000).cast("long").alias("duration_ms"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    dups = base.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + 1_000_000
    )
    # frame_bytes sized to ~20 tokens of the small test vocabulary:
    # median docs (~300 chars) still carry the >=2 full frames the
    # threshold needs, while slices stay specific enough that organic
    # cross-doc frame collisions are rare (tiny slices would alias
    # constantly and flood the equality join — the hot-bucket failure
    # mode the dedup operators guard against)
    return MM.video_near_dup_pairs(
        base.unionByName(dups), every_ms=1000, frame_bytes=128,
        max_hamming=0, min_shared_frames=2,
    )


def _audio_clips(spark, sf_dir):
    """Shared clip synthesis for the audio entries: each doc's UTF-8
    bytes drive the waveform, every 10th doc re-uploaded under a
    shifted id.  Returns ``(media, decoder)``.

    r17 (verdict ask #3 — clip synthesis lives here, not in gen_sf):
    the decoder mixes each (byte, position) pair through the splitmix64
    finalizer instead of playing the raw text bytes.  Raw word-salad
    bytes have so little entropy that at sf1.0 (50k clips) the window-
    fingerprint space saturates — 44 corpus-hot fps tripped the
    ``max_fp_windows`` guard and pruned 322 planted pairs (TUNING r16).
    The mix is a pure function of the payload, so an identical planted
    copy still shares EVERY window fp with its original (the planted
    invariant and its strlen>=192 oracle are untouched — verified
    hash-identical at sf0.001/0.01/0.1), while distinct docs now fill
    the fp space like real audio and the hot-fp guard stays dormant.
    Length-preserving, so the oracle's byte-length window arithmetic
    is unchanged."""
    import numpy as np

    def raw_decode(payload: bytes) -> "np.ndarray":
        b = np.frombuffer(payload, dtype=np.uint8).astype(np.uint64)
        x = (b << np.uint64(32)) ^ np.arange(b.size, dtype=np.uint64)
        # splitmix64 finalizer (Steele/Vigna, public domain)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return (x & np.uint64(0xFF)).astype(np.float64) / 128.0 - 1.0

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    dups = base.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + 1_000_000
    )
    return base.unionByName(dups), raw_decode


def doc_audio_near_dup(spark, sf_dir):
    """Audio near-dup pairs over synthesized clips (r08; see
    :func:`_audio_clips` for the corpus and the r17 entropy note).
    Rows-only (spectral fingerprints have no SQL twin); pinned by the
    planted pytest."""
    from .operators import multimodal as MM

    media, raw_decode = _audio_clips(spark, sf_dir)
    return MM.audio_near_dup_pairs(
        media, decoder=raw_decode, min_shared_windows=4
    )


def doc_audio_features(spark, sf_dir):
    """RETIRED from the oracle registry in r12 (subsumed by the
    real-decode doc_wav_features + doc_flac_features pair).  Audio twin of :func:`doc_media_features`: payloads through the
    Arrow-batched ``audio_features`` kernel (fake sha256-waveform
    decoder), with RMS and zero-crossings re-derived exactly in SQL
    (integer byte math; float64 accumulation; float32 cast on both
    sides)."""
    from .operators import multimodal as MM

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("wav").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(1000).cast("long").alias("duration_ms"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return MM.audio_features(media)


def doc_frame_sample(spark, sf_dir):
    """RETIRED from the oracle registry in r12 (subsumed by
    doc_mp4_demux's real sample-table drive of the same op).  Video third of the multimodal trio: per-document synthetic
    durations drive the columnar frame-sampling plan (sequence explode,
    byte-range metadata only — no decode), re-derived in SQL with
    ``range``."""
    from .operators import multimodal as MM

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("mp4").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 25).cast("long").alias("duration_ms"),
        F.lit(None).cast("binary").alias("payload"),
    )
    return MM.frame_sample(media, every_ms=1000)


def doc_resize_pixels(spark, sf_dir):
    """Last multimodal op under the gate: fake-decode → 8×8 grid →
    nearest-neighbor 4×4 resize → raw float32 payload, decoded back to
    pixel rows.  The oracle picks the same strided digest bytes
    (rows/cols [0,2,5,7]) in SQL."""
    import numpy as np
    import pandas as pd

    from .operators import multimodal as MM

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("png").alias("format"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    resized = MM.resize_images(media, target=(4, 4))

    def unpack(batches):
        # vectorized explode: one frombuffer per payload (a C call, not a
        # per-element loop), then repeat/cumsum for the id/pos columns
        for pdf in batches:
            arrs = [np.frombuffer(bytes(p), dtype=np.float32) for p in pdf["payload"]]
            lens = np.array([a.size for a in arrs], dtype=np.int64)
            flat = np.concatenate(arrs) if arrs else np.array([], dtype=np.float32)
            pos = np.arange(flat.size) - np.repeat(np.cumsum(lens) - lens, lens)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), lens),
                    "pos": pos.astype("int32"),
                    "px": flat.astype("float64"),
                }
            )

    return resized.select("media_id", "payload").mapInPandas(
        unpack, schema="media_id long, pos int, px double"
    )


def doc_sketch_stats(spark, sf_dir):
    # no SQL oracle by design: HLL++/GK sketch internals are
    # engine-specific; pytest pins the sketch within tolerance of the
    # exact corpus_stats twin (driver records rows-only)
    return T.corpus_sketch_stats(load_tables(spark, sf_dir, "documents")["documents"])


def doc_repetition(spark, sf_dir):
    return T.repetition_signals(load_tables(spark, sf_dir, "documents")["documents"])


def doc_dup_ngrams(spark, sf_dir):
    """Exact duplicated-5-gram scoring (Lee et al.-style substring-dup
    signal; oracle: same two-aggregate plan in SQL)."""
    return T.dup_ngram_stats(
        load_tables(spark, sf_dir, "documents")["documents"], n=5
    )


# the planted passage of the span-dedup entry pair: 150 chained md5
# hex strings joined by spaces = 150*32 + 149 bytes, pure ASCII,
# aperiodic (periodic content is CDC's documented worst case), and
# derived from nothing but a literal — both the Spark side and the
# DuckDB oracle can reason about it without fixture dependence
_DUP_SPAN_PASSAGE_BYTES = 150 * 32 + 149


def _dup_span_passage():
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(149)),
            lambda i: F.md5(F.concat(F.lit("dupspan:"), i.cast("string"))),
        ),
    )


def _dup_spans_frames(spark, sf_dir):
    """The planted corpus and its ``duplicate_spans`` output, the spans
    memo-persisted once per (session, sf_dir): ``doc_dup_spans`` and
    ``doc_dup_spans_planted`` analyze the SAME planted corpus, and the
    spans pipeline (the Arrow CDC chunking pass plus two
    hash-partitioned shuffles) is the dominant cost in both.  The
    planted frame itself is a pure narrow projection — cheap to
    rebuild, not worth a persisted copy."""
    from .cache import memo_persist
    from .operators.dedup import duplicate_spans

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 3,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" "),
                _dup_span_passage(),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    key = (sf_dir, "__dup_spans")
    if key not in _GRAPH_CACHE:
        _cache_put(
            key,
            memo_persist(
                duplicate_spans(planted, avg_size=64, min_span_bytes=128)
            ),
        )
    else:
        _cache_mru(key)
    return planted, _GRAPH_CACHE[key]


def doc_dup_spans(spark, sf_dir):
    """Cross-document repeated-span detection + scrub (r14, NEW
    operator family: the distributed ExactSubstr-dedup substitute, Lee
    et al. 2022, over CDC chunks — see
    ``operators.dedup.duplicate_spans``).  Rows-only by design: CDC
    chunk boundaries come from the seeded gear hash, so span offsets
    are engine-specific (same convention as doc_cdc_chunks); the
    operator's contracts are pinned by the planted/scrub/UTF-8-snap
    pytest battery, and the derived-invariant twin
    ``doc_dup_spans_planted`` (coverage/scrub booleans over the same
    plant) carries the family's driver-oracle record.

    The entry PLANTS a guaranteed detection target — an aperiodic
    ~5 KB passage built from chained md5 strings (pure SQL, no fixture
    dependence) appended to every doc_id % 7 == 3 document — and the
    operator ALSO surfaces the fixture's own cross-document
    duplication (the near-dup passages the dedup entries rely on), so
    the summary covers both: per flagged doc, the span count, flagged
    bytes, and the bytes the scrub actually removed (ASCII text →
    removal equals the flagged total, no UTF-8 snapping)."""
    from .operators.dedup import scrub_duplicate_spans

    planted, sp = _dup_spans_frames(spark, sf_dir)
    per = sp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_bytes").alias("flagged_bytes"),
    )
    kept = scrub_duplicate_spans(planted, sp).select(
        "doc_id", F.octet_length("text").alias("__kept")
    )
    orig = planted.select("doc_id", F.octet_length("text").alias("__orig"))
    return (
        per.join(orig, "doc_id")
        .join(kept, "doc_id")
        .select(
            "doc_id",
            "n_spans",
            "flagged_bytes",
            (F.col("__orig") - F.col("__kept")).alias("removed_bytes"),
        )
        .orderBy("doc_id")
    )


def doc_dup_spans_planted(spark, sf_dir):
    """Derived-invariant twin of ``doc_dup_spans`` — puts the r14
    repeated-span dedup family under the driver oracle (declared in
    ORACLE_HOLDBACK r14, PUBLISHED with the r15 rotation; funded by
    RETIRING
    doc_minhash_planted, whose planted-candidate invariant is strictly
    implied by the still-backed dedup_near_lsh_planted keep-map — the
    subsumption is COMPUTED, not argued, in
    test_joins.py::test_retired_entry_equivalences_r14).

    CDC span offsets are engine-specific (seeded gear hash), but the
    operator's two headline contracts are not, and both reduce to SQL
    booleans over the documents table alone:

    - ``covered``: in every NON-FIRST occurrence of a shared aperiodic
      passage of L bytes, flagged spans cover >= L - 2*max_chunk bytes
      of it (CDC resync settles within one max-size chunk of each
      edge; the exact floor the pytest pin
      test_operators.py::test_duplicate_spans_planted asserts).  The
      sum is restricted to the planted tail window so the fixture's
      own organic cross-document duplication — which the base entry
      also surfaces — cannot push the boolean either way.
    - ``mid_gone``: after ``scrub_duplicate_spans``, the passage's
      middle 1000 bytes are cut from the text.  Guaranteed for every
      non-first occurrence because the uncovered margin at each tail
      edge is < max_chunk = 512 bytes < 2000, scrub cuts whole spans,
      and an aperiodic md5 chain cannot be reassembled by the
      prefix+suffix junction the cut leaves behind.

    The corpus-wide FIRST occurrence (min planted doc_id: every
    interior chunk hash of the passage occurs in it, so the
    min-(doc_id, start) exemption lands there for all of them) keeps
    its passage verbatim — cut-all-but-one, Lee et al. 2022 — so both
    booleans are exactly ``doc_id <> min(planted doc_id)``."""
    from .operators.dedup import scrub_duplicate_spans

    planted, sp = _dup_spans_frames(spark, sf_dir)
    L = _DUP_SPAN_PASSAGE_BYTES
    hi = 64 * 8  # cdc max_chunk_size default = avg_size * 8
    tail = planted.where(F.col("doc_id") % 7 == 3).select(
        "doc_id", (F.octet_length("text") - L).alias("__tail_start")
    )
    ov = sp.join(tail, "doc_id").select(
        "doc_id",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.least(
                F.col("span_start") + F.col("span_bytes"),
                F.col("__tail_start") + L,
            )
            - F.greatest(F.col("span_start"), F.col("__tail_start")),
        ).alias("__ov"),
    )
    cov = ov.groupBy("doc_id").agg(F.sum("__ov").alias("__tail_bytes"))
    mid = F.substring(_dup_span_passage(), 2001, 1000)
    scrubbed = scrub_duplicate_spans(
        planted.where(F.col("doc_id") % 7 == 3), sp
    ).select("doc_id", (~F.col("text").contains(mid)).alias("mid_gone"))
    return (
        tail.join(cov, "doc_id", "left")
        .join(scrubbed, "doc_id")
        .select(
            "doc_id",
            (
                F.coalesce(F.col("__tail_bytes"), F.lit(0))
                >= F.lit(L - 2 * hi)
            ).alias("covered"),
            "mid_gone",
        )
        .orderBy("doc_id")
    )


def doc_winnow_pairs(spark, sf_dir):
    """Rolling-hash fingerprint similarity pairs by winnowing
    (Schleimer et al. 2003 / MOSS — see
    ``operators.text.winnow_fingerprints``): every k-gram xxhash64'd,
    window minima selected, corpus-hot fingerprints capped, pairs by
    one fingerprint groupBy.  Rows-only: xxhash64 values are
    engine-specific; the winnowing guarantee (shared substring >=
    window+k-1 chars → >= 1 shared fingerprint) and the short-doc /
    determinism contracts are pinned in pytest."""
    return T.winnow_shared_docs(
        load_tables(spark, sf_dir, "documents")["documents"], min_shared=2,
        pair_budget=_TRUTH_PAIR_BUDGET,
    )


def _winnow_passage():
    # 8 chained md5 strings = 263 aperiodic chars (pure SQL, no fixture
    # dependence) — well past the winnowing guarantee threshold
    # t = k + window - 1 = 74 at the operator defaults
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.md5(F.concat(F.lit("winnow:"), i.cast("string"))),
        ),
    )


def doc_winnow_planted(spark, sf_dir):
    """Derived-invariant oracle twin of ``doc_winnow_pairs`` (r15,
    verdict ask #2; funded by RETIRING doc_fingerprint — see the
    registry comment and
    test_joins.py::test_retired_entry_equivalences_r15).  xxhash64
    fingerprint VALUES are engine-specific, but the winnowing
    GUARANTEE is not (Schleimer et al. 2003, §: any substring shared
    by two documents of length >= window + k - 1 chars yields at
    least one shared selected fingerprint — each window of k-gram
    hashes fully inside the shared run is an identical hash sequence
    in both documents, so its selected minimum agrees).

    The entry PLANTS a 263-char aperiodic md5-chain passage (same
    construction as ``doc_dup_spans_planted``'s) onto every
    ``doc_id % 11 == 5`` document and emits, per planted doc except
    the smallest-id anchor:

    - ``found_anchor``: shares >= 1 distinct fingerprint with the
      anchor — the hard guarantee (263 shared chars >> t = 74);
    - ``strong``: shares >= 4 — the disjoint-window floor (the 239
      shared k-gram hashes hold 190 full windows; window minima at
      disjoint offsets 0/50/100/150 are hashes of distinct aperiodic
      k-grams).  Measured: every planted doc shares exactly 8 at
      sf0.001/0.01/0.1.

    Any window-minima, k-gram-stream, or distinct-selection bug
    breaks a boolean and the hash; the oracle needs only the planted
    id arithmetic."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 5,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" "),
                _winnow_passage(),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    fps = T.winnow_fingerprints(planted)
    pl = planted.where(F.col("doc_id") % 11 == 5).select("doc_id")
    fpl = fps.join(F.broadcast(pl), "doc_id")
    mn = pl.agg(F.min("doc_id").alias("__mn"))
    anchor_fps = (
        fpl.join(F.broadcast(mn), F.col("doc_id") == F.col("__mn"))
        .select("fp")
        .distinct()
    )
    per = (
        fpl.join(F.broadcast(mn), F.col("doc_id") != F.col("__mn"))
        .join(F.broadcast(anchor_fps), "fp")
        .groupBy("doc_id")
        .agg(F.countDistinct("fp").alias("__n"))
    )
    return (
        pl.join(F.broadcast(mn), F.col("doc_id") != F.col("__mn"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce("__n", F.lit(0)) >= 1).alias("found_anchor"),
            (F.coalesce("__n", F.lit(0)) >= 4).alias("strong"),
        )
        .orderBy("doc_id")
    )


def doc_cdc_chunks(spark, sf_dir):
    # content-defined chunking: rows-only (seeded gear hash is
    # engine-specific); partition/resync invariants pinned in pytest
    return T.cdc_chunks(
        load_tables(spark, sf_dir, "documents")["documents"], avg_size=64
    )


def dedup_incremental(spark, sf_dir):
    # append-only near-dedup against a signature store: rows-only
    # (Spark-side minhash); batch semantics pinned by pytest
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    first = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    _, sigs = D.incremental_dedup_near(first, None, threshold=0.5)
    decisions, _ = D.incremental_dedup_near(batch, sigs, threshold=0.5)
    return decisions


def dedup_incremental_simhash(spark, sf_dir):
    # append-only near-dedup on the 16-byte SimHash store (r09):
    # rows-only (Spark-side xxhash64 signatures); batch semantics
    # (corpus-wins keeper, transitive chains, zero-sig exclusion)
    # pinned by pytest
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    first = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    _, sigs = D.incremental_dedup_simhash(first, None, max_hamming=8)
    decisions, _ = D.incremental_dedup_simhash(batch, sigs, max_hamming=8)
    return decisions


def emb_semdedup(spark, sf_dir):
    # SemDeDup semantic prune: rows-only (seeded Spark-side k-means);
    # invariants + planted-dup recall pinned in pytest
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return D.semdedup(emb, threshold=0.4, n_clusters=8)


# ---------------------------------------------------------------------------
# derived-invariant twins (r10): the rows-only operators' hashes are
# engine-specific, but several of them have SQL-expressible *invariants* —
# these entries turn each invariant into a hash-checkable oracle row so the
# driver finally verifies something about the rows-only family
# ---------------------------------------------------------------------------


def doc_cdc_tiling(spark, sf_dir):
    """RETIRED from the oracle registry in r14 (funding
    dedup_keep_best_docs; see the registry comment).  The tiling
    identity is replayed as a pure-Spark differential in
    test_joins.py::test_retired_entry_equivalences_r14, and the
    cdc_chunks offsets/lengths it certified are now oracle-backed
    through the strictly stronger doc_dup_spans_planted coverage
    floor, which is computed FROM those offsets.

    Derived-invariant twin of ``doc_cdc_chunks``: the seeded gear
    hash makes chunk BOUNDARIES engine-specific, but whatever the
    boundaries are, the chunks must tile each document exactly —
    chunk 0 starts at byte 0, every later chunk starts where the
    previous ended, and the lengths sum to the document's UTF-8 byte
    length.  The oracle only needs ``strlen(text)``; any boundary,
    offset, or length bug breaks the tiling and the hash."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    ch = T.cdc_chunks(docs, avg_size=64)
    w = Window.partitionBy("doc_id").orderBy("chunk_idx")
    contig = F.coalesce(
        F.lag(F.col("start") + F.col("length")).over(w), F.lit(0)
    ) == F.col("start")
    return (
        ch.withColumn("__contig", contig)
        .groupBy("doc_id")
        .agg(
            F.sum("length").cast("bigint").alias("n_bytes"),
            (F.min(F.col("__contig").cast("int")) == 1).alias("tiled"),
        )
    )


def emb_semdedup_planted(spark, sf_dir):
    """Derived-invariant twin of ``emb_semdedup``: union the corpus
    with an exact copy of every vector (id + 100000) and prune at
    threshold 0.99.  Identical vectors always land in the same k-means
    cell (identical distances → identical argmin), so whatever the
    seeded clustering does, the greedy ascending-id prune MUST keep
    every original and drop every copy with ``dup_of`` = its original
    — while no organic pair comes near 0.99 cosine (the synthetic
    embeddings max out around 0.5).  Exactly reproducible in SQL."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    base = emb.select("vec_id", "embedding")
    copies = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    out = D.semdedup(base.unionByName(copies), threshold=0.99, n_clusters=8)
    # `cluster` is the seeded quantizer's cell id — engine-specific,
    # projected away; keep/dup_of are the invariant surface
    return out.select("vec_id", "keep", "dup_of")


def emb_pq_exhaustive(spark, sf_dir):
    """RETIRED from the oracle registry in r12 (oracle was the
    emb_cosine_topk alias; pinned by test_pq_recall_vs_bruteforce and
    superseded by emb_pq_recall_sound).  Derived-invariant twin of ``emb_pq_topk``: with ``refine`` large
    enough that k·refine covers the corpus, ADC candidate generation
    is exhaustive and the exact-cosine re-rank must reproduce the
    exact top-k — the same oracle SQL as ``emb_cosine_topk``,
    independent of the seeded codebooks."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.pq_topk(emb, emb.where(F.col("vec_id") < 5), k=5, refine=1000)


def emb_ivf_exhaustive(spark, sf_dir):
    """RETIRED from the oracle registry in r12 (oracle was the
    emb_cosine_topk alias; pinned by test_ivf_recall_vs_bruteforce and
    superseded by emb_ivf_recall_sound).  Derived-invariant twin of ``emb_ivf_topk``: probing every cell
    (``n_probe == n_centroids``) makes IVF exact regardless of where
    the seeded coarse quantizer put the cell boundaries — the exact
    top-k oracle again."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.ivf_topk(
        emb, emb.where(F.col("vec_id") < 5), k=5, n_centroids=16, n_probe=16
    )


def _ann_recall_flags(exact, approx, k, floor, mean_floor):
    """Shared recall surface for the approximate-ANN sound twins (r12,
    verdict ask #3): per-query recall@k of ``approx`` against the exact
    top-k, emitted as two hash-checkable booleans — a per-query floor
    and a corpus-mean bound (one scalar, broadcast onto every row the
    way ``_admission_soundness`` attaches ``store_ok``).  The seeded
    hyperplanes / codebooks make each operator's recall DETERMINISTIC
    per dataset; the bounds below each entry sit >= 0.2 under the
    measured minimum across sf0.001/sf0.01/sf0.1, so the entries pin
    real retrieval quality, not a vacuous tautology.  The floors are
    calibrated to the SHIPPED corpora; on any other distribution
    derive them with ``operators.similarity.calibrate_ann_floors``
    (r16) — the same measurement, same margin, run on the caller's
    own embeddings."""
    ex = exact.select("q_id", "n_id")
    ap = approx.select("q_id", "n_id").withColumn("__hit", F.lit(1))
    per = (
        ex.join(ap, ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / k).alias("__recall")
        )
    )
    mean_ok = per.agg((F.avg("__recall") >= mean_floor).alias("mean_ok"))
    return per.select(
        "q_id", (F.col("__recall") >= floor).alias("floor_ok")
    ).crossJoin(F.broadcast(mean_ok))


def emb_lsh_recall_sound(spark, sf_dir):
    """Sound twin of ``emb_lsh_topk`` on the ORGANIC corpus (r12): LSH
    top-5 with the recall levers set as the operator documents for
    low-similarity corpora (4 planes x 8 tables, multi-probe) must
    reach per-query recall@5 >= 0.6 and mean recall >= 0.9 against the
    exact ``cosine_topk`` on the same 25 probes.  Measured: min 0.8 /
    mean 0.98 at sf0.1, 1.0/1.0 at sf0.001 and sf0.01."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.where(F.col("vec_id") < 25)
    exact = S.cosine_topk(emb, q, k=5)
    approx = S.lsh_bucketed_topk(emb, q, k=5, n_planes=4, n_tables=8)
    return _ann_recall_flags(exact, approx, 5, 0.6, 0.9)


def emb_ivf_recall_sound(spark, sf_dir):
    """Sound twin of ``emb_ivf_topk`` (r12): probing 8 of 16 cells must
    reach per-query recall@5 >= 0.2 and mean recall >= 0.6 vs the exact
    top-5 on 25 probes.  Measured: min 0.4 / mean 0.78-0.81 across all
    three shipped SFs."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.where(F.col("vec_id") < 25)
    exact = S.cosine_topk(emb, q, k=5)
    approx = S.ivf_topk(emb, q, k=5, n_probe=8)
    return _ann_recall_flags(exact, approx, 5, 0.2, 0.6)


def emb_pq_recall_sound(spark, sf_dir):
    """Sound twin of ``emb_pq_topk`` (r12): 16 subquantizers (finer
    than the 8-subspace default, as the operator documents for small
    dims) with a 16x ADC candidate pool must reach per-query recall@5
    >= 0.2 and mean >= 0.6 vs exact.  Measured: min 0.4 / mean 0.87 at
    sf0.1, min 0.8 / mean ~0.95 at sf0.001 and sf0.01."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.where(F.col("vec_id") < 25)
    exact = S.cosine_topk(emb, q, k=5)
    approx = S.pq_topk(emb, q, k=5, m=16, refine=16)
    return _ann_recall_flags(exact, approx, 5, 0.2, 0.6)


def emb_ivfpq_recall_sound(spark, sf_dir):
    """Sound twin of ``emb_ivfpq_topk`` (r15, verdict ask #3 — the
    last ANN family without a driver-checked recall floor; funded by
    RETIRING emb_lsh_planted, whose identical-copy bucket guarantee
    rides the SAME ``similarity.sign_buckets`` kernel as the
    still-backed emb_dup_pairs_lsh_planted and whose top-k ranking
    path stays under the oracle through emb_lsh_recall_sound — see
    test_joins.py::test_retired_entry_equivalences_r15).  Two arms:

    - recall floor: the composed index at production levers (probe 12
      of 16 cells, 16 subquantizers, 32x ADC candidate pool) must
      reach per-query recall@5 >= 0.2 and mean >= 0.6 vs the exact
      top-5 on 25 probes.  Measured: min 0.4 at every shipped SF,
      mean 0.86-0.93.  The floors are calibrated to the SHIPPED
      fixture corpora (the `_ann_recall_flags` convention); on other
      distributions they are a tuning readout, not a contract — e.g.
      the synthetic sf1.0 trend corpus (10 tight clusters) measures
      mean ~0.4-0.6 at these levers while the exhaustive arm below
      still holds exactly.  Users on their own distribution should
      derive floors with ``similarity.calibrate_ann_floors`` (r16 —
      same probe convention, same margin; pytest pins the synthetic
      readout in test_calibrate_ann_floors_synthetic_clusters).
    - ``exhaustive_ok``: parameterized to exhaustiveness (probe every
      cell, refine covering the corpus) the composition must
      reproduce the exact top-5 SET per query regardless of where the
      seeded coarse/residual codebooks landed — the composed analog
      of the retired emb_ivf/pq_exhaustive twins, now under the
      driver oracle.

    Float-summation convention (r15 advice): the two arms compute
    cosines with different summation orders (numpy BLAS dot in
    ``cosine_topk`` vs Spark SQL ``aggregate`` fold in
    ``_rerank_exact``), reconciled by rounding both to 6dp before the
    set comparison.  A rank-5 cosine landing within one ulp of a 1e-6
    rounding boundary on a future fixture/SF could flip
    ``exhaustive_ok`` spuriously — like the recall floors above, the
    flag is calibrated to the shipped corpora (boundary ties verified
    absent there); diagnose a flip on new data as this convention, not
    as an operator regression."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.where(F.col("vec_id") < 25)
    exact = S.cosine_topk(emb, q, k=5)
    approx = S.ivfpq_topk(emb, q, k=5, n_probe=12, m=16, refine=32)
    flags = _ann_recall_flags(exact, approx, 5, 0.2, 0.6)
    exh = (
        S.ivfpq_topk(
            emb, q, k=5, n_centroids=16, n_probe=16, m=16, refine=10**6
        )
        .select("q_id", "n_id")
        .withColumn("__e", F.lit(1))
    )
    exh_ok = (
        exact.select("q_id", "n_id")
        .join(exh, ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg(
            (F.sum(F.coalesce(F.col("__e"), F.lit(0))) == 5).alias(
                "exhaustive_ok"
            )
        )
    )
    return flags.join(exh_ok, "q_id")


def doc_minhash_recall_sound(spark, sf_dir):
    """Sound twin of ``doc_minhash_lsh`` on the ORGANIC corpus (r12):
    every exact 3-gram-Jaccard pair at >= 0.5 must appear among the
    LSH band candidates, emitted as a per-pair ``found`` boolean.
    Deterministic: signatures ride seeded xxhash64, and at 16 bands x
    4 rows the banding curve puts the per-pair miss probability for
    j >= 0.5 at <= (1 - 0.5^4)^16 ~ 0.35 ONLY at the very threshold —
    the corpus's organic near-dup pairs all sit far above it (measured
    candidate recall 1.0 at sf0.001/0.01/0.1).  The truth side is the
    oracle-expressible exact shingle join ``ngram_jaccard_pairs``."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    truth = D.ngram_jaccard_pairs(
        docs, n=3, threshold=0.5, max_doc_freq=100,
        pair_budget=_TRUTH_PAIR_BUDGET,
    ).select("doc_a", "doc_b")
    cand = (
        D.minhash_lsh_candidates(docs)
        .select("doc_a", "doc_b")
        .withColumn("__hit", F.lit(True))
    )
    return truth.join(cand, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        F.coalesce(F.col("__hit"), F.lit(False)).alias("found"),
    )


def dedup_near_lsh_sound(spark, sf_dir):
    """Soundness twin of ``dedup_near_lsh`` (r12): LSH clusters are
    built ONLY from exactly-verified pairs (jaccard >= threshold), so
    they must REFINE the exact clustering — every doc and its LSH
    keeper share an exact connected component.  The exact side runs
    UNCAPPED (``max_doc_freq`` high enough to disable the hot-shingle
    cut) so the refinement is provable, not just observed: any
    LSH-verified pair is in the uncapped exact pair set by definition.
    Emitted as the all-true ``(doc_id, sound)`` table.

    Scale note: the uncapped exact join is the TRUTH side of a
    verification entry and is corpus-quadratic in the worst case by
    construction — it runs at oracle scale (sf0.01), like every
    differential's reference arm.  The production operator under test
    (``dedup_near_docs_lsh``) stays banded and bucket-capped; nothing
    on the 100 TB path changes."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    lsh = D.dedup_near_docs_lsh(docs, threshold=0.2)
    exact = D.dedup_near_docs(
        docs, n=3, threshold=0.2, max_doc_freq=1_000_000,
        pair_budget=_TRUTH_PAIR_BUDGET,
    )
    ex_self = exact.select(
        F.col("doc_id").alias("doc_id"), F.col("keep_doc_id").alias("ex_comp")
    )
    ex_keeper = exact.select(
        F.col("doc_id").alias("lsh_keep"),
        F.col("keep_doc_id").alias("ex_comp_of_keeper"),
    )
    return (
        lsh.select("doc_id", F.col("keep_doc_id").alias("lsh_keep"))
        .join(ex_self, "doc_id")
        .join(ex_keeper, "lsh_keep")
        .select(
            "doc_id",
            (F.col("ex_comp") == F.col("ex_comp_of_keeper")).alias("sound"),
        )
    )


def _admission_soundness(decisions, kept_prior, kept_now, store_ids, updated_ids):
    """Shared invariant surface for the incremental-dedup twins: one
    row per batch doc asserting the decision is well-formed —
    ``keep`` XOR ``dup_of`` set, never self-dup, ``dup_of`` points at
    a doc that is itself kept (store or batch keeper) — plus a
    store-growth bit (updated store == prior store ∪ kept batch)
    attached as a broadcast scalar."""
    # every frame below derives from the same decisions/sigs lineage —
    # qualify the self-joins explicitly
    d = decisions.alias("d")
    k = (
        kept_prior.unionByName(kept_now)
        .withColumnRenamed("doc_id", "k_id")
        .alias("k")
    )
    sound = (
        (F.col("d.keep") & F.col("d.dup_of").isNull())
        | (
            (~F.col("d.keep"))
            & F.col("d.dup_of").isNotNull()
            & (F.col("d.dup_of") != F.col("d.doc_id"))
            & F.col("k.k_id").isNotNull()
        )
    )
    per_doc = d.join(k, F.col("d.dup_of") == F.col("k.k_id"), "left").select(
        F.col("d.doc_id").alias("doc_id"), sound.alias("sound")
    )
    expect = (
        store_ids.unionByName(kept_now)
        .withColumnRenamed("doc_id", "e_id")
        .alias("e")
    )
    u = updated_ids.withColumnRenamed("doc_id", "u_id").alias("u")
    drift = (
        u.join(expect, F.col("u.u_id") == F.col("e.e_id"), "full_outer")
        .where(F.col("u.u_id").isNull() | F.col("e.e_id").isNull())
        .agg(F.count(F.lit(1)).alias("__n"))
        .select((F.col("__n") == 0).alias("store_ok"))
    )
    return per_doc.crossJoin(F.broadcast(drift))


def dedup_incremental_sound(spark, sf_dir):
    """Derived-invariant twin of ``dedup_incremental`` (MinHash store):
    the estimator's hash values are engine-specific, but every
    admission must be structurally sound — exactly one decision per
    batch doc, ``dup_of`` only on rejections and always pointing at a
    kept doc, and the updated store must be exactly prior ∪ kept.
    The oracle is the all-true table over the batch ids."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    first = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    dec1, sigs = D.incremental_dedup_near(first, None, threshold=0.5)
    dec2, updated = D.incremental_dedup_near(batch, sigs, threshold=0.5)
    return _admission_soundness(
        dec2,
        dec1.where(F.col("keep")).select("doc_id"),
        dec2.where(F.col("keep")).select("doc_id"),
        sigs.select("doc_id"),
        updated.select("doc_id"),
    )


def emb_semdedup_incremental(spark, sf_dir):
    """Store-based incremental SemDeDup (r11, verdict ask #5): admit
    the second half of the embeddings table against a store built from
    the first half — rows-only (cell assignments and greedy shadowing
    ride the seeded quantizer); the derived-invariant twin
    ``emb_semdedup_incremental_sound`` carries the hash-checkable
    contract."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    first = emb.where(F.col("vec_id") < 250)
    batch = emb.where(F.col("vec_id") >= 250)
    _, store = D.incremental_semdedup(first, None, threshold=0.95, n_clusters=8)
    dec2, _ = D.incremental_semdedup(batch, store, threshold=0.95, n_clusters=8)
    return dec2


def emb_semdedup_incremental_sound(spark, sf_dir):
    """Derived-invariant twin of ``emb_semdedup_incremental``: batch 2
    is the organic second half PLUS an exact copy of every first-half
    vector (id + 100000).  Structural soundness mirrors
    ``dedup_incremental_sound`` (keep XOR dup_of, dup_of → a kept
    vector, store grows by exactly the kept batch).  The planted bit is
    engine-independent: a copy is identical to its original, the pinned
    float32 centroid matrix assigns identical vectors to identical
    cells, and at threshold 0.99 either the original is in the store
    (cos = 1.0 → rejected) or whatever kept vector shadowed the
    original at admission time shadows the copy equally — so EVERY copy
    must be rejected, while no organic pair approaches 0.99 (synthetic
    corpus maxes out near 0.5, the ``emb_semdedup_planted``
    argument)."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    first = emb.select("vec_id", "embedding").where(F.col("vec_id") < 250)
    organic = emb.select("vec_id", "embedding").where(F.col("vec_id") >= 250)
    copies = first.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    batch = organic.unionByName(copies)
    dec1, store1 = D.incremental_semdedup(first, None, threshold=0.99, n_clusters=8)
    dec2, store2 = D.incremental_semdedup(batch, store1, threshold=0.99, n_clusters=8)
    as_doc = lambda df: df.withColumnRenamed("vec_id", "doc_id")  # noqa: E731
    base = _admission_soundness(
        as_doc(dec2),
        as_doc(dec1.where(F.col("keep")).select("vec_id")),
        as_doc(dec2.where(F.col("keep")).select("vec_id")),
        as_doc(store1.where(~F.col("centroid")).select("vec_id")),
        as_doc(store2.where(~F.col("centroid")).select("vec_id")),
    )
    flags = dec2.select(
        F.col("vec_id").alias("doc_id"),
        F.when(F.col("vec_id") >= 100000, ~F.col("keep"))
        .otherwise(F.lit(True))
        .alias("copy_rejected"),
    )
    return base.join(flags, "doc_id")


def doc_image_phash_stable(spark, sf_dir):
    """Derived-invariant twin of ``doc_image_phash``: the DCT kernel is
    deterministic, so the same payload hashed in two separate Arrow
    kernel invocations (originals vs re-uploaded copies at id+100000)
    must produce the same signature — the stability the rows-only
    entry can only claim."""
    from .operators import multimodal as MM

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    copies = media.withColumn("media_id", F.col("media_id") + 100000)
    sig = MM.image_phash(media.unionByName(copies))
    a = sig.where(F.col("media_id") < 100000).select(
        F.col("media_id").alias("doc_id"), F.col("phash").alias("pa")
    )
    b = sig.where(F.col("media_id") >= 100000).select(
        (F.col("media_id") - 100000).alias("doc_id"), F.col("phash").alias("pb")
    )
    return a.join(b, "doc_id").select(
        "doc_id", (F.col("pa") == F.col("pb")).alias("stable")
    )


def doc_video_near_dup_planted(spark, sf_dir):
    """Derived-invariant twin of ``doc_video_near_dup``: per-frame
    pHash values are engine-specific, but a re-uploaded identical
    payload MUST pair with its original whenever it carries the ≥ 2
    full 128-byte frames the threshold needs (identical bytes →
    identical frame signatures → hamming 0; extra intra-payload frame
    collisions only add agreement).  The planted-id filter
    (vid_b = vid_a + 1e6) is exact: only copies live in that id
    range."""
    out = doc_video_near_dup(spark, sf_dir)
    return out.where(
        F.col("vid_b") == F.col("vid_a") + 1_000_000
    ).select("vid_a", "vid_b")


def doc_video_pipeline(spark, sf_dir):
    """End-to-end video near-dup with ZERO injected seams (r11,
    verdict ask #7): every stage is the production code path — each
    document's bytes tile into 8×8 greyscale frames encoded as REAL
    PNGs (``codecs.write_png``), packed into a REAL ISO BMFF container
    (``demux.write_mp4``); the pipeline then demuxes with the real
    sample-table parser (``mp4_frame_slicer``), decodes each sample
    with the pure-struct PNG decoder (``png_decode_image``), pHashes
    every frame, and rolls banded-Hamming frame matches up to video
    pairs.  Every 10th doc is re-uploaded under id+1e6; an identical
    container yields identical PNGs → identical pHashes → hamming 0 on
    every frame, so each planted copy carrying ≥ 2 frames (strlen ≥ 129
    → ceil(len/128) ≥ 2) MUST pair with its original.  The planted-id
    filter makes the output exact (organic tile collisions between
    different docs cannot produce ``vid_b = vid_a + 1e6``)."""
    import numpy as np
    import pandas as pd

    from .cache import memo_persist
    from .operators import multimodal as MM
    from .operators.codecs import png_decode_image, write_png
    from .operators.demux import mp4_frame_slicer, write_mp4

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tile_bytes = 128  # one 8x16 PNG frame per 128 text bytes

    def build(batches):
        for pdf in batches:
            ids, durs, payloads = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                b = (t or "").encode("utf-8")
                samples = []
                for i in range(0, len(b), tile_bytes):
                    tile = np.zeros(tile_bytes, dtype=np.uint8)
                    piece = np.frombuffer(b[i : i + tile_bytes], dtype=np.uint8)
                    tile[: len(piece)] = piece
                    samples.append(write_png(tile.reshape(8, tile_bytes // 8)))
                ids.append(doc_id)
                durs.append(max(len(samples) - 1, 0) * 1000)
                payloads.append(write_mp4(samples))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": "video",
                    "format": "mp4",
                    "duration_ms": pd.Series(durs, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    # persist the synthesized containers: the near-dup plan consumes
    # media three ways (frame sampling, the payload join behind the
    # slicer, and the dup union) — without the memo the PNG-encode
    # build kernel runs once per consumer.  Repartition first: the
    # documents parquet is a single split at bench scale, which would
    # serialize the encode kernel onto one core
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    media = memo_persist(
        docs.select("doc_id", "text").repartition(parts).mapInPandas(
            build,
            schema="media_id long, kind string, format string,"
            " duration_ms long, payload binary",
        )
    )
    dups = media.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + 1_000_000
    )
    pairs = MM.video_near_dup_pairs(
        media.unionByName(dups),
        every_ms=1000,
        frame_bytes=0,  # real samples, uncapped
        max_hamming=0,
        min_shared_frames=2,
        decoder=png_decode_image,
        frame_slicer=mp4_frame_slicer,
    )
    return pairs.where(
        F.col("vid_b") == F.col("vid_a") + 1_000_000
    ).select("vid_a", "vid_b")


def doc_video_mjpeg(spark, sf_dir):
    """MJPEG sibling of ``doc_video_pipeline`` (r11): identical
    composition — real MP4 demux, magic-byte-routed pure-struct decode,
    pHash, banded pairs — but the samples are baseline JPEGs
    (``codecs.write_jpeg`` / ``jpeg_decode_image``), the codec real
    video corpora actually carry.  JPEG is lossy but DETERMINISTIC:
    identical text → identical container bytes → identical decoded
    pixels → hamming 0, so the planted-pair argument of the PNG entry
    holds unchanged.  Oracle (the same `strlen >= 129` planted-pair
    SQL as ``doc_video_pipeline``) published with the r12 rotation
    after one held-back round."""
    import numpy as np
    import pandas as pd

    from .cache import memo_persist
    from .operators import multimodal as MM
    from .operators.codecs import sniff_decode_image, write_jpeg
    from .operators.demux import mp4_frame_slicer, write_mp4

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tile_bytes = 128

    def build(batches):
        for pdf in batches:
            ids, durs, payloads = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                b = (t or "").encode("utf-8")
                samples = []
                for i in range(0, len(b), tile_bytes):
                    tile = np.zeros(tile_bytes, dtype=np.uint8)
                    piece = np.frombuffer(b[i : i + tile_bytes], dtype=np.uint8)
                    tile[: len(piece)] = piece
                    samples.append(
                        write_jpeg(tile.reshape(8, tile_bytes // 8).astype(float))
                    )
                ids.append(doc_id)
                durs.append(max(len(samples) - 1, 0) * 1000)
                payloads.append(write_mp4(samples))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": "video",
                    "format": "mjpeg",
                    "duration_ms": pd.Series(durs, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    media = memo_persist(
        docs.select("doc_id", "text").repartition(parts).mapInPandas(
            build,
            schema="media_id long, kind string, format string,"
            " duration_ms long, payload binary",
        )
    )
    dups = media.where(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + 1_000_000
    )
    pairs = MM.video_near_dup_pairs(
        media.unionByName(dups),
        every_ms=1000,
        frame_bytes=0,
        max_hamming=0,
        min_shared_frames=2,
        decoder=sniff_decode_image,
        frame_slicer=mp4_frame_slicer,
    )
    return pairs.where(
        F.col("vid_b") == F.col("vid_a") + 1_000_000
    ).select("vid_a", "vid_b")


def doc_bigram_logloss(spark, sf_dir):
    """Interpolated bigram LM quality score (r11): the KenLM/CCNet-
    style perplexity filter one order above ``doc_unigram_logloss`` —
    catches shuffled-common-word salad the unigram score cannot see.
    Oracle published with the r12 rotation after one held-back
    round."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.bigram_logloss(docs, alpha=0.4)


def graph_triangles_parts(spark, sf_dir):
    """Triangle counts + local clustering coefficient (r11) over the
    co-order part graph (a deterministic 10% order slice — the graph
    is dense enough that the full-corpus wedge set is a stress test,
    not a bench entry): parts appearing in the same order are linked,
    and ``operators/graph.py:triangle_counts`` runs the degree-ordered
    node-iterator (wedge join bounded O(m^1.5), never Σdeg²).  The
    100 TB path for the GLOBAL count is
    ``graph.triangle_count_global(p=...)`` — DOULION edge
    sparsification (unbiased ``sampled/p³`` estimator, wedge join cut
    ~p², deterministic per seed; pinned by
    ``test_triangle_count_global_*``).  Oracle published with the
    r12 rotation after one held-back round.  r13: the edge slice comes
    from the shared :func:`_coorder_edges` memo (the k-core pair reads
    the same graph), and ``canonical=True`` skips the operator's
    internal canonicalize+dedup shuffle — the memoized slice is
    already ``src < dst``, deduped, and materialized."""
    from .operators.graph import triangle_counts

    return triangle_counts(_coorder_edges(spark, sf_dir), canonical=True)


def _cache_put(key, df):
    displaced = _GRAPH_CACHE.pop(key, None)
    if displaced is not None and displaced is not df:
        displaced.unpersist()  # never strand a persisted frame (review)
    while len(_GRAPH_CACHE) >= _GRAPH_CACHE_MAX:
        _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE))).unpersist()
    _GRAPH_CACHE[key] = df


def _cache_mru(key):
    """Move a cached derived frame to MRU, RE-persisting it if a
    ``cache.clear_memo()`` (which unpersists memo-tracked frames
    without touching this cache) left it unpersisted — reuse would
    otherwise silently recompute the frame's plan on every consumer."""
    from .cache import memo_persist

    df = _GRAPH_CACHE.pop(key)
    lvl = df.storageLevel
    if not (lvl.useMemory or lvl.useDisk):
        df = memo_persist(df)
    _GRAPH_CACHE[key] = df
    return df


def _coorder_edges(spark, sf_dir):
    """The sliced co-order part graph (deterministic 10% order slice,
    deduped canonical ``src < dst`` edges), memo-persisted once per
    (session, sf_dir): ``graph_triangles_parts``, ``graph_kcore_sound``
    and ``graph_kcore_max`` all analyze this same graph, and each used
    to rebuild it from the lineitem self-join."""
    from .cache import memo_persist

    key = (sf_dir, "__coorder_edges")
    if key not in _GRAPH_CACHE:
        li = load_tables(spark, sf_dir, "lineitem")["lineitem"].where(
            F.col("l_orderkey") % 10 == 0
        )
        a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
        b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
        _cache_put(
            key,
            memo_persist(
                a.join(b, "l_orderkey")
                .where(F.col("pa") < F.col("pb"))
                .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
                .dropDuplicates()
            ),
        )
    else:
        _cache_mru(key)
    return _GRAPH_CACHE[key]


def _coorder_coreness(spark, sf_dir):
    """The co-order graph and its coreness fixpoint, computed once per
    (session, sf_dir) and shared by the k-core pair (r12 verdict ask
    #4): ``graph_kcore_sound`` and ``graph_kcore_max`` certify the
    SAME assignment, yet each used to rebuild the identical graph and
    rerun the identical h-index iteration — together the two slowest
    suite entries.  Both artifacts ride ``memo_persist`` (so the
    soundness self-join reads the materialized edges) and the
    suite-level graph cache (so bench cold mode's
    ``clear_graph_cache`` drops them with everything else)."""
    from .cache import memo_persist
    from .operators.graph import coreness

    e = _coorder_edges(spark, sf_dir)
    ckey = (sf_dir, "__coorder_coreness")
    if ckey not in _GRAPH_CACHE:
        _cache_put(ckey, memo_persist(coreness(e)))
    else:
        _cache_mru(ckey)
    return e, _GRAPH_CACHE[ckey]


def graph_kcore_sound(spark, sf_dir):
    """Derived-invariant twin for k-core decomposition (r11): coreness
    itself is an iterative fixpoint (no closed-form SQL), but any
    correct assignment must satisfy, per node, ``core <= degree`` and
    ``#{neighbors with core' >= core} >= core`` — both checkable in
    one plan over the same sliced co-order part graph
    ``graph_triangles_parts`` uses.  (Soundness half only:
    maximality is ``graph_kcore_max``'s peel oracle, r12.)  Oracle:
    all-true over the graph's node set, published with the r12
    rotation after one held-back round."""
    e, core = _coorder_coreness(spark, sf_dir)
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ca = core.select(F.col("node").alias("src"), F.col("core").alias("ca"))
    cb = core.select(F.col("node").alias("dst"), F.col("core").alias("cb"))
    per = (
        sym.join(ca, "src")
        .join(cb, "dst")
        .groupBy("src")
        .agg(
            F.first("ca").alias("core"),
            F.count(F.lit(1)).alias("deg"),
            F.sum(F.when(F.col("cb") >= F.col("ca"), 1).otherwise(0)).alias(
                "supp"
            ),
        )
    )
    return per.select(
        F.col("src").alias("node"),
        (
            (F.col("core") <= F.col("deg"))
            & (F.col("supp") >= F.col("core"))
        ).alias("sound"),
    )


def graph_kcore_max(spark, sf_dir):
    """Maximality half of the k-core contract (r12, verdict ask #4):
    for fixed k the h-index fixpoint's k-core membership (nodes with
    ``coreness >= k``) must equal the SEQUENTIAL PEEL's survivor set —
    the oracle runs the actual peel (repeatedly delete nodes with
    remaining degree < k) as a DuckDB recursive CTE over the same
    sliced co-order part graph ``graph_kcore_sound`` uses.  A node the
    peel keeps but the fixpoint drops is an under-converged fixpoint
    (the maximality failure the pytest differential alone used to
    pin); an extra node is unsound.  k in {4, 8}; the peel converges
    within 12 rounds at every shipped SF and the CTE runs 24 (2x
    margin).  cf. reference closure semantics ``alpha.clj:193-203``
    only insofar as both are fixpoints; the operator itself is the
    Lü et al. h-index iteration in ``operators/graph.py``.  The
    fixpoint is shared with ``graph_kcore_sound`` via
    :func:`_coorder_coreness` (r13) — one computation certifies both
    halves."""
    _, core = _coorder_coreness(spark, sf_dir)
    out = None
    for k in (4, 8):
        part = core.where(F.col("core") >= k).select(
            F.lit(k).alias("k"), "node"
        )
        out = part if out is None else out.unionByName(part)
    return out


# r18 (verdict ask #5): sf>=1.0 sweep cost control.  The capped-arm
# planted entries run their operator TWICE (uncapped + capped iff
# arm); at sf1.0 the embedding entry's two arms cost ~408 s, and the
# cost compounds as more capped arms land.  Setting
# SPARK_GRAFT_SWEEP_SINGLE_ARM=1 (sweep protocol ONLY — never set for
# shipped-SF driver or check_oracle runs; see docs/TUNING.md next to
# SPARK_GRAFT_ITER_ORACLES) drops the capped arm AND its cap_sound
# column from both the entry and its oracle — the flag is read at
# import, so tools/check_oracle.py's two sides stay consistent.  With
# the flag unset (the default everywhere) behavior is byte-identical.
_SWEEP_SINGLE_ARM = (
    os.environ.get("SPARK_GRAFT_SWEEP_SINGLE_ARM", "") == "1"
)


# the capped-arm lever value for doc_audio_near_dup_planted (r17,
# verdict ask #5).  Calibration (measured on the shipped corpora with
# the splitmix64 decoder, r17): fp occupancy max is 7 / 7 / 58 at
# sf0.001/0.01/0.1, so the cap BINDS at sf0.1 (8 fps over it) while
# every >= 192-byte planted clip keeps >= 4 under-cap shared window
# rows.  The iff boolean stays true even where the cap prunes a
# clip's whole evidence (none do at shipped SFs; a saturated corpus
# would go vacuous rather than false) — the contract is the cap's
# semantics, not a universal recall claim.
_AUDIO_FP_CAP = 32


def doc_audio_near_dup_planted(spark, sf_dir):
    """Derived-invariant twin of ``doc_audio_near_dup``: same planted
    shape over Haitsma–Kalker window fingerprints — an identical
    payload shares all its window fps with the original, so every
    planted copy long enough for ≥ 5 windows (≥ 4 shared fps at
    window=64/stride=32 → ≥ 192 bytes) must pair up.

    ``cap_sound`` (r17, verdict ask #5 — the ``max_fp_windows`` lever
    under the oracle): a second arm re-runs the pairing with the
    binding ``_AUDIO_FP_CAP`` and the boolean asserts the exact iff —
    the planted pair survives the capped run IF AND ONLY IF its
    under-cap shared evidence reaches ``min_shared_windows`` (for an
    identical copy the shared count is Σ m_v² over the clip's
    not-corpus-hot fp values v with multiplicity m_v — the equi-join's
    matched-row arithmetic).  Over-pruning and under-pruning both flip
    the boolean; the oracle pins ``true`` per pair.  Fingerprints are
    computed once and persisted; both arms and the evidence reuse
    them."""
    from .cache import memo_persist
    from .operators import multimodal as MM

    media, raw_decode = _audio_clips(spark, sf_dir)
    fps = memo_persist(MM.audio_fingerprint(media, decoder=raw_decode))
    out = MM.audio_near_dup_pairs(
        media, decoder=raw_decode, min_shared_windows=4, fps=fps
    )
    planted = out.where(
        F.col("aud_b") == F.col("aud_a") + 1_000_000
    ).select("aud_a", "aud_b")
    if _SWEEP_SINGLE_ARM:
        return planted
    capped = (
        MM.audio_near_dup_pairs(
            media, decoder=raw_decode, min_shared_windows=4, fps=fps,
            max_fp_windows=_AUDIO_FP_CAP,
        )
        .where(F.col("aud_b") == F.col("aud_a") + 1_000_000)
        .select(F.col("aud_a").alias("__sa"), F.lit(True).alias("__surv"))
    )
    occ = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__occ"))
    mult = (
        fps.where(
            (F.col("media_id") < 1_000_000) & (F.col("media_id") % 10 == 0)
        )
        .groupBy("media_id", "fp")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    guar = (
        mult.join(occ, "fp")
        .groupBy("media_id")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("__occ") <= _AUDIO_FP_CAP,
                        F.col("__m") * F.col("__m"),
                    ).otherwise(F.lit(0))
                )
                >= 4
            ).alias("__guar")
        )
    )
    return (
        planted.join(capped, planted["aud_a"] == capped["__sa"], "left")
        .join(guar, planted["aud_a"] == guar["media_id"], "left")
        .select(
            "aud_a", "aud_b",
            (
                F.coalesce(F.col("__surv"), F.lit(False))
                == F.col("__guar")
            ).alias("cap_sound"),
        )
    )


def graph_pagerank_mass(spark, sf_dir):
    """Derived-invariant twin of ``graph_pagerank_urgent``: the
    iterative float ranks are engine-specific, but teleportation +
    dangling-mass redistribution conserve total mass — after any
    number of rounds the ranks sum to exactly 1 over exactly the
    graph's node set, both SQL-checkable."""
    from .operators.graph import pagerank, path_edges
    from .patterns import Alt

    db = _graph(spark, sf_dir, include_orders=True, order_priority="1-URGENT")
    edges = path_edges(db, Alt(KW["customer"], KW["nation"], KW["region"]))
    out = pagerank(edges, src="s", dst="o", iters=6)
    return out.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.round(F.sum("rank"), 6).alias("mass"),
    )


def doc_minhash_planted(spark, sf_dir):
    """RETIRED from the oracle registry in r14 (funding
    doc_dup_spans_planted; see the comment above that entry's oracle).
    Derived-invariant twin of ``doc_minhash_lsh``: xxhash64 values
    are Spark-specific, but identical texts get identical signatures,
    hence identical band buckets — every re-uploaded copy (id+100000)
    with enough text to shingle (≥ 3 tokens) MUST appear among the
    LSH candidates paired with its original.  That invariant is
    strictly implied by the still-backed dedup_near_lsh_planted
    keep-map (a copy can only keep the min original of its
    identical-shingle group if the banding first surfaced the pair);
    the subsumption is computed in
    test_joins.py::test_retired_entry_equivalences_r14, and banding
    recall stays organically oracle-backed via
    doc_minhash_recall_sound."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    copies = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    cand = D.minhash_lsh_candidates(docs.unionByName(copies))
    return cand.where(F.col("doc_b") == F.col("doc_a") + 100000).select(
        "doc_a", "doc_b"
    )


def emb_lsh_planted(spark, sf_dir):
    """RETIRED from the oracle registry in r15 (funding
    emb_ivfpq_recall_sound; see the registry comment).  Its invariant
    — an identical planted copy collides with its original in every
    sign bucket, so top-1 is the copy at cosine 1.0 — splits into (a)
    the bucket-collision guarantee, which rides the SAME
    ``similarity.sign_buckets`` kernel that the still-backed
    emb_dup_pairs_lsh_planted pins under the oracle, and (b) the
    bucketed top-k ranking path, which stays oracle-backed through
    emb_lsh_recall_sound on the organic corpus.  The full planted
    invariant is replayed as a pure-Spark differential in
    test_joins.py::test_retired_entry_equivalences_r15.

    Derived-invariant twin of ``emb_lsh_topk``: LSH recall is
    probabilistic in general, but an EXACT duplicate of the query
    hashes to the query's bucket in every table — so with the probe
    vectors' identical copies planted into the corpus (id+100000),
    top-1 for every query must be its copy at cosine 1.0, regardless
    of the seeded hyperplanes."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.where(F.col("vec_id") < 25).select("vec_id", "embedding")
    copies = q.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    corpus = emb.select("vec_id", "embedding").unionByName(copies)
    return S.lsh_bucketed_topk(corpus, q, k=1)


# the capped-arm lever value for emb_dup_pairs_lsh_planted (r17,
# verdict ask #5).  Calibration (measured on base ∪ copies at the
# shipped SFs, r17): max-over-planted-pairs of min-shared-bucket size
# is 8 / 8 / 22 at sf0.001/0.01/0.1 — every planted pair keeps an
# under-cap shared bucket with >= 10 slack — while sf0.1 buckets reach
# 72, so the cap measurably BINDS there (prunes real buckets).  On a
# cluster-collapsed corpus (the sf1.0 trend embeddings) the cap drops
# whole planted clusters; the iff boolean below stays true because
# neither side survives — the contract is the cap's SEMANTICS, not a
# universal recall claim.
_EMB_LSH_CAP = 32


def emb_dup_pairs_lsh_planted(spark, sf_dir):
    """Derived-invariant twin of ``emb_dup_pairs_lsh``: every planted
    identical vector shares all sign buckets with its original, so the
    (original, copy) pair MUST be produced at cosine 1.0 — the
    guaranteed-recall slice of an otherwise probabilistic operator.

    ``cap_sound`` (r17, verdict ask #5 — the ``max_bucket_size`` lever
    under the oracle): a second arm re-runs the operator with the
    binding ``_EMB_LSH_CAP`` and the boolean asserts the exact iff —
    the planted pair survives the capped run IF AND ONLY IF one of its
    shared buckets is under the cap (identical vectors share every
    bucket, so the guarantee is the min shared-bucket size, computed
    from the same seeded ``sign_buckets`` kernel).  The oracle pins
    ``true`` per pair: over-pruning (a guaranteed pair lost) and
    under-pruning (a pair surviving with no under-cap evidence) both
    flip it.  Bucket tables are memoized, so the second arm reuses the
    first's projections."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    base = emb.select("vec_id", "embedding")
    copies = base.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    corpus = base.unionByName(copies)
    out = D.embedding_dup_pairs_lsh(corpus, threshold=0.99)
    planted = out.where(F.col("id_b") == F.col("id_a") + 100000).select(
        "id_a", "id_b", "cosine"
    )
    if _SWEEP_SINGLE_ARM:
        return planted
    capped = (
        D.embedding_dup_pairs_lsh(
            corpus, threshold=0.99, max_bucket_size=_EMB_LSH_CAP
        )
        .where(F.col("id_b") == F.col("id_a") + 100000)
        .select(F.col("id_a").alias("__sa"), F.lit(True).alias("__surv"))
    )
    b = S.sign_buckets(
        corpus.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        ),
        "vec", dim=64, n_planes=8, n_tables=8, seed=42,
    )
    sizes = b.groupBy("table", "bucket").agg(F.count(F.lit(1)).alias("__n"))
    guar = (
        b.where(F.col("id") < 100000)
        .join(sizes, ["table", "bucket"])
        .groupBy("id")
        .agg((F.min("__n") <= _EMB_LSH_CAP).alias("__guar"))
    )
    return (
        planted.join(capped, planted["id_a"] == capped["__sa"], "left")
        .join(guar, planted["id_a"] == guar["id"], "left")
        .select(
            "id_a", "id_b", "cosine",
            (
                F.coalesce(F.col("__surv"), F.lit(False))
                == F.col("__guar")
            ).alias("cap_sound"),
        )
    )


def dedup_near_lsh_planted(spark, sf_dir):
    """Derived-invariant twin of ``dedup_near_lsh``: at Jaccard
    threshold 1.0 the verified clusters are exactly the
    identical-shingle-set groups — i.e. the normalized-token-list
    groups among docs with ≥ 3 tokens (identical docs are guaranteed
    candidates: identical signatures share every band).  The keep-map
    over planted copies is therefore fully SQL-predictable: a copy
    keeps the min original of its normalized group; a <3-token copy
    never enters the shingle pipeline and keeps itself."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    copies = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    out = D.dedup_near_docs_lsh(docs.unionByName(copies), threshold=1.0)
    return out.where(F.col("doc_id") >= 100000)


def doc_mp4_demux(spark, sf_dir):
    """Real MP4 demuxing end-to-end (r10): each document's UTF-8 bytes
    are packed into a genuine ISO BMFF container (``write_mp4``:
    ftyp + mdat + moov/trak/stbl, samples of ≤ 64 bytes split across
    two chunk runs), frame-sampled, and sliced back through the real
    sample-table parser (``mp4_frame_slicer`` — the production
    ``frame_slicer=`` seam).  The oracle needs only byte arithmetic:
    the demuxed frame count and reassembled byte total per doc must be
    ceil(len/64) and len."""
    import pandas as pd

    from .operators.demux import mp4_frame_slicer, write_mp4
    from .operators.multimodal import frame_sample

    docs = load_tables(spark, sf_dir, "documents")["documents"]

    def build(batches):
        for pdf in batches:
            payloads, durs = [], []
            for t in pdf["text"]:
                b = (t or "").encode("utf-8")
                samples = [b[i : i + 64] for i in range(0, len(b), 64)]
                # split across two chunk runs so the stsc expansion is
                # exercised, not just the trivial one-chunk layout
                half = max(len(samples) // 2, 1)
                if not samples:
                    chunks = []
                elif len(samples) > half:
                    chunks = [half, len(samples) - half]
                else:
                    chunks = [len(samples)]
                payloads.append(write_mp4(samples, chunks=chunks))
                # empty doc → zero-sample container; clamp so
                # frame_sample's sequence() never sees a negative end
                durs.append(max(len(samples) - 1, 0) * 1000)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "video",
                    "format": "mp4",
                    "duration_ms": pd.Series(durs, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    from .cache import memo_persist

    # repartition first (the documents parquet is few splits at bench
    # scale, which would serialize the Python packing kernel onto a
    # couple of cores — same fix as doc_video_mjpeg, r11), and persist:
    # media feeds BOTH frame_sample and the payload join-back, so left
    # lazy the container-packing kernel executed twice per run (r18,
    # guide §4/§5 — two MapInPandas nodes in the before plan)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    media = memo_persist(
        docs.select("doc_id", "text").repartition(parts).mapInPandas(
            build,
            schema="media_id long, kind string, format string,"
            " duration_ms long, payload binary",
        )
    )
    frames = frame_sample(media, every_ms=1000)
    sliced = mp4_frame_slicer(
        frames.join(media.select("media_id", "payload"), "media_id"), 0
    )
    return sliced.groupBy(F.col("media_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("payload")).alias("n_bytes"),
    )


def doc_wav_features(spark, sf_dir):
    """Real WAV decode end-to-end (r10): each document's ASCII bytes
    become an int16 PCM waveform ((byte−128)/128, exact in 16-bit),
    packed into a genuine RIFF/WAVE container (``write_wav``), then
    decoded back through the pure-struct PCM decoder
    (``wav_decode_audio`` — the real decode path, no media libraries)
    and feature-extracted.  The oracle re-derives sample count, RMS
    and zero-crossings from the characters alone."""
    import numpy as np
    import pandas as pd

    from .operators.codecs import wav_decode_audio, write_wav
    from .operators.multimodal import audio_features

    docs = load_tables(spark, sf_dir, "documents")["documents"]

    def build(batches):
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
                payloads.append(write_wav((b.astype(np.float64) - 128) / 128))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    media = docs.select("doc_id", "text").mapInPandas(
        build, schema="media_id long, kind string, payload binary"
    )
    return audio_features(media, decoder=wav_decode_audio)


def doc_flac_features(spark, sf_dir):
    """Real FLAC decode end-to-end (r12, verdict ask #8): the same
    byte-waveform as ``doc_wav_features`` packed into a genuine fLaC
    stream (``write_flac``: STREAMINFO, CRC-8 frame headers,
    UTF-8-coded frame numbers, CRC-16 footers; 64-sample blocks so
    typical documents span multiple frames), decoded back through the
    pure-struct ``flac_decode_audio`` and feature-extracted.  The
    CONSTANT/VERBATIM subset is lossless, so the WAV entry's oracle
    (sample count, RMS, zero-crossings from the characters alone)
    holds verbatim."""
    import numpy as np
    import pandas as pd

    from .operators.codecs import flac_decode_audio, write_flac
    from .operators.multimodal import audio_features

    docs = load_tables(spark, sf_dir, "documents")["documents"]

    def build(batches):
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
                payloads.append(
                    write_flac((b.astype(np.float64) - 128) / 128, block_size=64)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    media = docs.select("doc_id", "text").mapInPandas(
        build, schema="media_id long, kind string, payload binary"
    )
    return audio_features(media, decoder=flac_decode_audio)


def doc_png_features(spark, sf_dir):
    """Real PNG decode end-to-end (r10): each document's first 64 ASCII
    bytes (tiled) become an 8×8 greyscale image, written as a genuine
    PNG (``write_png``: zlib + CRC chunks), decoded back through the
    pure-struct decoder (``png_decode_image`` — stdlib zlib, no
    Pillow), and feature-extracted; row means explode to (pos, feat)
    rows the oracle re-derives from the characters alone (sums of ≤ 8
    bytes divide by 8 exactly in every float width)."""
    import numpy as np
    import pandas as pd

    from .operators.codecs import png_decode_image, write_png
    from .operators.multimodal import image_features

    docs = load_tables(spark, sf_dir, "documents")["documents"]

    def build(batches):
        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                b = np.frombuffer((t or " ").encode("utf-8"), dtype=np.uint8)
                tiled = b[np.arange(64) % len(b)].reshape(8, 8)
                payloads.append(write_png(tiled))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    media = docs.select("doc_id", "text").mapInPandas(
        build, schema="media_id long, kind string, payload binary"
    )
    out = image_features(media, decoder=png_decode_image)
    return out.select(
        "media_id", F.posexplode("feature").alias("pos", "feat")
    ).select(
        "media_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("feat").cast("double").alias("feat"),
    )


def doc_bpe_roundtrip(spark, sf_dir):
    """RETIRED from the oracle registry in r13 (funding
    doc_jsonl_ingest; the oracle was only the whitespace-normalization
    replay — the rebuild==normalized-text identity is pinned as a
    pure-Spark differential in
    test_joins.py::test_retired_entry_equivalences_r13, and the BPE
    family keeps oracle-backed coverage through doc_bpe_pack and
    doc_bpe_pretokens).  BPE tokenizer train + encode end-to-end (r10): merges learned
    from the corpus's distributed word counts (driver-side on the
    bounded vocabulary, Sennrich-style incremental pair statistics),
    the corpus encoded with them, and the token stream REBUILT — BPE
    segmentation is lossless, so the concatenated pieces with ``</w>``
    markers replaced by spaces must reproduce the normalized text
    exactly.  The oracle only needs the normalization."""
    from .operators.bpe import END, bpe_encode, bpe_train, bpe_word_counts

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    merges = bpe_train(bpe_word_counts(docs), num_merges=200, min_freq=2)
    enc = bpe_encode(docs, merges)
    rebuilt = F.trim(
        F.replace(F.array_join("tokens", ""), F.lit(END), F.lit(" "))
    )
    return enc.select("doc_id", rebuilt.alias("rebuilt"), "n_tokens").select(
        "doc_id", "rebuilt"
    )


def doc_bpe_pack(spark, sf_dir):
    """Tokenize → pack to context length, end-to-end (r11): byte-level
    BPE id encoding with a reserved ``<|endoftext|>`` injected at every
    document boundary, the concatenated id stream cut into 128-token
    training chunks by the two-phase distributed prefix sum
    (``operators/bpe.py:bpe_pack`` — never a single-task global
    window).  ``num_merges=0`` keeps the id stream SQL-derivable so the
    oracle can check BOTH invariants the r10 verdict asked for — total
    token counts (``id_sum`` is a content checksum: printable-ASCII
    corpus ⇒ byte-symbol id = ord(char) − 33, end-of-word 256,
    endoftext 257) and exact chunk tiling (every chunk 128 tokens but
    the last, ids in corpus order); merge learning itself is covered by
    ``doc_bpe_roundtrip`` and the byte-level property battery."""
    from .operators.bpe import bpe_encode_ids, bpe_pack, bpe_vocab, bpe_word_counts

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    wc = bpe_word_counts(docs)
    vocab = bpe_vocab([], wc, byte_level=True, specials=("<|endoftext|>",))
    enc = bpe_encode_ids(
        docs, [], vocab, byte_level=True, append_special="<|endoftext|>"
    )
    packed = bpe_pack(enc, ctx_len=128)
    return packed.select(
        "chunk_id",
        "n_tokens",
        F.aggregate(
            "ids", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("id_sum"),
    )


def doc_simhash_planted(spark, sf_dir):
    """Derived-invariant twin of ``doc_simhash_pairs``: identical
    texts get identical 64-bit signatures, and the pigeonhole banding
    guarantees recall 1.0 at hamming 0 — so every re-uploaded copy
    (id+100000) MUST appear among the candidates paired with its
    original at hamming exactly 0.  (The planted-id filter is exact:
    only copies live in that id range.)"""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    copies = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    cand = D.simhash_candidates(docs.unionByName(copies), max_hamming=3)
    return cand.where(F.col("doc_b") == F.col("doc_a") + 100000).select(
        "doc_a", "doc_b", "hamming"
    )


def doc_sketch_tolerance(spark, sf_dir):
    """Derived-invariant twin of ``doc_sketch_stats``: HLL++/GK sketch
    internals are engine-specific, but their published error bounds
    are checkable against the exact twin computed in the SAME plan —
    approx distinct within 5·rsd of the true distinct count, approx
    quantiles within one bucket of the exact percentile.  The oracle
    is the all-true row."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sk = T.corpus_sketch_stats(docs)
    ex = T.corpus_stats(docs)
    exq = docs.agg(
        *[
            F.expr(
                f"percentile(size(split(trim(text), '\\\\s+')), {q})"
            ).alias(f"x{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ]
    )
    j = sk.crossJoin(ex).crossJoin(exq)
    close = lambda a, b, tol: (F.abs(F.col(a) - F.col(b)) <= tol)
    return j.select(
        (
            F.abs(F.col("approx_unique_docs") - F.col("n_unique_docs"))
            <= 0.1 * F.col("n_unique_docs") + 1
        ).alias("unique_ok"),
        close("p50_tokens", "x50", F.col("x50") * 0.05 + 2).alias("p50_ok"),
        close("p90_tokens", "x90", F.col("x90") * 0.05 + 2).alias("p90_ok"),
        close("p99_tokens", "x99", F.col("x99") * 0.05 + 2).alias("p99_ok"),
    )


def doc_corpus_shuffle(spark, sf_dir):
    """Deterministic global corpus shuffle (r10): 0-based position in
    the md5 total order via the two-phase distributed rank (range
    partition → per-partition counts → broadcast bases → local
    row_number) — never a single-task global window.  The oracle
    affords the one-window replay at sf0.01."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.corpus_shuffle(docs)


def doc_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment (r10): cumulative
    md5-threshold bands, disjoint + exhaustive + repartition-stable;
    thresholds routed through rate_threshold_hex on both engines."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.split_assign(docs).select("doc_id", "split")


def doc_epoch_upsample(spark, sf_dir):
    """Fractional epoch upsampling (r10): weight 2.5 → two copies plus
    a deterministic 50 % third; 0.4 → sub-sample; 0.0 → drop.  The
    oracle replays floor + md5-threshold + range explode."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    out = T.epoch_upsample(
        docs, {"src0": 2.5, "src1": 0.4, "src2": 0.0}, default_weight=1.0
    )
    return out.select(
        "doc_id", "source", F.col("copy_idx").cast("bigint").alias("copy_idx")
    )


def doc_length_batches(spark, sf_dir):
    """Length-bucketed batch assembly (r10): token-length buckets dealt
    into fixed-size batches by doc_id order — per-bucket windows, no
    global sort."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.length_batches(docs, bucket_width=16, batch_size=8)


def dedup_incremental_simhash_sound(spark, sf_dir):
    """Derived-invariant twin of ``dedup_incremental_simhash`` — the
    same structural soundness surface over the 16-byte SimHash store
    (see :func:`dedup_incremental_sound`)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    first = docs.where(F.col("doc_id") < 250)
    batch = docs.where(F.col("doc_id") >= 250)
    dec1, sigs = D.incremental_dedup_simhash(first, None, max_hamming=8)
    dec2, updated = D.incremental_dedup_simhash(batch, sigs, max_hamming=8)
    return _admission_soundness(
        dec2,
        dec1.where(F.col("keep")).select("doc_id"),
        dec2.where(F.col("keep")).select("doc_id"),
        sigs.select("doc_id"),
        updated.select("doc_id"),
    )


def doc_mixture_sample(spark, sf_dir):
    """Deterministic data-mixing sample (per-source keep rates); the
    oracle replays the md5 thresholds computed by rate_threshold_hex
    (interpolated, not hand-written: 0.5/0.25 are binary-exact but the
    contract routes every literal through the same function)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.mixture_sample(
        docs, {"src0": 1.0, "src1": 0.25, "src2": 0.0}, default_rate=0.5
    )


def doc_temperature_mixture(spark, sf_dir):
    """Temperature-smoothed corpus mixing under the oracle (r15,
    verdict ask #4 — ``temperature_mixture`` was the only
    SQL-expressible text operator with no suite entry; funded by
    RETIRING doc_unigram_logloss, whose output is EXACTLY
    ``bigram_logloss(alpha=0)`` — each real token is one bigram
    position's predicted word — so its invariant rides inside the
    still-backed doc_bigram_logloss; the identity is computed in
    test_joins.py::test_retired_entry_equivalences_r15).

    The alpha=0.5 XLM-R knob on the ``lang`` groups, mass measured in
    the ``n_chars`` TOKEN BUDGET (``weight_col`` — the form production
    mixtures actually balance): per-group keep rate
    r_g = mass_g^(alpha-1) / max_h mass_h^(alpha-1), realized through
    the md5-threshold keep.  The fixture's English share is ~2.7x the
    other languages', so ~40% of English documents drop while the
    smallest group keeps rate 1.0 — non-vacuous at every shipped SF
    (kept 416/500, 391/500, 4090/5000).

    The oracle replays BOTH halves in DuckDB: the rate computation
    (sum(n_chars) per lang, pow, renormalize) and the keep decision.
    The keep compares the md5 draw's first 13 hex digits (52 bits,
    exactly representable in a double) against r_g * 2^52 — a
    power-of-two scaling, so the product is exact given r_g;
    equivalent to the Spark side's full-width
    ``md5 < rate_threshold_hex(r)`` string comparison except when a
    draw ties the threshold's 52-bit prefix (P ~ n * 2^-52; verified
    absent at all three shipped SFs)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.temperature_mixture(
        docs, 0.5, group_col="lang", weight_col="n_chars"
    ).select("doc_id", "lang")


def doc_strip_dup_ngrams(spark, sf_dir):
    """Exact duplicated-5-gram removal (Lee et al.'s dedup step): the
    oracle replays occurrence ranking, canonical-first selection, span
    coverage, and the positional rebuild in SQL."""
    return T.strip_dup_ngrams(
        load_tables(spark, sf_dir, "documents")["documents"], n=5
    )


def doc_dedup_paragraphs(spark, sf_dir):
    """C4-style corpus-wide paragraph dedup (r08): the flat test docs
    carry no paragraph breaks, so both sides first rebuild each doc as
    10-token chunks joined by blank lines, then dedup keeps the least
    ``(doc_id, idx)`` occurrence of every repeated chunk corpus-wide
    and reassembles survivors in order."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    chunked = docs.select(
        "doc_id",
        F.expr(
            "array_join(transform(sequence(1, size(split(trim(text), '\\\\s+')), 10),"
            " i -> array_join(slice(split(trim(text), '\\\\s+'), i, 10), ' ')),"
            " '\\n\\n')"
        ).alias("text"),
    )
    return T.dedup_paragraphs(chunked)


def doc_dsir_weights(spark, sf_dir):
    """DSIR importance weights (r08): target = every 50th doc (the same
    deterministic probe slice doc_contamination uses); oracle replays
    the uni+bigram add-one log-ratio arithmetic in SQL."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.dsir_importance(docs, target=(F.col("doc_id") % 50 == 0))


def doc_bpe_pretokens(spark, sf_dir):
    """BPE pre-tokenizer counts (r08) — regex word-split replayed
    identically by DuckDB's RE2 (the pattern is alternation-order
    insensitive by construction)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.bpe_pretoken_count(docs)


def doc_token_windows(spark, sf_dir):
    """Sliding-window context packing (r08): 16-token windows, stride
    8 (50 % overlap); the plan is a shuffle-free narrow map."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.token_windows(docs, size=16, stride=8)


def doc_chunk_packing(spark, sf_dir):
    """Concat-and-chunk sequence packing (r09): the corpus token stream
    in doc_id order cut into 64-token training chunks, docs straddling
    boundaries.  The Spark side computes the global token-offset prefix
    sum as a two-phase distributed scan (range partition → per-
    partition totals broadcast back → partition-local window) — never a
    single-task global window; the oracle replays it with one ordered
    window, which DuckDB can afford at oracle scale."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return T.chunk_packing(docs, budget=64)


def doc_pipeline_pack(spark, sf_dir):
    """End-to-end pretraining prep (r09): the curation cascade's KEPT
    documents flow straight into concat-and-chunk packing — quality →
    dedup → decontamination → 64-token training chunks in one composed
    plan; the oracle replays the whole thing (cascade + ordered-window
    packing) as one SQL query, catching cross-stage bugs (a wrongly
    kept doc shifts every later chunk boundary)."""
    from . import pipelines as P

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    probes = docs.where(F.col("doc_id") % 50 == 0).select("text")
    verdict = P.curate_corpus(
        docs,
        probes,
        min_tokens=40,
        max_avg_token_len=12.0,
        max_punct_ratio=0.1,
        min_stopword_ratio=0.01,
        contamination_n=8,
        max_contamination=0.5,
    )
    kept = docs.join(
        verdict.where(F.col("status") == "kept").select("doc_id"), "doc_id"
    )
    return T.chunk_packing(kept, budget=64)


def doc_strip_html(spark, sf_dir):
    """HTML extraction round-trip (r08): both sides wrap the flat doc
    text in deterministic markup (tags, bold spans, a script block, an
    entity), then the engine strips it; the oracle is the
    whitespace-normalized ORIGINAL text — stripping must reconstruct it
    exactly, which exercises every rule (block drop, tag→space,
    entity decode, collapse) at once."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><p class='x'>"),
            F.replace(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" the "),
                F.lit(" <b>the</b> "),
            ),
            F.lit("</p>&nbsp;<script>var x = '<p>';</script><!-- c --></body></html>"),
        ).alias("text"),
    )
    return T.strip_html(html)


def doc_pipeline_curate(spark, sf_dir):
    """Composed curation cascade (quality → exact-dedup → benchmark
    decontamination) with a per-document verdict; the oracle replays
    the WHOLE cascade as one SQL query, catching stage-ordering and
    survivor-set bugs the per-operator oracles cannot see."""
    from . import pipelines as P

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    probes = docs.where(F.col("doc_id") % 50 == 0).select("text")
    return P.curate_corpus(
        docs,
        probes,
        min_tokens=40,
        max_avg_token_len=12.0,
        max_punct_ratio=0.1,
        min_stopword_ratio=0.01,
        contamination_n=8,
        max_contamination=0.5,
    )


def doc_normalize_nfc(spark, sf_dir):
    """Unicode NFC normalization; oracle is DuckDB's nfc_normalize over
    the same rows (identity on this ASCII corpus — the check still
    hash-gates the Arrow plumbing end-to-end; non-ASCII behavior is
    pinned by pytest with composed/decomposed/ligature inputs)."""
    return T.normalize_text(
        load_tables(spark, sf_dir, "documents")["documents"], form="NFC"
    )


def doc_contamination(spark, sf_dir):
    """RETIRED from the registry in r18 (funding the promoted
    doc_lang_classifier oracle): the promoted doc_contamination_bloom
    entry runs BOTH the exact and bloom arms and hash-checks the
    exact side's per-doc (n_grams, contaminated_grams) under the same
    oracle CTEs; the only dropped column is the 6dp ratio, a
    row-local derivation round(contaminated_grams / n_grams, 6) —
    identity computed in
    test_joins.py::test_retired_entry_equivalences_r18.

    Benchmark decontamination: 8-gram overlap of every document
    against a probe set (every 50th document stands in for an eval
    benchmark — probes contaminate themselves with ratio 1.0, giving
    the check real positives)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    probes = docs.where(F.col("doc_id") % 50 == 0).select("text")
    return T.benchmark_contamination(docs, probes, n=8)


def _contamination_bloom_j(spark, sf_dir):
    """The lazy two-arm (exact ⋈ bloom) pipeline of
    :func:`doc_contamination_bloom` — factored out so the entry can
    cut its lineage once per call while plan audits keep a handle on
    the REAL pipeline plan (the checkpoint reduces the entry's own
    explain to a LogicalRDD scan)."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    probes = docs.where(F.col("doc_id") % 50 == 0).select("text")
    exact = T.benchmark_contamination(docs, probes, n=8)
    bloom = T.bloom_contamination(
        docs, T.ngram_bloom_bits(probes, n=8, fpp=0.01)
    ).select(
        "doc_id",
        F.col("n_grams").alias("__bn"),
        F.col("contaminated_grams").alias("__bc"),
    )
    return exact.select("doc_id", "n_grams", "contaminated_grams").join(
        bloom, "doc_id"
    )


def doc_contamination_bloom(spark, sf_dir):
    """Bloom-filter twin of :func:`doc_contamination` — the 100-TB
    probe-set path (r17): the same probe set goes through a
    distributed ``ngram_bloom_bits`` table (no driver collect, no
    broadcast of raw grams) and the corpus probes it with
    ``bloom_contamination``.

    PROMOTED rows-only -> hash-backed in r18 (verdict ask #2, the
    bloom sound twin the r17 registry comment named): the raw flagged
    set includes xxhash64-seeded false positives with no SQL twin, so
    the entry emits the EXACT side's per-doc ``(n_grams,
    contaminated_grams)`` — SQL-replayable, the doc_contamination
    oracle shape — plus two derived booleans the oracle pins ``true``:

    - ``superset_ok``: the bloom run counts the identical gram stream
      (``n_grams`` equal) and flags every exactly-contaminated
      position (``bloom >= exact`` per doc — no false negatives, the
      Bloom construction guarantee);
    - ``fp_env_ok``: corpus-wide, the bloom excess on CLEAN gram
      positions stays within 5x the configured 1% fpp (measured
      excess rate is ~0.01 at every shipped SF; the 5x envelope
      absorbs per-gram hash-collision variance, calibrated in
      ``test_cap_calibration.py::test_bloom_fp_envelope_calibration``).

    An under-built bit table, a hashing drift, or a gram-stream
    mismatch flips a boolean and the hash.  Both arms reuse one
    fingerprint of the corpus; the raw-output contract stays pinned by
    ``test_operators.py::test_bloom_contamination_superset``."""
    # materialized per call (r18, guide §5): the envelope aggregate and
    # the final projection BOTH consume `j`, and with it lazy the
    # entire two-arm gram pipeline executed twice per run (the before
    # plan shows 28 documents scans, zero reuse).  cut_lineage — not
    # the cross-call memo — so every bench/oracle invocation still
    # computes both arms from parquet exactly once.  The two-arm plan
    # itself stays auditable through `_contamination_bloom_j`
    # (plan_audit pins its codegen + broadcast shape there, since the
    # checkpoint hides it from the final consumer plan).
    from .cache import cut_lineage

    j = cut_lineage(_contamination_bloom_j(spark, sf_dir))
    env = j.agg(
        (
            F.sum(F.col("__bc") - F.col("contaminated_grams"))
            <= F.lit(0.05)
            * F.sum(F.col("n_grams") - F.col("contaminated_grams"))
        ).alias("__env")
    )
    return j.crossJoin(F.broadcast(env)).select(
        "doc_id",
        "n_grams",
        "contaminated_grams",
        (
            (F.col("__bn") == F.col("n_grams"))
            & (F.col("__bc") >= F.col("contaminated_grams"))
        ).alias("superset_ok"),
        F.col("__env").alias("fp_env_ok"),
    )


def doc_unigram_logloss(spark, sf_dir):
    """RETIRED from the oracle registry in r15 (funding
    doc_temperature_mixture; see the registry comment).  The unigram
    score is EXACTLY ``bigram_logloss(alpha=0)``: with the BOS
    sentinel prepended, every real token is one bigram position's
    predicted word, the bigram op's unigram term c(w)/T is the same
    corpus unigram model over the same tokenization, and the per-doc
    rollup (mean of -log p, 4dp) is the same aggregation — so the
    still-backed doc_bigram_logloss (alpha=0.4, where the unigram
    term enters EVERY interpolated probability) keeps the unigram
    rates under the oracle.  The identity unigram_logloss(docs) ==
    bigram_logloss(docs, alpha=0) is computed in
    test_joins.py::test_retired_entry_equivalences_r15.

    Corpus-trained unigram LM quality score (CCNet-style filter with
    the simplest LM); 4dp rounding absorbs double-sum reordering."""
    return T.unigram_logloss(load_tables(spark, sf_dir, "documents")["documents"])


def doc_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(
        load_tables(spark, sf_dir, "documents")["documents"],
        n=3,
        threshold=0.2,
        max_doc_freq=100,
        pair_budget=_TRUTH_PAIR_BUDGET,
    )


def doc_minhash_lsh(spark, sf_dir):
    # no SQL oracle (xxhash64 is Spark-specific); driver records rows-only
    return D.minhash_lsh_candidates(
        load_tables(spark, sf_dir, "documents")["documents"]
    )


def doc_simhash(spark, sf_dir):
    return D.simhash(load_tables(spark, sf_dir, "documents")["documents"])


def doc_simhash_pairs(spark, sf_dir):
    # banded candidate join + popcount verify; xxhash64-based → rows-only
    return D.simhash_candidates(
        load_tables(spark, sf_dir, "documents")["documents"], max_hamming=3
    )


def dedup_near_docs(spark, sf_dir):
    """Exact near-dup keep-one mapping (oracle: recursive-CTE closure)."""
    return D.dedup_near_docs(
        load_tables(spark, sf_dir, "documents")["documents"],
        n=3,
        threshold=0.2,
        max_doc_freq=100,
        pair_budget=_TRUTH_PAIR_BUDGET,
    )


def dedup_keep_best_docs(spark, sf_dir):
    """Quality-ranked survivor selection (r14, declared in
    ORACLE_HOLDBACK, PUBLISHED with the r15 rotation; funded by
    retiring doc_cdc_tiling — see the
    registry comment): the same n-gram-Jaccard clusters as
    ``dedup_near_docs``, but each cluster keeps its BEST-scoring
    member (CCNet-style; here score = character length, the simplest
    deterministic quality proxy — keep the most complete copy) instead
    of the smallest id.  Fully SQL-expressible: the recursive-CTE
    closure of the sibling entry plus one window argmax (integer
    score, id tiebreak — no cross-engine float-tie hazard)."""
    return D.dedup_near_docs_keep_best(
        load_tables(spark, sf_dir, "documents")["documents"],
        n=3,
        threshold=0.2,
        max_doc_freq=100,
        pair_budget=_TRUTH_PAIR_BUDGET,
    )


def dedup_near_lsh(spark, sf_dir):
    # MinHash candidates → verify → cluster; xxhash64-based → rows-only
    return D.dedup_near_docs_lsh(
        load_tables(spark, sf_dir, "documents")["documents"], threshold=0.5
    )


def emb_l2_norms(spark, sf_dir):
    """RETIRED from the oracle registry in r14 (funding doc_warc_ingest;
    the oracle was only sqrt(dot(v,v)) — the SAME ``_norm`` kernel keeps
    oracle-backed coverage inside the cosine denominators of
    emb_cosine_topk, emb_dup_pairs and dedup_near_emb, and the direct
    replay is pinned as a pure-Spark differential in
    test_joins.py::test_retired_entry_equivalences_r14)."""
    return S.l2_norms(load_tables(spark, sf_dir, "embeddings")["embeddings"])


def emb_cosine_topk(spark, sf_dir):
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=5)


def emb_range_search(spark, sf_dir):
    """Exact cosine radius search (r08): all corpus vectors within
    cosine ≥ 0.3 of the 5 probe vectors — threshold filtered inside the
    Arrow kernel, zero-shuffle plan."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.cosine_range_search(emb, emb.where(F.col("vec_id") < 5), threshold=0.3)


def emb_lsh_topk(spark, sf_dir):
    # approximate variant: rows-only check (recall measured in tests)
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.lsh_bucketed_topk(emb, emb.where(F.col("vec_id") < 5), k=5)


def emb_pq_topk(spark, sf_dir):
    # product-quantization ANN: rows-only (seeded codebooks); pinned by
    # exhaustive-refine==exact + recall pytests
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.pq_topk(emb, emb.where(F.col("vec_id") < 5), k=5)


def emb_ivf_topk(spark, sf_dir):
    # IVF coarse-quantizer ANN: rows-only (seeded k-means is Spark-side)
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.ivf_topk(emb, emb.where(F.col("vec_id") < 5), k=5)


def emb_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composed ANN (r14 — the production FAISS IndexIVFPQ
    shape: cell pruning x residual product codes x exact refine; see
    ``operators.similarity.ivfpq_topk``).  Rows-only: both quantizers
    are seeded driver-side k-means; the exhaustive-parameter exactness
    and planted-duplicate invariants are pinned in pytest
    (test_ivfpq_recall_and_pruning, test_ann_string_vec_ids)."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.ivfpq_topk(
        emb, emb.where(F.col("vec_id") < 5), k=5, n_centroids=8, n_probe=4
    )


# the synthetic embeddings are random (no planted near-dups; max pairwise
# cosine ≈ 0.51 at sf0.01), so the suite threshold sits where the data
# has structure — the operators' semantics don't depend on it
_EMB_DUP_THRESHOLD = 0.4


def emb_dup_pairs(spark, sf_dir):
    """Exact embedding near-dup pairs (block-grid all-pairs cosine)."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return D.embedding_dup_pairs(emb, threshold=_EMB_DUP_THRESHOLD)


def emb_dup_pairs_lsh(spark, sf_dir):
    # scale path: hyperplane-bucket candidates + exact verify; recall < 1
    # by the collision curve → rows-only (recall measured in tests, where
    # planted near-dups at cosine ≈ 0.999 are caught at recall 1.0).
    # Bands are widened for this suite threshold: 0.4 cosine ≈ 66° — far
    # outside the high-similarity regime LSH is built for — so the
    # default 8×8 banding would have ~0.2 recall here; 4 planes × 8
    # tables gives ~0.75 at ~2× fewer comparisons than all-pairs
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return D.embedding_dup_pairs_lsh(
        emb, threshold=_EMB_DUP_THRESHOLD, n_planes=4, n_tables=8
    )


def dedup_near_emb(spark, sf_dir):
    """Embedding-cosine keep-one dedup (oracle: recursive-CTE closure)."""
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return D.dedup_near_embeddings(emb, threshold=_EMB_DUP_THRESHOLD)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# Registry ordering contract: the correctness driver checks only the FIRST
# 50 entries, so the dict is ordered by "rounds since last driver check",
# descending — entries never (or longest-ago) recorded in a CORRECTNESS_r*
# file come first, and the rows-only-by-design entries (no ORACLES row;
# engine-specific hashes/seeds, pinned by pytests instead) are parked last.
# Capacity mechanism (r11): the horizon is 50 slots x 3 rounds = 150
# slot-rounds, so every new oracle-backed entry must be funded by a
# RETIREMENT — the operator stays implemented and benched, pinned to a
# still-oracle-backed sibling by
# tests/test_joins.py::test_retired_entry_equivalences (+ cited
# pytests).  r11 retired: events_sessionize, events_funnel_windowed,
# events_salted_type_stats, doc_dup_ngrams, doc_token_count (pins in
# that test's docstring).
# r12 surgery (verdict asks #1/#3/#4/#8): the 4 r11 holdbacks PROMOTE
# into the window (ORACLE_HOLDBACK is empty again) and 7 new entries
# land — the ANN sound twins emb_{lsh,ivf,pq}_recall_sound,
# doc_minhash_recall_sound, and dedup_near_lsh_sound (every family the
# r11 verdict listed as r5-stale now has a driver-checked organic
# invariant), the k-core maximality peel graph_kcore_max, and the
# real-FLAC-decode doc_flac_features — funded by 7 retirements:
#   emb_pq_exhaustive   -> its oracle WAS emb_cosine_topk's (alias);
#                          pinned by test_operators.py:914 (exhaustive
#                          refine -> recall 1.0) + emb_pq_recall_sound
#   emb_ivf_exhaustive  -> same shape; test_operators.py:526 (probe
#                          all cells -> recall 1.0) + emb_ivf_recall_sound
#   bgp_path_region_members -> same answer set as the still-backed
#                          bgp_path_inv_region_members by construction
#                          (Inv of the same Seq path); pinned by
#                          test_retired_entry_equivalences
#   grouping_sets_priority -> Spark-native GROUPING SETS, pinned by a
#                          pure-Spark differential vs the unioned
#                          plain group-bys (same test); rollup/cube
#                          siblings remain oracle-backed
#   doc_audio_features  -> the FAKE-decoder audio plumbing entry,
#                          subsumed by the real-decode pair
#                          doc_wav_features + doc_flac_features over
#                          the same audio_features kernel (the fake
#                          decoder itself stays pinned by
#                          test_audio_features_and_resize)
#   doc_media_features  -> the FAKE-decoder image plumbing entry, same
#                          argument: doc_png_features drives the same
#                          image_features kernel through a real codec;
#                          fake path pinned by
#                          test_multimodal_image_features
#   doc_frame_sample    -> synthetic-duration frame sampling, subsumed
#                          by doc_mp4_demux (the real sample-table
#                          path through the same frame_sample op);
#                          pinned by test_frame_sample
# Closing state r12: 145 oracle-backed entries (all published, no
# holdbacks) against 150 slot-rounds = 5 free slot-rounds of headroom.
# r14 surgery (verdict asks #1/#2): window = the 45 r11-recorded
# must-rotate entries + 5 slots spent as 1 NEW entry (doc_csv_ingest —
# the CSV corruption-replay twin of doc_jsonl_ingest, funded by
# RETIRING doc_sample_hash, whose oracle was only the md5-threshold
# filter; the same sample_hash kernel stays oracle-backed through
# orders_sample_consistent and the documents-side replay is pinned in
# test_retired_entry_equivalences_r14) + 4 EARLY REFRESHES of
# r12-recorded entries (bgp_customers_in_region, bgp_nations_values,
# bgp_filter_customer_names, q10_returned_items).  With the retirement
# the r12-newest set shrinks 50 → 45, so r15 = 45 must-rotate + 5 free
# — the slack the r13 verdict demanded.  Oracle-backed count stays 145.
# r14 late-round addition: doc_dup_spans_planted (the derived-invariant
# oracle twin of the NEW repeated-span dedup family) lands in
# ORACLE_HOLDBACK next to doc_warc_ingest (both publish in r15's free
# slots, audit-enforced), funded by RETIRING doc_minhash_planted — its
# planted-candidate invariant is strictly implied by the still-backed
# dedup_near_lsh_planted keep-map (subsumption computed in
# test_retired_entry_equivalences_r14; banding recall stays organically
# backed via doc_minhash_recall_sound).  Oracle-backed count stays 145;
# the r16 must-rotate set shrinks 49 → 48.  Second late-round addition:
# dedup_keep_best_docs (quality-ranked survivor selection — the CCNet
# "keep the best copy, not the first" refinement every production
# pipeline applies; recursive-closure + window-argmax oracle), also
# held back to r15, funded by RETIRING doc_cdc_tiling (r12-recorded,
# outside the window — so r15's must-rotate set shrinks 45 → 44 and
# the three holdback publishes still leave 3 early-refresh slots).
# r15 surgery (verdict asks #1-#4): window = 3 NEW entries
# (doc_winnow_planted — the winnowing-guarantee booleans over a planted
# md5-chain passage, funded by RETIRING doc_fingerprint, whose md5 fp
# values stay exposed per group in dedup_exact_docs;
# emb_ivfpq_recall_sound — the recall-floor + exhaustive≡exact twin of
# the composed IVF-PQ index, funded by RETIRING emb_lsh_planted, whose
# bucket guarantee rides the same sign_buckets kernel as
# emb_dup_pairs_lsh_planted and whose ranking path stays backed via
# emb_lsh_recall_sound; doc_temperature_mixture — mass^alpha
# renormalized rates + md5-threshold keep replayed in DuckDB, funded by
# RETIRING doc_unigram_logloss, which equals bigram_logloss(alpha=0)
# exactly) + the 3 promoted r14 holdbacks (ORACLE_HOLDBACK empty again)
# + the 44 r12-recorded must-rotate entries.  All three subsumptions
# are computed in test_joins.py::test_retired_entry_equivalences_r15.
# Oracle-backed count stays 145 (142 recorded + 3 new in-window);
# retiring two r13-recorded entries shrinks the r16 must-rotate set
# 48 -> 46 (+ 4 free), and doc_fingerprint's retirement shrinks r17's
# to 49 — headroom stays 5 free slot-rounds.
# r16 plan: 46 must-rotate (r13-recorded) + 4 free slots.  With r15's
# publishes every rows-only family now carries a hash-checked derived
# twin and every SQL-expressible operator has an entry (audited by
# grepping operator defs vs suite/tests in r15), so no NEW entries are
# owed — spend the 4 free slots as early refreshes of r14-recorded
# entries (prefer the 4 most expensive: doc_video_mjpeg-class media
# entries rotate cheaper when spread across rounds) to flatten r17's
# 49-entry bulge.
# r16 rotation (verdict ask #1, executed): window = the 46 r13-recorded
# must-rotate entries + 4 early refreshes of r14-recorded entries
# (doc_csv_ingest, doc_bpe_pack, doc_video_pipeline, doc_png_features —
# the registry comment's expensive media/ingest candidates).  No new
# entries, no retirements; oracle-backed count stays 145.  Resulting
# plan: r17 = 45 must-rotate (r14-recorded) + 5 free, r18 = 50
# (r15-recorded) — the one-slot-slack cliff is gone.  r17 should keep
# the cadence: spend its 5 free slots as early refreshes of
# r15-recorded entries (graph_kcore_max / graph_pagerank_mass /
# graph_triangles_parts are the expensive iterative ones) so r18
# lands at 45 + 5 instead of 50 + 0.
# r17 rotation (verdict ask #1, executed): window = the 45 r14-recorded
# must-rotate entries + 5 early refreshes of r15-recorded entries
# (graph_kcore_max, graph_pagerank_mass, graph_triangles_parts,
# graph_kcore_sound, doc_video_mjpeg — the expensive iterative/media
# ones the r16 verdict named).  No new entries, no retirements;
# oracle-backed count stays 145.  Resulting plan: r18 = 45 must-rotate
# (r15-recorded) + 5 free.  r18 should keep the cadence: spend its 5
# free slots as early refreshes of r16-recorded entries (prefer the
# expensive ones — doc_nt_roundtrip, dedup_incremental_simhash_sound,
# doc_video_near_dup_planted, doc_mp4_demux, doc_pipeline_curate) so
# r19 lands at 45 + 5 instead of 50 + 0.
# r13 surgery (verdict asks #2/#6): window = the 45 r10-recorded
# must-rotate entries + 5 slots spent as 1 NEW entry (doc_jsonl_ingest
# — the raw-ingestion path under the oracle, funded by RETIRING
# doc_bpe_roundtrip, whose oracle was only the whitespace-normalization
# replay; the rebuild==normalized identity is pinned as a pure-Spark
# differential in test_retired_entry_equivalences_r13) + 4 EARLY
# REFRESHES of r11-recorded entries (q1_pricing_summary, events_hourly,
# nation_set_ops, dedup_exact_docs) so the r14 must-rotate set shrinks
# from 50 (zero slack, unrecoverable after any driver hiccup) back to
# 45 + 5 free.  Oracle-backed count stays 145 — headroom unchanged.
# When adding a new oracle-backed entry, insert it at the top; after
# each round, rotate entries the driver just verified toward the back.
QUERIES = {
    # --- r18 driver window (first 50): the 44 r15-recorded must-rotate
    # entries (45 minus the retired doc_quality_filter) + 5 EARLY
    # REFRESHES of r16-recorded entries (r17 verdict ask #1 — the
    # registry-named rotation plan, so r19 lands 45 must-rotate + 5
    # free instead of 50 + 0) + the newly funded
    # doc_contamination_bloom (r18 ask #2) in the slot the retirement
    # freed ---
    "doc_winnow_planted": doc_winnow_planted,
    "emb_ivfpq_recall_sound": emb_ivfpq_recall_sound,
    "doc_temperature_mixture": doc_temperature_mixture,
    "doc_warc_ingest": doc_warc_ingest,
    "doc_dup_spans_planted": doc_dup_spans_planted,
    "dedup_keep_best_docs": dedup_keep_best_docs,
    "emb_lsh_recall_sound": emb_lsh_recall_sound,
    "emb_ivf_recall_sound": emb_ivf_recall_sound,
    "emb_pq_recall_sound": emb_pq_recall_sound,
    "doc_bigram_logloss": doc_bigram_logloss,
    # doc_cdc_tiling RETIRED r14 (funding dedup_keep_best_docs): its
    # oracle was only "the chunks tile the document" booleans; the
    # same cdc_chunks offsets/lengths are now oracle-backed through a
    # strictly stronger contract (doc_dup_spans_planted's tail-window
    # coverage floor is computed FROM those offsets), and the tiling
    # identity is replayed as a pure-Spark differential in
    # test_joins.py::test_retired_entry_equivalences_r14
    "doc_flac_features": doc_flac_features,
    "doc_minhash_recall_sound": doc_minhash_recall_sound,
    "dedup_near_lsh_sound": dedup_near_lsh_sound,
    "asof_events_orders_forward": R.asof_events_orders_forward,
    "bgp_agg_customers_by_region": bgp_agg_customers_by_region,
    "bgp_agg_urgent_orders_by_nation": bgp_agg_urgent_orders_by_nation,
    "bgp_bind_segment_prefix": bgp_bind_segment_prefix,
    "bgp_construct_region_graph": bgp_construct_region_graph,
    "bgp_describe_nation": bgp_describe_nation,
    "bgp_exists_repeat_customers": bgp_exists_repeat_customers,
    "bgp_not_exists_unurgent": bgp_not_exists_unurgent,
    "bgp_optional_urgent_orders": bgp_optional_urgent_orders,
    "bgp_path_from_seed": bgp_path_from_seed,
    "bgp_select_top_names": bgp_select_top_names,
    "bgp_subquery_busy_nations": bgp_subquery_busy_nations,
    "bgp_values_rows_pairs": bgp_values_rows_pairs,
    "cohort_retention": R.cohort_retention,
    "doc_bm25_search": doc_bm25_search,
    "doc_chunk_packing": doc_chunk_packing,
    "doc_corpus_stats": doc_corpus_stats,
    "doc_lang_id": doc_lang_id,
    "doc_pipeline_pack": doc_pipeline_pack,
    # doc_quality_filter RETIRED r18 (funding the promoted
    # doc_contamination_bloom oracle): quality_filter(docs, params) is
    # EXACTLY text_quality(docs) filtered by four threshold predicates
    # — the signals stay hash-backed through doc_text_quality, and the
    # gate semantics stay under a driver oracle inside
    # doc_pipeline_curate's cascade; the filter identity is computed
    # in test_joins.py::test_retired_entry_equivalences_r18
    "doc_repetition": doc_repetition,
    "doc_scrub_pii": doc_scrub_pii,
    "doc_strip_boilerplate": doc_strip_boilerplate,
    "doc_tfidf_top": doc_tfidf_top,
    "events_value_outliers": R.events_value_outliers,
    "graph_components_nations": graph_components_nations,
    "graph_distances_from_seed": graph_distances_from_seed,
    "orders_sample_consistent": orders_sample_consistent,
    "q11_part_value": R.q11_part_value_concentration,
    "q8_market_share": R.q8_market_share,
    "q9_product_profit": R.q9_product_profit,
    "range_events_clicks": R.range_events_clicks,
    # --- 5 early refreshes (r16-recorded; named by the r17 registry
    # comment) — window slots 45-49 ---
    "doc_nt_roundtrip": doc_nt_roundtrip,
    "dedup_incremental_simhash_sound": dedup_incremental_simhash_sound,
    "doc_video_near_dup_planted": doc_video_near_dup_planted,
    "doc_mp4_demux": doc_mp4_demux,
    "doc_pipeline_curate": doc_pipeline_curate,
    # --- newly funded r18 oracle (verdict ask #2): the bloom sound
    # twin publishes immediately in the retirement-freed slot 50 ---
    "doc_contamination_bloom": doc_contamination_bloom,
    # --- outside the window ------------------------------------------
    # --- newest record r16 — the r19 rotation set (45 after the 5
    # early refreshes above) plus the r18-declared holdback ---
    "doc_jsonl_ingest": doc_jsonl_ingest,
    "emb_semdedup_planted": emb_semdedup_planted,
    "dedup_incremental_sound": dedup_incremental_sound,
    "bgp_path_from_selective_var": bgp_path_from_selective_var,
    "doc_image_phash_stable": doc_image_phash_stable,
    "doc_audio_near_dup_planted": doc_audio_near_dup_planted,
    # doc_minhash_planted RETIRED r14 (funding doc_dup_spans_planted):
    # its planted-candidate invariant is strictly implied by the
    # still-backed dedup_near_lsh_planted keep-map; subsumption
    # computed in test_joins.py::test_retired_entry_equivalences_r14,
    # and the banding recall stays organically oracle-backed through
    # doc_minhash_recall_sound
    "doc_wav_features": doc_wav_features,
    "doc_simhash_planted": doc_simhash_planted,
    "doc_sketch_tolerance": doc_sketch_tolerance,
    # emb_lsh_planted RETIRED r15 (funding emb_ivfpq_recall_sound):
    # bucket-collision guarantee rides the same sign_buckets kernel as
    # the still-backed emb_dup_pairs_lsh_planted; ranking path stays
    # backed via emb_lsh_recall_sound; differential in
    # test_joins.py::test_retired_entry_equivalences_r15
    "emb_dup_pairs_lsh_planted": emb_dup_pairs_lsh_planted,
    "dedup_near_lsh_planted": dedup_near_lsh_planted,
    "doc_corpus_shuffle": doc_corpus_shuffle,
    "doc_split_assign": doc_split_assign,
    "doc_epoch_upsample": doc_epoch_upsample,
    "doc_length_batches": doc_length_batches,
    "bgp_path_reach_urgent": bgp_path_reach_urgent,
    "dedup_near_docs": dedup_near_docs,
    "dedup_near_emb": dedup_near_emb,
    "doc_mixture_sample": doc_mixture_sample,
    "doc_ngram_jaccard": doc_ngram_jaccard,
    "doc_normalize_nfc": doc_normalize_nfc,
    "doc_stratified_sample": doc_stratified_sample,
    "doc_strip_dup_ngrams": doc_strip_dup_ngrams,
    # doc_unigram_logloss RETIRED r15 (funding doc_temperature_mixture):
    # == bigram_logloss(alpha=0) exactly; unigram rates stay backed
    # inside doc_bigram_logloss; identity computed in
    # test_joins.py::test_retired_entry_equivalences_r15
    "doc_resize_pixels": doc_resize_pixels,
    "emb_cosine_topk": emb_cosine_topk,
    "emb_dup_pairs": emb_dup_pairs,
    "graph_closure_nations": graph_closure_nations,
    "graph_shortest_urgent": graph_shortest_urgent,
    "q13_customer_distribution": R.q13_customer_distribution,
    "q14_promo_revenue": R.q14_promo_revenue,
    "q15_top_supplier": R.q15_top_supplier,
    "q16_supplier_part_counts": R.q16_supplier_part_counts,
    "q17_small_qty_revenue": R.q17_small_quantity_revenue,
    "q18_large_volume_customers": R.q18_large_volume_customers,
    "q19_disjunctive_revenue": R.q19_disjunctive_revenue,
    "q20_excess_suppliers": R.q20_excess_suppliers,
    "q21_waiting_suppliers": R.q21_waiting_suppliers,
    "q1_pricing_summary": R.q1_pricing_summary,
    "events_hourly": R.events_hourly,
    "nation_set_ops": R.nation_set_ops,
    "dedup_exact_docs": dedup_exact_docs,
    "doc_csv_ingest": doc_csv_ingest,
    "doc_bpe_pack": doc_bpe_pack,
    "doc_video_pipeline": doc_video_pipeline,
    "doc_png_features": doc_png_features,
    # doc_lang_classifier: PROMOTED rows-only -> oracle-backed in r18
    # (verdict ask #3: planted separable corpus + full NB replay in
    # DuckDB + calibrated accuracy floor).  Held back
    # (ORACLE_HOLDBACK, since r18) because the r18 window is full; it
    # MUST head the r19 window with the r16-recorded rotation set
    # above.  Verified locally hash-green at all three shipped SFs.
    "doc_lang_classifier": doc_lang_classifier,
    # --- newest record r17 — the r20 rotation set (49 after the
    # doc_contamination retirement).  r19 must spend its 4 remaining
    # free slots (after the doc_lang_classifier holdback publishes) as
    # EARLY REFRESHES of entries below — the expensive iterative ones
    # first: graph_kcore_max, graph_pagerank_mass,
    # graph_triangles_parts, graph_kcore_sound — so r20 lands 45
    # must-rotate + 5 free instead of 49 + 1 ---
    "emb_semdedup_incremental_sound": emb_semdedup_incremental_sound,
    "asof_events_orders": R.asof_events_orders,
    "bgp_agg_top_urgent_nations": bgp_agg_top_urgent_nations,
    "bgp_ask_segment": bgp_ask_segment,
    "bgp_bind_term_functions": bgp_bind_term_functions,
    "bgp_merge_count": bgp_merge_count,
    "bgp_minus_machinery_asia": bgp_minus_machinery_asia,
    "bgp_path_inv_region_members": bgp_path_inv_region_members,
    "bgp_path_negset_links": bgp_path_negset_links,
    "bgp_path_zom_region": bgp_path_zom_region,
    "bgp_path_zoo_nation": bgp_path_zoo_nation,
    "cube_priority_status": R.cube_priority_status,
    "doc_bpe_pretokens": doc_bpe_pretokens,
    # doc_contamination RETIRED r18 (funding the promoted
    # doc_lang_classifier oracle): the promoted doc_contamination_bloom
    # runs BOTH arms and hash-checks the exact side's per-doc
    # (n_grams, contaminated_grams) under the same oracle CTEs; the
    # only dropped column is the 6dp ratio, a row-local derivation
    # round(contaminated_grams / n_grams, 6) — identity computed in
    # test_joins.py::test_retired_entry_equivalences_r18
    "doc_dedup_paragraphs": doc_dedup_paragraphs,
    "doc_dsir_weights": doc_dsir_weights,
    # doc_fingerprint RETIRED r15 (funding doc_winnow_planted): its
    # md5(normalized text) values stay EXPOSED per group in the
    # still-backed dedup_exact_docs; identity computed in
    # test_joins.py::test_retired_entry_equivalences_r15
    "doc_strip_html": doc_strip_html,
    "doc_text_quality": doc_text_quality,
    "doc_token_windows": doc_token_windows,
    "emb_range_search": emb_range_search,
    "events_funnel": R.events_funnel,
    "events_json_stats": R.events_json_stats,
    "events_salted_enrich": R.events_salted_enrich,
    "events_sessionize_native": R.events_sessionize_native,
    "events_transition_matrix": R.events_transition_matrix,
    "graph_shortest_weighted": graph_shortest_weighted,
    "orders_by_month": R.orders_by_month,
    "pivot_priority_by_segment": R.pivot_priority_by_segment,
    "q12_late_shipments": R.q12_late_shipments,
    "q22_idle_customers": R.q22_idle_customers,
    "q2_min_cost_supplier": R.q2_min_cost_supplier,
    "q3_top_revenue": R.q3_top_unshipped_revenue,
    "q4_order_priority": R.q4_order_priority,
    "q5_nation_revenue": R.q5_nation_revenue,
    "q6_forecast_revenue": R.q6_forecast_revenue,
    "q7_volume_shipping": R.q7_volume_shipping,
    "rollup_nation_segment": R.rollup_nation_segment,
    "running_customer_spend": R.running_customer_spend,
    "segment_quantiles": R.segment_quantiles,
    "segment_stats": R.segment_stats,
    "topk_orders_per_customer": R.topk_orders_per_customer,
    "bgp_customers_in_region": bgp_customers_in_region,
    "bgp_nations_values": bgp_nations_values,
    "bgp_filter_customer_names": bgp_filter_customer_names,
    "q10_returned_items": R.q10_returned_items,
    "graph_kcore_max": graph_kcore_max,
    "graph_pagerank_mass": graph_pagerank_mass,
    "graph_triangles_parts": graph_triangles_parts,
    "graph_kcore_sound": graph_kcore_sound,
    "doc_video_mjpeg": doc_video_mjpeg,
    # --- rows-only by design (no oracle; pytest-pinned, with derived-invariant twins recorded above): parked last ---
    "dedup_incremental_simhash": dedup_incremental_simhash,
    "emb_pq_topk": emb_pq_topk,
    "emb_ivfpq_topk": emb_ivfpq_topk,
    "emb_semdedup": emb_semdedup,
    "dedup_incremental": dedup_incremental,
    "doc_cdc_chunks": doc_cdc_chunks,
    "doc_dup_spans": doc_dup_spans,
    "doc_winnow_pairs": doc_winnow_pairs,
    "doc_image_phash": doc_image_phash,
    "doc_video_near_dup": doc_video_near_dup,
    "doc_audio_near_dup": doc_audio_near_dup,
    "graph_pagerank_urgent": graph_pagerank_urgent,
    "doc_sketch_stats": doc_sketch_stats,
    "doc_minhash_lsh": doc_minhash_lsh,
    "doc_simhash": doc_simhash,
    "doc_simhash_pairs": doc_simhash_pairs,
    "dedup_near_lsh": dedup_near_lsh,
    "emb_lsh_topk": emb_lsh_topk,
    "emb_ivf_topk": emb_ivf_topk,
    "emb_dup_pairs_lsh": emb_dup_pairs_lsh,
    "emb_semdedup_incremental": emb_semdedup_incremental,
}

# entries whose ORACLES row exists (and is verified locally by
# tools/check_oracle.py) but is withheld from the driver's oracle_sql()
# until a correctness-window slot frees up.  r18: doc_lang_classifier
# (promoted rows-only -> oracle-backed, verdict ask #3; hash-green
# locally at all three shipped SFs) is held back because the r18
# window is full — 44 must-rotate + 5 named early refreshes + the
# promoted doc_contamination_bloom in the retirement-freed slot.  It
# publishes at the head of the r19 window (45 must-rotate + holdback
# + 4 free).  Previous uses: four r11 holdbacks published with r12's
# rotation; three r14 ones with r15's.
# tools/registry_audit.py (r10 advice) treats any holdback as
# oracle-backed — warning the round it appears and FAILING if it
# persists past its declaration round unpublished
# (ORACLE_HOLDBACK_SINCE records the round each holdback was declared).
ORACLE_HOLDBACK: set[str] = {"doc_lang_classifier"}
ORACLE_HOLDBACK_SINCE: dict[str, int] = {"doc_lang_classifier": 18}

_EN = "'the','a','and','of','to','in','is','that','it','for'"
_ES = "'el','la','de','que','y','en','un','es','no','por'"
_FR = "'le','la','de','et','un','est','que','pour','dans','ce'"

_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _jaccard_pairs_ctes(cap: int, threshold: float) -> str:
    """CTE chain ending in ``pairs(doc_a, doc_b, jaccard)`` — the DuckDB
    twin of ``operators.dedup.ngram_jaccard_pairs`` (trigrams, document-
    frequency cap applied before the self-join, sizes post-cap)."""
    return f"""toks AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents
        ), sh0 AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(range(greatest(len(t) - 2, 0)),
                                             i -> array_to_string(t[i + 1 : i + 3], ' '))) AS shingle
                FROM toks WHERE len(t) >= 3
            )
        ), rare AS (
            SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {cap}
        ), sh AS (
            SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN rare USING (shingle)
        ), sizes AS (
            SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT doc_a, doc_b,
                   round(i / (sa.sz + sb.sz - i), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(i / (sa.sz + sb.sz - i), 4) >= {threshold}
        )"""

# thresholds routed through rate_threshold_hex so both engines compare
# against the identical hex literal (see doc_sample_hash's caveat)
_MIXTURE_ORACLE = f"""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) <
          CASE source
               WHEN 'src0' THEN '{T.rate_threshold_hex(1.0)}'
               WHEN 'src1' THEN '{T.rate_threshold_hex(0.25)}'
               WHEN 'src2' THEN '{T.rate_threshold_hex(0.0)}'
               ELSE '{T.rate_threshold_hex(0.5)}'
          END
"""

# r15 (doc_temperature_mixture): the md5 draw's first 13 hex digits as
# a 52-bit integer — exactly representable in a double, so comparing it
# against rate * 2^52 (a power-of-two scaling, exact given the rate) is
# equivalent to the Spark side's full-width md5 < rate_threshold_hex(r)
# string comparison except when a draw ties the threshold's 52-bit
# prefix (P ~ n * 2^-52; verified absent at every shipped SF)
_MD5_PREFIX52 = " + ".join(
    "(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), "
    f"{i + 1}, 1)) - 1) * {16 ** (12 - i)}"
    for i in range(13)
)

_TEMP_MIXTURE_ORACLE = f"""
    WITH counts AS (
        SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS n
        FROM documents GROUP BY lang
    ), rates AS (
        SELECT lang,
               pow(n, -0.5) / (SELECT max(pow(n, -0.5)) FROM counts) AS r
        FROM counts
    )
    SELECT d.doc_id, d.lang FROM documents d JOIN rates USING (lang)
    WHERE ({_MD5_PREFIX52}) < r * 4503599627370496.0
"""

ORACLES = {
    "bgp_agg_customers_by_region": """
        SELECT r_name AS rname,
               count(*) AS n_customers,
               count(DISTINCT c_mktsegment) AS n_segments,
               string_agg(DISTINCT nm, ',' ORDER BY nm) AS nations
        FROM (
            SELECT r_name, c_mktsegment, n_name AS nm
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        )
        GROUP BY 1
    """,
    "bgp_agg_urgent_orders_by_nation": """
        SELECT n_name AS nname,
               count(*) AS n_orders,
               sum(CAST(o_orderkey AS DOUBLE)) AS sum_keys,
               round(avg(CAST(o_orderkey AS DOUBLE)), 4) AS avg_key,
               CAST(max(o_orderkey) AS DOUBLE) AS max_key
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1
    """,
    "events_transition_matrix": """
        WITH seq AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS next_type
            FROM events
        ), mat AS (
            SELECT event_type, next_type, count(*) AS n
            FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT event_type, next_type, n,
               round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 6) AS p_next
        FROM mat ORDER BY 1, 2
    """,
    "events_salted_enrich": """
        SELECT c_mktsegment, event_type, count(*) AS n
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "doc_bpe_pretokens": """
        SELECT doc_id,
               CAST(len(list_filter(
                   regexp_extract_all(text, ' ?[A-Za-z'']+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+|\\s+'),
                   x -> NOT regexp_matches(x, '^\\s+$')
               )) AS BIGINT) AS n_pretokens,
               CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars
        FROM documents
    """,
    "doc_token_windows": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ), wins AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(CAST(ceil(len(t) / 8.0) AS BIGINT)),
                       i -> {'win_idx': i,
                             'n_tokens': len(t[i * 8 + 1 : i * 8 + 16]),
                             'text': array_to_string(t[i * 8 + 1 : i * 8 + 16], ' ')}
                   ), recursive := true)
            FROM toks WHERE len(t) >= 1
        )
        SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
               CAST(n_tokens AS BIGINT) AS n_tokens, text
        FROM wins
    """,
    "doc_dsir_weights": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x <> '') AS t
            FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_concat(t,
                          list_transform(range(len(t) - 1),
                                         i -> t[i + 1] || ' ' || t[i + 2]))) AS gram
            FROM toks WHERE len(t) >= 1
        ), pdg AS (
            SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
        ), gs AS (
            SELECT gram, sum(c) AS cs,
                   sum(CASE WHEN doc_id % 50 = 0 THEN c ELSE 0 END) AS ct
            FROM pdg GROUP BY 1
        ), tot AS (
            SELECT sum(cs) AS Ts, sum(ct) AS Tt, count(*) AS V FROM gs
        ), llr AS (
            SELECT gram,
                   ln((ct + 1.0) / (Tt + 1.0 * V))
                   - ln((cs + 1.0) / (Ts + 1.0 * V)) AS llr
            FROM gs, tot
        ), scored AS (
            SELECT doc_id, sum(c) AS n_feats,
                   round(sum(c * llr), 4) AS logw
            FROM pdg JOIN llr USING (gram) GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats,
               coalesce(logw, 0.0) AS logw
        FROM documents d LEFT JOIN scored USING (doc_id)
    """,
    "bgp_minus_machinery_asia": """
        SELECT c_name AS cname FROM customer
        WHERE c_mktsegment = 'MACHINERY'
        EXCEPT
        SELECT c_name FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_mktsegment = 'MACHINERY' AND r_name = 'ASIA'
    """,
    "bgp_describe_nation": """
        SELECT 'nation:3' AS s, 'name' AS p, n_name AS o
        FROM nation WHERE n_nationkey = 3
        UNION ALL
        SELECT 'nation:3', 'region', 'region:' || n_regionkey
        FROM nation WHERE n_nationkey = 3
        UNION ALL
        SELECT 'customer:' || c_custkey, 'nation', 'nation:3'
        FROM customer WHERE c_nationkey = 3
        UNION ALL
        SELECT 'supplier:' || s_suppkey, 'nation', 'nation:3'
        FROM supplier WHERE s_nationkey = 3
    """,
    "graph_components_nations": """
        WITH RECURSIVE e AS (
            SELECT n_nationkey AS src,
                   lead(n_nationkey) OVER (PARTITION BY n_regionkey
                                           ORDER BY n_nationkey) AS dst
            FROM nation
        ), ed AS (
            SELECT src, dst FROM e WHERE dst IS NOT NULL
        ), und AS (
            SELECT src, dst FROM ed UNION SELECT dst, src FROM ed
        ), reach(a, b) AS (
            SELECT src, dst FROM und
            UNION
            SELECT r.a, u.dst FROM reach r JOIN und u ON u.src = r.b
        ), nodes AS (
            SELECT DISTINCT src AS n FROM und
        )
        SELECT CAST(n AS BIGINT) AS id,
               CAST(least(n, min(b)) AS BIGINT) AS component
        FROM nodes JOIN reach ON a = n GROUP BY n
    """,
    "bgp_values_rows_pairs": """
        SELECT c_name AS cname FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE (r_name = 'EUROPE' AND c_mktsegment = 'BUILDING')
           OR (r_name = 'ASIA' AND c_mktsegment = 'MACHINERY')
           OR r_name = 'AFRICA'
    """,
    "bgp_exists_repeat_customers": """
        SELECT c_name AS cname FROM customer
        WHERE c_mktsegment = 'AUTOMOBILE'
          AND EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    "bgp_subquery_busy_nations": """
        SELECT n_name AS nname, CAST(cnt AS BIGINT) AS cnt FROM (
            SELECT c_nationkey AS nk, count(*) AS cnt
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY 1
        ) JOIN nation ON nk = n_nationkey
        WHERE cnt >= 50
    """,
    "bgp_select_top_names": """
        SELECT c_name AS cname FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        ORDER BY c_name DESC LIMIT 12 OFFSET 3
    """,
    "doc_chunk_packing": """
        WITH toks AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                   x -> x <> '')) AS n
            FROM documents
        ), pos AS (
            SELECT doc_id, n,
                   CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS off
            FROM toks WHERE n > 0
        ), spans AS (
            SELECT doc_id, n, off,
                   unnest(range(off // 64, (off + n - 1) // 64 + 1)) AS chunk_id
            FROM pos
        )
        SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
               CAST(greatest(0, chunk_id * 64 - off) AS BIGINT) AS tok_start,
               CAST(least(n, (chunk_id + 1) * 64 - off) AS BIGINT) AS tok_end
        FROM spans
    """,
    "doc_strip_html": """
        SELECT doc_id,
               trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')) AS text
        FROM documents
    """,
    "doc_dedup_paragraphs": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ), built AS (
            SELECT doc_id,
                   array_to_string(list_transform(
                       range(CAST(ceil(len(t) / 10.0) AS BIGINT)),
                       i -> array_to_string(t[i * 10 + 1 : i * 10 + 10], ' ')
                   ), chr(10) || chr(10)) AS text
            FROM toks
        ), split AS (
            SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
            FROM built
        ), paras AS (
            SELECT doc_id, u.idx AS idx, u.para AS para
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(len(ps)),
                              i -> {'idx': i, 'para': ps[i + 1]})) AS u
                FROM split
            )
        ), elig AS (
            SELECT doc_id, idx, para,
                   row_number() OVER (PARTITION BY para
                                      ORDER BY doc_id, idx) AS rn
            FROM paras WHERE length(trim(para)) >= 1
        ), kept AS (
            SELECT doc_id, idx, para FROM elig WHERE rn = 1
            UNION ALL
            SELECT doc_id, idx, para FROM paras WHERE length(trim(para)) < 1
        ), agg AS (
            SELECT doc_id,
                   string_agg(para, chr(10) || chr(10) ORDER BY idx) AS text,
                   count(*) AS n_kept
            FROM kept GROUP BY 1
        ), tot AS (
            SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_paras FROM split
        )
        SELECT t.doc_id, coalesce(a.text, '') AS text, t.n_paras,
               CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept
        FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
    "bgp_bind_term_functions": """
        SELECT c_name AS cname,
               CAST(length(c_name) AS BIGINT) AS name_len,
               upper(substr(c_name, 1, 3)) AS prefix3
        FROM customer
        WHERE c_mktsegment = 'AUTOMOBILE' AND c_name LIKE '%1'
    """,
    "bgp_agg_top_urgent_nations": """
        SELECT n_name AS nname, count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1
        ORDER BY n_orders DESC, nname
        LIMIT 5
    """,
    "doc_mixture_sample": _MIXTURE_ORACLE,
    "doc_temperature_mixture": _TEMP_MIXTURE_ORACLE,
    "doc_strip_dup_ngrams": """
        WITH base AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS raw,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS lc
            FROM documents
        ), occg AS (
            SELECT doc_id, start, array_to_string(lc[start + 1 : start + 5], ' ') AS gram
            FROM (
                SELECT doc_id, unnest(range(len(lc) - 4)) AS start, lc
                FROM base WHERE len(lc) >= 5
            )
        ), marked AS (
            SELECT doc_id, start,
                   count(*) OVER (PARTITION BY gram) AS c,
                   row_number() OVER (PARTITION BY gram ORDER BY doc_id, start) AS rn
            FROM occg
        ), covered AS (
            SELECT DISTINCT doc_id, pos FROM (
                SELECT doc_id, unnest(range(start, start + 5)) AS pos
                FROM marked WHERE c > 1 AND rn > 1
            )
        ), toks AS (
            SELECT doc_id, pos, raw[pos + 1] AS tok FROM (
                SELECT doc_id, unnest(range(len(raw))) AS pos, raw FROM base
            )
        ), kept AS (
            SELECT t.doc_id, t.pos, t.tok
            FROM toks t LEFT JOIN covered c
              ON t.doc_id = c.doc_id AND t.pos = c.pos
            WHERE c.pos IS NULL
        ), rebuilt AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
            FROM kept GROUP BY 1
        )
        SELECT d.doc_id, coalesce(r.text, '') AS text
        FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
    "doc_pipeline_curate": f"""
        WITH q AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       len({_TOKS}) AS n_tokens,
                       round(length(text) / len({_TOKS}), 4) AS avg_token_len,
                       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text), 4) AS punct_ratio,
                       round(len(list_filter({_TOKS}, x -> lower(x) IN ({_EN}))) / len({_TOKS}), 4) AS stopword_ratio
                FROM documents
            )
            WHERE n_tokens >= 40 AND avg_token_len <= 12.0
              AND punct_ratio <= 0.1 AND stopword_ratio >= 0.01
        ), keepers AS (
            SELECT min(doc_id) AS doc_id FROM (
                SELECT doc_id, md5({_NORM}) AS fp FROM q
            ) GROUP BY fp
        ), d_surv AS (
            SELECT q.* FROM q JOIN keepers USING (doc_id)
        ), ptoks AS (
            SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents WHERE doc_id % 50 = 0
        ), pg AS (
            SELECT DISTINCT unnest(list_transform(range(len(t) - 7),
                   i -> array_to_string(t[i + 1 : i + 8], ' '))) AS gram
            FROM ptoks WHERE len(t) >= 8
        ), dg AS (
            SELECT doc_id, unnest(list_transform(range(len(t) - 7),
                   i -> array_to_string(t[i + 1 : i + 8], ' '))) AS gram
            FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                  FROM d_surv) WHERE len(t) >= 8
        ), cont AS (
            SELECT doc_id FROM (
                SELECT doc_id, count(*) AS n_grams,
                       sum(CASE WHEN pg.gram IS NOT NULL THEN 1 ELSE 0 END) AS hit
                FROM dg LEFT JOIN pg USING (gram) GROUP BY 1
            ) WHERE n_grams > 0 AND hit * 1.0 / n_grams > 0.5
        )
        SELECT d.doc_id,
               CASE WHEN q.doc_id IS NULL THEN 'quality'
                    WHEN keepers.doc_id IS NULL THEN 'duplicate'
                    WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
                    ELSE 'kept' END AS status
        FROM documents d
        LEFT JOIN q ON d.doc_id = q.doc_id
        LEFT JOIN keepers ON d.doc_id = keepers.doc_id
        LEFT JOIN cont ON d.doc_id = cont.doc_id
    """,
    "doc_pipeline_pack": f"""
        WITH q AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       len({_TOKS}) AS n_tokens,
                       round(length(text) / len({_TOKS}), 4) AS avg_token_len,
                       round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text), 4) AS punct_ratio,
                       round(len(list_filter({_TOKS}, x -> lower(x) IN ({_EN}))) / len({_TOKS}), 4) AS stopword_ratio
                FROM documents
            )
            WHERE n_tokens >= 40 AND avg_token_len <= 12.0
              AND punct_ratio <= 0.1 AND stopword_ratio >= 0.01
        ), keepers AS (
            SELECT min(doc_id) AS doc_id FROM (
                SELECT doc_id, md5({_NORM}) AS fp FROM q
            ) GROUP BY fp
        ), d_surv AS (
            SELECT q.* FROM q JOIN keepers USING (doc_id)
        ), ptoks AS (
            SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents WHERE doc_id % 50 = 0
        ), pg AS (
            SELECT DISTINCT unnest(list_transform(range(len(t) - 7),
                   i -> array_to_string(t[i + 1 : i + 8], ' '))) AS gram
            FROM ptoks WHERE len(t) >= 8
        ), dg AS (
            SELECT doc_id, unnest(list_transform(range(len(t) - 7),
                   i -> array_to_string(t[i + 1 : i + 8], ' '))) AS gram
            FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                  FROM d_surv) WHERE len(t) >= 8
        ), cont AS (
            SELECT doc_id FROM (
                SELECT doc_id, count(*) AS n_grams,
                       sum(CASE WHEN pg.gram IS NOT NULL THEN 1 ELSE 0 END) AS hit
                FROM dg LEFT JOIN pg USING (gram) GROUP BY 1
            ) WHERE n_grams > 0 AND hit * 1.0 / n_grams > 0.5
        ), kept AS (
            SELECT d_surv.doc_id, d_surv.text FROM d_surv
            LEFT JOIN cont ON d_surv.doc_id = cont.doc_id
            WHERE cont.doc_id IS NULL
        ), ktoks AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                   x -> x <> '')) AS n
            FROM kept
        ), pos AS (
            SELECT doc_id, n,
                   CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS off
            FROM ktoks WHERE n > 0
        ), spans AS (
            SELECT doc_id, n, off,
                   unnest(range(off // 64, (off + n - 1) // 64 + 1)) AS chunk_id
            FROM pos
        )
        SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
               CAST(greatest(0, chunk_id * 64 - off) AS BIGINT) AS tok_start,
               CAST(least(n, (chunk_id + 1) * 64 - off) AS BIGINT) AS tok_end
        FROM spans
    """,
    "doc_normalize_nfc": """
        SELECT doc_id, nfc_normalize(coalesce(text, '')) AS text FROM documents
    """,
    # doc_contamination RETIRED r18: the exact per-doc gram counts are
    # replayed under doc_contamination_bloom's oracle (same CTEs); the
    # 6dp ratio is a row-local derivation pinned in
    # test_joins.py::test_retired_entry_equivalences_r18
    # r18 (verdict ask #2): the bloom sound twin — the exact side's
    # per-doc gram counts replayed in SQL, the two soundness booleans
    # pinned true (superset-of-exact by Bloom construction; corpus
    # fp excess within 5x the configured 1% fpp, calibrated per
    # shipped SF in test_cap_calibration.py)
    "doc_contamination_bloom": """
        WITH ptoks AS (
            SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents WHERE doc_id % 50 = 0
        ), pg AS (
            SELECT DISTINCT unnest(list_transform(range(len(t) - 7),
                   i -> array_to_string(t[i + 1 : i + 8], ' '))) AS gram
            FROM ptoks WHERE len(t) >= 8
        ), dtoks AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents
        ), dg AS (
            SELECT doc_id, unnest(list_transform(range(len(t) - 7),
                   i -> array_to_string(t[i + 1 : i + 8], ' '))) AS gram
            FROM dtoks WHERE len(t) >= 8
        ), per AS (
            SELECT doc_id, count(*) AS n_grams,
                   sum(CASE WHEN pg.gram IS NOT NULL THEN 1 ELSE 0 END) AS contaminated_grams
            FROM dg LEFT JOIN pg USING (gram) GROUP BY 1
        )
        SELECT d.doc_id,
               coalesce(n_grams, 0) AS n_grams,
               CAST(coalesce(contaminated_grams, 0) AS BIGINT) AS contaminated_grams,
               TRUE AS superset_ok,
               TRUE AS fp_env_ok
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    # doc_unigram_logloss RETIRED r15 (funding doc_temperature_mixture):
    # unigram_logloss == bigram_logloss(alpha=0) exactly (every real
    # token is one bigram position's predicted word; same tokenization,
    # same rollup) — the identity is computed in
    # test_joins.py::test_retired_entry_equivalences_r15, and the
    # unigram rates stay oracle-backed inside doc_bigram_logloss's
    # interpolated term, which enters every scored probability.
    "q8_market_share": """
        WITH vols AS (
            SELECT year(o_orderdate) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                     / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
        FROM vols GROUP BY 1 ORDER BY 1
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, year(l_shipdate) AS o_year,
               round(CAST(sum(
                   CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                   - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.6 AS DECIMAL(3,2))
                     * CAST(l_quantity AS DECIMAL(12,2))
               ) AS DOUBLE), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q11_part_value": """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value_dec
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
            GROUP BY 1
        ), total AS (SELECT sum(value_dec) AS total_dec FROM per_part)
        SELECT l_partkey AS p_partkey, CAST(value_dec AS DOUBLE) AS part_value
        FROM per_part, total
        WHERE CAST(value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.001
        ORDER BY part_value DESC, p_partkey
    """,
    "q12_late_shipments": """
        SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 120
                    THEN '60-119' ELSE '120+' END AS delay_bucket,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND datediff('day', o_orderdate, l_shipdate) >= 60
        GROUP BY 1 ORDER BY 1
    """,
    "q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders ON c_custkey = o_custkey
                 AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY 1
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY 1
        ORDER BY custdist DESC, c_count DESC
    """,
    "q14_promo_revenue": """
        SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name, CAST(total_dec AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_dec = (SELECT max(total_dec) FROM rev)
        ORDER BY s_suppkey
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_size IN (1, 5, 10, 15, 20, 25)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_qty_revenue": """
        WITH lp AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#3'
        ), withavg AS (
            SELECT *, avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty FROM lp
        )
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
        FROM withavg WHERE l_quantity < 0.2 * avg_qty
    """,
    "q18_large_volume_customers": """
        WITH big AS (
            SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
            FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
        )
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               CAST(qty_dec AS DOUBLE) AS sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "q19_disjunctive_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30 AND l_quantity BETWEEN 20 AND 40)
    """,
    "q20_excess_suppliers": """
        WITH per_pair AS (
            SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS pair_qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        ), per_part AS (
            SELECT l_partkey, sum(pair_qty) AS part_qty FROM per_pair GROUP BY 1
        ), dominant AS (
            SELECT DISTINCT l_suppkey
            FROM per_pair JOIN per_part USING (l_partkey)
            WHERE CAST(pair_qty AS DOUBLE) > CAST(part_qty AS DOUBLE) * 0.5
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
        ORDER BY s_suppkey
    """,
    "q21_waiting_suppliers": """
        WITH li AS (
            SELECT l_orderkey, l_suppkey, l_returnflag
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ), per_order AS (
            SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp
            FROM li GROUP BY 1
        ), returned AS (
            SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE l_returnflag = 'R'
        )
        SELECT s_name, numwait FROM (
            SELECT l_suppkey, count(*) AS numwait
            FROM returned JOIN per_order USING (l_orderkey)
            WHERE n_supp >= 2 AND n_ret_supp = 1
            GROUP BY 1
        ) JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY numwait DESC, s_name LIMIT 20
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY 1 ORDER BY 1
    """,
    "q22_idle_customers": """
        WITH pos AS (SELECT * FROM customer WHERE c_acctbal > 0.0),
             bal AS (SELECT avg(c_acctbal) AS ab FROM pos)
        SELECT c_mktsegment, count(*) AS n_custs,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM pos, bal
        WHERE c_acctbal > ab
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY 1 ORDER BY 1
    """,
    "q2_min_cost_supplier": """
        WITH offers AS (
            SELECT p_partkey, p_name, l_suppkey,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        / CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS unit_price
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#1'
        ), best AS (
            SELECT *, min(unit_price) OVER (PARTITION BY p_partkey) AS min_price
            FROM offers
        )
        SELECT DISTINCT p_partkey, p_name, s_name AS supplier,
               CAST(unit_price AS DOUBLE) AS unit_price
        FROM best JOIN supplier ON l_suppkey = s_suppkey
        WHERE unit_price = min_price
        ORDER BY p_partkey, supplier
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS ship_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
               round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_top_revenue": """
        SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_nation_revenue": """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "topk_orders_per_customer": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rank
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders
        )
        WHERE rank <= 3
    """,
    "running_customer_spend": """
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
        FROM orders
    """,
    "orders_by_month": """
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    "segment_stats": """
        SELECT c_mktsegment, count(*) AS n_customers,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_acctbal
        FROM customer GROUP BY 1 ORDER BY 1
    """,
    "events_hourly": """
        SELECT (CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) % 3600) AS hour_epoch,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "events_sessionize_native": """
        WITH e AS (
            SELECT user_id, value, epoch_us(ts) AS ts_us FROM events
        ), marked AS (
            SELECT user_id, value, ts_us,
                   CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL THEN 1
                        WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) >= 1800000000 THEN 1
                        ELSE 0 END AS new_sess
            FROM e
        ), sess AS (
            SELECT user_id, value, ts_us,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sidx
            FROM marked
        )
        SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
        FROM sess GROUP BY user_id, sidx
        ORDER BY user_id, session_start_us
    """,
    "bgp_construct_region_graph": """
        SELECT DISTINCT 'customer:' || c_custkey AS subj, r_name AS region_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "bgp_filter_customer_names": """
        SELECT c_name AS cname
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' AND c_name > 'Customer#000001000'
    """,
    "bgp_not_exists_unurgent": """
        SELECT c_name AS cname
        FROM customer c
        WHERE c.c_mktsegment = 'BUILDING'
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
          )
    """,
    "bgp_bind_segment_prefix": """
        SELECT c_name AS cname, substr(c_mktsegment, 1, 3) AS seg_prefix
        FROM customer
    """,
    "bgp_path_inv_region_members": """
        SELECT c_name AS ename
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        UNION ALL
        SELECT s_name AS ename
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    """,
    "bgp_path_zom_region": """
        WITH nodes AS (
            SELECT 'customer:' || c_custkey AS n FROM customer
            UNION SELECT 'supplier:' || s_suppkey FROM supplier
            UNION SELECT 'nation:' || n_nationkey FROM nation
            UNION SELECT 'region:' || r_regionkey FROM region
            UNION SELECT c_name FROM customer
            UNION SELECT s_name FROM supplier
            UNION SELECT n_name FROM nation
            UNION SELECT r_name FROM region
            UNION SELECT c_mktsegment FROM customer
        )
        SELECT n AS src, n AS dst FROM nodes
        UNION
        SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
    """,
    "bgp_path_zoo_nation": """
        SELECT 'customer:' || c_custkey AS src,
               'customer:' || c_custkey AS dst
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT 'customer:' || c_custkey, 'nation:' || c_nationkey
        FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "bgp_path_negset_links": """
        SELECT 'customer:' || c_custkey AS src,
               'nation:' || c_nationkey AS dst
        FROM customer
        UNION
        SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
        UNION
        SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
    """,
    "graph_shortest_urgent": """
        WITH RECURSIVE edges AS (
            SELECT 'order:' || o_orderkey AS src, 'customer:' || o_custkey AS dst
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'customer:' || c_custkey, 'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
        ), walk(src, dst, d) AS (
            SELECT src, dst, 1 FROM edges
            UNION ALL
            SELECT w.src, e.dst, w.d + 1
            FROM walk w JOIN edges e ON w.dst = e.src
            WHERE w.d < 6
        )
        SELECT src, dst, min(d) AS dist FROM walk GROUP BY 1, 2
    """,
    "graph_distances_from_seed": """
        WITH RECURSIVE edges AS (
            SELECT 'order:' || o_orderkey AS src, 'customer:' || o_custkey AS dst
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'customer:' || c_custkey, 'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
        ), walk(n, d) AS (
            SELECT src, 1 FROM edges WHERE dst = 'region:1'
            UNION ALL
            SELECT e.src, w.d + 1 FROM walk w JOIN edges e ON e.dst = w.n
            WHERE w.d < 8
        )
        SELECT n AS src, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY 1
    """,
    "bgp_path_from_seed": """
        WITH RECURSIVE edges AS (
            SELECT 'order:' || o_orderkey AS src, 'customer:' || o_custkey AS dst
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'customer:' || c_custkey, 'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
        ), reach(src) AS (
            SELECT src FROM edges WHERE dst = 'region:1'
            UNION
            SELECT e.src FROM reach r JOIN edges e ON e.dst = r.src
        )
        SELECT src FROM reach
    """,
    "bgp_path_from_selective_var": """
        WITH RECURSIVE edges AS (
            SELECT 'order:' || o_orderkey AS src, 'customer:' || o_custkey AS dst
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'customer:' || c_custkey, 'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
        ), seedr AS (
            SELECT 'region:' || r_regionkey AS node FROM region
            WHERE r_name = 'AMERICA'
        ), reach(src) AS (
            SELECT e.src FROM edges e JOIN seedr s ON e.dst = s.node
            UNION
            SELECT e.src FROM reach r JOIN edges e ON e.dst = r.src
        )
        SELECT src FROM reach
    """,
    "bgp_path_reach_urgent": """
        WITH RECURSIVE edges AS (
            SELECT 'order:' || o_orderkey AS src, 'customer:' || o_custkey AS dst
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'customer:' || c_custkey, 'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
        ), reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src, dst FROM reach
    """,
    "graph_closure_nations": """
        WITH RECURSIVE edges AS (
            SELECT a.n_nationkey AS src, b.n_nationkey AS dst
            FROM nation a JOIN nation b ON b.n_nationkey = a.n_nationkey + 1
        ), reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT reach.src, e.dst FROM reach JOIN edges e ON reach.dst = e.src
        )
        SELECT src, dst FROM reach ORDER BY src, dst
    """,
    "segment_quantiles": """
        SELECT c_mktsegment,
               round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
               round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
               round(quantile_cont(c_acctbal, 0.9), 4) AS p90
        FROM customer GROUP BY 1 ORDER BY 1
    """,
    "cube_priority_status": """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ORDER BY 1, 2
    """,
    "rollup_nation_segment": """
        SELECT n_name, c_mktsegment, count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, c_mktsegment)
        ORDER BY n_name, c_mktsegment
    """,
    "nation_set_ops": """
        WITH cn AS (
            SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        ), sn AS (
            SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        )
        SELECT 'both' AS op, n_name FROM (SELECT n_name FROM cn INTERSECT SELECT n_name FROM sn)
        UNION ALL
        SELECT 'cust_only', n_name FROM (SELECT n_name FROM cn EXCEPT SELECT n_name FROM sn)
        UNION ALL
        SELECT 'any', n_name FROM (SELECT n_name FROM cn UNION SELECT n_name FROM sn)
        ORDER BY op, n_name
    """,
    "events_value_outliers": """
        WITH stats AS (
            SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
            FROM events GROUP BY 1
        )
        SELECT event_id, e.event_type,
               round((value - mu) / sigma, 4) AS zscore
        FROM events e JOIN stats USING (event_type)
        WHERE sigma > 0 AND abs(round((value - mu) / sigma, 4)) > 3.0
        ORDER BY event_id
    """,
    "range_events_clicks": """
        SELECT c.event_id, c.user_id, p.event_id AS purchase_id
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND c.ts >= p.ts - INTERVAL 1 HOUR
         AND c.ts <  p.ts
        ORDER BY c.event_id, purchase_id
    """,
    "events_json_stats": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               round(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                     / count(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
               max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "pivot_priority_by_segment": """
        SELECT c_mktsegment,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
               CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
               CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
               CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS notspec,
               CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1
    """,
    "cohort_retention": """
        WITH first AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort_start
            FROM events GROUP BY 1
        )
        SELECT strftime(cohort_start, '%Y-%m-%d') AS cohort_week,
               CAST(floor(datediff('day', CAST(cohort_start AS DATE), CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM events e JOIN first USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "asof_events_orders_forward": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, o_orderkey FROM (
                SELECT o_custkey, o_orderdate, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                          ORDER BY o_orderkey) AS rn
                FROM orders
            ) WHERE rn = 1
        )
        SELECT e.event_id, e.user_id, o.o_orderkey AS okey
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        ORDER BY e.event_id
    """,
    "asof_events_orders": """
        WITH o AS (
            SELECT o_custkey, o_orderdate, o_orderkey FROM (
                SELECT o_custkey, o_orderdate, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                          ORDER BY o_orderkey DESC) AS rn
                FROM orders
            ) WHERE rn = 1
        )
        SELECT e.event_id, e.user_id, o.o_orderkey AS okey
        FROM events e
        ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id
    """,
    "bgp_customers_in_region": """
        SELECT c_name AS cname
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    """,
    "bgp_nations_values": """
        SELECT n_name AS nname
        FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'AFRICA')
    """,
    "bgp_optional_urgent_orders": """
        SELECT c_name AS cname, o.o_orderkey AS okey
        FROM customer c
        LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
               ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
    """,
    "bgp_ask_segment": """
        SELECT EXISTS(SELECT 1 FROM customer WHERE c_mktsegment = 'BUILDING') AS found,
               EXISTS(SELECT 1 FROM customer WHERE c_mktsegment = 'NO-SUCH-SEGMENT') AS not_found
    """,
    "bgp_merge_count": """
        SELECT count(*) AS n_triples FROM (
            SELECT 'nation:' || n_nationkey AS s, 'name' AS p, n_name AS o FROM nation
            UNION
            SELECT 'region:' || r_regionkey, 'name', r_name FROM region
            UNION
            SELECT 'nation:' || n_nationkey, 'region', 'region:' || n_regionkey FROM nation
        )
    """,
    "dedup_exact_docs": f"""
        SELECT md5({_NORM}) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    # doc_fingerprint RETIRED r15 (funding doc_winnow_planted): its
    # oracle was the per-doc md5(normalized text) value, which
    # dedup_exact_docs (above) still EXPOSES per group over the same
    # normalization chain — dedup_exact(docs) is byte-identical to
    # fingerprint(docs).groupBy(fp).agg(min, count); computed in
    # test_joins.py::test_retired_entry_equivalences_r15.
    "doc_text_quality": f"""
        SELECT doc_id,
               length(text) AS n_chars,
               len({_TOKS}) AS n_tokens,
               round(length(text) / len({_TOKS}), 4) AS avg_token_len,
               round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text), 4) AS punct_ratio,
               round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) / length(text), 4) AS upper_ratio,
               round(len(list_filter({_TOKS}, x -> lower(x) IN ({_EN}))) / len({_TOKS}), 4) AS stopword_ratio
        FROM documents
    """,
    "doc_lang_id": f"""
        SELECT doc_id,
               CASE WHEN greatest(en, es, fr) = 0 THEN 'und'
                    WHEN en = greatest(en, es, fr) THEN 'en'
                    WHEN es = greatest(en, es, fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred
        FROM (
            SELECT doc_id,
                   len(list_filter({_TOKS}, x -> lower(x) IN ({_EN}))) AS en,
                   len(list_filter({_TOKS}, x -> lower(x) IN ({_ES}))) AS es,
                   len(list_filter({_TOKS}, x -> lower(x) IN ({_FR}))) AS fr
            FROM documents
        )
    """,
    # doc_quality_filter RETIRED r18: == doc_text_quality + four
    # threshold predicates (test_retired_entry_equivalences_r18); the
    # gate also runs under doc_pipeline_curate's oracle
    "doc_scrub_pii": """
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\+?\\d[\\d\\s().-]{7,}\\d', '<PHONE>', 'g'),
                 '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS text
        FROM documents
    """,
    "doc_strip_boilerplate": """
        WITH t AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
        ), lines AS (
            SELECT doc_id, i AS pos, ls[i + 1] AS line
            FROM t, UNNEST(range(len(ls))) AS u(i)
        ), norm AS (
            SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM lines
        ), bp AS (
            SELECT norm FROM (
                SELECT DISTINCT doc_id, norm FROM norm WHERE norm != ''
            ) GROUP BY norm HAVING count(*) >= 3
        ), kept AS (
            SELECT n.doc_id, n.pos, n.line
            FROM norm n LEFT JOIN bp ON n.norm = bp.norm
            WHERE bp.norm IS NULL
        ), rebuilt AS (
            SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(r.text, '') AS text
        FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
    "doc_corpus_stats": f"""
        SELECT count(*) AS n_docs,
               CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
               CAST(sum(length(text)) AS BIGINT) AS n_chars,
               count(DISTINCT md5({_NORM})) AS n_unique_docs
        FROM documents
    """,
    # md5-threshold sampling: the hex literal is rate_threshold_hex(0.25)
    # — fixed-width lowercase hex compares as the 128-bit value does, so
    # the oracle shares the exact keep-decision with the Spark plan
    # doc_sample_hash RETIRED r14 (funding doc_csv_ingest): see the
    # comment above doc_csv_ingest's oracle
    # the threshold literal comes from rate_threshold_hex(0.2) — 0.2 is
    # not binary-exact, so a hand-written hex constant would disagree
    # with the Spark side in the last digits
    "orders_sample_consistent": f"""
        WITH o AS (
            SELECT * FROM orders
            WHERE md5(CAST(o_orderkey AS VARCHAR)) < '{T.rate_threshold_hex(0.2)}'
        ), l AS (
            SELECT * FROM lineitem
            WHERE md5(CAST(l_orderkey AS VARCHAR)) < '{T.rate_threshold_hex(0.2)}'
        )
        SELECT o_orderpriority, count(*) AS n_items,
               count(DISTINCT o_orderkey) AS n_orders
        FROM l JOIN o ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    "doc_stratified_sample": """
        SELECT doc_id, text, lang, source, n_chars FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents)
        WHERE rn <= 15
    """,
    "doc_tfidf_top": """
        WITH tok AS (
            SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2
        ), dfq AS (
            SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
        ), n AS (SELECT count(*) AS n FROM documents)
        SELECT doc_id, term, tf, df_docs,
               round(tf * (ln((n + 1) / (df_docs + 1)) + 1), 4) AS tfidf, rk
        FROM (
            SELECT tf.doc_id, tf.term, tf.tf, dfq.df_docs, n.n,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, dfq.df_docs ASC, tf.term ASC) AS rk
            FROM tf JOIN dfq USING (term) CROSS JOIN n)
        WHERE rk <= 3
    """,
    "doc_bm25_search": """
        WITH tok AS (
            SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok
            WHERE term IN ('spark', 'table', 'sort') GROUP BY 1, 2
        ), dfq AS (
            SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
        ), dl AS (
            SELECT doc_id, len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS dl
            FROM documents
        ), st AS (
            SELECT count(*) AS n,
                   avg(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS avgdl
            FROM documents
        )
        SELECT doc_id,
               round(sum(ln((n - df_docs + 0.5) / (df_docs + 0.5) + 1)
                         * (tf * (1.2 + 1))
                         / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
        FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT 10
    """,
    # round-trip identity: serialize → parse is exact, so the oracle is
    # the source table itself
    "doc_nt_roundtrip": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    # the fake decoder expands sha256(payload) into an 8x8 byte grid and
    # features are row means — re-derivable in SQL from the digest hex
    # (exact: integer byte sums / 8.0 are binary-exact in both engines)
    # fake audio decoder: sha256 digest repeated to 256 bytes, sample_j =
    # (byte[j % 32] - 128)/128.  Squares (k/128)^2 are exact in float64
    # (k^2 <= 16384, /2^14 exact), the 256-term sum stays exact, sqrt is
    # correctly rounded in both engines, and both sides cast to float32
    # 4x4 nearest-neighbor of the 8x8 digest grid: rows/cols [0,2,5,7]
    # (linspace(0,7,4).round()); pixel (r,c) = doubled-digest byte 8r+c;
    # uint8 -> float32 -> double is exact
    "doc_resize_pixels": """
        WITH h AS (
            SELECT doc_id AS media_id, sha256(text) AS hx FROM documents
        ), b AS (
            SELECT media_id, hx, list_transform(range(64), j ->
                    (strpos('0123456789abcdef',
                            substr(hx, 2 * (CASE WHEN j < 32 THEN j ELSE j - 32 END) + 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef',
                            substr(hx, 2 * (CASE WHEN j < 32 THEN j ELSE j - 32 END) + 2, 1)) - 1)) AS bs
            FROM h
        ), idx AS (SELECT unnest([0, 2, 5, 7]) AS v, unnest([0, 1, 2, 3]) AS k)
        SELECT b.media_id,
               CAST(r.k * 4 + c.k AS INT) AS pos,
               CAST(bs[8 * r.v + c.v + 1] AS DOUBLE) AS px
        FROM b, idx r, idx c
    """,
    "events_funnel": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
        )
        SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click', count(*) FROM s2
        UNION ALL
        SELECT 3, 'purchase', count(*) FROM s3
        ORDER BY step_idx
    """,
    "doc_repetition": """
        WITH lines AS (
            SELECT doc_id,
                   list_filter(list_transform(string_split(text, chr(10)),
                                              l -> lower(trim(l))),
                               l -> l <> '') AS ls
            FROM documents
        ), base AS (
            SELECT doc_id, len(ls) AS n_lines,
                   round(CASE WHEN len(ls) > 0
                              THEN 1 - len(list_distinct(ls)) / len(ls)
                              ELSE 0.0 END, 4) AS dup_line_frac
            FROM lines
        ), toks AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
            FROM documents
        ), bigrams AS (
            SELECT doc_id, bigram, count(*) AS cnt FROM (
                SELECT doc_id,
                       unnest(list_transform(range(len(t) - 1),
                                             i -> concat_ws(' ', t[i + 1], t[i + 2]))) AS bigram
                FROM toks WHERE len(t) >= 2
            ) GROUP BY 1, 2
        ), tot AS (
            SELECT doc_id, sum(cnt) AS n_bigrams FROM bigrams GROUP BY 1
        ), top AS (
            SELECT doc_id, bigram AS top_bigram,
                   round(cnt / n_bigrams, 4) AS top_bigram_frac
            FROM (
                SELECT doc_id, bigram, cnt,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY cnt DESC, bigram ASC) AS rk
                FROM bigrams) JOIN tot USING (doc_id)
            WHERE rk = 1
        )
        SELECT base.doc_id, base.n_lines, base.dup_line_frac,
               top.top_bigram, coalesce(top.top_bigram_frac, 0.0) AS top_bigram_frac
        FROM base LEFT JOIN top ON base.doc_id = top.doc_id
    """,
    "doc_ngram_jaccard": f"""
        WITH {_jaccard_pairs_ctes(cap=100, threshold=0.2)}
        SELECT doc_a, doc_b, jaccard FROM pairs
    """,
    "dedup_near_docs": f"""
        WITH RECURSIVE {_jaccard_pairs_ctes(cap=100, threshold=0.2)},
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a
        ),
        label AS (
            SELECT a AS doc_id, least(a, min(b)) AS keep FROM reach GROUP BY a
        )
        SELECT d.doc_id, coalesce(l.keep, d.doc_id) AS keep_doc_id
        FROM documents d LEFT JOIN label l ON d.doc_id = l.doc_id
    """,
    "dedup_keep_best_docs": f"""
        WITH RECURSIVE {_jaccard_pairs_ctes(cap=100, threshold=0.2)},
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a
        ),
        comp AS (
            SELECT a AS doc_id, least(a, min(b)) AS comp_id
            FROM reach GROUP BY a
        ),
        best AS (
            SELECT comp_id, doc_id AS keep FROM (
                SELECT c.comp_id, c.doc_id,
                       row_number() OVER (
                           PARTITION BY c.comp_id
                           ORDER BY length(d.text) DESC, c.doc_id ASC
                       ) AS rn
                FROM comp c JOIN documents d ON c.doc_id = d.doc_id
            ) WHERE rn = 1
        )
        SELECT d.doc_id, coalesce(b.keep, d.doc_id) AS keep_doc_id
        FROM documents d
        LEFT JOIN comp c ON d.doc_id = c.doc_id
        LEFT JOIN best b ON c.comp_id = b.comp_id
    """,
    # emb_l2_norms RETIRED r14 (funding doc_warc_ingest): see the
    # comment above doc_warc_ingest's oracle
    # --- derived-invariant twins (r10) ---------------------------------
    # doc_cdc_tiling RETIRED r14 (funding dedup_keep_best_docs): its
    # oracle was only strlen(text) + a constant TRUE; the tiling
    # identity is replayed as a pure-Spark differential in
    # test_joins.py::test_retired_entry_equivalences_r14, and the same
    # cdc_chunks offsets stay oracle-backed through
    # doc_dup_spans_planted's coverage floor
    "emb_semdedup_planted": """
        SELECT vec_id, CAST(1 AS BOOLEAN) AS keep,
               CAST(NULL AS BIGINT) AS dup_of
        FROM embeddings
        UNION ALL
        SELECT vec_id + 100000, CAST(0 AS BOOLEAN), vec_id FROM embeddings
    """,
    "dedup_incremental_sound": """
        SELECT doc_id, CAST(1 AS BOOLEAN) AS sound,
               CAST(1 AS BOOLEAN) AS store_ok
        FROM documents WHERE doc_id >= 250
    """,
    "dedup_incremental_simhash_sound": """
        SELECT doc_id, CAST(1 AS BOOLEAN) AS sound,
               CAST(1 AS BOOLEAN) AS store_ok
        FROM documents WHERE doc_id >= 250
    """,
    "doc_image_phash_stable": """
        SELECT doc_id, CAST(1 AS BOOLEAN) AS stable FROM documents
    """,
    "doc_video_near_dup_planted": """
        -- a planted copy pairs with its original iff it carries >= 2
        -- full 128-byte frames (see the entry docstring)
        SELECT doc_id AS vid_a, doc_id + 1000000 AS vid_b
        FROM documents
        WHERE doc_id % 10 = 0 AND strlen(text) >= 256
    """,
    "doc_audio_near_dup_planted": """
        -- >= 5 fingerprint windows (window 64 / stride 32 over the
        -- byte-waveform => >= 192 bytes) gives the >= 4 shared fps the
        -- threshold needs; cap_sound (r17) pins the capped arm's
        -- survives-iff-under-cap-evidence contract (entry docstring)
        SELECT doc_id AS aud_a, doc_id + 1000000 AS aud_b,
               true AS cap_sound
        FROM documents
        WHERE doc_id % 10 = 0 AND strlen(text) >= 192
    """,
    "graph_pagerank_mass": """
        WITH e AS (
            SELECT 'order:' || o_orderkey AS s, 'customer:' || o_custkey AS o
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'customer:' || c_custkey, 'nation:' || c_nationkey FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey FROM supplier
            UNION ALL
            SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey FROM nation
        ), n AS (
            SELECT s AS x FROM e UNION SELECT o AS x FROM e
        )
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(1.0 AS DOUBLE) AS mass
        FROM n
    """,
    # doc_minhash_planted RETIRED r14 (funding doc_dup_spans_planted):
    # its oracle was only the ">= 3 tokens pairs with its copy"
    # predicate, which the dedup_near_lsh_planted keep-map implies;
    # the subsumption is computed as a pure-Spark differential in
    # test_joins.py::test_retired_entry_equivalences_r14
    "doc_dup_spans_planted": """
        WITH p AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 3),
             m AS (SELECT MIN(doc_id) AS first_id FROM p)
        SELECT p.doc_id,
               p.doc_id <> m.first_id AS covered,
               p.doc_id <> m.first_id AS mid_gone
        FROM p, m
        ORDER BY p.doc_id
    """,
    # r15: winnowing-guarantee booleans over the planted md5-chain
    # passage (doc_id % 11 == 5, anchor = smallest planted id) — any
    # window-minima / k-gram-stream / distinct-selection bug flips one
    "doc_winnow_planted": """
        WITH p AS (SELECT doc_id FROM documents WHERE doc_id % 11 = 5),
             m AS (SELECT MIN(doc_id) AS anchor FROM p)
        SELECT p.doc_id, TRUE AS found_anchor, TRUE AS strong
        FROM p, m WHERE p.doc_id <> m.anchor
        ORDER BY p.doc_id
    """,
    "doc_mp4_demux": """
        -- empty docs produce a zero-sample container: no frame rows on
        -- the Spark side, so none here either
        SELECT doc_id,
               CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS n_frames,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents WHERE strlen(text) > 0
    """,
    # doc_bpe_roundtrip RETIRED r13 (funding doc_jsonl_ingest): its
    # oracle was only the whitespace normalization replay; the
    # rebuild==normalized-text identity is pinned as a pure-Spark
    # differential in test_joins.py::test_retired_entry_equivalences_r13
    "doc_jsonl_ingest": """
        WITH cls AS (
            SELECT lang, text,
                   -- NULL text is missing_text on BOTH sides (r13
                   -- advice): to_json omits NULL fields, so the
                   -- serializer classifies it explicitly too
                   CASE WHEN doc_id % 23 = 0 THEN 'malformed_json'
                        WHEN doc_id % 23 = 1 OR text IS NULL THEN 'missing_text'
                        ELSE 'good' END AS cls
            FROM documents
        )
        SELECT 'lang:' || lang AS bucket,
               COUNT(*) AS n_rows,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
        FROM cls WHERE cls = 'good' GROUP BY lang
        UNION ALL
        SELECT 'quarantine:' || cls AS bucket,
               COUNT(*) AS n_rows,
               CAST(NULL AS BIGINT) AS total_chars
        FROM cls WHERE cls <> 'good' GROUP BY cls
        ORDER BY bucket
    """,
    # doc_sample_hash RETIRED r14 (funding doc_csv_ingest): its oracle
    # was only the md5-threshold filter over documents; the SAME
    # sample_hash kernel stays oracle-backed through
    # orders_sample_consistent (two tables, keyed, joined), and the
    # documents-side replay is pinned as a pure-Spark differential in
    # test_joins.py::test_retired_entry_equivalences_r14
    "doc_csv_ingest": """
        WITH cls AS (
            SELECT lang, text,
                   -- replay of the serializer's corruption predicate;
                   -- NULL text is missing_text on BOTH sides
                   CASE WHEN doc_id % 23 = 0 THEN 'malformed_csv'
                        WHEN doc_id % 23 = 1 OR text IS NULL THEN 'missing_text'
                        ELSE 'good' END AS cls
            FROM documents
        )
        SELECT 'lang:' || lang AS bucket,
               COUNT(*) AS n_rows,
               -- decorated text: the ,"\\ suffix the serializer
               -- injects so quoting is non-vacuously exercised
               CAST(SUM(LENGTH(text || ',"\\')) AS BIGINT) AS total_chars
        FROM cls WHERE cls = 'good' GROUP BY lang
        UNION ALL
        SELECT 'quarantine:' || cls AS bucket,
               COUNT(*) AS n_rows,
               CAST(NULL AS BIGINT) AS total_chars
        FROM cls WHERE cls <> 'good' GROUP BY cls
        UNION ALL
        SELECT 'header:dropped' AS bucket,
               CAST(1 AS BIGINT) AS n_rows,
               CAST(NULL AS BIGINT) AS total_chars
        ORDER BY bucket
    """,
    # emb_l2_norms RETIRED r14 (funding doc_warc_ingest): its oracle
    # was only sqrt(dot(v,v)); the SAME norm kernel stays oracle-backed
    # inside the cosine denominators of emb_cosine_topk, emb_dup_pairs
    # and dedup_near_emb, and the direct replay is pinned as a
    # pure-Spark differential in
    # test_joins.py::test_retired_entry_equivalences_r14
    # doc_warc_ingest: held in ORACLE_HOLDBACK through r14, published
    # with the r15 rotation (window slot 4)
    "doc_warc_ingest": """
        WITH cls AS (
            SELECT doc_id, COALESCE(lang, 'xx') AS lang, text,
                   -- replay of the serializer's corruption predicate;
                   -- NULL text joins the encoding-failed class on BOTH
                   -- sides (the record is emitted with empty text)
                   CASE WHEN doc_id % 23 = 0 THEN 'bad_content_length'
                        WHEN doc_id % 23 = 1 OR text IS NULL
                            THEN 'content_encoding_failed'
                        ELSE 'good' END AS cls
            FROM documents
        )
        SELECT 'lang:' || lang AS bucket,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN cls = 'good' THEN LENGTH(text)
                             ELSE 0 END) AS BIGINT) AS total_chars,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM cls WHERE cls <> 'bad_content_length' GROUP BY lang
        UNION ALL
        SELECT 'quarantine:' || cls AS bucket,
               COUNT(*) AS n_rows,
               CAST(NULL AS BIGINT) AS total_chars,
               CAST(NULL AS BIGINT) AS sum_ids
        FROM cls WHERE cls <> 'good' GROUP BY cls
        ORDER BY bucket
    """,
    "doc_png_features": """
        WITH b AS (
            SELECT doc_id AS media_id,
                   list_transform(range(64),
                       j -> ord(substr(text, (j % strlen(text)) + 1, 1))) AS bs
            FROM documents
        )
        SELECT media_id, i AS pos,
               list_sum(bs[8 * i + 1 : 8 * i + 8]) / 8.0 AS feat
        FROM b, range(8) t(i)
    """,
    "doc_wav_features": """
        -- the corpus is pure ASCII (strlen == length for every doc),
        -- so the byte waveform re-derives from the characters
        WITH b AS (
            SELECT doc_id AS media_id,
                   list_transform(range(strlen(text)),
                                  j -> ord(substr(text, j + 1, 1))) AS bs
            FROM documents
        )
        SELECT media_id,
               CAST(len(bs) AS BIGINT) AS n_samples,
               CAST(sqrt(list_sum(list_transform(bs,
                        v -> ((v - 128) / 128.0) * ((v - 128) / 128.0)))
                        / len(bs)) AS FLOAT) AS rms,
               CAST(list_sum(list_transform(range(len(bs) - 1),
                        j -> CASE WHEN (bs[j + 1] < 128) <> (bs[j + 2] < 128)
                                  THEN 1 ELSE 0 END)) AS BIGINT)
                   AS zero_crossings
        FROM b
    """,
    "doc_simhash_planted": """
        SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b,
               CAST(0 AS INTEGER) AS hamming
        FROM documents
        WHERE trim(text) != ''
    """,
    # emb_lsh_planted RETIRED r15 (funding emb_ivfpq_recall_sound):
    # the identical-copy bucket-collision guarantee rides the same
    # similarity.sign_buckets kernel that emb_dup_pairs_lsh_planted
    # (below) keeps under the oracle; the bucketed top-k ranking path
    # stays backed through emb_lsh_recall_sound.  The full planted
    # invariant is replayed as a pure-Spark differential in
    # test_joins.py::test_retired_entry_equivalences_r15.
    "emb_dup_pairs_lsh_planted": """
        -- cap_sound (r17): survives-capped-run iff an under-cap shared
        -- bucket exists — an exact property of the capped operator, so
        -- the oracle pins TRUE per pair (see the entry docstring)
        SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
               CAST(1.0 AS DOUBLE) AS cosine,
               true AS cap_sound
        FROM embeddings
    """,
    "dedup_near_lsh_planted": """
        WITH t AS (
            SELECT doc_id,
                   array_to_string(
                       regexp_split_to_array(lower(trim(text)), '\\s+'), ' '
                   ) AS norm,
                   len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                       AS ntok
            FROM documents
        )
        SELECT t.doc_id + 100000 AS doc_id,
               CASE WHEN t.ntok >= 3
                    THEN (SELECT min(t2.doc_id) FROM t t2
                          WHERE t2.norm = t.norm AND t2.ntok >= 3)
                    ELSE t.doc_id + 100000
               END AS keep_doc_id
        FROM t
    """,
    "doc_sketch_tolerance": """
        SELECT CAST(1 AS BOOLEAN) AS unique_ok,
               CAST(1 AS BOOLEAN) AS p50_ok,
               CAST(1 AS BOOLEAN) AS p90_ok,
               CAST(1 AS BOOLEAN) AS p99_ok
    """,
    "doc_corpus_shuffle": """
        SELECT doc_id,
               CAST(row_number() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
                    AS BIGINT) AS shuffle_pos
        FROM documents
    """,
    "doc_length_batches": """
        WITH d AS (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT)
                       AS n_tokens
            FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(FLOOR(n_tokens / 16) AS INT) AS bucket,
               CAST(FLOOR((row_number() OVER (
                   PARTITION BY CAST(FLOOR(n_tokens / 16) AS INT)
                   ORDER BY doc_id) - 1) / 8) AS INT) AS batch_id
        FROM d
    """,
    "emb_cosine_topk": """
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
        s AS (
            SELECT q_id, n_id,
                   round(list_dot_product(q_vec :: DOUBLE[], n_vec :: DOUBLE[])
                         / (sqrt(list_dot_product(q_vec :: DOUBLE[], q_vec :: DOUBLE[]))
                            * sqrt(list_dot_product(n_vec :: DOUBLE[], n_vec :: DOUBLE[]))), 6) AS cosine
            FROM c, q WHERE n_id != q_id
        )
        SELECT q_id, n_id, cosine, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank FROM s
        ) WHERE rank <= 5
    """,
    "graph_shortest_weighted": """
        WITH RECURSIVE edges AS (
            SELECT 'order:' || o_orderkey AS src,
                   'customer:' || o_custkey AS dst,
                   CAST(1.5 AS DOUBLE) AS w
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT 'customer:' || c_custkey, 'nation:' || c_nationkey,
                   CAST(2.25 AS DOUBLE)
            FROM customer
            UNION ALL
            SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey,
                   CAST(2.25 AS DOUBLE)
            FROM supplier
            UNION ALL
            SELECT 'nation:' || n_nationkey, 'region:' || n_regionkey,
                   CAST(4.5 AS DOUBLE)
            FROM nation
            UNION ALL
            SELECT 'customer:' || c_custkey, 'region:' || n_regionkey,
                   CAST(5.0 AS DOUBLE)
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_mktsegment = 'BUILDING'
        ), walk(src, dst, d) AS (
            SELECT src, dst, w FROM edges
            UNION ALL
            SELECT wk.src, e.dst, wk.d + e.w
            FROM walk wk JOIN edges e ON wk.dst = e.src
            WHERE wk.d < 20
        )
        SELECT src, dst, min(d) AS dist FROM walk GROUP BY 1, 2
    """,
    "emb_range_search": """
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
        s AS (
            SELECT q_id, n_id,
                   round(list_dot_product(q_vec :: DOUBLE[], n_vec :: DOUBLE[])
                         / (sqrt(list_dot_product(q_vec :: DOUBLE[], q_vec :: DOUBLE[]))
                            * sqrt(list_dot_product(n_vec :: DOUBLE[], n_vec :: DOUBLE[]))), 6) AS cosine
            FROM c, q WHERE n_id != q_id
        )
        SELECT q_id, n_id, cosine FROM s WHERE cosine >= 0.3
    """,
    # r16: per-vector norms precomputed ONCE (n sqrt-dot calls instead
    # of 2 per pair; bit-identical — same fold on the same input, hash
    # verified at sf0.1) and, in the recursive sibling, the pair set
    # MATERIALIZED so the recursion iterates over rows instead of
    # re-deriving the O(n^2) cosine scan every round — at sf1.0 the
    # un-materialized form spent 80+ min inside one oracle; these run
    # in minutes
    "emb_dup_pairs": """
        WITH e AS MATERIALIZED (
            SELECT vec_id, embedding :: DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding :: DOUBLE[], embedding :: DOUBLE[])) AS nrm
            FROM embeddings
        ), s AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, cosine FROM s WHERE cosine >= 0.4
    """,
    "dedup_near_emb": """
        WITH RECURSIVE e AS MATERIALIZED (
            SELECT vec_id, embedding :: DOUBLE[] AS v,
                   sqrt(list_dot_product(embedding :: DOUBLE[], embedding :: DOUBLE[])) AS nrm
            FROM embeddings
        ),
        s AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
        ),
        pairs AS MATERIALIZED (SELECT id_a, id_b FROM s WHERE cosine >= 0.4),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT reach.a, e.b FROM reach JOIN edges e ON reach.b = e.a
        ),
        label AS (
            SELECT a AS vec_id, least(a, min(b)) AS keep FROM reach GROUP BY a
        )
        SELECT e.vec_id, coalesce(l.keep, e.vec_id) AS keep_vec_id
        FROM embeddings e LEFT JOIN label l ON e.vec_id = l.vec_id
    """,
    # doc_minhash_lsh, doc_simhash, emb_lsh_topk, emb_dup_pairs_lsh:
    # Spark-specific hashing / seeded projections — no SQL oracle
    # (driver records rows-only checks)
}

# the exhaustive ANN twins must reproduce the EXACT top-k — their oracle
# is literally the exact-cosine oracle (seeded codebooks / coarse cells
# cannot change an exhaustive result, which is the invariant)

# thresholds routed through rate_threshold_hex so both engines compare
# the identical hex literals (the doc_mixture_sample convention)
ORACLES["doc_split_assign"] = f"""
    SELECT doc_id,
           CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{T.rate_threshold_hex(0.9)}'
                    THEN 'train'
                WHEN md5(CAST(doc_id AS VARCHAR)) < '{T.rate_threshold_hex(0.95)}'
                    THEN 'val'
                ELSE 'test'
           END AS split
    FROM documents
"""
ORACLES["doc_epoch_upsample"] = f"""
    SELECT doc_id, source, unnest(range(n)) AS copy_idx FROM (
        SELECT doc_id, source,
               CAST(CASE source WHEN 'src0' THEN 2 ELSE CASE source
                         WHEN 'src1' THEN 0 WHEN 'src2' THEN 0 ELSE 1 END END
                    + CASE WHEN md5(CAST(doc_id AS VARCHAR)) <
                             CASE source
                                  WHEN 'src0' THEN '{T.rate_threshold_hex(0.5)}'
                                  WHEN 'src1' THEN '{T.rate_threshold_hex(0.4)}'
                                  WHEN 'src2' THEN '{T.rate_threshold_hex(0.0)}'
                                  ELSE '{T.rate_threshold_hex(0.0)}'
                             END
                           THEN 1 ELSE 0 END AS BIGINT) AS n
        FROM documents
    )
"""

# doc_bpe_pack (r11): the id stream re-derives in SQL because
# num_merges=0 and the corpus is printable ASCII — per word, one id per
# character (sorted byte alphabet puts chr(33)..chr(126) at ids 0..93,
# so id = ord(char) - 33) plus the end-of-word marker (id 256, first
# token after the 256 byte symbols), and id 257 (<|endoftext|>) closing
# every document; chunking is a row_number over the doc_id-ordered
# stream (the single ordered window is oracle-scale-affordable)
ORACLES["doc_bpe_pack"] = r"""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(trim(coalesce(text,''))), '\s+'),
                           x -> x <> '') AS ws
        FROM documents
    ), t AS (
        SELECT doc_id,
               flatten(list_transform(ws, w ->
                   list_append(
                       list_transform(range(strlen(w)),
                                      j -> ord(substr(w, j+1, 1)) - 33),
                       256)
               )) || [257] AS ids
        FROM d
    ), u AS (
        SELECT doc_id,
               unnest(list_transform(range(len(ids)),
                                     j -> {'pos': j, 'id': ids[j+1]})) AS s
        FROM t
    ), g AS (
        SELECT row_number() OVER (ORDER BY doc_id, s.pos) - 1 AS rn,
               s.id AS id
        FROM u
    )
    SELECT rn // 128 AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM g GROUP BY 1
"""

# emb_semdedup_incremental_sound (r11): structural soundness + planted
# copy rejection are all-true over batch-2 ids (organic second half +
# one copy per first-half vector)
ORACLES["emb_semdedup_incremental_sound"] = """
    SELECT vec_id AS doc_id, CAST(1 AS BOOLEAN) AS sound,
           CAST(1 AS BOOLEAN) AS store_ok,
           CAST(1 AS BOOLEAN) AS copy_rejected
    FROM embeddings WHERE vec_id >= 250
    UNION ALL
    SELECT vec_id + 100000, CAST(1 AS BOOLEAN), CAST(1 AS BOOLEAN),
           CAST(1 AS BOOLEAN)
    FROM embeddings WHERE vec_id < 250
"""

# doc_video_pipeline (r11): a planted copy pairs with its original iff
# its container carries >= 2 PNG frames (64 text bytes per frame)
ORACLES["doc_video_pipeline"] = """
    SELECT doc_id AS vid_a, doc_id + 1000000 AS vid_b
    FROM documents
    WHERE doc_id % 10 = 0 AND strlen(text) >= 129
"""


# the four oracles below were held back in r11 (window full) and
# published with the r12 rotation
ORACLES["doc_video_mjpeg"] = ORACLES["doc_video_pipeline"]
# r18 (verdict ask #3): full NB replay for doc_lang_classifier — the
# DuckDB side rebuilds the planted corpus (per-label qq<lang>k cores),
# retrains the Laplace-smoothed multinomial NB on the same every-3rd
# seed slice, rescoring every doc with the same argmax tie order and
# 4dp margin rounding (the bigram-logloss double-sum argument covers
# the reordering error), and applies the same accuracy floor.
_LANG_CORE_SQL = "concat_ws(' ', " + ", ".join(
    f"'qq'||lang||'{k}'" for k in range(6)
) + ")"
ORACLES["doc_lang_classifier"] = rf"""
    WITH planted AS (
        SELECT doc_id, lang AS label,
               concat_ws(' ', text, {_LANG_CORE_SQL}, {_LANG_CORE_SQL},
                         {_LANG_CORE_SQL}) AS text
        FROM documents
    ), dt AS (
        SELECT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(trim(text)), '\s+'),
            x -> x <> '')) AS tok
        FROM planted
    ), dcnt AS (
        SELECT doc_id, tok, count(*) AS c FROM dt GROUP BY 1, 2
    ), seed AS (
        SELECT doc_id, label FROM planted WHERE doc_id % 3 = 0
    ), st AS (
        SELECT s.label AS class, dt.tok FROM dt JOIN seed s USING (doc_id)
    ), cc AS (
        SELECT class, tok, count(*) AS cw FROM st GROUP BY 1, 2
    ), vocab AS (SELECT count(DISTINCT tok) AS v FROM cc),
       tot AS (SELECT class, sum(cw) AS t FROM cc GROUP BY 1),
       priors AS (
        SELECT label AS class,
               ln(count(*) * 1.0 / (SELECT count(*) FROM seed)) AS logprior
        FROM seed GROUP BY 1
    ), sc AS (
        SELECT d.doc_id, cls.class,
               sum(d.c * coalesce(
                   ln((cc.cw + 1.0) / (cls.t + 1.0 * vocab.v)),
                   ln(1.0 / (cls.t + 1.0 * vocab.v)))) AS s
        FROM dcnt d CROSS JOIN tot cls CROSS JOIN vocab
             LEFT JOIN cc ON cc.class = cls.class AND cc.tok = d.tok
        GROUP BY 1, 2
    ), scored AS (
        SELECT sc.doc_id, sc.class, sc.s + p.logprior AS score
        FROM sc JOIN priors p ON p.class = sc.class
    ), ranked AS (
        SELECT doc_id, class, score,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, class ASC) AS rn
        FROM scored
    ), pred AS (
        SELECT a.doc_id, a.class AS pred,
               round(a.score - b.score, 4) AS margin
        FROM ranked a LEFT JOIN ranked b
             ON a.doc_id = b.doc_id AND b.rn = 2
        WHERE a.rn = 1
    ), joined AS (
        SELECT p.doc_id, p.pred, p.margin,
               (p.pred = pl.label) AS correct
        FROM pred p JOIN planted pl USING (doc_id)
    ), acc AS (
        SELECT avg(CASE WHEN correct THEN 1.0 ELSE 0.0 END)
               >= {_LANG_ACC_FLOOR} AS acc_ok
        FROM joined
    )
    SELECT doc_id, pred, margin, correct, acc_ok
    FROM joined CROSS JOIN acc
"""


ORACLES["doc_bigram_logloss"] = r"""
    WITH d AS (
        SELECT doc_id,
               [chr(57345)] || list_filter(
                   regexp_split_to_array(lower(trim(coalesce(text, ''))),
                                         '\s+'),
                   x -> x <> '') AS ws
        FROM documents
    ), pp AS (
        SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ws)),
                                         i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS s
            FROM d WHERE len(ws) > 1
        )
    ), c2 AS (SELECT w1, w2, count(*) AS c2 FROM pp GROUP BY 1, 2),
       c1 AS (SELECT w1, count(*) AS c1h FROM pp GROUP BY 1),
       cu AS (SELECT w2, count(*) AS cu FROM pp GROUP BY 1),
       t  AS (SELECT count(*) AS t FROM pp),
       sc AS (
        SELECT pp.doc_id,
               -ln(0.4 * c2.c2 / c1.c1h + (1 - 0.4) * cu.cu / t.t) AS nll
        FROM pp JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
                JOIN cu USING (w2) CROSS JOIN t
       ), agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(sum(nll) / count(*), 4) AS logloss
        FROM sc GROUP BY 1
       )
    SELECT documents.doc_id,
           coalesce(agg.n_tokens, 0) AS n_tokens,
           coalesce(agg.logloss, 0.0) AS logloss
    FROM documents LEFT JOIN agg ON documents.doc_id = agg.doc_id
"""


ORACLES["graph_triangles_parts"] = """
    WITH e AS (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
               greatest(a.l_partkey, b.l_partkey) AS b
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey <> b.l_partkey
          AND a.l_orderkey % 10 = 0
    ), deg AS (
        SELECT n, count(*) AS deg FROM (
            SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
        ) GROUP BY 1
    ), tri AS (
        SELECT t.n, count(*) AS triangles FROM (
            SELECT e1.a AS x FROM e e1
                JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            UNION ALL
            SELECT e1.b FROM e e1
                JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            UNION ALL
            SELECT e2.b FROM e e1
                JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        ) t(n) GROUP BY 1
    )
    SELECT deg.n AS node, CAST(deg.deg AS BIGINT) AS degree,
           CAST(coalesce(tri.triangles, 0) AS BIGINT) AS triangles,
           CASE WHEN deg.deg >= 2
                THEN round(2.0 * coalesce(tri.triangles, 0)
                           / (deg.deg * (deg.deg - 1)), 4)
                ELSE 0.0 END AS lcc
    FROM deg LEFT JOIN tri ON deg.n = tri.n
"""


ORACLES["graph_kcore_sound"] = """
    SELECT DISTINCT p AS node, CAST(1 AS BOOLEAN) AS sound FROM (
        SELECT a.l_partkey AS p
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey <> b.l_partkey AND a.l_orderkey % 10 = 0
    )
"""


# r12 ANN recall twins: the seeded operators' recall is deterministic
# per dataset and the entries' bounds sit >= 0.2 under the measured
# minimum at every shipped SF, so the oracle is the all-true table over
# the probe ids — any retrieval-quality regression (bucketing bug,
# banding change, codebook drift) flips a boolean and the hash
_ANN_SOUND_ORACLE = """
    SELECT vec_id AS q_id, TRUE AS floor_ok, TRUE AS mean_ok
    FROM embeddings WHERE vec_id < 25
"""
ORACLES["emb_lsh_recall_sound"] = _ANN_SOUND_ORACLE
ORACLES["emb_ivf_recall_sound"] = _ANN_SOUND_ORACLE
ORACLES["emb_pq_recall_sound"] = _ANN_SOUND_ORACLE
# r15: the composed-index twin adds the exhaustive≡exact arm
ORACLES["emb_ivfpq_recall_sound"] = """
    SELECT vec_id AS q_id, TRUE AS floor_ok, TRUE AS mean_ok,
           TRUE AS exhaustive_ok
    FROM embeddings WHERE vec_id < 25
"""


def _kcore_peel_sql(k: int, iters: int = 24) -> str:
    """Sequential k-core peel as a DuckDB recursive CTE: iteration i+1
    keeps exactly the edges whose BOTH endpoints have remaining degree
    >= k at iteration i — the textbook deletion process, independent of
    the engine's h-index fixpoint.  Survivors at the final iteration
    are the maximal k-core's nodes."""
    return f"""
        SELECT {k} AS k, src AS node FROM (
            WITH RECURSIVE e AS (
                SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                       greatest(a.l_partkey, b.l_partkey) AS b
                FROM lineitem a JOIN lineitem b
                    ON a.l_orderkey = b.l_orderkey
                WHERE a.l_partkey <> b.l_partkey AND a.l_orderkey % 10 = 0
            ), sym AS (
                SELECT a AS src, b AS dst FROM e
                UNION ALL SELECT b, a FROM e
            ), peel(src, dst, it) AS (
                SELECT src, dst, 0 FROM sym
                UNION ALL
                SELECT p.src, p.dst, p.it + 1 FROM peel p
                WHERE p.it < {iters}
                  AND p.src IN (SELECT src FROM peel q WHERE q.it = p.it
                                GROUP BY src HAVING count(*) >= {k})
                  AND p.dst IN (SELECT src FROM peel q WHERE q.it = p.it
                                GROUP BY src HAVING count(*) >= {k})
            )
            SELECT DISTINCT src FROM peel WHERE it = {iters}
        )
    """


ORACLES["graph_kcore_max"] = (
    _kcore_peel_sql(4) + " UNION ALL " + _kcore_peel_sql(8)
)

# r12 stretch: FLAC is lossless over the same byte waveform, so the
# WAV entry's character-derived oracle holds verbatim
ORACLES["doc_flac_features"] = ORACLES["doc_wav_features"]

# r12 ANN sound twins, minhash/near-dup families: the truth side of the
# candidate-completeness check is the exact shingle join (same CTEs as
# doc_ngram_jaccard, threshold 0.5); the LSH-refines-exact invariant is
# the all-true table over doc ids
ORACLES["doc_minhash_recall_sound"] = f"""
    WITH {_jaccard_pairs_ctes(cap=100, threshold=0.5)}
    SELECT doc_a, doc_b, TRUE AS found FROM pairs
"""
ORACLES["dedup_near_lsh_sound"] = """
    SELECT doc_id, TRUE AS sound FROM documents
"""

if _SWEEP_SINGLE_ARM:
    # single-arm sweep mode (r18, verdict ask #5): the capped arm and
    # its cap_sound column drop from both sides — keep these SELECTs
    # column-identical to the entries' single-arm returns above
    ORACLES["doc_audio_near_dup_planted"] = """
        SELECT doc_id AS aud_a, doc_id + 1000000 AS aud_b
        FROM documents
        WHERE doc_id % 10 = 0 AND strlen(text) >= 192
    """
    ORACLES["emb_dup_pairs_lsh_planted"] = """
        SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
               CAST(1.0 AS DOUBLE) AS cosine
        FROM embeddings
    """
