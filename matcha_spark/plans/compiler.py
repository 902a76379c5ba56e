"""BGP → DataFrame plan compiler.

This module replaces the reference's entire execution stack — the
miniKanren goal interpreter and pldb hash indexes (``src/grafter/matcha/
alpha.clj:188-203``, ``src:252-261``) — with declarative Spark plans:

- one *triple-pattern scan* per pattern: constant positions become
  pushdown-able struct-equality filters, variable positions become
  column renames, a repeated var inside one pattern becomes an intra-row
  equality filter (reference ``src:188-191``);
- BGP conjunction = **equi-join tree on shared variables** (shared logic
  vars unify ⇔ natural join, reference ``src:193-199``) ordered by a
  selectivity heuristic (ground-position count × predicate frequency
  stats) — the cluster-scale replacement for pldb's index selectivity;
- ``values`` = broadcast join against a literal DataFrame (multiset
  semantics of ``membero`` preserved, reference ``src:175-176``);
- ``optional`` blocks compile exactly like the reference's hoisted
  ``conde`` (``src:193-203``): solutions are the UNION of
  (required ⋈ block_i) branches plus — when a required part exists — a
  "succeed" branch of the bare required solutions with every
  optional-only var NULL (= unbound).

Scale notes: all joins are plain equi-joins Catalyst/AQE can turn into
broadcast or shuffled-hash joins; small pattern scans (by predicate
stats) get explicit ``broadcast()`` hints; nothing ever collects to the
driver inside a plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..db import TriplesDB
from ..patterns import (
    Alt,
    Bind,
    Exists,
    Filter,
    Inv,
    Minus,
    NegSet,
    NotExists,
    OneOrMore,
    Optional,
    PathExpr,
    Seq,
    SubSelect,
    Values,
    ValuesRows,
    ZeroOrMore,
    ZeroOrOne,
    const_value,
    find_vars,
    is_var,
    validate_patterns,
    var_name,
)
from ..terms import TERM_TYPE, term_lit, to_term

# Pattern scans estimated below this many rows get a broadcast hint.
BROADCAST_ROWS = 100_000


@dataclass
class Solutions:
    """Raw solution set: one TERM-struct column per variable.

    ``maybe_unbound`` tracks vars that can be NULL (bound only inside
    optional blocks) — the engine's internal representation of the
    reference's unbound logic vars.
    """

    df: DataFrame
    vars: list[str]
    required_vars: list[str]
    has_required: bool
    maybe_unbound: set[str] = field(default_factory=set)


@dataclass
class _Scan:
    df: DataFrame
    vars: list[str]
    est: float
    guard: bool = False  # all-ground pattern: existence filter only


def _split_clauses(patterns: Sequence[Any]):
    """Hoist optionals after required clauses (reference ``parse-patterns``
    ``src:193-203`` — order-invariance among optionals is a tested
    semantic, ``test:689-716``).  Filters and negation blocks apply to
    the required+values solutions, before optionals."""
    triples, values, optionals, filters, binds, negations, subqueries = (
        [], [], [], [], [], [], []
    )
    for p in patterns:
        if isinstance(p, Optional):
            optionals.append(p)
        elif isinstance(p, (Values, ValuesRows)):
            values.append(p)
        elif isinstance(p, Filter):
            filters.append(p)
        elif isinstance(p, Bind):
            binds.append(p)
        elif isinstance(p, (NotExists, Exists, Minus)):
            negations.append(p)
        elif isinstance(p, SubSelect):
            subqueries.append(p)
        else:
            row = list(p)
            if len(row) == 4:
                row = row[:3]  # quad tolerance (src:54-58)
            triples.append(tuple(row))
    return triples, values, optionals, filters, binds, negations, subqueries


def _path_est(path, stats, total: float) -> float:
    """Row estimate for a path pattern's edge set — drives join ordering
    and the broadcast hint exactly like plain pattern estimates.
    Closures get a deliberately huge estimate: reachability pairs can
    exceed the triple count, so they must never be broadcast and should
    join after the selective scans have shrunk the solution set."""
    if isinstance(path, Inv):
        return _path_est(path.path, stats, total)
    if isinstance(path, Seq):
        return max(_path_est(s, stats, total) for s in path.steps)
    if isinstance(path, Alt):
        return sum(_path_est(a, stats, total) for a in path.alts)
    if isinstance(path, (OneOrMore, ZeroOrMore, ZeroOrOne)):
        return float(total) * 100.0
    if isinstance(path, NegSet):
        excluded = sum(_path_est(p, stats, total) for p in path.preds)
        return max(float(total) - excluded, 0.0)
    k = to_term(const_value(path))
    return float(stats.get((k[0], k[1]), total))


def _contains_closure(path) -> bool:
    """Does the path expression contain a transitive closure anywhere?
    Only closures justify seeded evaluation: for closure-free paths
    (Seq/Alt/Inv/ZeroOrOne/NegSet compositions) the endpoint equality
    is an ordinary filter Catalyst pushes through the join/union tree
    to the base scans, but a closure materializes EAGERLY at compile
    time — before the filter exists — so the restriction must be pushed
    into the evaluation by hand."""
    if isinstance(path, Inv):
        return _contains_closure(path.path)
    if isinstance(path, Seq):
        return any(_contains_closure(s) for s in path.steps)
    if isinstance(path, Alt):
        return any(_contains_closure(a) for a in path.alts)
    if isinstance(path, (OneOrMore, ZeroOrMore)):
        return True
    if isinstance(path, ZeroOrOne):
        return _contains_closure(path.path)
    return False


def _simple_edge_relation(path) -> bool:
    """Is the compiled edge relation of ``path`` a plain (union of)
    filtered scan(s) of the cached triple store — no joins, no nested
    closures?  Decides whether a seeded BFS should re-run the relation
    per round (cache-read, cheap) or materialize it once (composite
    join trees)."""
    if isinstance(path, Inv):
        return _simple_edge_relation(path.path)
    if isinstance(path, Alt):
        return all(_simple_edge_relation(a) for a in path.alts)
    if isinstance(path, NegSet):
        return True
    if isinstance(path, PathExpr):
        return False  # Seq / closures / ZeroOrOne (graph_nodes union)
    return True  # predicate constant


def _reach_via_path(
    db: TriplesDB, path, seeds: DataFrame, forward: bool, seeds_small: bool = True
) -> DataFrame:
    """Seed-bounded path evaluation with provenance: ``(root, x)``
    pairs where ``root ∈ seeds`` and ``root path x`` (forward) or
    ``x path root`` (backward).  The seed set threads through every
    path operator, so closures ANYWHERE in the expression evaluate as
    frontier reachability from the midpoints that actually occur
    (``seeded_reachability(keep_root=True)``) instead of as all-pairs
    materializations:

    - predicate / NegSet: the seed join lands next to the pushdown
      predicate filter on one triple scan;
    - ``Inv``: same evaluation, direction flipped;
    - ``Seq``: steps chain left-to-right (forward) or right-to-left
      (backward); each step's seed set is the previous step's frontier
      (distinct midpoints), and provenance joins the chain back up;
    - ``Alt``: union of branch evaluations;
    - ``OneOrMore``/``ZeroOrMore``: provenance BFS over the inner edge
      set (a nested closure INSIDE the inner path still materializes
      all-pairs via ``path_edges`` — the inner edge *relation* is what
      BFS walks; rare, and still bounded by the old cost);
    - ``ZeroOrOne``/``ZeroOrMore`` zero-length: each seed pairs with
      itself iff it is a mentioned node (``graph_nodes``), matching the
      all-pairs identity union exactly.

    ``seeds_small``: True only when ``seeds`` is the literal ground
    anchor (a 1-row frame) — then the seed side of each join is
    broadcast-hinted.  Recursive Seq steps pass False: their seed set
    is the PREVIOUS step's frontier, unbounded by contract, and
    force-broadcasting it would OOM at exactly the scale seeded paths
    exist to win (ADVICE r10) — those joins are left to AQE."""
    from ..operators.graph import graph_nodes, path_edges, seeded_reachability

    spark = db.df.sparkSession

    def ident_pairs() -> DataFrame:
        mentioned = seeds.join(graph_nodes(db), "n", "leftsemi")
        return mentioned.select(F.col("n").alias("root"), F.col("n").alias("x"))

    def scan_pairs(df: DataFrame) -> DataFrame:
        # one-hop relation (s, o) joined against the seed set on the
        # anchored side; broadcast-hint only the ground-literal seed —
        # computed frontiers are unbounded, AQE picks their strategy
        anchor, other = ("s", "o") if forward else ("o", "s")
        seed_side = F.broadcast(seeds) if seeds_small else seeds
        return (
            df.join(seed_side, df[anchor] == seeds["n"], "inner")
            .select(seeds["n"].alias("root"), df[other].alias("x"))
            .dropDuplicates()
        )

    if isinstance(path, Inv):
        return _reach_via_path(
            db,
            path.path,
            seeds,
            not forward,
            seeds_small,
        )
    if isinstance(path, Seq):
        steps = path.steps if forward else tuple(reversed(path.steps))
        acc = _reach_via_path(db, steps[0], seeds, forward, seeds_small)
        for st in steps[1:]:
            mids = acc.select(F.col("x").alias("n")).dropDuplicates()
            nxt = _reach_via_path(db, st, mids, forward, seeds_small=False)
            acc = (
                acc.select("root", F.col("x").alias("__mid"))
                .join(nxt.select(F.col("root").alias("__mid"), "x"), "__mid")
                .select("root", "x")
                .dropDuplicates()
            )
        return acc
    if isinstance(path, Alt):
        branches = [
            _reach_via_path(db, b, seeds, forward, seeds_small) for b in path.alts
        ]
        acc = branches[0]
        for b in branches[1:]:
            acc = acc.unionByName(b)
        return acc.dropDuplicates() if len(branches) > 1 else acc
    if isinstance(path, (OneOrMore, ZeroOrMore)):
        edges = path_edges(db, path.path)
        e = (
            edges
            if forward
            else edges.select(F.col("o").alias("s"), F.col("s").alias("o"))
        )
        reach = seeded_reachability(
            e,
            seeds,
            src="s",
            dst="o",
            keep_root=True,
            # plain-scan edge relations (predicate / Alt / NegSet over
            # the CACHED triple store) are memo-persisted as their
            # filtered slice (r18, inside the seeded loop) instead of
            # paying a full-corpus parquet write up front; composite
            # relations (Seq join trees, nested closures) still
            # materialize once
            materialize_edges=not _simple_edge_relation(path.path),
            broadcast_seeds=seeds_small,
        )
        out = reach.select("root", F.col("n").alias("x"))
        if isinstance(path, ZeroOrMore):
            out = out.unionByName(ident_pairs()).dropDuplicates()
        return out
    if isinstance(path, ZeroOrOne):
        base = _reach_via_path(db, path.path, seeds, forward, seeds_small)
        return base.unionByName(ident_pairs()).dropDuplicates()
    if isinstance(path, NegSet):
        cond = F.lit(True)
        for pred in path.preds:
            cond = cond & (F.col("p") != term_lit(pred))
        return scan_pairs(db.df.where(cond).select("s", "o"))
    if isinstance(path, PathExpr):
        raise TypeError(f"unknown path form: {type(path).__name__}")
    # base case: predicate constant
    return scan_pairs(db.df.where(F.col("p") == term_lit(path)).select("s", "o"))


def _seeded_path_df(db: TriplesDB, s_item, path, o_item) -> DataFrame | None:
    """Ground-endpoint path → seeded evaluation (r09): when a pattern
    grounds its subject or object AND the path contains a closure
    anywhere, evaluate the path *from the seed*
    (:func:`_reach_via_path`) instead of materializing all-pairs
    closures and filtering — the all-pairs form is O(V²) pairs where
    the seeded form is O(reachable from the one anchor).  Returns the
    restricted ``(s, o)`` pair DataFrame (semantically
    ``path_edges(db, path)`` filtered on the ground endpoint), or None
    when the pattern isn't seedable (both ends variables — nothing to
    seed from) or not worth seeding (closure-free paths: Catalyst
    already pushes the endpoint filter through the join tree to the
    base scans).

    Semantics parity is pinned by the ground-endpoint differential
    seeds (random path expressions × random anchors vs the Python path
    algebra) plus the pytest battery."""
    s_ground = not is_var(s_item)
    o_ground = not is_var(o_item)
    if not (s_ground or o_ground) or not _contains_closure(path):
        return None
    spark = db.df.sparkSession
    seed_lit = term_lit(const_value(s_item if s_ground else o_item))
    seeds = spark.range(1).select(seed_lit.alias("n"))
    reach = _reach_via_path(db, path, seeds, forward=s_ground)
    if s_ground:
        return reach.select(seed_lit.alias("s"), F.col("x").alias("o"))
    return reach.select(F.col("x").alias("s"), seed_lit.alias("o"))


def _scan_path_pattern(db: TriplesDB, pattern, stats, total: float) -> _Scan:
    """Property-path pattern → scan over its compiled edge set (see
    ``operators.graph.path_edges``).  Subject/object positions behave
    exactly like a plain pattern: constants filter, vars project, a
    repeated var becomes an intra-row equality.  Closure forms
    materialize eagerly at compile time (path-doubling rounds under the
    session checkpoint dir — set one on a cluster); ground-endpoint
    closures take the seeded-frontier path instead
    (:func:`_seeded_path_df`)."""
    from ..operators.graph import path_edges

    s_item, path, o_item = pattern
    seeded = _seeded_path_df(db, s_item, path, o_item)
    df = seeded if seeded is not None else path_edges(db, path)
    conds = []
    first_pos_of_var: dict[str, str] = {}
    aliases: list = []
    for pos, item in (("s", s_item), ("o", o_item)):
        if is_var(item):
            v = var_name(item)
            if v in first_pos_of_var:
                conds.append(F.col(pos) == F.col(first_pos_of_var[v]))
            else:
                first_pos_of_var[v] = pos
                aliases.append(F.col(pos).alias(v))
        else:
            conds.append(F.col(pos) == term_lit(const_value(item)))
    # seeded evaluation already restricted the pair set to the ground
    # endpoint's reachable cone — estimate like a 1-ground plain scan
    # instead of the deliberately huge closure estimate, so the join
    # tree orders (and may broadcast) it sensibly
    base_est = (
        float(total) if seeded is not None else _path_est(path, stats, total)
    )
    est = base_est / (10.0 ** len(conds))
    for c in conds:
        df = df.where(c)
    vars_ = list(first_pos_of_var)
    if vars_:
        return _Scan(df.select(*aliases), vars_, max(est, 0.0))
    return _Scan(df.limit(1).select(F.lit(1).alias("__guard")), [], 1.0, guard=True)


def _scan_pattern(db: TriplesDB, pattern, stats, total: float) -> _Scan:
    """One triple pattern → filtered/projected scan of the triples DF."""
    if isinstance(pattern[1], PathExpr):
        return _scan_path_pattern(db, pattern, stats, total)
    df = db.df
    conds = []
    first_pos_of_var: dict[str, str] = {}
    aliases: list = []
    base = float(total)
    extra_ground = 0
    s_bucketed = getattr(db, "s_bucketed", False)
    for pos, item in zip(("s", "p", "o"), pattern):
        if is_var(item):
            v = var_name(item)
            if v in first_pos_of_var:
                # repeated var in one pattern ⇒ intra-row equality (src:188-191)
                conds.append(F.col(pos) == F.col(first_pos_of_var[v]))
            else:
                first_pos_of_var[v] = pos
                aliases.append(F.col(pos).alias(v))
                if pos == "s" and s_bucketed:
                    # propagate the bucket key under the var's name: the
                    # join tree adds it to subject-subject join keys, and
                    # the bucketed scans' co-partitioning elides the
                    # shuffle entirely (see TriplesDB.save_bucketed)
                    aliases.append(F.col("s_key").alias(f"__skey__{v}"))
        else:
            value = const_value(item)
            conds.append(F.col(pos) == term_lit(value))
            if pos == "s" and s_bucketed:
                # ground subject: the foldable hash equality prunes the
                # scan to a single bucket (SelectedBucketsCount 1/N);
                # subject_key applies the same float normalization the
                # store used, so hash equality tracks struct equality
                from ..db import subject_key

                conds.append(F.col("s_key") == subject_key(term_lit(value)))
            if pos == "p":
                # exact per-predicate cardinality from the one-pass stats
                k = to_term(value)
                base = float(stats.get((k[0], k[1]), 0))
                if getattr(db, "p_bucketed", False):
                    # derived partition filter: prunes p_bucket=... dirs
                    # at the parquet source (vertical partitioning)
                    from ..db import _N_PRED_BUCKETS

                    conds.append(
                        F.col("p_bucket")
                        == F.pmod(F.xxhash64(term_lit(value)), F.lit(_N_PRED_BUCKETS))
                    )
            else:
                extra_ground += 1
    # crude selectivity: each additional ground position divides candidates
    est = base / (10.0**extra_ground)
    for c in conds:
        df = df.where(c)
    vars_ = list(first_pos_of_var)
    if vars_:
        df = df.select(*aliases)
        return _Scan(df, vars_, max(est, 0.0))
    # all-ground pattern: existence guard — contributes 0 or 1 row
    return _Scan(df.limit(1).select(F.lit(1).alias("__guard")), [], 1.0, guard=True)


def _join_solutions(left_df: DataFrame, left_vars: list[str], scan: _Scan) -> tuple[DataFrame, list[str]]:
    shared = [v for v in scan.vars if v in left_vars]
    right = F.broadcast(scan.df) if scan.est <= BROADCAST_ROWS else scan.df
    if scan.guard:
        return left_df.crossJoin(right).drop("__guard"), left_vars
    if shared:
        # include the propagated bucket keys for vars both sides bind in
        # subject position: with subject-bucketed stores these joins are
        # co-partitioned by the bucket spec and need no exchange
        skeys = [
            f"__skey__{v}"
            for v in shared
            if f"__skey__{v}" in left_df.columns and f"__skey__{v}" in scan.df.columns
        ]
        out = left_df.join(right, on=shared + skeys, how="inner")
    else:
        out = left_df.crossJoin(right)
    return out, left_vars + [v for v in scan.vars if v not in left_vars]


# a var-endpoint closure pattern is seeded from the already-computed
# solution set only when some prior pattern bounds that var's values at
# or below the seeding limit — seeding from a huge frontier can EXCEED
# the all-pairs closure (per-root provenance is Σ per-root reachable
# sets, capped by |roots|·V, where all-pairs caps at V²).  r11 (verdict
# ask #8): the limit is RELATIVE, max(absolute floor, the closure's own
# estimated edge-set size from predicate_stats) — an anchor estimate of
# 10,001 over a 100k-edge graph is still far below the all-pairs cone
# and must seed, not silently fall back to all-pairs; the absolute
# floor only catches stats-starved stores where the edge estimate
# degenerates.
SEEDED_FRONTIER_EST = 10_000.0


def _closure_edge_est(path, stats, total: float) -> float:
    """Estimate of a closure pattern's underlying EDGE set — i.e.
    :func:`_path_est` with the deliberate ×100 closure bloat unwrapped.
    The bloat exists so all-pairs closures sort to the end of the join
    tree and never broadcast; for the *seeding gate* it would be
    self-defeating (every anchor estimate would pass), so the gate
    compares the anchor count against the graph the closure actually
    walks: |roots| ≤ |edges| keeps the seeded union of per-root cones
    within a constant factor of the all-pairs work."""
    if isinstance(path, Inv):
        return _closure_edge_est(path.path, stats, total)
    if isinstance(path, Seq):
        return max(_closure_edge_est(s, stats, total) for s in path.steps)
    if isinstance(path, Alt):
        return sum(_closure_edge_est(a, stats, total) for a in path.alts)
    if isinstance(path, (OneOrMore, ZeroOrMore, ZeroOrOne)):
        return _closure_edge_est(path.path, stats, total)
    return _path_est(path, stats, total)


def _compile_required(db: TriplesDB, triples, spark: SparkSession) -> tuple[DataFrame, list[str]] | None:
    """Greedy selectivity-ordered join tree over the pattern scans.

    Closure-bearing path patterns whose endpoints are BOTH variables
    are deferred to the END of the tree (r10): a closure anywhere else
    in the tree materializes all-pairs at compile time, but when a
    selective prior pattern (``var_est`` ≤ :data:`SEEDED_FRONTIER_EST`)
    already bounds one endpoint var, the closure evaluates as seeded
    frontier reachability from the computed solution set's distinct
    anchor values (:func:`_reach_via_path` — O(Σ reachable from
    anchors)) instead.  Inner joins commute, so deferral never changes
    semantics; with no usable anchor the deferred pattern falls back to
    the all-pairs scan exactly as before."""
    if not triples:
        return None
    stats = db.predicate_stats()
    total = float(db.total_triples())
    deferred_idx = {
        i
        for i, t in enumerate(triples)
        if isinstance(t[1], PathExpr)
        and _contains_closure(t[1])
        and is_var(t[0])
        and is_var(t[2])
    }
    if len(deferred_idx) == len(triples):
        # nothing to seed from — compile everything the classic way
        deferred_idx = set()
    normal = [t for i, t in enumerate(triples) if i not in deferred_idx]
    deferred = [t for i, t in enumerate(triples) if i in deferred_idx]
    scans = [_scan_pattern(db, t, stats, total) for t in normal]
    # per-var selectivity floor: the cheapest scan binding a var bounds
    # its distinct-value count — the seeding gate for deferred closures
    var_est: dict[str, float] = {}
    for sc in scans:
        for v in sc.vars:
            var_est[v] = min(var_est.get(v, float("inf")), sc.est)
    scans.sort(key=lambda s: s.est)
    first = scans.pop(0)
    df, vars_ = first.df, list(first.vars)
    if first.guard:
        df = df.drop("__guard")
        # seed with a single anonymous row; subsequent joins cross in
        df = df.select(F.lit(1).alias("__seed"))
    while scans:
        # prefer the cheapest scan that shares a var (equi-join over cross)
        idx = None
        for i, sc in enumerate(scans):
            if any(v in vars_ for v in sc.vars):
                idx = i
                break
        if idx is None:
            idx = 0
        sc = scans.pop(idx)
        df, vars_ = _join_solutions(df, vars_, sc)
    for t in deferred:
        df, vars_ = _join_deferred_closure(db, t, df, vars_, var_est, stats, total)
    if "__seed" in df.columns:
        df = df.drop("__seed")
    skey_cols = [c for c in df.columns if c.startswith("__skey__")]
    if skey_cols:
        df = df.drop(*skey_cols)
    return df, vars_


def _join_deferred_closure(
    db: TriplesDB, pattern, df, vars_, var_est, stats, total
):
    """Join one deferred var-endpoint closure pattern onto the computed
    solution set — seeded from whichever endpoint var has the smaller
    (eligible) estimate, walking forward when the subject anchors and
    backward when the object does.  The computed frontier is UNBOUNDED
    by contract, so it is never broadcast-hinted (``seeds_small=False``
    — AQE picks the join strategy)."""
    s_item, path, o_item = pattern
    sv, ov = var_name(s_item), var_name(o_item)
    limit = max(SEEDED_FRONTIER_EST, _closure_edge_est(path, stats, total))
    cands = sorted(
        (var_est[v], side, fwd, v)
        for side, (v, fwd) in enumerate(((sv, True), (ov, False)))
        if v in vars_ and var_est.get(v, float("inf")) <= limit
    )
    if not cands:
        # no selective anchor: all-pairs scan, classic join
        sc = _scan_path_pattern(db, pattern, stats, total)
        return _join_solutions(df, vars_, sc)
    _, _, fwd, anchor = cands[0]
    seeds = df.select(F.col(anchor).alias("n")).dropDuplicates()
    reach = _reach_via_path(db, path, seeds, forward=fwd, seeds_small=False)
    if sv == ov:
        # repeated var: the pattern keeps anchors that reach themselves
        pair = (
            reach.where(F.col("x") == F.col("root"))
            .select(F.col("root").alias(anchor))
            .dropDuplicates()
        )
        return df.join(pair, on=[anchor], how="inner"), vars_
    other = ov if fwd else sv
    pair = reach.select(
        F.col("root").alias(anchor), F.col("x").alias(other)
    ).dropDuplicates()
    on = [anchor] + ([other] if other in vars_ else [])
    out = df.join(pair, on=on, how="inner")
    return out, vars_ + ([other] if other not in vars_ else [])


def _values_df(spark: SparkSession, var: str, coll) -> DataFrame:
    schema = StructType([StructField(var, TERM_TYPE, nullable=False)])
    rows = [(to_term(v),) for v in (coll or [])]
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _apply_values_rows(df, vars_, vr, spark):
    """SPARQL inline data (``ValuesRows``): group rows by their
    defined-var mask; each group keeps the solutions agreeing on its
    defined ∩ bound vars (broadcast equi-join) and contributes any
    always-defined new vars as columns; groups union.  UNDEF rows with
    no defined vars keep every solution."""
    vnames = [var_name(v) for v in vr.vars]
    new_vars = [v for v in vnames if v not in vars_]
    for r in vr.rows:
        for v, x in zip(vnames, r):
            if v in new_vars and x is None:
                raise ValueError(
                    f"VALUES var {v!r} is not bound by any pattern, so "
                    "UNDEF rows cannot bind it — define it in every row"
                )
    if df is None and new_vars != vnames:
        raise ValueError("ValuesRows without required patterns must define all vars")
    if not vr.rows:
        # empty inline data: no solutions (same as Values None/empty)
        if df is None:
            return _values_df(spark, vnames[0], []), [vnames[0]]
        return df.limit(0), vars_
    groups: dict[tuple, list] = {}
    for r in vr.rows:
        groups.setdefault(tuple(x is not None for x in r), []).append(r)
    out_vars = list(vars_) + new_vars
    branches = []
    for mask, rows in groups.items():
        defined = [v for v, m in zip(vnames, mask) if m]
        schema = StructType(
            [StructField(v, TERM_TYPE, nullable=False) for v in defined]
        )
        data = [
            tuple(to_term(x) for x, m in zip(r, mask) if m) for r in rows
        ]
        vdf = F.broadcast(spark.createDataFrame(data, schema))
        if df is None:
            branches.append(vdf.select(*out_vars))
            continue
        shared = [v for v in defined if v in vars_]
        if shared:
            b = df.join(vdf, on=shared, how="inner")
        elif defined:
            b = df.crossJoin(vdf)
        else:
            # all-UNDEF row(s): unconstrained — keep every solution
            b = df
            if new_vars:  # unreachable (guarded above), defensive
                raise ValueError("UNDEF cannot bind a new var")
        branches.append(b.select(*out_vars))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    # distinct rows across mask groups can admit the same solution twice
    # — the engine's set semantics dedups downstream, but dedup here so
    # bag_semantics callers see SPARQL's per-row-join multiset only once
    # per (solution, matching-row-group) as documented
    return (out.dropDuplicates() if len(branches) > 1 else out), out_vars


def _apply_values(df, vars_, values_clauses, spark):
    """``membero`` semantics: inner join against the literal collection —
    duplicates in a sequence duplicate solutions; None/empty yields no
    solutions (reference ``src:175-176``, ``src:215-228``)."""
    for vc in values_clauses:
        if isinstance(vc, ValuesRows):
            df, vars_ = _apply_values_rows(df, vars_, vc, spark)
            continue
        v = var_name(vc.var)
        coll = list(vc.coll) if isinstance(vc.coll, (set, frozenset)) else vc.coll
        vdf = F.broadcast(_values_df(spark, v, coll))
        if df is None:
            df, vars_ = vdf, [v]
        elif v in vars_:
            df = df.join(vdf, on=[v], how="inner")
        else:
            df = df.crossJoin(vdf)
            vars_ = vars_ + [v]
    return df, vars_


def _null_term():
    return F.lit(None).cast(TERM_TYPE)


def _join_optional_branch(req_df, req_vars, block: Solutions) -> DataFrame:
    """required ⋈ one optional block (inner — the conde branch in which
    this block's goals all succeed, reference ``src:201-203``)."""
    shared = [v for v in block.vars if v in req_vars]
    clean_shared = [v for v in shared if v not in block.maybe_unbound]
    loose_shared = [v for v in shared if v in block.maybe_unbound]
    bdf = block.df
    if not shared:
        return req_df.crossJoin(bdf)
    if not loose_shared:
        return req_df.join(bdf, on=clean_shared, how="inner")
    # A shared var that is only optionally bound inside the block: an
    # unbound (NULL) block-side value unifies with anything (miniKanren
    # fresh-var semantics), so the join is null-tolerant on those vars.
    bdf2 = bdf
    for v in loose_shared:
        bdf2 = bdf2.withColumnRenamed(v, f"__b_{v}")
    cond = None
    for v in clean_shared:
        c = req_df[v] == bdf2[v]
        cond = c if cond is None else (cond & c)
    for v in loose_shared:
        c = bdf2[f"__b_{v}"].isNull() | (req_df[v] == bdf2[f"__b_{v}"])
        cond = c if cond is None else (cond & c)
    out = req_df.join(bdf2, on=cond, how="inner")
    for v in clean_shared:
        out = out.drop(bdf2[v])
    for v in loose_shared:
        out = out.drop(f"__b_{v}")
    return out


def _compile_subselect(
    db: TriplesDB, sq: SubSelect, spark: SparkSession
) -> tuple[DataFrame, list[str]]:
    """SubSelect → (solutions DataFrame, visible var names).  Plain
    flavor delegates to ``select_df`` (projection scoping + modifiers);
    aggregate flavor to ``select_agg``, whose plain-typed aggregate
    columns are lifted back into TERM structs (long→int, double→double,
    string→str — the ``termcols`` encodings, so they equi-join and
    FILTER like any var) under the ``aggs`` keys' var names."""
    from ..functions.termcols import double_col, int_col, str_col
    from ..query import select_agg, select_df

    pats = list(sq.patterns)
    if not sq.aggs:
        out = select_df(
            list(sq.vars),
            pats,
            db,
            order_by=list(sq.order_by) if sq.order_by else None,
            limit=sq.limit,
            offset=sq.offset,
        )
        return out, [var_name(v) for v in sq.vars]
    aggs = {str(k): v for k, v in sq.aggs.items()}
    out = select_agg(
        list(sq.vars),
        aggs,
        pats,
        db,
        order_by=list(sq.order_by) if sq.order_by else None,
        limit=sq.limit,
        offset=sq.offset,
    )
    cols = [F.col(f"`{var_name(v)}`").alias(var_name(v)) for v in sq.vars]
    names = [var_name(v) for v in sq.vars]
    for key in aggs:
        vn = var_name(key)
        c = F.col(f"`{key}`")
        dt = dict(out.dtypes)[key]
        if dt in ("bigint", "int", "smallint", "tinyint"):
            term = int_col(c)
        elif dt in ("double", "float") or dt.startswith("decimal"):
            term = double_col(c.cast("double"))
        elif dt == "string":
            term = str_col(c)
        else:
            raise ValueError(
                f"subquery aggregate {key!r} has unsupported type {dt!r}"
            )
        cols.append(term.alias(vn))
        names.append(vn)
    return out.select(*cols), names


def solve(db: TriplesDB, patterns: Sequence[Any], spark: SparkSession | None = None) -> Solutions:
    """Compile a full pattern list to its raw solution DataFrame.

    Equivalent of the reference's ``solve*`` (``src:252-261``): validate,
    conjoin required goals, then disjoin optional branches.  Unbound
    optional vars are NULL structs here; the query layer turns them into
    numbered ``_N`` markers.
    """
    spark = spark or SparkSession.getActiveSession()
    validate_patterns(patterns)
    (
        triples,
        values_clauses,
        optionals,
        filters,
        binds,
        negations,
        subqueries,
    ) = _split_clauses(patterns)

    required = _compile_required(db, triples, spark)
    if required is None:
        df, vars_ = None, []
    else:
        df, vars_ = required

    # subqueries join like additional solution relations: on shared
    # projected vars (SPARQL solution-mapping join), cartesian when
    # disjoint; their own modifiers already applied INSIDE.  They join
    # BEFORE the VALUES clauses (ADVICE r10): solution-mapping joins
    # commute, but ValuesRows' bound-var bookkeeping must see
    # subquery-projected vars as bound — applied first, a VALUES over a
    # var bound only by a subquery mis-classified it as new (UNDEF rows
    # rejected; defined rows took a cross-join instead of a constraint
    # join)
    for sq in subqueries:
        sdf, svars = _compile_subselect(db, sq, spark)
        if df is None:
            df, vars_ = sdf, svars
        else:
            shared = [v for v in svars if v in vars_]
            if shared:
                df = df.join(sdf, on=shared, how="inner")
            else:
                df = df.crossJoin(sdf)
            vars_ = list(vars_) + [v for v in svars if v not in vars_]
    df, vars_ = _apply_values(df, vars_, values_clauses, spark)

    if (filters or binds or negations) and df is None:
        raise ValueError("FILTER / BIND / NOT EXISTS / MINUS require required patterns")
    for flt in filters:
        # the predicate becomes an ordinary plan condition — Catalyst can
        # push it into the joins/scans like any WHERE clause
        df = df.where(flt.fn({v: F.col(v) for v in vars_}))
    for b in binds:
        # BIND: a plain projection extension — stays in whole-stage
        # codegen; later binds and negation anti-joins see the new var
        bn = var_name(b.var)
        if bn in vars_:
            raise ValueError(f"BIND target {bn!r} is already bound")
        # no cast to TERM_TYPE: the termcols constructors already emit the
        # TERM field layout, and casting would fail on their (nullable)
        # computed fields vs the schema's NOT NULL marks — struct
        # equality downstream compares by value, not nullability
        df = df.select("*", b.fn({v: F.col(v) for v in vars_}).alias(bn))
        vars_ = list(vars_) + [bn]
    for neg in negations:
        sub = solve(db, list(neg.patterns), spark)
        shared = [v for v in sub.vars if v in vars_]
        how = "left_semi" if isinstance(neg, Exists) else "left_anti"
        if shared:
            df = df.join(
                sub.df.select(*shared).dropDuplicates(), on=shared, how=how
            )
        elif isinstance(neg, (NotExists, Exists)):
            # uncorrelated EXISTS/NOT EXISTS: the block matching at all
            # keeps/empties the whole result — a semi/anti-join against a
            # 1-row probe, nothing collects to the driver
            df = df.join(sub.df.limit(1), F.lit(True), how)
        # uncorrelated MINUS removes nothing (SPARQL dom-disjoint rule)

    has_required = bool(triples or values_clauses or subqueries)
    required_vars = list(vars_)

    if not optionals:
        if df is None:
            raise ValueError("query has no patterns")
        return Solutions(df, vars_, required_vars, has_required)

    # compile each optional block independently (nested optionals recurse)
    blocks = [solve(db, opt.patterns, spark) for opt in optionals]

    all_vars = list(vars_)
    for b in blocks:
        for v in b.vars:
            if v not in all_vars:
                all_vars.append(v)

    def pad(frame: DataFrame, have: list[str]) -> DataFrame:
        cols = [F.col(v) if v in have else _null_term().alias(v) for v in all_vars]
        return frame.select(*cols)

    branches: list[DataFrame] = []
    if df is not None:
        for b in blocks:
            joined = _join_optional_branch(df, vars_, b)
            branches.append(pad(joined, vars_ + [v for v in b.vars if v not in vars_]))
        if has_required:
            branches.append(pad(df, vars_))  # the l/succeed branch (src:202-203)
    else:
        # optional-only query: no succeed branch — each block stands alone
        # (reference guard src:202-203; test:469-500)
        branches = [pad(b.df, b.vars) for b in blocks]

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)

    maybe_unbound = {v for v in all_vars if v not in required_vars}
    for b in blocks:
        maybe_unbound |= b.maybe_unbound
    return Solutions(out, all_vars, required_vars, has_required, maybe_unbound)
