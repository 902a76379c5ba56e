"""Query verbs: ``select``, ``select_1``, ``ask``, ``construct``,
``construct_1``, ``build``, ``build_1`` (+ DataFrame-returning
``select_df`` for composition at scale).

Result-shaping semantics replicated from the reference:

- **select regroup** (``src/grafter/matcha/alpha.clj:374-412``): raw
  solutions are grouped by the required projected vars; per group each
  *optional* projected var contributes the set of its bound values (all
  unbound → a numbered ``_N`` marker); the group emits the cartesian
  product of those per-var value lists.  Net effect: independent
  left-join semantics per optional var with union across blocks
  (see SURVEY §2.4.2).
- **unbound markers** are first-class terms (``kind='unbound'``,
  lex ``_N``) with deterministic numbering; the reference's numbers are
  evaluation-order dependent so comparisons must be marker-blind
  (SURVEY §2.4.3).
- **construct** (``src:641-665``): per-solution template instantiation;
  subject-grouping when the template is a map with ``:grafter.rdf/uri``
  (``src:546-553``) merging colliding keys into sets.
- **build** (``src:580-627``): configurable subject key, unbound keys
  dropped (``src:464-486``), singleton sets flattened to scalars
  (``src:555-569``).
- empty results → ``None`` (the reference returns ``nil``, ``src:258``).

All verbs accept a :class:`~matcha_spark.db.TriplesDB`, a TERM-struct
DataFrame, or a raw Python sequence of triples (auto-indexed), and all
have a curried form: omit ``db`` to get back a function of the db
(reference arity symmetry, ``test:362-398``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .db import ensure_db
from .patterns import Optional, Values, find_vars, is_var, var_name
from .plans.compiler import Solutions, solve
from .terms import TERM_TYPE, Keyword, Unbound, from_term, kw, sort_key

GRAFTER_URI = kw("grafter.rdf/uri")

__all__ = [
    "select",
    "select_1",
    "select_df",
    "describe",
    "select_agg",
    "ask",
    "construct",
    "construct_1",
    "construct_db",
    "build",
    "build_df",
    "build_1",
    "GRAFTER_URI",
]


# ---------------------------------------------------------------------------
# shared plumbing
# ---------------------------------------------------------------------------


def _mandatory_vars(patterns) -> set[str]:
    """Vars bound by the top-level required clauses — the reference's
    ``decompose-optionals`` mandatory set (``src:301-313``)."""
    req = [p for p in patterns if not isinstance(p, Optional)]
    return set(find_vars(req))


def _with_missing_vars(sols: Solutions, pvars: list[str]) -> DataFrame:
    """Project, adding NULL columns for projected vars never bound by any
    pattern (they behave as always-unbound optionals — exercised by the
    reference's ``optionals-with-values`` test, ``test:792-807``)."""
    cols = [
        F.col(v) if v in sols.vars else F.lit(None).cast(TERM_TYPE).alias(v)
        for v in pvars
    ]
    return sols.df.select(*cols)


def _marker_struct(num_col):
    lex = F.concat(F.lit("_"), num_col.cast("string"))
    return F.struct(
        F.lit("unbound").alias("kind"),
        lex.alias("lex"),
        num_col.cast("double").alias("num"),
        F.lit("").alias("lang"),
        F.lit("").alias("dt"),
    )


def _regroup(
    df: DataFrame, req_proj: list[str], opt_proj: list[str], bag: bool = False
) -> DataFrame:
    """The select-level optional regroup (``src:374-412``): group by
    required vars, per-var collected bound values (distinct under the
    default set semantics, multiset under ``bag``), empty → one numbered
    marker per (group, var), then cartesian via sequential explode."""
    gcols = list(req_proj)
    synthetic_group = not gcols
    if synthetic_group:
        # groupBy on a literal key: an empty input yields *no* groups, which
        # implements the optional-only-query rule (src:202-203, test:476-479)
        df = df.withColumn("__g", F.lit(1))
        gcols = ["__g"]
    collect = F.collect_list if bag else F.collect_set
    agg = df.groupBy(*gcols).agg(
        *[collect(F.col(v)).alias(v) for v in opt_proj]
    )
    # deterministic marker numbering WITHOUT a global sort: markers only
    # need per-(group, var) uniqueness and comparisons are marker-blind
    # (SURVEY §2.4.3), so the number is a hash of (var index, group key) —
    # shuffle-safe at any group count (a row_number window here would
    # force every optional-projecting select through one partition)
    for i, v in enumerate(opt_proj):
        n = F.pmod(
            F.xxhash64(F.lit(i), *[F.col(c) for c in gcols]), F.lit(2**62)
        )
        agg = agg.withColumn(
            v,
            F.when(F.size(F.col(v)) == 0, F.array(_marker_struct(n))).otherwise(
                F.col(v)
            ),
        )
        agg = agg.withColumn(v, F.explode(F.col(v)))
    return agg.drop(*(["__g"] if synthetic_group else []))


def _solve_projected(db, patterns, pvars: list[str], bag: bool = False) -> DataFrame:
    """Raw solutions projected to ``pvars`` with the select regroup
    applied to optional projected vars.

    ``bag=True`` keeps duplicate solutions (one row per derivation —
    the reference's ``run*`` enumeration can emit duplicates,
    ``src:252-261``; the default set semantics is the engine's
    documented deviation, PARITY.md)."""
    tdb = ensure_db(db)
    sols = solve(tdb, patterns)
    mandatory = _mandatory_vars(patterns)
    req_proj = [v for v in pvars if v in mandatory]
    opt_proj = [v for v in pvars if v not in mandatory]
    projected = _with_missing_vars(sols, pvars)
    if not opt_proj:
        if bag:
            # one row per derivation path — no distinct anywhere
            return projected
        # regroup with no optional columns collapses duplicate solutions
        # (reference group-by does the same, src:396-399)
        return projected.dropDuplicates()
    return _regroup(projected, req_proj, opt_proj, bag=bag).select(*pvars)


def _decode_rows(df: DataFrame, pvars: list[str]) -> list[tuple]:
    rows = df.collect()
    out = [tuple(from_term(r[v]) for v in pvars) for r in rows]
    out.sort(key=lambda t: tuple(sort_key(v) for v in t))
    return out


def _normalize_patterns(patterns) -> list:
    if not isinstance(patterns, (list, tuple)):
        raise TypeError(f"patterns must be a list, got {type(patterns).__name__}")
    return list(patterns)


# ---------------------------------------------------------------------------
# select / ask
# ---------------------------------------------------------------------------


def select_df(
    project_vars,
    patterns,
    db,
    bag_semantics: bool = False,
    order_by=None,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """DataFrame-returning select: one TERM-struct column per projected
    var.  The scale path — no driver collection, composable with any
    further DataFrame transformation.

    ``bag_semantics=True`` emits one row per derivation (multiset
    parity with the reference's ``run*`` enumeration) instead of the
    default canonical set semantics.

    ``order_by``/``limit``/``offset`` (r09 — SPARQL 1.1 §15 solution
    modifiers on PLAIN selects, mirroring :func:`select_agg`'s):
    ``order_by`` is a sequence of projected var names, ``"-?v"`` for
    descending; TERM columns sort in canonical term order
    (lexicographic struct order).  With a ``limit`` Catalyst plans a
    TakeOrdered (top-k per partition + merge), never a global sort;
    ``offset`` without ``order_by`` would be nondeterministic and
    raises."""
    if offset is not None and not order_by:
        raise ValueError("offset without order_by is nondeterministic")
    patterns = _normalize_patterns(patterns)
    pvars = [var_name(v) for v in project_vars] if project_vars else find_vars(patterns)
    out = _solve_projected(db, patterns, pvars, bag=bag_semantics)
    if order_by:
        sort_cols = []
        for spec in order_by:
            desc = spec.startswith("-")
            vn = var_name(spec[1:] if desc else spec)
            if vn not in pvars:
                raise ValueError(f"order_by var {spec!r} is not projected")
            c = F.col(f"`{vn}`")
            sort_cols.append(c.desc() if desc else c.asc())
        out = out.orderBy(*sort_cols)
    if offset is not None:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def describe(node, db, incoming: bool = True) -> DataFrame:
    """SPARQL ``DESCRIBE``-lite: the sub-graph about ``node`` — every
    triple whose subject is the node, plus (``incoming=True``, the
    default) every triple pointing AT it.  SPARQL §16.4 leaves the
    description shape service-defined; this is the symmetric
    one-hop form (the classic CBD without bnode chasing — the engine's
    bnodes are plain terms, so there is nothing to chase).

    Returns the raw ``(s, p, o)`` TERM DataFrame — a graph, directly
    composable with :func:`construct_db` output, ``merge_dbs``, and the
    N-Triples writers.  Scale shape: one or two pushdown-filtered scans
    of the (cached) triple store and a union; no joins, no driver
    collection."""
    from .terms import term_lit

    d = ensure_db(db)
    t = term_lit(node)
    out = d.df.where(F.col("s") == t)
    if incoming:
        # a self-loop triple matches both scans — dedup the union
        out = out.unionByName(d.df.where(F.col("o") == t)).dropDuplicates()
    return out


def explain_query(patterns, db, mode: str = "formatted") -> str:
    """The physical plan Spark will run for a BGP query, WITHOUT
    executing it — the developer surface for the plan-audit loop this
    repo's own ``tests/test_plans.py`` codifies (check pushdown, join
    strategy, exchange count before scaling a query up).

    ``mode``: ``simple`` | ``extended`` | ``codegen`` | ``cost`` |
    ``formatted`` (Spark's explain modes)."""
    pats = _normalize_patterns(patterns)
    df = _solve_projected(db, pats, find_vars(pats))
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


_AGG_NUMERIC_KINDS = ("int", "double")


def select_agg(
    group_vars,
    aggs: dict,
    patterns,
    db=None,
    concat_sep: str = " ",
    having=None,
    order_by=None,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """SPARQL 1.1-style ``GROUP BY`` + aggregates over BGP solutions
    (the reference has no aggregation verb; this is the Spark-native
    extension the relational layer's ``groupBy`` suggests, expressed at
    the query-verb level).

    ``aggs`` maps output column name → ``(op, var)`` with ``op`` one of
    ``count`` (``var=None`` → COUNT(*)), ``count_distinct``, ``sum``,
    ``avg``, ``min``, ``max``, ``sample``, ``group_concat``,
    ``group_concat_distinct`` — or ``("expr", fn)``, the custom-
    aggregate escape hatch: ``fn`` receives a var→TERM-Column accessor
    and returns ANY Spark aggregate Column over the solution multiset
    (e.g. ``lambda v: F.sum(F.length(v("?name")["lex"]))``, or a
    ``percentile_approx``/sketch aggregate) — the UDAF surface without
    leaving codegen; compose with ``functions.termfns`` for term-aware
    pieces.

    Semantics (SPARQL 1.1 §11, divergences documented):

    - aggregation runs over the solution **multiset** (``bag``
      solutions — one row per derivation), as SPARQL requires;
    - ``count(?v)`` counts *bound* bindings (NULL and ``unbound``
      markers excluded); ``count_distinct`` likewise, distinct by term;
    - ``sum/avg/min/max`` aggregate the numeric mirror of numeric terms
      (``int``/``double``); non-numeric bindings are *ignored* rather
      than erroring the group to unbound as strict SPARQL does — the
      skip-nulls convention every SQL engine shares;
    - ``sample`` is the canonical-least bound term (deterministic,
      unlike SPARQL's implementation-defined SAMPLE) returned as a TERM
      struct;
    - ``group_concat`` concatenates the lexical forms sorted
      canonically (deterministic) with ``concat_sep``;
    - ``having`` (SPARQL HAVING) maps the output columns
      ({name: Column}, group vars and aggregates alike) to a boolean
      Column applied after aggregation;
    - ``order_by``/``limit``/``offset`` (SPARQL 1.1 §15 solution
      modifiers over aggregated solutions): ``order_by`` is a sequence
      of output column names, ``"-name"`` for descending — TERM-struct
      columns sort in canonical term order (lexicographic struct
      order), aggregate columns numerically.  With a ``limit``,
      Catalyst plans a TakeOrdered (top-k per partition + merge), never
      a global sort.  ``offset`` without ``order_by`` would be
      nondeterministic, so it requires one.

    Returns a DataFrame: one TERM-struct column per group var plus one
    plain column per aggregate.  Curried when ``db`` is omitted.  Scale
    shape: one hash aggregate over the solution stream — partial
    map-side aggregation applies to every op above except the
    ``collect_list`` inside ``group_concat``."""
    if db is None:
        return lambda db_: select_agg(
            group_vars,
            aggs,
            patterns,
            db_,
            concat_sep=concat_sep,
            having=having,
            order_by=order_by,
            limit=limit,
            offset=offset,
        )
    if offset is not None and not order_by:
        raise ValueError("offset without order_by is nondeterministic")
    patterns = _normalize_patterns(patterns)
    gvars = [var_name(v) for v in group_vars]
    for op, v in aggs.values():
        if op == "expr":
            if not callable(v):
                raise ValueError("('expr', fn) needs a callable")
            continue
        if v is not None and var_name(v) not in find_vars(patterns):
            raise ValueError(f"aggregated var {v!r} not bound by any pattern")
    # aggregate over COMPLETE solutions (every pattern var projected):
    # SPARQL aggregates see the WHERE clause's solution multiset, one
    # row per derivation.  Projecting down to the grouped/aggregated
    # vars first would instead trigger the matcha optional-regroup
    # (per-group optional value sets), silently collapsing rows an
    # aggregate must count — e.g. an OPTIONAL var's unbound marker
    # vanishes whenever its group has one bound value.
    sols = _solve_projected(db, patterns, find_vars(patterns), bag=True)

    def col(vn):
        return F.col(f"`{vn}`")

    def bound(vn):
        return col(vn).isNotNull() & (col(vn)["kind"] != "unbound")

    def num_of(vn):
        return F.when(
            bound(vn) & col(vn)["kind"].isin(*_AGG_NUMERIC_KINDS),
            col(vn)["num"],
        )

    def lexish(vn):
        # doubles carry their value in the num mirror (lex is empty)
        return F.when(col(vn)["kind"] == "double", col(vn)["num"].cast("string")).otherwise(
            col(vn)["lex"]
        )

    exprs = []
    for out, (op, v) in aggs.items():
        if op == "expr":
            exprs.append(v(lambda var: col(var_name(var))).alias(out))
            continue
        vn = var_name(v) if v is not None else None
        if op == "count":
            e = F.count(F.when(bound(vn), F.lit(1))) if vn else F.count(F.lit(1))
        elif op == "count_distinct":
            e = F.countDistinct(F.when(bound(vn), col(vn)))
        elif op in ("sum", "avg", "min", "max"):
            e = getattr(F, op)(num_of(vn))
        elif op == "sample":
            e = F.min(F.when(bound(vn), col(vn)))
        elif op == "group_concat":
            e = F.array_join(
                F.sort_array(F.collect_list(F.when(bound(vn), lexish(vn)))),
                concat_sep,
            )
        elif op == "group_concat_distinct":
            e = F.array_join(
                F.array_sort(
                    F.array_distinct(F.collect_list(F.when(bound(vn), lexish(vn))))
                ),
                concat_sep,
            )
        else:
            raise ValueError(f"unknown aggregate op: {op!r}")
        exprs.append(e.alias(out))
    grouped = sols.groupBy(*[col(g).alias(g) for g in gvars]) if gvars else sols.groupBy()
    out = grouped.agg(*exprs)
    if having is not None:
        # SPARQL HAVING: a predicate over the aggregate output columns
        # ({name: Column} — group vars and aggregates alike); a plain
        # post-aggregation filter in the plan
        out = out.where(having({c: F.col(f"`{c}`") for c in out.columns}))
    if order_by:
        sort_cols = []
        for spec in order_by:
            if spec.startswith("-"):
                sort_cols.append(F.col(f"`{spec[1:]}`").desc())
            else:
                sort_cols.append(F.col(f"`{spec}`").asc())
        out = out.orderBy(*sort_cols)
    if offset is not None:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def select(*args, db=None, bag_semantics: bool = False):
    """``select(patterns)``, ``select(vars, patterns)`` → curried;
    ``select(vars, patterns, db)`` / ``db=`` kwarg → direct.

    Returns a list of tuples in projection order — scalars when exactly
    one var is projected (``src:375-381``) — or ``None`` when empty
    (``src:258``).  Output is canonically sorted (the reference's order
    is engine-incidental, SURVEY §2.4.7).
    """
    if len(args) == 1:
        pvars_raw, patterns = None, args[0]
    elif len(args) == 2:
        pvars_raw, patterns = args
    elif len(args) == 3:
        pvars_raw, patterns, db = args
    else:
        raise TypeError("select takes (patterns), (vars, patterns) or (vars, patterns, db)")
    patterns = _normalize_patterns(patterns)
    pvars = [var_name(v) for v in pvars_raw] if pvars_raw is not None else find_vars(patterns)
    if db is None:
        return lambda db_: select(pvars, patterns, db_, bag_semantics=bag_semantics)
    out_df = _solve_projected(db, patterns, pvars, bag=bag_semantics)
    decoded = _decode_rows(out_df, pvars)
    if len(pvars) == 1:
        decoded = [t[0] for t in decoded]
    return decoded or None


def select_1(*args, db=None):
    """First solution (canonical order) or None (``src:414-431``).

    The reference takes ``first`` of a *lazy* seq; the Spark analog is a
    plan-level top-1 (``orderBy(...).limit(1)`` compiles to
    TakeOrderedAndProject: each partition keeps a 1-row prefix and only
    those prefixes reach the driver) instead of collecting and sorting
    the whole result like :func:`select` must."""
    if len(args) == 3:
        *rest, db = args
        args = tuple(rest)
    if db is None:
        return lambda db_: select_1(*args, db=db_)
    if len(args) == 1:
        pvars_raw, patterns = None, args[0]
    elif len(args) == 2:
        pvars_raw, patterns = args
    else:
        raise TypeError("select_1 takes (patterns) or (vars, patterns) [+ db]")
    patterns = _normalize_patterns(patterns)
    pvars = [var_name(v) for v in pvars_raw] if pvars_raw is not None else find_vars(patterns)
    out_df = _solve_projected(db, patterns, pvars)
    # canonical order == lexicographic TERM-struct order (sort_key IS the
    # term tuple), so the driver-side sort pushes down to the plan
    rows = out_df.orderBy(*[F.col(v) for v in pvars]).limit(1).collect()
    if not rows:
        return None
    t = tuple(from_term(rows[0][v]) for v in pvars)
    return t[0] if len(pvars) == 1 else t


def _first(res):
    return res[0] if res else None


def ask(patterns, db=None):
    """Existence check (``src:713-722``): True iff the BGP has any
    solution.  Curried when ``db`` omitted."""
    patterns = _normalize_patterns(patterns)
    if db is None:
        return lambda db_: ask(patterns, db_)
    tdb = ensure_db(db)
    sols = solve(tdb, patterns)
    return not sols.df.isEmpty()


# ---------------------------------------------------------------------------
# template machinery (construct / build)
# ---------------------------------------------------------------------------


def _find_vars_in_tree(tree) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()

    def visit(x):
        if is_var(x):
            n = var_name(x)
            if n not in seen:
                seen.add(n)
                out.append(n)
        elif isinstance(x, dict):
            for k, v in x.items():
                visit(k)
                visit(v)
        elif isinstance(x, (list, tuple, set, frozenset)):
            for e in x:
                visit(e)

    visit(tree)
    return out


def _instantiate(template, binding: dict):
    """postwalk-replace of ``?vars`` with bound values
    (``src:459-462``); Python sets become frozensets for hashability."""
    if is_var(template):
        return binding[var_name(template)]
    if isinstance(template, dict):
        return {
            _instantiate(k, binding): _instantiate(v, binding)
            for k, v in template.items()
        }
    if isinstance(template, list):
        return [_instantiate(e, binding) for e in template]
    if isinstance(template, tuple):
        return tuple(_instantiate(e, binding) for e in template)
    if isinstance(template, (set, frozenset)):
        return frozenset(_instantiate(e, binding) for e in template)
    return template


class _UnboundCell:
    """Pre-decode sentinel for a SQL-NULL solution cell.  Distinct from
    a bound nil value: nil encodes as a ``kind='null'`` term struct,
    while an unbound logic var is a NULL struct — the distinction must
    be made BEFORE ``from_term`` collapses both to ``None``."""

    __slots__ = ()

    def sort_marker(self):
        return ("~unbound", "", 0.0, "", "")


_UNBOUND_CELL = _UnboundCell()


def _solutions_as_bindings(db, patterns, pvars: list[str]) -> list[dict]:
    """Distinct raw solutions decoded to ``{?var: value}`` binding maps
    (``unify-solutions``, ``src:447-457``), with NULL (unbound) decoded
    to numbered :class:`Unbound` markers in canonical row order."""
    tdb = ensure_db(db)
    sols = solve(tdb, patterns)
    df = _with_missing_vars(sols, pvars).dropDuplicates()
    rows = [
        tuple(
            _UNBOUND_CELL if r[v] is None else from_term(r[v]) for v in pvars
        )
        for r in df.collect()
    ]
    rows.sort(
        key=lambda t: tuple(
            v.sort_marker() if isinstance(v, _UnboundCell) else sort_key(v)
            for v in t
        )
    )
    counter = [0]
    out = []
    for row in rows:
        b: dict[str, Any] = {}
        for v, val in zip(pvars, row):
            if isinstance(val, _UnboundCell):
                val = Unbound(counter[0])
                counter[0] += 1
            b[v] = val
        out.append(b)
    return out


def _freeze(x):
    """Hashable mirror of a decoded value, for grouping/dedup."""
    if isinstance(x, dict):
        return ("__dict", tuple(sorted(((_freeze(k), _freeze(v)) for k, v in x.items()), key=repr)))
    if isinstance(x, list):
        return ("__list", tuple(_freeze(e) for e in x))
    if isinstance(x, (set, frozenset)):
        return ("__set", tuple(sorted((_freeze(e) for e in x), key=repr)))
    return x


class _MergedVal:
    """merge-with set-conj semantics (``src:497-512``): scalar on first
    occurrence, collection after a collision (sets in the reference;
    a deduped list here when values are unhashable)."""

    def __init__(self, first, key=None):
        self.values = [first]
        self.collided = False
        self.key = key

    def add(self, v):
        self.collided = True
        if _freeze(v) not in {_freeze(x) for x in self.values}:
            self.values.append(v)

    def result(self, flatten_singletons: bool):
        if not self.collided or (flatten_singletons and len(self.values) == 1):
            return self.values[0]
        try:
            return set(self.values)
        except TypeError:
            return self.values


def _group_maps(maps: list[dict], subject_key, *, flatten_singletons: bool, drop_unbound: bool) -> list[dict]:
    """Group instantiated maps by subject key and merge predicate values
    (construct: ``src:546-553``; build: ``src:571-578`` + cleanup
    ``src:555-569``)."""
    groups: dict = {}
    order: list = []
    for m in maps:
        subj = m.get(subject_key)
        fs = _freeze(subj)
        if fs not in groups:
            groups[fs] = (subj, {})
            order.append(fs)
        _, acc = groups[fs]
        for k, v in m.items():
            if k == subject_key:
                continue
            fk = _freeze(k)
            if fk in acc:
                acc[fk].add(v)
            else:
                acc[fk] = _MergedVal(v, key=k)
    out = []
    for fs in order:
        subj, acc = groups[fs]
        m = {subject_key: subj}
        for fk, merged in acc.items():
            val = merged.result(flatten_singletons)
            if drop_unbound and (isinstance(val, Unbound) or isinstance(merged.key, Unbound)):
                continue
            m[merged.key] = val
        out.append(m)
    return out


def construct(*args, db=None):
    """``construct(template, patterns[, db])`` — instantiate an arbitrary
    Python data template per solution (``src:641-665``); templates that
    are dicts containing :data:`GRAFTER_URI` are grouped by subject
    (``src:546-553``).  Empty → None."""
    if len(args) == 2:
        template, patterns = args
    elif len(args) == 3:
        template, patterns, db = args
    else:
        raise TypeError("construct takes (template, patterns[, db])")
    patterns = _normalize_patterns(patterns)
    if db is None:
        return lambda db_: construct(template, patterns, db_)
    pvars = _find_vars_in_tree(template)
    bindings = _solutions_as_bindings(db, patterns, pvars)
    results = [_instantiate(template, b) for b in bindings]
    # dedupe instantiated structures (reference solutions are already
    # distinct per projected tuple at this data shape)
    seen = set()
    deduped = []
    for r in results:
        f = _freeze(r)
        if f not in seen:
            seen.add(f)
            deduped.append(r)
    if isinstance(template, dict) and GRAFTER_URI in template:
        deduped = _group_maps(
            deduped, GRAFTER_URI, flatten_singletons=False, drop_unbound=False
        )
    return deduped or None


def construct_1(*args, db=None):
    if len(args) == 3:
        *rest, db = args
        args = tuple(rest)
    if db is None:
        inner = construct(*args)
        return lambda db_: _first(inner(db_))
    return _first(construct(*args, db=db))


def build(*args, db=None):
    """``build(subject, template, patterns[, db])`` — subject-grouped
    resource maps (``src:580-627``).

    ``subject`` is a ``?var``, a concrete value, or a 2-tuple
    ``(key, var_or_value)``; default key is :data:`GRAFTER_URI`
    (``src:606-608``).  Unbound keys are dropped and singleton sets
    flattened to scalars (``src:555-569``, ``src:464-486``).
    """
    if len(args) == 3:
        subject, template, patterns = args
    elif len(args) == 4:
        subject, template, patterns, db = args
    else:
        raise TypeError("build takes (subject, template, patterns[, db])")
    patterns = _normalize_patterns(patterns)
    if db is None:
        return lambda db_: build(subject, template, patterns, db_)
    if isinstance(subject, tuple) and len(subject) == 2:
        subject_key, subject_var = subject
    else:
        subject_key, subject_var = GRAFTER_URI, subject
    tvars = _find_vars_in_tree(template)
    pvars = ([var_name(subject_var)] if is_var(subject_var) else []) + [
        v for v in tvars if not (is_var(subject_var) and v == var_name(subject_var))
    ]
    bindings = _solutions_as_bindings(db, patterns, pvars)
    full_template = {subject_key: subject_var, **template}
    results = [_instantiate(full_template, b) for b in bindings]
    seen = set()
    deduped = []
    for r in results:
        # drop top-level unbound-valued keys before grouping
        # (handle-optionals, src:464-486)
        r = {k: v for k, v in r.items() if not isinstance(v, Unbound) or k == subject_key}
        f = _freeze(r)
        if f not in seen:
            seen.add(f)
            deduped.append(r)
    grouped = _group_maps(
        deduped, subject_key, flatten_singletons=True, drop_unbound=True
    )
    # drop groups whose subject itself is unbound
    grouped = [g for g in grouped if not isinstance(g.get(subject_key), Unbound)]
    return grouped or None


def build_df(subject_var, template: dict, patterns, db) -> DataFrame:
    """Distributed ``build``: subject-grouped aggregation that never
    collects to the driver — the 100 TB path for ``build``-shaped
    workloads (the classic ``build`` returns Python dicts by contract
    and therefore collects).

    Requires a static-key template ``{key: "?var"}`` (the common case;
    var-keyed templates like ``{?p ?o}`` need the driver-side verb).
    Returns one row per subject with an array<TERM> column per key
    (unbounds dropped; empty arrays where nothing bound), aggregated
    with ``groupBy(subject).agg(collect_set(...))`` — one shuffle on the
    subject key.
    """
    patterns = _normalize_patterns(patterns)
    if not is_var(subject_var):
        raise TypeError("build_df requires a ?var subject")
    for k, v in template.items():
        if is_var(k):
            raise TypeError("build_df requires static template keys")
        if not is_var(v):
            raise TypeError("build_df requires ?var template values")
    sv = var_name(subject_var)
    pvars = [sv] + [var_name(v) for v in template.values()]
    tdb = ensure_db(db)
    sols = solve(tdb, patterns)
    df = _with_missing_vars(sols, pvars)
    aggs = [
        F.array_sort(F.collect_set(F.col(var_name(v)))).alias(str(k))
        for k, v in template.items()
    ]
    return df.groupBy(F.col(sv).alias("subject")).agg(*aggs)


def construct_db(triple_templates, patterns, db):
    """Distributed CONSTRUCT: materialize a *new graph* from template
    triples instantiated per solution — the 100 TB path for
    graph-to-graph transformation (the classic :func:`construct` returns
    Python data by contract and therefore collects; this never leaves
    the cluster).

    ``triple_templates`` is a list of 3-tuples whose elements are
    ``?vars`` or constants.  Each template contributes one narrow
    projection of the solution set; the union is deduped into a
    :class:`~matcha_spark.db.TriplesDB` (set semantics, same as
    ``index-triples``).  Solutions with an unbound var in a template
    position drop that template row (SPARQL CONSTRUCT semantics;
    matches the reference's unbound-key dropping, ``src:464-486``).
    """
    from .db import TriplesDB
    from .terms import term_lit

    patterns = _normalize_patterns(patterns)
    norm = []
    for t in triple_templates:
        t = tuple(t)
        if len(t) != 3:
            raise TypeError(f"construct_db template must be 3-tuples, got {t!r}")
        norm.append(t)
    if not norm:
        raise TypeError("construct_db requires at least one template triple")
    tvars = _find_vars_in_tree([list(t) for t in norm])
    tdb = ensure_db(db)
    sols = solve(tdb, patterns)
    sdf = _with_missing_vars(sols, tvars) if tvars else sols.df
    parts = []
    for s, p, o in norm:
        cols = []
        null_guards = []
        for pos, elem in zip(("s", "p", "o"), (s, p, o)):
            if is_var(elem):
                c = F.col(var_name(elem))
                null_guards.append(c.isNotNull())
                cols.append(c.alias(pos))
            else:
                cols.append(term_lit(elem).alias(pos))
        part = sdf
        for g in null_guards:
            part = part.where(g)
        parts.append(part.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return TriplesDB.from_df(out, dedup=True, cache=False)


def build_1(*args, db=None):
    if len(args) == 4:
        *rest, db = args
        args = tuple(rest)
    if db is None:
        inner = build(*args)
        return lambda db_: _first(inner(db_))
    return _first(build(*args, db=db))
