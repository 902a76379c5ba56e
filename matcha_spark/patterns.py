"""Query AST: triple patterns, ``values`` and ``optional`` clauses.

The reference expresses queries as Clojure macro syntax validated by a
spec grammar (``src/grafter/matcha/alpha.clj:130-173``).  In Python the
query is plain data:

- a *pattern* is a 3-tuple/list ``(s, p, o)``; each element is either a
  query variable (a ``"?name"`` string or :class:`Var`) or a constant
  host value (4-tuples are accepted and the 4th element dropped —
  quad tolerance, reference ``src:54-58``);
- ``Values(var, coll)`` constrains a var to a finite collection
  (reference ``src:91-105``);
- ``Optional([...patterns...])`` is a SPARQL-like optional block,
  arbitrarily nestable (reference ``src:107-124``).

Parameterization needs no machinery: pattern constants are ordinary
Python expressions, already evaluated by the host (the reference
evaluates s-expressions in host scope for the same effect,
``src:130-146``, ``test:317-328``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Sequence

from .errors import InvalidBgpError, InvalidValuesError

__all__ = [
    "Var",
    "Literal",
    "Values",
    "ValuesRows",
    "Optional",
    "Filter",
    "Bind",
    "NotExists",
    "Exists",
    "Minus",
    "SubSelect",
    "PathExpr",
    "Seq",
    "Alt",
    "Inv",
    "OneOrMore",
    "ZeroOrMore",
    "ZeroOrOne",
    "NegSet",
    "is_var",
    "var_name",
    "find_vars",
]


@dataclass(frozen=True)
class Var:
    """Explicit query-variable form; ``Var("x")`` ≡ ``"?x"``."""

    name: str

    def __str__(self) -> str:
        return f"?{self.name}"


@dataclass(frozen=True)
class Literal:
    """Escape hatch: a constant *string* that itself starts with ``?``."""

    value: Any


@dataclass(frozen=True)
class Values:
    """``VALUES ?var { ... }`` membership constraint.

    RHS may be any sequence, set, or None (reference ``src:215-228``);
    None / empty yields no solutions; duplicates in a sequence duplicate
    solutions (``membero`` multiset semantics, reference ``src:175-176``).
    """

    var: Any
    coll: Any


@dataclass(frozen=True)
class ValuesRows:
    """SPARQL 1.1 inline data over a var TUPLE: ``VALUES (?a ?b) {
    (1 "x") (2 UNDEF) }`` — rows are tuples aligned with ``vars``;
    ``None`` means UNDEF (that var is unconstrained for the row).

    Joins the solutions as a solution-mapping join: each row keeps the
    solutions that agree on its DEFINED vars.  Vars not bound by the
    required patterns must be defined in EVERY row (they join in as new
    columns); UNDEF is only meaningful for pattern-bound vars — a
    constraint-only use, which is the SPARQL-practical one (parameter
    tables, partial filters).  Single-var :class:`Values` keeps the
    reference's membero semantics; this is the tuple generalization."""

    vars: tuple
    rows: tuple

    def __init__(self, vars, rows):
        object.__setattr__(self, "vars", tuple(vars))
        object.__setattr__(
            self, "rows", tuple(tuple(r) for r in (rows or []))
        )
        for r in self.rows:
            if len(r) != len(self.vars):
                raise InvalidValuesError(r)


@dataclass(frozen=True)
class Optional:
    """A nestable optional block of patterns (reference ``src:107-124``)."""

    patterns: Sequence[Any]

    def __init__(self, *patterns):
        # Accept both Optional([p1, p2]) and Optional(p1, p2).
        if len(patterns) == 1 and isinstance(patterns[0], list):
            object.__setattr__(self, "patterns", tuple(patterns[0]))
        else:
            object.__setattr__(self, "patterns", tuple(patterns))


@dataclass(frozen=True)
class Filter:
    """FILTER over bound vars — a Spark-native extension the reference
    cannot express (its host s-expressions are evaluated *before*
    matching and cannot see query vars, SURVEY §2.5).

    ``fn`` maps ``{var_name: Column}`` (TERM-struct columns) to a
    boolean Column, applied once the required BGP + values clauses have
    bound every var it uses; ``functions.termcols.lex`` / ``lex_as``
    decode terms inside the predicate.  Stays declarative: the condition
    lands in the Spark plan and can fold into joins/scans.
    """

    fn: Any

    def __post_init__(self):
        if not callable(self.fn):
            raise InvalidBgpError(self.fn)


@dataclass(frozen=True)
class Bind:
    """SPARQL ``BIND(expr AS ?var)``: extend every solution with a
    *computed* var (Spark-native extension; the reference cannot compute
    over query vars, SURVEY §2.5 — same argument as :class:`Filter`).

    ``fn`` maps ``{var_name: Column}`` (TERM-struct columns) to a Column
    that must produce a TERM struct — build one with the
    ``functions.termcols`` constructors (``str_col`` / ``int_col`` /
    ``uri_col`` / ``kw_col``) over decoded ``lex`` / ``num`` values.

    Evaluation order (documented simplification of SPARQL's in-place
    scoping): required patterns + VALUES, then FILTERs, then BINDs in
    listed order (later binds see earlier ones), then negation blocks
    (which may anti-join on bound vars), then OPTIONALs.  The target var
    must be new — rebinding an existing var raises."""

    var: Any
    fn: Any

    def __post_init__(self):
        if not is_var(self.var):
            raise InvalidBgpError(self.var)
        if not callable(self.fn):
            raise InvalidBgpError(self.fn)


@dataclass(frozen=True)
class NotExists:
    """SPARQL ``FILTER NOT EXISTS``: drop solutions for which the block
    has at least one compatible solution (anti-join on shared vars; a
    block sharing no vars empties the result iff it matches at all).
    Spark-native extension (SURVEY §2.5: negation absent in reference)."""

    patterns: Sequence[Any]

    def __init__(self, *patterns):
        if len(patterns) == 1 and isinstance(patterns[0], list):
            object.__setattr__(self, "patterns", tuple(patterns[0]))
        else:
            object.__setattr__(self, "patterns", tuple(patterns))


@dataclass(frozen=True)
class Exists:
    """SPARQL ``FILTER EXISTS``: keep solutions for which the block has
    at least one compatible solution — the positive (semi-join) twin of
    :class:`NotExists`; a block sharing no vars keeps everything iff it
    matches at all.  Same var scoping: block vars are not projected
    out."""

    patterns: Sequence[Any]

    def __init__(self, *patterns):
        if len(patterns) == 1 and isinstance(patterns[0], list):
            object.__setattr__(self, "patterns", tuple(patterns[0]))
        else:
            object.__setattr__(self, "patterns", tuple(patterns))


@dataclass(frozen=True)
class Minus:
    """SPARQL ``MINUS``: like :class:`NotExists` on shared vars, but a
    block sharing *no* vars removes nothing (SPARQL's dom-disjoint
    rule — the observable difference between the two negations)."""

    patterns: Sequence[Any]

    def __init__(self, *patterns):
        if len(patterns) == 1 and isinstance(patterns[0], list):
            object.__setattr__(self, "patterns", tuple(patterns[0]))
        else:
            object.__setattr__(self, "patterns", tuple(patterns))


@dataclass(frozen=True)
class SubSelect:
    """SPARQL 1.1 §12 subquery: a nested SELECT used as a group graph
    pattern.  Joins into the outer BGP on its PROJECTED vars only —
    inner non-projected vars are invisible outside (projection
    scoping) — and its own solution modifiers apply BEFORE the join,
    which is the point: top-k-then-join, or aggregate-then-compare.

    Plain flavor: ``SubSelect(["?c"], pats, order_by=["?c"], limit=5)``.
    Aggregate flavor: ``aggs`` maps NEW var names to
    :func:`~matcha_spark.query.select_agg` specs and ``vars`` are the
    group vars — ``SubSelect(["?n"], pats, aggs={"?cnt": ("count",
    "?o")})`` exposes ``?n`` and ``?cnt`` to the outer query; aggregate
    values join in as typed TERM vars (long→int, double→double,
    string→str).  Solutions are set-semantics like every verb here
    (the engine's data-level dedup convention; SURVEY §2.4)."""

    vars: tuple
    patterns: tuple
    aggs: Any = None
    order_by: Any = None
    limit: int | None = None
    offset: int | None = None

    def __init__(self, vars, patterns, aggs=None, order_by=None,
                 limit=None, offset=None):
        object.__setattr__(self, "vars", tuple(vars))
        object.__setattr__(self, "patterns", tuple(patterns))
        object.__setattr__(self, "aggs", dict(aggs) if aggs else None)
        object.__setattr__(
            self, "order_by", tuple(order_by) if order_by else None
        )
        object.__setattr__(self, "limit", limit)
        object.__setattr__(self, "offset", offset)

    def visible_vars(self) -> list:
        out = [var_name(v) for v in self.vars]
        if self.aggs:
            out += [var_name(k) for k in self.aggs]
        return out


class PathExpr:
    """Base class for property-path expressions, usable in the
    *predicate* position of a triple pattern (SPARQL 1.1 property paths;
    absent from the reference — SURVEY §2.5 extension).

    Path operands are predicate constants or nested :class:`PathExpr`
    forms — never query variables (same restriction as SPARQL).  A path
    pattern ``(s, path, o)`` binds/filters its subject and object
    positions exactly like a plain triple pattern.

    Semantics are *set-based*: a path pattern contributes the DISTINCT
    (s, o) node pairs connected by the path (matching SPARQL's
    exists-style path evaluation for ``+``/``*``; for ``/`` and ``|``
    this engine dedups alternate derivations too, consistent with its
    set-semantic triple store).
    """

    __slots__ = ()


@dataclass(frozen=True)
class Seq(PathExpr):
    """Sequence path ``p1/p2/...`` — follow each step in order."""

    steps: Sequence[Any]

    def __init__(self, *steps):
        if len(steps) < 2:
            raise InvalidBgpError(steps)
        object.__setattr__(self, "steps", tuple(steps))


@dataclass(frozen=True)
class Alt(PathExpr):
    """Alternative path ``p1|p2|...`` — any branch connects."""

    alts: Sequence[Any]

    def __init__(self, *alts):
        if not alts:
            raise InvalidBgpError(alts)
        object.__setattr__(self, "alts", tuple(alts))


@dataclass(frozen=True)
class Inv(PathExpr):
    """Inverse path ``^p`` — traverse p object→subject."""

    path: Any


@dataclass(frozen=True)
class OneOrMore(PathExpr):
    """``p+`` — one or more hops (transitive closure)."""

    path: Any


@dataclass(frozen=True)
class ZeroOrMore(PathExpr):
    """``p*`` — ``p+`` ∪ the zero-length path.  Zero-length matches
    every *mentioned node* (each term appearing as a subject or object
    in the graph) with itself, per SPARQL's evaluation of zero-length
    paths over the active graph's terms."""

    path: Any


@dataclass(frozen=True)
class ZeroOrOne(PathExpr):
    """``p?`` — one hop ∪ the zero-length path (see :class:`ZeroOrMore`
    for zero-length semantics)."""

    path: Any


@dataclass(frozen=True)
class NegSet(PathExpr):
    """Negated property set ``!(p1|p2|...)`` — one hop along any edge
    whose predicate is *not* in the set.  Members must be plain
    (forward) predicate constants — the SPARQL restriction that a
    negated set contains only IRIs; this engine does not support
    inverse members inside the negation."""

    preds: Sequence[Any]

    def __init__(self, *preds):
        if not preds:
            raise InvalidBgpError(preds)
        object.__setattr__(self, "preds", tuple(preds))


def path_operands(path: Any):
    """The direct operands of a path form (constants or sub-paths)."""
    if isinstance(path, Seq):
        return list(path.steps)
    if isinstance(path, Alt):
        return list(path.alts)
    if isinstance(path, NegSet):
        return list(path.preds)
    if isinstance(path, (Inv, OneOrMore, ZeroOrMore, ZeroOrOne)):
        return [path.path]
    return []


def is_var(x: Any) -> bool:
    """``?``-prefixed strings and :class:`Var` are query variables
    (reference ``query-var?``, ``src:78-83``)."""
    return isinstance(x, Var) or (isinstance(x, str) and len(x) > 1 and x.startswith("?"))


def var_name(x: Any) -> str:
    """Canonical ``?name`` form used as the solution column name."""
    if isinstance(x, Var):
        return f"?{x.name}"
    return x


def const_value(x: Any) -> Any:
    return x.value if isinstance(x, Literal) else x


def _is_collection(x: Any) -> bool:
    return isinstance(x, (list, tuple, set, frozenset, dict))


def find_vars(patterns: Iterable[Any]) -> list[str]:
    """Distinct query vars in first-appearance order, walking nested
    clauses (reference ``find-vars`` ``src:85-89`` + tree walk
    ``src:444-445``)."""
    out: list[str] = []
    seen: set[str] = set()

    def visit(item):
        if isinstance(item, Values):
            visit(item.var)
            return
        if isinstance(item, ValuesRows):
            for v in item.vars:
                visit(v)
            return
        if isinstance(item, Optional):
            for p in item.patterns:
                visit(p)
            return
        if isinstance(item, Bind):
            visit(item.var)  # BIND introduces its target var
            return
        if isinstance(item, SubSelect):
            # a subquery exposes exactly its projected + aggregate vars
            # (projection scoping hides the rest)
            for v in item.visible_vars():
                visit("?" + v if not str(v).startswith("?") else v)
            return
        if isinstance(item, (Filter, NotExists, Exists, Minus)):
            # filters bind nothing; negation-block vars are scoped to the
            # block (SPARQL: NOT EXISTS/MINUS vars are not projected out)
            return
        if isinstance(item, (tuple, list)):
            for e in item:
                visit(e)
            return
        if is_var(item):
            n = var_name(item)
            if n not in seen:
                seen.add(n)
                out.append(n)

    for p in patterns:
        visit(p)
    return out


def validate_patterns(patterns: Sequence[Any]) -> None:
    """Runtime validation with typed errors, mirroring ``valid-bgps?`` /
    ``valid-values?`` (reference ``src:205-228``).

    Raises :class:`InvalidBgpError` if any triple element is a
    collection, :class:`InvalidValuesError` if a ``values`` RHS is not a
    sequence/set/None.
    """
    bad_bgp = []
    bad_values = []

    def visit(item):
        if isinstance(item, Values):
            rhs = item.coll
            if not (rhs is None or isinstance(rhs, (list, tuple, set, frozenset))):
                bad_values.append(rhs)
            return
        if isinstance(item, (Filter, Bind, ValuesRows)):
            return  # callability / shape enforced at construction
        if isinstance(item, (Optional, NotExists, Exists, Minus, SubSelect)):
            for p in item.patterns:
                visit(p)
            return
        if isinstance(item, (tuple, list)):
            row = list(item)
            if len(row) == 4:  # quad tolerance: graph element dropped later
                row = row[:3]
            if len(row) != 3:
                raise InvalidBgpError(item)
            for pos, e in zip(("s", "p", "o"), row):
                if isinstance(e, PathExpr):
                    if pos != "p":
                        bad_bgp.append(e)  # paths live in predicate position
                    else:
                        _check_path(e)
                elif not is_var(e) and _is_collection(const_value(e)):
                    bad_bgp.append(e)
            return
        raise InvalidBgpError(item)

    def _check_path(path):
        for op in path_operands(path):
            if isinstance(op, PathExpr):
                if isinstance(path, NegSet):
                    bad_bgp.append(op)  # negated sets hold plain predicates
                else:
                    _check_path(op)
            elif is_var(op):
                # SPARQL restriction: no variables inside a path
                bad_bgp.append(op)
            elif _is_collection(const_value(op)):
                bad_bgp.append(op)

    for p in patterns:
        visit(p)
    if bad_bgp:
        raise InvalidBgpError(bad_bgp)
    if bad_values:
        raise InvalidValuesError(bad_values)
