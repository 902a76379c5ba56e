"""SPARQL-1.1-style scalar functions over TERM-struct Columns.

The reference evaluates host s-expressions *before* matching, so its
patterns cannot compute over query variables (``src/grafter/matcha/
alpha.clj:130-131``); this module is the Spark-native extension that
adds the SPARQL 1.1 §17 function library at the engine level instead:
every function here maps TERM columns to TERM columns (or to plain
boolean/numeric Columns for filter predicates), so they compose inside
``Bind``/``Filter``/``select_agg(having=...)`` and stay whole-stage
codegen — no UDFs, no Python in the row path.

Conventions (documented divergences match the engine's term model):

- ``t_str`` (SPARQL STR) renders ANY term's lexical form — doubles and
  other num-mirror kinds render from the ``num`` field, since their
  ``lex`` is empty by design (see ``functions.termcols``).
- Numeric functions read the ``num`` mirror of numeric kinds
  (int/double/bool/date/datetime) and yield NULL-safe ``double`` TERM
  results; non-numeric inputs yield an unbound-safe NULL number, the
  skip-nulls convention the aggregation verb shares.
- Type predicates (`t_bound`, `t_is_uri`, ...) return plain boolean
  Columns — ready for ``Filter(lambda v: t_bound(v["?x"]))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .termcols import _mk, lex

__all__ = [
    "t_str",
    "t_strlen",
    "t_ucase",
    "t_lcase",
    "t_concat",
    "t_substr",
    "t_replace",
    "t_strstarts",
    "t_strends",
    "t_contains",
    "t_num",
    "t_add",
    "t_sub",
    "t_mul",
    "t_div",
    "t_abs",
    "t_round",
    "t_ceil",
    "t_floor",
    "t_year",
    "t_month",
    "t_day",
    "t_bound",
    "t_is_uri",
    "t_is_literal",
    "t_is_numeric",
    "t_lang",
    "t_datatype",
    "t_coalesce",
]

_NUMERIC_KINDS = ("int", "double", "bool", "date", "datetime")
_LITERAL_KINDS = ("str", "int", "double", "bool", "date", "datetime", "lang", "typed")


def _render(t: Column) -> Column:
    """Lexical rendering that covers num-mirror kinds (double's lex is
    empty; bools/ints carry their canonical lex)."""
    return F.when(t["kind"] == "double", t["num"].cast("string")).otherwise(lex(t))


def t_str(t: Column) -> Column:
    """SPARQL STR(): the term's lexical form as a str TERM."""
    return _mk("str", F.coalesce(_render(t), F.lit("")))


def t_strlen(t: Column) -> Column:
    """STRLEN → int TERM."""
    n = F.length(F.coalesce(_render(t), F.lit("")))
    return _mk("int", n.cast("string"), n)


def t_ucase(t: Column) -> Column:
    return _mk("str", F.upper(F.coalesce(_render(t), F.lit(""))))


def t_lcase(t: Column) -> Column:
    return _mk("str", F.lower(F.coalesce(_render(t), F.lit(""))))


def t_concat(*ts: Column, sep: str = "") -> Column:
    """CONCAT (str TERM); ``sep`` extends SPARQL with a join separator."""
    parts = [F.coalesce(_render(t), F.lit("")) for t in ts]
    return _mk("str", F.concat_ws(sep, *parts))


def t_substr(t: Column, pos: int, length: int | None = None) -> Column:
    """SUBSTR with SPARQL's 1-based positions."""
    s = F.coalesce(_render(t), F.lit(""))
    out = F.substring(s, pos, length if length is not None else (1 << 30))
    return _mk("str", out)


def t_replace(t: Column, pattern: str, replacement: str) -> Column:
    """REPLACE (regex, Java syntax — document flavor at call sites that
    must replay in other engines)."""
    return _mk(
        "str",
        F.regexp_replace(F.coalesce(_render(t), F.lit("")), pattern, replacement),
    )


def t_strstarts(t: Column, prefix) -> Column:
    return F.coalesce(_render(t), F.lit("")).startswith(prefix)


def t_strends(t: Column, suffix) -> Column:
    return F.coalesce(_render(t), F.lit("")).endswith(suffix)


def t_contains(t: Column, needle) -> Column:
    return F.coalesce(_render(t), F.lit("")).contains(needle)


def t_num(t: Column) -> Column:
    """Numeric mirror of a numeric-kind term as a plain double Column
    (NULL for non-numeric kinds) — the building block for arithmetic
    and numeric filters."""
    return F.when(t["kind"].isin(*_NUMERIC_KINDS), t["num"])


def _arith(a: Column, b: Column, op) -> Column:
    v = op(t_num(a), t_num(b))
    return _mk("double", F.lit(""), v)


def t_add(a: Column, b: Column) -> Column:
    return _arith(a, b, lambda x, y: x + y)


def t_sub(a: Column, b: Column) -> Column:
    return _arith(a, b, lambda x, y: x - y)


def t_mul(a: Column, b: Column) -> Column:
    return _arith(a, b, lambda x, y: x * y)


def t_div(a: Column, b: Column) -> Column:
    """Division; 0 divisor yields NULL num (SPARQL errors instead —
    divergence documented: NULL propagates like an unbound, which is
    the engine's error-as-absence convention)."""
    return _arith(a, b, lambda x, y: F.when(y != 0, x / y))


def t_abs(t: Column) -> Column:
    return _mk("double", F.lit(""), F.abs(t_num(t)))


def t_round(t: Column, scale: int = 0) -> Column:
    return _mk("double", F.lit(""), F.round(t_num(t), scale))


def t_ceil(t: Column) -> Column:
    return _mk("double", F.lit(""), F.ceil(t_num(t)).cast("double"))


def t_floor(t: Column) -> Column:
    return _mk("double", F.lit(""), F.floor(t_num(t)).cast("double"))


def _as_date(t: Column) -> Column:
    """date/datetime terms carry an ISO lexical form; parse it."""
    return F.when(
        t["kind"].isin("date", "datetime"), F.to_date(F.substring(t["lex"], 1, 10))
    )


def t_year(t: Column) -> Column:
    n = F.year(_as_date(t))
    return _mk("int", n.cast("string"), n)


def t_month(t: Column) -> Column:
    n = F.month(_as_date(t))
    return _mk("int", n.cast("string"), n)


def t_day(t: Column) -> Column:
    n = F.dayofmonth(_as_date(t))
    return _mk("int", n.cast("string"), n)


def t_bound(t: Column) -> Column:
    """BOUND(): false for NULL columns and unbound markers."""
    return t.isNotNull() & (t["kind"] != "unbound")


def t_is_uri(t: Column) -> Column:
    return t["kind"] == "uri"


def t_is_literal(t: Column) -> Column:
    return t["kind"].isin(*_LITERAL_KINDS)


def t_is_numeric(t: Column) -> Column:
    return t["kind"].isin("int", "double")


def t_lang(t: Column) -> Column:
    """LANG(): language tag ('' for plain literals) as a str TERM."""
    return _mk("str", F.coalesce(t["lang"], F.lit("")))


def t_datatype(t: Column) -> Column:
    """DATATYPE(): the typed-literal datatype IRI ('' otherwise)."""
    return _mk("str", F.coalesce(t["dt"], F.lit("")))


def t_coalesce(*ts: Column) -> Column:
    """COALESCE over terms: first bound argument (unbound markers and
    NULLs skipped)."""
    out = None
    for t in ts:
        guarded = F.when(t_bound(t), t)
        out = guarded if out is None else F.coalesce(out, guarded)
    return out
