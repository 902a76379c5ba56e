"""Spark-side TERM struct constructors.

Build term-struct Columns from ordinary relational columns without any
driver round-trip — the distributed path for deriving triples graphs
from warehouse tables (cf. ``matcha_spark.sources``).  Encodings match
``matcha_spark.terms.to_term`` so Python-side pattern constants and
Spark-side derived terms equi-join correctly (ints: ``str(i)``;
strings: identity; URIs/keywords: lex without sigil).

``double`` terms carry their value in the ``num`` field with an empty
``lex`` (Python ``repr`` and Java ``Double.toString`` disagree on
shortest-float rendering, so a lexical join key would be fragile);
equality is native double comparison, identical from either side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..terms import term_lit  # re-export for pattern constants

__all__ = [
    "term_lit",
    "uri_col",
    "str_col",
    "int_col",
    "double_col",
    "kw_col",
    "lex",
    "lex_as",
]


def _mk(kind: str, lex_col: Column, num_col: Column | None = None) -> Column:
    return F.struct(
        F.lit(kind).alias("kind"),
        lex_col.alias("lex"),
        (num_col if num_col is not None else F.lit(0.0)).cast("double").alias("num"),
        F.lit("").alias("lang"),
        F.lit("").alias("dt"),
    )


def uri_col(prefix: str, c: Column) -> Column:
    """URI term ``<prefix><value>`` from a key column."""
    return _mk("uri", F.concat(F.lit(prefix), c.cast("string")))


def str_col(c: Column) -> Column:
    return _mk("str", c.cast("string"))


def int_col(c: Column) -> Column:
    return _mk("int", c.cast("long").cast("string"), c)


def double_col(c: Column) -> Column:
    return _mk("double", F.lit(""), c)


def kw_col(c: Column) -> Column:
    """Keyword term from a string column holding ``ns/name`` (no sigil)."""
    return _mk("kw", c.cast("string"))


def lex(c: Column) -> Column:
    """Lexical form of a term column; unbound markers become NULL (so
    engine output aligns with SQL left-join NULL semantics)."""
    return F.when(c["kind"] == "unbound", F.lit(None)).otherwise(c["lex"])


def lex_as(c: Column, dtype: str) -> Column:
    """Lexical form cast to ``dtype``, NULL on anything uncastable.

    ``try_cast``, not ``cast`` (r13, found by the Filter fuzz): under
    Spark 4's ANSI default a plain cast ABORTS the whole query when any
    solution binds the var to a malformed lexical form (a string term
    in a numeric filter, an ``_N`` unbound marker) — SPARQL §17.2
    semantics are that a FILTER type error eliminates THAT solution
    (NULL here: the comparison is non-true and the row drops), never
    the query."""
    return F.when(c["kind"] == "unbound", F.lit(None).cast(dtype)).otherwise(
        c["lex"].try_cast(dtype)
    )
