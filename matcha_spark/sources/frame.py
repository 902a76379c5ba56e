"""Generic DataFrame → triples source.

Any relational DataFrame becomes a graph fragment via a *declarative
mapping*: one subject expression plus ``{predicate-name: object-column}``.
This is the engine's general "any data can become a graph" entry point
(the reference accepts arbitrary host data as triples, ``src/grafter/
matcha/alpha.clj:54-58``; here the source stays distributed).

Scale design: the naive encoding is a union of one ``select`` per
predicate, which scans the source table once **per predicate** (N
branches re-read the subject key column N times and pay N scan/stage
setups).  Instead we pack the (p, o) pairs into an array literal and
``explode`` — **one scan per source table** regardless of predicate
count, one narrow Generate node, whole-stage-codegen friendly, and
column pruning still reaches the parquet reader (only the referenced
columns are read, once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kw_lit", "df_to_triples"]


def kw_lit(name: str) -> Column:
    """Keyword TERM-struct literal column (predicate vocabulary)."""
    return F.struct(
        F.lit("kw").alias("kind"),
        F.lit(name).alias("lex"),
        F.lit(0.0).alias("num"),
        F.lit("").alias("lang"),
        F.lit("").alias("dt"),
    )


def df_to_triples(
    df: DataFrame,
    subject: Column,
    predicates: dict[str, Column],
    *,
    where: Column | None = None,
) -> DataFrame:
    """Triples for every row of ``df``: ``(subject, kw(name), obj)`` per
    mapping entry, in one scan.

    ``predicates`` maps predicate keyword names to TERM-struct object
    columns (see :mod:`matcha_spark.functions.termcols`).  ``where``
    optionally filters source rows *before* triple generation (pushed to
    the scan by Catalyst).
    """
    if not predicates:
        raise ValueError("df_to_triples requires at least one predicate mapping")
    if where is not None:
        df = df.where(where)
    pairs = F.array(
        *[
            F.struct(kw_lit(name).alias("p"), obj.alias("o"))
            for name, obj in predicates.items()
        ]
    )
    return df.select(subject.alias("s"), F.explode(pairs).alias("po")).select(
        "s", F.col("po.p").alias("p"), F.col("po.o").alias("o")
    )
