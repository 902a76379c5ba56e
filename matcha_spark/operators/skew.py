"""Skew-mitigation utilities for hot keys.

AQE's skew-join handling covers sort-merge joins automatically; these
helpers cover the two cases it doesn't:

- :func:`salted_agg` — two-phase aggregation for skewed groupBy keys:
  partial aggregate on ``(key, salt)``, then final aggregate on ``key``.
  Turns one giant reducer partition into ``n_salts`` even ones.
- :func:`salted_join` — replicate-and-salt for a skewed equi-join where
  the right side is too big to broadcast: the left (skewed) side gets a
  random salt, the right side is replicated once per salt value, and
  the join key becomes ``(key, salt)``.

Salting uses a deterministic hash of a uniqueness column when provided
(reproducible runs), else ``rand()``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]


def _salt_col(n_salts: int, det_col: str | None) -> Column:
    if det_col is not None:
        return F.pmod(F.xxhash64(F.col(det_col)), F.lit(n_salts)).cast("int")
    return (F.rand() * n_salts).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 32,
    det_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → ``"fn(col)"`` where fn ∈
    {sum, count, min, max}: these are the algebraic aggregates that
    decompose into partial + final (avg = sum/count at the call site).
    """
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        fn = fn.strip().lower()
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1) if col in ("", "*", "1") else F.col(col)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(f"__p_{out}"))
            final_exprs.append(getattr(F, "sum" if fn == "sum" else fn)(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported aggregate for salting: {fn}")
    salted = df.withColumn("__salt", _salt_col(n_salts, det_col))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    det_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Replicate-and-salt equi-join: left rows get one salt, right rows
    are exploded across all salts; join on ``on + [salt]``.  Right-side
    cost is ×``n_salts`` rows, shuffle skew drops ÷``n_salts``.

    Only inner/left-flavored joins are supported: with ``right``/``full``
    outer, an unmatched right row would be emitted once per salt replica
    (silently wrong data)."""
    if how.lower().replace("_", "").replace("outer", "") not in (
        "inner", "left", "leftsemi", "semi", "leftanti", "anti", "cross",
    ):
        raise ValueError(
            f"salted_join does not support how={how!r}: replicate-and-salt "
            "emits unmatched right rows once per salt for right/full joins"
        )
    on = list(on)
    lsalted = left.withColumn("__salt", _salt_col(n_salts, det_col))
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lsalted.join(rsalted, on=on + ["__salt"], how=how).drop("__salt")
