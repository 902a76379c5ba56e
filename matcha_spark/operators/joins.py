"""Extended join operators beyond plain equi-joins: as-of (time-series)
and interval/range joins.

:func:`asof_join` uses the union-merge pattern — the scalable shape for
as-of semantics on a cluster:

1. union left (probe) and right (reference) rows with a side tag,
2. one shuffle+sort on ``(key, ts, side)``,
3. ``last_value(..., ignorenulls)`` carries the most recent reference
   row forward onto each probe row.

Cost: a single shuffle of |L|+|R| rows — no pairwise time comparison,
no per-key driver loop, no broadcast requirement.  (A naive
join-filter-rank implementation is O(|L|·|R|) per key and dies at
scale; this stays n log n.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with the same
    ``on`` key and ``right_ts <= left_ts`` (within ``tolerance_s`` if
    given).  Right columns come back NULL when nothing precedes."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col(right_ts))
    )
    # pad to a common column set in one select per side (O(1) plan
    # nodes, not O(cols) chained projections)
    all_cols = lt.columns + [c for c in rt.columns if c not in lt.columns]
    lt_cols, rt_cols = set(lt.columns), set(rt.columns)
    lt = lt.select(
        *[F.col(c) if c in lt_cols else F.lit(None).alias(c) for c in all_cols]
    )
    rt = rt.select(
        *[F.col(c) if c in rt_cols else F.lit(None).alias(c) for c in all_cols]
    )
    u = lt.unionByName(rt)

    # reference rows sort before probe rows at equal timestamps so an
    # exactly-simultaneous reference row is visible to the probe
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(f"__r_{c}")
        for c in right_cols
    ]
    carried_ts = (
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__r_ts")
    )
    u = u.select("*", *carried, carried_ts)
    out = u.where(F.col("__side") == 1)
    if tolerance_s is not None:
        in_tol = (
            F.unix_timestamp(F.col("__ts")) - F.unix_timestamp(F.col("__r_ts"))
        ) <= tolerance_s
        masked = {f"__r_{c}" for c in right_cols}
        out = out.select(
            *[
                F.when(in_tol, F.col(c)).alias(c) if c in masked else F.col(c)
                for c in out.columns
            ]
        )
    keep = [c for c in left.columns]
    return out.select(
        *keep, *[F.col(f"__r_{c}").alias(c) for c in right_cols]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    point: str,
    range_start: str,
    range_end: str,
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Point-in-interval join: left rows whose ``point`` falls inside a
    right row's ``[range_start, range_end)``.

    Scaled via time bucketing: both sides get equi-join bucket keys
    (intervals explode to every bucket they overlap) so the match is an
    equi-join plus a residual filter — never a full theta-join."""
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(point)) / bucket_width_s).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(range_start)) / bucket_width_s).cast("long"),
                (F.unix_timestamp(F.col(range_end)) / bucket_width_s).cast("long"),
            )
        ),
    )
    cond = (
        (F.col(point) >= F.col(range_start))
        & (F.col(point) < F.col(range_end))
    )
    return lb.join(rb, on=[on, "__bucket"]).where(cond).drop("__bucket")
