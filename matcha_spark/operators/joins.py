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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the as-of-matching right row with the
    same ``on`` key (NULL right columns when nothing matches):

    - ``direction='backward'`` (default): latest right with
      ``right_ts <= left_ts``;
    - ``'forward'``: earliest right with ``right_ts >= left_ts``;
    - ``'nearest'``: whichever of the two is closer in time (ties break
      backward) — both candidates come off the *same* sorted union
      (same single shuffle; the second window pass re-sorts within
      partitions, it does not reshuffle).

    ``tolerance_s`` bounds the match distance per direction.  Among
    multiple right rows at exactly the same timestamp the winner is
    unspecified — dedupe the reference side to one row per (key, ts)
    first (as ``relational.asof_events_orders`` does) when that case
    exists in the data."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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

    ref = F.col("__side") == 0

    def _carry(prefix, w, pick):
        cols = [
            pick(F.when(ref, F.col(c)), ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_cols
        ]
        ts = pick(F.when(ref, F.col("__ts")), ignorenulls=True).over(w).alias(f"{prefix}ts")
        return cols + [ts]

    extra = []
    if direction in ("backward", "nearest"):
        # reference rows sort before probe rows at equal timestamps so an
        # exactly-simultaneous reference row is visible to the probe
        wb = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        extra += _carry("__b_", wb, F.last)
    if direction in ("forward", "nearest"):
        # mirrored: probe rows sort first at equal timestamps so the
        # [current, following) frame still sees a simultaneous reference
        wf = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts"), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        extra += _carry("__f_", wf, F.first)
    u = u.select("*", *extra)
    out = u.where(F.col("__side") == 1)

    secs = F.unix_timestamp
    b_dist = secs(F.col("__ts")) - secs(F.col("__b_ts"))
    f_dist = secs(F.col("__f_ts")) - secs(F.col("__ts"))
    if direction == "backward":
        valid = F.col("__b_ts").isNotNull()
        if tolerance_s is not None:
            valid = valid & (b_dist <= tolerance_s)
        picked = {c: F.when(valid, F.col(f"__b_{c}")) for c in right_cols}
    elif direction == "forward":
        valid = F.col("__f_ts").isNotNull()
        if tolerance_s is not None:
            valid = valid & (f_dist <= tolerance_s)
        picked = {c: F.when(valid, F.col(f"__f_{c}")) for c in right_cols}
    else:  # nearest: closer wins, ties break backward
        valid_b = F.col("__b_ts").isNotNull()
        valid_f = F.col("__f_ts").isNotNull()
        if tolerance_s is not None:
            valid_b = valid_b & (b_dist <= tolerance_s)
            valid_f = valid_f & (f_dist <= tolerance_s)
        pick_f = valid_f & (~valid_b | (f_dist < b_dist))
        picked = {
            c: F.when(pick_f, F.col(f"__f_{c}")).when(valid_b, F.col(f"__b_{c}"))
            for c in right_cols
        }
    keep = [c for c in left.columns]
    return out.select(*keep, *[picked[c].alias(c) for c in right_cols])


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
