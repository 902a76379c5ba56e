"""Bounded memo-cache of persisted intermediate DataFrames.

Operators like MinHash/SimHash signature generation feed *self-joins*:
without materialization each join side recomputes the whole upstream
pipeline (a lazy ``.cache()`` can race — both map stages launch
concurrently and each computes the full pipeline before either
populates the cache block).  But a bare ``.cache()`` per call also
leaks: CacheManager entries live until session end, so a long-lived
session calling ``minhash_lsh_candidates`` in a loop pins every
signature table in executor storage forever.  And ``localCheckpoint``
(round 3's answer) is eager and GC-collectable but recomputes on every
call, stores row-format RDD blocks instead of the columnar
InMemoryRelation, and drops lineage — an executor loss fails the job
instead of recomputing.

:func:`memo_persist` gets all three properties at once:

- **computed once** — eager ``persist + count`` materializes before the
  self-join consumers run;
- **reused across calls** — entries are keyed by the DataFrame's
  semantic plan (``semanticHash`` bucket verified with
  ``sameSemantics``), so the same operator over the same inputs and
  parameters returns the already-persisted artifact ("index once,
  query many" — the same contract as the suite's graph cache);
- **bounded** — an LRU of ``MEMO_MAX`` entries, evictions unpersisted.

Lineage is preserved (plain ``persist``), so the result is
fault-tolerant on a cluster: losing an executor recomputes the lost
blocks instead of failing the job.

Contract: memoization assumes the underlying *data* for a semantic plan
is immutable within the session (re-writing a parquet path and calling
again would return stale results — call :func:`clear_memo` after such
mutations).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

__all__ = ["memo_persist", "clear_memo", "cut_lineage"]

_MEMO: "OrderedDict[int, DataFrame]" = OrderedDict()
MEMO_MAX = 32


def _safe_unpersist(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        pass  # session may already be stopped; nothing left to free


def memo_persist(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK), materialize it, and memoize by
    semantic plan so repeated calls share one artifact.

    Falls back to ``localCheckpoint`` where the semantic-plan APIs are
    unavailable (e.g. a Spark Connect server predating them) — same
    eager-once behavior, no cross-call reuse.
    """
    try:
        h = df.semanticHash()
    except Exception:
        return df.localCheckpoint()
    hit = _MEMO.get(h)
    if hit is not None:
        try:
            same = hit.sameSemantics(df)
        except Exception:
            same = False  # e.g. cached entry from a stopped session
        if same:
            _MEMO.move_to_end(h)
            # r13 (review): a hit can have been unpersisted OUTSIDE this
            # module (e.g. the suite graph cache's LRU eviction calls
            # .unpersist() on frames that are also memo-tracked).
            # Returning it as-is would silently break the "computed
            # once, materialized" contract — every consumer would
            # recompute the plan.  Restore persistence eagerly.
            lvl = hit.storageLevel
            if not (lvl.useMemory or lvl.useDisk):
                hit.persist(StorageLevel.MEMORY_AND_DISK)
                if eager:
                    hit.count()
            return hit
        # stale entry or a genuine semanticHash collision: evict, recompute
        _safe_unpersist(hit)
        del _MEMO[h]
    while len(_MEMO) >= MEMO_MAX:
        _safe_unpersist(_MEMO.popitem(last=False)[1])
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        df.count()
    _MEMO[h] = df
    return df


def clear_memo() -> None:
    """Unpersist and drop every memoized entry."""
    while _MEMO:
        _safe_unpersist(_MEMO.popitem()[1])


def cut_lineage(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` with its lineage truncated — for
    iterative algorithms whose per-round plans would otherwise nest and
    grow without bound.

    Uses a *reliable* ``checkpoint`` when the session has a checkpoint
    directory configured (shared storage: survives executor loss on a
    real cluster), else ``localCheckpoint`` (executor-local blocks —
    fast, but an executor loss mid-computation fails the job; fine for
    rederivable intermediates and the only option without shared
    storage).  The checkpoint-dir probe uses classic-Spark APIs and
    degrades to localCheckpoint under Spark Connect.
    """
    try:
        has_dir = df.sparkSession.sparkContext.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        # persist first: an unpersisted reliable checkpoint computes the
        # plan once for the job and AGAIN when writing the checkpoint
        # files (the classic 2× recompute gotcha) — cache makes the
        # checkpoint write a cache scan, then drop the scratch entry
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return df.checkpoint(eager=True)
        finally:
            _safe_unpersist(df)
    return df.localCheckpoint()
