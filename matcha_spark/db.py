"""TriplesDB — the engine's database abstraction.

Reference parity:

- ``index-triples`` (``src/grafter/matcha/alpha.clj:60-69``): build an
  indexed, deduplicated fact database once and reuse it across queries.
  Spark analog: a cached, ``dropDuplicates``-ed DataFrame of TERM-struct
  triples.  pldb stores facts in sets → dedup on load; caching is the
  "index once, query many" contract (``README.md:25-30``).
- ``index-if-necessary`` (``src:71-76``): any raw sequence of triples is
  accepted by every verb and indexed lazily → :func:`ensure_db`.
- ``triple-vector->idx-triple`` (``src:54-58``): rows are 3-tuples;
  4-tuples (Quads) are accepted and the graph element silently dropped.
- ``merge-dbs`` (``src:728-746``): set-union of fact databases,
  idempotent → union + dropDuplicates.

Scale design (100 TB target):

- The triples DataFrame is the *only* distributed state; everything else
  is metadata.  ``save``/``load`` persist as parquet partitioned by a
  predicate hash-bucket (``p_bucket``) — the DataFrame-era analog of the
  reference's per-position hash index and of S2RDF-style vertical
  partitioning: a pattern scan with a ground predicate prunes partitions
  at the source instead of filtering after a full scan.
- ``predicate_stats`` collects per-predicate counts once per DB (small:
  one row per distinct predicate) and drives the compiler's join-order
  heuristic plus broadcast decisions — replacing pldb's index
  selectivity at cluster scale.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .terms import TRIPLE_SCHEMA, to_term

__all__ = ["TriplesDB", "ensure_db", "merge_dbs", "index_triples", "index_if_necessary"]

_N_PRED_BUCKETS = 64


class TriplesDB:
    """An indexed triples database over a DataFrame with TERM-struct
    columns ``s``, ``p``, ``o``."""

    def __init__(self, df: DataFrame, *, deduped: bool = True, p_bucketed: bool = False):
        self.df = df
        # True when backed by parquet partitioned on p_bucket: the compiler
        # then adds the derived partition filter so ground-predicate scans
        # prune at the source (see plans/compiler._scan_pattern)
        self.p_bucketed = p_bucketed
        self._stats: dict[tuple, int] | None = None
        self._total: int | None = None

    # -- construction ----------------------------------------------------

    @classmethod
    def from_triples(cls, spark: SparkSession, triples: Iterable[Any]) -> "TriplesDB":
        """Build from a Python iterable of 3- or 4-tuples (graph element
        of quads dropped, reference ``src:54-58``); dedup + cache =
        ``index-triples`` (``src:60-69``)."""
        rows = []
        for t in triples:
            row = tuple(t)
            if len(row) == 4:
                row = row[:3]
            if len(row) != 3:
                raise ValueError(f"not a triple: {t!r}")
            rows.append(tuple(to_term(v) for v in row))
        df = spark.createDataFrame(rows, TRIPLE_SCHEMA) if rows else spark.createDataFrame([], TRIPLE_SCHEMA)
        return cls(df.dropDuplicates().cache())

    @classmethod
    def from_df(cls, df: DataFrame, *, dedup: bool = True, cache: bool = True) -> "TriplesDB":
        """Wrap an existing TERM-struct triples DataFrame (the scale
        path: triples derived from other tables stay distributed)."""
        out = df.select("s", "p", "o")
        if dedup:
            out = out.dropDuplicates()
        if cache:
            out = out.cache()
        return cls(out)

    # -- persistence (vertical-partitioning analog) ----------------------

    def save(self, path: str) -> None:
        """Persist partitioned by predicate hash-bucket so ground-predicate
        scans prune at the source (S2RDF-style vertical partitioning)."""
        (
            self.df.withColumn("p_bucket", F.pmod(F.xxhash64("p"), F.lit(_N_PRED_BUCKETS)))
            .write.partitionBy("p_bucket")
            .mode("overwrite")
            .parquet(path)
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str, *, cache: bool = False) -> "TriplesDB":
        raw = spark.read.parquet(path)
        bucketed = "p_bucket" in raw.columns
        df = raw.select("s", "p", "o", *(["p_bucket"] if bucketed else []))
        if cache:
            df = df.cache()
        return cls(df, p_bucketed=bucketed)

    # -- statistics ------------------------------------------------------

    def predicate_stats(self) -> dict[tuple, int]:
        """``{(kind, lex) → count}`` per distinct predicate; collected once
        and reused by the compiler's join-order / broadcast heuristic."""
        if self._stats is None:
            rows = self.df.groupBy("p.kind", "p.lex").count().collect()
            self._stats = {(r[0], r[1]): r[2] for r in rows}
            self._total = sum(self._stats.values())
        return self._stats

    def total_triples(self) -> int:
        if self._total is None:
            self.predicate_stats()
        return self._total or 0

    # -- misc ------------------------------------------------------------

    def merge(self, *others: "TriplesDB | DataFrame | Iterable") -> "TriplesDB":
        return merge_dbs(self, *others)

    def unpersist(self) -> None:
        self.df.unpersist()


def ensure_db(db: Any, spark: SparkSession | None = None) -> TriplesDB:
    """Accept a TriplesDB, a TERM-struct DataFrame, or a raw Python
    iterable of triples (indexed lazily — reference ``index-if-necessary``
    ``src:71-76``; per-query re-indexing of raw input is the same
    documented perf footgun as the reference's, ``README.md:25-30``)."""
    if isinstance(db, TriplesDB):
        return db
    if isinstance(db, DataFrame):
        return TriplesDB.from_df(db, dedup=True, cache=False)
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise ValueError("no active SparkSession to index a raw triple sequence with")
    return TriplesDB.from_triples(spark, db)


def merge_dbs(*dbs: Any) -> TriplesDB:
    """N-ary set-union of databases, idempotent (reference ``merge-dbs``
    ``src:728-746``, ``test:211-231``)."""
    # normalize to the 3 term columns: a loaded DB carries the p_bucket
    # partition column, which would break unionByName against a raw graph
    frames = [ensure_db(d).df.select("s", "p", "o") for d in dbs]
    if not frames:
        raise ValueError("merge_dbs requires at least one database")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return TriplesDB(out.dropDuplicates().cache())


def index_triples(spark, triples) -> TriplesDB:
    """Reference-named alias for :meth:`TriplesDB.from_triples`
    (``index-triples``, ``src:60-69``)."""
    return TriplesDB.from_triples(spark, triples)


# reference-named alias for ensure_db (``index-if-necessary``, src:71-76)
index_if_necessary = ensure_db
