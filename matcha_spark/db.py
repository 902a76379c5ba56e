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

__all__ = ["TriplesDB", "ensure_db", "merge_dbs", "index_triples", "index_if_necessary", "subject_key"]

_N_PRED_BUCKETS = 64


def subject_key(c: F.Column) -> F.Column:
    """Bucket key for a TERM struct column: xxhash64 of the
    float-normalized struct.  Spark's struct equality normalizes floats
    (-0.0 == +0.0, NaN == NaN) while xxhash64 hashes raw bits, so the
    num field is canonicalized (+0.0 fold; IEEE: -0.0 + 0.0 = +0.0)
    before hashing — hash equality then implies exactly what the join's
    struct equality implies."""
    return F.xxhash64(
        F.struct(
            c["kind"].alias("kind"),
            c["lex"].alias("lex"),
            F.when(F.isnan(c["num"]), float("nan"))
            .otherwise(c["num"] + F.lit(0.0))
            .alias("num"),
            c["lang"].alias("lang"),
            c["dt"].alias("dt"),
        )
    )


class TriplesDB:
    """An indexed triples database over a DataFrame with TERM-struct
    columns ``s``, ``p``, ``o``."""

    def __init__(
        self,
        df: DataFrame,
        *,
        deduped: bool = True,
        p_bucketed: bool = False,
        s_bucketed: bool = False,
    ):
        self.df = df
        # True when backed by parquet partitioned on p_bucket: the compiler
        # then adds the derived partition filter so ground-predicate scans
        # prune at the source (see plans/compiler._scan_pattern)
        self.p_bucketed = p_bucketed
        # True when backed by a subject-hash bucketed table (save_bucketed):
        # the df carries an s_key column aligned with the bucket spec, the
        # compiler propagates it through pattern scans, and subject-subject
        # BGP self-joins run with ZERO exchanges (plus ground-subject
        # bucket pruning at the scan)
        self.s_bucketed = s_bucketed
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

    @staticmethod
    def append_to_store(
        spark: SparkSession, path: str, new_triples, *, dedup: bool = True
    ) -> dict:
        """Incrementally append triples to a :meth:`save`'d store WITHOUT
        rescanning it — the 100 TB alternative to ``merge_dbs`` + full
        re-save (whose dedup shuffles the whole store for every delta):

        1. the delta is bucketed with the store's predicate hash and
           deduped internally;
        2. only the buckets the delta lands in are read back (the filter
           is a partition-column predicate → source-level pruning; a
           delta touching 3 of 64 buckets reads 3/64ths of the store);
        3. a left-anti join drops rows the store already holds (set
           semantics preserved, ``src:94-122``'s dedup contract at the
           storage layer);
        4. survivors append as new files in their partitions — existing
           files are never rewritten.

        ``new_triples``: a TriplesDB, a TERM-struct DataFrame, or a raw
        triple seq.  Returns ``{"appended": n}`` (count observed on the
        append write itself, no extra job).  With ``dedup=False`` the
        store scan and anti-join are skipped entirely — for deltas known
        disjoint (e.g. partitioned ingest by day) this is a pure narrow
        write."""
        from pyspark.sql import Observation

        store = spark.read.parquet(path)
        if "p_bucket" not in store.columns:
            raise ValueError(f"{path!r} is not a save()'d p_bucketed store")
        new_db = ensure_db(new_triples, spark)
        delta = (
            new_db.df.select("s", "p", "o")
            .dropDuplicates()
            .withColumn(
                "p_bucket", F.pmod(F.xxhash64("p"), F.lit(_N_PRED_BUCKETS))
            )
        )
        if dedup:
            # tiny driver round-trip: ≤ _N_PRED_BUCKETS bucket ids
            buckets = [
                r[0] for r in delta.select("p_bucket").distinct().collect()
            ]
            if not buckets:
                return {"appended": 0}
            existing = store.where(F.col("p_bucket").isin(buckets)).select(
                "s", "p", "o"
            )
            delta = delta.join(existing, ["s", "p", "o"], "left_anti")
        obs = Observation()
        (
            delta.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.partitionBy("p_bucket")
            .mode("append")
            .parquet(path)
        )
        return {"appended": int(obs.get["n"])}

    @classmethod
    def load(cls, spark: SparkSession, path: str, *, cache: bool = False) -> "TriplesDB":
        raw = spark.read.parquet(path)
        bucketed = "p_bucket" in raw.columns
        df = raw.select("s", "p", "o", *(["p_bucket"] if bucketed else []))
        if cache:
            df = df.cache()
        return cls(df, p_bucketed=bucketed)

    def save_bucketed(self, table: str, buckets: int = 64) -> None:
        """Persist as a subject-hash **bucketed table** (``bucketBy`` on
        ``s_key = xxhash64(s)``): BGP conjunctions join patterns on their
        shared subject var, and with every pattern scan pre-partitioned
        by the same bucket function those self-joins need NO shuffle —
        the dominant cost of multi-pattern queries at 100 TB.  Ground
        subjects additionally prune to a single bucket at the scan.

        ``bucketBy`` requires a saveAsTable target (bucket metadata lives
        in the catalog); point ``spark.sql.warehouse.dir`` at shared
        storage on a cluster."""
        (
            self.df.select("s", "p", "o")
            .withColumn("s_key", subject_key(F.col("s")))
            .write.bucketBy(buckets, "s_key")
            .sortBy("s_key")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(table)
        )

    @classmethod
    def load_bucketed(cls, spark: SparkSession, table: str) -> "TriplesDB":
        """Load a :meth:`save_bucketed` table; requires
        ``spark.sql.requireAllClusterKeysForCoPartition=false`` (set by
        ``matcha_spark.session.get_spark``) for the exchange-free
        subject joins — the join keys are (s_key, s) while the bucket
        partitioning covers s_key only."""
        return cls(spark.table(table), s_bucketed=True)

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
