"""Graph traversal operators: transitive closure / property paths.

The reference has no property paths (SURVEY §2.5); SPARQL engines offer
``pred+`` — here that is :func:`transitive_closure` over an edge list,
with :func:`predicate_closure` binding it to a :class:`TriplesDB`
predicate.

Scale shape: semi-naive iteration — each round joins only the *frontier*
(pairs discovered last round) against the edge list, anti-joins out the
already-known pairs, and stops when the frontier drains.  Rounds =
longest shortest-path; every round is one equi-join + one anti-join,
both shuffle-partitioned on the join key, with ``localCheckpoint``
truncating lineage.  Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["transitive_closure", "predicate_closure"]


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """All reachability pairs ``(src, dst)`` of the directed edge list
    (the ``+`` closure: at least one hop; reflexive pairs only appear on
    actual cycles)."""
    import tempfile
    import uuid

    tmpdir = tempfile.mkdtemp(prefix="matcha_closure_")

    def _materialize(df: DataFrame) -> DataFrame:
        # parquet round-trip: a genuine lineage cut with *fresh attribute
        # ids* per round.  localCheckpoint trips Spark's LogicalRDD
        # constraint rewriting when the same piece appears on both sides
        # of a later join (dedup'd attrs), and cache() keeps the logical
        # plan — which doubles per round and OOMs the driver stringifying
        # it.  Persisting frontiers is also the production shape: at real
        # graph sizes the frontier belongs in storage, not driver memory.
        path = f"{tmpdir}/{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

    acc = _materialize(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).dropDuplicates()
    )
    # path doubling: each round composes the accumulated reachability
    # with itself, so a diameter-d graph converges in ⌈log₂ d⌉ rounds
    # instead of d — rounds (each a shuffle + materialization barrier)
    # are the dominant cost of iterative algorithms on Spark
    for _ in range(max_iter):
        nxt = (
            acc.alias("f")
            .join(acc.alias("n"), F.col("f.dst") == F.col("n.src"))
            .select(F.col("f.src").alias("src"), F.col("n.dst").alias("dst"))
            .dropDuplicates()
        )
        new = _materialize(nxt.join(acc, on=["src", "dst"], how="left_anti"))
        if new.isEmpty():
            break
        acc = _materialize(acc.union(new))
    return acc.select(F.col("src").alias(src), F.col("dst").alias(dst))


def predicate_closure(db, predicate) -> DataFrame:
    """``pred+`` over a triples database: reachability pairs (TERM
    structs ``s``, ``o``) through edges labeled ``predicate``."""
    from ..terms import term_lit

    edges = db.df.where(F.col("p") == term_lit(predicate)).select("s", "o")
    return transitive_closure(edges, src="s", dst="o")
