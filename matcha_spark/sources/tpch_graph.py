"""Derive an RDF-style triples graph from the TPC-H-ish warehouse
tables — entirely with distributed DataFrame transforms (no driver
loop), demonstrating the engine's "any data can become a graph" source
path at scale.

Graph vocabulary (keyword predicates):

    customer:<k>  :name <str>      :nation nation:<k>   :mktsegment <str>
    supplier:<k>  :name <str>      :nation nation:<k>
    nation:<k>    :name <str>      :region region:<k>
    region:<k>    :name <str>
    order:<k>     :customer customer:<k>  :priority <str>  :okey <int>
                  (order triples restricted by ``order_priority`` filter)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..db import TriplesDB
from ..functions.termcols import int_col, kw_col, str_col, uri_col
from ..terms import kw
from .frame import df_to_triples, kw_lit as _kw_lit

__all__ = ["KW", "tpch_graph", "load_tables"]

# predicate vocabulary (Python-side constants for patterns)
KW = {
    "name": kw("name"),
    "nation": kw("nation"),
    "region": kw("region"),
    "mktsegment": kw("mktsegment"),
    "customer": kw("customer"),
    "priority": kw("priority"),
    "okey": kw("okey"),
}


# Inferred-schema memo for :func:`load_tables` — METADATA only, never
# data: ``spark.read.parquet`` eagerly lists + reads the footer on the
# driver to infer the schema (~85 ms/table measured), and the suite
# re-reads the same immutable fixture tables hundreds of times per
# session.  Passing the once-inferred schema back via ``.schema(...)``
# skips only that driver-side inference; every query still scans the
# parquet bytes.  Keyed by (path, mtime_ns, size) so a rewritten file
# re-infers — the moral twin of Spark's own file-listing cache
# (``spark.sql.hive.filesourcePartitionFileCacheSize``, guide §6).
_SCHEMA_CACHE: dict = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    import os as _os

    try:
        st = _os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for n in names:
        if n == "events":
            # events.parquet historically used TIMESTAMP(NANOS), which the
            # vectorized reader rejects; newer fixtures write plain
            # TIMESTAMP_NTZ(micros) that reads directly.  Try the plain
            # read first and fall back to the scoped legacy ns-as-long
            # conf only when the footer really carries nanos.
            try:
                df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
                # force schema resolution now, while we can still fall back
                df.schema
            except Exception:
                key = "spark.sql.legacy.parquet.nanosAsLong"
                prev = spark.conf.get(key, None)
                spark.conf.set(key, "true")
                try:
                    df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
                    if dict(df.dtypes).get("ts") == "bigint":
                        # integer division: float division rounds half the µs
                        # values up by 1 (a double can't hold 1.7e18 ns
                        # exactly), which diverges from DuckDB's truncating
                        # ns→µs read and shifts tie-ordering / second
                        # boundaries in gap logic.  timestampadd over an NTZ
                        # epoch keeps the result session-timezone-independent
                        # (timestamp_micros would yield LTZ).
                        df = df.withColumn(
                            "ts",
                            F.expr(
                                "timestampadd(MICROSECOND, ts div 1000, "
                                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                            ),
                        )
                finally:
                    if prev is None:
                        spark.conf.unset(key)
                    else:
                        spark.conf.set(key, prev)
            out[n] = df
        else:
            out[n] = _read_parquet(spark, f"{sf_dir}/{n}.parquet")
    return out


def order_triples(
    spark: SparkSession, sf_dir: str, order_priority: str | None = None
) -> DataFrame:
    """Just the order-entity triples (for extending a cached base graph
    without rescanning the dimension tables).  One scan of orders for
    all three predicates (explode encoding, see ``sources.frame``)."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return df_to_triples(
        o,
        uri_col("order:", F.col("o_orderkey")),
        {
            "customer": uri_col("customer:", F.col("o_custkey")),
            "priority": str_col(F.col("o_orderpriority")),
            "okey": int_col(F.col("o_orderkey")),
        },
        where=None
        if order_priority is None
        else F.col("o_orderpriority") == order_priority,
    )


def tpch_graph(
    spark: SparkSession,
    sf_dir: str,
    *,
    include_orders: bool = False,
    order_priority: str | None = None,
    cache: bool = True,
    base: TriplesDB | None = None,
) -> TriplesDB:
    """Build the derived graph as a TriplesDB.

    Each source table contributes a few ``select`` projections unioned
    together — Catalyst sees one scan per table and the union stays
    narrow (3 struct columns).  Order edges are optional and can be
    restricted to one priority class (gives genuinely-missing optional
    data for OPTIONAL queries).  Pass ``base=`` (an already-cached
    orders-less graph) to extend it without rescanning the dims."""
    if base is not None and include_orders:
        df = base.df.unionByName(order_triples(spark, sf_dir, order_priority))
        return TriplesDB.from_df(df, dedup=False, cache=cache)
    t = load_tables(spark, sf_dir, "region", "nation", "customer", "supplier")
    # one scan per source table for ALL its predicates (explode encoding,
    # see sources.frame) — at 100 TB this is the difference between
    # reading customer once and reading it three times
    parts = [
        df_to_triples(
            t["region"],
            uri_col("region:", F.col("r_regionkey")),
            {"name": str_col(F.col("r_name"))},
        ),
        df_to_triples(
            t["nation"],
            uri_col("nation:", F.col("n_nationkey")),
            {
                "name": str_col(F.col("n_name")),
                "region": uri_col("region:", F.col("n_regionkey")),
            },
        ),
        df_to_triples(
            t["customer"],
            uri_col("customer:", F.col("c_custkey")),
            {
                "name": str_col(F.col("c_name")),
                "nation": uri_col("nation:", F.col("c_nationkey")),
                "mktsegment": str_col(F.col("c_mktsegment")),
            },
        ),
        df_to_triples(
            t["supplier"],
            uri_col("supplier:", F.col("s_suppkey")),
            {
                "name": str_col(F.col("s_name")),
                "nation": uri_col("nation:", F.col("s_nationkey")),
            },
        ),
    ]
    if include_orders:
        parts.append(order_triples(spark, sf_dir, order_priority))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # source rows are unique per (entity, predicate) → no dedup shuffle needed
    return TriplesDB.from_df(df, dedup=False, cache=cache)
