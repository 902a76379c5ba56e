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
            # events.parquet uses TIMESTAMP(NANOS), which the vectorized
            # reader rejects; read ns-as-long and downcast to micros
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
            if dict(df.dtypes).get("ts") == "bigint":
                # integer division: float division rounds half the µs values
                # up by 1 (a double can't hold 1.7e18 ns exactly), which
                # diverges from DuckDB's truncating ns→µs read and shifts
                # tie-ordering / second boundaries in gap logic
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            out[n] = df
        else:
            out[n] = spark.read.parquet(f"{sf_dir}/{n}.parquet")
    return out


def _kw_lit(name: str):
    return F.struct(
        F.lit("kw").alias("kind"),
        F.lit(name).alias("lex"),
        F.lit(0.0).alias("num"),
        F.lit("").alias("lang"),
        F.lit("").alias("dt"),
    )


def order_triples(
    spark: SparkSession, sf_dir: str, order_priority: str | None = None
) -> DataFrame:
    """Just the order-entity triples (for extending a cached base graph
    without rescanning the dimension tables)."""
    o = load_tables(spark, sf_dir, "orders")["orders"]
    if order_priority is not None:
        o = o.where(F.col("o_orderpriority") == order_priority)
    s = uri_col("order:", F.col("o_orderkey"))
    parts = [
        o.select(s.alias("s"), _kw_lit("customer").alias("p"), uri_col("customer:", F.col("o_custkey")).alias("o")),
        o.select(s.alias("s"), _kw_lit("priority").alias("p"), str_col(F.col("o_orderpriority")).alias("o")),
        o.select(s.alias("s"), _kw_lit("okey").alias("p"), int_col(F.col("o_orderkey")).alias("o")),
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


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
    t = load_tables(spark, sf_dir, "region", "nation", "customer", "supplier", "orders")

    def triples(df, s, p_name, o):
        return df.select(s.alias("s"), _kw_lit(p_name).alias("p"), o.alias("o"))

    region, nation, customer, supplier, orders = (
        t["region"],
        t["nation"],
        t["customer"],
        t["supplier"],
        t["orders"],
    )
    parts = [
        triples(region, uri_col("region:", F.col("r_regionkey")), "name", str_col(F.col("r_name"))),
        triples(nation, uri_col("nation:", F.col("n_nationkey")), "name", str_col(F.col("n_name"))),
        triples(nation, uri_col("nation:", F.col("n_nationkey")), "region", uri_col("region:", F.col("n_regionkey"))),
        triples(customer, uri_col("customer:", F.col("c_custkey")), "name", str_col(F.col("c_name"))),
        triples(customer, uri_col("customer:", F.col("c_custkey")), "nation", uri_col("nation:", F.col("c_nationkey"))),
        triples(customer, uri_col("customer:", F.col("c_custkey")), "mktsegment", str_col(F.col("c_mktsegment"))),
        triples(supplier, uri_col("supplier:", F.col("s_suppkey")), "name", str_col(F.col("s_name"))),
        triples(supplier, uri_col("supplier:", F.col("s_suppkey")), "nation", uri_col("nation:", F.col("s_nationkey"))),
    ]
    if include_orders:
        o = orders
        if order_priority is not None:
            o = o.where(F.col("o_orderpriority") == order_priority)
        parts += [
            triples(o, uri_col("order:", F.col("o_orderkey")), "customer", uri_col("customer:", F.col("o_custkey"))),
            triples(o, uri_col("order:", F.col("o_orderkey")), "priority", str_col(F.col("o_orderpriority"))),
            triples(o, uri_col("order:", F.col("o_orderkey")), "okey", int_col(F.col("o_orderkey"))),
        ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # source rows are unique per (entity, predicate) → no dedup shuffle needed
    return TriplesDB.from_df(df, dedup=False, cache=cache)
