"""Relational analytics layer — the Spark-native operator surface the
reference lacks (SURVEY §2.5 / §7 phase 7): aggregations, joins,
window functions, sorts/top-k, grouping, set ops.

Everything is expressed with built-in ``pyspark.sql.functions`` so the
whole plan stays inside whole-stage codegen; joins against the small
dimension tables are explicitly broadcast.  Monetary aggregates are
rounded to 2dp so results are float-stable against independent engines
(oracle comparisons).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sources.tpch_graph import load_tables

__all__ = [
    "q1_pricing_summary",
    "q3_top_unshipped_revenue",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "topk_orders_per_customer",
    "running_customer_spend",
    "orders_by_month",
    "segment_stats",
    "events_hourly",
    "events_sessionize",
    "q4_order_priority",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_part_value_concentration",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "grouping_sets_priority",
    "cohort_retention",
    "events_json_stats",
    "pivot_priority_by_segment",
    "range_events_clicks",
    "events_value_outliers",
]


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → hash-agg with
    map-side partial aggregation; no joins, one shuffle on the 6-ish
    distinct group keys."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # decimal arithmetic: exact and order-independent, so aggregates are
    # bit-identical across engines and partitionings (double sums are not)
    ext = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    disc_price = ext * (1 - disc)
    charge = disc_price * (1 + tax)
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(ext).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / cnt, 4).alias("avg_qty"),
            F.round(F.sum(disc).cast("double") / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_top_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: filter orders/customer/lineitem, join, aggregate
    revenue per order, top-10.

    No forced broadcasts: orders and customer both scale with SF, so a
    broadcast hint sized for the bench would OOM executors at 100×.  AQE
    picks broadcast joins at runtime whenever the filtered sides fit
    under spark.sql.autoBroadcastJoinThreshold, and converts to skew-safe
    sort-merge when they don't."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t["lineitem"].where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders.join(cust, orders.o_custkey == cust.c_custkey),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: the big fact joins (lineitem⋈orders⋈customer⋈
    supplier) are left to AQE — those tables all scale with SF, so forced
    broadcast hints would OOM at 100×.  Only the fixed-cardinality
    nation (25 rows) and region (5 rows) dims keep explicit hints."""
    t = load_tables(spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem")
    region = t["region"].where(F.col("r_name") == "EUROPE")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"],
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-sum; every predicate pushes down
    to the parquet reader."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue")
    )


def topk_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Window top-k: rank orders per customer by value; the window sort
    shuffles once on custkey (same partitioning a downstream per-customer
    op could reuse)."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rank")
    )


def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window (ROWS UNBOUNDED PRECEDING .. CURRENT)."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("cum_spend"),
    )


def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("month")
    )


def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the streaming tumbling-window aggregation
    (``matcha_spark.streaming`` runs the same plan on readStream)."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    hour = (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600).cast("long")
    return (
        ev.groupBy(hour.alias("hour_epoch"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("hour_epoch", "event_type")
    )


def events_sessionize(spark: SparkSession, sf_dir: str, gap_s: int = 1800) -> DataFrame:
    """Gap-based sessionization via lag + conditional cumsum — one window
    shuffle on user_id; the streaming twin uses applyInPandasWithState."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    ts = F.unix_timestamp("ts")
    new_sess = F.when(
        (ts - F.lag(ts).over(w)).isNull() | ((ts - F.lag(ts).over(w)) > gap_s), 1
    ).otherwise(0)
    sess = ev.withColumn("session_idx", F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_idx")
    )


def events_sessionize_native(spark: SparkSession, sf_dir: str, gap_s: int = 1800) -> DataFrame:
    """Gap sessionization via Spark's built-in ``session_window``
    aggregation — no window-function sort pass: sessions merge inside
    the hash aggregate (partial map-side merge included), and the exact
    same plan runs incrementally under Structured Streaming
    (``streaming.events.sessionize_native``).  This is the preferred
    scale form of :func:`events_sessionize`; the lag+cumsum variant is
    kept for the session-index contract."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        # unix_micros only accepts LTZ; diff against an NTZ epoch keeps the
        # naive-as-UTC semantics DuckDB's epoch_us(ts) oracle uses, with no
        # dependence on the session timezone
        start_us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', w.start)"
        )
    else:
        start_us = F.unix_micros(F.col("w.start"))
    return (
        ev.groupBy(
            F.col("user_id"), F.session_window(F.col("ts"), f"{gap_s} seconds").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            start_us.alias("session_start_us"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start_us")
    )


def rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation: ROLLUP(nation, segment) — subtotals and
    grand total in one pass (Expand + single shuffle)."""
    t = load_tables(spark, sf_dir, "customer", "nation")
    j = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return (
        j.rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result-level set operators (absent from the reference, SURVEY
    §2.5): INTERSECT / EXCEPT / UNION over customer vs supplier nations."""
    t = load_tables(spark, sf_dir, "customer", "supplier", "nation")
    nat = F.broadcast(t["nation"])
    cust_nations = (
        t["customer"].join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name").distinct()
    )
    supp_nations = (
        t["supplier"].join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name").distinct()
    )
    both = cust_nations.intersect(supp_nations).select(F.lit("both").alias("op"), "n_name")
    cust_only = cust_nations.exceptAll(supp_nations).select(F.lit("cust_only").alias("op"), "n_name")
    all_n = cust_nations.union(supp_nations).distinct().select(F.lit("any").alias("op"), "n_name")
    return both.unionByName(cust_only).unionByName(all_n).orderBy("op", "n_name")


def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the customer's latest order at or
    before the event timestamp (union-merge pattern: one shuffle, no
    theta-join — see operators/joins.py)."""
    from .operators.joins import asof_join
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "events", "orders")
    # dedupe reference side to one row per (key, ts): deterministic winner
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    orders = (
        t["orders"]
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey")
    )
    ev = t["events"].select("event_id", "user_id", "ts")
    out = asof_join(
        ev.withColumnRenamed("user_id", "__key"),
        orders.withColumnRenamed("o_custkey", "__key"),
        on="__key",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey"],
    )
    return out.select(
        "event_id",
        F.col("__key").alias("user_id"),
        F.col("o_orderkey").alias("okey"),
    ).orderBy("event_id")


def asof_events_orders_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event picks the customer's *next* order
    at or after the event timestamp (mirrored union-merge window)."""
    from .operators.joins import asof_join
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "events", "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey"))
    orders = (
        t["orders"]
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey")
    )
    ev = t["events"].select("event_id", "user_id", "ts")
    out = asof_join(
        ev.withColumnRenamed("user_id", "__key"),
        orders.withColumnRenamed("o_custkey", "__key"),
        on="__key",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey"],
        direction="forward",
    )
    return out.select(
        "event_id",
        F.col("__key").alias("user_id"),
        F.col("o_orderkey").alias("okey"),
    ).orderBy("event_id")


def segment_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort-based, linear interpolation) of account
    balance per market segment."""
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),
        )
        .orderBy("c_mktsegment")
    )


def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: all grouping-set combinations of order priority
    × status in one Expand pass."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS: count orders per priority that have at
    least one late-shipping lineitem.  The subquery is a LEFT SEMI join
    (equi on orderkey + residual non-equi ship>order date) — Spark probes
    the hash table and emits each order at most once; never builds the
    multiplied join output."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    return (
        orders.join(
            t["lineitem"],
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style anti-join + scalar subquery: positive-balance
    customers with above-average account balance and NO urgent orders.
    The average is a 1-row aggregate (broadcast by AQE); the NOT EXISTS
    is a LEFT ANTI join on custkey against the filtered orders side —
    the scale shape (never a NOT IN over a collected list)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    cust = t["customer"].where(F.col("c_acctbal") > 0.0)
    avg_bal = cust.agg(F.avg("c_acctbal").alias("avg_bal"))
    rich = cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal")).drop(
        "avg_bal"
    )
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        rich.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style correlated min: for each part in a brand, the
    supplier(s) offering the minimum unit price.  Expressed as a window
    min over the part partition + filter — one shuffle on partkey, no
    self-join re-scan of lineitem (the classic correlated-subquery plan
    would scan the fact table twice)."""
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem")
    part = t["part"].where(F.col("p_brand") == "Brand#1")
    unit = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        / F.col("l_quantity").cast("decimal(18,4)")
    ).cast("decimal(18,4)")
    offers = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "l_suppkey", unit.alias("unit_price"))
    )
    w = Window.partitionBy("p_partkey")
    best = offers.withColumn("min_price", F.min("unit_price").over(w)).where(
        F.col("unit_price") == F.col("min_price")
    )
    return (
        best.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            F.col("s_name").alias("supplier"),
            F.col("unit_price").cast("double").alias("unit_price"),
        )
        .dropDuplicates(["p_partkey", "supplier"])
        .orderBy("p_partkey", "supplier")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style nation-pair trade volume: revenue shipped from a
    supplier nation to a customer nation per year, for one ordered pair
    of nations in both directions.

    Join-order is selectivity-first: nation is pre-filtered to the two
    named nations (2 of 25 rows → ~8% of suppliers/customers survive)
    and joined — broadcast, the only safe forced broadcast at 100 TB —
    into supplier, which then prunes lineitem *before* the two largest
    shuffles (orders, customer).  The customer side is likewise
    pre-filtered via its nation join before meeting orders.  The
    residual ``pair | rpair`` cross-predicate (which needs both nation
    names bound) filters last, on already-pruned rows."""
    t = load_tables(
        spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem"
    )
    nations = ("NATION_1", "NATION_2")
    n1 = t["nation"].where(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].where(F.col("n_name").isin(*nations)).select(
        F.col("n_nationkey").alias("cust_nkey"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    supp = t["supplier"].join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nkey")
    ).select("s_suppkey", "supp_nation")
    cust = t["customer"].join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nkey")
    ).select("c_custkey", "cust_nation")
    return (
        t["lineitem"]
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(pair | rpair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def events_funnel(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel analysis: how many users performed step 1, then
    step 2 strictly after it, then step 3 after that, … (each stage's
    timestamp is the *earliest* event of that type after the previous
    stage — the standard strict-sequence funnel).

    Scale shape: one pass per stage, each ``filter(event_type) →
    groupBy(user_id)`` with the type filter pushed to the scan and the
    per-stage state joined back on user_id — k−1 hash joins on the same
    key, never a window over all events.  Each stage's (user_id, t)
    table is materialized once (``memo_persist``): stage k feeds both
    stage k+1 and the final count, and without materialization the
    nested lineage rescans the event log O(k²) times (verified: 6
    FileScans for 3 steps before, k+… after).
    Output: (step_idx, step, n_users), monotone non-increasing."""
    from .cache import memo_persist

    ev = load_tables(spark, sf_dir, "events")["events"]
    stage = memo_persist(
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    counts = [(1, steps[0], stage)]
    for i, step in enumerate(steps[1:], start=2):
        nxt = memo_persist(
            ev.where(F.col("event_type") == step)
            .join(stage.select("user_id", F.col("t").alias("prev_t")), "user_id")
            .where(F.col("ts") > F.col("prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts.append((i, step, nxt))
        stage = nxt
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(s).alias("step"), "n_users"
        )
        for i, s, df in counts
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("step_idx")


def events_funnel_windowed(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_s: int = 3600,
) -> DataFrame:
    """Conversion-window funnel (r08): like :func:`events_funnel`, but
    every later stage must land within ``within_s`` seconds of the
    user's FUNNEL ENTRY (their first step-1 event) — the product-
    analytics definition of an n-step conversion rate.  Same scale
    shape (k−1 equi-joins on user_id, per-stage memo), with the entry
    anchor ``t0`` carried through each stage."""
    from .cache import memo_persist

    ev = load_tables(spark, sf_dir, "events")["events"]
    horizon = F.col("t0") + F.expr(f"INTERVAL {int(within_s)} SECONDS")
    stage = memo_persist(
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .withColumn("t0", F.col("t"))
    )
    counts = [(1, steps[0], stage)]
    for i, step in enumerate(steps[1:], start=2):
        nxt = memo_persist(
            ev.where(F.col("event_type") == step)
            .join(
                stage.select(
                    "user_id", F.col("t").alias("prev_t"), "t0"
                ),
                "user_id",
            )
            .where((F.col("ts") > F.col("prev_t")) & (F.col("ts") <= horizon))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"), F.min("t0").alias("t0"))
        )
        counts.append((i, step, nxt))
        stage = nxt
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step_idx"), F.lit(s).alias("step"), "n_users"
        )
        for i, s, df in counts
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("step_idx")


# ---------------------------------------------------------------------------
# TPC-H completion (q8–q21, schema-adapted)
#
# The test tables carry a trimmed TPC-H schema (no partsupp; lineitem has
# no commitdate/receiptdate/shipmode; part has no container).  Each query
# below keeps the *plan shape* its TPC-H number is famous for — that is
# what the engine is exercised on — and documents where a predicate or
# cost column was re-derived from the available columns.
# ---------------------------------------------------------------------------


def _revenue():
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: of all PROMO-part volume
    sold into AMERICA-region customers over two years, the fraction
    supplied by one nation, per order year.

    Plan shape: the 8-way join tree prunes the two fact shuffles early —
    part (filtered, ~1/6 survives) broadcasts into lineitem before
    orders/customer join in, and the two nation dims + region are
    broadcast (fixed 25/5 rows at any SF).  The share is a conditional
    aggregate over one grouped pass, not a self-join of two aggregates."""
    t = load_tables(
        spark, sf_dir, "part", "supplier", "lineitem", "orders",
        "customer", "nation", "region",
    )
    part = t["part"].where(F.col("p_type") == "PROMO").select("p_partkey")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust_nation = t["nation"].select("n_nationkey", "n_regionkey")
    region = t["region"].where(F.col("r_name") == "AMERICA")
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _revenue()
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit by supplier nation and year for one part
    family.  No partsupp in the trimmed schema, so supply cost is
    re-derived as 60% of p_retailprice per unit (fixed-margin proxy;
    the plan — part-filtered fact join + two-key hash aggregate — is
    unchanged).  part is brand-filtered and broadcast; nation (25 rows)
    is broadcast; lineitem shuffles once for the group-by."""
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem", "nation")
    part = t["part"].where(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    # narrow decimal precisions keep the 3-factor product + subtraction
    # under precision 38 (Spark would otherwise *round* the result type,
    # engine-specifically); values fit decimal(12,2) with huge headroom
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    profit = ext * (1 - disc) - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit(0.6).cast("decimal(3,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: top-20 customers by revenue
    on returned lines (l_returnflag = 'R') for orders placed in one
    quarter.  orders is date-pruned before joining lineitem; the final
    top-20 is TakeOrderedAndProject (no global sort materialization)."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style value concentration: parts whose traded value
    (from lineitem — the trimmed schema has no partsupp stock) exceeds a
    fixed fraction of total traded value for one region's suppliers.

    Plan shape preserved from Q11: a grouped aggregate filtered against
    a scalar global aggregate of the *same* pre-aggregated input — the
    per-part table is computed once (memo_persist) and feeds both the
    total (one extra scalar agg over ~|part| rows) and the HAVING join;
    the lineitem fact is scanned once, not twice."""
    from .cache import memo_persist

    t = load_tables(spark, sf_dir, "supplier", "lineitem", "nation", "region")
    nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    supp = t["supplier"].join(
        F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    per_part = memo_persist(
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        # threshold compare on doubles: a decimal multiply here would
        # overflow precision 38 and round engine-specifically; double
        # arithmetic on the two exact sums is bit-deterministic
        .where(F.col("value_dec").cast("double") > F.col("total_dec").cast("double") * 0.001)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), F.col("p_partkey"))
    )


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style priority split over a shipping dimension.  The
    trimmed lineitem has no shipmode/commitdate/receiptdate, so the
    grouping dimension is re-derived as the ship-delay bucket
    (shipdate − orderdate: 60–120 days vs 120+) for lines shipped in
    one year; the measure is Q12's verbatim high/low-priority
    conditional counts.  One orders⋈lineitem join, one grouped pass."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(delay >= 60)
        .groupBy(
            F.when(delay < 120, "60-119").otherwise("120+").alias("delay_bucket")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution: LEFT OUTER
    join customer→orders (so zero-order customers survive with count 0),
    count per customer, then histogram the counts.  Two hash aggregates;
    the second groups ~|customer| rows, tiny at any SF.  The Q13 comment
    filter is re-derived as an order-priority exclusion."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    orders = t["orders"].where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo share: percentage of one month's revenue
    from PROMO-type parts.  part joins broadcast into the date-pruned
    lineitem; the share is one conditional aggregate pass."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    vol = _revenue()
    return (
        li.join(
            F.broadcast(t["part"].select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: supplier(s) with maximum revenue in
    one quarter.  The revenue view is computed once (memo_persist) and
    feeds both the scalar max (broadcast) and the equality filter — the
    fact table is scanned once, and there is no single-partition global
    window."""
    from .cache import memo_persist

    t = load_tables(spark, sf_dir, "supplier", "lineitem")
    revenue0 = memo_persist(
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_dec"))
    )
    best = revenue0.agg(F.max("total_dec").alias("max_dec"))
    return (
        revenue0.join(F.broadcast(best), F.col("total_dec") == F.col("max_dec"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier counts per part attribute: distinct
    suppliers that have shipped each (brand, type, size) combination —
    re-derived from lineitem since the trimmed schema has no partsupp.
    part is filter-broadcast; count(DISTINCT) expands to the standard
    two-phase aggregate (dedup on full key, then count) — no
    driver-side distinct."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    part = t["part"].where(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand"), F.col("p_type"), F.col("p_size")
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-order revenue: average yearly revenue lost
    if small-quantity lines (below 20% of the part's average quantity)
    of one brand were not filled.  The correlated AVG subquery is
    decorrelated into a window average over the part partition — one
    shuffle on partkey, one scan of the brand-pruned fact (the naive
    plan scans it twice and re-joins)."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    part = t["part"].where(F.col("p_brand") == "Brand#3").select("p_partkey")
    lp = t["lineitem"].join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    return (
        lp.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume customers: orders whose total
    quantity exceeds a threshold, with their customer.  The HAVING
    subquery is a pre-aggregation of lineitem joined back to orders —
    the aggregate halves the rows entering the join, and the top-100 is
    TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .where(F.col("qty_dec") > 300)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: three OR-ed
    (brand, size-range, quantity-range) arms over the part⋈lineitem
    join.  Catalyst splits the disjunction per side: the OR of the
    three (brand AND size-range) arms pushes to the part scan and the
    OR of the three quantity ranges to the lineitem scan (both visible
    as Or(...) PushedFilters), with the full cross-side predicate as
    the join residual — a single broadcast join, not a 3-way union of
    scans (plan-tested)."""
    t = load_tables(spark, sf_dir, "part", "lineitem")
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(11, 20)
        & F.col("l_quantity").between(10, 30)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(21, 30)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where(arm1 | arm2 | arm3)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style dominant suppliers: suppliers in one region that
    shipped more than half of some small-part's total 1997 quantity.
    Q20's partsupp availability test is re-derived from shipped
    quantities: per-(part, supplier) totals vs per-part totals — the
    per-pair aggregate is computed once (memo_persist) and rolled up to
    the per-part total, so the fact is scanned once; the final DISTINCT
    supplier set is a semi-join-shaped dedup on a tiny key set."""
    from .cache import memo_persist

    t = load_tables(
        spark, sf_dir, "part", "supplier", "lineitem", "nation", "region"
    )
    part = t["part"].where(F.col("p_name").like("small%")).select("p_partkey")
    li97 = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_pair = memo_persist(
        li97.groupBy("l_partkey", "l_suppkey").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pair_qty")
        )
    )
    per_part = per_pair.groupBy("l_partkey").agg(F.sum("pair_qty").alias("part_qty"))
    dominant = (
        per_pair.join(per_part, "l_partkey")
        .where(F.col("pair_qty").cast("double") > F.col("part_qty").cast("double") * 0.5)
        .select("l_suppkey")
        .distinct()
    )
    nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style suppliers-who-kept-orders-waiting: on finished
    multi-supplier orders, suppliers whose line was returned while no
    other supplier's line on the same order was ('R' re-derives Q21's
    receipt-after-commit lateness, absent those columns).

    Q21's EXISTS + NOT EXISTS pair is decorrelated into one per-order
    aggregate — distinct suppliers and distinct returned-suppliers per
    order — joined back to the returned (order, supplier) pairs: two
    hash aggregates and one join instead of two correlated re-probes of
    lineitem.  Top-20 is TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir, "supplier", "orders", "lineitem")
    li = (
        t["lineitem"]
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_returnflag")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    returned = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        returned.join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def grouping_sets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED from the oracle registry in r12 (pure-Spark differential
    vs the unioned plain group-bys in
    test_retired_entry_equivalences_r12; rollup/cube siblings stay
    oracle-backed).  Explicit GROUPING SETS (the general form behind
    rollup/cube — exactly the requested combinations, one Expand
    pass): per-priority totals, per-status totals, and the grand
    total, no cross product."""
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY o_orderpriority, o_orderstatus
        """
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, distinct
    actives per (cohort, week offset) — the standard growth-analytics
    rollup.

    Plan shape: one min-per-user aggregate (the cohort assignment),
    joined back onto the event stream on user_id, then a distinct-count
    aggregate on the (cohort, offset) pair — two shuffles on user-scale
    keys, no window over the whole log."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohort = first.select(
        "user_id", F.date_trunc("week", F.col("first_ts")).alias("cohort_start")
    )
    return (
        ev.join(cohort, "user_id")
        .select(
            F.date_format("cohort_start", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.col("ts"), F.col("cohort_start")) / 7)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def events_salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation, end-to-end (r08): event_type is
    exactly the low-cardinality hot-key shape that melts a plain
    groupBy's reducers at 100 TB; ``salted_agg`` partial-aggregates on
    ``(event_type, salt)`` (deterministic salt from event_id), then
    finalizes per type — and the oracle proves the two-phase result
    equals the single-phase GROUP BY."""
    from .operators.skew import salted_agg

    ev = load_tables(spark, sf_dir, "events")["events"]
    out = salted_agg(
        ev,
        ["event_type"],
        {"n": "count(*)", "total": "sum(value)", "max_v": "max(value)"},
        n_salts=16,
        det_col="event_id",
    )
    return out.select(
        "event_type",
        "n",
        F.round("total", 4).alias("total"),
        F.round("max_v", 4).alias("max_v"),
    ).orderBy("event_type")


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (r08): the Markov bigram
    counts behind funnel/path analytics.  One ranking window per user
    stream (``lead`` over (ts, event_id) — deterministic tiebreak),
    one hash aggregate over (from, to), and a per-source-type share via
    a second, tiny window over the 5×5 matrix."""
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    mat = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", nxt)
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    share = Window.partitionBy("event_type")
    return mat.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(share), 6).alias("p_next"),
    ).orderBy("event_type", "next_type")


def events_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate-and-salt equi-join end-to-end (r08): events (the
    skew-prone fact side, deterministic salt from event_id) against the
    customer segment dim exploded ×8 — the manual fallback for skewed
    keys a broadcast can't fix and AQE's sort-merge splitter misses —
    then rolled up per (segment, event type).  The oracle proves the
    salted join ≡ the plain join."""
    from .operators.skew import salted_join

    t = load_tables(spark, sf_dir, "events", "customer")
    dim = t["customer"].select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    j = salted_join(
        t["events"].select("event_id", "user_id", "event_type"),
        dim,
        on=["user_id"],
        n_salts=8,
        det_col="event_id",
    )
    return (
        j.groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment", "event_type")
    )


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: parse the events ``props`` JSON
    with a typed ``from_json`` (schema'd, vectorized JVM parser — not a
    per-row Python loads) and aggregate the extracted field per event
    type.  The JSON parse is a narrow map; the aggregate is one
    partial+final pass."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    k = F.from_json(F.col("props"), "struct<k:long>")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.sum("k") / F.count("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def pivot_priority_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab via pivot: order counts per market segment × priority.
    Explicit pivot values keep the plan a single pass (no values-scan
    job) and give deterministic, oracle-matchable column names; the
    pivot compiles to one conditional aggregate — exactly the CASE-sum
    the oracle writes by hand."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    joined = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderpriority", pri)
        .count()
    )
    renames = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "notspec",
        "5-LOW": "low",
    }
    return out.select(
        "c_mktsegment",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(renames[p]) for p in pri],
    ).orderBy("c_mktsegment")


def range_events_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (attribution): click events falling inside
    the hour before one of the same user's purchases.  The bucketing
    turns the point-in-interval theta-join into an equi-join on
    (key, time bucket) + residual filter — see operators/joins.py."""
    from .operators.joins import range_join

    ev = load_tables(spark, sf_dir, "events")["events"]
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", F.col("user_id").alias("__key"), "ts"
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("__key"),
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("win_start"),
        F.col("ts").alias("win_end"),
    )
    out = range_join(
        clicks, windows, on="__key", point="ts",
        range_start="win_start", range_end="win_end",
        bucket_width_s=900,
    )
    return out.select(
        "event_id", F.col("__key").alias("user_id"), "purchase_id"
    ).orderBy("event_id", "purchase_id")


def events_value_outliers(spark: SparkSession, sf_dir: str, z: float = 3.0) -> DataFrame:
    """Per-type z-score anomaly detection over event values: one
    grouped aggregate computes each event type's mean/stddev, broadcast
    back onto the stream; events beyond ``z`` standard deviations are
    flagged.  Two passes over the log, no window — the standard
    streaming-adjacent outlier sweep done batch-side."""
    ev = load_tables(spark, sf_dir, "events")["events"]
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.col("sigma") > 0)
        .select(
            "event_id",
            "event_type",
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4).alias("zscore"),
        )
        .where(F.abs(F.col("zscore")) > z)
        .orderBy("event_id")
    )
