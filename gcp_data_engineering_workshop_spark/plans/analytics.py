"""General analytics query plans (SURVEY.md §2 B-block).

These are the engine-core operators the reference's serving/SQL layer
relies on (frontend-app/app.py issues plain analytic SQL against the
pipeline's output store): multi-aggregate grouping, multi-way joins
with dimension broadcast, top-k, distinct aggregation, anti joins,
hierarchical rollups, sessionization, funnels, and percentiles —
expressed over the TPC-H-ish test tables.

Scale/oracle discipline:
- money sums use DECIMAL(18,4)-exact arithmetic cast to double at the
  end (bit-stable under any partitioning / AQE re-plan);
- dimension sides of joins are explicitly broadcast;
- every top-k has a total deterministic ordering;
- window functions are always partitioned (never a global sort of the
  fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gcp_data_engineering_workshop_spark.catalog import load_table

_DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(_DEC)


def _revenue_expr():
    """Exact l_extendedprice * (1 - l_discount) as decimal."""
    return _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: TPC-H Q1 pricing summary (multi-aggregate groupBy).

    One shuffle with map-side partial aggregation; 4-group output.
    """
    li = load_table(spark, "lineitem", sf_dir)
    # charge multiplies THREE decimals — at (18,4) factors the
    # product needs precision 56 and Spark's allowPrecisionLoss
    # rounds where DuckDB widens, which showed up as float-tolerant
    # drift at the sf0.1 spot-check (PLANS.md r10). Narrow casts
    # keep every intermediate inside precision 38 so NEITHER engine
    # ever rounds: (12,4) x (7,4) -> (20,8), x (7,4) -> (28,12),
    # exact fixed-point end to end (l_extendedprice < 1e8 fits
    # (12,4); the discount/tax factors are in [0, 2]).
    _d12 = F.col("l_extendedprice").cast("decimal(12,4)")
    _one6 = F.lit(1).cast("decimal(6,4)")
    charge = (_d12
              * (_one6 - F.col("l_discount").cast("decimal(6,4)"))
              * (_one6 + F.col("l_tax").cast("decimal(6,4)")))
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_revenue_expr()).cast("double")
            .alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: TPC-H Q3 shipping-priority style: 3-way join + group +
    deterministic top-10. Customer side is dimension-small after the
    segment filter — broadcast."""
    cust = load_table(spark, "customer", sf_dir).where(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_revenue_expr()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: TPC-H Q5 style 6-way join with local-supplier condition
    (c_nationkey = s_nationkey); region/nation/supplier broadcast."""
    region = load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier),
              (li.l_suppkey == supplier.s_suppkey)
              & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue_expr()).cast("double").alias("revenue"))
    )


def topk_per_group(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """B4: top-k per group (deterministic total order: retailprice
    desc, partkey asc). Rank comes from the distributed group-rank
    (operators/ids.py assign_group_ranks) rather than a window
    partitioned by brand alone — ~25 brands over a web-scale part
    table would funnel each brand through one task."""
    from gcp_data_engineering_workshop_spark.operators.ids import assign_group_ranks

    part = load_table(spark, "part", sf_dir)
    ranked = assign_group_ranks(
        part.select("p_brand", "p_partkey", "p_name", "p_retailprice"),
        ["p_brand"], [F.col("p_retailprice").desc(), F.col("p_partkey")],
        rank_col="rank_in_brand")
    return (ranked.where(F.col("rank_in_brand") <= k)
            .select("p_brand", "p_partkey", "p_name", "p_retailprice",
                    "rank_in_brand"))


def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: exact distinct aggregation per key (expand+two-phase agg in
    Spark; at scale prefer approx_count_distinct — see bench notes)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def anti_join_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: left-anti join — customers with no orders since 2001-01-01
    (the order-date predicate is pushed to the scan before the anti
    join, so the build side is already filtered)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: hierarchical ROLLUP (year -> priority) over orders."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders
        .select(F.year("o_orderdate").cast("bigint").alias("order_year"),
                F.col("o_orderpriority"),
                F.col("o_totalprice"))
        .rollup("order_year", "o_orderpriority")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def sessionize_events(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = 30) -> DataFrame:
    """B8: gap-based sessionization. A session starts where the gap
    from the previous event of the same user exceeds the threshold.
    Single window pass partitioned by user — no global sort."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros("ts")).over(w)
    is_start = F.when(
        prev.isNull()
        | ((F.unix_micros("ts") - prev) > gap_minutes * 60 * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    return (
        ev.select("user_id", is_start.alias("is_start"))
        .groupBy("user_id")
        .agg(F.sum("is_start").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: ordered funnel view -> click -> purchase per user; one row
    of stage counts. Per-stage min-timestamp joins keep every step an
    aggregate + broadcast-size join of per-user rows."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("v_ts")))
    c = (ev.where(F.col("event_type") == "click")
         .join(v, "user_id").where(F.col("ts") > F.col("v_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("c_ts")))
    p = (ev.where(F.col("event_type") == "purchase")
         .join(c, "user_id").where(F.col("ts") > F.col("c_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("p_ts")))
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: exact continuous percentiles of l_quantity per return
    flag. (At 100 TB you'd use approx_percentile; the exact version is
    the oracle-checkable contract and the accuracy baseline.)"""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95"),
    )
