"""Extended analytics operators (SURVEY.md §2 B-block, round-1
widening): more TPC-H-shaped queries plus the temporal-join and
reshaping operators (as-of join, range join, pivot, cube) an
analytics engine is expected to cover.

Same discipline as plans/analytics.py: decimal-exact money math,
broadcast dimensions, partitioned window functions, deterministic
orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gcp_data_engineering_workshop_spark.catalog import load_table

_DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(_DEC)


def _revenue():
    return _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 (TPC-H Q6 shape): pure scan-filter-aggregate — the query
    whose whole cost is predicate pushdown + column pruning. One
    output row."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where((F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
                 & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
                 & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                 & (F.col("l_quantity") < 24))
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount"))
              .cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 (TPC-H Q10 shape): revenue lost to returns per customer,
    top 20. Fact-fact join shuffles on the order key; customer side
    joins after aggregation (smaller)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00")))
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(F.col("c_custkey"), F.col("c_name"), F.col("c_mktsegment"),
                F.col("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 (TPC-H Q14 shape): promo revenue share — conditional
    aggregation over a broadcast part join. Ratio of exact decimals
    cast to double (identical division in the oracle)."""
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00")))
    rev = _revenue()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.sum(F.when(F.col("p_type") == "PROMO", rev)
                   .otherwise(F.lit(0).cast(_DEC))).cast("double") * 100.0
             / F.sum(rev).cast("double")).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 (TPC-H Q18 shape): customers with orders above a quantity
    threshold — aggregate-then-semijoin keeps the big side lean."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
           .where(F.col("total_qty") > 150))
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: backward as-of join — for every purchase, the most recent
    preceding 'view' of the same user. Expressed as a union + window
    (last non-null over time order), which scales as one shuffle per
    key instead of a per-row lookup; the classic Spark formulation of
    as-of/point-in-time joins."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_event_id"),
                F.col("ts").alias("purchase_ts"), "last_view_ts")
    )


def range_join_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: range join — errors of the same user in the 5 minutes
    before each purchase. Equi on user + ts range predicate; Spark
    plans equi-shuffle + range filter (AQE-skew-safe)."""
    ev = load_table(spark, "events", sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("p_ts"))
    e = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"))
    joined = p.join(
        e, (p.user_id == e.e_user)
        & (e.e_ts < p.p_ts)
        & (e.e_ts >= p.p_ts - F.expr("INTERVAL 5 MINUTES")), "left")
    return (
        joined.groupBy("user_id", "purchase_event_id")
        .agg(F.count("e_ts").alias("n_errors_5m_before"))
    )


def pivot_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: pivot — daily event counts, one column per event type
    (fixed value list, so the plan is a single aggregation and the
    schema is stable for the oracle)."""
    ev = load_table(spark, "events", sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: CUBE over (status, priority) — all 4 grouping sets in one
    pass."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: HLL-style approximate distinct users per event type
    (the 100 TB path for B5; rows-only oracle — accuracy vs the exact
    count is pytest-bounded at 5% rsd)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def salted_agg_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: skew-safe two-phase salted aggregation of tick volume per
    ticker (operators/skew.py). Integer sums, so the result is
    bit-identical to the plain groupBy the oracle runs."""
    from gcp_data_engineering_workshop_spark.operators.skew import salted_sum_count
    from gcp_data_engineering_workshop_spark.sources.ticks import ticks

    t = ticks(spark, sf_dir).select(
        "ticker", "volume",
        F.col("ts"))
    out = salted_sum_count(t, key="ticker", value="volume", n_salts=16,
                           salt_source=F.unix_micros("ts"))
    return out.select("ticker", F.col("total").alias("total_volume"),
                      F.col("n_rows").alias("n_ticks"))


def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: mean/variance/stddev per key from exact decimal sums
    (sum, sum of squares) — deterministic across engines, unlike
    streaming/Welford accumulations which are order-dependent."""
    from gcp_data_engineering_workshop_spark.sources.ticks import ticks

    t = ticks(spark, sf_dir)
    s = F.sum(F.col("price").cast("decimal(18,4)")).cast("double")
    s2 = F.sum(F.col("price").cast("decimal(18,4)")
               * F.col("price").cast("decimal(18,4)")).cast("double")
    n = F.count(F.lit(1))
    mean = s / n
    var = (s2 - s * s / n) / (n - F.lit(1))
    return t.groupBy("ticker").agg(
        n.alias("n_ticks"),
        F.round(mean, 6).alias("mean_price"),
        F.round(var, 6).alias("var_price"),
        F.round(F.sqrt(var), 6).alias("stddev_price"),
    )


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: native gap-based session windows (F.session_window,
    30-minute gap) per user: one row per session with its start and
    event count. The streaming twin uses the same operator with a
    watermark (tests/test_streaming.py)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


def q19_complex_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 (TPC-H Q19 shape): disjunction of conjunctive
    brand/size/quantity ranges over a broadcast part join — exercises
    boolean predicate simplification + partial pushdown."""
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    return j.where(cond).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"))


def corr_price_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: Pearson correlation of price and volume per ticker from
    exact decimal sums (sum-product form) — order-independent, unlike
    the built-in corr's streaming accumulation."""
    from gcp_data_engineering_workshop_spark.sources.ticks import ticks

    t = ticks(spark, sf_dir)
    dx = F.col("price").cast("decimal(18,4)")
    dy = F.col("volume").cast("decimal(18,4)")
    sx = F.sum(dx).cast("double")
    sy = F.sum(dy).cast("double")
    sxx = F.sum(dx * dx).cast("double")
    syy = F.sum(dy * dy).cast("double")
    sxy = F.sum(dx * dy).cast("double")
    n = F.count(F.lit(1))
    num = sxy - sx * sy / n
    den = F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
    return t.groupBy("ticker").agg(
        n.alias("n_ticks"),
        F.round(num / den, 6).alias("corr_price_volume"))


def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: approximate percentiles per group (approx_percentile /
    KLL-style sketch) — the 100 TB path for B10's exact percentiles
    (exact needs a per-group sort; the sketch is one streaming pass
    with bounded memory). Accuracy vs B10 is pytest-bounded."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, 0.25, 1000)").alias("p25"),
        F.expr("approx_percentile(l_quantity, 0.5, 1000)").alias("p50"),
        F.expr("approx_percentile(l_quantity, 0.75, 1000)").alias("p75"),
        F.expr("approx_percentile(l_quantity, 0.95, 1000)").alias("p95"),
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26 (TPC-H Q7 shape): shipping volume between two nations per
    year — double nation join with a symmetric pair predicate."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00")))
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 (TPC-H Q8 shape): one nation's revenue share per year
    among ECONOMY-part orders shipped to customers of one region —
    conditional aggregation over a 7-table join."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00")))
    part = load_table(spark, "part", sf_dir).where(
        F.col("p_type") == "ECONOMY").select("p_partkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation_c = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    nation_s = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    region = load_table(spark, "region", sf_dir).where(
        F.col("r_name") == "AMERICA").select("r_regionkey")
    rev = _revenue()
    target = F.when(F.col("supp_nation") == "NATION_3", rev) \
        .otherwise(F.lit(0).cast(_DEC))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg((F.sum(target).cast("double")
              / F.sum(rev).cast("double")).alias("mkt_share"),
             F.count(F.lit(1)).alias("n_items"))
    )


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: warehouse MERGE semantics — apply a deterministic update
    batch to orders (every 97th order re-priced +10% and flagged 'X';
    one synthetic new order inserted) via one full-outer join + 
    coalesce (operators/merge.py)."""
    from gcp_data_engineering_workshop_spark.operators.merge import merge_upsert

    orders = load_table(spark, "orders", sf_dir)
    updates = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .select("o_orderkey", "o_custkey",
                F.lit("X").alias("o_orderstatus"),
                (F.col("o_totalprice").cast(_DEC) * F.lit(1.1).cast(_DEC))
                 .cast("double").alias("o_totalprice"),
                "o_orderdate", "o_orderpriority")
    )
    new_row = spark.createDataFrame(
        [(999999999, 1, "N", 123.45, None, "1-URGENT")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    merged = merge_upsert(orders, updates.unionByName(new_row),
                          keys=["o_orderkey"])
    return merged.select("o_orderkey", "o_custkey", "o_orderstatus",
                         "o_totalprice", "o_orderpriority")


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29 (TPC-H Q4 shape): order-priority checking — the canonical
    correlated-EXISTS semi-join. Counts orders in a quarter that have
    at least one late lineitem (shipped > 60 days after the order
    date; this dataset has no l_commitdate/l_receiptdate, so lateness
    is ship-vs-order-date).

    Plan shape: LEFT SEMI join on the order key — the EXISTS never
    duplicates or explodes order rows, and the lineitem side carries
    only (l_orderkey, l_shipdate) after pruning. Shuffles once on the
    key; the groupBy on priority is a 5-row hash agg."""
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00")))
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & \
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30 (TPC-H Q21 shape): suppliers who kept orders waiting — the
    multi-EXISTS query (EXISTS another-supplier lineitem, NOT EXISTS
    another-supplier LATE lineitem) over finished orders.

    Plan shape: the late-lines frame is computed once; the EXISTS is
    a LEFT SEMI and the NOT EXISTS a LEFT ANTI, both equi-joined on
    the order key with the supplier inequality as a residual
    condition — no row explosion, two key-partitioned shuffles.
    Supplier and nation dims are broadcast."""
    return _q21_core(load_table(spark, "orders", sf_dir),
                     load_table(spark, "lineitem", sf_dir),
                     load_table(spark, "supplier", sf_dir),
                     load_table(spark, "nation", sf_dir))


def _q21_core(orders: DataFrame, li: DataFrame, supp: DataFrame,
              nation: DataFrame) -> DataFrame:
    """Q21 join topology on caller-provided frames — the bucketed
    variant (tests/test_bucketing.py) feeds orderkey-bucketed
    lineitem/orders so the fact join AND both EXISTS self-joins run
    exchange-free on the write-time partitioning."""
    orders = orders.where(
        F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate")
         + F.expr("INTERVAL 45 DAYS")).alias("is_late"))
    late = lines.where(F.col("is_late")).select("l_orderkey", "l_suppkey")

    l1 = late.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_suppkey").alias("sk"))
    other = lines.select(F.col("l_orderkey").alias("ok2"),
                         F.col("l_suppkey").alias("sk2"))
    other_late = late.select(F.col("l_orderkey").alias("ok3"),
                             F.col("l_suppkey").alias("sk3"))
    waiting = (
        l1.join(other, (F.col("ok") == F.col("ok2"))
                & (F.col("sk") != F.col("sk2")), "left_semi")
        .join(other_late, (F.col("ok") == F.col("ok3"))
              & (F.col("sk") != F.col("sk3")), "left_anti")
    )
    supp = supp.select("s_suppkey", "s_name", "s_nationkey")
    nation = nation.where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
    return (
        waiting.join(F.broadcast(supp), waiting.sk == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31 (TPC-H Q13 shape): distribution of customers by order
    count INCLUDING zero-order customers — the outer-join + two-level
    aggregation shape.

    Scale shape: orders pre-aggregate per custkey first (one shuffle
    of the fact, map-side partial), then LEFT join the customer dim on
    the same key; the second agg groups a table no bigger than
    |customers| into a tiny histogram."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    ocnt = (load_table(spark, "orders", sf_dir)
            .where(F.col("o_orderpriority") != "1-URGENT")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n")))
    return (
        cust.join(ocnt, cust.c_custkey == ocnt.o_custkey, "left")
        .select(F.coalesce("n", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32 (TPC-H Q15 shape): supplier(s) with the maximum quarterly
    revenue — the group-wise-max / scalar-subquery shape. The max is
    a 1-row aggregate cross-joined (broadcast) back against the
    per-supplier revenue, so no second scan of the fact; revenue is
    decimal-exact so the equality is bit-stable in both engines."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00")))
    rev = (li.groupBy("l_suppkey")
           .agg(F.sum(_revenue()).alias("_rev")))
    mx = rev.agg(F.max("_rev").alias("_mx"))
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("_rev") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33 (TPC-H Q17 shape): average yearly revenue lost if
    small-quantity orders (below 20% of the part's average quantity)
    were not taken — the correlated scalar-aggregate shape, decorrelated
    into a per-part aggregate joined back to the fact.

    l_quantity values are whole-number doubles, so avg = exact_sum /
    count is bit-identical in both engines and the 0.2*avg threshold
    comparison is stable."""
    part = load_table(spark, "part", sf_dir).where(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")) \
        .select("p_partkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice")
    avgq = (li.groupBy("l_partkey")
            .agg((F.lit(0.2) * F.avg("l_quantity")).alias("threshold"))
            .withColumnRenamed("l_partkey", "a_partkey"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avgq, li.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("threshold"))
        .agg((F.sum(_dec("l_extendedprice")).cast("double") / 7.0)
             .alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_items"))
    )


def q22_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34 (TPC-H Q22 shape): customers with above-average account
    balance and no orders since 2000 (lapsed customers), grouped by
    nation — global scalar subquery (the average) + NOT EXISTS
    anti-join with a pushed-down date filter on the orders side.

    The average is computed as exact decimal sum / count cast to
    double, so the threshold comparison is engine-stable. The anti
    join shuffles on custkey; the 1-row average broadcasts."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal")
    avg_bal = (cust.where(F.col("c_acctbal") > 0.0)
               .agg((F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                     / F.count(F.lit(1))).alias("_avg")))
    orders = (load_table(spark, "orders", sf_dir)
              .where(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00"))
              .select("o_custkey"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
              .alias("totacctbal"))
        .orderBy("c_nationkey")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35 (TPC-H Q2 shape): per part, the cheapest regional supplier
    — the group-wise argmin join. No partsupp table exists in this
    schema, so the part-supplier offer is derived as min lineitem
    price per (part, supplier) pair; the argmin then runs over
    suppliers of one region only (dims broadcast), with a
    deterministic (cost, suppkey) tie-break via min_by on a struct —
    a single shuffle on the part key, no window over the whole fact."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice")
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, "region", sf_dir).where(
        F.col("r_name") == "ASIA")
    regional = (supp.join(F.broadcast(nation),
                          supp.s_nationkey == nation.n_nationkey)
                .join(F.broadcast(region),
                      nation.n_regionkey == region.r_regionkey))
    offers = (li.join(F.broadcast(regional.select("s_suppkey")),
                      li.l_suppkey == F.col("s_suppkey"))
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.min("l_extendedprice").alias("cost")))
    best = (offers.groupBy("l_partkey")
            .agg(F.min(F.struct("cost", "l_suppkey")).alias("b"))
            .select("l_partkey", F.col("b.cost").alias("cost"),
                    F.col("b.l_suppkey").alias("best_suppkey")))
    return (
        best.join(F.broadcast(regional), F.col("best_suppkey") == F.col("s_suppkey"))
        .select("s_name", "n_name", F.col("l_partkey").alias("p_partkey"), "cost",
                "s_acctbal")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36 (TPC-H Q9 shape): product-type profit by nation and year —
    the widest star join in the suite (lineitem x part x supplier x
    nation x orders). This schema has no partsupp, so unit cost is the
    part's retail price (profit = discounted revenue - retailprice *
    quantity), keeping the shape: a name-filtered part dim broadcast
    into the fact, supplier->nation broadcast, one big-big shuffle
    join with orders on the order key, then a tiny (nation, year)
    hash agg.

    Scale shape: the part filter prunes the fact FIRST (smallest
    intermediate), both dims broadcast, and only (orderkey, amount,
    nationkey) survive into the orders join. All money math is
    decimal-exact; the output cast to double happens after the sum."""
    return _q9_core(load_table(spark, "lineitem", sf_dir),
                    load_table(spark, "orders", sf_dir),
                    load_table(spark, "part", sf_dir),
                    load_table(spark, "supplier", sf_dir),
                    load_table(spark, "nation", sf_dir))


def _q9_core(li: DataFrame, orders: DataFrame, part: DataFrame,
             supp: DataFrame, nation: DataFrame) -> DataFrame:
    """Q9 join topology on caller-provided frames — the bucketed
    variant (tests/test_bucketing.py) feeds orderkey-bucketed
    lineitem/orders so the one big-big join runs exchange-free."""
    part = part.where(
        F.col("p_name").contains("red")).select("p_partkey", "p_retailprice")
    supp = supp.select("s_suppkey", "s_nationkey")
    nation = nation.select("n_nationkey", "n_name")
    orders = orders.select("o_orderkey", "o_orderdate")
    li = li.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    amount = _revenue() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("l_orderkey", "n_name", amount.alias("_amt"))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum("_amt").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37 (TPC-H Q11 shape): parts representing a significant share
    of one nation's inventory value — the HAVING-against-global-scalar
    shape. Inventory value per part is the exact decimal sum of
    extended prices shipped by that nation's suppliers (partsupp
    stand-in); a part qualifies if its value exceeds 0.1% of the
    nation total.

    Scale shape: one shuffle on l_partkey with map-side partial sums;
    the nation's supplier list and the 1-row global total are both
    broadcast. The threshold compare happens in doubles AFTER both
    exact decimal sums, so both engines compare identical IEEE
    values."""
    supp = (load_table(spark, "supplier", sf_dir)
            .join(F.broadcast(load_table(spark, "nation", sf_dir)
                              .where(F.col("n_name") == "NATION_3")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"))
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice")
    value = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
             .groupBy("l_partkey")
             .agg(F.sum(_dec("l_extendedprice")).alias("_v")))
    total = value.agg(F.sum("_v").alias("_t"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("_v").cast("double") > F.col("_t").cast("double") * 0.001)
        .select(F.col("l_partkey").alias("p_partkey"),
                F.col("_v").cast("double").alias("inv_value"))
        .orderBy(F.col("inv_value").desc(), "p_partkey")
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38 (TPC-H Q12 shape): late-shipment counts split by order
    priority — the join + conditional-aggregation (SUM of CASE WHEN)
    shape. No l_shipmode/l_commitdate in this schema: the mode column
    is l_returnflag and "late" is shipped >30 days after the order
    date, within one shipdate year.

    Scale shape: shipdate-year + returnflag predicates push into the
    lineitem scan; one equi-join shuffle on the order key carrying
    only (orderkey, priority); 2-row output hash agg."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = (load_table(spark, "lineitem", sf_dir)
          .where(F.col("l_returnflag").isin("A", "N")
                 & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00")))
          .select("l_orderkey", "l_returnflag", "l_shipdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, (li.l_orderkey == orders.o_orderkey)
                & (li.l_shipdate > orders.o_orderdate
                   + F.expr("INTERVAL 30 DAYS")))
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("l_returnflag")
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39 (TPC-H Q16 shape): how many suppliers can provide each
    (brand, type, size) combination, excluding flagged suppliers —
    the DISTINCT + NOT-IN-exclusion + COUNT(DISTINCT) shape. The
    partsupp stand-in is the distinct (partkey, suppkey) pairs seen
    in lineitem; "customer complaints" is a negative account balance.

    Scale shape: the distinct-pairs shuffle is the only big exchange
    (aggregate pushdown makes it partial); the part filter broadcasts
    into it, the excluded-supplier list is a broadcast anti join, and
    the final count-distinct groups a dimension-sized table."""
    pairs = (load_table(spark, "lineitem", sf_dir)
             .select("l_partkey", "l_suppkey").distinct())
    part = (load_table(spark, "part", sf_dir)
            .where((F.col("p_brand") != "Brand#1")
                   & (F.col("p_type") != "PROMO")
                   & F.col("p_size").isin(1, 3, 5, 9))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    flagged = (load_table(spark, "supplier", sf_dir)
               .where(F.col("s_acctbal") < 0.0).select("s_suppkey"))
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(flagged),
              pairs.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40 (TPC-H Q20 shape): suppliers who dominate shipment volume
    of promotion-candidate parts in target nations — the nested
    semi-join chain (part filter -> per-(supplier,part) volume ->
    share threshold -> IN supplier -> nation filter). No partsupp
    availqty here, so "excess" is shipping more than 30% of a blue
    part's 1996 total.

    Scale shape: the name filter broadcasts into the fact before the
    (suppkey, partkey) agg; the per-part total reuses that agg's
    output (no second fact scan); the supplier lookup is a LEFT SEMI
    on a broadcast excess list; nation broadcast. Quantity sums are
    whole-number doubles, exact in both engines."""
    part = load_table(spark, "part", sf_dir).where(
        F.col("p_name").startswith("blue")).select("p_partkey")
    li = (load_table(spark, "lineitem", sf_dir)
          .where((F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
                 & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00")))
          .select("l_partkey", "l_suppkey", "l_quantity"))
    sq = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").alias("qty")))
    tot = sq.groupBy(F.col("l_partkey").alias("t_partkey")) \
            .agg(F.sum("qty").alias("part_total"))
    excess = (sq.join(tot, sq.l_partkey == F.col("t_partkey"))
              .where(F.col("qty") > F.col("part_total") * 0.3)
              .select("l_suppkey").distinct())
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).where(
        F.col("n_name").isin("NATION_2", "NATION_5", "NATION_11"))
    return (
        supp.join(F.broadcast(excess),
                  supp.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def user_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: audience-overlap estimation via Datasketches theta
    sketches — the MERGEABLE distinct-set algebra that scales where
    COUNT(DISTINCT) does not: each partition builds a bounded-size
    sketch, partial aggregation merges them map-side, and the
    intersection falls out of inclusion-exclusion over three sketch
    estimates (|A∩B| = |A| + |B| - |A∪B|). One pass over the fact,
    one 1-row result, no exact distinct shuffle anywhere.

    Rows-only oracle (estimates); accuracy vs the exact counts is
    pytest-bounded (theta sketches are near-exact below ~16k
    uniques, so the small-SF bound is tight)."""
    ev = load_table(spark, "events", sf_dir)
    is_a = F.col("event_type") == "view"
    is_b = F.col("event_type") == "purchase"
    sk = ev.agg(
        F.theta_sketch_agg(F.when(is_a, F.col("user_id"))).alias("sa"),
        F.theta_sketch_agg(F.when(is_b, F.col("user_id"))).alias("sb"),
        F.theta_sketch_agg(
            F.when(is_a | is_b, F.col("user_id"))).alias("su"))
    est = sk.select(
        F.theta_sketch_estimate("sa").alias("viewers"),
        F.theta_sketch_estimate("sb").alias("purchasers"),
        F.theta_sketch_estimate("su").alias("either"))
    return est.select(
        "viewers", "purchasers", "either",
        (F.col("viewers") + F.col("purchasers") - F.col("either"))
        .alias("overlap"))


def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42: semi-structured JSON processing via Spark 4 VariantType —
    `parse_json` once into a binary variant, then typed path
    extraction (`variant_get`), replacing per-field from_json schemas.
    The variant decode is a scan-side projection (no Python, no
    regexes); the agg is one small shuffle on event_type.

    Scale note: variant parse+get is the engine-native path for
    heterogenous JSON at 100 TB — columnar binary encoding, lazy
    field access, no full-schema materialization per row."""
    ev = load_table(spark, "events", sf_dir)
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("k").cast("bigint")).alias("k_sum"),
             F.min("k").alias("k_min"),
             F.max("k").alias("k_max"))
        .orderBy("event_type")
    )


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B50: revenue by order priority through a SALTED fact-dim join
    (operators/skew.py salted_join) — the join-side counterpart of
    B20 for the regime AQE skew-split doesn't cover: a build side
    too large to broadcast with a hot-key run too long to sort on
    one reducer. The fact side salts deterministically, the orders
    side replicates n_salts ways, and the join runs on
    (o_orderkey, _salt); results are bit-identical to the plain
    join (each lineitem meets its own salt's replica exactly once),
    which is what the oracle certifies."""
    from gcp_data_engineering_workshop_spark.operators.skew import (
        salted_join)

    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("o_orderkey"),
        (F.col("l_extendedprice").cast(_DEC)
         * (1 - F.col("l_discount").cast(_DEC))).alias("_rev"))
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, on="o_orderkey", n_salts=8)
    return (joined.groupBy("o_orderpriority")
            .agg(F.sum("_rev").cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy("o_orderpriority"))
