from __future__ import annotations

import pytest

from gcp_data_engineering_workshop_spark.plans import analytics as an
from gcp_data_engineering_workshop_spark.plans import analytics2 as an2


def test_q6_single_row(spark, sf_dir):
    r = an2.q6_forecast_revenue(spark, sf_dir).collect()
    assert len(r) == 1 and r[0].revenue >= 0


def test_q14_pct_range(spark, sf_dir):
    r = an2.q14_promo_revenue(spark, sf_dir).collect()[0]
    assert 0.0 <= r.promo_revenue_pct <= 100.0


def test_asof_join_semantics(spark, sf_dir):
    rows = an2.asof_join_purchases(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        if r.last_view_ts is not None:
            assert r.last_view_ts < r.purchase_ts


def test_range_join_counts_nonnegative(spark, sf_dir):
    rows = an2.range_join_errors(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.n_errors_5m_before >= 0 for r in rows)


def test_pivot_row_sums(spark, sf_dir):
    from gcp_data_engineering_workshop_spark.catalog import load_table
    total = load_table(spark, "events", sf_dir).count()
    rows = an2.pivot_daily_events(spark, sf_dir).collect()
    assert sum(r.click + r.error + r.purchase + r.signup + r.view
               for r in rows) == total


def test_cube_has_grand_total(spark, sf_dir):
    rows = an2.cube_revenue(spark, sf_dir).collect()
    grand = [r for r in rows
             if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1
    from gcp_data_engineering_workshop_spark.catalog import load_table
    assert grand[0].n_orders == load_table(spark, "orders", sf_dir).count()


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {r.event_type: r.approx_users
              for r in an2.approx_distinct_sketch(spark, sf_dir).collect()}
    exact = {r.event_type: r.distinct_users
             for r in an.count_distinct_users(spark, sf_dir).collect()}
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(3, 0.15 * e), (k, approx[k], e)


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    approx = {r.l_returnflag: r for r in
              an2.approx_quantile_sketch(spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in
             an.quantity_percentiles(spark, sf_dir).collect()}
    for k, e in exact.items():
        a = approx[k]
        for q in ("p25", "p50", "p75", "p95"):
            assert abs(getattr(a, q) - getattr(e, q)) <= 2.5, (k, q)


def test_stats_summary_matches_builtin(spark, sf_dir):
    from pyspark.sql import functions as F
    from gcp_data_engineering_workshop_spark.sources.ticks import ticks
    got = {r.ticker: r for r in an2.stats_summary(spark, sf_dir).collect()}
    want = {r.ticker: r for r in
            ticks(spark, sf_dir).groupBy("ticker")
            .agg(F.avg("price").alias("m"), F.var_samp("price").alias("v"))
            .collect()}
    for k, w in want.items():
        # stats_summary rounds to 6 decimals -> compare at abs 1e-5
        assert got[k].mean_price == pytest.approx(w.m, abs=1e-5)
        assert got[k].var_price == pytest.approx(w.v, abs=1e-4, rel=1e-6)


def test_merge_upsert_semantics(spark):
    from gcp_data_engineering_workshop_spark.operators.merge import merge_upsert
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, val double")
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)],
        "id bigint, name string, val double")
    out = {r.id: r for r in merge_upsert(target, updates, ["id"]).collect()}
    assert len(out) == 4
    assert out[1].val == 10.0            # untouched
    assert out[2].name == "b2" and out[2].val == 99.0  # updated
    assert out[4].name == "d"            # inserted


def test_q13_includes_zero_order_customers(spark, sf_dir):
    """The outer-join shape must keep customers with no (qualifying)
    orders: histogram buckets sum to the customer count."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    rows = an2.q13_customer_distribution(spark, sf_dir).collect()
    assert sum(r.custdist for r in rows) == \
        load_table(spark, "customer", sf_dir).count()


def test_q15_is_groupwise_max(spark, sf_dir):
    rows = an2.q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1  # all tied at max


def test_q2_argmin_unique_per_part(spark, sf_dir):
    rows = an2.q2_min_cost_supplier(spark, sf_dir).collect()
    parts = [r.p_partkey for r in rows]
    assert len(parts) == len(set(parts))  # one best supplier per part
    assert all(r.cost > 0 for r in rows)


def test_q21_waiting_semantics_tiny(spark):
    """Hand-built case: order 10 has suppliers 1 (late) and 2 (on
    time) -> supplier 1 counted; order 20 has both suppliers late ->
    nobody counted (another supplier is also late); order 30 is
    single-supplier -> excluded by the EXISTS."""
    import datetime as dt
    from pyspark.sql import functions as F
    from gcp_data_engineering_workshop_spark.plans import analytics2 as a2

    base = dt.datetime(1995, 1, 1)
    late = base + dt.timedelta(days=90)
    ok = base + dt.timedelta(days=5)
    li = spark.createDataFrame(
        [(10, 1, late), (10, 2, ok),
         (20, 1, late), (20, 2, late),
         (30, 1, late)],
        "l_orderkey bigint, l_suppkey bigint, l_shipdate timestamp")
    orders = spark.createDataFrame(
        [(10, base), (20, base), (30, base)],
        "o_orderkey bigint, o_orderdate timestamp")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate")
         + F.expr("INTERVAL 45 DAYS")).alias("is_late"))
    late_lines = lines.where(F.col("is_late")).select("l_orderkey", "l_suppkey")
    l1 = late_lines.select(F.col("l_orderkey").alias("ok"),
                           F.col("l_suppkey").alias("sk"))
    other = lines.select(F.col("l_orderkey").alias("ok2"),
                         F.col("l_suppkey").alias("sk2"))
    other_late = late_lines.select(F.col("l_orderkey").alias("ok3"),
                                   F.col("l_suppkey").alias("sk3"))
    waiting = (
        l1.join(other, (F.col("ok") == F.col("ok2"))
                & (F.col("sk") != F.col("sk2")), "left_semi")
        .join(other_late, (F.col("ok") == F.col("ok3"))
              & (F.col("sk") != F.col("sk3")), "left_anti"))
    got = {(r.ok, r.sk) for r in waiting.collect()}
    assert got == {(10, 1)}


def test_q9_profit_keys_unique(spark, sf_dir):
    rows = an2.q9_product_profit(spark, sf_dir).collect()
    keys = [(r.nation, r.o_year) for r in rows]
    assert len(keys) == len(set(keys)) and len(rows) > 0
    assert all(1995 <= r.o_year <= 2001 for r in rows)


def test_q11_threshold_and_order(spark, sf_dir):
    rows = an2.q11_important_inventory(spark, sf_dir).collect()
    vals = [r.inv_value for r in rows]
    assert vals == sorted(vals, reverse=True) and len(rows) > 0
    # every retained part must individually clear 0.1% of the sum of
    # ALL parts' values, which is >= the sum of the retained ones
    assert all(v > 0.001 * sum(vals) / 1000 for v in vals)


def test_q12_partition_of_late_lines(spark, sf_dir):
    rows = an2.q12_priority_shipping(spark, sf_dir).collect()
    assert {r.l_returnflag for r in rows} <= {"A", "N"}
    assert all(r.high_line_count >= 0 and r.low_line_count >= 0 for r in rows)
    assert sum(r.high_line_count + r.low_line_count for r in rows) > 0


def test_q16_excludes_flagged_suppliers(spark, sf_dir):
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from pyspark.sql import functions as F
    rows = an2.q16_supplier_part_counts(spark, sf_dir).collect()
    assert all(r.p_size in (1, 3, 5, 9) and r.supplier_cnt > 0 for r in rows)
    n_ok_supp = load_table(spark, "supplier", sf_dir) \
        .where(F.col("s_acctbal") >= 0.0).count()
    assert all(r.supplier_cnt <= n_ok_supp for r in rows)


def test_q20_dominance_semantics_tiny(spark):
    """Supplier 1 ships 80 of part 100's 100 units (dominant);
    suppliers 2/3 split part 200 evenly 50/50 (neither clears 30%+
    strictly... both do at 50% — but supplier 4's 20 of part 100 does
    not). Only suppliers in the target nations survive."""
    import datetime as dt
    from pyspark.sql import functions as F
    from gcp_data_engineering_workshop_spark.plans import analytics2 as a2
    ship = dt.datetime(1996, 6, 1)
    li = spark.createDataFrame(
        [(100, 1, 80.0, ship), (100, 4, 20.0, ship),
         (200, 2, 50.0, ship), (200, 3, 50.0, ship)],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate timestamp")
    part = spark.createDataFrame([(100, "blue bolt"), (200, "blue gear")],
                                 "p_partkey long, p_name string")
    supp = spark.createDataFrame(
        [(1, "S1", 2), (2, "S2", 5), (3, "S3", 0), (4, "S4", 2)],
        "s_suppkey long, s_name string, s_nationkey long")
    nation = spark.createDataFrame(
        [(0, "NATION_0"), (2, "NATION_2"), (5, "NATION_5")],
        "n_nationkey long, n_name string")
    sq = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").alias("qty")))
    tot = sq.groupBy(F.col("l_partkey").alias("t_partkey")) \
            .agg(F.sum("qty").alias("part_total"))
    excess = (sq.join(tot, sq.l_partkey == F.col("t_partkey"))
              .where(F.col("qty") > F.col("part_total") * 0.3)
              .select("l_suppkey").distinct())
    got = sorted(r.s_suppkey for r in
                 supp.join(F.broadcast(excess),
                           supp.s_suppkey == excess.l_suppkey, "left_semi")
                 .join(F.broadcast(nation),
                       supp.s_nationkey == nation.n_nationkey)
                 .select("s_suppkey").collect())
    # dominant: 1 (80%), 2 and 3 (50% each); supplier 3 is in
    # NATION_0 which is not targeted -> filtered by the nation join?
    # NATION_0 IS in this tiny dim, so 3 survives here; 4 (20%) never
    # qualifies.
    assert got == [1, 2, 3]


def test_user_overlap_sketch_bound(spark, sf_dir):
    """Theta estimates vs exact distinct counts; sketches are exact
    below their nominal-entries threshold, so allow 2% headroom."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from pyspark.sql import functions as F
    got = an2.user_overlap_sketch(spark, sf_dir).collect()[0]
    ev = load_table(spark, "events", sf_dir)
    a = {r.user_id for r in ev.where(F.col("event_type") == "view")
         .select("user_id").distinct().collect()}
    b = {r.user_id for r in ev.where(F.col("event_type") == "purchase")
         .select("user_id").distinct().collect()}
    for est, exact in [(got.viewers, len(a)), (got.purchasers, len(b)),
                       (got.either, len(a | b)), (got.overlap, len(a & b))]:
        assert abs(est - exact) <= max(2, 0.02 * exact)


def test_salted_join_equals_plain_and_spreads_hot_key(spark):
    """B50 operator contract on a hand-built skewed dataset: the
    salted join equals the plain join row for row (inner AND left,
    including dim-side duplicate keys and fact-side misses), and the
    physical join condition actually carries the salt key."""
    from pyspark.sql import functions as F
    from gcp_data_engineering_workshop_spark.operators.skew import (
        salted_join)

    # hot key 1 carries 90% of fact rows; key 99 has no dim match
    fact = spark.createDataFrame(
        [(1, i) for i in range(900)]
        + [(k, k * 10) for k in range(2, 92)]
        + [(99, -1)], "k int, v int")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 92)]
        + [(1, "dup")],  # duplicate dim key must fan out identically
        "k int, name string")

    for how in ("inner", "left"):
        got = sorted((r.k, r.v, r.name) for r in
                     salted_join(fact, dim, on="k", n_salts=8,
                                 how=how).collect())
        want = sorted((r.k, r.v, r.name) for r in
                      fact.join(dim, "k", how).collect())
        assert got == want and len(want) > 900

    plan = salted_join(fact, dim, on="k", n_salts=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # the join really runs on (k, _salt)
