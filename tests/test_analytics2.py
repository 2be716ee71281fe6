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
