from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.catalog import load_table
from gcp_data_engineering_workshop_spark.operators import bucketing as B


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # (warehouse dir is a static conf; managed tables land in
    # ./spark-warehouse, dropped at the end and gitignored)
    orig_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join strategy decision is about
        # partitioning, not size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_quantity", "l_extendedprice")
        orders = load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_totalprice").withColumnRenamed("o_orderkey", "l_orderkey")
        B.write_bucketed(li, "li_b", ("l_orderkey",), n_buckets=8)
        B.write_bucketed(orders, "ord_b", ("l_orderkey",), n_buckets=8)

        joined = B.bucketed_join(spark, "li_b", "ord_b", ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"

        # and it computes the right thing
        want = li.join(orders, "l_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig_thresh)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_ticks_make_first_agg_exchange_free(spark, sf_dir):
    """E7 -> A6: windows.py promises that at scale the raw events
    would be bucketed by ticker so the flagship pipeline's FIRST
    shuffle (the 1-minute groupBy) becomes local. Prove it: write the
    decoded ticks bucketed by ticker, run tumbling_1m on the bucketed
    table, and the plan has zero Exchanges — hash partitioning on
    ticker satisfies the (ticker, window) grouping's clustered
    distribution because ticker is a subset of the grouping keys."""
    from gcp_data_engineering_workshop_spark.operators.windows import tumbling_1m
    from gcp_data_engineering_workshop_spark.sources.ticks import ticks

    t = ticks(spark, sf_dir)
    try:
        B.write_bucketed(t, "ticks_b", ("ticker",), n_buckets=8, sort=False)
        agged = tumbling_1m(spark.table("ticks_b"))
        plan = agged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, \
            f"bucketed ticks still shuffle for the 1m agg:\n{plan[:800]}"
        # same rows as the unbucketed path
        want = tumbling_1m(t).count()
        assert agged.count() == want and want > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS ticks_b")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bucketed_q9_runs_exchange_free_on_orderkey(spark, sf_dir):
    """Q9's only non-broadcast join (lineitem x orders on the order
    key) disappears into write-time bucketing: both facts bucketed by
    their orderkey, the SMJ consumes the scan partitioning and the
    plan has NO exchange on the order key — the remaining exchanges
    are the tiny (nation, year) agg + final sort, which are
    output-sized, not fact-sized."""
    from gcp_data_engineering_workshop_spark.plans import analytics2 as A2

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orig_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test SF the orders side fits a broadcast, which at 100 TB
        # it would not — force the shuffle strategy the assert is about
        # (the explicit F.broadcast dim hints are unaffected)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        B.write_bucketed(li, "li_q9", ("l_orderkey",), n_buckets=8)
        B.write_bucketed(orders, "ord_q9", ("o_orderkey",), n_buckets=8)

        plain = A2._q9_core(li, orders, part, supp, nation)
        bucketed = A2._q9_core(spark.table("li_q9"), spark.table("ord_q9"),
                               part, supp, nation)

        plan_plain = plain._jdf.queryExecution().executedPlan().toString()
        plan_b = bucketed._jdf.queryExecution().executedPlan().toString()
        # the unbucketed plan pays the fact shuffle; the bucketed one
        # must not repartition on either order key
        assert "hashpartitioning(l_orderkey" in plan_plain \
            or "hashpartitioning(o_orderkey" in plan_plain
        assert "hashpartitioning(l_orderkey" not in plan_b
        assert "hashpartitioning(o_orderkey" not in plan_b
        assert _rows(bucketed) == _rows(plain) and plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig_thresh)
        spark.sql("DROP TABLE IF EXISTS li_q9")
        spark.sql("DROP TABLE IF EXISTS ord_q9")


def test_bucketed_q21_self_joins_run_exchange_free(spark, sf_dir):
    """Q21 touches the order key three times: the lineitem x orders
    join, the EXISTS (left-semi) self-join and the NOT EXISTS
    (left-anti) self-join. With both facts bucketed by orderkey the
    scan partitioning carries through the whole chain — the aliased
    semi/anti keys (ok/ok2/ok3) inherit it — so none of the three
    steps shuffles; only the final per-supplier agg does."""
    from gcp_data_engineering_workshop_spark.plans import analytics2 as A2

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orig_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        B.write_bucketed(li, "li_q21", ("l_orderkey",), n_buckets=8)
        B.write_bucketed(orders, "ord_q21", ("o_orderkey",), n_buckets=8)

        plain = A2._q21_core(orders, li, supp, nation)
        bucketed = A2._q21_core(spark.table("ord_q21"),
                                spark.table("li_q21"), supp, nation)

        plan_plain = plain._jdf.queryExecution().executedPlan().toString()
        plan_b = bucketed._jdf.queryExecution().executedPlan().toString()
        assert any(f"hashpartitioning({k}" in plan_plain
                   for k in ("l_orderkey", "o_orderkey", "ok"))
        for k in ("l_orderkey", "o_orderkey", "ok"):
            assert f"hashpartitioning({k}" not in plan_b, k
        assert _rows(bucketed) == _rows(plain) and plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig_thresh)
        spark.sql("DROP TABLE IF EXISTS li_q21")
        spark.sql("DROP TABLE IF EXISTS ord_q21")
