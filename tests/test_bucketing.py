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
