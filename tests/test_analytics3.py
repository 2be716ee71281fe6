from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.catalog import load_table
from gcp_data_engineering_workshop_spark.plans import analytics3 as an3


def test_rolling_7d_covers_trailing_days(spark, sf_dir):
    rows = an3.rolling_7d_revenue(spark, sf_dir).collect()
    assert len(rows) > 0
    # hand-verify one (priority, day): rev_7d equals the sum of the
    # daily revenue over [day-6, day]
    target = rows[len(rows) // 2]
    orders = load_table(spark, "orders", sf_dir)
    lo = target.day - dt.timedelta(days=6)
    expect = (orders
              .where((F.col("o_orderpriority") == target.o_orderpriority)
                     & (F.to_date("o_orderdate") >= F.lit(lo))
                     & (F.to_date("o_orderdate") <= F.lit(target.day)))
              .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                   .cast("double"))
              ).collect()[0][0]
    assert abs(target.rev_7d - expect) < 1e-6


def test_rolling_7d_plan_aggregates_before_window(spark, sf_dir):
    # the RANGE window must consume the reduced daily frame, not the
    # raw fact table: the plan has a partial+final HashAggregate
    # BELOW the Window node
    plan = an3.rolling_7d_revenue(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.index("Window") < plan.index("HashAggregate")


def test_value_deciles_balanced_and_ordered(spark, sf_dir):
    rows = an3.value_deciles(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.decile)
        assert [r.decile for r in rs] == list(range(1, 11)), t
        # NTILE balance: bucket sizes differ by at most 1
        sizes = [r.n_events for r in rs]
        assert max(sizes) - min(sizes) <= 1, t
        # buckets are value-ordered: each decile's hi <= next's lo
        for a, b in zip(rs, rs[1:]):
            assert a.hi <= b.lo, t


def test_retention_segments_partition_the_week_users(spark, sf_dir):
    rows = {r.segment: r.n_users
            for r in an3.retention_set_ops(spark, sf_dir).collect()}
    assert set(rows) == {"retained", "churned", "new"}
    ev = load_table(spark, "events", sf_dir)
    wk1 = ev.where(F.col("ts") < F.lit("2024-01-08 00:00:00")) \
        .select("user_id").distinct().count()
    wkn = ev.where(F.col("ts") >= F.lit("2024-01-24 00:00:00")) \
        .select("user_id").distinct().count()
    assert rows["retained"] + rows["churned"] == wk1
    assert rows["retained"] + rows["new"] == wkn


def test_grouping_sets_lattice_shape(spark, sf_dir):
    rows = an3.grouping_sets_revenue(spark, sf_dir).collect()
    grand = [r for r in rows
             if r.order_year is None and r.o_orderstatus is None]
    assert len(grand) == 1
    n_total = load_table(spark, "orders", sf_dir).count()
    assert grand[0].n_orders == n_total
    # year margins exist, status margins must NOT (not a CUBE)
    year_rows = [r for r in rows
                 if r.order_year is not None and r.o_orderstatus is None]
    assert len(year_rows) > 0
    assert sum(r.n_orders for r in year_rows) == n_total
    status_margin = [r for r in rows
                     if r.order_year is None and r.o_orderstatus is not None]
    assert status_margin == []


def test_scd2_versions_are_consistent(spark, sf_dir):
    rows = an3.scd2_customer_dim(spark, sf_dir).collect()
    n_cust = load_table(spark, "customer", sf_dir).count()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.c_custkey, []).append(r)
    assert len(by_cust) == n_cust
    n_changed = 0
    for k, vs in by_cust.items():
        current = [v for v in vs if v.is_current]
        assert len(current) == 1, k
        assert current[0].valid_to is None, k
        if len(vs) == 2:
            n_changed += 1
            closed = next(v for v in vs if not v.is_current)
            # contiguous effective dating: old closes where new opens
            assert closed.valid_to == current[0].valid_from, k
            assert current[0].segment.startswith("UPGRADED-"), k
        else:
            assert len(vs) == 1, k
    assert n_changed > 0


def test_value_deciles_equal_window_ntile(spark, sf_dir):
    """The distributed closed-form decile must be bit-identical to
    the per-group window NTILE it replaces."""
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    want = {(r.event_type, r.decile): (r.n_events, r.lo, r.hi)
            for r in ev.select("event_type", "value", "event_id")
            .withColumn("decile", F.ntile(10).over(w))
            .groupBy("event_type", "decile")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("value").alias("lo"),
                 F.max("value").alias("hi")).collect()}
    got = {(r.event_type, r.decile): (r.n_events, r.lo, r.hi)
           for r in an3.value_deciles(spark, sf_dir).collect()}
    assert got == want


def test_value_deciles_has_no_per_group_window(spark, sf_dir):
    """Scale guard: the rank must come from range-partitioned slices
    (window keyed by the slice id), never a window whose only
    partition key is the group — 5 groups over 100 TB would funnel
    through 5 tasks."""
    plan = an3.value_deciles(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(event_type" in plan
    assert "windowspecdefinition(_pid" in plan


def test_assign_group_ranks_small_groups(spark):
    """Groups smaller than the bucket count and interleaved key
    ranges still rank densely per group."""
    from gcp_data_engineering_workshop_spark.operators.ids import assign_group_ranks

    df = spark.createDataFrame(
        [("a", v) for v in (5, 1, 3)] + [("b", v) for v in (2, 4)],
        "g string, v bigint")
    out = assign_group_ranks(df, ["g"], ["v"], n_parts=4).collect()
    got = {(r.g, r.v): r.grp_rank for r in out}
    assert got == {("a", 1): 1, ("a", 3): 2, ("a", 5): 3,
                   ("b", 2): 1, ("b", 4): 2}


def test_value_rank_dist_equals_window_functions(spark, sf_dir):
    """The prefix-sum closed forms must equal Spark's own
    percent_rank()/cume_dist() windows row for row."""
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("value")
    want = {(r.event_type, r.value): (r.pct_rank, r.cum_dist)
            for r in ev.select(
                "event_type", "value",
                F.percent_rank().over(w).alias("pct_rank"),
                F.cume_dist().over(w).alias("cum_dist")).collect()}
    got = an3.value_rank_dist(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        wp, wc = want[(r.event_type, r.value)]
        assert r.pct_rank == wp and r.cum_dist == wc, r


def test_group_prefix_sum_matches_running_window(spark):
    from gcp_data_engineering_workshop_spark.operators.ids import group_prefix_sum

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 5), ("a", 3, 1), ("b", 1, 7), ("b", 2, 2)],
        "g string, o bigint, v bigint")
    out = {(r.g, r.o): r.prefix_sum
           for r in group_prefix_sum(df, ["g"], ["o"], "v",
                                     n_parts=3).collect()}
    assert out == {("a", 1): 10, ("a", 2): 15, ("a", 3): 16,
                   ("b", 1): 7, ("b", 2): 9}


def test_group_ranks_and_prefix_sum_keep_null_groups(spark):
    """Window semantics treat NULL as its own partition — the
    distributed replacements must too. A plain equi-join on the
    offset table silently DROPS null-keyed rows; the null-safe join
    keeps them, ranked/summed as one group."""
    from pyspark.sql.window import Window
    from gcp_data_engineering_workshop_spark.operators.ids import (
        assign_group_ranks, group_prefix_sum)

    rows = ([("a", v, v * 2) for v in (5, 1, 3)]
            + [(None, v, v * 10) for v in (2, 4, 6, 8)])
    df = spark.createDataFrame(rows, "g string, v bigint, x bigint")

    ranked = assign_group_ranks(df, ["g"], ["v"], n_parts=4)
    assert ranked.count() == len(rows)  # nothing dropped
    got = {(r.g, r.v): r.grp_rank for r in ranked.collect()}
    w = Window.partitionBy("g").orderBy("v")
    want = {(r.g, r.v): r.rn for r in df.withColumn(
        "rn", F.row_number().over(w)).collect()}
    assert got == want

    summed = group_prefix_sum(df, ["g"], ["v"], "x", n_parts=4)
    assert summed.count() == len(rows)
    gots = {(r.g, r.v): r.prefix_sum for r in summed.collect()}
    ws = w.rowsBetween(Window.unboundedPreceding, 0)
    wants = {(r.g, r.v): r.ps for r in df.withColumn(
        "ps", F.sum("x").over(ws)).collect()}
    assert gots == wants


def test_group_ranks_all_null_group_column(spark):
    """An entirely-NULL group column (inference-hostile offset
    table) still ranks as one global group."""
    from gcp_data_engineering_workshop_spark.operators.ids import assign_group_ranks

    df = spark.createDataFrame(
        [(None, v) for v in (30, 10, 20)], "g string, v bigint")
    got = {r.v: r.grp_rank
           for r in assign_group_ranks(df, ["g"], ["v"], n_parts=2).collect()}
    assert got == {10: 1, 20: 2, 30: 3}
