from __future__ import annotations

import datetime as dt

import pytest

from gcp_data_engineering_workshop_spark.plans import analytics as an


def test_q1_groups(spark, sf_dir):
    rows = an.q1_pricing_summary(spark, sf_dir).collect()
    assert {(r.l_returnflag, r.l_linestatus) for r in rows} <= {
        ("A", "F"), ("N", "F"), ("N", "O"), ("R", "F"), ("R", "O"), ("A", "O")}
    for r in rows:
        assert r.sum_disc_price <= r.sum_base_price  # discount only reduces
        assert r.sum_charge >= r.sum_disc_price      # tax only adds
        assert r.avg_qty == pytest.approx(r.sum_qty / r.count_order)


def test_q3_is_sorted_topk(spark, sf_dir):
    rows = an.q3_top_revenue(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_topk_per_group(spark, sf_dir):
    rows = an.topk_per_group(spark, sf_dir).collect()
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    for brand, rs in by_brand.items():
        assert len(rs) <= 3
        prices = [x.p_retailprice for x in sorted(rs, key=lambda x: x.rank_in_brand)]
        assert prices == sorted(prices, reverse=True)


def test_sessionize_tiny(spark, sf_dir):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 100), (2, t0 + dt.timedelta(minutes=10), 100),
         (3, t0 + dt.timedelta(minutes=50), 100),   # gap 40min -> new session
         (4, t0, 200)],
        "event_id bigint, ts timestamp, user_id bigint")
    orig = an.load_table
    try:
        an.load_table = lambda s, n, d=None: df if n == "events" else orig(s, n, d)
        out = {r.user_id: r for r in an.sessionize_events(spark, "unused").collect()}
    finally:
        an.load_table = orig
    assert out[100].n_sessions == 2 and out[100].n_events == 3
    assert out[200].n_sessions == 1


def test_funnel_monotone(spark, sf_dir):
    r = an.event_funnel(spark, sf_dir).collect()[0]
    assert r.n_view >= r.n_view_click >= r.n_view_click_purchase >= 0


def test_percentiles_ordered(spark, sf_dir):
    for r in an.quantity_percentiles(spark, sf_dir).collect():
        assert r.p25 <= r.p50 <= r.p75 <= r.p95


def test_cohort_retention_invariants(spark, sf_dir):
    """B52: week-0 retention is exactly 1.0 for every cohort,
    retention never exceeds 1, n_active <= cohort week-0 size, and
    every (user's cohort, offset) cell is backed by real activity."""
    from gcp_data_engineering_workshop_spark.plans.analytics3 import (
        cohort_retention)

    rows = cohort_retention(spark, sf_dir).collect()
    assert rows
    base = {r.cohort_week: r.n_active for r in rows if r.week_offset == 0}
    for r in rows:
        assert r.week_offset >= 0
        assert 0 < r.retention <= 1.0
        assert r.n_active <= base[r.cohort_week]
        if r.week_offset == 0:
            assert r.retention == 1.0


def test_event_transitions_invariants(spark, sf_dir):
    """B53: per-from_type probabilities sum to exactly ~1, counts
    are positive, and total transitions = total events - distinct
    users with >= 1 event."""
    from pyspark.sql import functions as F

    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.plans.analytics3 import (
        event_transitions)

    rows = event_transitions(spark, sf_dir).collect()
    assert rows
    by_from = {}
    for r in rows:
        assert r.n_transitions > 0 and 0 < r.p_next <= 1
        by_from.setdefault(r.from_type, 0.0)
        by_from[r.from_type] += r.p_next
    for s in by_from.values():
        assert abs(s - 1.0) < 1e-4
    ev = load_table(spark, "events", sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users
