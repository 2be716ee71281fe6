"""Unit + integration tests for the reference-pipeline batch analog.

Unit tests hand-compute expectations on tiny in-memory frames
(mirroring the semantics in analysis-dataflow-pipeline/pipeline.py);
integration tests run on the sf0.001 testdata.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.operators.anomaly import with_volume_spike
from gcp_data_engineering_workshop_spark.operators.windows import (
    tumbling_1m, with_sma_5m, join_metrics,
)
from gcp_data_engineering_workshop_spark.plans import stock_pipeline as sp


def _ticks(spark, rows):
    return spark.createDataFrame(
        rows, "ticker string, ts timestamp, price double, volume bigint, "
              "ai_sentiment double, ai_summary string")


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def at(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_tumbling_1m_semantics(spark):
    df = _ticks(spark, [
        ("A", at(5), 10.0, 2, 0.1, "neutral"),
        ("A", at(50), 12.0, 3, 0.2, "neutral"),   # latest in window 0
        ("A", at(65), 9.0, 1, -0.5, "bearish"),   # window 1
        ("B", at(10), 100.0, 10, 0.9, "bullish"),
    ])
    out = {(r.ticker, r.window_start): r for r in tumbling_1m(df).collect()}
    a0 = out[("A", T0)]
    assert a0.latest_price == 12.0          # last by ts, pipeline.py:90
    assert a0.high_price_1m == 12.0         # max, pipeline.py:91
    assert a0.total_volume_1m == 5          # sum, pipeline.py:92
    assert a0.total_value_1m == pytest.approx(10 * 2 + 12 * 3)  # pipeline.py:93
    assert a0.ai_summary == "neutral"       # from latest event, pipeline.py:95-96
    a1 = out[("A", T0 + dt.timedelta(minutes=1))]
    assert a1.total_volume_1m == 1
    assert out[("B", T0)].latest_price == 100.0


def test_sma_5m_is_trailing_5min_event_mean(spark):
    # Events in minutes 0..5; SMA at minute m covers [m-4, m] minutes.
    rows = [("A", at(60 * m + 1), float(p), 1, 0.0, "n")
            for m, p in enumerate([10, 20, 30, 40, 50, 60])]
    df = _ticks(spark, rows)
    out = {r.window_start: r.sma_5m for r in with_sma_5m(tumbling_1m(df)).collect()}
    assert out[T0] == pytest.approx(10.0)
    assert out[T0 + dt.timedelta(minutes=4)] == pytest.approx((10 + 20 + 30 + 40 + 50) / 5)
    # minute 5: window [1..5] -> mean of 20..60
    assert out[T0 + dt.timedelta(minutes=5)] == pytest.approx((20 + 30 + 40 + 50 + 60) / 5)


def test_sma_weights_events_not_minutes(spark):
    # 3 events in minute 0, 1 event in minute 1: Beam's Mean.PerKey is
    # event-weighted, not an average of per-minute means.
    df = _ticks(spark, [
        ("A", at(1), 10.0, 1, 0.0, "n"),
        ("A", at(2), 20.0, 1, 0.0, "n"),
        ("A", at(3), 30.0, 1, 0.0, "n"),
        ("A", at(61), 100.0, 1, 0.0, "n"),
    ])
    out = {r.window_start: r.sma_5m for r in with_sma_5m(tumbling_1m(df)).collect()}
    assert out[T0 + dt.timedelta(minutes=1)] == pytest.approx((10 + 20 + 30 + 100) / 4)


def test_volume_spike_matches_reference_state_machine(spark):
    # volumes per minute: 10, 10, 50 (spike: 50 > 2*avg(10,10)), then
    # 12 (avg now (10+10+50)/3=23.3; 12 not spike)
    rows = [("A", at(60 * m + 1), 1.0, v, 0.0, "n")
            for m, v in enumerate([10, 10, 50, 12])]
    out = {r.window_start: r for r in
           with_volume_spike(tumbling_1m(_ticks(spark, rows))).collect()}
    assert out[T0].is_volume_spike is False            # empty history
    assert out[T0 + dt.timedelta(minutes=1)].is_volume_spike is False
    assert out[T0 + dt.timedelta(minutes=2)].is_volume_spike is True
    assert out[T0 + dt.timedelta(minutes=3)].is_volume_spike is False
    # history window is 10: minute 12 should not see minute 0 anymore
    rows = [("A", at(60 * m + 1), 1.0, 1000 if m == 0 else 10, 0.0, "n")
            for m in range(12)]
    out = with_volume_spike(tumbling_1m(_ticks(spark, rows))).collect()
    last = max(out, key=lambda r: r.window_start)
    assert last.avg_volume_10m == pytest.approx(10.0)  # 1000 aged out


def test_join_metrics_inner_semantics(spark):
    df = _ticks(spark, [("A", at(1), 10.0, 1, 0.0, "n")])
    base = tumbling_1m(df)
    joined = join_metrics(base, with_sma_5m(base))
    rows = joined.collect()
    assert len(rows) == 1 and rows[0].sma_5m == pytest.approx(10.0)


def test_full_pipeline_integration(spark, sf_dir):
    df = sp.full_pipeline(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"ticker", "window_timestamp", "latest_price", "high_price_1m",
            "total_volume_1m", "total_value_1m", "sma_5m",
            "is_volume_spike", "ai_sentiment", "ai_summary"} == cols
    assert all(-1 <= r.ai_sentiment <= 1 for r in rows)
    assert all(r.ai_summary in ("bullish", "bearish", "neutral") for r in rows)


def test_dash_queries(spark, sf_dir):
    assert sp.dash_overview(spark, sf_dir).count() == 500
    tickers = {r.ticker for r in sp.dash_tickers(spark, sf_dir).collect()}
    assert tickers == {"click", "view", "purchase", "signup", "error"}
    detail = sp.dash_detail(spark, sf_dir).collect()
    assert 0 < len(detail) <= 100


def test_daily_ohlc_invariants(spark, sf_dir):
    from gcp_data_engineering_workshop_spark.plans.stock_pipeline import daily_ohlc

    rows = daily_ohlc(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.low <= r.open <= r.high, r
        assert r.low <= r.close <= r.high, r
        assert r.n_ticks > 0 and r.day_volume >= 0


def test_ohlc_timestamp_ties_break_deterministically(spark):
    """Two ticks sharing (ticker, ts): bare min_by/max_by(price, ts)
    would pick an engine-arbitrary row; the (ts, price) struct key
    makes open = lowest price at the earliest tick and close =
    highest price at the latest tick, on every run and engine."""
    import datetime as dt
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 16, 0, 0)
    df = spark.createDataFrame(
        [("A", t0, 9.0, 1), ("A", t0, 5.0, 1),   # tied opens
         ("A", t1, 7.0, 1), ("A", t1, 11.0, 1)],  # tied closes
        "ticker string, ts timestamp, price double, volume bigint")
    tie_key = F.struct("ts", "price")
    r = (df.groupBy("ticker")
         .agg(F.min_by("price", tie_key).alias("open"),
              F.max_by("price", tie_key).alias("close"))).collect()[0]
    assert (r.open, r.close) == (5.0, 11.0)


def test_daily_vwap_bounded_by_ohlc(spark, sf_dir):
    from gcp_data_engineering_workshop_spark.plans.stock_pipeline import (
        daily_ohlc, daily_vwap)

    ohlc = {(r.ticker, r.day): r for r in daily_ohlc(spark, sf_dir).collect()}
    for r in daily_vwap(spark, sf_dir).collect():
        o = ohlc[(r.ticker, r.day)]
        # volume-weighted mean of per-tick prices lies in [low, high]
        assert o.low - 1e-9 <= r.vwap <= o.high + 1e-9, r
