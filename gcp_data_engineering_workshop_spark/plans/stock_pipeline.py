"""End-to-end batch analog of the reference streaming pipeline
(analysis-dataflow-pipeline/pipeline.py) plus the dashboard queries
(frontend-app/app.py).

Output schema mirrors the reference's BigQuery row (pipeline.py:54-66
/ 129): ticker, window_timestamp (window END, per FormatOutput's
window.end), latest_price, high_price_1m, total_volume_1m,
total_value_1m, sma_5m, is_volume_spike, ai_sentiment, ai_summary.
``system_latency`` is wall-clock processing-time in the reference and
therefore lives only in the streaming twin (streaming/pipeline.py),
not in the deterministic batch surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources.ticks import ticks
from gcp_data_engineering_workshop_spark.operators.windows import (
    tumbling_1m, with_sma_5m, join_metrics,
)
from gcp_data_engineering_workshop_spark.operators.anomaly import with_volume_spike

_FINAL_COLS = [
    "ticker", "window_timestamp", "latest_price", "high_price_1m",
    "total_volume_1m", "total_value_1m", "sma_5m", "is_volume_spike",
    "ai_sentiment", "ai_summary",
]


def agg_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: 1-minute tumbling aggregation (pipeline.py:86-97)."""
    return (
        tumbling_1m(ticks(spark, sf_dir))
        .select(
            "ticker",
            F.col("window_end").alias("window_timestamp"),
            "latest_price", "high_price_1m",
            "total_volume_1m", "total_value_1m",
        )
    )


def sma_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: 5-min sliding / 1-min aligned SMA (pipeline.py:102-107)."""
    return (
        with_sma_5m(tumbling_1m(ticks(spark, sf_dir)))
        .select("ticker", F.col("window_end").alias("window_timestamp"), "sma_5m")
    )


def joined_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: window-aligned join of 1-min aggs with the SMA stream
    (pipeline.py:110-119)."""
    base = tumbling_1m(ticks(spark, sf_dir))
    j = join_metrics(base, with_sma_5m(base))
    return j.select(
        "ticker", F.col("window_end").alias("window_timestamp"),
        "latest_price", "high_price_1m", "total_volume_1m",
        "total_value_1m", "sma_5m",
    )


def volume_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: volume-spike detection over the last 10 windows
    (pipeline.py:19-41)."""
    return (
        with_volume_spike(tumbling_1m(ticks(spark, sf_dir)))
        .select(
            "ticker", F.col("window_end").alias("window_timestamp"),
            "total_volume_1m", "avg_volume_10m", "is_volume_spike",
        )
    )


def full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (flagship): the whole reference pipeline as ONE declarative
    plan — decode -> 1-min aggs -> sliding SMA -> spike detection ->
    BigQuery-shaped projection.

    The SMA and spike columns are window functions over the per-minute
    aggregates (both partitioned by ticker), so Catalyst computes them
    in a single Window stage after the grouping shuffle — no extra
    join or shuffle vs. the reference's CoGroupByKey topology.
    """
    df = with_volume_spike(with_sma_5m(tumbling_1m(ticks(spark, sf_dir))))
    return df.select(
        "ticker",
        F.col("window_end").alias("window_timestamp"),
        "latest_price", "high_price_1m", "total_volume_1m",
        "total_value_1m", "sma_5m", "is_volume_spike",
        "ai_sentiment", "ai_summary",
    )


# --- Dashboard queries (frontend-app/app.py) ---------------------------

def dash_overview(spark: SparkSession, sf_dir: str, limit: int = 500) -> DataFrame:
    """A7: market-overview query (app.py:28-36): most recent N
    (window_timestamp, ticker, latest_price) rows. Ticker added as a
    tiebreaker so the selected set is deterministic."""
    return (
        full_pipeline(spark, sf_dir)
        .select("window_timestamp", "ticker", "latest_price")
        .orderBy(F.col("window_timestamp").desc(), F.col("ticker"))
        .limit(limit)
    )


def dash_tickers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: distinct tickers (app.py:70)."""
    return full_pipeline(spark, sf_dir).select("ticker").distinct()


def dash_detail(spark: SparkSession, sf_dir: str, ticker: str = "click",
                limit: int = 100) -> DataFrame:
    """A9: per-ticker detail, last N windows (app.py:79-95)."""
    return (
        full_pipeline(spark, sf_dir)
        .where(F.col("ticker") == ticker)
        .select(
            "window_timestamp", "latest_price", "high_price_1m",
            "total_volume_1m", "total_value_1m", "sma_5m",
            "is_volume_spike", "ai_sentiment", "ai_summary",
        )
        .orderBy(F.col("window_timestamp").desc())
        .limit(limit)
    )


def minute_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: per-ticker return between consecutive 1-minute windows
    (lag over the windowed aggregates) — the dashboard's price-change
    metric. Return is computed from passthrough doubles; rounded to
    absorb nothing (division of identical operands is deterministic)."""
    from pyspark.sql.window import Window as W
    base = tumbling_1m(ticks(spark, sf_dir))
    w = W.partitionBy("ticker").orderBy("window_start")
    prev = F.lag("latest_price").over(w)
    return base.select(
        "ticker",
        F.col("window_end").alias("window_timestamp"),
        "latest_price",
        prev.alias("prev_price"),
        F.when(prev.isNotNull() & (prev != 0),
               (F.col("latest_price") - prev) / prev)
         .otherwise(F.lit(None).cast("double")).alias("minute_return"),
    )


def running_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: cumulative traded volume per ticker per day (running
    total over the 1-minute windows) — integer-exact window sum."""
    from pyspark.sql.window import Window as W
    base = tumbling_1m(ticks(spark, sf_dir))
    day = F.to_date("window_start")
    w = (W.partitionBy("ticker", day).orderBy("window_start")
         .rowsBetween(W.unboundedPreceding, 0))
    return base.select(
        "ticker",
        F.col("window_end").alias("window_timestamp"),
        "total_volume_1m",
        F.sum("total_volume_1m").over(w).alias("cum_volume_day"),
    )


def volume_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: histogram of 1-minute volumes per ticker — 10 fixed-width
    buckets over [0, 200) plus an overflow bucket, via pure integer
    arithmetic (identical in the oracle; DuckDB 1.0 lacks
    width_bucket) — the dashboard distribution panel."""
    base = tumbling_1m(ticks(spark, sf_dir))
    bucket = F.least(
        (F.expr("total_volume_1m div 20") + 1).cast("bigint"), F.lit(11).cast("bigint"))
    return (
        base.select("ticker", bucket.alias("bucket"))
        .groupBy("ticker", "bucket")
        .agg(F.count(F.lit(1)).alias("n_windows"))
    )


def daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: per-(ticker, day) OHLC candles — open/close are the
    first/last tick price by event time (min_by/max_by, one
    map-side-combinable aggregation; no window function and no
    second pass), high/low plain min/max, plus day volume.
    The standard market-data rollup the dashboard charts from.

    The arg-extreme ordering is (ts, price), not bare ts: if two
    ticks for one ticker ever share a timestamp, bare min_by/max_by
    would pick an engine-arbitrary tie row and the correctness row
    could flap between runs — the struct key makes the order total
    (oracle mirrors it with first/last(price ORDER BY ts, price))."""
    from gcp_data_engineering_workshop_spark.sources.ticks import ticks

    t = ticks(spark, sf_dir)
    tie_key = F.struct("ts", "price")
    return (
        t.groupBy("ticker", F.to_date("ts").alias("day"))
        .agg(F.min_by("price", tie_key).alias("open"),
             F.max("price").alias("high"),
             F.min("price").alias("low"),
             F.max_by("price", tie_key).alias("close"),
             F.sum("volume").alias("day_volume"),
             F.count(F.lit(1)).alias("n_ticks"))
    )


def daily_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: per-(ticker, day) volume-weighted average price —
    sum(price*volume)/sum(volume) in exact decimal, cast to double
    at the boundary (bit-stable under any partitioning/AQE
    re-plan, like every money aggregate in this engine)."""
    from gcp_data_engineering_workshop_spark.sources.ticks import ticks

    t = ticks(spark, sf_dir)
    pv = F.col("price").cast("decimal(18,4)") * F.col("volume")
    return (
        t.groupBy("ticker", F.to_date("ts").alias("day"))
        .agg((F.sum(pv).cast("double")
              / F.sum("volume").cast("double")).alias("vwap"),
             F.sum("volume").alias("day_volume"))
    )


def enrich_model_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: the reference's batched model-call enrichment stage
    (main.py:104-160) as an engine operator — decoded tick rows flow
    through operators/enrichment.enrich_batched, which chunks them to
    the model batch size, issues one "call" per chunk, json-parses
    the response, and falls back to neutral defaults per failed chunk
    (main.py:152-156 semantics). The in-repo deterministic model
    computes the same sentiment as the AI stub, so this whole
    fallible path — the exact plumbing a real endpoint would use —
    is oracle-checked end-to-end against INGEST_PARSE_JSON_SQL."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.enrichment import (
        deterministic_insight_model, enrich_batched)

    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id",
        F.col("event_type").alias("ticker"),
        F.col("ts"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("bigint").alias("volume"),
    )
    return enrich_batched(
        base, deterministic_insight_model, ["event_id"],
        "ai_sentiment double, ai_summary string",
        defaults={"ai_sentiment": 0.0, "ai_summary": "neutral"},
    ).drop("event_id")


# the feed's instrument universe (events.event_type) — fixed pivot
# value list so the wide chart frame has a STABLE schema (same rule
# as B17's pivot)
_TICKERS = ["click", "error", "purchase", "signup", "view"]


def dash_overview_wide(spark: SparkSession, sf_dir: str,
                       limit: int = 500) -> DataFrame:
    """A17: the overview feed reshaped WIDE — one row per
    window_timestamp, one latest_price column per ticker — the frame
    the dashboard's multi-series price chart plots directly
    (app.py:40-49 feeds Altair one row per (ts, ticker); wide
    per-ticker columns are the equivalent chart feed for
    st.line_chart-style APIs). Pivot over the FIXED ticker list keeps
    the schema stable; the boundary window of the top-N selection may
    be ragged, so missing cells are NULL in both engines."""
    return (
        dash_overview(spark, sf_dir, limit)
        .groupBy("window_timestamp")
        .pivot("ticker", _TICKERS)
        .agg(F.max("latest_price"))
    )


def dash_price_sma_long(spark: SparkSession, sf_dir: str,
                        ticker: str = "click") -> DataFrame:
    """A18: the per-ticker detail melted LONG — (window_timestamp,
    series, value) with series in {price, sma_5m} — the tidy frame
    the layered price+SMA chart encodes by series color
    (app.py:119-131 builds exactly these two layers). stack() is the
    zero-shuffle unpivot: one generate over the already-computed
    pipeline rows."""
    return (
        full_pipeline(spark, sf_dir)
        .where(F.col("ticker") == ticker)
        .selectExpr(
            "window_timestamp",
            "stack(2, 'price', latest_price, 'sma_5m', sma_5m) "
            "AS (series, value)")
    )
