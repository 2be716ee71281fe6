"""Windowed aggregation operators — batch analogs of the reference
pipeline's Beam windowing (analysis-dataflow-pipeline/pipeline.py).

Float discipline: every column that crosses the DuckDB correctness
oracle is either a passthrough of an input double (no arithmetic), or
computed with exact decimal arithmetic and cast to double at the end,
so Spark and the oracle agree bit-for-bit regardless of aggregation
order. This also makes results stable across partitionings/AQE — a
property you want at 100 TB anyway.

Scale notes: tumbling_1m is one shuffle on (ticker, window) with
map-side partial aggregation; the sliding SMA and spike detection run
as window functions partitioned by ticker over the *per-minute* rows
(thousands per ticker), not the raw events — so state per key is tiny
and the second shuffle moves only aggregated data. At 100 TB the raw
events would be bucketed by ticker to make the first shuffle local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# exact money/price arithmetic for oracle-stable sums
_DEC = "decimal(18,4)"


def tumbling_1m(ticks: DataFrame) -> DataFrame:
    """1-minute fixed-window per-ticker aggregation.

    Mirrors pipeline.py:86-97 ('Calculate 1-Min Aggs'): latest price
    (last by event time), window high, total volume, total value
    (sum price*volume), and passthrough of the AI fields from the
    latest event in the window.
    """
    w = F.window("ts", "1 minute")
    return (
        ticks.groupBy(F.col("ticker"), w.alias("win"))
        .agg(
            F.max_by("price", "ts").alias("latest_price"),
            F.max("price").alias("high_price_1m"),
            F.sum("volume").alias("total_volume_1m"),
            F.sum(F.col("price").cast(_DEC) * F.col("volume"))
             .cast("double").alias("total_value_1m"),
            F.max_by("ai_sentiment", "ts").alias("ai_sentiment"),
            F.max_by("ai_summary", "ts").alias("ai_summary"),
            # exact per-minute price sum/count, reused by the sliding SMA
            F.sum(F.col("price").cast(_DEC)).alias("_price_sum"),
            F.count(F.lit(1)).alias("_price_cnt"),
        )
        .select(
            "ticker",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "latest_price", "high_price_1m", "total_volume_1m",
            "total_value_1m", "ai_sentiment", "ai_summary",
            "_price_sum", "_price_cnt",
        )
    )


def with_sma_5m(agg_1m: DataFrame) -> DataFrame:
    """Attach the 5-minute sliding-window SMA, aligned to 1-minute
    windows.

    Mirrors pipeline.py:102-107: Beam computes Mean-per-key over
    SlidingWindows(300, 60) and re-windows into FixedWindows(60), so
    the SMA joined to minute window [m, m+60) is the mean price over
    events in [m-240s, m+60) — the 5-minute window *ending* at this
    window's end. Expressed as a RANGE frame over the per-minute
    sums: sum-of-sums / sum-of-counts equals the event-level mean
    exactly (empty minutes contribute nothing), with one window pass
    instead of a 5x explode of the raw events.
    """
    epoch = F.unix_timestamp("window_start")
    w5 = (
        Window.partitionBy("ticker")
        .orderBy(epoch.cast("long"))
        .rangeBetween(-240, 0)
    )
    return agg_1m.withColumn(
        "sma_5m",
        (F.sum("_price_sum").over(w5).cast("double")
         / F.sum("_price_cnt").over(w5)),
    )


def join_metrics(agg_1m: DataFrame, sma: DataFrame) -> DataFrame:
    """Window-aligned equi-join of the 1-minute aggregates with the
    SMA stream (mirrors pipeline.py:110-119 'Join Metrics' via
    CoGroupByKey; inner — both sides must be present, pipeline.py:112).

    Kept as a real join (not just a projection) because it is the
    reference's operator; both sides share (ticker, window_start)
    partitioning so at scale this is a co-partitioned shuffle join.
    """
    right = sma.select("ticker", "window_start", "sma_5m")
    return agg_1m.join(right, on=["ticker", "window_start"], how="inner")
