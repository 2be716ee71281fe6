"""Tick-message source: the Spark analog of the reference's ingestion.

The reference's ``stock-ingestion-function/main.py`` fetches
(ticker, price, volume) rows, attaches LLM-generated
``ai_sentiment``/``ai_summary`` fields (main.py:104-149), and
publishes JSON messages (main.py:155-173). Its pipeline then decodes
the JSON payload (analysis-dataflow-pipeline/pipeline.py:78).

Here the driver-provided ``events`` table stands in for the feed:
``event_type`` is the instrument key ("ticker"), ``value`` is the
price, and the JSON ``props`` payload carries the volume — so the
JSON-decode step of the reference pipeline is exercised for real.
The LLM call is replaced by a deterministic stub (same output schema:
a sentiment score in [-1, 1] and a categorical summary) so results
are reproducible and oracle-checkable.

Everything here is pure column expressions — JVM-side, no Python row
path — so the scan stays inside whole-stage codegen and the JSON
field extraction is vectorized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Deterministic "AI" stub: a Knuth-style multiplicative mix of the
# event id mapped into [-1, 1]. Chosen to be expressible identically
# in ANSI SQL (bigint multiply + mod + divide) for the DuckDB oracle.
_MIX = 2654435761  # Knuth's multiplicative hash constant


def ai_sentiment_expr(event_id_col: str = "event_id"):
    """Deterministic sentiment score in [-1, 1] (stub for the
    reference's Gemini call, main.py:130-145)."""
    return (
        ((F.col(event_id_col) * F.lit(_MIX)) % F.lit(2001) - F.lit(1000))
        .cast("double") / F.lit(1000.0)
    )


def ai_summary_expr(sentiment_col):
    """Deterministic categorical summary (stub for main.py:160)."""
    return (
        F.when(sentiment_col > 0.3, F.lit("bullish"))
        .when(sentiment_col < -0.3, F.lit("bearish"))
        .otherwise(F.lit("neutral"))
    )


def ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decoded tick stream: one row per event with the message
    shape the reference publishes (main.py:162-169).

    Columns: ticker, ts, price, volume, ai_sentiment, ai_summary.
    """
    from gcp_data_engineering_workshop_spark.catalog import load_table

    ev = load_table(spark, "events", sf_dir)
    sent = ai_sentiment_expr("event_id")
    return ev.select(
        F.col("event_type").alias("ticker"),
        F.col("ts"),
        F.col("value").alias("price"),
        # JSON payload decode (≈ pipeline.py:78 'Decode JSON')
        F.get_json_object("props", "$.k").cast("bigint").alias("volume"),
        sent.alias("ai_sentiment"),
        ai_summary_expr(sent).alias("ai_summary"),
    )


def replay_minute(spark: SparkSession, sf_dir: str, minute_index: int = 7) -> DataFrame:
    """Deterministic replay of one minute of the last day in the feed.

    The reference replays minute ``(now // 60) % total_minutes`` of the
    last trading day (main.py:70-75). Batch analog: rank the distinct
    minutes of the last day and select ``minute_index % count``.
    Returns the publish-shaped message rows for that minute.
    """
    t = ticks(spark, sf_dir)
    last_day = t.select(F.max(F.to_date("ts")).alias("d"))
    day_ticks = t.join(F.broadcast(last_day), F.to_date(t.ts) == F.col("d"), "inner")
    # Rank the day's distinct minutes and pick index % count — fully
    # in-plan (no driver-side count()); the minute list is tiny so the
    # global window/broadcasts are metadata-sized.
    minutes = (
        day_ticks.select(F.date_trunc("minute", "ts").alias("m"))
        .distinct()
        .select(
            F.col("m"),
            (F.row_number().over(Window.orderBy("m")) - 1).alias("idx"),
            F.count(F.lit(1)).over(
                Window.orderBy("m").rowsBetween(Window.unboundedPreceding,
                                                Window.unboundedFollowing)
            ).alias("n"),
        )
    )
    target = minutes.where(F.col("idx") == F.lit(minute_index) % F.col("n")).select("m")
    return (
        day_ticks.join(F.broadcast(target), F.date_trunc("minute", day_ticks.ts) == F.col("m"))
        .select("ticker", "ts", "price", "volume", "ai_sentiment", "ai_summary")
    )


def tick_rate_stream(spark: SparkSession, rows_per_second: int = 100,
                     n_tickers: int = 7):
    """E5 (streaming): synthetic tick generator on the rate source —
    the load-test analog of the reference's scheduled ingestion
    (main.py fetches/replays one minute per invocation; this emits a
    continuous deterministic feed). Message shape matches
    streaming.pipeline.TICK_SCHEMA; the AI fields use the same
    deterministic stub as the batch source."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    sent = ai_sentiment_expr("value")
    return rate.select(
        F.concat(F.lit("T"), (F.col("value") % n_tickers).cast("string")).alias("ticker"),
        F.col("timestamp").alias("ts"),
        F.round((F.pmod(F.col("value") * _MIX, F.lit(10000))).cast("double") / 100.0 + 10.0, 2).alias("price"),
        F.pmod(F.col("value") * 2654435761, F.lit(100)).alias("volume"),
        sent.alias("ai_sentiment"),
        ai_summary_expr(sent).alias("ai_summary"),
    )
