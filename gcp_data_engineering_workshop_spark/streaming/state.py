"""Custom stateful streaming operator: windowed aggregation + volume-
spike detection fused per ticker.

Streaming twin of the reference's stateful DoFn
(analysis-dataflow-pipeline/pipeline.py:19-41, DetectVolumeSpike):
per ticker, a bag of the last 10 one-minute volumes; a window is a
spike when its volume exceeds 2x the history average (non-empty
history); then the volume is appended and the bag trimmed to 10.

Spark cannot chain ``applyInPandasWithState`` after a streaming
aggregation (update mode + agg is unsupported), so this operator
consumes the RAW tick stream and maintains the open 1-minute window
accumulator in state alongside the volume history — the same fused
topology Beam runs (windows close, then state updates, pipeline.py
lines 86-122). A window is emitted when a later-minute tick for the
ticker arrives; the final open window per ticker stays in state
(honest streaming semantics: it is not final until the stream says
so). The declarative watermark path (pipeline.agg_1m_stream) remains
the bulk-throughput twin; this is the custom-state demonstration.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SPIKE_OUTPUT_SCHEMA = (
    "ticker string, window_start timestamp, window_end timestamp, "
    "latest_price double, high_price_1m double, total_volume_1m bigint, "
    "total_value_1m double, ai_sentiment double, ai_summary string, "
    "avg_volume_10m double, is_volume_spike boolean"
)
# open-window accumulator + spike history
STATE_SCHEMA = (
    "open_minute bigint, latest_ts bigint, latest_price double, "
    "high_price double, total_volume bigint, total_value double, "
    "ai_sentiment double, ai_summary string, history array<bigint>"
)
HISTORY = 10
FACTOR = 2.0


def _close(ticker, st, history):
    """Close the open window: spike decision + history update
    (pipeline.py:27-39)."""
    avg = sum(history) / len(history) if history else 0.0
    vol = st["total_volume"]
    is_spike = bool(vol > avg * FACTOR and avg > 0)
    row = {
        "ticker": ticker,
        "window_start": pd.Timestamp(st["open_minute"] * 60, unit="s"),
        "window_end": pd.Timestamp((st["open_minute"] + 1) * 60, unit="s"),
        "latest_price": st["latest_price"],
        "high_price_1m": st["high_price"],
        "total_volume_1m": vol,
        "total_value_1m": st["total_value"],
        "ai_sentiment": st["ai_sentiment"],
        "ai_summary": st["ai_summary"],
        "avg_volume_10m": avg,
        "is_volume_spike": is_spike,
    }
    history = (history + [vol])[-HISTORY:]
    return row, history


def _detect(key: Tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    ticker = key[0]
    if state.exists:
        (open_minute, latest_ts, latest_price, high_price, total_volume,
         total_value, ai_sentiment, ai_summary, history) = state.get
        history = list(history)
        st = dict(open_minute=open_minute, latest_ts=latest_ts,
                  latest_price=latest_price, high_price=high_price,
                  total_volume=total_volume, total_value=total_value,
                  ai_sentiment=ai_sentiment, ai_summary=ai_summary)
    else:
        st, history = None, []

    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for row in pdf.itertuples():
            ts_us = int(row.ts.value // 1000)
            minute = ts_us // 60_000_000
            if st is None or minute != st["open_minute"]:
                if st is not None:
                    rec, history = _close(ticker, st, history)
                    out.append(rec)
                st = dict(open_minute=minute, latest_ts=ts_us,
                          latest_price=float(row.price),
                          high_price=float(row.price),
                          total_volume=0, total_value=0.0,
                          ai_sentiment=float(row.ai_sentiment),
                          ai_summary=row.ai_summary)
            st["high_price"] = max(st["high_price"], float(row.price))
            st["total_volume"] += int(row.volume)
            st["total_value"] += float(row.price) * int(row.volume)
            if ts_us >= st["latest_ts"]:
                st["latest_ts"] = ts_us
                st["latest_price"] = float(row.price)
                st["ai_sentiment"] = float(row.ai_sentiment)
                st["ai_summary"] = row.ai_summary

    # A group can be invoked with ZERO input rows once a timeout is
    # configured (timeout tick with no new data): st stays None when
    # there was also no prior state, and updating would crash. Guard
    # so switching timeoutConf later cannot break the operator.
    if st is not None:
        state.update((st["open_minute"], st["latest_ts"], st["latest_price"],
                      st["high_price"], st["total_volume"], st["total_value"],
                      st["ai_sentiment"], st["ai_summary"], history))
    cols = [c.split()[0] for c in SPIKE_OUTPUT_SCHEMA.split(", ")]
    yield pd.DataFrame(out, columns=cols)


def stateful_spike_stream(ticks: DataFrame) -> DataFrame:
    """D5: fused windowing + spike detection over a raw tick stream,
    keyed state per ticker (update mode)."""
    return ticks.groupBy("ticker").applyInPandasWithState(
        _detect,
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
