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

    out, st, history = _run_detector(ticker, st, history, pdfs)

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


def _run_detector(ticker, st, history, pdfs):
    """The shared per-key detector scan (D5's _detect body): feed
    sorted tick rows through the open-window accumulator, closing a
    window whenever a later-minute tick arrives. Returns (closed
    rows, open-window state, history) so both state APIs — the
    legacy GroupState tuple and transformWithState's value/list
    states — drive the IDENTICAL semantics."""
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
    return out, st, history


_OPEN_SCHEMA = (
    "open_minute bigint, latest_ts bigint, latest_price double, "
    "high_price double, total_volume bigint, total_value double, "
    "ai_sentiment double, ai_summary string"
)
_ST_KEYS = ("open_minute", "latest_ts", "latest_price", "high_price",
            "total_volume", "total_value", "ai_sentiment", "ai_summary")


class SpikeProcessor:
    """D24: the D5 spike detector on Spark 4.x's transformWithState —
    the successor to applyInPandasWithState (arbitrary named states
    per key instead of one state tuple). The open-window accumulator
    lives in a ValueState, the 10-minute volume history in a
    ListState, and every key registers a processing-time TTL timer
    (default 1h) whose expiry clears both states — the production
    state-eviction path for tickers that stop trading (expiry is
    semantics-safe exactly like any state loss past the history
    horizon: a later tick reopens fresh). Emission semantics and the
    spike rule are bit-identical to D5 (_run_detector is shared);
    the parity test checks this twin against BOTH the batch plan and
    D5's output.

    Defined lazily (class body below) so importing this module never
    requires the transformWithState API; subclassing happens in
    spike_processor()."""


def spike_processor(ttl_ms: int = 3_600_000):
    """Build the StatefulProcessor instance (lazy import — see
    SpikeProcessor docstring)."""
    import pandas as pd  # noqa: F811 (worker-side import)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor)

    cols = [c.split()[0] for c in SPIKE_OUTPUT_SCHEMA.split(", ")]

    class _SpikeTWS(SpikeProcessor, StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._open = handle.getValueState("open_window", _OPEN_SCHEMA)
            self._hist = handle.getListState("volume_history",
                                             "vol bigint")

        def handleInputRows(self, key, rows, timerValues):
            ticker = key[0]
            st = None
            if self._open.exists():
                st = dict(zip(_ST_KEYS, self._open.get()))
            history = ([int(r[0]) for r in self._hist.get()]
                       if self._hist.exists() else [])
            out, st, history = _run_detector(ticker, st, history, rows)
            if st is not None:
                self._open.update(tuple(st[k] for k in _ST_KEYS))
                # put([]) is undefined against the real state server;
                # an empty history means "no rows retained" -> clear
                if history:
                    self._hist.put([(v,) for v in history])
                else:
                    self._hist.clear()
            # one live TTL timer per key: drop the stale one, arm
            # anew (materialize first — deleteTimer() while the
            # paginated listTimers() iterator is open is unsafe on
            # the wire protocol)
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + ttl_ms)
            if out:
                yield pd.DataFrame(out, columns=cols)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            self._open.clear()
            self._hist.clear()
            yield pd.DataFrame([], columns=cols)

        def close(self):
            pass

    return _SpikeTWS()


def stateful_spike_stream_tws(ticks: DataFrame,
                              ttl_ms: int = 3_600_000) -> DataFrame:
    """D24: transformWithStateInPandas twin of D5 (see
    SpikeProcessor)."""
    return ticks.groupBy("ticker").transformWithStateInPandas(
        statefulProcessor=spike_processor(ttl_ms),
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="ProcessingTime",
    )
