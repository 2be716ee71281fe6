"""Batched external-model enrichment stage (SURVEY.md §2 A16).

The reference's ingestion function enriches tick batches with a live
model call (stock-ingestion-function/main.py:104-160): it prompts the
model once PER BATCH of records, json-parses the response into
per-record insight fields, and — crucially — falls back to neutral
defaults when the call or the parse fails (main.py:152-156), so a
flaky external dependency degrades the enrichment, never the
pipeline. That operator *shape* (batched, fallible, external,
per-batch fallback) is a first-class pattern for any 100-TB pipeline
that calls out to a model/service, so it is generalized here:

- ``enrich_batched`` is an Arrow-batched ``mapInPandas`` stage with a
  pluggable per-batch callable: records stream through Python in
  columnar batches, are re-chunked to the model's batch size, and
  each chunk is one "call". The callable returns the RAW model
  response (a JSON string); parsing + validation happen in the
  operator, and any exception — transport error, malformed JSON,
  wrong record count, missing field — downgrades exactly that chunk
  to the caller-supplied defaults.
- At cluster scale each executor calls the model independently for
  its own partitions; no shuffle is introduced (the stage is a pure
  map), so enrichment rides whatever partitioning the plan already
  has. Batch size bounds both the request payload and the blast
  radius of one failed call.
- ``deterministic_insight_model`` is the in-repo model: it computes
  the same Knuth-mix sentiment as the reference's AI stub, which
  makes the enrichment path oracle-checkable end-to-end (the
  fallible plumbing is identical to what a real endpoint would use;
  only the transport is local).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MIX = 2654435761  # Knuth's multiplicative hash constant (ticks.py)


def deterministic_insight_model(records: list[dict]) -> str:
    """Local stand-in for the reference's model endpoint: returns the
    same JSON-array-of-insights response shape (main.py:130-149),
    computed deterministically so the full enrichment path is
    oracle-checkable. Mirrors ticks.ai_sentiment_expr bit-for-bit."""
    out = []
    for r in records:
        s = ((int(r["event_id"]) * _MIX) % 2001 - 1000) / 1000.0
        label = ("bullish" if s > 0.3
                 else "bearish" if s < -0.3 else "neutral")
        out.append({"ai_sentiment": s, "ai_summary": label})
    return json.dumps(out)


def deterministic_tick_model(records: list[dict]) -> str:
    """Streaming-side deterministic model: keyed on ``volume`` (the
    tick stream doesn't carry event_id), same response shape and
    hash scheme as deterministic_insight_model."""
    out = []
    for r in records:
        s = ((int(r["volume"]) * _MIX) % 2001 - 1000) / 1000.0
        label = ("bullish" if s > 0.3
                 else "bearish" if s < -0.3 else "neutral")
        out.append({"ai_sentiment": s, "ai_summary": label})
    return json.dumps(out)


def enrich_batched(df: DataFrame,
                   model_fn: Callable[[list[dict]], str],
                   request_cols: list[str],
                   enrich_ddl: str,
                   defaults: dict,
                   batch_size: int = 64) -> DataFrame:
    """Append model-derived columns to ``df`` via batched calls.

    ``model_fn`` receives up to ``batch_size`` records (dicts of
    ``request_cols``) and returns the raw response: a JSON array with
    one object per record carrying every field in ``enrich_ddl``
    (a DDL string, e.g. ``"ai_sentiment double, ai_summary string"``).
    Any exception from the call, a non-list/wrong-length parse, or a
    missing field falls back to ``defaults`` for that chunk only —
    the reference's per-batch neutral-default semantics
    (main.py:152-156)."""
    extra = T.StructType.fromDDL(enrich_ddl)
    fields = [f.name for f in extra.fields]
    missing = [f for f in fields if f not in defaults]
    if missing:
        raise ValueError(f"defaults missing for {missing}")
    out_schema = T.StructType(list(df.schema.fields) + list(extra.fields))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            results: dict[str, list] = {f: [] for f in fields}
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                records = chunk[request_cols].to_dict("records")
                try:
                    parsed = json.loads(model_fn(records))
                    if (not isinstance(parsed, list)
                            or len(parsed) != len(records)):
                        raise ValueError("response/record count mismatch")
                    vals = {f: [obj[f] for obj in parsed] for f in fields}
                except Exception:
                    vals = {f: [defaults[f]] * len(records) for f in fields}
                for f in fields:
                    results[f].extend(vals[f])
            out = pdf.copy()
            for f in fields:
                out[f] = results[f]
            yield out

    return df.mapInPandas(batches, schema=out_schema)
