"""Tests for the batched model-call enrichment stage (A16) — the
reference's fallible external-enrichment pattern (main.py:104-160):
one call per record chunk, JSON-parsed response, per-chunk fallback
to neutral defaults on any failure."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.operators.enrichment import (
    deterministic_insight_model, enrich_batched)


def _base(spark, n=8):
    return (spark.createDataFrame(
        [(i, f"t{i % 2}") for i in range(1, n + 1)],
        "event_id bigint, ticker string")
        .repartition(1).sortWithinPartitions("event_id"))


DDL = "ai_sentiment double, ai_summary string"
DEFAULTS = {"ai_sentiment": 0.0, "ai_summary": "neutral"}


def test_happy_path_enriches_every_row(spark):
    out = enrich_batched(_base(spark), deterministic_insight_model,
                         ["event_id"], DDL, DEFAULTS, batch_size=3)
    rows = {r.event_id: r for r in out.collect()}
    assert len(rows) == 8
    for eid, r in rows.items():
        want = ((eid * 2654435761) % 2001 - 1000) / 1000.0
        assert r.ai_sentiment == want
        assert r.ai_summary in ("bullish", "bearish", "neutral")
        assert r.ticker == f"t{eid % 2}"  # input columns pass through


def test_raising_model_downgrades_only_its_chunk(spark):
    """A model call that throws poisons exactly its own chunk —
    main.py:152-156's per-batch fallback, not a query failure."""

    def flaky(records):
        if any(r["event_id"] == 5 for r in records):
            raise ConnectionError("endpoint down")
        return deterministic_insight_model(records)

    # one partition, sorted: chunks are [1..4] and [5..8]
    out = enrich_batched(_base(spark), flaky, ["event_id"], DDL,
                         DEFAULTS, batch_size=4)
    rows = {r.event_id: r for r in out.collect()}
    for eid in (1, 2, 3, 4):
        assert rows[eid].ai_sentiment != 0.0
    for eid in (5, 6, 7, 8):
        assert rows[eid].ai_sentiment == 0.0
        assert rows[eid].ai_summary == "neutral"


@pytest.mark.parametrize("bad_response", [
    "not json at all",
    json.dumps({"ai_sentiment": 1.0}),          # not a list
    json.dumps([{"ai_sentiment": 1.0}]),        # wrong record count
    json.dumps([{"wrong_field": 1}] * 4),       # missing fields
])
def test_malformed_responses_fall_back(spark, bad_response):
    out = enrich_batched(_base(spark, n=4), lambda recs: bad_response,
                         ["event_id"], DDL, DEFAULTS, batch_size=4)
    rows = out.collect()
    assert len(rows) == 4
    assert all(r.ai_sentiment == 0.0 and r.ai_summary == "neutral"
               for r in rows)


def test_missing_defaults_rejected(spark):
    with pytest.raises(ValueError, match="ai_summary"):
        enrich_batched(_base(spark), deterministic_insight_model,
                       ["event_id"], DDL, {"ai_sentiment": 0.0})


def test_enrichment_stage_adds_no_shuffle(spark, sf_dir):
    """The stage is a pure map: the full query's plan must contain
    the MapInPandas and NO Exchange (enrichment rides the scan's
    partitioning — at 100 TB each executor calls the model for its
    own partitions only)."""
    from gcp_data_engineering_workshop_spark.plans.stock_pipeline import (
        enrich_model_batch)

    df = enrich_model_batch(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Exchange" not in plan
    # and the result equals the pure-column-expression tick source
    from gcp_data_engineering_workshop_spark.sources.ticks import ticks
    want = {(r.ticker, r.ts, r.price, r.volume, r.ai_sentiment,
             r.ai_summary) for r in ticks(spark, sf_dir).collect()}
    got = {(r.ticker, r.ts, r.price, r.volume, r.ai_sentiment,
            r.ai_summary) for r in df.collect()}
    assert got == want
