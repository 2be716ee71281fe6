"""Count-min sketch (C31): CMS guarantees + mergeable-state proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.catalog import load_table
from gcp_data_engineering_workshop_spark.functions import textfns as T
from gcp_data_engineering_workshop_spark.operators import sketch as SK
from gcp_data_engineering_workshop_spark.plans import textpipeline as TP


def _tokens(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    return d.select(F.explode(T.words("text")).alias("token"))


def test_cms_overestimates_and_bounds_error(spark, sf_dir):
    """est >= true for every token (one-sided CMS error), and the
    overshoot respects the eps*N bound (eps = e/w) with huge margin
    at this scale."""
    toks = _tokens(spark, sf_dir)
    exact = {r["token"]: r["cnt"] for r in
             toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
                 .collect()}
    n_total = sum(exact.values())
    grid = SK.cm_build(toks, "token")
    est = {r["token"]: r["est_count"] for r in
           SK.cm_estimate(toks.distinct(), "token", grid).collect()}
    assert set(est) == set(exact)
    eps_n = (2.71828 / SK.CM_WIDTH) * n_total
    for t, true_cnt in exact.items():
        assert est[t] >= true_cnt, t
        assert est[t] - true_cnt <= eps_n, t


def test_cms_merge_is_exact_cellwise_sum(spark, sf_dir):
    """Sketch(shard A) ++ sketch(shard B) == sketch(A union B),
    cell for cell — the mergeable-state property that lets shards /
    micro-batches sketch independently."""
    d = load_table(spark, "documents", sf_dir)
    toks = lambda df: df.select(F.explode(T.words("text")).alias("token"))
    even = SK.cm_build(toks(d.where(F.col("doc_id") % 2 == 0)), "token")
    odd = SK.cm_build(toks(d.where(F.col("doc_id") % 2 == 1)), "token")
    merged = {(r["r"], r["bucket"]): r["cnt"]
              for r in SK.cm_merge(even, odd).collect()}
    full = {(r["r"], r["bucket"]): r["cnt"]
            for r in SK.cm_build(toks(d), "token").collect()}
    assert merged == full


def test_heavy_hitters_contains_true_top_tokens(spark, sf_dir):
    """The estimated top-k is a faithful heavy-hitter report: the
    true top-10 tokens all surface, and their estimates are exact or
    above-true."""
    toks = _tokens(spark, sf_dir)
    true_top = [r["token"] for r in
                toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
                    .orderBy(F.col("cnt").desc(), "token").limit(10)
                    .collect()]
    hh = TP.heavy_hitters_cms(spark, sf_dir, k=50).collect()
    reported = {r["token"] for r in hh}
    assert set(true_top) <= reported
    # deterministic output order: est desc, token asc
    keys = [(-r["est_count"], r["token"]) for r in hh]
    assert keys == sorted(keys)
