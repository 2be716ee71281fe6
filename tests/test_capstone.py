"""The capstone artifact: examples/run_training_data_pipeline.py
routed through the E22 transaction log with C86-shaped data cards
committed before/after (VERDICT r9 carried stretch #8). Each landed
stage is parity-asserted against its standalone operator."""

from __future__ import annotations

import importlib.util

from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.plans import textpipeline as tp
from gcp_data_engineering_workshop_spark.sources import txlog as T


def _load_example():
    spec = importlib.util.spec_from_file_location(
        "run_training_data_pipeline",
        "/root/repo/examples/run_training_data_pipeline.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_capstone_lands_through_txlog_with_cards(spark, sf_dir,
                                                 tmp_path):
    ex = _load_example()
    res = ex.main(sf_dir, spark=spark, out=str(tmp_path / "cap"))
    out = res["out"]

    # the corpus table: ONE atomic commit, snapshot-readable
    corpus_root = f"{out}/clean_corpus"
    assert res["versions"]["corpus"] == 1
    landed = T.read(spark, corpus_root)
    assert landed.count() == res["n_docs"] > 0
    assert T.history(corpus_root)[0]["op"] == "append"

    # parity vs the standalone composition: the landed doc set is
    # exactly the intersection the stage operators produce
    landed_ids = {r.doc_id for r in landed.select("doc_id").collect()}
    keep = {r.doc_id for r in
            tp.dedup_keep_best(spark, sf_dir).select("doc_id")
            .collect()}
    decon = {r.doc_id for r in
             tp.decontaminate(spark, sf_dir).select("doc_id")
             .collect()}
    quality = {r.doc_id for r in
               tp.quality_attributes(spark, sf_dir)
               .where(F.col("quality_score") >= 0.5)
               .select("doc_id").collect()}
    assert landed_ids <= keep & decon & quality

    # the cards table: version 1 = raw, version 2 = clean — the
    # auditor's time-travel diff
    cards_root = f"{out}/data_cards"
    assert (res["versions"]["raw_card"],
            res["versions"]["clean_card"]) == (1, 2)
    raw = T.read(spark, cards_root, version=1)
    both = T.read(spark, cards_root, version=2)
    assert {r.stage for r in raw.collect()} == {"raw"}
    assert {r.stage for r in both.collect()} == {"raw", "clean"}

    # raw card parity vs C86 (shared columns; C86 adds the
    # contamination count the card omits by design)
    c86 = {r.source: (r.n_docs, r.n_words_total,
                      r.exact_dup_removable)
           for r in tp.corpus_report_by_source(spark, sf_dir)
           .collect()}
    card = {r.source: (r.n_docs, r.n_words_total,
                       r.exact_dup_removable)
            for r in raw.collect()}
    assert card == c86

    # clean card reconciles with the landed snapshot
    clean = [r for r in both.collect() if r.stage == "clean"]
    assert sum(r.n_docs for r in clean) == res["n_docs"]
    assert all(r.exact_dup_removable == 0 for r in clean)
