"""Guards on the driver contract in __spark_entry__.py: every
registration mistake here silently costs a correctness row, so the
contract shape itself is tested."""

from __future__ import annotations

import importlib.util


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


# keys deliberately registered WITHOUT an oracle (hash-/sketch-/
# stub-dependent; declared rows-only in SURVEY.md §2)
ROWS_ONLY = {
    "approx_distinct_sketch", "approx_quantile_sketch", "dedup_simhash",
    "ann_lsh", "ann_ivf", "ann_pq", "ann_ivfpq", "multimodal_meta",
    "multimodal_frames",
    "user_overlap_sketch", "multimodal_audio", "multimodal_video",
    "image_phash", "image_phash_neardup",
    "image_dedup_corpus", "audio_fingerprint", "audio_dedup",
    # r6: BPE merge application is a list-building fold (no DuckDB
    # lambda); PCA's eigh has no SQL replay — both pytest-paritied
    "train_bpe_vocab", "embedding_pca",
    # r8 (C84): the IVF quantizer's sampled training is not
    # SQL-replayable; pytest proves n_probe==n_lists edge exactness
    # and bounds default-probe recall (tests/test_similarity.py)
    "pagerank_knn_ivf",
    # r8 (C88): same sampled-quantizer argument for the disk index;
    # pytest equates full probe with C6 and proves partition pruning
    "ann_index_topk",
}

# Keys the r14 rotation promises the driver window (VERDICT r13
# next-round #2): the twenty keys at r10 evidence, plus the new
# stats_parsed-prune key and the pruned-scan keys re-evidencing
# this round's vectorized plan path.
R16_WINDOW_PRIORITY = {
    # every r16 changed-code key (VERDICT r15 Next #3)
    "weighted_sample", "shuffle_corpus", "train_test_split",
    "stratified_split", "sample_corpus", "temperature_sample",
    "pack_sequences", "assign_ids", "domain_cap", "mixture_schedule",
    "kmeans_embeddings", "quality_classifier", "semdedup_trained",
    "semdedup_incremental", "text_semdedup", "semdedup",
    "semdedup_keep_central", "txlog_pushdown_scan",
    "dedup_incremental", "dsir_select", "txlog_cdf_rows",
    "txlog_replica_scan", "txlog_change_feed",
    "txlog_incremental_scan",
    # the r15-changed keys VERDICT r15 What's-wrong #4 names
    "gopher_repetition", "bm25_topk", "tfidf_topterms",
    "txlog_dv_scan", "txlog_merge_scan", "txlog_backfill_scan",
}


def test_every_query_is_callable():
    m = _entry_module()
    qs = m.queries()
    assert len(qs) >= 100
    for k, fn in qs.items():
        assert callable(fn), k


def test_oracle_keys_match_queries():
    m = _entry_module()
    qs, orc = m.queries(), m.oracle_sql()
    # no orphan oracle (an oracle whose query key is gone would never
    # be checked and hints at a rename slip)
    assert set(orc) - set(qs) == set()
    # every query either has an oracle or is a declared rows-only op
    missing = set(qs) - set(orc)
    assert missing == ROWS_ONLY, missing ^ ROWS_ONLY


def test_queries_with_oracles_lead_the_driver_window():
    """The driver records rows for the first 50 entries only; a
    rows-only entry inside the window is fine, but the window must
    not be wasted on duplicates."""
    m = _entry_module()
    keys = list(m.queries())
    assert len(keys) == len(set(keys))


def test_driver_window_boundary_position():
    """The r6/r7 rounds lost 6 keys x 2 rounds of driver evidence to
    a comment that claimed the 50-row boundary at the wrong dict
    position (VERDICT r7 What's-wrong #1). Pin the REAL boundary:
    the documented last-in-window key must sit at index 49, and
    every key the r16 rotation promises the window must be inside
    the first 50."""
    m = _entry_module()
    keys = list(m.queries())
    assert keys.index("pagerank_knn") == 49, (
        "the '==== WINDOW BOUNDARY (50)' comment in __spark_entry__ "
        "no longer matches the dict: pagerank_knn is at "
        f"index {keys.index('pagerank_knn')}")
    window = set(keys[:50])
    assert R16_WINDOW_PRIORITY <= window, R16_WINDOW_PRIORITY - window


def test_entry_returns_flagship(spark):
    m = _entry_module()
    df = m.entry(spark)
    assert len(df.columns) >= 5
    assert df.count() > 0
