"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps
every implemented operator from SURVEY.md §2 to a (spark, sf_dir) ->
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for the correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from gcp_data_engineering_workshop_spark.plans import analytics as _an
from gcp_data_engineering_workshop_spark.plans import analytics2 as _an2
from gcp_data_engineering_workshop_spark.plans import analytics3 as _an3
from gcp_data_engineering_workshop_spark.plans import textpipeline as _tp
from gcp_data_engineering_workshop_spark.plans import stock_pipeline as _sp
from gcp_data_engineering_workshop_spark.plans import tablefmt as _tf
from gcp_data_engineering_workshop_spark.plans import oracles as _orc
from gcp_data_engineering_workshop_spark.sources import (
    ticks as _ticks_fn, replay_minute as _replay_fn,
)


def _armored(fn: Callable) -> Callable:
    """Ship the package source to Spark's Python workers before the
    query runs (once per session): pickled UDF closures and
    registered data sources reference package modules by NAME, so a
    driver whose cwd/sys.path doesn't cover the repo would
    otherwise fail worker-side imports. No-op when already shipped;
    adds nothing to the query's plan."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from gcp_data_engineering_workshop_spark.sources.txlog import \
            _ship_package
        _ship_package(spark)
        return fn(spark, sf_dir)
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full reference-pipeline analog on sf0.001."""
    return _armored(_sp.full_pipeline)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """ORDERING POLICY: the driver records correctness rows for the
    FIRST 50 entries only (tests/test_entry_contract.py asserts the
    boundary position). Entries rotate per round. The r16 window is
    CHANGED-CODE-FIRST (VERDICT r15 Next #3): (0) every key whose
    code path changed in r16 — the JVM-fold revert family (Change
    A), the fused fit-gate-probe consumers (Change B), the staged
    pushdown build / stage-1 survivor cache / map-only DSIR scoring
    (C/D/E), and the CDF insert-batching keys (F); (1) the r15-
    changed keys that never got a driver row (VERDICT r15 What's-
    wrong #4: gopher_repetition, bm25_topk, tfidf_topterms, the
    dv/replica/append_sliced txlog family, the Arrow-fold and CC
    families). Keys rotated out stood exact in their last windowed
    round; the r14-policy oldest-evidence cohort (the dash reshape
    family) yields to changed code this round. Every key keeps its
    oracle regardless of position — selfcheck.py checks all of
    them locally."""
    return {k: _armored(f) for k, f in {
        # -- (0) r16 CHANGED-CODE-FIRST window (VERDICT r15 #3):
        #    every key whose code path changed in r16 leads —
        #    Change A (JVM fold revert), Change B (fused fit
        #    gate probes), Changes C/D/E (staged pushdown build,
        #    stage-1 survivor cache, map-only DSIR scoring),
        #    Change F (CDF insert batching) --
        "weighted_sample": _tp.weighted_sample,
        "shuffle_corpus": _tp.shuffle_corpus,
        "train_test_split": _tp.train_test_split,
        "stratified_split": _tp.stratified_split,
        "sample_corpus": _tp.sample_corpus,
        "temperature_sample": _tp.temperature_sample,
        "pack_sequences": _tp.pack_sequences,
        "assign_ids": _tp.assign_ids,
        "domain_cap": _tp.domain_cap,
        "mixture_schedule": _tp.mixture_schedule,
        "kmeans_embeddings": _tp.kmeans_embeddings,
        "quality_classifier": _tp.quality_classifier,
        "semdedup_trained": _tp.semdedup_trained,
        "semdedup_incremental": _tp.semdedup_incremental,
        "text_semdedup": _tp.text_semdedup,
        "semdedup": _tp.semdedup,
        "semdedup_keep_central": _tp.semdedup_keep_central,
        "txlog_pushdown_scan": _tf.txlog_pushdown_scan,
        "dedup_incremental": _tp.dedup_incremental,
        "dsir_select": _tp.dsir_select,
        "txlog_cdf_rows": _tf.txlog_cdf_rows,
        "txlog_replica_scan": _tf.txlog_replica_scan,
        "txlog_change_feed": _tf.txlog_change_feed,
        "txlog_incremental_scan": _tf.txlog_incremental_scan,
        # -- (1) r15-changed keys that never got a driver row
        #    (VERDICT r15 What's-wrong #4 / Next #3: gopher,
        #    bm25, tfidf, the dv/replica/append_sliced txlog
        #    family, the r15 Arrow-fold/CC families) --
        "gopher_repetition": _tp.gopher_repetition,
        "bm25_topk": _tp.bm25_topk,
        "tfidf_topterms": _tp.tfidf_topterms,
        "txlog_dv_scan": _tf.txlog_dv_scan,
        "txlog_delete_scan": _tf.txlog_delete_scan,
        "txlog_update_scan": _tf.txlog_update_scan,
        "txlog_merge_scan": _tf.txlog_merge_scan,
        "txlog_range_scan": _tf.txlog_range_scan,
        "txlog_replace_scan": _tf.txlog_replace_scan,
        "txlog_backfill_scan": _tf.txlog_backfill_scan,
        "txlog_checkpoint_scan": _tf.txlog_checkpoint_scan,
        "txlog_rename_scan": _tf.txlog_rename_scan,
        "span_dedup_stats": _tp.span_dedup_stats,
        "span_dedup_apply": _tp.span_dedup_apply,
        "span_dedup_keep_first": _tp.span_dedup_keep_first,
        "longest_dup_span": _tp.longest_dup_span,
        "decontaminate_spans": _tp.decontaminate_spans,
        "winnow_fingerprints": _tp.winnow_fingerprints,
        "decontaminate_bloom": _tp.decontaminate_bloom,
        "corpus_report": _tp.corpus_report,
        "contamination_report": _tp.contamination_report,
        "dedup_corpus": _tp.dedup_corpus,
        "dedup_keep_best": _tp.dedup_keep_best,
        "dedup_groups": _tp.dedup_groups,
        "corpus_report_by_source": _tp.corpus_report_by_source,
        "pagerank_knn": _tp.pagerank_knn,
        # ==== WINDOW BOUNDARY (50): pagerank_knn is entry 50;
        #      the driver records rows for nothing below this
        #      line. tests/test_entry_contract.py asserts this
        #      position. ====
        # -- tail: every key keeps its oracle regardless of
        #    position (selfcheck.py checks all of them); keys
        #    rotated out this round stood exact in their last
        #    windowed round --
        "txlog_or_prune_scan": _tf.txlog_or_prune_scan,
        "txlog_stats_prune_scan": _tf.txlog_stats_prune_scan,
        "txlog_partition_scan": _tf.txlog_partition_scan,
        "embed_docs": _tp.embed_docs,
        "perplexity_buckets": _tp.perplexity_buckets,
        "volume_histogram": _sp.volume_histogram,
        "enrich_model_batch": _sp.enrich_model_batch,
        "topk_per_group": _an.topk_per_group,
        "q4_order_priority": _an2.q4_order_priority,
        "q21_waiting_suppliers": _an2.q21_waiting_suppliers,
        "q13_customer_distribution": _an2.q13_customer_distribution,
        "q15_top_supplier": _an2.q15_top_supplier,
        "q17_small_quantity_revenue": _an2.q17_small_quantity_revenue,
        "q22_inactive_rich_customers": _an2.q22_inactive_rich_customers,
        "q2_min_cost_supplier": _an2.q2_min_cost_supplier,
        "q9_product_profit": _an2.q9_product_profit,
        "q11_important_inventory": _an2.q11_important_inventory,
        "props_variant_stats": _an2.props_variant_stats,
        "value_deciles": _an3.value_deciles,
        "value_rank_dist": _an3.value_rank_dist,
        "retention_set_ops": _an3.retention_set_ops,
        "grouping_sets_revenue": _an3.grouping_sets_revenue,
        "scd2_customer_dim": _an3.scd2_customer_dim,
        "event_transitions": _an3.event_transitions,
        "dedup_exact": _tp.dedup_exact,
        "dedup_minhash_lsh": _tp.dedup_minhash_lsh,
        "embedding_neardup": _tp.embedding_neardup,
        "ann_topk": _tp.ann_topk,
        "text_lang_id": _tp.text_lang_id,
        "text_quality": _tp.text_quality,
        "token_count": _tp.token_count,
        "quality_attributes": _tp.quality_attributes,
        "kneser_ney_score": _tp.kneser_ney_score,
        "containment_pairs": _tp.containment_pairs,
        "bigram_pmi": _tp.bigram_pmi,
        "clean_corpus": _tp.clean_corpus,
        "corpus_stats": _tp.corpus_stats,
        "doc_fingerprint": _tp.doc_fingerprint,
        "embedding_neardup_lsh_auto": _tp.embedding_neardup_lsh_auto,
        "heavy_hitters_cms": _tp.heavy_hitters_cms,
        "ngram_jaccard": _tp.ngram_jaccard,
        "ngram_novelty": _tp.ngram_novelty,
        "q16_supplier_part_counts": _an2.q16_supplier_part_counts,
        "q20_excess_suppliers": _an2.q20_excess_suppliers,
        "salted_join_revenue": _an2.salted_join_revenue,
        "text_scrub": _tp.text_scrub,
        "zorder_keys": _an3.zorder_keys,
        "quantity_percentiles": _an.quantity_percentiles,
        "asof_join_purchases": _an2.asof_join_purchases,
        "range_join_errors": _an2.range_join_errors,
        "pivot_daily_events": _an2.pivot_daily_events,
        "cube_revenue": _an2.cube_revenue,
        "salted_agg_volume": _an2.salted_agg_volume,
        "stats_summary": _an2.stats_summary,
        "session_window_stats": _an2.session_window_stats,
        "corr_price_volume": _an2.corr_price_volume,
        "rolling_7d_revenue": _an3.rolling_7d_revenue,
        "zorder_pruned_scan": _an3.zorder_pruned_scan,
        "cohort_retention": _an3.cohort_retention,
        "embedding_neardup_lsh": _tp.embedding_neardup_lsh,
        "knn_label_propagation": _tp.knn_label_propagation,
        "embedding_neardup_blocked": _tp.embedding_neardup_blocked,
        "heavy_hitters_stream_scale": _tp.heavy_hitters_stream_scale,
        "kmeans_assign": _tp.kmeans_assign,
        "txlog_generated_scan": _tf.txlog_generated_scan,
        "dedup_corpus_inplace": _tf.dedup_corpus_inplace,
        "bigram_lm_score": _tp.bigram_lm_score,
        "corpus_diff": _tp.corpus_diff,
        "decontaminate": _tp.decontaminate,
        "dedup_ingest_bloom": _tp.dedup_ingest_bloom,
        "dedup_minhash_auto": _tp.dedup_minhash_auto,
        "doc_chunking": _tp.doc_chunking,
        "line_dedup": _tp.line_dedup,
        "tokenize_ids": _tp.tokenize_ids,
        "vocab_topk": _tp.vocab_topk,
        "ingest_parse_json": _ticks_fn,
        "stock_agg_1m": _sp.agg_1m,
        "stock_sma_5m": _sp.sma_5m,
        "stock_join_metrics": _sp.joined_metrics,
        "stock_volume_spike": _sp.volume_spikes,
        "stock_pipeline_full": _sp.full_pipeline,
        "ingest_replay": lambda spark, sf: _replay_fn(spark, sf, 7),
        "minute_returns": _sp.minute_returns,
        "daily_ohlc": _sp.daily_ohlc,
        "daily_vwap": _sp.daily_vwap,
        "q1_pricing_summary": _an.q1_pricing_summary,
        "q3_top_revenue": _an.q3_top_revenue,
        "q5_region_revenue": _an.q5_region_revenue,
        "count_distinct_users": _an.count_distinct_users,
        "anti_join_inactive": _an.anti_join_inactive,
        "rollup_revenue": _an.rollup_revenue,
        "sessionize_events": _an.sessionize_events,
        "event_funnel": _an.event_funnel,
        "q6_forecast_revenue": _an2.q6_forecast_revenue,
        "q10_returned_items": _an2.q10_returned_items,
        "q14_promo_revenue": _an2.q14_promo_revenue,
        "q18_large_orders": _an2.q18_large_orders,
        "q19_complex_predicates": _an2.q19_complex_predicates,
        "q7_nation_volume": _an2.q7_nation_volume,
        "q8_market_share": _an2.q8_market_share,
        "merge_upsert_orders": _an2.merge_upsert_orders,
        "q12_priority_shipping": _an2.q12_priority_shipping,
        "dash_overview": _sp.dash_overview,
        "dash_tickers": _sp.dash_tickers,
        "dash_detail": _sp.dash_detail,
        "running_volume": _sp.running_volume,
        "dash_overview_wide": _sp.dash_overview_wide,
        "dash_price_sma_long": _sp.dash_price_sma_long,
        "train_bpe_vocab": _tp.train_bpe_vocab,
        "embedding_pca": _tp.embedding_pca,
        "pagerank_knn_ivf": _tp.pagerank_knn_ivf,
        "ann_index_topk": _tp.ann_index_topk,
        "ann_ivfpq": _tp.ann_ivfpq,
        "image_phash": _tp.image_phash,
        "image_phash_neardup": _tp.image_phash_neardup,
        "image_dedup_corpus": _tp.image_dedup_corpus,
        "audio_fingerprint": _tp.audio_fingerprint,
        "audio_dedup": _tp.audio_dedup,
        "multimodal_audio": _tp.multimodal_audio,
        "multimodal_video": _tp.multimodal_video,
        "approx_distinct_sketch": _an2.approx_distinct_sketch,
        "approx_quantile_sketch": _an2.approx_quantile_sketch,
        "dedup_simhash": _tp.dedup_simhash,
        "ann_lsh": _tp.ann_lsh,
        "ann_ivf": _tp.ann_ivf,
        "ann_pq": _tp.ann_pq,
        "multimodal_meta": _tp.multimodal_meta,
        "multimodal_frames": _tp.multimodal_frames,
        "user_overlap_sketch": _an2.user_overlap_sketch,
    }.items()}


def oracle_sql() -> dict[str, str]:
    return {
        "txlog_range_scan": _tf.TXLOG_RANGE_SCAN_SQL,
        "txlog_change_feed": _tf.TXLOG_CHANGE_FEED_SQL,
        "txlog_merge_scan": _tf.TXLOG_MERGE_SCAN_SQL,
        "txlog_dv_scan": _tf.TXLOG_DV_SCAN_SQL,
        "txlog_cdf_rows": _tf.TXLOG_CDF_ROWS_SQL,
        "txlog_replica_scan": _tf.TXLOG_REPLICA_SCAN_SQL,
        "txlog_rename_scan": _tf.TXLOG_RENAME_SCAN_SQL,
        "txlog_backfill_scan": _tf.TXLOG_BACKFILL_SCAN_SQL,
        "txlog_pushdown_scan": _tf.TXLOG_PUSHDOWN_SCAN_SQL,
        "txlog_checkpoint_scan": _tf.TXLOG_CHECKPOINT_SCAN_SQL,
        "txlog_stats_prune_scan": _tf.TXLOG_STATS_PRUNE_SCAN_SQL,
        "txlog_or_prune_scan": _tf.TXLOG_OR_PRUNE_SCAN_SQL,
        "txlog_replace_scan": _tf.TXLOG_REPLACE_SCAN_SQL,
        "txlog_generated_scan": _tf.TXLOG_GENERATED_SCAN_SQL,
        "dedup_corpus_inplace": _orc.DEDUP_CORPUS_SQL,
        "txlog_delete_scan": _tf.TXLOG_DELETE_SCAN_SQL,
        "txlog_update_scan": _tf.TXLOG_UPDATE_SCAN_SQL,
        "txlog_partition_scan": _tf.TXLOG_PARTITION_SCAN_SQL,
        "txlog_incremental_scan": _tf.TXLOG_INCREMENTAL_SCAN_SQL,
        "ingest_parse_json": _orc.INGEST_PARSE_JSON_SQL,
        # the batched-enrichment path computes the same decoded tick
        # message with the deterministic model, so it shares A1's SQL
        "enrich_model_batch": _orc.INGEST_PARSE_JSON_SQL,
        "ingest_replay": _orc.INGEST_REPLAY_SQL,
        "stock_agg_1m": _orc.AGG_1M_SQL,
        "stock_sma_5m": _orc.SMA_5M_SQL,
        "stock_join_metrics": _orc.JOIN_METRICS_SQL,
        "stock_volume_spike": _orc.VOLUME_SPIKE_SQL,
        "stock_pipeline_full": _orc.FULL_PIPELINE_SQL,
        "dash_overview": _orc.DASH_OVERVIEW_SQL,
        "dash_tickers": _orc.DASH_TICKERS_SQL,
        "dash_detail": _orc.DASH_DETAIL_SQL,
        "dash_overview_wide": _orc.DASH_OVERVIEW_WIDE_SQL,
        "dash_price_sma_long": _orc.DASH_PRICE_SMA_LONG_SQL,
        "kmeans_assign": _orc.KMEANS_ASSIGN_SQL,
        # the trained (C46) assignment is exactly SQL-replayable:
        # the fit's 1e-3 centroid rounding makes every unrolled
        # E/M round bit-identical across engines
        "kmeans_embeddings": _orc.KMEANS_ASSIGN_TRAINED_SQL,
        # ...and with the fit replayable, the WHOLE SemDedup pipeline
        # is too: dynamic sqrt(n) seeds, trained pairs, recursive-CTE
        # components, keep-canonical anti-join
        "semdedup_trained": _orc.SEMDEDUP_TRAINED_SQL,
        # the logistic fit replays the same way: 1e-6 weight grid,
        # unrolled gradient-descent CTE rounds
        "quality_classifier": _orc.QUALITY_CLASSIFIER_SQL,
        "semdedup_incremental": _orc.SEMDEDUP_INCREMENTAL_SQL,
        "span_dedup_keep_first": _orc.SPAN_DEDUP_KEEP_FIRST_SQL,
        "ngram_novelty": _orc.NGRAM_NOVELTY_SQL,
        "embed_docs": _orc.EMBED_DOCS_SQL,
        "text_semdedup": _orc.TEXT_SEMDEDUP_SQL,
        "semdedup": _orc.SEMDEDUP_SQL,
        "corpus_diff": _orc.CORPUS_DIFF_SQL,
        "minute_returns": _orc.MINUTE_RETURNS_SQL,
        "running_volume": _orc.RUNNING_VOLUME_SQL,
        "volume_histogram": _orc.VOLUME_HISTOGRAM_SQL,
        "q1_pricing_summary": _orc.Q1_SQL,
        "q3_top_revenue": _orc.Q3_SQL,
        "q5_region_revenue": _orc.Q5_SQL,
        "topk_per_group": _orc.TOPK_PER_GROUP_SQL,
        "count_distinct_users": _orc.COUNT_DISTINCT_USERS_SQL,
        "anti_join_inactive": _orc.ANTI_JOIN_SQL,
        "rollup_revenue": _orc.ROLLUP_REVENUE_SQL,
        "sessionize_events": _orc.SESSIONIZE_SQL,
        "event_funnel": _orc.EVENT_FUNNEL_SQL,
        "quantity_percentiles": _orc.QUANTITY_PERCENTILES_SQL,
        "q6_forecast_revenue": _orc.Q6_SQL,
        "q10_returned_items": _orc.Q10_SQL,
        "q14_promo_revenue": _orc.Q14_SQL,
        "q18_large_orders": _orc.Q18_SQL,
        "asof_join_purchases": _orc.ASOF_JOIN_SQL,
        "range_join_errors": _orc.RANGE_JOIN_SQL,
        "pivot_daily_events": _orc.PIVOT_SQL,
        "cube_revenue": _orc.CUBE_SQL,
        # approx_distinct_sketch: sketch output, rows-only + pytest bound
        # user_overlap_sketch: theta-sketch estimates, rows-only + pytest bound
        "salted_agg_volume": _orc.SALTED_AGG_SQL,
        "stats_summary": _orc.STATS_SUMMARY_SQL,
        "session_window_stats": _orc.SESSION_WINDOW_SQL,
        "q19_complex_predicates": _orc.Q19_SQL,
        "corr_price_volume": _orc.CORR_SQL,
        "q7_nation_volume": _orc.Q7_SQL,
        "q8_market_share": _orc.Q8_SQL,
        "merge_upsert_orders": _orc.MERGE_UPSERT_SQL,
        "rolling_7d_revenue": _orc.ROLLING_7D_SQL,
        "zorder_keys": _orc.ZORDER_KEYS_SQL,
        # B51: layout + footer pruning are plan plumbing; the oracle
        # filters plain lineitem with the identical integer box and
        # certifies no skipped file held a match
        "zorder_pruned_scan": _orc.ZORDER_PRUNED_SCAN_SQL,
        "bm25_topk": _orc.BM25_TOPK_SQL,
        "dsir_select": _orc.DSIR_SELECT_SQL,
        "perplexity_buckets": _orc.PERPLEXITY_BUCKETS_SQL,
        "weighted_sample": _orc.WEIGHTED_SAMPLE_SQL,
        "shuffle_corpus": _orc.SHUFFLE_CORPUS_SQL,
        "winnow_fingerprints": _orc.WINNOW_FINGERPRINTS_SQL,
        "longest_dup_span": _orc.LONGEST_DUP_SPAN_SQL,
        "quality_attributes": _orc.QUALITY_ATTRIBUTES_SQL,
        "decontaminate_spans": _orc.DECONTAMINATE_SPANS_SQL,
        "dedup_keep_best": _orc.DEDUP_KEEP_BEST_SQL,
        "corpus_report": _orc.CORPUS_REPORT_SQL,
        "pagerank_knn": _orc.PAGERANK_KNN_SQL,
        "kneser_ney_score": _orc.KNESER_NEY_SCORE_SQL,
        "cohort_retention": _orc.COHORT_RETENTION_SQL,
        "event_transitions": _orc.EVENT_TRANSITIONS_SQL,
        "semdedup_keep_central": _orc.SEMDEDUP_KEEP_CENTRAL_SQL,
        "containment_pairs": _orc.CONTAINMENT_PAIRS_SQL,
        "salted_join_revenue": _orc.SALTED_JOIN_SQL,
        "value_deciles": _orc.VALUE_DECILES_SQL,
        "retention_set_ops": _orc.RETENTION_SET_OPS_SQL,
        "grouping_sets_revenue": _orc.GROUPING_SETS_SQL,
        "scd2_customer_dim": _orc.SCD2_SQL,
        "dedup_incremental": _orc.DEDUP_INCREMENTAL_SQL,
        # C85 is plan-level different (bloom prune + exact confirm)
        # but result-identical by the one-sided-bloom argument —
        # the plain anti-join SQL certifies the bloom loses nothing
        "dedup_ingest_bloom": _orc.DEDUP_INGEST_BLOOM_SQL,
        "corpus_report_by_source": _orc.CORPUS_REPORT_BY_SOURCE_SQL,
        "contamination_report": _orc.CONTAMINATION_REPORT_SQL,
        # C87 carries C2's oracle: verify restores exactness for ANY
        # banding — the gate certifies the auto choice loses nothing
        "dedup_minhash_auto": _orc.DEDUP_MINHASH_SQL,
        "line_dedup": _orc.LINE_DEDUP_SQL,
        "span_dedup_stats": _orc.SPAN_DEDUP_SQL,
        "span_dedup_apply": _orc.SPAN_DEDUP_APPLY_SQL,
        "tokenize_ids": _orc.TOKENIZE_IDS_SQL,
        "mixture_schedule": _orc.MIXTURE_SCHEDULE_SQL,
        "daily_ohlc": _orc.DAILY_OHLC_SQL,
        "daily_vwap": _orc.DAILY_VWAP_SQL,
        "value_rank_dist": _orc.VALUE_RANK_DIST_SQL,
        "bigram_lm_score": _orc.BIGRAM_LM_SCORE_SQL,
        "dedup_groups": _orc.DEDUP_GROUPS_SQL,
        "doc_chunking": _orc.DOC_CHUNKING_SQL,
        "train_test_split": _orc.TRAIN_TEST_SPLIT_SQL,
        "text_scrub": _orc.TEXT_SCRUB_SQL,
        "vocab_topk": _orc.VOCAB_TOPK_SQL,
        "heavy_hitters_cms": _orc.HEAVY_HITTERS_SQL,
        "temperature_sample": _orc.TEMPERATURE_SAMPLE_SQL,
        "pack_sequences": _orc.PACK_SEQUENCES_SQL,
        "assign_ids": _orc.ASSIGN_IDS_SQL,
        "domain_cap": _orc.DOMAIN_CAP_SQL,
        # same oracle as C31: identical output contract, candidates
        # provably cover the top-k range on this corpus (pytest)
        "heavy_hitters_stream_scale": _orc.HEAVY_HITTERS_SQL,
        "tfidf_topterms": _orc.TFIDF_SQL,
        "clean_corpus": _orc.CLEAN_CORPUS_SQL,
        "dedup_exact": _orc.DEDUP_EXACT_SQL,
        "dedup_minhash_lsh": _orc.DEDUP_MINHASH_SQL,
        "ngram_jaccard": _orc.NGRAM_JACCARD_SQL,
        "embedding_neardup": _orc.EMBEDDING_NEARDUP_SQL,
        # LSH twin carries the SAME oracle as the exact op: per-pair
        # candidate-miss prob ~9e-9 (see operators/similarity.py)
        "embedding_neardup_lsh": _orc.EMBEDDING_NEARDUP_SQL,
        "embedding_neardup_lsh_auto": _orc.EMBEDDING_NEARDUP_SQL,
        # blocked twin is EXACT (triangle-inequality pruning, no
        # probabilistic recall): same oracle by construction
        "embedding_neardup_blocked": _orc.EMBEDDING_NEARDUP_SQL,
        "q4_order_priority": _orc.Q4_SQL,
        "q21_waiting_suppliers": _orc.Q21_SQL,
        "q13_customer_distribution": _orc.Q13_SQL,
        "q15_top_supplier": _orc.Q15_SQL,
        "q17_small_quantity_revenue": _orc.Q17_SQL,
        "q22_inactive_rich_customers": _orc.Q22_SQL,
        "q2_min_cost_supplier": _orc.Q2_SQL,
        "q9_product_profit": _orc.Q9_SQL,
        "q11_important_inventory": _orc.Q11_SQL,
        "q12_priority_shipping": _orc.Q12_SQL,
        "q16_supplier_part_counts": _orc.Q16_SQL,
        "q20_excess_suppliers": _orc.Q20_SQL,
        "props_variant_stats": _orc.PROPS_VARIANT_SQL,
        "gopher_repetition": _orc.GOPHER_REPETITION_SQL,
        "decontaminate": _orc.DECONTAMINATE_SQL,
        # C66 is plan-level different (bloom prune + exact confirm)
        # but result-identical by the one-sided-bloom argument — the
        # SAME SQL is its oracle, which is the point: the oracle
        # certifies the bloom path loses nothing.
        "decontaminate_bloom": _orc.DECONTAMINATE_SQL,
        "dedup_corpus": _orc.DEDUP_CORPUS_SQL,
        "sample_corpus": _orc.SAMPLE_CORPUS_SQL,
        "bigram_pmi": _orc.BIGRAM_PMI_SQL,
        "corpus_stats": _orc.CORPUS_STATS_SQL,
        "knn_label_propagation": _orc.KNN_LABEL_SQL,
        "stratified_split": _orc.STRATIFIED_SPLIT_SQL,
        "ann_topk": _orc.ANN_TOPK_SQL,
        "text_lang_id": _orc.TEXT_LANG_ID_SQL,
        "text_quality": _orc.TEXT_QUALITY_SQL,
        "token_count": _orc.TOKEN_COUNT_SQL,
        "doc_fingerprint": _orc.DOC_FINGERPRINT_SQL,
        # dedup_simhash / ann_lsh / multimodal_meta are
        # hash-function- or stub-dependent: rows-only + pytest parity.
    }
