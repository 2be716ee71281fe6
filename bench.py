"""Headline benchmark: runs the flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully materialized through the noop sink (no driver
collect overhead — measures the distributed plan, not py4j
transfer). First a warmup pass on the smallest table primes the JVM.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3) and
reports the per-query MEDIAN: this box shows up to 3x single-run
variance under background JVM load, and single-run numbers produced
four phantom >25% "regressions" in round 3 that a quiet re-run
erased. The JSON carries every raw run ("spread") so total
wall-clock spent stays honest.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

BENCH_QUERIES = [
    "stock_pipeline_full",   # A6 flagship: full reference-pipeline analog
    "stock_agg_1m",          # A2 windowed aggregation
    "q1_pricing_summary",    # B1 wide aggregation
    "q3_top_revenue",        # B2 join + top-k
    "q5_region_revenue",     # B3 6-way join
    "sessionize_events",     # B8 window functions
    "dedup_exact",           # C1
    "dedup_minhash_lsh",     # C2 minhash + band join
    "ann_topk",              # C6 broadcast brute-force ANN
    "ann_lsh",               # C7 bucketed ANN
    "text_quality",          # C9 text feature extraction
    "token_count",           # C10
    # r2 additions (no r1 baseline — first measured in BENCH_r02):
    "embedding_neardup_lsh",  # C26 bucketed threshold pairs
    "dedup_corpus",          # C22 end-to-end near-dup removal
    "q21_waiting_suppliers",  # B30 multi-EXISTS
    "bigram_pmi",            # C24 collocation mining
    "q9_product_profit",     # B36 widest star join
    "gopher_repetition",     # C29 repetition quality filter
    # r3 additions (no earlier baseline — first measured in BENCH_r03):
    "rolling_7d_revenue",    # B43 RANGE-frame window over daily agg
    "line_dedup",            # C39 boilerplate removal
    "dedup_incremental",     # C38 batch-vs-corpus dedup
    "ann_pq",                # C40 product-quantization ANN
    "bigram_lm_score",       # C44 LM quality filter
    "value_rank_dist",       # B48 distributed prefix-sum ranks
    # r4 additions (no earlier baseline — first measured in BENCH_r04):
    "enrich_model_batch",    # A16 batched model-call enrichment
    "kmeans_assign",         # C45 map-only E-step
    "semdedup",              # C47 within-cluster near-dup
    "corpus_diff",           # C48 snapshot diff
    # r5 additions (no earlier baseline — first measured in BENCH_r05):
    "span_dedup_apply",      # C52 substring dedup removal
    "semdedup_trained",      # C55 full SemDedup pipeline (fit + CC)
    "image_phash_neardup",   # C54 decode + pHash + banded join
    "kmeans_embeddings",     # C46 full distributed Lloyd's fit
    "quality_classifier",    # C59 distributed logistic regression
    "span_dedup_keep_first",  # C61 keep-one-copy substring dedup
    "semdedup_incremental",  # C60 batch-vs-corpus semantic dedup
    "text_semdedup",         # C65 raw-text capstone (embed+fit+CC)
    "decontaminate_bloom",   # C66 bloom-pruned decontamination
    "zorder_keys",           # B49 Morton code computation
    # r6 additions (no earlier baseline — first measured in BENCH_r06):
    "zorder_pruned_scan",    # B51 footer-pruned z-ordered scan
    "bm25_topk",             # C67 lexical retrieval
    "dsir_select",           # C70 importance-resampling selection
    "perplexity_buckets",    # C71 CCNet tercile partitioning
    "weighted_sample",       # C72 E-S weighted sampling
    "shuffle_corpus",        # C73 global shuffle + sharding
    "winnow_fingerprints",   # C74 MOSS window-min selection
    "longest_dup_span",      # C75 gaps-and-islands dup runs
    "quality_attributes",    # C76 one-pass attributes bundle
    "decontaminate_spans",   # C77 substring-level decontamination
    "dedup_keep_best",       # C78 keep-best near-dup dedup
    "corpus_report",         # C79 data-card composition
    "pagerank_knn",          # C80 fixed-point kNN-graph PageRank
    "kneser_ney_score",      # C81 interpolated KN bigram LM
    "cohort_retention",      # B52 retention matrix
    "event_transitions",     # B53 Markov flow matrix
    "containment_pairs",     # C83 asymmetric containment dedup
    # r9 additions (first measured in BENCH_r09 — the r8 ops that
    # shipped without a bench row, VERDICT r8 Missing #1):
    "dedup_ingest_bloom",    # C85 bounded-state bloom ingest gate
    "dedup_minhash_auto",    # C87 S-curve auto-banded minhash
    "ann_index_topk",        # C88 disk-backed IVF index query
    "corpus_report_by_source",  # C86 per-source data card
    "contamination_report",  # C89 severity report (one-pass r9)
    # r10 additions (first measured in BENCH_r10): the txlog-format
    # oracle keys — each BUILDS its table from orders inside the
    # query, so the number is commit+scan end-to-end, not scan-only
    "txlog_range_scan",      # E22 append x4 + data-skipped read
    "txlog_merge_scan",      # E22 file-granular MERGE + snapshot read
    # r11 additions (like their siblings: table BUILD + DML + read
    # end-to-end, commit-dominated at this SF):
    "txlog_delete_scan",     # E22 MERGE-DELETE + snapshot read
    "txlog_update_scan",     # E22 predicate UPDATE+DELETE + read
    "txlog_partition_scan",  # E22 hive-partitioned append + pruned read
    "txlog_incremental_scan",  # E22 exactly-once incremental refresh
    "txlog_dv_scan",         # E22 deletion-vector DML (all 3 verbs)
    "txlog_cdf_rows",        # E22 row-level CDF reconstruction
    "txlog_replica_scan",    # E22 CDF-driven replication (2 syncs)
    "txlog_rename_scan",     # E22 column mapping + DML + pruning
    "txlog_replace_scan",    # E22 replaceWhere scope reload
    # r12 additions:
    "txlog_backfill_scan",   # E22 sidecar-only bloom back-fill
    "txlog_pushdown_scan",   # E23/E24 native writer + pushed-filter scan
    # r13 addition:
    "txlog_checkpoint_scan",  # E22 columnar-checkpoint resolution + DML
    # r15 additions (first measured in BENCH_r15): the stats_parsed
    # vectorized-prune key (added r14 without a bench row) and the
    # new bounded OR/DNF-pruning key — both table BUILD + pruned
    # read end-to-end like their txlog siblings
    "txlog_stats_prune_scan",  # E22 vectorized stats_parsed prune
    "txlog_or_prune_scan",   # E22 OR/DNF survivor-union prune
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from gcp_data_engineering_workshop_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # warmup: prime JVM/codegen paths
    qs["dash_tickers"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    # ...and the Python worker pool + Arrow serializer (a long-running
    # cluster keeps workers warm; spawning 32 of them is a one-time
    # ~3s cost that would otherwise land on the first pandas-UDF query)
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _ident(s):
        return s

    _ident.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.range(100000).repartition(32).select(
        pandas_udf(_ident, "bigint")("id")) \
        .write.format("noop").mode("overwrite").save()

    runs: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    # interleave rounds (all queries once, then again) rather than
    # back-to-back repeats, so a transient background load burst
    # lands on different queries in different rounds
    for _ in range(N_RUNS):
        for name in BENCH_QUERIES:
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.time() - t0, 3))
            # operators may persist() intermediates; drop them so each
            # query is timed cold and memory doesn't accumulate
            spark.catalog.clearCache()

    timings = {name: round(statistics.median(ts), 3)
               for name, ts in runs.items()}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    compact = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": N_RUNS,
        "agg": "median",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # stdout gets ONLY the compact medians line — the driver's
    # BENCH_r{N}.json capture truncated three rounds running because
    # the full per-run spread made the line huge (VERDICT r8 Missing
    # #2). The spread stays honest in BENCH_LOCAL.json in-repo.
    print(json.dumps(compact))
    # The spread file is UNTRACKED (gitignored) as of r11 — ADVICE
    # r9 #4 / VERDICT r10 What's-missing #5: a tracked spread made
    # every bench run dirty the working tree. It still lands next to
    # the repo for inspection; the round-of-record numbers live in
    # PLANS.md and the driver's BENCH_r{N}.json. Redirect or disable:
    #   SPARK_GRAFT_BENCH_SPREAD=/tmp/spread.json python bench.py
    #   SPARK_GRAFT_BENCH_SPREAD=  (empty)  -> skip writing entirely
    spread_path = os.environ.get(
        "SPARK_GRAFT_BENCH_SPREAD",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"))
    if spread_path:
        with open(spread_path, "w") as fh:
            json.dump({**compact, "spread": runs}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
