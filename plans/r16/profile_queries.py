"""r16 optimization-round instrumentation: per-query job/stage
breakdown at sf0.1. Times each target query through the noop sink
(guide §1.4) and records Spark job count + per-job wall time via a
SparkListener, so 'many sequential small jobs' separates from 'one
slow stage'. Not part of the bench contract — a measurement tool.

Usage: python plans/r16/profile_queries.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry
    from gcp_data_engineering_workshop_spark.session import get_spark

    spark = get_spark("profile_r16")
    sc = spark.sparkContext
    qs = entry.queries()
    targets = sys.argv[1:] or [
        "text_semdedup", "corpus_report", "semdedup_trained",
        "dedup_keep_best", "dedup_corpus", "bm25_topk",
        "dedup_incremental", "dsir_select", "span_dedup_apply",
        "span_dedup_keep_first", "decontaminate_bloom",
        "txlog_replica_scan", "txlog_dv_scan", "txlog_pushdown_scan",
        "txlog_backfill_scan", "txlog_merge_scan", "txlog_cdf_rows",
    ]
    # warmup
    qs["dash_tickers"](spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()

    tracker = sc.statusTracker()
    out = {}
    for name in targets:
        if name not in qs:
            print(f"skip unknown {name}")
            continue
        spark.catalog.clearCache()
        sc.setJobGroup(f"profile_{name}", name)
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()
        dt = time.time() - t0
        jobs = tracker.getJobIdsForGroup(f"profile_{name}")
        out[name] = {"sec": round(dt, 3), "jobs": len(jobs)}
        print(json.dumps({name: out[name]}))
        sc.setJobGroup("idle", "idle")
    print("TOTALS " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
