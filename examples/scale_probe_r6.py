"""100x scale probe, round 6 — heavy document families one decade
further out (VERDICT r5 #8).

The r4/r5 probes top out at 10x sf0.1 (~50k docs), where the
measured exponents (0.11-0.12 for the span family and the capstone)
are dominated by fixed per-job cost, not data. This probe adds a
100x tier (~500k docs, sf1-equivalent) so the fixed cost separates
from the true scaling term: exponents are reported per decade
(1->10 and 10->100) — the second decade is the honest one.

Corpus construction (same contract as the r4 builder): replica r
suffixes every token with ``~r``, so within-replica span/shingle/
embedding structure is IDENTICAL to the base corpus and
cross-replica n-grams are disjoint — true duplicate-span mass,
near-dup pairs, and planted media groups all grow exactly linearly,
never quadratically, keeping output size proportional to input.

Usage: python examples/scale_probe_r6.py [out_json]
  SPARK_GRAFT_PROBE_ONLY=a,b  limit to named targets
  SPARK_GRAFT_PROBE_SCALES=1,10,100  override tiers
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from gcp_data_engineering_workshop_spark.session import get_spark
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_probe_r6"
SCALES = tuple(int(s) for s in os.environ.get(
    "SPARK_GRAFT_PROBE_SCALES", "1,10,100").split(","))


def build_docs_dir(k: int) -> str:
    """documents.parquet at k x sf0.1 with token-suffixed replicas."""
    out = os.path.join(WORK, f"docs{k}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(os.path.join(BASE, "documents.parquet"))
    d = docs.to_pydict()
    n = len(d["doc_id"])
    writer = pq.ParquetWriter(os.path.join(out, "documents.parquet"),
                              docs.schema)
    # stream one replica at a time: the 100x corpus (~150 MB text)
    # never fully materializes in Python memory
    for r in range(k):
        off = r * 10_000_000
        if r == 0:
            texts = d["text"]
        else:
            suf = f"~{r}"
            texts = [" ".join(w + suf for w in t.split(" "))
                     for t in d["text"]]
        writer.write_table(pa.table({
            "doc_id": [d["doc_id"][i] + off for i in range(n)],
            "text": texts,
            "lang": d["lang"],
            "source": d["source"],
            "n_chars": [len(t) for t in texts],
        }, schema=docs.schema))
    writer.close()
    open(os.path.join(out, "_DONE"), "w").close()
    print(f"docs x{k}: {n * k} rows", flush=True)
    return out


TARGETS = [
    ("span_dedup_stats", tp.span_dedup_stats),
    ("span_dedup_apply", tp.span_dedup_apply),
    ("span_dedup_keep_first", tp.span_dedup_keep_first),
    ("dedup_corpus", tp.dedup_corpus),
    ("text_semdedup", tp.text_semdedup),
    ("image_phash_neardup", tp.image_phash_neardup),
    # new r6 ops (replica vocabularies are disjoint, so BM25
    # candidates, DSIR buckets-hits, and eval-span overlap all grow
    # linearly by construction)
    ("dsir_select", tp.dsir_select),
    ("bm25_topk", tp.bm25_topk),
    ("perplexity_buckets", tp.perplexity_buckets),
    ("decontaminate_spans", tp.decontaminate_spans),
    ("dedup_keep_best", tp.dedup_keep_best),
]


def probe(spark, name, fn, dirs, results):
    row = {}
    for k in SCALES:
        cnt = fn(spark, dirs[k]).count()  # warm-up + row count
        spark.catalog.clearCache()
        times = []
        for _ in range(2 if k <= 10 else 1):
            t0 = time.monotonic()
            fn(spark, dirs[k]).write.format("noop") \
                .mode("overwrite").save()
            times.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        row[f"t_x{k}"] = round(min(times), 3)
        row[f"rows_x{k}"] = cnt
    for a, b in zip(SCALES, SCALES[1:]):
        row[f"exp_{a}_{b}"] = round(float(
            np.log(row[f"t_x{b}"] / row[f"t_x{a}"]) / np.log(b / a)), 3)
    results[name] = row
    print(f"## {name}: {row}", flush=True)


def main() -> None:
    spark = get_spark("scale-probe-r6",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {k: build_docs_dir(k) for k in SCALES}
    results: dict[str, dict] = {}
    only = {s for s in os.environ.get(
        "SPARK_GRAFT_PROBE_ONLY", "").split(",") if s}
    for name, fn in TARGETS:
        if only and name not in only:
            continue
        probe(spark, name, fn, dirs, results)
    blob = {"base": BASE, "scales": list(SCALES), "results": results}
    print(json.dumps(blob))
    if len(sys.argv) > 1:
        json.dump(blob, open(sys.argv[1], "w"), indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
