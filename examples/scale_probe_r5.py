"""10x scale probe, round 5 — A-block flagship + the reworked
k-means fit (VERDICT r4 #1 and #10).

Extends the r4 probe methodology (examples/scale_probe_r4.py:
cold noop-write timing, exponent = log(t10/t1)/log(10)) to:

- stock_pipeline_full / enrich_model_batch at 10x tick volume — the
  reference's own shape. Scaled events replicate each row with
  offset event_id/user_id and IDENTICAL timestamps, so the per-
  (ticker, minute) message volume grows 10x, exactly what a
  10x-throughput feed does; the windowed-agg group count stays
  fixed while the rows per group grow.
- kmeans_fit at SemDedup sizing on 10x embeddings (k grows with n;
  the r5 distributed M-step combine means the driver sees exactly
  k*dim rows per round regardless of n_parts) — plus a k=1024 fit
  with driver RSS sampled before/after to show the collect stays
  flat (the r4 driver-combine would have collected
  n_parts*k*dim rows).
- semdedup_pairs with TRAINED centroids at SemDedup sizing (the r4
  probe trained on seed centroids only).

Usage: python examples/scale_probe_r5.py [out_json]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

from gcp_data_engineering_workshop_spark.session import get_spark
from gcp_data_engineering_workshop_spark.plans import stock_pipeline as sp

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_probe_r5"
SCALES = (1, 10)


def build_events_dir(k: int) -> str:
    out = os.path.join(WORK, f"ev{k}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    ev = pq.read_table(os.path.join(BASE, "events.parquet"))
    n = ev.num_rows
    parts = []
    for r in range(k):
        t = ev
        if r:
            t = t.set_column(
                0, "event_id",
                pa.compute.add(t.column("event_id"), r * 100_000_000))
            t = t.set_column(
                2, "user_id",
                pa.compute.add(t.column("user_id"), r * 10_000_000))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(out, "events.parquet"))
    open(os.path.join(out, "_DONE"), "w").close()
    print(f"events x{k}: {n * k} rows", flush=True)
    return out


def build_emb_dir(k: int) -> str:
    """Rotated replicas exactly like the r4 probe (within-replica
    inner products preserved, cross-replica decorrelated)."""
    out = os.path.join(WORK, f"emb{k}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    emb = pq.read_table(os.path.join(BASE, "embeddings.parquet"))
    e = emb.to_pydict()
    vecs = np.array([list(v) for v in e["embedding"]], dtype=np.float64)
    m, dim = vecs.shape
    rng = np.random.default_rng(20260814)
    vid, ev_, lab = [], [], []
    for r in range(k):
        rot = np.eye(dim) if r == 0 else np.linalg.qr(
            rng.standard_normal((dim, dim)))[0]
        rv = (vecs @ rot).astype(np.float32)
        for i in range(m):
            vid.append(e["vec_id"][i] + r * 1_000_000)
            ev_.append(rv[i].tolist())
            lab.append(e["label"][i])
    pq.write_table(
        pa.table({"vec_id": vid, "embedding": ev_, "label": lab},
                 schema=emb.schema),
        os.path.join(out, "embeddings.parquet"))
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def _kmeans_fit_scaled(spark, sf_dir):
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.clustering import (
        kmeans_fit)
    emb = load_table(spark, "embeddings", sf_dir)
    k = max(8, emb.count() // 250)
    asg, _ = kmeans_fit(emb, k=k, n_iter=5)
    return asg


def _semdedup_trained_scaled(spark, sf_dir):
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.clustering import (
        kmeans_fit, semdedup_pairs)
    emb = load_table(spark, "embeddings", sf_dir)
    k = max(8, emb.count() // 250)
    _, cent = kmeans_fit(emb, k=k, n_iter=3)
    return semdedup_pairs(emb, tau=0.4, cent=cent)


EVENT_TARGETS = [
    ("stock_pipeline_full", sp.full_pipeline),
    ("enrich_model_batch", sp.enrich_model_batch),
]
EMB_TARGETS = [
    ("kmeans_fit_semdedup_k", _kmeans_fit_scaled),
    ("semdedup_trained_pairs", _semdedup_trained_scaled),
]

# document-based r5 ops reuse the r4 probe's structure-preserving
# scaled corpora (token-suffixed replicas): span structure and the
# planted doc_id-derived media groups replicate per-replica, so true
# near-dup pair counts grow linearly
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp  # noqa: E402

DOC_TARGETS = [
    ("text_semdedup", tp.text_semdedup),
    # decontamination pair: the replicated corpus grows BOTH sides
    # (training shingles and the doc_id%97 eval slice) 10x, which is
    # exactly the regime where the broadcast-set plan's build side
    # outgrows broadcast and the bloom path's fixed-size bitmap wins
    ("decontaminate", tp.decontaminate),
    ("decontaminate_bloom", tp.decontaminate_bloom),
    ("span_dedup_apply", tp.span_dedup_apply),
    ("quality_classifier", tp.quality_classifier),
    ("image_phash_neardup", tp.image_phash_neardup),
    ("audio_dedup", tp.audio_dedup),
]


def probe(spark, name, fn, dirs, results):
    row = {}
    for k in SCALES:
        cnt = fn(spark, dirs[k]).count()  # warm-up + row count
        spark.catalog.clearCache()
        times = []
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, dirs[k]).write.format("noop") \
                .mode("overwrite").save()
            times.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        row[f"t_x{k}"] = round(min(times), 3)
        row[f"rows_x{k}"] = cnt
    row["exponent"] = round(float(
        np.log(row[f"t_x{SCALES[1]}"] / row[f"t_x{SCALES[0]}"])
        / np.log(SCALES[1] / SCALES[0])), 3)
    results[name] = row
    print(f"## {name}: {row}", flush=True)


def k1024_driver_flatness(spark, emb_dir, results):
    """k=1024 fit on the 10x corpus: driver RSS before/after and the
    combine-frame row count — the r4 driver-side combine would have
    pulled n_parts * k * dim rows; the r5 shuffle combine pulls
    exactly k * dim."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.clustering import (
        kmeans_fit)
    emb = load_table(spark, "embeddings", emb_dir).repartition(32)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    stats: dict = {}
    t0 = time.monotonic()
    _, cent = kmeans_fit(emb, k=1024, n_iter=2, stats=stats)
    dt = time.monotonic() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    results["kmeans_fit_k1024_x10"] = {
        "t": round(dt, 3), "combine_rows": stats["combine_rows"],
        "k_dim": 1024 * cent.shape[1],
        "driver_rss_mb_before": rss0, "driver_rss_mb_after": rss1,
    }
    print(f"## kmeans_fit_k1024_x10: {results['kmeans_fit_k1024_x10']}",
          flush=True)


def main() -> None:
    spark = get_spark("scale-probe-r5",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    ev_dirs = {k: build_events_dir(k) for k in SCALES}
    emb_dirs = {k: build_emb_dir(k) for k in SCALES}
    from scale_probe_r4 import build_scaled_dir
    doc_dirs = {k: build_scaled_dir(k) for k in SCALES}
    results: dict[str, dict] = {}
    only = {s for s in os.environ.get(
        "SPARK_GRAFT_PROBE_ONLY", "").split(",") if s}
    for name, fn, dirs in ([(n, f, ev_dirs) for n, f in EVENT_TARGETS]
                           + [(n, f, emb_dirs) for n, f in EMB_TARGETS]
                           + [(n, f, doc_dirs) for n, f in DOC_TARGETS]):
        if only and name not in only:
            continue
        probe(spark, name, fn, dirs, results)
    if not only or "kmeans_fit_k1024" in only:
        k1024_driver_flatness(spark, emb_dirs[SCALES[1]], results)
    blob = {"base": BASE, "scales": list(SCALES), "results": results}
    print(json.dumps(blob))
    if len(sys.argv) > 1:
        json.dump(blob, open(sys.argv[1], "w"), indent=1)


if __name__ == "__main__":
    main()
