"""10x scale probe for the C-block heavy operators (VERDICT r3 #9).

Measures how the heaviest training-data operators scale when the
corpus grows 10x, on the same local[N] box, and reports per-query
scaling exponents ``log(t_10x / t_1x) / log(10)`` — the evidence
behind the "holds at 100 TB" claims in PLANS.md.  An exponent near
1.0 is linear; the sub-linear side is fixed-overhead amortization;
anything well above 1.0 means super-linear work (all-pairs blowup,
single-task funnel) and fails the probe.

Scaled corpora are derived from the REAL sf0.1 tables with
structure-preserving transforms, so the duplicate/cluster structure
the operators exercise grows linearly instead of quadratically:

- documents: replica r suffixes every token with ``~r`` — Jaccard
  similarity WITHIN a replica is exactly the original corpus's,
  while cross-replica shingle sets are disjoint (no spurious
  cross-replica candidate pairs).
- embeddings: replica r applies one random orthogonal rotation Q_r
  (QR of a seeded gaussian) — inner products within a replica are
  preserved exactly (cosine structure identical), cross-replica
  pairs decorrelate to the random-background level.

Usage:  python examples/scale_probe_r4.py [out_json]
Writes scaled parquet under /tmp/scale_probe_r4/ and prints one
JSON blob with per-target times and exponents.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from gcp_data_engineering_workshop_spark.session import get_spark
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_probe_r4"
SCALES = (1, 10)

def _lsh_tau07(spark, sf_dir):
    # the sparse-regime SCALE PATH: hyperplane-LSH candidates at
    # tau=0.7 — candidate count follows bucket occupancy, not n^2.
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.similarity import (
        embedding_neardup_lsh)
    return embedding_neardup_lsh(
        load_table(spark, "embeddings", sf_dir), tau=0.7)


def _semdedup_scaled(spark, sf_dir):
    # SemDedup's own sizing: k grows with n so E[|cluster|] stays
    # bounded (Abbas et al. use k in the tens of thousands for
    # billions of docs). Fixed k at 10x data would make each cluster
    # 10x bigger and the within-cluster pair work 100x — scaling k
    # keeps the candidate count linear in n.
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.clustering import (
        semdedup_pairs)
    emb = load_table(spark, "embeddings", sf_dir)
    k = max(8, emb.count() // 250)
    return semdedup_pairs(emb, k=k, tau=0.4)


def _blocked_tau07(spark, sf_dir):
    # sparse regime: tau=0.7 keeps only true near-dups, so the OUTPUT
    # is linear in corpus size and the exponent measures pure compute.
    # (At the production tau=0.4 this corpus's pair set is background-
    # dominated — P(dot>=0.4) ~ 5e-4 for random 64-dim unit vectors —
    # so the output itself is Theta(n^2) and no algorithm can scale
    # better than its own result; that variant is reported with an
    # output-normalized exponent instead.)
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.similarity import (
        embedding_neardup_blocked)
    return embedding_neardup_blocked(
        load_table(spark, "embeddings", sf_dir), tau=0.7)


# (name, fn) — each fn is the production plan builder, called
# exactly as bench.py calls it.
TARGETS = [
    ("dedup_corpus", tp.dedup_corpus),
    ("embedding_neardup_blocked", tp.embedding_neardup_blocked),
    ("embedding_neardup_blocked_tau07", _blocked_tau07),
    ("embedding_neardup_lsh_tau07", _lsh_tau07),
    ("ann_pq", tp.ann_pq),
    ("dedup_incremental", tp.dedup_incremental),
    ("line_dedup", tp.line_dedup),
    ("kmeans_assign", tp.kmeans_assign),
    ("kmeans_fit", tp.kmeans_embeddings),
    ("semdedup_scaled_k", _semdedup_scaled),
]


def build_scaled_dir(k: int) -> str:
    """Write documents/embeddings parquet at k x sf0.1 scale."""
    out = os.path.join(WORK, f"x{k}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(os.path.join(BASE, "documents.parquet"))
    d = docs.to_pydict()
    n = len(d["doc_id"])
    cols = {c: [] for c in d}
    for r in range(k):
        off = r * 10_000_000
        for i in range(n):
            cols["doc_id"].append(d["doc_id"][i] + off)
            t = d["text"][i]
            if r == 0:
                cols["text"].append(t)
            else:
                # suffix every token: within-replica Jaccard is
                # unchanged, cross-replica shingles disjoint.
                cols["text"].append(
                    " ".join(w + f"~{r}" for w in t.split(" ")))
            cols["lang"].append(d["lang"][i])
            cols["source"].append(d["source"][i])
            cols["n_chars"].append(len(cols["text"][-1]))
    pq.write_table(pa.table(cols, schema=docs.schema), os.path.join(out, "documents.parquet"))

    emb = pq.read_table(os.path.join(BASE, "embeddings.parquet"))
    e = emb.to_pydict()
    vecs = np.array([list(v) for v in e["embedding"]], dtype=np.float64)
    m, dim = vecs.shape
    rng = np.random.default_rng(20260814)
    vid, ev, lab = [], [], []
    for r in range(k):
        if r == 0:
            rot = np.eye(dim)
        else:
            rot, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        rv = (vecs @ rot).astype(np.float32)
        off = r * 1_000_000
        for i in range(m):
            vid.append(e["vec_id"][i] + off)
            ev.append(rv[i].tolist())
            lab.append(e["label"][i])
    pq.write_table(
        pa.table({"vec_id": vid, "embedding": ev, "label": lab}, schema=emb.schema),
        os.path.join(out, "embeddings.parquet"))
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def build_clustered_dir(k: int) -> str:
    """Planted-cluster embeddings at k x base scale: n_clusters grows
    with k (cluster SIZE stays 5), so the true near-dup pair count is
    LINEAR in n — the regime where a scalable pair op must beat the
    exact baseline. Members sit at ~0.93 cosine to their cluster
    mates; distinct clusters are random directions (near-orthogonal
    in 64-dim)."""
    out = os.path.join(WORK, f"c{k}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(777)
    n_clusters, size, dim, sigma = 400 * k, 5, 64, 0.0433
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[:, None, :] + sigma * rng.standard_normal(
        (n_clusters, size, dim))
    pts = pts.reshape(-1, dim)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pq.write_table(pa.table({
        "vec_id": np.arange(len(pts), dtype=np.int64),
        "embedding": list(pts.astype(np.float32)),
        "label": (np.arange(len(pts)) // size).astype(np.int32),
    }), os.path.join(out, "embeddings.parquet"))
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def _lsh_auto_clustered(spark, sf_dir):
    # adaptive plane count (auto_lsh_params): P ~ log2(n) with the
    # recall paid back in tables — the background-candidate term
    # T*n^2/2^P stays bounded as n grows. tau=0.9, true pairs ~0.93.
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.similarity import (
        embedding_neardup_lsh)
    return embedding_neardup_lsh(
        load_table(spark, "embeddings", sf_dir), tau=0.9,
        auto=True, max_tables=320)


# clustered-corpus targets read from build_clustered_dir dirs
CLUSTERED_TARGETS = [
    ("lsh_auto_tau09_clustered", _lsh_auto_clustered),
]


def main() -> None:
    spark = get_spark("scale-probe-r4")
    dirs = {k: build_scaled_dir(k) for k in SCALES}
    cdirs = {k: build_clustered_dir(k) for k in SCALES}
    results: dict[str, dict] = {}
    only = {s for s in os.environ.get(
        "SPARK_GRAFT_PROBE_ONLY", "").split(",") if s}
    for name, fn, ds in ([(n, f, dirs) for n, f in TARGETS]
                         + [(n, f, cdirs) for n, f in CLUSTERED_TARGETS]):
        if only and name not in only:
            continue
        row: dict[str, float] = {}
        for k in SCALES:
            # rows via count (cheap); TIMING via noop write like
            # bench.py — count() lets Catalyst prune expensive output
            # columns (line_dedup's rebuilt text collapsed to a scan)
            cnt = fn(spark, ds[k]).count()  # + warm-up: JIT, listing
            spark.catalog.clearCache()  # like bench.py: operators may
            times = []                  # persist(); time each run COLD
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, ds[k]).write.format("noop") \
                    .mode("overwrite").save()
                times.append(time.monotonic() - t0)
                spark.catalog.clearCache()
            row[f"t_x{k}"] = round(min(times), 3)
            row[f"rows_x{k}"] = cnt
        ratio = SCALES[1] / SCALES[0]
        row["exponent"] = round(
            float(np.log(row[f"t_x{SCALES[1]}"] / row[f"t_x{SCALES[0]}"])
                  / np.log(ratio)), 3)
        if row[f"rows_x{SCALES[0]}"] and (
                row[f"rows_x{SCALES[1]}"] > ratio * row[f"rows_x{SCALES[0]}"]):
            # output grew super-linearly (pair ops on background-
            # dominated corpora): also report runtime vs OUTPUT growth
            row["exp_vs_rows"] = round(
                float(np.log(row[f"t_x{SCALES[1]}"] / row[f"t_x{SCALES[0]}"])
                      / np.log(row[f"rows_x{SCALES[1]}"]
                               / row[f"rows_x{SCALES[0]}"])), 3)
        results[name] = row
        print(f"## {name}: {row}", flush=True)
    blob = {"base": BASE, "scales": list(SCALES), "results": results}
    print(json.dumps(blob))
    if len(sys.argv) > 1:
        json.dump(blob, open(sys.argv[1], "w"), indent=1)


if __name__ == "__main__":
    main()
