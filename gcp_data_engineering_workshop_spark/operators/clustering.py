"""Distributed k-means over embedding columns + SemDedup
(SURVEY.md §2 C45-C47).

The reference repo has no clustering stage; these are the
training-data-pipeline ops a 100 TB corpus needs for semantic
curation (SemDedup, Abbas et al. 2023, arXiv:2303.09540: cluster the
embedding space, then deduplicate WITHIN clusters only, so the pair
search never goes all-pairs).

Scale posture:
- The E-step (assignment) is a map-only Arrow-batched pass — the
  k x dim centroid matrix rides the task closure; zero shuffle,
  linear in corpus size.
- The M-step aggregates per-partition partial (sum, count) vectors:
  each task emits at most k rows regardless of its input size, and
  the driver combines O(n_parts * k) tiny rows — the MLlib
  treeAggregate shape. No iteration ever shuffles the corpus.
- SemDedup's pair search joins on cluster_id, so candidate pairs
  are sum(|cluster|^2) instead of n^2; production sizing keeps
  |cluster| bounded by growing k ~ sqrt(n) (AQE skew-split covers
  stragglers).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_ASSIGN_SCHEMA = "vec_id bigint, cluster_id int, d2 double"


def seed_centroids(emb: DataFrame, k: int) -> np.ndarray:
    """Deterministic init: the k lowest-vec_id vectors, in vec_id
    order (cluster_id = rank in that order). TakeOrderedAndProject —
    a bounded O(k) collect, never a full sort."""
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    return np.vstack([np.asarray(r.embedding, dtype=np.float64) for r in rows])


def _assign_batches(cent: np.ndarray, keep_embedding: bool):
    """mapInPandas body: argmin squared-L2 over the broadcast centroid
    matrix. d2 is rounded to 6 dp BEFORE the argmin and ties break to
    the lowest cluster_id — the exact deterministic contract the
    DuckDB oracle's (d2, cluster_id) ordering implements."""
    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            d2 = np.round(((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2), 6)
            a = d2.argmin(axis=1)  # first (lowest) index on ties
            out = pdf[["vec_id"]].copy()
            out["cluster_id"] = a.astype(np.int32)
            out["d2"] = d2[np.arange(len(a)), a]
            if keep_embedding:
                out["embedding"] = pdf["embedding"].to_numpy()
            yield out
    return fn


def kmeans_assign(emb: DataFrame, cent: np.ndarray | None = None,
                  k: int = 8, keep_embedding: bool = False) -> DataFrame:
    """C45: one k-means E-step — map-only nearest-centroid assignment.

    With ``cent=None`` the centroids are the deterministic seed set,
    which is what makes the op exactly oracle-checkable in SQL (the
    oracle re-derives the same k seed vectors and the same
    (d2, cluster_id) argmin). Pass ``kmeans_fit`` centroids for the
    trained variant."""
    if cent is None:
        cent = seed_centroids(emb, k)
    schema = _ASSIGN_SCHEMA + (", embedding array<float>" if keep_embedding else "")
    return (emb.select("vec_id", "embedding")
            .mapInPandas(_assign_batches(cent, keep_embedding), schema))


def kmeans_fit(emb: DataFrame, k: int = 8, n_iter: int = 5
               ) -> tuple[DataFrame, np.ndarray]:
    """C46: full distributed Lloyd's — n_iter (E-step, M-step)
    rounds, then a final assignment DataFrame.

    Each round runs ONE map-only job whose output is bounded at
    n_parts * k rows (per-partition partial sums), combined on the
    driver in sorted (cluster_id, then partial order) — O(k * dim)
    driver state per round, the treeAggregate classic. Empty
    clusters keep their previous centroid (deterministic)."""
    cent = seed_centroids(emb, k)
    dim = cent.shape[1]
    base = emb.select("vec_id", "embedding")

    def partials(c):
        def fn(batches):
            import pandas as pd
            s = np.zeros((k, dim)); n = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
                a = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
                for ci in range(k):
                    m = a == ci
                    if m.any():
                        s[ci] += X[m].sum(axis=0); n[ci] += int(m.sum())
            # FLAT scalar rows (cluster, dim, val) — no nested Arrow
            # types in the partial frame; still bounded at k*dim rows
            # per partition regardless of input size
            nz = np.flatnonzero(n)
            yield pd.DataFrame({
                "cluster_id": np.repeat(nz, dim).astype(np.int32),
                "dim_idx": np.tile(np.arange(dim, dtype=np.int32), len(nz)),
                "val": s[nz].ravel(),
                "cnt": np.repeat(n[nz], dim)})
        return fn

    for _ in range(n_iter):
        rows = (base.mapInPandas(
            partials(cent),
            "cluster_id int, dim_idx int, val double, cnt bigint")
            .collect())  # bounded: <= n_parts * k * dim tiny rows
        s = np.zeros((k, dim)); n = np.zeros(k, dtype=np.int64)
        for r in sorted(rows, key=lambda r: (r.cluster_id, r.dim_idx)):
            s[r.cluster_id][r.dim_idx] += r.val
            if r.dim_idx == 0:
                n[r.cluster_id] += r.cnt
        nz = n > 0
        cent = cent.copy()
        cent[nz] = s[nz] / n[nz, None]
    return kmeans_assign(emb, cent=cent), cent


def semdedup_pairs(emb: DataFrame, k: int = 8, tau: float = 0.4,
                   cent: np.ndarray | None = None) -> DataFrame:
    """C47: SemDedup — near-dup pairs searched WITHIN k-means
    clusters only (Abbas et al. 2023). Candidate pairs drop from
    n^2 to sum(|cluster|^2); recall vs the exact pair set is
    whatever fraction of true pairs lands in one cluster
    (pytest-bounded; within-cluster results are EXACT, which is what
    the SQL oracle certifies).

    With ``cent=None`` the seed-centroid E-step keeps the whole
    composition oracle-checkable; pass ``kmeans_fit`` centroids for
    the production (trained) variant — same plan shape either way."""
    from gcp_data_engineering_workshop_spark.functions.vectorfns import (
        dot_pandas)

    asg = kmeans_assign(emb, cent=cent, k=k, keep_embedding=True)
    a = asg.select(F.col("cluster_id"), F.col("vec_id").alias("vec_a"),
                   F.col("embedding").alias("ea"))
    b = asg.select(F.col("cluster_id"), F.col("vec_id").alias("vec_b"),
                   F.col("embedding").alias("eb"))
    # exact verify via the Arrow-batched einsum (one BLAS call per
    # batch, ~20x the interpreted fold on dense candidate sets);
    # round(6) keeps the same cross-engine contract as the LSH verify
    pair_dot = dot_pandas()
    return (a.join(b, "cluster_id")
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("cluster_id", "vec_a", "vec_b",
                    F.round(pair_dot(F.col("ea"), F.col("eb")), 6)
                     .alias("dot_sim"))
            .where(F.col("dot_sim") >= tau))
