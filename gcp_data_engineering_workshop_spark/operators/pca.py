"""Distributed PCA over an embedding column (SURVEY.md §2 C69).

Principal-component projection is the standard conditioning step
before vector search at scale (FAISS pipelines PCA/OPQ-rotate before
IVF-PQ: fewer dimensions -> smaller codes, decorrelated axes ->
better codebooks) and before clustering (C45/C46 distances
concentrate better on decorrelated axes).

Scale shape — the same two-sided contract as the k-means M-step
(clustering.py): the fit never moves the corpus. One Arrow map pass
emits per-partition partial (sum vector, gram matrix) as FLAT
scalar rows — at most dim + dim*(dim+1)/2 rows per task regardless
of input size — a shuffle-side groupBy combines them to exactly that
many rows, and ONLY those reach the driver. The driver does the
O(dim^3) eigendecomposition (dim=64 -> microseconds) and ships the
projection matrix back inside the task closure of a map-only
projection pass. Corpus passes: exactly two (fit scan + project
scan); shuffles on the corpus: zero.

Determinism: partial sums reorder at ~1e-12; mean/covariance round
to a 1e-6 decimal grid before eigh, and each eigenvector's sign is
fixed by making its largest-|coordinate| entry positive (ties to the
lowest index), so the fitted basis is run-to-run identical. eigh
itself is not SQL-replayable — declared rows-only; pytest proves
exact parity against an independent numpy PCA using the same
rounding contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(emb: DataFrame, n_components: int = 8,
            round_dp: int = 6, stats: dict | None = None
            ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA on ``emb`` (vec_id, embedding). Returns
    (mean[dim], components[n_components, dim], explained_var[n_components]).
    ``stats`` records "combine_rows" (== dim + dim*(dim+1)/2)."""
    base = emb.select("embedding")

    def partials(batches):
        import pyarrow as pa
        from gcp_data_engineering_workshop_spark.functions.vectorfns import (
            mat_from_arrow)

        s = None
        g = None
        n = 0
        for b in batches:
            if b.num_rows == 0:
                continue
            X = mat_from_arrow(
                b.column(b.schema.get_field_index("embedding")))
            if s is None:
                dim = X.shape[1]
                s = np.zeros(dim)
                g = np.zeros((dim, dim))
            s += X.sum(axis=0)
            g += X.T @ X
            n += X.shape[0]
        if s is None:
            return
        dim = len(s)
        iu = np.triu_indices(dim)
        # flat rows: kind 0 = count (one row), 1 = sum vector,
        # 2 = upper-triangle gram entries (i*dim+j index)
        idx = np.concatenate(([0], np.arange(dim),
                              iu[0] * dim + iu[1]))
        kind = np.concatenate(([0], np.ones(dim, dtype=np.int64),
                               np.full(len(iu[0]), 2, dtype=np.int64)))
        val = np.concatenate(([float(n)], s, g[iu]))
        yield pa.RecordBatch.from_arrays(
            [pa.array(kind.astype(np.int32)),
             pa.array(idx.astype(np.int64)),
             pa.array(val, type=pa.float64())],
            ["kind", "idx", "val"])

    rows = (base.mapInArrow(partials, "kind int, idx bigint, val double")
            .groupBy("kind", "idx")
            .agg(F.sum("val").alias("val"))
            .collect())
    if stats is not None:
        stats["combine_rows"] = len(rows)
    n = 0.0
    sums: dict[int, float] = {}
    gram: dict[int, float] = {}
    for r in rows:
        if r.kind == 0:
            n = r.val
        elif r.kind == 1:
            sums[r.idx] = r.val
        else:
            gram[r.idx] = r.val
    dim = len(sums)
    s = np.array([sums[i] for i in range(dim)])
    g = np.zeros((dim, dim))
    iu = np.triu_indices(dim)
    for i, j in zip(*iu):
        g[i, j] = g[j, i] = gram[i * dim + j]
    mean = np.round(s / n, round_dp)
    cov = np.round((g - np.outer(s, s) / n) / max(n - 1.0, 1.0), round_dp)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T.copy()
    # deterministic sign: largest-|coordinate| entry positive
    for c in comps:
        k = int(np.argmax(np.abs(np.round(c, round_dp))))
        if c[k] < 0:
            c *= -1.0
    return mean, np.round(comps, round_dp), np.round(w[order], round_dp)


def pca_project(emb: DataFrame, mean: np.ndarray, comps: np.ndarray,
                round_dp: int = 6) -> DataFrame:
    """Map-only projection: (vec_id, comp_idx, value) flat rows of
    Y = (X - mean) @ comps^T, rounded — the driver-sortable shape
    (nested outputs break the gate canonicalizer, VERDICT r5 #1)."""
    p = comps.shape[0]

    def project(batches):
        import pyarrow as pa
        from gcp_data_engineering_workshop_spark.functions.vectorfns import (
            mat_from_arrow)

        for b in batches:
            if b.num_rows == 0:
                continue
            X = mat_from_arrow(
                b.column(b.schema.get_field_index("embedding")))
            Y = np.round((X - mean) @ comps.T, round_dp)
            vid = b.column(b.schema.get_field_index("vec_id"))
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.repeat(vid.to_numpy(zero_copy_only=False), p)),
                 pa.array(np.tile(np.arange(p, dtype=np.int32),
                                  b.num_rows)),
                 pa.array(Y.ravel(), type=pa.float64())],
                ["vec_id", "comp_idx", "value"])

    return (emb.select("vec_id", "embedding")
            .mapInArrow(project,
                        "vec_id bigint, comp_idx int, value double"))
