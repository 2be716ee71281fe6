"""Distributed logistic-regression trainer (SURVEY.md §2 C59).

The quality-filter stage of a training-data pipeline (fastText-style
classifier over cheap doc features) as a first-class distributed op:
full-batch gradient descent where each round is ONE map-only Arrow
job emitting per-partition partial gradients — at most (dim+1) flat
scalar rows per task regardless of input size — combined by a tiny
shuffle to exactly dim+1 rows before the driver updates the weights.
The same treeAggregate shape as the k-means M-step
(operators/clustering.py), with the same cross-engine determinism
trick: weights round to a decimal grid after every step, ~10 orders
of magnitude coarser than partial-sum reorder drift, so the whole
fit is bit-identical in any engine that sums in any order — which is
what lets the DuckDB oracle replay the entire descent as unrolled
CTE rounds.

Scale posture: the corpus never shuffles — per round one scan, one
(dim+1)-row exchange, an O(dim) driver update. Scoring is a pure
column expression (JVM sigmoid), zero Python.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# logistic_fit routes through a single driver-local numpy loop when
# n * (dim + 1) stays at or below this bound (the kmeans gate's
# principle — operators/clustering.py). 0 disables the local path.
_LOGREG_LOCAL_SCALARS = int(os.environ.get(
    "SPARK_GRAFT_LOGREG_LOCAL_SCALARS", str(8_000_000)))


def logistic_fit(feats: DataFrame, dim: int, n_iter: int = 5,
                 lr: float = 0.5, round_dp: int = 6,
                 stats: dict | None = None) -> np.ndarray:
    """Full-batch GD on sigmoid cross-entropy over ``feats``
    (columns: features array<double> of length ``dim``, label
    double in {0, 1}). Returns the (dim+1,) weight vector, bias
    LAST. Gradient = mean over rows of (sigmoid(w.x + b) - y) * [x, 1];
    weights round to ``round_dp`` decimals after every step."""
    import pyarrow as pa
    from gcp_data_engineering_workshop_spark.functions.vectorfns import (
        mat_from_arrow)

    w = np.zeros(dim + 1)
    base = feats.select("features", F.col("label").cast("double")
                        .alias("label"))

    # SIZE-GATED LOCAL PATH (r15; the kmeans-fit gate's principle):
    # when the feature matrix fits one driver buffer, ONE Arrow
    # collect pulls it and all n_iter GD rounds run locally. The
    # produced weights are identical by the decimal contract above —
    # the ONLY cross-path difference is partial-sum order, and the
    # per-step 1e-6 rounding is ~10 orders coarser than reorder
    # drift (the same argument that lets the DuckDB oracle replay
    # the descent). Past the gate the distributed loop below (~2
    # driver-synchronized jobs per round) is unchanged; ``stats``
    # records "fit_mode"; "combine_rows" is distributed-only (it is
    # the size of a frame the local path never builds).
    # r16 (VERDICT r15 #4): ONE bounded limit(bound+1) Arrow collect
    # decides the gate AND delivers the matrix — no full count()
    # action before the choice (the kmeans_fit probe's fusion; see
    # clustering.py for the decision-equivalence and row-order
    # arguments — here order-independence is the per-step 1e-6
    # weight grid vs partial-sum reorder drift).
    if _LOGREG_LOCAL_SCALARS > 0:
        bound_rows = _LOGREG_LOCAL_SCALARS // (dim + 1)
        tb = base.limit(bound_rows + 1).toArrow()
    else:
        tb = None
    if tb is not None and tb.num_rows <= bound_rows:
        if stats is not None:
            stats["fit_mode"] = "local"
        n = tb.num_rows
        if n == 0:
            # the distributed rounds would leave w at the zero
            # vector (g = 0, n = 0 every step)
            return np.round(w, round_dp)
        X = mat_from_arrow(tb.column("features"))
        y = tb.column("label").to_numpy(zero_copy_only=False)
        for _ in range(n_iter):
            z = X @ w[:dim] + w[dim]
            s = 1.0 / (1.0 + np.exp(-z))
            g = np.concatenate([(s - y) @ X, [(s - y).sum()]])
            w = np.round(w - lr * g / max(n, 1), round_dp)
        return w
    if stats is not None:
        stats["fit_mode"] = "distributed"

    def partials(wv):
        def fn(batches):
            g = np.zeros(dim + 1)
            n = 0
            for b in batches:
                if b.num_rows == 0:
                    continue
                X = mat_from_arrow(
                    b.column(b.schema.get_field_index("features")))
                y = b.column(b.schema.get_field_index("label")) \
                    .to_numpy(zero_copy_only=False)
                z = X @ wv[:dim] + wv[dim]
                s = 1.0 / (1.0 + np.exp(-z))
                g[:dim] += (s - y) @ X
                g[dim] += (s - y).sum()
                n += len(y)
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.arange(dim + 1, dtype=np.int32)),
                 pa.array(g, type=pa.float64()),
                 pa.array(np.full(dim + 1, n, dtype=np.int64))],
                ["dim_idx", "val", "cnt"])
        return fn

    for _ in range(n_iter):
        rows = (base.mapInArrow(
            partials(w), "dim_idx int, val double, cnt bigint")
            # combine partials in the cluster: one exchange of
            # <= n_parts * (dim+1) tiny rows down to dim+1
            .groupBy("dim_idx")
            .agg(F.sum("val").alias("val"), F.sum("cnt").alias("cnt"))
            .collect())
        if stats is not None:
            stats["combine_rows"] = max(stats.get("combine_rows", 0),
                                        len(rows))
        g = np.zeros(dim + 1)
        n = 0
        for r in rows:
            g[r.dim_idx] = r.val
            n = r.cnt
        w = np.round(w - lr * g / max(n, 1), round_dp)
    return w


def logistic_score(feats: DataFrame, w: np.ndarray) -> DataFrame:
    """Score with trained weights as a PURE column expression —
    sigmoid stays JVM-side, no Python in the scoring path. Emits
    (doc_id, score, predicted); score rounds to 6 dp (the
    cross-engine contract for the oracle compare)."""
    dim = len(w) - 1
    z = F.lit(float(w[dim]))
    for i in range(dim):
        z = z + F.element_at("features", i + 1) * float(w[i])
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select("doc_id", score.alias("score"),
                        (score >= 0.5).alias("predicted"))
