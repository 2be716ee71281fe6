"""Iterative graph operator: connected components over near-dup
pairs (SURVEY.md §2 C14).

Deduplication at 100 TB ends with grouping: near-dup PAIRS must
become components ("keep one doc per group"). Pair lists are not
groups — transitivity matters (a~b, b~c => {a,b,c}).

Implemented as distributed min-label propagation: every node starts
labeled with itself; each round, every node takes the min label in
its neighborhood; stop when no label changes. Each round is a
shuffle-join + aggregate (fully distributed); the driver only
orchestrates the loop and checks convergence — rounds are bounded by
the graph diameter (log-ish for dedup clusters, which are near-
cliques, typically 2-3 rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b", max_iter: int = 20) -> DataFrame:
    """Connected components of an undirected edge list.
    Returns (doc_id, component) where component = min node id in the
    component. Checkpoint-free: each iteration's frame is small
    (nodes that appear in any edge)."""
    # persist: the edge list (often an expensive upstream join, e.g.
    # an O(n^2) jaccard) is re-read every iteration AND for the
    # convergence check — without this the whole upstream recomputes
    # per round.
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))))
    sym = sym.persist()
    labels = (sym.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("label", F.col("node"))
              .persist())
    for i in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node",
                    F.least(F.col("label"),
                            F.coalesce("nlabel", F.col("label"))).alias("label"))
        )
        # Every few rounds, cut the lineage: each iteration's plan
        # nests the previous one, so on long-diameter graphs (path-
        # like chains, max_iter rounds) the plan tree would grow
        # without bound and re-plan cost with it. localCheckpoint
        # materializes the frame and truncates the logical plan.
        if (i + 1) % 5 == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        # the superseded round's labels are never read again — free
        # the executor memory instead of accumulating one cached
        # frame per round
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("component"))
