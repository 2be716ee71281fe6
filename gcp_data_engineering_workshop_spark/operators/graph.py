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
    from pyspark.sql import Observation

    # persist the PROJECTED edges BEFORE symmetrizing: the union's
    # two branches would otherwise each recompute the (often
    # expensive) upstream pair join — measured as the whole minhash
    # pipeline running twice inside one job. With the cache, the
    # first branch materializes it once and the mirror branch reads
    # the cache.
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).persist()
    sym = e.union(e.select(F.col("b").alias("a"),
                           F.col("a").alias("b"))).persist()
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
        # Fused convergence check: the changed-label count rides the
        # label-update pass as an Observation metric, so each round
        # is ONE job — no second join-the-old-labels action. A label
        # only ever decreases, so "changed" is exactly "some
        # neighbor's min beat my label".
        obs = Observation(f"cc_round_{i}")
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node",
                    F.least(F.col("label"),
                            F.coalesce("nlabel", F.col("label"))).alias("label"),
                    (F.coalesce("nlabel", F.col("label"))
                     < F.col("label")).cast("long").alias("_chg"))
            .observe(obs, F.sum("_chg").alias("changed"))
            .select("node", "label")
            .persist()
        )
        new_labels.count()  # materializes the cache AND the metric
        changed = obs.get["changed"] or 0
        # the superseded round's labels are never read again — free
        # the executor memory instead of accumulating one cached
        # frame per round
        labels.unpersist()
        labels = new_labels
        # Every few rounds, cut the lineage: each iteration's plan
        # nests the previous one, so on long-diameter graphs (path-
        # like chains, max_iter rounds) the plan tree would grow
        # without bound and re-plan cost with it. localCheckpoint
        # truncates the logical plan (on the already-hot cache).
        if (i + 1) % 5 == 0:
            labels = labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("component"))
