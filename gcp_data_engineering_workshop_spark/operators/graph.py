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

import itertools

from gcp_data_engineering_workshop_spark.operators.cachepool import (
    register, release)

# Observation names must be unique across the whole session: two CC
# results composed into ONE downstream plan (e.g. dedup_corpus
# survivors joined with semdedup_trained keepers) would otherwise
# collide on the per-round metric name (DUPLICATED_METRICS_NAME)
_cc_run_ids = itertools.count()


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
    e = register(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    sym = register(e.union(e.select(F.col("b").alias("a"),
                                    F.col("a").alias("b"))))
    labels = register(sym.select(F.col("a").alias("node"))
                      .distinct()
                      .withColumn("label", F.col("node")))
    run_id = next(_cc_run_ids)
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
        obs = Observation(f"cc_{run_id}_round_{i}")
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
        if i == 0:
            # sym materialized during that count; the projected-edge
            # cache it was built from is dead — release it from the
            # pool eagerly rather than waiting for FIFO eviction
            release(e)
        # the superseded round's labels are never read again — free
        # the executor memory (and its pool slot, for the initial
        # registered frame) instead of accumulating one per round
        release(labels)
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
    # the edge caches are dead once the final labels materialized —
    # only the label frame the returned plan reads stays pooled, so
    # a CC run parks exactly ONE frame in the session pool
    release(sym)
    register(labels)
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("component"))


def connected_components_sql(edges: DataFrame, max_depth: int = 8,
                             src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """E16: the Spark 4 ``WITH RECURSIVE`` twin of
    connected_components — bounded-depth reachability in one SQL
    statement. Spark's recursive CTEs support UNION ALL only (no
    UNION-distinct fixpoint yet), so cyclic graphs need an explicit
    depth bound: correct for any graph whose component diameter is
    <= max_depth, which near-dup clusters (near-cliques, diameter
    2-3) satisfy with room to spare.

    This exists to exercise the engine surface; the iterative
    DataFrame operator (connected_components) remains the scale
    path — UNION ALL enumerates PATHS, so a dense clique's
    intermediate row count grows with depth where the iterative
    operator's per-round frame stays at |nodes|.
    """
    spark = edges.sparkSession
    edges.select(F.col(src).alias("a"), F.col(dst).alias("b")) \
        .createOrReplaceTempView("cc_edges_in")
    return spark.sql(f"""
      WITH RECURSIVE sym AS (
        SELECT a, b FROM cc_edges_in
        UNION ALL
        SELECT b, a FROM cc_edges_in
      ),
      reach(a, b, depth) AS (
        SELECT a, b, 1 FROM sym
        UNION ALL
        SELECT r.a, e.b, r.depth + 1
        FROM reach r JOIN sym e ON r.b = e.a
        WHERE r.depth < {int(max_depth)}
      )
      SELECT node AS doc_id, least(node, mr) AS component
      FROM (SELECT a AS node, min(b) AS mr FROM reach GROUP BY a)
    """)
