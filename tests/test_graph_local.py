"""Parity: the r15 size-gated single-task CC path must produce
exactly the distributed loop's rows (component = min node id is a
unique fixed point — both algorithms converge to it)."""

from __future__ import annotations

import random

from gcp_data_engineering_workshop_spark.operators import graph


def _random_edges(rng, n_nodes, n_edges):
    return [(rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)]


def _reference_components(edges):
    """Pure-python union-find, min-id labels."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_cc_local_matches_distributed_and_reference(spark, monkeypatch):
    rng = random.Random(42)
    cases = [
        [],  # no edges
        [(5, 5)],  # self loop
        [(1, 2), (2, 3), (3, 4), (10, 11)],  # chain + pair
        _random_edges(rng, 40, 120),  # dense-ish
        _random_edges(rng, 500, 200),  # sparse, many singletons
        [(i, i + 1) for i in range(64)],  # long chain
    ]
    for i, edges in enumerate(cases):
        df = spark.createDataFrame(
            edges or [(0, 0)], "doc_a bigint, doc_b bigint")
        if not edges:
            df = df.where("doc_a < 0")
        stats_l, stats_d = {}, {}
        monkeypatch.setattr(graph, "_CC_LOCAL_EDGE_BOUND", 10_000_000)
        local = {(r.doc_id, r.component)
                 for r in graph.connected_components(
                     df, stats=stats_l).collect()}
        monkeypatch.setattr(graph, "_CC_LOCAL_EDGE_BOUND", 0)
        dist = {(r.doc_id, r.component)
                for r in graph.connected_components(
                    df, stats=stats_d).collect()}
        assert local == dist, f"case {i}"
        ref = set(_reference_components(edges).items())
        assert local == ref, f"case {i}"
        if edges:
            assert stats_l["mode"] == "local"
            assert stats_d["mode"] == "distributed"


def test_cc_local_non_bigint_falls_back(spark):
    """Non-bigint node ids skip the local path (its schema is
    pinned int64) and still produce correct components."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a int, doc_b int")
    stats = {}
    out = {(r.doc_id, r.component)
           for r in graph.connected_components(df, stats=stats).collect()}
    assert out == {(1, 1), (2, 1), (3, 1)}
    assert stats["mode"] == "distributed"
