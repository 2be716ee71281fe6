from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.operators import dedup as D
from gcp_data_engineering_workshop_spark.catalog import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_groups(spark):
    docs = _docs(spark, [
        (1, "Hello  World"), (2, "hello world"),    # same after normalize
        (3, "different doc entirely"),
    ])
    out = {r.doc_id: r for r in D.exact_dedup(docs).collect()}
    assert out[1].norm_hash == out[2].norm_hash
    assert out[1].group_size == 2
    assert out[1].is_canonical is True and out[2].is_canonical is False
    assert out[3].group_size == 1


def test_minhash_lsh_equals_exact_jaccard(spark, sf_dir):
    """LSH-verified pairs == exact O(n^2) pairs at tau=0.9 (the
    S-curve guarantee the oracle relies on)."""
    docs = load_table(spark, "documents", sf_dir)
    lsh = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(docs, tau=0.9).collect()}
    exact = {(r.doc_a, r.doc_b) for r in D.ngram_jaccard_pairs(docs, tau=0.9).collect()}
    assert lsh == exact


def test_simhash_identical_docs_distance_zero(spark):
    docs = _docs(spark, [
        (1, "spark window join batch"), (2, "spark window join batch"),
        (3, "completely unrelated words here xyzzy quux"),
    ])
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in
             D.simhash_pairs(docs, max_hamming=64).collect()}
    assert pairs.get((1, 2)) == 0


def test_simhash_chunk_pigeonhole(spark, sf_dir):
    """Any pair within hamming<=3 must share a 16-bit chunk, so the
    banded candidate join loses nothing vs exhaustive hamming."""
    docs = load_table(spark, "documents", sf_dir).limit(200)
    sig = docs.select("doc_id", D.simhash_chunks("text").alias("chunks"))
    a = sig.selectExpr("doc_id as doc_a", "chunks as ca")
    b = sig.selectExpr("doc_id as doc_b", "chunks as cb")
    hamming = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    exhaustive = {(r.doc_a, r.doc_b) for r in
                  a.join(b, F.col("doc_a") < F.col("doc_b"))
                   .select("doc_a", "doc_b", hamming.alias("h"))
                   .where(F.col("h") <= 3).collect()}
    banded = {(r.doc_a, r.doc_b) for r in D.simhash_pairs(docs, 3).collect()}
    assert banded == exhaustive


def test_connected_components_tiny(spark):
    from gcp_data_engineering_workshop_spark.operators.graph import connected_components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a bigint, doc_b bigint")
    out = {r.doc_id: r.component for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


def test_ngram_prefix_filter_complete_vs_bruteforce(spark):
    """Prefix-filtered candidate generation (AllPairs bound) must
    recover every qualifying pair even when all docs share heavy
    boilerplate shingles — the case where the hot shingles drop out
    of the index prefixes entirely."""
    boiler = "of the and in a to is on for it"
    rows = []
    for i in range(20):
        rows.append((i, f"{boiler} unique tail words number{i} alpha{i} beta{i}"))
    # 3 near-dup pairs differing by one trailing word
    rows.append((100, f"{boiler} shared tail words common one two three four"))
    rows.append((101, f"{boiler} shared tail words common one two three five"))
    rows.append((102, f"{boiler} shared tail words common one two three four"))
    docs = _docs(spark, rows)

    def shingle_set(text):
        ws = text.lower().split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    for tau in (0.9, 0.7, 0.5):
        expected = set()
        sets = {d: shingle_set(t) for d, t in rows}
        for a in sets:
            for b in sets:
                if a < b:
                    j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                    if j >= tau:
                        expected.add((a, b))
        got = {(r.doc_a, r.doc_b)
               for r in D.ngram_jaccard_pairs(docs, tau=tau).collect()}
        assert got == expected, f"tau={tau}"


def test_connected_components_long_chain(spark):
    """Path graph 0-1-2-...-12 (diameter 12): proves convergence
    beyond near-clique dedup graphs and exercises the periodic
    localCheckpoint lineage cut (rounds > 5)."""
    from gcp_data_engineering_workshop_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(100, 101)],
        "doc_a bigint, doc_b bigint")
    out = {r.doc_id: r.component for r in connected_components(edges).collect()}
    assert all(out[i] == 0 for i in range(13))
    assert out[100] == 100 and out[101] == 100


def test_incremental_dedup_matches_brute_force(spark, sf_dir):
    """C38 survivors == batch minus (exact-hash matches + brute-force
    >= tau Jaccard near-dups vs the corpus), computed independently
    in Python over the small fixture."""
    from gcp_data_engineering_workshop_spark.catalog import load_table

    d = load_table(spark, "documents", sf_dir)
    rows = [(r.doc_id, r.text) for r in d.select("doc_id", "text").collect()]
    import re

    def norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    def shingle_set(t):
        ws = norm(t).split(" ")
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    batch = {i: t for i, t in rows if i % 10 >= 8}
    corpus = {i: t for i, t in rows if i % 10 < 8}
    corpus_norms = {norm(t) for t in corpus.values()}
    corpus_sets = {i: shingle_set(t) for i, t in corpus.items()}
    expected = set()
    for i, t in batch.items():
        if norm(t) in corpus_norms:
            continue
        s = shingle_set(t)
        dup = any(
            s and cs and len(s & cs) / len(s | cs) >= 0.9
            for cs in corpus_sets.values())
        if not dup:
            expected.add(i)

    from gcp_data_engineering_workshop_spark.plans.textpipeline import dedup_incremental
    got = {r.doc_id for r in dedup_incremental(spark, sf_dir).collect()}
    assert got == expected


def test_incremental_dedup_never_compares_corpus_to_corpus(spark, sf_dir):
    """The whole point at 100 TB: survivors depend only on
    batch-vs-corpus comparisons, so adding an intra-corpus duplicate
    pair must not change the output."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.dedup import incremental_dedup
    import pyspark.sql.functions as F

    d = load_table(spark, "documents", sf_dir)
    batch = d.where(F.col("doc_id") % 10 >= 8)
    corpus = d.where(F.col("doc_id") % 10 < 8)
    base = {r.doc_id for r in incremental_dedup(batch, corpus).collect()}
    # duplicate every corpus doc under a fresh id: corpus-side dup
    # pressure, zero new information about the batch
    doubled = corpus.unionAll(
        corpus.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    again = {r.doc_id for r in incremental_dedup(batch, doubled).collect()}
    assert again == base


def test_recursive_cte_components_match_iterative(spark):
    """E16: the WITH RECURSIVE formulation equals the iterative
    operator on bounded-diameter graphs (two triangles + an edge +
    a 4-chain)."""
    from gcp_data_engineering_workshop_spark.operators.graph import (
        connected_components, connected_components_sql)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21),
         (30, 31), (31, 32), (32, 33)],
        "doc_a bigint, doc_b bigint")
    want = {(r.doc_id, r.component)
            for r in connected_components(edges).collect()}
    got = {(r.doc_id, r.component)
           for r in connected_components_sql(edges).collect()}
    assert got == want and len(want) > 0


def test_ingest_bloom_equals_exact_antijoin(spark, sf_dir):
    """C85: the bloom-pruned ingest admission equals the plain exact
    anti-join — at the production sizing AND at an aggressively tiny
    m_bits=1024 that FORCES false positives into the confirm join
    (one-sidedness means FPs cost traffic, never correctness)."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.dedup import (
        incremental_dedup_bloom)
    import pyspark.sql.functions as F
    from gcp_data_engineering_workshop_spark.functions.textfns import (
        normalize)

    d = load_table(spark, "documents", sf_dir)
    batch = d.where(F.col("doc_id") % 10 >= 8)
    corpus = d.where(F.col("doc_id") % 10 < 8)
    h = F.md5(normalize("text"))
    exact = {r.doc_id for r in
             batch.withColumn("h", h)
             .join(corpus.select(h.alias("h")).distinct(), "h",
                   "left_anti").collect()}
    for m_bits in (1 << 18, 1024):
        got = {r.doc_id for r in
               incremental_dedup_bloom(batch, corpus,
                                       m_bits=m_bits).collect()}
        assert got == exact, m_bits


def test_ingest_bloom_prunes_join_free_admissions(spark, sf_dir):
    """The point of the bloom gate: at production sizing, most
    genuinely-new docs are admitted WITHOUT reaching the confirm
    join. Re-derive the bloom verdict per batch doc and check the
    negative (join-free) fraction dominates among the new docs."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.functions.textfns import (
        normalize, KR_MOD)
    from gcp_data_engineering_workshop_spark.operators import bloom as BL
    import pyspark.sql.functions as F

    m_bits, n_hashes = 1 << 18, 5
    d = load_table(spark, "documents", sf_dir)
    batch = d.where(F.col("doc_id") % 10 >= 8)
    corpus = d.where(F.col("doc_id") % 10 < 8)
    key = (F.conv(F.substring(F.col("h"), 1, 8), 16, 10)
           .cast("bigint") % F.lit(KR_MOD))
    corpus_h = corpus.select(F.md5(normalize("text")).alias("h"))
    bitmap = BL.bloom_build(corpus_h.select(key.alias("hk")).distinct(),
                            "hk", m_bits=m_bits, n_hashes=n_hashes)
    probe = BL.bloom_might_contain(bitmap, n_hashes)
    b = (batch.select("doc_id", F.md5(normalize("text")).alias("h"))
         .withColumn("maybe", probe(
             BL.bloom_positions(key, m_bits, n_hashes))))
    n_batch = b.count()
    n_pruned = b.where(~F.col("maybe")).count()
    # corpus docs are ~unique in this fixture, so nearly every batch
    # doc is new; at m=2^18 for ~400 keys the FP rate is ~0 and the
    # bloom should admit the overwhelming majority join-free
    assert n_pruned / n_batch > 0.9, (n_pruned, n_batch)


def test_minhash_compositional_api_matches_fused_pass(spark, sf_dir):
    """minhash_signature / minhash_band_buckets are the compositional
    building blocks for corpora that ALREADY carry hashed-shingle
    arrays (the fused shingle_features path starts from raw text).
    Same hash arrays in => same band buckets out, so a pre-hashed
    pipeline and the text pipeline bucket identically."""
    import numpy as np
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators.dedup import (
        minhash_band_buckets, minhash_signature, shingle_features,
        _band_fold)
    import pyspark.sql.functions as F

    d = load_table(spark, "documents", sf_dir).limit(200)
    feats = d.select(
        "doc_id", shingle_features(3, 64, 16)("text").alias("f"))
    # re-derive buckets from the emitted hash arrays via the
    # compositional ops
    redone = feats.select(
        "doc_id", F.col("f.buckets").alias("want"),
        minhash_band_buckets(F.col("f.hs"), 64, 16).alias("got"),
        minhash_signature(F.col("f.hs"), 64).alias("sig"))
    rows = redone.collect()
    assert len(rows) == 200
    for r in rows:
        assert list(r.got) == list(r.want), r.doc_id
        # and the standalone signature folds to the same buckets
        assert list(_band_fold(
            np.asarray([r.sig], dtype=np.int64), 16)[0]) == list(r.want)


def test_ingest_bloom_null_text_docs_are_admitted(spark):
    """ADVICE r8: NULL-normalizing docs hash to NULL; a NULL key
    never matches an anti-join, so the exact path ADMITS them — the
    bloom path must do the same (and not feed NULL positions into
    the Arrow probe), on both the batch and the corpus side."""
    from gcp_data_engineering_workshop_spark.operators.dedup import (
        incremental_dedup_bloom)

    corpus = spark.createDataFrame(
        [(1, "en", "shared text"), (2, "en", None)],
        "doc_id bigint, lang string, text string")
    batch = spark.createDataFrame(
        [(10, "en", "shared text"),   # true re-ingest: dropped
         (11, "en", None),            # NULL text: admitted
         (12, "en", "fresh text")],   # new: admitted
        "doc_id bigint, lang string, text string")
    got = {r.doc_id for r in
           incremental_dedup_bloom(batch, corpus, m_bits=1024).collect()}
    assert got == {11, 12}
