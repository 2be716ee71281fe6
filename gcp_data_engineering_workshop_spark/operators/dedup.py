"""Deduplication operators for the documents table — the core
training-data-pipeline surface (SURVEY.md §2 C1-C4).

Four strategies, one contract (pairs or canonical marks):

- exact: normalized-text md5 grouping. One shuffle on the hash.
- MinHash+LSH: shingle -> 64-perm minhash -> 32 bands x 2 rows ->
  band-bucket self-join -> exact-Jaccard verify. The self-join is on
  (band, bucket) — candidates only ever meet inside a bucket, so the
  pair count stays near-linear instead of O(n^2). At tau=0.9 the
  2-row/32-band S-curve has miss probability (1-0.81)^32 ~= 1e-23, so
  verified output equals the exact-Jaccard pair set (which is how the
  DuckDB oracle checks it).
- SimHash: 64-bit signature packed as 4x16-bit chunks; near-dup
  candidates share at least one chunk (guaranteed for hamming<=3 by
  pigeonhole over 4 chunks... wait, 4 chunks / 3 flips: some chunk is
  untouched), verified by exact hamming via bit_count.
- exact n-gram Jaccard: the O(n^2) verifier (small inputs / oracle
  baseline; the LSH path is what runs at 100 TB).

All signature math is JVM-side higher-order expressions (xxhash64,
transform/aggregate) — no Python in the row path.
"""

from __future__ import annotations

import random

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gcp_data_engineering_workshop_spark.functions.textfns import (
    normalize, shingles_of, words, jaccard,
)
from gcp_data_engineering_workshop_spark.operators.cachepool import register

def _perm_params(n_perms: int, seed: int = 42) -> list[tuple[int, int]]:
    """Multiply-shift hash params: odd 64-bit multiplier + 64-bit
    offset per permutation. NOTE: an affine map mod a prime is NOT a
    usable minhash permutation when the multiplier is small relative
    to the domain — it wraps at most once, stays order-preserving in
    h, and every 'permutation' then picks the same 1-2 smallest
    elements (signatures collapse). Multiply-shift mixes the high
    bits, which is what min-wise hashing actually needs."""
    rng = random.Random(seed)
    return [(rng.randrange(0, 1 << 64) | 1, rng.randrange(0, 1 << 64))
            for _ in range(n_perms)]


def exact_dedup(docs: DataFrame) -> DataFrame:
    """C1: mark duplicate groups by md5 of the normalized text.
    Output: doc_id, norm_hash, group_size, is_canonical (min doc_id
    of the group)."""
    hashed = docs.select(
        "doc_id", F.md5(normalize("text")).alias("norm_hash"))
    w = Window.partitionBy("norm_hash")
    return hashed.select(
        "doc_id", "norm_hash",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )


def _shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    # Plan shape matters a lot here (measured 20x):
    # 1. repartition the RAW scan first — a small parquet input is one
    #    partition, which would serialize the per-row-heavy
    #    interpreted work on a single core;
    # 2. repartition again BETWEEN tokenize and shingle — the exchange
    #    is a barrier that stops CollapseProject from fusing the
    #    projections; fused, the shingle lambda re-runs the
    #    regex+split chain on every element access (quadratic).
    # Callers must NOT filter on derived columns (e.g. size(sh)>0):
    # predicate pushdown substitutes the whole expression chain and
    # re-evaluates it at the single-partition scan.
    par = docs.sparkSession.sparkContext.defaultParallelism
    wt = (docs.repartition(par)
          .select("doc_id", words("text").alias("w"))
          .repartition(par))
    return wt.select("doc_id", shingles_of(F.col("w"), n).alias("sh"))


def _minhash_matrix(lists, n_perms: int, seed: int):
    """(n_docs, n_perms) int64 minhash signatures for a batch of
    hashed-shingle lists, in ONE numpy pass: concatenate every doc's
    hashes, broadcast-mix against all permutations at once, then
    np.minimum.reduceat over per-doc segment boundaries. Per-doc
    numpy calls (a ~52x64 matmul each) spend ~0.5 ms/doc in call
    overhead — reduceat amortizes it to one op per BATCH, measured
    ~10x on the signature stage."""
    import numpy as np

    params = _perm_params(n_perms, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.uint64)
    b_vec = np.array([b for _, b in params], dtype=np.uint64)
    sentinel = np.iinfo(np.int64).max

    n = len(lists)
    lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=n)
    out = np.full((n, n_perms), sentinel, dtype=np.int64)
    nz = np.flatnonzero(lens)
    if len(nz):
        cat = np.concatenate([np.asarray(lists[i], dtype=np.int64) for i in nz])
        starts = np.zeros(len(nz), dtype=np.int64)
        starts[1:] = np.cumsum(lens[nz])[:-1]
        ends = np.append(starts[1:], len(cat))
        # mix + reduce in segment-aligned chunks: the whole-batch
        # (n_shingles, n_perms) mix allocates multi-hundred-MB uint64
        # temporaries and goes allocation/bandwidth-bound — measured
        # 6.1s vs 0.5s chunked for 1M x 64 (r8); results are
        # bit-identical (same per-segment ops, different tiling)
        blk = 1 << 16
        rows = []
        i = 0
        while i < len(nz):
            j = i + 1
            while j < len(nz) and ends[j - 1] - starts[i] < blk:
                j += 1
            lo, hi = starts[i], ends[j - 1]
            mixed = (cat[lo:hi].astype(np.uint64)[:, None] * a_vec
                     + b_vec) >> np.uint64(32)  # wraps mod 2^64
            rows.append(np.minimum.reduceat(
                mixed, starts[i:j] - lo, axis=0))
            i = j
        out[nz] = np.concatenate(rows).astype(np.int64)
    return out


def minhash_signature(hashes: Column, n_perms: int = 64, seed: int = 42) -> Column:
    """MinHash signature of a pre-hashed shingle array (xxhash64
    longs): for each permutation (a,b), min over shingles of
    ((a*h + b) mod 2^64) >> 32 — multiply-shift universal hashing
    (uint64 wraparound mixes the high bits; see _perm_params for why
    an affine-mod-prime 'permutation' silently breaks minhash).

    Arrow-batched and batch-vectorized (see _minhash_matrix):
    Spark's higher-order lambdas are interpreted per element (no
    codegen), so an expression-tree min over perms x shingles is
    ~50x slower than the uint64 matrix op.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _sig(hs):
        mat = _minhash_matrix(hs.to_numpy(), n_perms, seed)
        return pd.Series(list(mat))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't introspect — attach real ones explicitly.
    _sig.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    sig = pandas_udf(_sig, "array<bigint>")

    return sig(hashes)


def _band_fold(sig, n_bands: int):
    """(n_docs, n_perms) signatures -> (n_docs, n_bands) int64 bucket
    ids: FNV-1a fold of each band's rows, vectorized uint64. Equal
    band slices always produce equal buckets; collisions between
    unequal slices only add candidates, which the exact verify
    removes."""
    n_docs, n_perms = sig.shape
    rows = n_perms // n_bands
    banded = sig.astype(np.uint64).reshape(n_docs, n_bands, rows)
    h = np.full((n_docs, n_bands), np.uint64(0xcbf29ce484222325), dtype=np.uint64)
    for j in range(rows):
        h = (h ^ banded[:, :, j]) * np.uint64(0x100000001b3)
    return h.astype(np.int64)


def shingle_features(n: int = 3, n_perms: int = 64, n_bands: int = 16,
                     seed: int = 42):
    """ONE Arrow pass from raw text to both LSH structures:
    struct<hs: array<bigint>, buckets: array<bigint>> where hs are
    64-bit hashes of the doc's distinct n-word shingles (the exact-
    Jaccard verify input) and buckets the n_bands minhash band ids.

    Why fused, and why the hashing is vectorized (r8 measurements on
    the x100 probe corpus, 500k docs — dedup_corpus end to end):
    - JVM formulation (words -> shingles_of -> transform(xxhash64)):
      131 s. Spark higher-order-function lambda bodies run on the
      INTERPRETED expression path, never whole-stage codegen, so
      per-shingle concat_ws/element_at/xxhash64 trees are the
      slowest option — measured and REJECTED.
    - fused pass, per-shingle hashlib.blake2b loop (the r6 shape):
      87 s, 61 s of it in this stage's ~48M interpreter hash calls.
    - fused pass, ONE pd.util.hash_array call per Arrow batch (C
      khash path, 64-bit, deterministic key) + per-doc np.unique
      for set semantics (replacing the Python set-of-strings):
      the current shape.
    Tokenization matches textfns.words exactly (lower, collapse
    ASCII whitespace, trim) so the DuckDB oracle's shingle sets are
    identical; the hash itself is engine-internal (the oracle
    compares shingle STRINGS), and any deterministic 64-bit hash
    yields the same verified pair set — jaccard on hashes equals
    jaccard on strings up to negligible 64-bit collisions."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, applied to lower()

    def _feats(texts):
        flat: list[str] = []
        offs = [0]
        for t in texts:
            toks = ws_re.split(t.lower().strip()) if t and t.strip() else []
            if len(toks) >= n:
                flat.extend(" ".join(toks[i:i + n])
                            for i in range(len(toks) - n + 1))
            offs.append(len(flat))
        if flat:
            hv = pd.util.hash_array(
                np.asarray(flat, dtype=object)).view(np.int64)
        else:
            hv = np.empty(0, dtype=np.int64)
        hs_col = [np.unique(hv[offs[i]:offs[i + 1]])
                  for i in range(len(texts))]
        buckets = _band_fold(
            _minhash_matrix(hs_col, n_perms, seed), n_bands)
        return pd.DataFrame({"hs": hs_col, "buckets": list(buckets)})

    _feats.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_feats, "hs array<bigint>, buckets array<bigint>")


def minhash_band_buckets(hashes: Column, n_perms: int = 64,
                         n_bands: int = 16, seed: int = 42) -> Column:
    """Fused signature + banding: one Arrow pass from hashed shingles
    straight to the n_bands LSH bucket ids (FNV-1a fold of each
    band's signature rows, vectorized uint64). Equal band slices
    always produce equal buckets, so the candidate semantics match
    the unfused signature->xxhash64-band formulation; any extra
    collisions from the different bucket hash are removed by the
    exact-Jaccard verify. Saves a full projection pass + 16
    interpreted element_at/xxhash64 struct builds per row."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _buck(hs):
        sig = _minhash_matrix(hs.to_numpy(), n_perms, seed)
        return pd.Series(list(_band_fold(sig, n_bands)))

    _buck.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    buck = pandas_udf(_buck, "array<bigint>")
    return buck(hashes)


def auto_minhash_params(tau: float, n_rows: int,
                        target_miss: float = 1e-6,
                        max_perms: int = 256,
                        s_background: float = 0.2) -> tuple[int, int]:
    """C87: choose (n_perms, n_bands) for minhash_lsh_pairs from the
    threshold and corpus size — the shingle-LSH analog of C51's
    auto_lsh_params, replacing the hand-picked 64x16 with the
    S-curve math made explicit.

    With r rows per band and b bands, a pair at similarity s
    collides in one band w.p. s^r and is MISSED entirely w.p.
    (1 - s^r)^b; b(r) = ceil(ln(target_miss) / ln(1 - tau^r)) is the
    smallest band count meeting the recall target at the threshold.
    Larger r prunes background pairs harder (a random pair at
    s_background collides w.p. s_bg^r per band) but pays recall back
    in bands. This picks the r in [2, 16] minimizing the modeled
    cost b * (n^2/2) * s_bg^r + b * n (expected background
    candidates + bucketing rows) subject to r*b <= max_perms.
    Verify restores exactness regardless of the choice (the chosen
    params only move candidate traffic), which is why the auto
    variant carries C2's oracle unchanged."""
    import math

    best, best_cost = None, float("inf")
    for r in range(2, 17):
        p = tau ** r
        # p ~ 1: no band can miss; p ~ 0 underflows log1p(-p) to 0
        # (band count would be astronomical — infeasible either way)
        if p >= 1.0 or 1.0 - p >= 1.0:
            continue
        b = max(1, math.ceil(math.log(target_miss)
                             / math.log(1.0 - p)))
        if r * b > max_perms:
            continue
        cost = (b * (n_rows * n_rows / 2.0) * (s_background ** r)
                + b * n_rows)
        if cost < best_cost:
            best, best_cost = (r * b, b), cost
    if best is None:
        raise ValueError(
            f"auto_minhash_params: no (r, b) with r*b <= {max_perms} "
            f"reaches miss <= {target_miss} at tau={tau}; raise "
            f"max_perms or relax target_miss")
    return best


def minhash_lsh_pairs(docs: DataFrame, tau: float = 0.9,
                      n_perms: int = 64, n_bands: int = 16) -> DataFrame:
    """C2: near-duplicate pairs via MinHash LSH, verified with exact
    Jaccard. Output: doc_a, doc_b, jaccard_sim (>= tau).

    S-curve: 16 bands x 4 rows. At s=tau=0.9 the miss probability is
    (1 - 0.9^4)^16 ~= 4e-8 (so the verified output equals the exact
    pair set the oracle computes); at s=0.2 the candidate probability
    is 1-(1-0.2^4)^16 ~= 2.5% — wider bands (e.g. 32x2) would pull in
    ~70% of ALL pairs as candidates and turn the verify stage back
    into O(n^2).

    The verify joins compare 64-bit-hashed shingle arrays, not the
    shingle strings: same Jaccard (64-bit collisions are negligible),
    far cheaper set intersection. Text goes to both LSH structures
    (hash array + band buckets) in ONE fused Arrow pass
    (shingle_features — see its docstring for the r8 measurement of
    why the fused vectorized-hash shape beats both the JVM
    higher-order-function formulation and the per-shingle-hash-call
    loop) computed once per doc behind a persist — the band explode
    and both verify sides reuse it. Docs with <n words get the
    empty-signature sentinel; they can only pair with each other and
    verify to jaccard 0.0 < tau, so correctness is unaffected.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    feats = register(
        docs.repartition(par)
            .select("doc_id",
                    shingle_features(3, n_perms, n_bands)("text")
                    .alias("f"))
            .select("doc_id", F.col("f.hs").alias("hs"),
                    F.col("f.buckets").alias("buckets")))
    bands = feats.select(
        "doc_id", F.posexplode("buckets").alias("band", "bucket"))
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    a = feats.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"))
    b = feats.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    return (
        cand.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b",
                jaccard(F.col("hs_a"), F.col("hs_b")).alias("jaccard_sim"))
        .where(F.col("jaccard_sim") >= tau)
    )


def ngram_jaccard_pairs(docs: DataFrame, tau: float = 0.9, n: int = 3) -> DataFrame:
    """C4: exact n-gram Jaccard pairs — the verifier / oracle
    baseline for C2.

    Candidates come from a PREFIX-FILTERED inverted-index self-join
    (AllPairs / PPJoin principle, Bayardo et al. WWW'07): order every
    doc's shingles rarest-first by global document frequency (ties by
    shingle value — a total order), and index only the first
    |A| - ceil(tau*|A|) + 1 of them. Any pair with J >= tau shares at
    least one shingle from BOTH prefixes — if the prefixes of A and B
    were disjoint, the intersection would be at most
    min(|A|,|B|) - prefix_len + ... < ceil(tau*max(|A|,|B|)), a
    contradiction — so completeness is provable, unlike an ad-hoc
    df cutoff. At tau=0.9 the index shrinks ~10x and the hottest
    ("of the and") shingles sort LAST, so they leave the index
    entirely: no near-quadratic posting-list block on common
    shingles. The exact jaccard then runs only on candidates; the
    equi-join shuffles on the shingle key — the plan shape that
    survives a 100x corpus."""
    sh = register(_shingle_sets(docs, n))
    inv = sh.select("doc_id", F.size("sh").alias("sz"),
                    F.explode("sh").alias("s"))
    dfreq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("s").asc())
    prefix = (
        inv.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(w))
        # prefix len = sz - ceil(tau*sz) + 1; the 1e-9 nudge makes any
        # float error err toward a LONGER prefix (safe) — a prefix one
        # short of the bound breaks completeness.
        .where(F.col("pos")
               <= F.col("sz")
               - F.ceil(F.lit(tau) * F.col("sz") - F.lit(1e-9)) + 1)
        .select("doc_id", "s")
    )
    cand = (
        prefix.alias("x").join(prefix.alias("y"), "s")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b",
                jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"))
        .where(F.col("jaccard_sim") >= tau)
    )


def simhash_chunks(col, n_chunks: int = 4) -> Column:
    """64-bit SimHash over distinct word tokens, returned as
    n_chunks x 16-bit ints (chunked for banded candidate joins).

    Token hashing stays JVM-side (xxhash64); the 64 bit-votes are one
    numpy broadcast per Arrow batch — the expression formulation ran
    64 interpreted aggregate folds per row."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bits_per = 64 // n_chunks

    def _sig(hs):
        def one(h):
            if len(h) == 0:
                return [0] * n_chunks
            hv = np.asarray(h, dtype=np.int64).astype(np.uint64)[:, None]
            bits = ((hv >> np.arange(64, dtype=np.uint64)) & np.uint64(1)) \
                .astype(np.int64)
            votes = (bits * 2 - 1).sum(axis=0)
            simbits = (votes > 0).astype(np.int64)
            weights = (1 << np.arange(bits_per, dtype=np.int64))
            return [int((simbits[c * bits_per:(c + 1) * bits_per] * weights).sum())
                    for c in range(n_chunks)]
        return hs.map(one)

    _sig.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    sig = pandas_udf(_sig, "array<bigint>")
    toks = F.array_distinct(words(col))
    return sig(F.transform(toks, lambda t: F.xxhash64(t)))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """C3: SimHash near-dup pairs. Candidates must share one of the 4
    16-bit chunks (pigeonhole: <=3 flipped bits leave >=1 of 4 chunks
    intact), then exact hamming distance filters. Output: doc_a,
    doc_b, hamming."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sig = docs.repartition(par).select(
        "doc_id", simhash_chunks("text").alias("chunks"))
    chunked = sig.select(
        "doc_id", "chunks",
        F.explode(
            F.transform(F.sequence(F.lit(0), F.lit(3)),
                        lambda i: F.struct(
                            i.alias("ci"),
                            F.element_at(F.col("chunks"), (i + 1).cast("int")).alias("cv")))
        ).alias("c"),
    ).select("doc_id", "chunks", "c.ci", "c.cv")
    hamming = F.aggregate(
        F.zip_with(F.col("x.chunks"), F.col("y.chunks"),
                   lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v,
    )
    return (
        chunked.alias("x")
        .join(chunked.alias("y"), ["ci", "cv"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
                hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def incremental_dedup(batch: DataFrame, corpus: DataFrame,
                      tau: float = 0.9, n: int = 3) -> DataFrame:
    """C38: dedup a NEW document batch against an EXISTING corpus —
    the daily-ingest shape: at 100 TB you cannot re-dedup the whole
    corpus per day, so only batch-vs-corpus comparisons are computed
    (never corpus-vs-corpus, and batch-internal dedup is a separate,
    much smaller concern handled by C1/C2 on the batch alone).
    Output: batch docs that survive both stages (doc_id, lang).

    Stage 1 (exact): md5 of normalized text, left-anti join against
    the corpus's distinct hash set — one shuffle on the hash key (or
    zero with both sides bucketed by hash).
    Stage 2 (near-dup): cross-set AllPairs prefix filtering (same
    principle as ngram_jaccard_pairs, Bayardo et al. WWW'07, applied
    across two sets): shingles ordered rarest-first by document
    frequency computed over the UNION of both sides (any one total
    order shared by both sides preserves the completeness proof —
    for a pair with J >= tau the two prefixes must share a shingle),
    each side indexes only its prefix, candidates come from the
    prefix-prefix equi-join on the shingle key, and exact Jaccard
    verifies candidates only. The join shuffles on the shingle key;
    candidate volume stays near-linear because high-df shingles sort
    out of both prefixes.
    """
    norm_hash = F.md5(normalize("text"))
    corpus_hashes = corpus.select(norm_hash.alias("h")).distinct()
    # r16: surv is read twice (the shingle build AND the final
    # anti-join) and each read re-derived the corpus-wide DISTINCT
    # hash set — registered, stage 1 runs once instead of twice
    surv = register(batch.withColumn("h", norm_hash)
                    .join(corpus_hashes, "h", "left_anti")
                    .drop("h"))

    shb = register(_shingle_sets(surv, n))
    shc = register(_shingle_sets(corpus, n))
    inv_b = shb.select("doc_id", F.size("sh").alias("sz"),
                       F.explode("sh").alias("s"))
    inv_c = shc.select("doc_id", F.size("sh").alias("sz"),
                       F.explode("sh").alias("s"))
    # persisted: BOTH sides' prefix stages reference the shared df
    # order — without the cache the union-wide aggregation runs twice.
    # (r16 MEASURED REJECTION: folding the two prefix pipelines into
    # one side-tagged join+window — §2.4 exchange sharing — ran
    # 4.31 -> 5.47 s median in a 5-round interleaved A/B: the extra
    # cached materialization of the combined prefix frame serializes
    # what are here two INDEPENDENT parallel subtrees, and total
    # shuffled bytes are unchanged. Do not re-fold without beating
    # that A/B.)
    dfreq = register(
        inv_b.select("s").unionAll(inv_c.select("s"))
             .groupBy("s").agg(F.count(F.lit(1)).alias("df")))

    def prefix(inv):
        w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(),
                                                 F.col("s").asc())
        return (inv.join(dfreq, "s")
                .withColumn("pos", F.row_number().over(w))
                .where(F.col("pos")
                       <= F.col("sz")
                       - F.ceil(F.lit(tau) * F.col("sz") - F.lit(1e-9)) + 1)
                .select("doc_id", "s"))

    cand = (
        prefix(inv_b).alias("x").join(prefix(inv_c).alias("y"), "s")
        .select(F.col("x.doc_id").alias("bid"), F.col("y.doc_id").alias("cid"))
        .distinct()
    )
    a = shb.select(F.col("doc_id").alias("bid"), F.col("sh").alias("sh_b"))
    b = shc.select(F.col("doc_id").alias("cid"), F.col("sh").alias("sh_c"))
    neardup = (
        cand.join(a, "bid").join(b, "cid")
        .where(jaccard(F.col("sh_b"), F.col("sh_c")) >= tau)
        .select(F.col("bid").alias("doc_id")).distinct()
    )
    return (surv.join(neardup, "doc_id", "left_anti")
            .select("doc_id", "lang"))


def incremental_dedup_bloom(batch: DataFrame, corpus: DataFrame,
                            m_bits: int = 1 << 20,
                            n_hashes: int = 5) -> DataFrame:
    """C85: exact-hash ingest admission with BOUNDED membership
    state — the approximate-membership variant of C38's stage-1
    anti-join (VERDICT r6/r7 stretch item).

    At 100 TB the "have we seen this exact document" ingest gate
    cannot shuffle every incoming doc against the corpus hash set
    per batch: the corpus side is billions of hashes and ~all batch
    docs are genuinely new. Here the corpus's distinct content
    hashes fold ONCE into an m-bit bloom bitmap (operators/bloom.py:
    the build exchange and driver collect are bounded by the BITMAP,
    m/64 bigint words, never the corpus cardinality), the bitmap
    broadcasts into a vectorized Arrow probe inside the batch's scan
    stage, and only bloom-POSITIVE docs (true re-ingests + the FP
    sliver, ~(1 - e^{-kn/m})^k of the batch) reach the exact
    confirm anti-join. Bloom negatives are admitted join-free.

    One-sided by construction: a hash in the corpus is NEVER
    bloom-negative, so admitted = (definite-new) + (maybe-seen that
    the exact join clears) == the exact anti-join's survivor set bit
    for bit — which is what the DuckDB oracle certifies, and why an
    aggressively small m_bits only costs confirm-join traffic, never
    correctness (pytest forces m_bits=1024 and checks equality).

    The probe key is the md5's leading 8 hex chars mod (2^31-1) —
    a 31-bit integer derived in pure JVM expressions, meeting
    bloom_positions' h < 2^31 contract; the bitmap is internal
    pruning state, so its hash never crosses engines.

    Output: admitted batch docs (doc_id, lang) — C38's stage-1
    contract. Near-dup admission stays C38's concern; chaining is
    incremental_dedup_bloom -> stage-2 of incremental_dedup.
    """
    from gcp_data_engineering_workshop_spark.functions.textfns import (
        KR_MOD)
    from gcp_data_engineering_workshop_spark.operators import bloom as BL

    norm_hash = F.md5(normalize("text"))
    # NULL-text docs hash to NULL; a NULL key never matches in an
    # anti-join, so the exact path ADMITS them — mirror that here:
    # keep NULLs out of the bloom build (bloom_positions' int math
    # would turn them into garbage indices in the Arrow probe) and
    # force _maybe=false for NULL-hash batch docs so they ride the
    # join-free admitted leg, doc-for-doc with the exact anti-join.
    corpus_hashes = register(
        corpus.select(norm_hash.alias("h"))
        .where(F.col("h").isNotNull()).distinct())
    probe_key = (F.conv(F.substring(F.col("h"), 1, 8), 16, 10)
                 .cast("bigint") % F.lit(KR_MOD))
    bitmap = BL.bloom_build(
        corpus_hashes.select(probe_key.alias("hk")), "hk",
        m_bits=m_bits, n_hashes=n_hashes)
    probe = BL.bloom_might_contain(bitmap, n_hashes)
    b = (batch.withColumn("h", norm_hash)
         .withColumn("_maybe", F.col("h").isNotNull() & probe(
             BL.bloom_positions(F.coalesce(probe_key, F.lit(0)),
                                m_bits, n_hashes))))
    fresh = b.where(~F.col("_maybe"))
    confirmed = (b.where(F.col("_maybe"))
                 .join(corpus_hashes, "h", "left_anti"))
    return (fresh.unionByName(confirmed)
            .select("doc_id", "lang"))


def containment_pairs(docs: DataFrame, tau: float = 0.9,
                      n: int = 3) -> DataFrame:
    """C83: shingle CONTAINMENT pairs (Broder 1997's second
    resemblance measure): C(src -> dst) = |S(src) ∩ S(dst)| /
    |S(src)| — ASYMMETRIC, so a short doc quoted wholesale inside a
    long one scores ~1.0 where Jaccard stays low; this is the
    doc-inside-doc / subsumption detector next to C4's symmetric
    near-dup. Ordered (doc_src, doc_dst) pairs, src != dst.

    Candidates use the one-sided prefix filter: C >= tau needs
    |∩| >= ceil(tau * |src|), so src must share a shingle among its
    sz - ceil(tau * sz) + 1 RAREST shingles (if the whole src prefix
    missed dst, |∩| <= ceil(tau*sz) - 1 — contradiction); dst
    indexes ALL its shingles. Probe-side prefix join, exact
    containment on candidates only — completeness is provable, and
    the hot boilerplate shingles sort out of the probe prefix
    exactly as in the C4 AllPairs filter. The DuckDB oracle uses
    the unfiltered shares-any-shingle candidate superset, so a
    green row certifies the filter dropped nothing."""
    sh = register(_shingle_sets(docs, n))
    inv = sh.select("doc_id", F.size("sh").alias("sz"),
                    F.explode("sh").alias("s"))
    dfreq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(),
                                             F.col("s").asc())
    prefix = (
        inv.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos")
               <= F.col("sz")
               - F.ceil(F.lit(tau) * F.col("sz") - F.lit(1e-9)) + 1)
        .select(F.col("doc_id").alias("doc_src"), "s")
    )
    full = sh.select(F.col("doc_id").alias("doc_dst"),
                     F.explode("sh").alias("s"))
    cand = (prefix.join(full, "s")
            .where(F.col("doc_src") != F.col("doc_dst"))
            .select("doc_src", "doc_dst")
            .distinct())
    a = sh.select(F.col("doc_id").alias("doc_src"),
                  F.col("sh").alias("sh_src"))
    b = sh.select(F.col("doc_id").alias("doc_dst"),
                  F.col("sh").alias("sh_dst"))
    cont = (F.size(F.array_intersect("sh_src", "sh_dst")).cast("double")
            / F.size("sh_src"))
    return (cand.join(a, "doc_src").join(b, "doc_dst")
            .select("doc_src", "doc_dst",
                    F.round(cont, 6).alias("containment"))
            .where(F.col("containment") >= tau))
