"""Count-min sketch: mergeable bounded-memory frequency counters
(SURVEY.md §2 C31; §7.10 "count-min heavy-hitters with mergeable
state").

Why a sketch when groupBy(token).count() is exact: at 100 TB the
distinct-token table is billions of rows, so the exact count is a
vocab-cardinality shuffle with a heavy-tailed key distribution, and
answering ONE MORE frequency question later means re-scanning the
corpus. The count-min sketch replaces that with a d x w integer
grid (here 4 x 1024 = 4096 cells):

- the build is a groupBy on (r, bucket) whose key space is FIXED at
  d*w regardless of corpus size — map-side partial aggregation
  collapses every partition to <= 4096 rows before the exchange, so
  the shuffle is bounded and skew-free by construction;
- sketches are mergeable state: the sketch of a union of corpus
  shards (or of successive stream micro-batches) is the cell-wise
  SUM of their sketches — pytest-proven exact here — so shards or
  days can be sketched independently and combined without touching
  raw tokens again;
- point queries (est(t) = min_r cells[r][bucket_r(t)]) run against a
  broadcast of the 4096-row grid, never against the corpus, and the
  classic guarantee holds: est >= true always, est <= true + eps*N
  with prob 1 - delta for w = ceil(e/eps), d = ceil(ln(1/delta)).

Token hashing is the repo's engine-neutral Karp-Rabin fold
(functions/textfns.py:61) computed in one Arrow-batched pass with a
per-batch memo (tokens repeat heavily, so the cache hit-rate is the
1 - vocab/corpus ratio); the d row hashes derive from it with pure
bigint codegen ((h*a_r + b_r) % P % w), so the DuckDB oracle can
replay the whole sketch bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.functions.textfns import KR_MOD

CM_DEPTH = 4
CM_WIDTH = 1024
# Public-domain LCG multiplier/increment pairs as the d pairwise
# hash parameters; every (h*a + b) stays < 2^62, so the arithmetic
# never overflows a bigint in either engine.
CM_A = [1103515245, 69069, 1664525, 214013]
CM_B = [12345, 362437, 1013904223, 2531011]


def kr_hash_pandas():
    """Arrow-batched Karp-Rabin hash (exact integer parity with
    textfns.kr_hash / the oracle's list_reduce; the expression-tree
    fold is interpreted per character and measured ~20x slower)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = KR_MOD

    def _hash_batch(toks):
        cache: dict[str, int] = {}
        out = []
        for t in toks:
            v = cache.get(t)
            if v is None:
                h = 0
                for ch in t:
                    h = (h * 31 + ord(ch)) % P
                cache[t] = v = h
            out.append(v)
        return pd.Series(out, dtype="int64")

    _hash_batch.__annotations__ = {"toks": pd.Series, "return": pd.Series}
    return pandas_udf(_hash_batch, "bigint")


def _row_buckets(h: Column) -> Column:
    """All d row-buckets of a pre-hashed key, as one array (pure
    bigint codegen — no Python past the shared KR hash)."""
    return F.array(*[
        ((h * F.lit(CM_A[r]).cast("bigint") + F.lit(CM_B[r]).cast("bigint"))
         % KR_MOD) % CM_WIDTH
        for r in range(CM_DEPTH)
    ])


def cm_build(items: DataFrame, col: str) -> DataFrame:
    """Build the sketch grid from an item stream: one occurrence per
    input row. Output (r, bucket, cnt) — at most d*w rows total, and
    at most d*w rows PER PARTITION cross the wire (map-side combine
    on a fixed key space)."""
    kr = kr_hash_pandas()
    return (
        items.select(_row_buckets(kr(F.col(col))).alias("_bks"))
        .select(F.posexplode("_bks").alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Mergeable-state property: the sketch of a union of inputs is
    the cell-wise sum of per-input sketches."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(candidates: DataFrame, col: str,
                sketch: DataFrame) -> DataFrame:
    """Point-query the sketch for each candidate key: est is the min
    over the d cells the key hashes to. The grid (<= 4096 rows) is
    broadcast, so this never shuffles the candidate side."""
    kr = kr_hash_pandas()
    probes = (
        candidates.select(F.col(col),
                          _row_buckets(kr(F.col(col))).alias("_bks"))
        .select(col, F.posexplode("_bks").alias("r", "bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_count"))
    )


def cm_local_topk_candidates(items: DataFrame, col: str,
                             k_local: int = 200) -> DataFrame:
    """Stream-scale candidate generation for heavy hitters: the
    distinct-key table that feeds cm_estimate in the batch plan
    (heavy_hitters_cms) is itself unbounded — at web scale (or in a
    stream) "SELECT DISTINCT token" is the thing you can no longer
    afford. The classic fix: each partition keeps only its LOCAL
    top-k_local counts (one Counter pass over the partition's Arrow
    batches, NO shuffle of the raw keys), and the union of local
    winners — at most k_local x partitions rows — is the candidate
    set. A key with global share s has expected share s in every
    hash partition, so true heavy hitters are locally heavy
    everywhere; only keys near the k_local boundary can flicker,
    and the CMS estimate (not the local count) still ranks the
    final top-k. The only shuffle in the candidate path is the
    dedup of the tiny winner union."""
    import pandas as pd

    def local_top(batches):
        from collections import Counter
        c: Counter = Counter()
        for pdf in batches:
            c.update(pdf[col])
        yield pd.DataFrame({col: [k for k, _ in c.most_common(k_local)]})

    return items.mapInPandas(local_top, f"{col} string").distinct()
