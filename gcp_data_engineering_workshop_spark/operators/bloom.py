"""Distributed Bloom filter for membership pruning at corpus scale.

Decontamination (C30) broadcasts the eval side's exact shingle set;
at 100 TB a full eval-suite shingle inventory can reach tens of GB —
too large to broadcast, while a plain shuffle join would move EVERY
corpus shingle across the wire just to discard ~all of them. The
bloom path keeps the corpus map-local:

- BUILD is distributed and bounded by the BITMAP, never the key set:
  each eval key emits its k probe positions (pure JVM integer
  expressions on the cross-engine Karp-Rabin hash), positions fold
  map-side into (word_idx, bits) partials, and one tiny exchange
  bit_or-combines them to <= m/64 bigint words collected at the
  driver. 2^24 bits = 2 MB regardless of how many keys went in.
- PROBE broadcasts the bitmap into a vectorized Arrow UDF (one
  gather + shift per batch), so corpus-side pruning happens inside
  the scan stage with zero shuffle.
- One-sided by construction: a member is never pruned, so after the
  (now tiny) exact confirm join the result equals the broadcast-set
  plan bit for bit — which is exactly what the DuckDB oracle
  certifies for decontaminate_bloom.

False-positive sliver ~ (1 - e^{-kn/m})^k of the corpus shingles
survives to the confirm join; with m sized ~16n and k=5 that is
<1e-4 — the confirm join's left side is true hits plus noise.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.functions.textfns import (
    KR_BASE, KR_MOD)


def bloom_positions(h: Column, m_bits: int, n_hashes: int) -> Column:
    """k Kirsch-Mitzenmacher probe positions from a 31-bit KR hash:
    pos_i = (h1 + i*h2) mod m with h2 a second KR-arithmetic mix.
    All bigint-safe (h < 2^31, i <= 8 => i*h2 < 2^35) and identical
    arithmetic replays in any engine."""
    h2 = (h * F.lit(KR_BASE) + F.lit(7)) % F.lit(KR_MOD)
    return F.array(*[
        ((h + F.lit(i) * h2) % F.lit(m_bits)).cast("bigint")
        for i in range(n_hashes)])


def bloom_build(keys: DataFrame, h_col: str, m_bits: int,
                n_hashes: int) -> np.ndarray:
    """Build the m-bit bitmap (as m/64 uint64 words) from a hash
    column. The groupBy key space is word indices (<= m/64 rows), so
    the exchange and the driver collect are bounded by the bitmap
    size — the key set's cardinality never reaches the driver."""
    rows = (
        keys.select(F.explode(
            bloom_positions(F.col(h_col), m_bits, n_hashes)).alias("pos"))
        .select(F.shiftrightunsigned("pos", 6).alias("w"),
                # pyspark's shiftleft() only takes a literal shift
                # count; the SQL form accepts a column
                F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"))
        .groupBy("w").agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bm = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in rows:
        bm[r["w"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return bm


def bloom_might_contain(bitmap: np.ndarray, n_hashes: int):
    """Vectorized Arrow probe: array<bigint> positions -> boolean.
    The bitmap rides the UDF closure (broadcast once per executor,
    MBs); per batch it is one fancy-gather + shift + reshape-all."""
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    words = bitmap

    def _probe(pos):
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        flat = pos.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        if flat.size != len(pos) * n_hashes:
            raise ValueError("bloom probe expects fixed-k position arrays")
        hit = (words[flat >> 6] >> (flat & 63).astype(np.uint64)) \
            & np.uint64(1)
        return pa.array(hit.reshape(-1, n_hashes).all(axis=1))

    _probe.__annotations__ = {"pos": pa.Array, "return": pa.Array}
    return arrow_udf(_probe, "boolean")


def bloom_mask(bitmap: np.ndarray, m_bits: int, n_hashes: int):
    """Vectorized per-element probe for an array<bigint> HASH column:
    returns array<boolean> aligned with the input list — used by the
    streaming twin, where the shingle array stays nested per doc so
    the plan remains stateless (no explode/re-group aggregation).
    Positions replay bloom_positions' exact integer arithmetic, so a
    bitmap built by bloom_build answers consistently."""
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    words = bitmap

    def _mask(hs):
        if isinstance(hs, pa.ChunkedArray):
            hs = hs.combine_chunks()
        flat = hs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        h2 = (flat * KR_BASE + 7) % KR_MOD
        ok = np.ones(flat.size, dtype=bool)
        for i in range(n_hashes):
            pos = (flat + i * h2) % m_bits
            ok &= ((words[pos >> 6] >> (pos & 63).astype(np.uint64))
                   & np.uint64(1)).astype(bool)
        off = pa.compute.subtract(hs.offsets, hs.offsets[0])
        return pa.ListArray.from_arrays(off, pa.array(ok))

    _mask.__annotations__ = {"hs": pa.Array, "return": pa.Array}
    return arrow_udf(_mask, "array<boolean>")
