"""Skew-resistant aggregation (SURVEY.md §4): two-phase salted
groupBy.

At 100 TB a handful of hot keys (one ticker, one user) can hold a
whole stage hostage: every row for the key lands in one reducer. The
fix is classic salting — phase 1 aggregates on (key, salt) so hot
keys fan out over N partitions; phase 2 merges the N partials per
key. Results are identical to a plain groupBy for any algebraic
aggregate (sum/count/min/max), which is exactly what the DuckDB
oracle checks.

AQE's skew-join splitting handles the JOIN side of this problem
automatically; salting is the aggregation-side counterpart you still
own in plan design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(df: DataFrame, key: str, value: str,
                     n_salts: int = 16,
                     salt_source: Column | None = None) -> DataFrame:
    """Two-phase sum/count per key. ``salt_source`` must be a
    deterministic column expression (defaults to a hash of all
    columns via xxhash64 of the value) — rand() would break retries/
    speculative execution."""
    salt = (F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts))
            if salt_source is None else F.pmod(salt_source, F.lit(n_salts)))
    phase1 = (
        df.select(F.col(key), F.col(value), salt.alias("_salt"))
        .groupBy(key, "_salt")
        .agg(F.sum(F.col(value)).alias("_psum"),
             F.count(F.lit(1)).alias("_pcnt"))
    )
    return (
        phase1.groupBy(key)
        .agg(F.sum("_psum").alias("total"),
             F.sum("_pcnt").alias("n_rows"))
    )


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                n_salts: int = 16, how: str = "inner",
                salt_source: Column | None = None) -> DataFrame:
    """Replicate-and-salt join for skewed keys when the build side
    is too large to broadcast (the regime where AQE's skew split
    still leaves one straggler sorting a hot key's whole run):
    every fact row gets a deterministic salt in [0, n_salts); the
    dim side is replicated once per salt via an exploded literal
    array; the join key becomes (key, salt), so a hot key's rows
    spread over n_salts reducers instead of one.

    Results are IDENTICAL to the plain join: each fact row meets
    exactly the replicas carrying its own salt — i.e. every
    matching dim row exactly once — for inner and left joins alike
    (a left-side miss is still a miss under every salt). The dim
    side pays an n_salts-fold replication through the exchange,
    which is the explicit, bounded price for removing the unbounded
    hot-key straggler; choose n_salts ~ the skew factor, not the
    cluster size.

    The salt must be deterministic (default: xxhash64 over all fact
    columns) — rand() breaks task retries and speculation."""
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in fact.columns])
    f = fact.withColumn("_salt", F.pmod(salt_source, F.lit(n_salts))
                        .cast("int"))
    d = dim.withColumn("_salt", F.explode(F.array(
        *[F.lit(i) for i in range(n_salts)])))
    return f.join(d, [on, "_salt"], how).drop("_salt")
