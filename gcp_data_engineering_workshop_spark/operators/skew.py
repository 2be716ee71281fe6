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
