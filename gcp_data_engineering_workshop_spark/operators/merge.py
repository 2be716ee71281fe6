"""MERGE / upsert batch operator (warehouse-style UPSERT semantics).

The reference sinks with WRITE_APPEND (pipeline.py:130); real
pipelines eventually need MERGE: apply a batch of keyed updates to a
target (update matched rows, insert unmatched). Without a table
format that supports row-level MERGE, the scalable Spark formulation
is a full-outer join on the key with column-wise coalesce — one
shuffle on the key, no driver-side row handling, and the same plan
shape AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: list[str]) -> DataFrame:
    """UPSERT: rows in `updates` replace matching `target` rows on
    `keys`; unmatched update rows are inserted; unmatched target rows
    pass through. Both sides must share a schema."""
    cols = [c for c in target.columns if c not in keys]
    u = updates.select(*keys, *[F.col(c).alias(f"_u_{c}") for c in cols])
    joined = target.join(u, keys, "full_outer")
    out_cols = [F.col(k) for k in keys] + [
        F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c) for c in cols]
    return joined.select(*out_cols)
