"""Bucketed-table co-located joins (SURVEY.md §4 / E-block).

At 100 TB the dominant cost of a fact-fact join is the shuffle. If
both tables are written bucketed (and sorted) by the join key with
the same bucket count, Spark's scan exposes the bucketing as a
partitioning, and the sort-merge join runs with ZERO exchanges — the
shuffle was paid once at write time and amortized over every
subsequent join. This is the batch counterpart of the streaming
state-store partitioning, and the standard layout for a fact table
that is joined on the same key daily.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: tuple[str, ...],
                   n_buckets: int = 8, sort: bool = True) -> None:
    """Materialize a table bucketed (and optionally sorted) by the
    join keys. Pays one shuffle now to never shuffle this join key
    again."""
    spark = df.sparkSession
    # A crashed prior run can leave the warehouse directory on disk
    # with no metastore entry; saveAsTable then fails with
    # LOCATION_ALREADY_EXISTS even in overwrite mode. Clear both.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = warehouse.removeprefix("file:") + "/" + table.lower()
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys; with equal
    bucket counts Catalyst plans a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
