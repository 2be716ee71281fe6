"""Batch sources/sinks (SURVEY.md §2 E1-E4).

Readers take explicit schemas (no inference pass over 100 TB) and
keep pushdown/pruning intact; the writer partitions output by the
columns downstream queries filter on, which is what turns a full
scan into partition pruning on the next read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str,
                 columns: tuple[str, ...] | None = None) -> DataFrame:
    """E1: parquet reader; optional projection so ReadSchema prunes
    at the scan."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """E2: JSON-lines reader with explicit DDL schema."""
    return spark.read.schema(schema).json(path)


def read_csv(spark: SparkSession, path: str, schema: str,
             header: bool = True, sep: str = ",") -> DataFrame:
    """E3: CSV reader with explicit DDL schema."""
    return (spark.read.schema(schema)
            .option("header", str(header).lower())
            .option("sep", sep)
            .csv(path))


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_by: tuple[str, ...],
                              mode: str = "overwrite") -> None:
    """E4: partitioned parquet writer (hive-style directories)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)
