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


def read_orc(spark: SparkSession, path: str,
             columns: tuple[str, ...] | None = None) -> DataFrame:
    """E8: ORC reader — same pushdown/pruning properties as parquet
    (predicate pushdown + column projection reach the stripe reader).
    """
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """E8: ORC writer (zlib default)."""
    df.write.mode(mode).orc(path)


def overwrite_partitions(df: DataFrame, path: str,
                         partition_by: tuple[str, ...]) -> None:
    """E9: DYNAMIC partition overwrite — replaces only the partitions
    present in `df`, leaving all other partitions untouched (the
    idempotent daily-backfill write: re-running one day never
    truncates the rest of the table). Static mode would drop every
    existing partition first."""
    (df.write.mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy(*partition_by)
       .parquet(path))


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """E10: binaryFile reader — the ingestion path for multimodal
    blobs (images/audio/video) into an opaque `content: binary`
    column with (path, modificationTime, length) metadata, feeding
    operators/multimodal.py. Spark parallelizes by file; pushdown on
    `length`/`path` prunes at listing time; pathGlobFilter prunes
    before any byte is read."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def observed(df: DataFrame, name: str, **metrics) -> tuple[DataFrame, "object"]:
    """E12: pipeline observability via the Observation API — named
    aggregate metrics (row counts, null counts, value invariants)
    collected as a SIDE EFFECT of whatever action runs the plan: no
    second scan, no separate monitoring query. At 100 TB a dedicated
    `count()` for data-quality checks doubles the read; observe()
    rides the existing pass. Works identically under streaming
    (df.observe + QueryProgress.observedMetrics).

    Returns (instrumented_df, observation); read
    `observation.get` after an action has materialized the frame."""
    from pyspark.sql import Observation
    obs = Observation(name)
    return df.observe(obs, *[v.alias(k) for k, v in metrics.items()]), obs


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_bytes: int = 128 * 1024 * 1024) -> int:
    """E14: small-file compaction — rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files. The silent 100-TB killer
    is the opposite direction: a streaming sink or over-parallel
    writer leaves millions of KB-sized files, and every downstream
    scan pays a task per file plus a listing that dwarfs the read.

    Sizing comes from the file listing (inputFiles + FS status), not
    a count() pass over the data. The rewrite uses coalesce(), not
    repartition(): shrinking the partition count is a narrow
    dependency — each output task reads a handful of input files
    directly, NO shuffle of the table. repartition() would be
    correct too but pays a full exchange for nothing unless the data
    also needs rebalancing. Returns the number of files written."""
    import math
    from urllib.parse import urlparse

    df = spark.read.parquet(src)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for uri in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(uri)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    n_out = max(1, math.ceil(total / target_bytes))
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    out = spark.read.parquet(dst)
    return len(out.inputFiles())


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """E15: schema-evolution read — mergeSchema unions the schemas
    of every file footer (an O(files) metadata pass, no data read),
    so a column added mid-stream appears table-wide with nulls for
    the old files. Off by default because footer-merging 100 TB of
    files per query is waste; turn it on at the READ that follows an
    evolution, then rewrite or register the unified schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_xml(spark: SparkSession, path: str, row_tag: str,
             schema: str | None = None) -> DataFrame:
    """E18: XML reader (Spark 4 built-in, the spark-xml lineage).
    Pass an explicit schema to skip the inference scan — at 100 TB an
    inference pass is a full extra read. XML has no predicate
    pushdown (row-tag framed text, like JSON-lines); partition
    parallelism comes from file splits, so feeds should land as many
    files, not one giant document."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str,
              root_tag: str = "rows", mode: str = "overwrite") -> None:
    """E18: XML writer — one <root_tag> document per partition file."""
    (df.write.mode(mode).format("xml")
     .option("rowTag", row_tag).option("rootTag", root_tag).save(path))
