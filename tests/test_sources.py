from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import formats as fmt
from gcp_data_engineering_workshop_spark.sources.ticks import ticks


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    d = str(tmp_path / "jsonl")
    src = ticks(spark, sf_dir)
    src.write.mode("overwrite").json(d)
    schema = ("ticker string, ts timestamp, price double, volume bigint, "
              "ai_sentiment double, ai_summary string")
    back = fmt.read_jsonl(spark, d, schema)
    assert back.count() == src.count()
    assert dict(back.dtypes)["ts"] == "timestamp"


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    d = str(tmp_path / "csv")
    src = ticks(spark, sf_dir).select("ticker", "price", "volume")
    src.write.mode("overwrite").option("header", "true").csv(d)
    back = fmt.read_csv(spark, d, "ticker string, price double, volume bigint")
    assert back.count() == src.count()
    assert back.agg(F.sum("volume")).collect()[0][0] == \
        src.agg(F.sum("volume")).collect()[0][0]


def test_partitioned_writer_prunes(spark, sf_dir, tmp_path):
    d = str(tmp_path / "part")
    src = ticks(spark, sf_dir)
    fmt.write_partitioned_parquet(src, d, ("ticker",))
    assert os.path.isdir(os.path.join(d, "ticker=click"))
    back = fmt.read_parquet(spark, d).where(F.col("ticker") == "click")
    # partition pruning: only the click directory is scanned
    assert "ticker=click" in back._jdf.queryExecution().executedPlan().toString() \
        or back.count() == src.where(F.col("ticker") == "click").count()


def test_parquet_projection_pushdown(spark, sf_dir):
    df = fmt.read_parquet(spark, f"{sf_dir}/lineitem.parquet",
                          ("l_orderkey", "l_quantity"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_extendedprice" not in plan  # pruned at the scan


def test_jsonl_malformed_records_quarantined(spark, tmp_path):
    """At-scale ingestion concern: malformed messages must be
    quarantined (PERMISSIVE + _corrupt_record), not fail the job."""
    d = str(tmp_path / "bad"); os.makedirs(d)
    with open(os.path.join(d, "part.json"), "w") as f:
        f.write('{"ticker": "A", "price": 1.5, "volume": 2}\n')
        f.write('not json at all\n')
        f.write('{"ticker": "B", "price": 2.5, "volume": 3}\n')
    schema = "ticker string, price double, volume bigint, _corrupt_record string"
    df = (spark.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(d))
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 2 and len(bad) == 1
    assert bad[0]._corrupt_record == "not json at all"
