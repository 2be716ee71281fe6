"""Batch demo: the reference pipeline + training-data preprocessing
end-to-end, writing BigQuery-shaped output partitioned by day.

Run: python examples/run_batch_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.session import get_spark
from gcp_data_engineering_workshop_spark.plans import stock_pipeline as sp
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp
from gcp_data_engineering_workshop_spark.sources.formats import write_partitioned_parquet


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("batch-demo")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="stock_batch_")

    # 1. the full reference-pipeline analog, partitioned sink
    result = sp.full_pipeline(spark, sf_dir) \
        .withColumn("day", F.to_date("window_timestamp"))
    write_partitioned_parquet(result, f"{out}/stock_analysis", ("day",))
    print(f"stock_analysis: {spark.read.parquet(f'{out}/stock_analysis').count()} "
          f"window rows -> {out}/stock_analysis (partitioned by day)")
    sp.dash_detail(spark, sf_dir).show(5, truncate=False)

    # 2. the training-data preprocessing pipeline
    corpus = tp.clean_corpus(spark, sf_dir)
    write_partitioned_parquet(corpus, f"{out}/clean_corpus", ("split",))
    kept = spark.read.parquet(f"{out}/clean_corpus")
    n_train = kept.where(F.col("split") == "train").count()
    print(f"clean_corpus: kept {kept.count()} docs ({n_train} train)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
