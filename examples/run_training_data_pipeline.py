"""End-to-end training-data preprocessing demo: the full corpus
path a trainer runs before touching a GPU, composed entirely from
the oracle-verified operators.

  raw documents
    -> line-level boilerplate removal          (C39 line_dedup)
    -> substring (span) dedup removal          (C52 span_dedup_apply)
    -> eval-span surgical decontamination      (C77 decontaminate_spans)
    -> quality + repetition filtering          (C9 / C29, via the
                                                C76 one-pass bundle)
    -> perplexity tercile gate (keep head+mid)  (C71)
    -> trained quality classifier gate         (C59 quality_classifier)
    -> near-dup removal keeping the BEST copy  (C78 dedup_keep_best)
    -> semantic dedup over embeddings          (C55 semdedup_trained)
    -> benchmark decontamination               (C30)
    -> per-language temperature rebalancing    (C33)
    -> DSIR target-likeness selection          (C70)
    -> deterministic train/test split          (C16)
    -> global shuffle + shard assignment       (C73)
    -> tokenizer vocab + id application        (C18 / C42)
    -> sequence packing + dense example ids    (C34 / C35)

Run: python examples/run_training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.session import get_spark
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("training-data-demo")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="corpus_")

    scrubbed = tp.line_dedup(spark, sf_dir)
    span_clean = tp.span_dedup_apply(spark, sf_dir).select(
        "doc_id", "n_removed_words")
    classifier = tp.quality_classifier(spark, sf_dir).select(
        "doc_id", F.col("score").alias("clf_score"))
    quality = tp.quality_attributes(spark, sf_dir).select(
        "doc_id", "quality_score")
    ppl = tp.perplexity_buckets(spark, sf_dir).where(
        F.col("bucket") != "tail").select("doc_id")
    span_decon = tp.decontaminate_spans(spark, sf_dir).select(
        "doc_id", F.col("n_removed_words").alias("n_decon_words"))
    dsir = tp.dsir_select(spark, sf_dir).select("doc_id")
    repetition = tp.gopher_repetition(spark, sf_dir).select(
        "doc_id", "dup_word_frac")
    survivors = tp.dedup_keep_best(spark, sf_dir).select("doc_id")
    decontaminated = tp.decontaminate(spark, sf_dir).select("doc_id")
    # semantic layer: embeddings cluster (distributed Lloyd's), then
    # near-dup pairs are searched within clusters only; drop the
    # higher vec_id of each semantic-dup pair (doc_id == vec_id here)
    sem_keep = tp.semdedup_trained(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"))
    sampled = tp.temperature_sample(spark, sf_dir).select("doc_id")
    split = tp.train_test_split(spark, sf_dir).select("doc_id", "split")

    corpus = (
        scrubbed
        .join(span_clean, "doc_id")
        .join(quality, "doc_id").where(F.col("quality_score") >= 0.5)
        .join(classifier, "doc_id")
        .join(repetition, "doc_id").where(F.col("dup_word_frac") <= 0.5)
        .join(survivors, "doc_id")
        .join(decontaminated, "doc_id")
        .join(sem_keep, "doc_id", "left_semi")
        .join(ppl, "doc_id")
        .join(span_decon, "doc_id")
        .join(dsir, "doc_id", "left_semi")
        .join(sampled, "doc_id")
        .join(split, "doc_id")
        .join(tp.shuffle_corpus(spark, sf_dir)
              .select("doc_id", "shard_id", "pos_in_shard"), "doc_id")
    )
    corpus.write.mode("overwrite").parquet(f"{out}/clean_corpus")
    n = spark.read.parquet(f"{out}/clean_corpus").count()
    print(f"clean corpus: {n} docs -> {out}/clean_corpus")

    ids = tp.tokenize_ids(spark, sf_dir)
    packed = tp.pack_sequences(spark, sf_dir)
    examples = tp.assign_ids(spark, sf_dir)
    ids.write.mode("overwrite").parquet(f"{out}/token_ids")
    packed.write.mode("overwrite").parquet(f"{out}/packed")
    examples.write.mode("overwrite").parquet(f"{out}/examples")
    print(f"tokenized positions: {ids.count()}, "
          f"packed rows: {packed.count()}, examples: {examples.count()}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
