"""End-to-end training-data preprocessing demo: the full corpus
path a trainer runs before touching a GPU, composed entirely from
the oracle-verified operators.

  raw documents
    -> per-source data card committed to the   (C86 + E22)
       cards TABLE before anything runs
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
from gcp_data_engineering_workshop_spark.catalog import load_table
from gcp_data_engineering_workshop_spark.functions import textfns as TF
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp
from gcp_data_engineering_workshop_spark.sources import txlog as T


def _source_card(docs, ids=None):
    """The C86 card shape (source, n_docs, n_words_total,
    exact_dup_removable) over ``docs``, optionally restricted to
    the ``ids`` frame — the before/after commit payload. The
    contamination column is omitted: the AFTER corpus is
    decontaminated by construction, so the diff the auditor reads
    is size/mass/dup-removable per source."""
    if ids is not None:
        docs = docs.join(ids, "doc_id", "left_semi")
    return (docs.select(
                "source",
                F.size(TF.words("text")).alias("nw"),
                F.md5(F.coalesce(TF.normalize("text"), F.lit("")))
                 .alias("h"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("nw").cast("bigint").alias("n_words_total"),
                 (F.count(F.lit(1)) - F.countDistinct("h"))
                 .cast("bigint").alias("exact_dup_removable")))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None,
         out: str | None = None) -> dict:
    owns_session = spark is None
    if owns_session:
        spark = get_spark("training-data-demo")
        spark.sparkContext.setLogLevel("ERROR")
    out = out or tempfile.mkdtemp(prefix="corpus_")

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
    docs = load_table(spark, "documents", sf_dir)
    cards_root = f"{out}/data_cards"
    corpus_root = f"{out}/clean_corpus"

    # BEFORE: the raw per-source card is commit 1 of the cards table
    v_raw_card = T.append(
        _source_card(docs).withColumn("stage", F.lit("raw")),
        cards_root)

    # the corpus lands as ONE atomic commit — readers see the whole
    # clean corpus or nothing, and the commit is time-travelable
    v_corpus = T.append(corpus, corpus_root)
    landed = T.read(spark, corpus_root)
    n = landed.count()
    print(f"clean corpus: {n} docs -> txlog table {corpus_root} "
          f"(version {v_corpus})")

    # AFTER: the clean card computes over the LANDED snapshot (not
    # the in-flight plan) and commits as version 2 of the cards
    # table — `T.read(spark, cards_root, version=1)` vs version 2
    # is the auditor's before/after diff
    v_clean_card = T.append(
        _source_card(docs, landed.select("doc_id"))
        .withColumn("stage", F.lit("clean")),
        cards_root)

    ids = tp.tokenize_ids(spark, sf_dir)
    packed = tp.pack_sequences(spark, sf_dir)
    examples = tp.assign_ids(spark, sf_dir)
    ids.write.mode("overwrite").parquet(f"{out}/token_ids")
    packed.write.mode("overwrite").parquet(f"{out}/packed")
    examples.write.mode("overwrite").parquet(f"{out}/examples")
    print(f"tokenized positions: {ids.count()}, "
          f"packed rows: {packed.count()}, examples: {examples.count()}")
    result = {"out": out, "n_docs": n,
              "versions": {"raw_card": v_raw_card,
                           "corpus": v_corpus,
                           "clean_card": v_clean_card}}
    if owns_session:
        spark.stop()
    return result


if __name__ == "__main__":
    main(*sys.argv[1:])
