"""Distributed BPE vocabulary training (SURVEY.md §2 C68).

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) is THE
tokenizer-training step of an LLM data pipeline, and its hot loop is
embarrassingly aggregate-shaped: each merge round needs one global
weighted count of adjacent symbol pairs and one argmax. The classic
implementation trains on the corpus's WORD-FREQUENCY dictionary, not
the raw corpus — so after a single corpus-wide (word -> freq)
aggregate, every round's working set is vocabulary-bounded (the
distinct-word table), which is what makes 100-TB-corpus BPE cheap:
the corpus is touched exactly once.

Round shape: explode adjacent pairs from the symbol arrays (weighted
by word freq, map-side combinable), groupBy pair -> sum, take the
single argmax row via TakeOrdered (count desc, then lexicographic
pair — the deterministic tiebreak), then apply the merge to the
symbol arrays with a pure-JVM left-to-right fold that reproduces
subword-nmt's scan exactly (a just-merged token never re-matches as
the LEFT element inside the same pass because merged != left
textually). n_merges driver-synchronized rounds, each O(vocab).

No SQL oracle: applying a merge needs a list-building fold, which
DuckDB lambdas cannot express — declared rows-only; a pytest proves
EXACT equality of the learned merge table against an independent
pure-Python subword-nmt-style reference on the same word counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.operators.cachepool import (
    register, release)


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus-wide (word, freq) aggregate — the only pass that
    ever touches the corpus."""
    from gcp_data_engineering_workshop_spark.functions import textfns as T

    return (docs.select(F.explode(T.words(text_col)).alias("word"))
            .where(F.length("word") > 0)
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _apply_merge(sy, a: str, b: str):
    """Left-to-right merge of adjacent (a, b) -> a+b in a symbol
    array: fold that replaces the accumulator's last element when it
    equals ``a`` and the incoming symbol equals ``b``. Matches the
    subword-nmt scan: after a merge the cursor moves past the merged
    token (here: merged == a+b can never equal ``a``, so it never
    re-matches as the left element)."""
    return F.aggregate(
        sy, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(s))))


def bpe_train(freqs: DataFrame, n_merges: int = 10,
              min_count: int = 2) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) frame.
    Returns [(rank, left, right, merged, pair_count), ...]; stops
    early when the best pair's weighted count drops below
    ``min_count`` (merging hapax pairs only memorizes noise)."""
    cur = register(freqs.select("freq", F.split("word", "").alias("sy")))
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for i in range(n_merges):
            pairs = (cur.where(F.size("sy") >= 2)
                     .select("freq", F.explode(F.expr(
                         "transform(sequence(0, size(sy) - 2), "
                         "j -> struct(sy[j] AS a, sy[j+1] AS b))"))
                         .alias("p"))
                     .groupBy("p.a", "p.b")
                     .agg(F.sum("freq").alias("cnt")))
            # TakeOrdered: bounded O(1) driver rows, never a full sort
            top = pairs.orderBy(F.col("cnt").desc(), "a", "b") \
                .limit(1).collect()
            if not top or top[0].cnt < min_count:
                break
            a, b, cnt = top[0].a, top[0].b, int(top[0].cnt)
            merges.append((i + 1, a, b, a + b, cnt))
            nxt = register(
                cur.select("freq", _apply_merge(F.col("sy"), a, b)
                           .alias("sy")))
            # materialize the round's frame so the next round's pair
            # count reads the cache instead of re-folding every prior
            # merge (lineage otherwise grows one fold per round)
            nxt.count()
            release(cur)
            cur = nxt
    finally:
        release(cur)
    return merges
