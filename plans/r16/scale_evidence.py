"""r16 scale-credibility table (VERDICT r15 #9): the top cost
C-block queries at x10 and x100 of the sf0.1 document corpus
(the probe's replica-suffixed, linear-by-construction corpus), one
cold pass per tier through the noop sink, exponent
log10(t_x100/t_x10) next to each. Writes
plans/r16/scale_evidence.json. Not part of the bench contract —
a measurement artifact (the txlog family builds from orders, so
it scales with SF, not with this corpus; its scale story is the
append_sliced/staged-write job profile instead)."""
import json
import os
import sys
import time
import math

sys.path.insert(0, "/root/repo")

from gcp_data_engineering_workshop_spark.session import get_spark
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp
from examples.scale_probe_r6 import build_docs_dir

QS = ["text_semdedup", "dedup_corpus", "span_dedup_keep_first",
      "bm25_topk", "dsir_select", "corpus_report", "dedup_incremental",
      "decontaminate_bloom", "gopher_repetition", "weighted_sample"]
QS = os.environ.get("SPARK_GRAFT_SCALE_ONLY", ",".join(QS)).split(",")


def main():
    spark = get_spark("scale_evidence_r16")
    dirs = {k: build_docs_dir(k) for k in (10, 100)}
    # warm the worker pool once (bench.py's pattern)
    tp.token_count(spark, dirs[10]).write.format("noop") \
        .mode("overwrite").save()
    out = {}
    for q in QS:
        row = {}
        try:
            _scale_one(spark, tp, dirs, q, row)
        except Exception as e:  # noqa: BLE001
            row["error"] = str(e)[:300]
        out[q] = row
        print(json.dumps({q: row}), flush=True)
    here = os.path.dirname(os.path.abspath(__file__))
    prior = {}
    pj = os.path.join(here, "scale_evidence.json")
    if os.path.exists(pj):
        prior = json.load(open(pj))
    prior.update(out)
    with open(pj, "w") as fh:
        json.dump(prior, fh, indent=1)
    spark.stop()


def _scale_one(spark, tp, dirs, q, row):
    if True:
        # equal-warmth (probe.py's r15 methodology): one untimed x10
        # pass per query so the timed passes measure SCALING, not
        # suite position / cold codegen
        getattr(tp, q)(spark, dirs[10]).write.format("noop") \
            .mode("overwrite").save()
        spark.catalog.clearCache()
        for k in (10, 100):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{q}@x{k}")
            t0 = time.time()
            getattr(tp, q)(spark, dirs[k]).write.format("noop") \
                .mode("overwrite").save()
            row[f"t_x{k}"] = round(time.time() - t0, 2)
        row["exp_10_100"] = round(
            math.log10(row["t_x100"] / row["t_x10"]), 3)


if __name__ == "__main__":
    main()
