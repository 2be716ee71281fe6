"""Capture .explain('formatted') for r16 target queries into
plans/r16/<query>_<tag>.txt. Usage:
    python plans/r16/capture_plans.py before [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "text_semdedup", "embed_docs", "span_dedup_stats",
    "span_dedup_apply", "span_dedup_keep_first", "decontaminate_spans",
    "longest_dup_span", "winnow_fingerprints", "dsir_select",
    "dedup_corpus", "dedup_keep_best", "corpus_report",
    "decontaminate_bloom", "train_test_split", "shuffle_corpus",
    "temperature_sample", "weighted_sample", "sample_corpus",
    "assign_ids", "domain_cap", "pack_sequences", "stratified_split",
    "mixture_schedule", "contamination_report",
]


def main() -> None:
    import __spark_entry__ as entry
    from gcp_data_engineering_workshop_spark.session import get_spark

    tag = sys.argv[1]
    targets = sys.argv[2:] or DEFAULT
    spark = get_spark("plans_r16")
    qs = entry.queries()
    outdir = os.path.dirname(os.path.abspath(__file__))
    for name in targets:
        import contextlib
        import io

        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {e!r}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
