"""Per-round 100x scale-regression probe (VERDICT r6 #7).

sf0.1 bench cannot see wire-amplification bugs: r6's semdedup
pathology (O(pairs x dim) join rows, ~1 TB at 500k docs) benched a
healthy 4.96s at sf0.1 and only surfaced at the 100x tier. This
harness makes that tier part of the per-round regression contract:
a fixed panel of heavy operator families runs ONE cold pass at x10
and x100 (replica-suffixed corpus, linear-by-construction — see
examples/scale_probe_r6.py for the corpus contract), and the decade
exponent log10(t100/t10) lands in PROBE_r{N}.json next to BENCH.

Regression rule (documented in BASELINE.md): an exponent jump of
MORE THAN +0.2 vs the previous round's PROBE file for the same
query is a scale regression — treat it like a red correctness row:
find the plan change, fix or revert. Exponents jitter a few
hundredths run-to-run; +0.2 is a plan-shape change, not noise.

Usage: python probe.py [round_number]
  writes PROBE_r{N}.json (default: next after the largest existing)
  SPARK_GRAFT_PROBE_ONLY=a,b  limit to named panel queries
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcp_data_engineering_workshop_spark.session import get_spark
from gcp_data_engineering_workshop_spark.plans import textpipeline as tp

from examples.scale_probe_r6 import build_docs_dir  # corpus builder

# The panel: one representative per heavy family — semantic dedup
# (k-means + per-cluster GEMM + CC), shingle dedup (LSH + CC +
# keep-best), the span/fingerprint family, lexical retrieval, and
# importance selection. Broad plan coverage, ~6-8 min total.
PANEL = [
    ("text_semdedup", tp.text_semdedup),
    ("dedup_corpus", tp.dedup_corpus),
    ("span_dedup_keep_first", tp.span_dedup_keep_first),
    ("bm25_topk", tp.bm25_topk),
    ("dsir_select", tp.dsir_select),
]

SCALES = (10, 100)


def main() -> None:
    if len(sys.argv) > 1:
        rnd = int(sys.argv[1])
    else:
        done = [int(m.group(1)) for f in glob.glob("PROBE_r*.json")
                if (m := re.search(r"PROBE_r(\d+)\.json", f))]
        rnd = (max(done) + 1) if done else 7
    out_path = f"PROBE_r{rnd:02d}.json"

    spark = get_spark("probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {k: build_docs_dir(k) for k in SCALES}
    only = {s for s in os.environ.get(
        "SPARK_GRAFT_PROBE_ONLY", "").split(",") if s}

    results: dict[str, dict] = {}
    for name, fn in PANEL:
        if only and name not in only:
            continue
        row: dict = {}
        for k in SCALES:
            t0 = time.monotonic()
            row[f"rows_x{k}"] = fn(spark, dirs[k]).count()  # cold pass
            row[f"t_x{k}"] = round(time.monotonic() - t0, 3)
            spark.catalog.clearCache()
        row["exp_10_100"] = round(
            math.log10(row["t_x100"] / row["t_x10"]), 3)
        results[name] = row
        print(f"## {name}: {row}", flush=True)

    # compare against the previous round's probe, if present
    prev_files = sorted(f for f in glob.glob("PROBE_r*.json")
                        if f != out_path)
    regressions = []
    if prev_files:
        prev = json.load(open(prev_files[-1]))
        for name, row in results.items():
            p = prev.get("results", {}).get(name)
            if p and row["exp_10_100"] - p["exp_10_100"] > 0.2:
                regressions.append(
                    {"query": name, "prev_exp": p["exp_10_100"],
                     "exp": row["exp_10_100"], "prev_file": prev_files[-1]})
    blob = {"round": rnd, "scales": list(SCALES),
            "results": results, "regressions": regressions}
    json.dump(blob, open(out_path, "w"), indent=1)
    print(json.dumps(blob))
    if regressions:
        print(f"SCALE REGRESSION: {regressions}", file=sys.stderr)
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
