"""Z-order (Morton) data layout for multi-dimensional scan pruning.

At 100 TB a table is pruned or it is scanned. Sorting on ONE column
gives parquet min/max stats (row-group and file skipping) on that
column only; a second dimension's values spray across every file and
its predicates prune nothing. Z-ordering interleaves the bit
patterns of two (or more) key columns into a single Morton code and
range-partitions + sorts on it, so every output file covers a small
RECTANGLE of the key space — min/max footer stats become tight on
ALL interleaved dimensions at once, and a conjunctive range
predicate skips most files/row-groups before any IO. This is the
layout trick behind Delta/Iceberg OPTIMIZE ZORDER BY, built here
from public bit arithmetic.

Everything is pure JVM integer expressions (whole-stage codegen, no
Python crossing), and the code arithmetic — min/max scaling to a
fixed grid, then bit interleave — replays verbatim in DuckDB, so
the code column itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative ints already scaled to
    [0, 2^bits): bit i of ``a`` lands at position 2i, bit i of ``b``
    at 2i+1. Pure shift/and/or terms — one codegen'd expression."""
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = (out
               .bitwiseOR(F.shiftleft(
                   F.shiftrightunsigned(a.cast("bigint"), i)
                   .bitwiseAND(F.lit(1)), 2 * i))
               .bitwiseOR(F.shiftleft(
                   F.shiftrightunsigned(b.cast("bigint"), i)
                   .bitwiseAND(F.lit(1)), 2 * i + 1)))
    return out


def scale_to_grid(c: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Map [lo, hi] to the [0, 2^bits) grid with exact bigint
    arithmetic: floor((x - lo) * (2^bits - 1) / (hi - lo)). lo/hi
    are data min/max computed once (a bounded 1-row agg) and baked
    into the plan as literals — the same numbers parameterize the
    oracle SQL."""
    top = (1 << bits) - 1
    span = max(hi - lo, 1)
    return F.floor((c.cast("bigint") - F.lit(lo)) * F.lit(top)
                   / F.lit(span)).cast("bigint")


def zorder_code(df: DataFrame, col_a: str, col_b: str,
                bits: int = 16) -> tuple[Column, tuple[int, int, int, int]]:
    """Z-order code expression for two integer columns of ``df``,
    plus the (lo_a, hi_a, lo_b, hi_b) bounds used — the bounds are
    one bounded 4-value agg (O(1) driver data) and are returned so
    callers (and the oracle) can reproduce the exact arithmetic."""
    r = df.agg(F.min(col_a), F.max(col_a),
               F.min(col_b), F.max(col_b)).collect()[0]
    lo_a, hi_a, lo_b, hi_b = int(r[0]), int(r[1]), int(r[2]), int(r[3])
    code = interleave_bits(
        scale_to_grid(F.col(col_a), lo_a, hi_a, bits),
        scale_to_grid(F.col(col_b), lo_b, hi_b, bits), bits)
    return code, (lo_a, hi_a, lo_b, hi_b)


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 8, bits: int = 16) -> None:
    """Write ``df`` as parquet clustered by the Morton code of
    (col_a, col_b): repartitionByRange on the code splits the curve
    into contiguous segments (one shuffle, range exchange), and
    sortWithinPartitions orders rows inside each file so parquet
    ROW-GROUP stats are tight too, not just file-level ones. The
    helper column is dropped before writing — layout is a physical
    property, not a schema change."""
    code, _ = zorder_code(df, col_a, col_b, bits)
    (df.withColumn("_z", code)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))


def file_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per-file (min, max) footer stats for ``cols`` of a parquet
    directory — what a file-skipping catalog (Delta/Iceberg) indexes
    and what the pruning test asserts on. Reads only footers."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        schema_names = md.schema.to_arrow_schema().names
        stats = {c: [None, None] for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                cname = schema_names[ci] if ci < len(schema_names) else None
                if cname in stats and col.statistics is not None:
                    s = col.statistics
                    lo, hi = stats[cname]
                    stats[cname] = [
                        s.min if lo is None else min(lo, s.min),
                        s.max if hi is None else max(hi, s.max)]
        out.append({"file": name, **{c: tuple(v) for c, v in stats.items()}})
    return out


def prune_files(path: str, box: dict[str, tuple[int, int]]
                ) -> tuple[list[str], int]:
    """File-skipping from footers — the read-side half of Z-order
    (what a Delta/Iceberg manifest does before any data IO): keep
    only files whose per-column (min, max) footer range INTERSECTS
    every predicate range in ``box``. Returns (kept absolute paths,
    total data files). Skipping is conservative (footer ranges are
    supersets of file contents), so pruning never loses a row —
    correctness is independent of layout; the LAYOUT is what makes
    the kept set small on conjunctive boxes."""
    import os

    ranges = file_ranges(path, list(box))
    kept = []
    for fr in ranges:
        hit = True
        for c, (lo, hi) in box.items():
            fmin, fmax = fr[c]
            if fmin is None or fmax is None:
                continue  # no stats -> cannot skip
            if fmax < lo or fmin > hi:
                hit = False
                break
        if hit:
            kept.append(os.path.join(path, fr["file"]))
    return kept, len(ranges)


def read_pruned(spark, path: str, box: dict[str, tuple[int, int]]):
    """Scan a (z-ordered) parquet directory under a conjunctive box
    predicate with BOTH pruning levels a lakehouse reader applies:
    footer-based FILE skipping (prune_files — only surviving files
    are even opened) and Spark's own row-group skipping from the
    pushed filters within them. The residual ``where`` keeps
    exactness on whatever the footers could not exclude."""
    files, _ = prune_files(path, box)
    if not files:
        schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(*files)
    for c, (lo, hi) in box.items():
        df = df.where((F.col(c) >= lo) & (F.col(c) <= hi))
    return df


def interleave_bits_n(cols: list[Column], bits: int = 16) -> Column:
    """N-dimensional Morton interleave: bit i of dimension d lands at
    position i*n + d, so equal bit-prefixes still describe hypercubes
    of the key space. With n=2 this places bits exactly like
    interleave_bits. The result needs n*bits <= 63 total bits
    (e.g. 3 dims x 16 bits = 48)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} dims x {bits} bits exceeds a bigint")
    out = F.lit(0).cast("bigint")
    for d, c in enumerate(cols):
        for i in range(bits):
            out = out.bitwiseOR(F.shiftleft(
                F.shiftrightunsigned(c.cast("bigint"), i)
                .bitwiseAND(F.lit(1)), i * n + d))
    return out


def write_zordered_n(df: DataFrame, path: str, cols: list[str],
                     n_files: int = 8, bits: int = 16) -> None:
    """N-dimensional write_zordered: min/max bounds for every
    dimension come from ONE bounded 2n-value agg, each key scales to
    the shared grid, and the layout clusters on the n-dim Morton
    code. bits defaults shrink to fit 63 total bits."""
    bits = min(bits, 63 // len(cols))
    r = df.agg(*[f for c in cols
                 for f in (F.min(c), F.max(c))]).collect()[0]
    scaled = [scale_to_grid(F.col(c), int(r[2 * i]), int(r[2 * i + 1]),
                            bits)
              for i, c in enumerate(cols)]
    (df.withColumn("_z", interleave_bits_n(scaled, bits))
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))


def compact_parquet(spark, path: str, out_path: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    sort_cols: list[str] | None = None) -> int:
    """E20: small-file compaction — the lakehouse maintenance job
    (Delta OPTIMIZE / Iceberg rewrite_data_files): coalesce a
    directory of small parquet files into ceil(total_bytes /
    target_bytes) files, optionally re-sorting within files to
    restore clustering (pass the z-order/sort columns). Returns the
    output file count.

    Scale notes: the file count derives from FOOTER-level sizes (no
    data read to plan), the rewrite is one repartition (or
    repartitionByRange when re-sorting — keeps files range-disjoint
    so footer pruning still works) and small files are THE silent
    scan killer at 100 TB: a 10k-file day-partition with 1 MB files
    pays 10k open/seek/footer costs per query until compacted."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet"))
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    if sort_cols:
        df = (df.repartitionByRange(n_out, *[F.col(c) for c in sort_cols])
              .sortWithinPartitions(*sort_cols))
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_path)
    return sum(1 for f in os.listdir(out_path) if f.endswith(".parquet"))
