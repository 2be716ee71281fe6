"""Lakehouse table-format tour: the full E22 user surface on one
hive-partitioned table — the workflow a data engineer runs against
a Delta-style table, composed entirely from the txlog layer
(sources/txlog.py; every op here is oracle- or pytest-verified):

  CREATE partitioned     append(partition_by=["o_orderstatus"])
  APPEND (inherits spec) append(...)
  PARTITION-PRUNED READ  read_where("o_orderstatus = 'F' AND ...")
  UPDATE ... WHERE       update_where(cond, {col: expr})
  DELETE ... WHERE       delete_where(cond)
  MERGE-ON-READ DML      delete_where/update_where(mode="dv")
                         -> optimize(purge=True) materializes
  ROW-LEVEL CDF          read_changes_rows() (_change_type tags)
  REPLICATION            replicate_incremental(src, dst, key)
  RENAME/DROP COLUMN     rename_column / drop_column (metadata-only)
  replaceWhere           overwrite_where(df, root, cond)
  GENERATED COLUMNS      append(generated={"bucket": "id % 7"})
  BLOOM INDEX            set_bloom_index -> point lookups open ~1 file
  MERGE (composite key)  merge_upsert(updates, ["k1", "k2"])
  OPTIMIZE [ZORDER BY]   optimize() / optimize(zorder=[...])
  TIME TRAVEL            read(version=N) / read(as_of=unix_ts)
  CHANGE FEED            read_changes(from_version=...)
  INCREMENTAL REFRESH    refresh_incremental(src, dst, fn)
  NATIVE SPARK FORMATS   df.write.format("txlog") /
                         spark.read.format("txlog") (pushed-filter
                         file skipping) / writeStream.format("txlog")
                         / refresh_stream(src, dst, fn)
  DESCRIBE / HISTORY     describe(root) / history(root)
  SHALLOW CLONE          clone(src, dst) — zero-copy, copy-on-write
  RESTORE                restore(root, N) / restore(as_of=ts)
  VACUUM                 vacuum(root, dry_run=True) first

Run: python examples/run_lakehouse_table.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.catalog import load_table
from gcp_data_engineering_workshop_spark.session import get_spark
from gcp_data_engineering_workshop_spark.sources import txlog as T


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    spark = spark or get_spark("lakehouse-table-demo")
    root = tempfile.mkdtemp(prefix="lakehouse_") + "/orders"
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

    # CREATE partitioned + a second append inheriting the spec
    T.append(orders.where(F.col("o_orderkey") % 2 == 0), root,
             partition_by=["o_orderstatus"])
    T.append(orders.where(F.col("o_orderkey") % 2 == 1), root)
    n0 = T.read(spark, root).count()

    # partition-pruned read: only the F partition's files open
    pruned = T.read_where(
        spark, root, "o_orderstatus = 'F' AND o_totalprice < 100000")
    n_pruned = pruned.count()

    # predicate UPDATE then DELETE (two-phase file finding; the
    # o_orderkey bounds are always populated, so neither no-ops)
    v_upd = T.update_where(
        spark, root, "o_orderkey <= 200",
        {"o_totalprice": "o_totalprice * 2"})
    v_del = T.delete_where(spark, root, "o_orderkey <= 100")

    # composite-key MERGE (file-granular through footer pruning)
    ups = (orders.where(F.col("o_orderkey") % 1000 == 0)
           .withColumn("o_totalprice", F.lit(0.0)))
    v_merge = T.merge_upsert(spark, root, ups,
                             ["o_orderkey", "o_custkey"])

    # OPTIMIZE: per-partition small-file compaction
    T.optimize(spark, root, target_bytes=64 << 20)
    detail = T.describe(root)

    # OPTIMIZE ZORDER BY on a second, unpartitioned copy: after the
    # Morton re-layout BOTH key dimensions' footer ranges prune
    zroot = tempfile.mkdtemp(prefix="lakehouse_") + "/z"
    T.append(T.read(spark, root)
             .select("o_orderkey", "o_custkey", "o_totalprice"),
             zroot)
    T.optimize(spark, zroot, target_bytes=4 << 10,
               zorder=["o_orderkey", "o_custkey"])
    zsnap = T.snapshot(zroot)
    zcand = T._files_possibly_matching(
        zsnap, T._parse_conjuncts(
            "o_orderkey >= 100 AND o_orderkey <= 400 "
            "AND o_custkey >= 10 AND o_custkey <= 120"))
    # INCREMENTAL REFRESH: an exactly-once downstream projection
    incr = tempfile.mkdtemp(prefix="lakehouse_") + "/incr"
    T.refresh_incremental(
        spark, zroot, incr,
        lambda d: d.where("o_totalprice > 100000")
        .select("o_orderkey", "o_totalprice"), app_id="demo")
    assert T.refresh_incremental(
        spark, zroot, incr, lambda d: d, app_id="demo") is None

    # TIME TRAVEL both ways + CHANGE FEED + RESTORE
    ts_created = T.history(root)[1]["ts"]
    n_at_create = T.read(spark, root, as_of=ts_created).count()
    feed_ops = sorted({
        r._commit_op for r in
        T.read_changes(spark, root, from_version=v_upd - 1,
                       to_version=v_merge)
        .select("_commit_op").distinct().collect()})
    T.restore(root, 2, spark=spark)          # back to CREATE+APPEND
    n_restored = T.read(spark, root).count()
    would = T.vacuum(root, retention_seconds=0, dry_run=True)
    removed = T.vacuum(root, retention_seconds=10 ** 9)  # keeps all

    # SHALLOW CLONE of the z-ordered copy: zero bytes move, DML on
    # the clone never touches the source
    croot = tempfile.mkdtemp(prefix="lakehouse_") + "/clone"
    T.clone(zroot, croot)
    n_src = T.read(spark, zroot).count()
    T.delete_where(spark, croot, "o_orderkey <= 300")
    assert T.read(spark, zroot).count() == n_src

    # DELETION VECTORS (merge-on-read): mark rows deleted/updated
    # in a positional sidecar instead of rewriting data files —
    # here against files the clone still SHARES with its source
    # (zero copies, the source never notices) — then OPTIMIZE
    # purge=True materializes the vectors away
    files_before = set(T.snapshot(croot)["files"])
    T.delete_where(spark, croot, "o_orderkey % 7 = 0", mode="dv")
    T.update_where(spark, croot, "o_totalprice > 300000",
                   {"o_totalprice": "o_totalprice / 2"}, mode="dv")
    assert files_before <= set(T.snapshot(croot)["files"])
    dv_detail = T.describe(croot)
    n_marked = T.read(spark, croot).count()
    T.optimize(spark, croot, purge=True)
    assert T.describe(croot)["num_dv_files"] == 0
    assert T.read(spark, croot).count() == n_marked
    assert T.read(spark, zroot).count() == n_src  # source untouched

    # ROW-LEVEL CDF + REPLICATION: a replica of the z-ordered table
    # maintained through typed change rows (exactly-once via the txn
    # watermark; its history is appends + dv DML — the feed's
    # row-level domain; the optimize commit is dataChange=false and
    # skips)
    rroot = tempfile.mkdtemp(prefix="lakehouse_") + "/replica"
    T.replicate_incremental(spark, zroot, rroot, "o_orderkey")
    T.delete_where(spark, zroot, "o_orderkey % 501 = 0", mode="dv")
    T.replicate_incremental(spark, zroot, rroot, "o_orderkey")
    assert (T.read(spark, rroot).count()
            == T.read(spark, zroot).count())

    # RENAME COLUMN (metadata-only) + replaceWhere scope reload
    T.rename_column(croot, "o_totalprice", "price")
    repl = (T.read(spark, croot).where("o_orderkey <= 100")
            .withColumn("price", F.col("price") * 0))
    T.overwrite_where(spark, repl, croot, "o_orderkey <= 100")
    assert T.read_where(spark, croot,
                        "o_orderkey <= 100 AND price > 0").count() == 0

    # GENERATED COLUMNS + BLOOM INDEX on a fresh keyed table: the
    # writer supplies base columns only (the generated partition
    # column computes), and a point lookup on the hash-scattered
    # key opens ~1 file via the per-file bloom sidecars
    groot = tempfile.mkdtemp(prefix="lakehouse_") + "/keyed"
    T.set_bloom_index(groot, ["o_orderkey"])
    T.append(T.read(spark, zroot).repartition(8, "o_orderkey"),
             groot, partition_by=["bucket"],
             generated={"bucket": "o_custkey % 4"})
    k = T.read(spark, groot).limit(1).collect()[0].o_orderkey
    cand = T._files_possibly_matching(
        T.snapshot(groot),
        T._parse_conjuncts(f"o_orderkey = {k}"), groot)
    n_all = len(T.snapshot(groot)["files"])
    assert len(cand) < n_all
    assert T.read_where(spark, groot,
                        f"o_orderkey = {k}").count() >= 1

    # NATIVE SPARK FORMATS (r12): the same table as a first-class
    # Spark source — batch write, pushed-filter batch read, and a
    # one-call streaming medallion hop
    T.register(spark)
    froot = tempfile.mkdtemp(prefix="lakehouse_") + "/native"
    (T.read(spark, zroot).write.format("txlog").mode("append")
     .save(froot))
    native = (spark.read.format("txlog").load(froot)
              .where("o_orderkey >= 100 AND o_orderkey < 2000"))
    n_native = native.count()
    assert n_native == T.read_where(
        spark, froot,
        "o_orderkey >= 100 AND o_orderkey < 2000").count()
    sroot = tempfile.mkdtemp(prefix="lakehouse_") + "/silver"
    q = T.refresh_stream(
        spark, froot, sroot,
        lambda d: d.where(F.col("o_orderkey") % 2 == 0),
        checkpoint_dir=tempfile.mkdtemp(prefix="lakehouse_ck_"))
    q.awaitTermination(120)
    n_silver = T.read(spark, sroot).count()

    out = {"rows_created": n0, "rows_pruned_scan": n_pruned,
           "rows_at_create_ts": n_at_create,
           "rows_after_restore": n_restored,
           "feed_ops": feed_ops, "vacuumed": len(removed),
           "versions": len(T.history(root)),
           "partition_by": detail["partition_by"],
           "zorder_files": len(zsnap["files"]),
           "zorder_box_candidates": len(zcand),
           "incr_rows": T.read(spark, incr).count(),
           "vacuum_would_remove": len(would),
           "clone_rows": T.read(spark, croot).count(),
           "dv_marked_rows": dv_detail["deleted_rows"],
           "dv_files": dv_detail["num_dv_files"],
           "bloom_point_candidates": len(cand),
           "bloom_files_total": n_all,
           "native_format_rows": n_native,
           "native_stream_rows": n_silver}
    print(out)
    assert n_restored == n0 == n_at_create
    assert feed_ops == ["delete", "merge", "update"]
    assert out["zorder_box_candidates"] <= out["zorder_files"]
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
