"""The native streaming sink — writeStream.format("txlog") — vs the
foreachBatch stream_sink(): table-to-table pipelines, exactly-once
replay via the txn watermark, partitioned stream writes, refusals."""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    T.register(spark)


def _src(spark, n=300, commits=3):
    root = tempfile.mkdtemp(prefix="tsw_src_") + "/t"
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g"))
    for b in range(commits):
        T.append(df.where(F.col("k") % commits == b), root,
                 checkpoint_every=0)
    return root


def _drain(spark, src, dst, ckpt, app="q"):
    q = (spark.readStream.format("txlogstream")
         .option("path", src).load()
         .withColumn("k2", F.col("k") * 2)
         .writeStream.format("txlog").option("path", dst)
         .option("app_id", app)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_table_to_table_pipeline_and_restart_tail(spark):
    src = _src(spark)
    dst = tempfile.mkdtemp(prefix="tsw_dst_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="tsw_ck_")
    _drain(spark, src, dst, ckpt)
    out = T.read(spark, dst)
    assert out.count() == 300
    assert out.columns == ["k", "g", "k2"]
    hist = T.history(dst)
    assert all(h["op"] == "stream-append" for h in hist)
    assert hist[-1]["app_id"] == "q"
    # a second run lands ONLY the new source commit
    extra = spark.range(1000, 1050).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g"))
    T.append(extra, src, checkpoint_every=0)
    _drain(spark, src, dst, ckpt)
    assert T.read(spark, dst).count() == 350
    # parity with the foreachBatch sink on the same source
    dst2 = tempfile.mkdtemp(prefix="tsw_fb_") + "/t"
    q = (spark.readStream.format("txlogstream")
         .option("path", src).load()
         .withColumn("k2", F.col("k") * 2)
         .writeStream.foreachBatch(T.stream_sink(dst2))
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="tsw_ck2_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(map(tuple, T.read(spark, dst2).collect())) \
        == sorted(map(tuple, T.read(spark, dst).collect()))


def test_replayed_epoch_is_noop(spark):
    dst = tempfile.mkdtemp(prefix="tsw_rp_") + "/t"
    os.makedirs(dst)
    schema = (spark.range(1).select(F.col("id").alias("k"))
              .schema)
    w = T.TxLogStreamNativeWriter({"path": dst}, schema, False)
    msg = w.write(iter([pa.RecordBatch.from_pydict({"k": [1, 2]})]))
    w.commit([msg], 0)
    assert T.read(spark, dst).count() == 2
    # Spark replays epoch 0 after a failure: same batchId again
    w2 = T.TxLogStreamNativeWriter({"path": dst}, schema, False)
    msg2 = w2.write(iter([pa.RecordBatch.from_pydict({"k": [1, 2]})]))
    w2.commit([msg2], 0)
    assert T.read(spark, dst).count() == 2  # no double-land
    assert len(T.history(dst)) == 1
    # the replay's staged file is unreferenced; vacuum reclaims it
    removed = T.vacuum(dst, retention_seconds=0)
    assert msg2.adds[0]["path"] in removed
    # the next epoch commits normally
    w2.commit([w2.write(iter([pa.RecordBatch.from_pydict(
        {"k": [3]})]))], 1)
    assert T.read(spark, dst).count() == 3


def test_schema_recorded_once(spark):
    dst = tempfile.mkdtemp(prefix="tsw_sch_") + "/t"
    os.makedirs(dst)
    schema = spark.range(1).select(F.col("id").alias("k")).schema
    w = T.TxLogStreamNativeWriter({"path": dst}, schema, False)
    for b in range(2):
        w.commit([w.write(iter([pa.RecordBatch.from_pydict(
            {"k": [b]})]))], b)
    v1 = json.load(open(T._version_file(dst, 1)))
    v2 = json.load(open(T._version_file(dst, 2)))
    assert "schema" in v1 and "schema" not in v2


def test_partitioned_stream_write(spark):
    src = _src(spark)
    dst = tempfile.mkdtemp(prefix="tsw_pt_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="tsw_ckp_")
    q = (spark.readStream.format("txlogstream")
         .option("path", src).load()
         .writeStream.format("txlog").option("path", dst)
         .option("partition_by", "g")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    snap = T.snapshot(dst)
    assert snap.get("partition_by") == ["g"]
    assert all(p.split("/")[0].startswith("g=")
               for p in snap["files"])
    assert T.read(spark, dst).count() == 300
    assert T.read_where(spark, dst, "g = 2").count() == 60


def test_complete_mode_refuses(spark):
    dst = tempfile.mkdtemp(prefix="tsw_cm_") + "/t"
    schema = spark.range(1).select(F.col("id").alias("k")).schema
    with pytest.raises(ValueError, match="append-only"):
        T.TxLogStreamNativeWriter({"path": dst}, schema, True)


def test_refresh_stream_parity_with_batch_refresh(spark):
    # the one-call streaming hop equals refresh_incremental's
    # result for the same transform (modulo the batch feed's tag
    # columns, which fn drops here)
    src = _src(spark)
    dst_s = tempfile.mkdtemp(prefix="tsw_rs_") + "/t"
    dst_b = tempfile.mkdtemp(prefix="tsw_rb_") + "/t"
    ckpt = tempfile.mkdtemp(prefix="tsw_rck_")

    def xform(df):
        return (df.where(F.col("g") < 3)
                .withColumn("k2", F.col("k") * 2))

    q = T.refresh_stream(spark, src, dst_s, xform,
                         checkpoint_dir=ckpt)
    q.awaitTermination(120)
    T.refresh_incremental(
        spark, src, dst_b,
        lambda d: xform(d).drop("_commit_version", "_commit_op"))
    a = sorted(map(tuple, T.read(spark, dst_s).collect()))
    b = sorted(map(tuple, T.read(spark, dst_b).collect()))
    assert a == b and a
    # a second invocation with nothing new lands nothing
    q2 = T.refresh_stream(spark, src, dst_s, xform,
                          checkpoint_dir=ckpt)
    q2.awaitTermination(120)
    assert sorted(map(tuple, T.read(spark, dst_s).collect())) == a


def test_stream_colmap_evolution_records_mapping(spark):
    # evolving a column-mapped table through the stream sink must
    # re-record the mapping exactly like append() does — a fresh
    # logical name colliding with an old physical name gets a new
    # physical name, so old bytes can never resurrect
    dst = tempfile.mkdtemp(prefix="tsw_cme_") + "/t"
    T.append(spark.createDataFrame([(1, "a")], "k int, v string"),
             dst, checkpoint_every=0)
    T.rename_column(dst, "v", "w")
    T.drop_column(dst, "w")  # physical 'v' is now history
    schema = spark.createDataFrame(
        [(2, "b")], "k int, v string").schema  # reuses name 'v'!
    w = T.TxLogStreamNativeWriter(
        {"path": dst, "merge_schema": "true"}, schema, False)
    w.commit([w.write(iter([pa.RecordBatch.from_pydict(
        {"k": [2], "v": ["b"]})]))], 0)
    snap = T.snapshot(dst)
    # the new logical 'v' maps to a FRESH physical name
    assert snap["colmap"].get("v", "v") != "v"
    r = T.read(spark, dst)
    assert sorted(map(tuple, r.collect())) == [(1, None), (2, "b")]


def test_sink_auto_compaction_bounds_files(spark):
    # every Nth batch folds the stream's small files with OPTIMIZE:
    # rows stay exact, downstream reads see a bounded file count,
    # and the optimize commits are dataChange=false ops
    dst = tempfile.mkdtemp(prefix="tsw_ac_") + "/t"
    sink = T.stream_sink(dst, auto_optimize_every=3,
                         checkpoint_every=0)
    for b in range(6):
        sink(spark.range(b * 10, (b + 1) * 10)
             .selectExpr("id", "id * 2 as v").coalesce(2), b)
    assert T.read(spark, dst).count() == 60
    ops = [h["op"] for h in T.history(dst)]
    assert ops.count("optimize") == 2
    # 6 batches x 2 files would be 12 without compaction
    assert len(T.snapshot(dst)["files"]) < 6
    # a replayed batch still no-ops (idempotence unaffected)
    sink(spark.range(0, 10).selectExpr("id", "id * 2 as v"), 5)
    assert T.read(spark, dst).count() == 60


def test_one_format_name_serves_stream_read_too(spark):
    # readStream.format("txlog") == format("txlogstream") — one
    # name for the whole matrix
    src = _src(spark)
    dst = tempfile.mkdtemp(prefix="tsw_one_") + "/t"
    q = (spark.readStream.format("txlog").option("path", src)
         .load()
         .writeStream.format("txlog").option("path", dst)
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="tsw_onec_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(map(tuple, T.read(spark, dst).collect())) \
        == sorted(map(tuple, T.read(spark, src).collect()))


def test_lost_race_rechecks_watermark(spark, monkeypatch):
    """ADVICE r12: a concurrent instance of the SAME app_id (driver
    failover / zombie run) that passed the entry watermark check and
    then WINS the version race we lose must make our retry a no-op —
    the batchId must never land twice."""
    dst = tempfile.mkdtemp(prefix="tsw_race_") + "/t"
    os.makedirs(dst)
    schema = (spark.range(1).select(F.col("id").alias("k"))
              .schema)
    w = T.TxLogStreamNativeWriter({"path": dst}, schema, False)
    w.commit([w.write(iter([pa.RecordBatch.from_pydict(
        {"k": [1]})]))], 0)

    real = T._try_commit
    fired = {"done": False}

    def racing(root, v, entry):
        # the FIRST attempt of our batch-1 commit loses to a zombie
        # run of the same app_id landing batch 1 at this version
        if (not fired["done"]
                and entry.get("batch_id") == 1):
            fired["done"] = True
            zombie = T.TxLogStreamNativeWriter(
                {"path": dst}, schema, False)
            zmsg = zombie.write(iter([pa.RecordBatch.from_pydict(
                {"k": [7, 8]})]))
            assert real(dst, v, {
                "op": "stream-append", "ts": entry["ts"],
                "app_id": "stream", "batch_id": 1,
                "actions": [{"add": a} for a in zmsg.adds]})
            return False  # we lost the race
        return real(root, v, entry)

    monkeypatch.setattr(T, "_try_commit", racing)
    w2 = T.TxLogStreamNativeWriter({"path": dst}, schema, False)
    msg = w2.write(iter([pa.RecordBatch.from_pydict({"k": [9]})]))
    w2.commit([msg], 1)  # must no-op on the retry, not double-land
    monkeypatch.setattr(T, "_try_commit", real)
    hist = T.history(dst)
    assert [h.get("batch_id") for h in hist] == [0, 1]
    assert T.read(spark, dst).count() == 3  # zombie's rows only
    # our losing attempt's staged file is orphaned for vacuum
    assert msg.adds[0]["path"] in T.vacuum(dst, retention_seconds=0)


def test_sink_auto_compaction_failure_does_not_fail_batch(
        spark, monkeypatch):
    """ADVICE r12: a transient optimize() failure after the append
    commit must not raise out of foreachBatch — the batch's data is
    already committed."""
    dst = tempfile.mkdtemp(prefix="tsw_optf_") + "/t"
    os.makedirs(dst)

    def boom(*a, **k):
        raise T.CommitConflict("optimize lost every version race")

    monkeypatch.setattr(T, "optimize", boom)
    sink = T.stream_sink(dst, auto_optimize_every=1)
    df = spark.range(5).select(F.col("id").alias("k"))
    sink(df, 0)  # would raise CommitConflict before the fix
    assert T.read(spark, dst).count() == 5
    assert T.history(dst)[-1]["batch_id"] == 0
