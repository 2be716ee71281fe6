"""E22/D-block: the STREAMING row-level CDF source (txlogcdf,
sources/txlog.py) — read_changes_rows() as a readStream format with
executor-side deletion-vector diffs, and its foreachBatch
composition into a continuous replica (VERDICT r11 #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T


def _register(spark):
    spark.dataSource.register(T.TxLogCdfStreamDataSource)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _src_all_verbs(spark, root):
    """append x2 + all three dv DML verbs (+ a post-DML append)."""
    df = spark.range(30).select("id", (F.col("id") * 3).alias("v"))
    T.append(df.where("id < 15"), root, checkpoint_every=0)
    T.append(df.where("id >= 15"), root, checkpoint_every=0)
    T.delete_where(spark, root, "id % 5 = 0", mode="dv",
                   checkpoint_every=0)
    T.update_where(spark, root, "id < 8", {"v": "v + 1"}, mode="dv",
                   checkpoint_every=0)
    T.merge_delete(spark, root,
                   spark.createDataFrame([(11,), (23,)], "id bigint"),
                   "id", mode="dv", checkpoint_every=0)
    T.append(spark.range(100, 103).select(
        "id", (F.col("id") * 3).alias("v")), root, checkpoint_every=0)


def _drain(spark, root, name, **options):
    stream = spark.readStream.format("txlogcdf").option("path", root)
    for k, v in options.items():
        stream = stream.option(k, str(v))
    q = (stream.load().writeStream.format("memory")
         .queryName(name).outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def test_cdf_stream_matches_batch_feed_all_verbs(spark, tmp_path):
    """Batch-vs-stream row parity: the streamed typed rows equal
    read_changes_rows() over the same window, all three dv DML
    verbs plus appends, meta columns included."""
    root = str(tmp_path / "tbl")
    _src_all_verbs(spark, root)
    _register(spark)
    got = _drain(spark, root, "cdf_all_verbs")
    want = T.read_changes_rows(spark, root, from_version=0)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)
    # the typed feed carries every change type
    types = {r._change_type for r in got.collect()}
    assert types == {"insert", "delete", "update_preimage",
                     "update_postimage"}


def test_cdf_stream_tails_and_caps(spark, tmp_path):
    """Commits landing mid-stream arrive in later batches exactly
    once; max_versions_per_trigger bounds each batch's span."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(10).select(
        "id", (F.col("id") * 2).alias("v")), root, checkpoint_every=0)
    _register(spark)
    stream = (spark.readStream.format("txlogcdf")
              .option("path", root)
              .option("max_versions_per_trigger", "1")
              .option("reader_id", "t1").load())
    q = (stream.writeStream.format("memory")
         .queryName("cdf_tail").outputMode("append").start())
    try:
        q.processAllAvailable()
        assert spark.table("cdf_tail").count() == 10
        T.delete_where(spark, root, "id = 3", mode="dv",
                       checkpoint_every=0)
        T.append(spark.range(50, 52).select(
            "id", (F.col("id") * 2).alias("v")), root,
            checkpoint_every=0)
        q.processAllAvailable()
        got = spark.table("cdf_tail")
        # capped batches: the delete and the append landed in
        # DIFFERENT micro-batches (distinct batch count >= 3)
        assert got.where("_change_type = 'delete'").count() == 1
        assert got.where("id >= 50").count() == 2
        assert got.count() == 13
    finally:
        q.stop()
    want = T.read_changes_rows(spark, root, from_version=0)
    assert _rows(spark.table("cdf_tail")) == _rows(want)


def test_cdf_stream_bytes_cap_splits_commit(spark, tmp_path):
    """max_bytes_per_trigger on the CDF source (VERDICT r14 #6):
    one many-file commit drains in several bounded batches through
    the inherited file-cursor offsets, with the typed feed equal to
    the batch CDF reader's."""
    from gcp_data_engineering_workshop_spark.sources import txlog

    root = str(tmp_path / "tbl")
    T.append(spark.range(200).repartition(20).select(
        "id", (F.col("id") * 2).alias("v")), root,
        checkpoint_every=0)
    snap = T.snapshot(root)
    cap = sum(m["bytes"] for m in snap["files"].values()) // 4
    rdr = txlog.TxLogCdfStreamReader(
        {"path": root, "max_bytes_per_trigger": str(cap)},
        T.read(spark, root).schema)
    off = rdr.initialOffset()
    n_windows, n_tasks = 0, 0
    while True:
        end = rdr.latestOffset()
        if end == off:
            break
        parts = rdr.partitions(off, end)
        tasks = [t for pt in parts for t in pt.tasks]
        # fresh-instance replan of the same window is verbatim
        rdr2 = txlog.TxLogCdfStreamReader(
            {"path": root, "max_bytes_per_trigger": str(cap)},
            T.read(spark, root).schema)
        assert [t for pt in rdr2.partitions(off, end)
                for t in pt.tasks] == tasks
        n_windows += 1
        n_tasks += len(tasks)
        off = end
    assert n_windows >= 3
    assert n_tasks == 20  # every file exactly once
    _register(spark)
    stream = (spark.readStream.format("txlogcdf")
              .option("path", root)
              .option("max_bytes_per_trigger", str(cap))
              .option("reader_id", "bcap").load())
    q = (stream.writeStream.format("memory")
         .queryName("cdf_bytes").outputMode("append").start())
    try:
        q.processAllAvailable()
        got = spark.table("cdf_bytes")
        assert got.count() == 200
    finally:
        q.stop()
    want = T.read_changes_rows(spark, root, from_version=0)
    assert _rows(spark.table("cdf_bytes")) == _rows(want)


def test_cdf_stream_refuses_rewrite_mode(spark, tmp_path):
    """The rewrite-mode refusal carries: a rewrite DML commit kills
    the stream instead of guessing row-level types."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(10).select(
        "id", (F.col("id") * 2).alias("v")), root, checkpoint_every=0)
    T.delete_where(spark, root, "id = 3", mode="rewrite",
                   checkpoint_every=0)
    _register(spark)
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )
    q = (spark.readStream.format("txlogcdf").option("path", root)
         .load().writeStream.format("memory")
         .queryName("cdf_refuse").outputMode("append").start())
    try:
        with pytest.raises(StreamingQueryException,
                           match="deletion vectors|dv"):
            q.processAllAvailable()
            q.awaitTermination(30)
    finally:
        q.stop()


def test_cdf_stream_continuous_replica(spark, tmp_path):
    """foreachBatch(replicate_stream) composes the source into a
    CONTINUOUS replica that matches BOTH the source table and
    replicate_incremental's result over the same history."""
    src = str(tmp_path / "src")
    dst_stream = str(tmp_path / "dst_stream")
    dst_batch = str(tmp_path / "dst_batch")
    _src_all_verbs(spark, src)
    _register(spark)
    q = (spark.readStream.format("txlogcdf").option("path", src)
         .load().writeStream
         .foreachBatch(T.replicate_stream(spark, dst_stream, "id",
                                          checkpoint_every=0))
         .start())
    try:
        q.processAllAvailable()
        # more history lands mid-stream: the replica follows
        T.update_where(spark, src, "id = 4", {"id": "id + 500"},
                       mode="dv", checkpoint_every=0)
        T.append(spark.range(200, 202).select(
            "id", (F.col("id") * 3).alias("v")), src,
            checkpoint_every=0)
        q.processAllAvailable()
    finally:
        q.stop()
    T.replicate_incremental(spark, src, dst_batch, "id",
                            checkpoint_every=0)
    src_rows = _rows(T.read(spark, src))
    assert _rows(T.read(spark, dst_stream)) == src_rows
    assert _rows(T.read(spark, dst_batch)) == src_rows
    # key-moving update left no stale twin on the streamed replica
    assert T.read(spark, dst_stream).where("id = 4").count() == 0


def test_cdf_stream_clone_emits_live_rows(spark, tmp_path):
    """Streaming a CLONE of a dv-bearing table: the clone commit's
    inserts are the LIVE rows — deleted positions must not
    resurrect through the raw bytes (the 'live' executor path)."""
    src = str(tmp_path / "src")
    dup = str(tmp_path / "dup")
    T.append(spark.range(20).select(
        "id", (F.col("id") * 2).alias("v")), src, checkpoint_every=0)
    T.delete_where(spark, src, "id % 4 = 0", mode="dv",
                   checkpoint_every=0)
    T.clone(src, dup, checkpoint_every=0)
    _register(spark)
    got = _drain(spark, dup, "cdf_clone")
    assert got.where("_change_type = 'insert'").count() == 15
    assert got.where("id % 4 = 0").count() == 0
    assert _rows(got) == _rows(
        T.read_changes_rows(spark, dup, from_version=0))


def test_cdf_stream_partitioned_table(spark, tmp_path):
    """Hive-partitioned tables stream with partition columns
    injected from directory tokens, through dv diffs."""
    root = str(tmp_path / "tbl")
    df = spark.range(20).select(
        "id", (F.col("id") % 3).alias("bucket"),
        (F.col("id") * 2).alias("v"))
    T.append(df, root, partition_by=["bucket"], checkpoint_every=0)
    T.delete_where(spark, root, "id = 7", mode="dv",
                   checkpoint_every=0)
    _register(spark)
    got = _drain(spark, root, "cdf_part")
    assert set(got.columns) == {"id", "bucket", "v",
                                "_commit_version", "_commit_op",
                                "_change_type"}
    assert _rows(got) == _rows(
        T.read_changes_rows(spark, root, from_version=0))
    dels = got.where("_change_type = 'delete'").collect()
    assert [(r.id, r.bucket) for r in dels] == [(7, 1)]


def test_batch_cdf_through_format(spark):
    # spark.read.format("txlogcdf") == read_changes_rows for the
    # same window, dv DML included — one code path, two surfaces
    import tempfile
    from pyspark.sql import functions as F

    T.register(spark)
    root = tempfile.mkdtemp(prefix="cdfb_") + "/t"
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g"))
    T.append(df, root, checkpoint_every=0)
    T.delete_where(spark, root, "g = 2", mode="dv")
    T.update_where(spark, root, "k = 7", {"g": "g + 100"},
                   mode="dv")
    got = (spark.read.format("txlogcdf").option("path", root)
           .option("from_version", 0).load())
    want = T.read_changes_rows(spark, root, from_version=0)
    # nullability is not part of the schema contract (txlog's
    # _schema_check rule); names and types must match exactly
    assert [(f.name, f.dataType) for f in got.schema.fields] \
        == [(f.name, f.dataType) for f in want.schema.fields]
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    # a bounded sub-window matches too, and to_version pins
    got2 = (spark.read.format("txlogcdf").option("path", root)
            .option("from_version", 1).option("to_version", 2)
            .load())
    want2 = T.read_changes_rows(spark, root, from_version=1,
                                to_version=2)
    assert sorted(map(tuple, got2.collect())) \
        == sorted(map(tuple, want2.collect()))
    # empty window: zero rows, stable schema
    got3 = (spark.read.format("txlogcdf").option("path", root)
            .option("from_version", 3).load())
    assert got3.collect() == []
    assert got3.schema == got.schema


def test_cdf_source_pins_one_snapshot(spark, tmp_path):
    """ADVICE r12: schema(), the wrapped stream reader's colmap and
    the batch reader's default to_version must all resolve from ONE
    snapshot — a commit landing between the calls (e.g. a rename)
    cannot make them disagree within a single read."""
    T.register(spark)
    root = str(tmp_path / "t")
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g"))
    T.append(df, root, checkpoint_every=0)
    T.append(df.where("k < 10"), root, checkpoint_every=0)

    ds = T.TxLogCdfStreamDataSource({"path": root})
    ddl = ds.schema()  # resolution starts: snapshot pinned HERE
    v_pinned = T.snapshot(root)["version"]
    # a commit lands mid-resolution (after schema(), before reader())
    T.rename_column(root, "g", "g2")
    T.append(spark.range(3).select(
        F.col("id").alias("k"),
        F.lit(0).cast("long").alias("g2")), root,
        checkpoint_every=0)

    struct = spark.createDataFrame([], ddl).schema
    rdr = ds.reader(struct)
    # the window default and the colmap both come from the PINNED
    # snapshot, not the post-rename head
    assert rdr.to_v == v_pinned
    assert rdr._stream._colmap == {}
    # and a fresh source resolution sees the new head consistently
    ds2 = T.TxLogCdfStreamDataSource({"path": root})
    assert "g2" in ds2.schema()
    struct2 = spark.createDataFrame([], ds2.schema()).schema
    rdr2 = ds2.reader(struct2)
    assert rdr2.to_v == T.snapshot(root)["version"]
