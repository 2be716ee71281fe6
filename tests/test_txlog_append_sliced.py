"""r15: append_sliced must be bit-equivalent on every snapshot to
the sequential per-slice append loop — one staged write, n commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T


def _hist_shape(root):
    return [(h["op"], h["version"]) if "version" in h
            else h["op"] for h in T.history(root)]


def test_append_sliced_matches_sequential(spark, tmp_path):
    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 7).cast("int").alias("grp"),
        (F.col("id") * 2.5).alias("val"))
    seq = str(tmp_path / "seq")
    for s in range(4):
        T.append(df.where(F.col("id") % 4 == s), seq,
                 checkpoint_every=0)
    sl = str(tmp_path / "sl")
    assert T.append_sliced(df, sl, "id % 4", 4,
                           checkpoint_every=0) == [1, 2, 3, 4]
    assert T.snapshot(sl)["version"] == T.snapshot(seq)["version"] == 4
    assert T.snapshot(sl)["schema"] == T.snapshot(seq)["schema"]
    for v in range(1, 5):
        a = sorted(map(tuple, T.read(spark, seq, version=v).collect()))
        b = sorted(map(tuple, T.read(spark, sl, version=v).collect()))
        assert a == b, f"version {v}"
    # change feed tags versions identically
    ca = sorted((r.id, r._commit_version) for r in
                T.read_changes(spark, seq, from_version=0).collect())
    cb = sorted((r.id, r._commit_version) for r in
                T.read_changes(spark, sl, from_version=0).collect())
    assert ca == cb
    # later plain appends compose
    T.append(df.where(F.col("id") < 3).select(
        "id", "grp", "val"), sl, checkpoint_every=0)
    assert T.snapshot(sl)["version"] == 5


def test_append_sliced_checkpoint_cadence(spark, tmp_path):
    """checkpoint_every fires per committed version exactly as the
    sequential loop's appends would."""
    df = spark.range(60)
    root = str(tmp_path / "t")
    T.append_sliced(df, root, "id % 6", 6, checkpoint_every=3)
    cps = T._list_checkpoints(root)
    assert cps == [3, 6]


def test_append_sliced_refusals(spark, tmp_path):
    df = spark.range(20).withColumn("b", (F.col("id") % 2).cast("int"))
    # out-of-range slice value refuses (rows would silently vanish)
    root = str(tmp_path / "bad")
    with pytest.raises(ValueError, match="outside"):
        T.append_sliced(spark.range(10), root, "id % 5", 3)
    # partitioned table refuses
    proot = str(tmp_path / "part")
    T.append(df, proot, partition_by=["b"], checkpoint_every=0)
    with pytest.raises(ValueError, match="partition_by"):
        T.append_sliced(df, proot, "id % 2", 2)
    # schema mismatch refuses like append
    sroot = str(tmp_path / "s")
    T.append(df, sroot, checkpoint_every=0)
    with pytest.raises(T.SchemaMismatch):
        T.append_sliced(spark.range(5), sroot, "id % 2", 2)
