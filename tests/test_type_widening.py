"""Lossless type widening under merge_schema (the public Delta
type-widening feature, r12): the integer chain, float->double, and
same-scale decimal precision growth — table widens on a wider
write, narrower writes read through the wider recorded schema, and
everything else still refuses."""

from __future__ import annotations

import json
import tempfile

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    T.register(spark)


def _mk(spark, types):
    sel = [F.col("id").cast(t).alias(f"c{i}")
           for i, t in enumerate(types)]
    return spark.range(5).select(*sel)


def test_wider_write_widens_table(spark):
    root = tempfile.mkdtemp(prefix="tw_") + "/t"
    T.append(_mk(spark, ["int", "float"]), root, checkpoint_every=0)
    T.append(_mk(spark, ["bigint", "double"]), root,
             checkpoint_every=0, merge_schema=True)
    r = T.read(spark, root)
    assert [f.dataType.simpleString() for f in r.schema.fields] \
        == ["bigint", "double"]
    assert r.count() == 10
    # the OLD (int32/float) file's values surface exactly
    assert sorted(x["c0"] for x in r.collect()) \
        == sorted([0, 1, 2, 3, 4] * 2)
    # pruning still works on the widened column
    assert T.read_where(spark, root, "c0 = 3").count() == 2


def test_narrower_write_accepted_no_schema_change(spark):
    root = tempfile.mkdtemp(prefix="tw_n_") + "/t"
    T.append(_mk(spark, ["bigint"]), root, checkpoint_every=0)
    v = T.append(_mk(spark, ["int"]), root, checkpoint_every=0,
                 merge_schema=True)
    r = T.read(spark, root)
    assert r.schema.fields[0].dataType.simpleString() == "bigint"
    assert r.count() == 10
    # the narrower write recorded NO schema (table unchanged)
    entry = json.load(open(T._version_file(root, v)))
    assert "schema" not in entry
    # without merge_schema it still refuses (strict default)
    with pytest.raises(T.SchemaMismatch):
        T.append(_mk(spark, ["int"]), root, checkpoint_every=0)


def test_decimal_precision_widening(spark):
    root = tempfile.mkdtemp(prefix="tw_d_") + "/t"
    T.append(_mk(spark, ["decimal(10,2)"]), root,
             checkpoint_every=0)
    T.append(_mk(spark, ["decimal(14,2)"]), root,
             checkpoint_every=0, merge_schema=True)
    r = T.read(spark, root)
    assert r.schema.fields[0].dataType.simpleString() \
        == "decimal(14,2)"
    assert r.count() == 10
    # scale changes are NOT lossless and refuse
    with pytest.raises(T.SchemaMismatch, match="widening"):
        T.append(_mk(spark, ["decimal(14,4)"]), root,
                 checkpoint_every=0, merge_schema=True)


def test_non_widening_changes_still_refuse(spark):
    root = tempfile.mkdtemp(prefix="tw_r_") + "/t"
    T.append(_mk(spark, ["int"]), root, checkpoint_every=0)
    with pytest.raises(T.SchemaMismatch, match="widening"):
        T.append(_mk(spark, ["string"]), root, checkpoint_every=0,
                 merge_schema=True)
    with pytest.raises(T.SchemaMismatch, match="widening"):
        T.append(_mk(spark, ["float"]), root, checkpoint_every=0,
                 merge_schema=True)


def test_widening_through_native_formats(spark):
    # the arrow read path casts old files through the widened type
    root = tempfile.mkdtemp(prefix="tw_f_") + "/t"
    _mk(spark, ["int", "float"]).write.format("txlog") \
        .mode("append").save(root)
    (_mk(spark, ["bigint", "double"]).write.format("txlog")
     .mode("append").option("merge_schema", "true").save(root))
    got = spark.read.format("txlog").load(root)
    assert [f.dataType.simpleString() for f in got.schema.fields] \
        == ["bigint", "double"]
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, T.read(spark, root).collect()))


def test_widening_composes_with_added_columns(spark):
    root = tempfile.mkdtemp(prefix="tw_a_") + "/t"
    T.append(_mk(spark, ["int"]), root, checkpoint_every=0)
    T.append(_mk(spark, ["bigint"]).withColumn("extra", F.lit("x")),
             root, checkpoint_every=0, merge_schema=True)
    r = T.read(spark, root)
    assert [f.dataType.simpleString() for f in r.schema.fields] \
        == ["bigint", "string"]
    assert r.where("extra is null").count() == 5


def test_dml_on_widened_table(spark):
    # DML reads touched files through the widened recorded schema
    root = tempfile.mkdtemp(prefix="tw_dml_") + "/t"
    T.append(_mk(spark, ["int"]), root, checkpoint_every=0)
    T.append(_mk(spark, ["bigint"]), root, checkpoint_every=0,
             merge_schema=True)
    T.delete_where(spark, root, "c0 = 2", mode="dv")
    r = T.read(spark, root)
    assert r.count() == 8 and r.where("c0 = 2").count() == 0
    ups = spark.range(100, 102).select(
        F.col("id").cast("bigint").alias("c0"))
    T.merge_upsert(spark, root, ups, "c0")
    assert T.read(spark, root).count() == 10
