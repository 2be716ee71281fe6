"""The native batch writer — df.write.format("txlog") — against
append()/overwrite() parity, schema enforcement/evolution, column
mapping, bloom sidecars, the refusal set, and task-level staging
(zero-row tasks, abort cleanup, vacuum of never-committed files)."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pytest
from pyspark.sql import functions as F


from gcp_data_engineering_workshop_spark.sources import txlog as T


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    T.register(spark)


def _df(spark, lo=0, hi=1000):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g"),
        F.concat(F.lit("n-"), F.col("id")).alias("name"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_append_parity_with_function_api(spark):
    root_w = tempfile.mkdtemp(prefix="txw_") + "/t"
    root_f = tempfile.mkdtemp(prefix="txf_") + "/t"
    df = _df(spark)
    df.write.format("txlog").mode("append").save(root_w)
    df.write.format("txlog").mode("append").save(root_w)
    T.append(df, root_f, checkpoint_every=0)
    T.append(df, root_f, checkpoint_every=0)
    assert _rows(T.read(spark, root_w)) == _rows(T.read(spark, root_f))
    hist = T.history(root_w)
    assert [h["op"] for h in hist] == ["append", "append"]
    assert all(h["n_remove"] == 0 for h in hist)
    # round-trip through the native reader too
    assert _rows(spark.read.format("txlog").load(root_w)) \
        == _rows(T.read(spark, root_w))


def test_schema_enforcement_and_evolution(spark):
    root = tempfile.mkdtemp(prefix="txw_ev_") + "/t"
    _df(spark).write.format("txlog").mode("append").save(root)
    with pytest.raises(Exception, match="SchemaMismatch|merge_schema"):
        (spark.range(3).select(F.col("id").alias("zzz"))
         .write.format("txlog").mode("append").save(root))
    (_df(spark, 1000, 1005)
     .withColumn("score", F.lit(1.5))
     .write.format("txlog").mode("append")
     .option("merge_schema", "true").save(root))
    r = T.read(spark, root)
    assert r.columns == ["k", "g", "name", "score"]
    assert r.where("score is null").count() == 1000
    assert r.where("score = 1.5").count() == 5


def test_overwrite_resets_table(spark):
    root = tempfile.mkdtemp(prefix="txw_ow_") + "/t"
    _df(spark).write.format("txlog").mode("append").save(root)
    (spark.range(3).select(F.col("id").alias("a"))
     .write.format("txlog").mode("overwrite").save(root))
    r = T.read(spark, root)
    assert r.columns == ["a"] and r.count() == 3
    assert T.history(root)[-1]["op"] == "overwrite"
    # old version still time-travels
    assert T.read(spark, root, version=1).count() == 1000


def test_colmap_write_lands_physical_names(spark):
    root = tempfile.mkdtemp(prefix="txw_cm_") + "/t"
    _df(spark).write.format("txlog").mode("append").save(root)
    T.rename_column(root, "k", "key")
    before = set(T.snapshot(root)["files"])
    (spark.range(1000, 1010).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("g"),
        F.concat(F.lit("n-"), F.col("id")).alias("name"))
     .write.format("txlog").mode("append").save(root))
    r = T.read(spark, root)
    assert r.columns == ["key", "g", "name"]
    assert r.count() == 1010 and r.where("key >= 1000").count() == 10
    # the new file stores the PHYSICAL name (k), not the logical
    import pyarrow.parquet as pq
    new_files = set(T.snapshot(root)["files"]) - before
    for p in new_files:
        names = pq.ParquetFile(os.path.join(root, p)).schema_arrow.names
        assert "k" in names and "key" not in names, names


def test_bloom_sidecars_built_by_writer_tasks(spark):
    root = tempfile.mkdtemp(prefix="txw_bl_") + "/t"
    T.set_bloom_index(root, ["k"])
    _df(spark).repartition(4).write.format("txlog") \
        .mode("append").save(root)
    snap = T.snapshot(root)
    assert all("bloom" in m for m in snap["files"].values())
    cand = T._files_possibly_matching(
        snap, T._parse_conjuncts("k = 123"), root)
    assert len(cand) < len(snap["files"])
    got = T.read_where(spark, root, "k = 123").collect()
    assert [x["k"] for x in got] == [123]


def test_refusals_route_to_function_api(spark):
    df = _df(spark)
    # r13: conjunct-shaped constraints now validate arrow-side —
    # only NON-conjunct predicates (ORs, functions, col-to-col)
    # keep the refusal
    root_c = tempfile.mkdtemp(prefix="txw_rc_") + "/t"
    T.append(df, root_c, checkpoint_every=0)
    T.add_constraint(root_c, "odd_or_low", "k % 2 = 1 OR k < 10")
    with pytest.raises(Exception, match="CHECK constraints"):
        df.write.format("txlog").mode("append").save(root_c)
    # r14: PROVEN generated expressions compute in the arrow tasks
    # (see test_generated_columns_native_write) — only expressions
    # the compiler can't prove keep the refusal
    root_g = tempfile.mkdtemp(prefix="txw_rg_") + "/t"
    T.append(df.withColumn("g2", F.expr("upper(name)")), root_g,
             checkpoint_every=0, generated={"g2": "upper(name)"})
    with pytest.raises(Exception, match="generated columns"):
        df.write.format("txlog").mode("append").save(root_g)
    # a partition layout COMBINED with column mapping refuses
    root_m = tempfile.mkdtemp(prefix="txw_rm_") + "/t"
    T.append(df, root_m, checkpoint_every=0, partition_by=["g"])
    T.rename_column(root_m, "k", "key")
    with pytest.raises(Exception, match="column mapping"):
        (df.withColumnRenamed("k", "key")
         .write.format("txlog").mode("append").save(root_m))
    # non-int/string partition column types refuse
    root_t = tempfile.mkdtemp(prefix="txw_rt_") + "/t"
    with pytest.raises(Exception, match="int/string"):
        (df.withColumn("score", F.lit(1.5))
         .write.format("txlog").mode("append")
         .option("partition_by", "score").save(root_t))
    # appending a DIFFERENT spec than the recorded one refuses
    root_s = tempfile.mkdtemp(prefix="txw_rs_") + "/t"
    T.append(df, root_s, checkpoint_every=0, partition_by=["g"])
    with pytest.raises(Exception, match="cannot change"):
        (df.write.format("txlog").mode("append")
         .option("partition_by", "name").save(root_s))


def test_partitioned_write_parity_and_pruning(spark):
    df = _df(spark)
    root_w = tempfile.mkdtemp(prefix="txw_pw_") + "/t"
    root_f = tempfile.mkdtemp(prefix="txw_pf_") + "/t"
    (df.write.format("txlog").mode("append")
     .option("partition_by", "g").save(root_w))
    T.append(df, root_f, checkpoint_every=0, partition_by=["g"])
    assert T.snapshot(root_w).get("partition_by") == ["g"]
    assert _rows(T.read(spark, root_w)) == _rows(T.read(spark, root_f))
    # layout on disk is hive dirs with the partition col absent
    # from the files, and every add action carries its token
    snap = T.snapshot(root_w)
    assert all(p.split("/")[0].startswith("g=") for p in snap["files"])
    assert all(m.get("partition", {}).get("g") is not None
               for m in snap["files"].values())
    # a later writer-append INHERITS the spec without the option
    _df(spark, 1000, 1100).write.format("txlog").mode("append") \
        .save(root_w)
    assert T.read(spark, root_w).count() == 1100
    # partition pruning through the native reader's pushed filters
    got = (spark.read.format("txlog").load(root_w)
           .where("g = 3"))
    assert _rows(got) == _rows(T.read_where(spark, root_w, "g = 3"))
    r = T.TxLogBatchReader(
        {"path": root_w},
        T.read(spark, root_w).schema, T.snapshot(root_w), root_w)
    from pyspark.sql.datasource import EqualTo
    r.pushFilters([EqualTo(("g",), 3)])
    keep = r._kept_paths()
    assert keep and all(p.startswith("g=3/") for p in keep)


def test_partitioned_write_null_and_string_tokens(spark):
    root = tempfile.mkdtemp(prefix="txw_pn_") + "/t"
    df = spark.createDataFrame(
        [(1, "us east"), (2, None), (3, "eu/west"), (4, "us east")],
        "k int, region string")
    (df.write.format("txlog").mode("append")
     .option("partition_by", "region").save(root))
    r = T.read(spark, root)
    assert _rows(r.select("k", "region")) == [
        (1, "us east"), (2, None), (3, "eu/west"), (4, "us east")]
    # the native reader decodes the same tokens
    assert _rows(spark.read.format("txlog").load(root)
                 .select("k", "region")) == _rows(
        r.select("k", "region"))
    assert r.where("region is null").count() == 1


def test_partitioned_overwrite_sets_layout(spark):
    root = tempfile.mkdtemp(prefix="txw_po_") + "/t"
    _df(spark).write.format("txlog").mode("append").save(root)
    (_df(spark, 0, 100).write.format("txlog").mode("overwrite")
     .option("partition_by", "g").save(root))
    snap = T.snapshot(root)
    assert snap.get("partition_by") == ["g"]
    assert T.read(spark, root).count() == 100
    # and overwriting WITHOUT the option resets to unpartitioned
    (spark.range(3).select(F.col("id").alias("a"))
     .write.format("txlog").mode("overwrite").save(root))
    assert not T.snapshot(root).get("partition_by")


def test_zero_row_tasks_write_no_files(spark):
    root = tempfile.mkdtemp(prefix="txw_z_") + "/t"
    _df(spark, 0, 4).repartition(8).write.format("txlog") \
        .mode("append").save(root)
    snap = T.snapshot(root)
    assert 0 < len(snap["files"]) <= 4
    assert T.read(spark, root).count() == 4


def test_empty_write_commits_schema_only(spark):
    root = tempfile.mkdtemp(prefix="txw_e_") + "/t"
    _df(spark).limit(0).write.format("txlog").mode("append") \
        .save(root)
    snap = T.snapshot(root)
    assert snap["files"] == {} and snap.get("schema")
    r = T.read(spark, root)
    assert r.columns == ["k", "g", "name"] and r.count() == 0


def test_dml_composes_on_writer_written_table(spark):
    root = tempfile.mkdtemp(prefix="txw_dml_") + "/t"
    _df(spark).write.format("txlog").mode("append").save(root)
    T.delete_where(spark, root, "g = 2", mode="dv")
    r = spark.read.format("txlog").load(root)
    assert r.where("g = 2").count() == 0
    assert r.count() == T.read(spark, root).count()


def test_abort_unlinks_staged_files(spark):
    root = tempfile.mkdtemp(prefix="txw_ab_") + "/t"
    os.makedirs(root)
    w = T.TxLogBatchWriter({"path": root}, _df(spark).schema, False)
    batch = pa.RecordBatch.from_pydict(
        {"k": [1, 2], "g": [1, 2], "name": ["a", "b"]})
    msg = w.write(iter([batch]))
    staged = [a["path"] for a in msg.adds]
    assert staged and all(
        os.path.exists(os.path.join(root, p)) for p in staged)
    w.abort([msg, None])
    assert all(not os.path.exists(os.path.join(root, p))
               for p in staged)
    # nothing committed: the table is still empty
    assert T.snapshot(root)["files"] == {}


def test_vacuum_reclaims_never_committed_file(spark):
    root = tempfile.mkdtemp(prefix="txw_vac_") + "/t"
    _df(spark, 0, 10).coalesce(1).write.format("txlog") \
        .mode("append").save(root)
    w = T.TxLogBatchWriter({"path": root}, _df(spark).schema, False)
    batch = pa.RecordBatch.from_pydict(
        {"k": [1], "g": [1], "name": ["x"]})
    msg = w.write(iter([batch]))  # staged, never committed
    orphan = os.path.join(root, msg.adds[0]["path"])
    assert os.path.exists(orphan)
    removed = T.vacuum(root, retention_seconds=0)
    assert msg.adds[0]["path"] in removed
    assert not os.path.exists(orphan)
    assert T.read(spark, root).count() == 10


def test_timestamp_decimal_roundtrip_parity(spark):
    # type fidelity through the arrow task path: timestamps and
    # decimals written by the native writer must read back exactly
    # what append()'s Spark-parquet path produces
    root_w = tempfile.mkdtemp(prefix="txw_ts_") + "/t"
    root_f = tempfile.mkdtemp(prefix="txf_ts_") + "/t"
    df = spark.sql("""
        SELECT id AS k,
               timestamp_micros(CAST(1700000000000000 + id * 1e6
                                     AS BIGINT)) AS ts,
               CAST(id * 1.5 AS DECIMAL(18,4)) AS amt
        FROM range(100)""")
    df.write.format("txlog").mode("append").save(root_w)
    T.append(df, root_f, checkpoint_every=0)
    a, b = T.read(spark, root_w), T.read(spark, root_f)
    assert a.schema == b.schema
    assert _rows(a) == _rows(b)
    assert _rows(spark.read.format("txlog").load(root_w)) == _rows(b)


def test_partitioned_writer_bounds_open_files(spark):
    # a task fed more distinct partition values than the open-writer
    # cap ROTATES files (finalize + reopen later) instead of
    # holding one writer per value — unit-level on the writer
    # object so the cap override is actually observed by write()
    root = tempfile.mkdtemp(prefix="txw_cap_") + "/t"
    schema = (spark.range(1)
              .select(F.col("id").alias("k"),
                      F.lit(0).cast("int").alias("p")).schema)
    w = T.TxLogBatchWriter(
        {"path": root, "partition_by": "p"}, schema, False)
    w._MAX_OPEN_PART_WRITERS = 3
    batches = [pa.RecordBatch.from_pydict(
        {"k": list(range(b * 10, b * 10 + 10)),
         "p": [i % 5 for i in range(10)]}) for b in range(2)]
    msg = w.write(iter(batches))
    w.commit([msg])
    # 5 combos but a cap of 3: rotation forces > 5 files, yet
    # every row lands exactly once and no tmp is stranded
    assert len(msg.adds) > 5
    assert sum(a["rows"] for a in msg.adds) == 20
    assert T.read(spark, root).count() == 20
    assert T.read_where(spark, root, "p = 2").count() == 4
    for _dirpath, _d, files in os.walk(root):
        assert not [f for f in files if f.endswith(".tmp")]


def test_date_partitioned_write(spark):
    # date partition columns (the canonical 100 TB layout key):
    # ISO tokens in the dirs, both readers reconstruct the dates,
    # parity with the function API; pruning stays conservative
    # (dates don't type into range stats — correct, just unpruned)
    root_w = tempfile.mkdtemp(prefix="txw_dt_") + "/t"
    root_f = tempfile.mkdtemp(prefix="txf_dt_") + "/t"
    df = spark.range(90).selectExpr(
        "id as k",
        "date_add(date'2024-01-01', cast(id % 3 as int)) as d")
    (df.write.format("txlog").mode("append")
     .option("partition_by", "d").save(root_w))
    T.append(df, root_f, checkpoint_every=0, partition_by=["d"])
    a, b = T.read(spark, root_w), T.read(spark, root_f)
    assert a.schema == b.schema
    assert _rows(a) == _rows(b)
    assert _rows(spark.read.format("txlog").load(root_w)) \
        == _rows(b)
    assert a.where("d = date'2024-01-02'").count() == 30
    snap = T.snapshot(root_w)
    assert all(p.startswith("d=2024-01-0") for p in snap["files"])


def test_writer_casts_reordered_batches_by_name(spark):
    # a hand-fed batch in a different column order maps by NAME
    # (never positionally), including through a column mapping
    root = tempfile.mkdtemp(prefix="txw_ro_") + "/t"
    _df(spark, 0, 5).write.format("txlog").mode("append").save(root)
    T.rename_column(root, "k", "key")
    schema = (spark.range(1).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("g"),
        F.lit("x").alias("name")).schema)
    w = T.TxLogBatchWriter({"path": root}, schema, False)
    reordered = pa.RecordBatch.from_pydict(
        {"name": ["n-9"], "g": [2], "key": [9000]})
    w.commit([w.write(iter([reordered]))])
    got = T.read(spark, root).where("key = 9000").collect()
    assert [(x["key"], x["g"], x["name"]) for x in got] \
        == [(9000, 2, "n-9")]


def test_all_column_partition_refused(spark):
    """ADVICE r12 (medium): partition_by covering EVERY schema
    column would leave zero data columns — pyarrow records 0 rows
    while the task counts len(data), silently losing the write.
    Spark's own writer refuses this; the native writer must too."""
    root = tempfile.mkdtemp(prefix="txw_allpart_") + "/t"
    df = spark.range(6).select(
        (F.col("id") % 2).alias("a"), (F.col("id") % 3).alias("b"))
    with pytest.raises(Exception, match="every column|all column"):
        (df.write.format("txlog").mode("append")
         .option("partition_by", "a,b").save(root))
    # a proper subset still works and loses nothing
    (df.write.format("txlog").mode("append")
     .option("partition_by", "a").save(root))
    assert T.read(spark, root).count() == 6


def test_conjunct_constraints_enforce_arrow_side(spark):
    """r13 (VERDICT r12 #4): conjunct-shaped CHECK constraints
    validate IN the arrow tasks with enforcement parity vs
    append() — a clean write lands, a violating write raises and
    commits NOTHING, and NULLs pass (SQL CHECK semantics)."""
    root = tempfile.mkdtemp(prefix="txw_cc_") + "/t"
    T.append(_df(spark, 0, 50), root, checkpoint_every=0)
    T.add_constraint(root, "k_pos", "k >= 0")
    T.add_constraint(root, "named", "name IS NOT NULL AND g < 100")
    ok = _df(spark, 50, 80)
    ok.write.format("txlog").mode("append").save(root)
    assert T.read(spark, root).count() == 80
    v_before = T.snapshot(root)["version"]
    bad = spark.range(3).select(
        (F.col("id") - 7).alias("k"), F.col("id").alias("g"),
        F.concat(F.lit("n-"), F.col("id")).alias("name"))
    with pytest.raises(Exception, match="k_pos|ConstraintViolation"):
        bad.write.format("txlog").mode("append").save(root)
    # enforcement parity: append() refuses the same frame
    with pytest.raises(Exception, match="k_pos"):
        T.append(bad, root, checkpoint_every=0)
    assert T.snapshot(root)["version"] == v_before  # nothing landed
    assert T.read(spark, root).count() == 80
    # the failed tasks' staged files are vacuum-reclaimable orphans
    T.vacuum(root, retention_seconds=0)
    assert T.read(spark, root).count() == 80
    # NULL passes: a NULL k row satisfies CHECK (k >= 0)
    nulls = spark.sql(
        "SELECT cast(null as bigint) k, cast(1 as bigint) g, "
        "'x' name")
    nulls.write.format("txlog").mode("append").save(root)
    assert T.read(spark, root).where("k is null").count() == 1
    # ...but a NULL name still violates the notnull conjunct
    with pytest.raises(Exception, match="named"):
        (spark.sql("SELECT cast(5 as bigint) k, cast(1 as bigint) "
                   "g, cast(null as string) name")
         .write.format("txlog").mode("append").save(root))


def test_constraint_type_mismatch_refuses_at_plan(spark):
    """A constraint whose literal cannot compare against the column
    type in arrow refuses at PLAN time with a routing message."""
    root = tempfile.mkdtemp(prefix="txw_ct_") + "/t"
    T.append(_df(spark), root, checkpoint_every=0)
    T.add_constraint(root, "weird", "k >= 'abc'")
    with pytest.raises(Exception,
                       match="does not evaluate|append"):
        _df(spark).write.format("txlog").mode("append").save(root)


def test_generated_columns_native_write(spark):
    """r14 (VERDICT r13 #6): generated expressions the PROVEN
    grammar compiles (arithmetic / CASE / narrow CASTs) compute in
    the arrow tasks — a frame OMITTING the column lands exactly
    what append() lands, a frame PROVIDING a contradicting value
    fails its task, and a generated PARTITION column routes the
    hive layout."""
    df = _df(spark)
    # recompute parity vs append(), column omitted
    root_w = tempfile.mkdtemp(prefix="txw_g1_") + "/t"
    root_f = tempfile.mkdtemp(prefix="txw_g2_") + "/t"
    gen = {"bucket": "k % 5",
           "tier": "CASE WHEN g >= 4 THEN 'hi' ELSE 'lo' END",
           "ratio": "cast(k as double) / 8"}
    T.append(df, root_f, checkpoint_every=0, generated=gen)
    T.append(df.limit(0), root_w, checkpoint_every=0,
             generated=gen)  # record the spec, then write natively
    df.write.format("txlog").mode("append").save(root_w)
    assert _rows(T.read(spark, root_w)) == \
        _rows(T.read(spark, root_f))
    assert _rows(spark.read.format("txlog").load(root_w)) == \
        _rows(T.read(spark, root_f))
    # a PROVIDED matching value passes; a contradiction fails
    ok = df.withColumn("bucket", F.expr("k % 5")) \
        .withColumn("tier",
                    F.expr("CASE WHEN g >= 4 THEN 'hi' "
                           "ELSE 'lo' END")) \
        .withColumn("ratio", F.expr("cast(k as double) / 8"))
    ok.write.format("txlog").mode("append").save(root_w)
    assert T.read(spark, root_w).count() == 2000
    bad = ok.withColumn("bucket", F.expr("k % 5 + 1"))
    with pytest.raises(Exception, match="generated|contradict"):
        bad.write.format("txlog").mode("append").save(root_w)
    assert T.read(spark, root_w).count() == 2000  # nothing landed

    # generated PARTITION column: computed task-side, routes the
    # hive layout, prunes
    root_p = tempfile.mkdtemp(prefix="txw_g3_") + "/t"
    root_q = tempfile.mkdtemp(prefix="txw_g4_") + "/t"
    T.append(df.limit(0), root_p, checkpoint_every=0,
             generated={"pb": "k % 4"}, partition_by=["pb"])
    df.write.format("txlog").mode("append").save(root_p)
    T.append(df, root_q, checkpoint_every=0,
             generated={"pb": "k % 4"}, partition_by=["pb"])
    assert _rows(T.read(spark, root_p)) == \
        _rows(T.read(spark, root_q))
    snap = T.snapshot(root_p)
    toks = {m["partition"]["pb"] for m in snap["files"].values()
            if m.get("partition")}
    assert toks == {"0", "1", "2", "3"}
    got = (spark.read.format("txlog").load(root_p)
           .where("pb = 2"))
    assert got.count() == 250
    assert {r[0] for r in got.select("k").collect()} \
        == {k for k in range(1000) if k % 4 == 2}


def test_generated_expression_compiler_guards(spark):
    """code-review r14 regressions: AND binds tighter than OR
    (Spark precedence), '/' and '%' require a NONZERO LITERAL
    divisor (Spark's divide-by-zero semantics are session-dependent
    and unreproducible arrow-side), trailing whitespace compiles,
    garbage refuses — and the mixed-AND/OR CASE lands the SAME
    values through the native writer and append()."""
    types = {"a": "bigint", "b": "bigint", "c": "bigint"}
    C = T._arrow_expr_compile
    assert C("a / b", types) is None
    assert C("a % b", types) is None
    assert C("a / 0", types) is None
    assert C("a % 4", types) is not None
    assert C("a + 1 ", types) is not None
    assert C("a + 1 ;", types) is None
    # r15 (VERDICT r14 #8): the divisor rule widens to literal-only
    # subexpressions via constant folding — parenthesized,
    # negated, folded arithmetic; zero-folding and column refs
    # still refuse
    assert C("a / (2)", types) is not None
    assert C("a / -(2 + 3)", types) is not None
    assert C("a % (2 * 2)", types) is not None
    assert C("a / (2 - 2)", types) is None
    assert C("a / (b)", types) is None
    assert C("a / (1 + b)", types) is None
    gexpr = "CASE WHEN a = 1 AND b = 2 OR c = 3 THEN 1 ELSE 0 END"
    assert C(gexpr, types) is not None
    df = spark.createDataFrame(
        [(5, 2, 3), (1, 2, 0), (1, 0, 0), (9, 9, 9)],
        "a bigint, b bigint, c bigint")
    root_w = tempfile.mkdtemp(prefix="txw_pr1_") + "/t"
    root_f = tempfile.mkdtemp(prefix="txw_pr2_") + "/t"
    T.append(df.limit(0), root_w, checkpoint_every=0,
             generated={"g": gexpr})
    df.write.format("txlog").mode("append").save(root_w)
    T.append(df, root_f, checkpoint_every=0, generated={"g": gexpr})
    assert _rows(T.read(spark, root_w)) == \
        _rows(T.read(spark, root_f))
    # (5,2,3)->c=3:1, (1,2,0)->a=1&b=2:1, (1,0,0)->0, (9,9,9)->0
    assert sorted(r["g"] for r in
                  T.read(spark, root_w).collect()) == [0, 0, 1, 1]


def test_generated_expression_checked_edge_domains(spark):
    """ADVICE r15 low: numeric edge domains ERROR instead of
    silently diverging from Spark — float '%' refuses at compile
    (no true fmod kernel); int64 overflow in + * unary- raises
    ArrowInvalid in the write task (Spark 4 ANSI raises too; never
    a silently wrapped stored value); CAST AS int surfaces 32-bit
    overflow and CASTs are safe (NaN / out-of-range raise); normal
    in-range values keep exact append() parity."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pytest as _pt

    C = T._arrow_expr_compile
    assert C("a % 4", {"a": "double"}) is None   # float %: refuse
    assert C("a % 4", {"a": "bigint"}) is not None

    def ev(expr, types, arrays):
        fn = C(expr, types)
        assert fn is not None, expr
        batch = pa.record_batch(arrays)
        return fn(batch)

    big = 2 ** 62
    with _pt.raises(pa.ArrowInvalid):
        ev("a * 4", {"a": "bigint"}, {"a": pa.array([big])})
    with _pt.raises(pa.ArrowInvalid):
        ev("a + a", {"a": "bigint"}, {"a": pa.array([big])})
    with _pt.raises(pa.ArrowInvalid):
        ev("-a", {"a": "bigint"},
           {"a": pa.array([-(2 ** 63)])})
    with _pt.raises(pa.ArrowInvalid):
        ev("CAST(a AS int)", {"a": "bigint"},
           {"a": pa.array([2 ** 40])})
    with _pt.raises(pa.ArrowInvalid):
        ev("CAST(a AS bigint)", {"a": "double"},
           {"a": pa.array([float("nan")])})
    assert ev("CAST(a AS int)", {"a": "bigint"},
              {"a": pa.array([7])}).to_pylist() == [7]
    # float CAST truncates toward zero like Spark
    assert ev("CAST(a AS bigint)", {"a": "double"},
              {"a": pa.array([3.9, -2.9])}).to_pylist() == [3, -2]
    # in-range generated values keep exact native/append parity
    df = spark.createDataFrame(
        [(7,), (-9,), (0,)], "k bigint")
    gen = {"g": "CAST(k * 3 - 1 AS int)",
           "h": "k / -(2 + 3)",   # folded parenthesized divisor
           "m": "k % (2 * 2)"}
    root_w = tempfile.mkdtemp(prefix="txw_ck1_") + "/t"
    root_f = tempfile.mkdtemp(prefix="txw_ck2_") + "/t"
    T.append(df.limit(0), root_w, checkpoint_every=0, generated=gen)
    df.write.format("txlog").mode("append").save(root_w)
    T.append(df, root_f, checkpoint_every=0, generated=gen)
    assert _rows(T.read(spark, root_w)) == \
        _rows(T.read(spark, root_f))
