"""E22: deletion vectors (merge-on-read deletes) — the Delta
deletion-vector / Iceberg v2 positional-delete shape on the
transaction log (sources/txlog.py). A dv-mode DELETE writes the
matching rows' physical positions to a parquet sidecar instead of
rewriting the hit files; every read path anti-joins the vector
away; every rewrite (merge, DML, OPTIMIZE) materializes it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T


def _ids(df):
    return sorted(r.id for r in df.collect())


def _dv_count(root):
    snap = T.snapshot(root)
    return sum(1 for m in snap["files"].values() if "dv" in m)


def _n_data_files(root):
    """Physical part-*.parquet on disk (excludes _dv sidecars)."""
    n = 0
    for dirpath, dirs, files in os.walk(root):
        if os.path.basename(dirpath) in (T.LOG_DIR, "_dv"):
            dirs[:] = []
            continue
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


@pytest.fixture
def table(spark, tmp_path):
    """Four single-file commits of ids 0..39 (k = id % 4 slices)."""
    root = str(tmp_path / "tbl")
    for b in range(4):
        T.append(spark.range(40).where(F.col("id") % 4 == b)
                 .coalesce(1), root, checkpoint_every=0)
    return root


def test_dv_delete_matches_rewrite_semantics(spark, tmp_path):
    """Same predicate, both modes, identical survivors — including
    the SQL rule that NULL-predicate rows survive a DELETE."""
    rows = [(i, float(i) if i % 5 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    T.append(df, r1, checkpoint_every=0)
    T.append(df, r2, checkpoint_every=0)
    T.delete_where(spark, r1, "v < 12", checkpoint_every=0)
    T.delete_where(spark, r2, "v < 12", mode="dv", checkpoint_every=0)
    a = sorted((r.id, r.v) for r in T.read(spark, r1).collect())
    b = sorted((r.id, r.v) for r in T.read(spark, r2).collect())
    assert a == b
    # NULL-predicate rows (v IS NULL) survived in both
    assert 0 in [i for i, v in b]


def test_dv_delete_rewrites_no_data_file(spark, table):
    before = _n_data_files(table)
    files_before = set(T.snapshot(table)["files"])
    T.delete_where(spark, table, "id % 10 = 3", mode="dv",
                   checkpoint_every=0)
    # every original data file still on disk, byte-identical set
    assert set(T.snapshot(table)["files"]) == files_before
    assert _n_data_files(table) == before
    assert _ids(T.read(spark, table)) == [
        i for i in range(40) if i % 10 != 3]
    # ids 3,13,23,33 live in the mod-4 slices 3 and 1 -> 2 hit files
    assert _dv_count(table) == 2
    assert T.history(table)[-1]["mode"] == "dv"
    d = T.describe(table)
    assert d["num_dv_files"] == 2 and d["deleted_rows"] == 4


def test_dv_second_delete_accumulates(spark, table):
    T.delete_where(spark, table, "id < 8", mode="dv",
                   checkpoint_every=0)
    T.delete_where(spark, table, "id >= 32", mode="dv",
                   checkpoint_every=0)
    assert _ids(T.read(spark, table)) == list(range(8, 32))
    # cumulative per-file counts: 40 ids over 4 files, 2+2 each
    snap = T.snapshot(table)
    assert sorted(m["dv"]["deleted"]
                  for m in snap["files"].values()) == [4, 4, 4, 4]
    # read_range / read_where agree with read().where()
    assert _ids(T.read_range(spark, table, "id", lo=10, hi=20)) == \
        list(range(10, 21))
    assert _ids(T.read_where(spark, table, "id >= 30")) == [30, 31]


def test_dv_full_file_delete_drops_the_file(spark, table):
    """A predicate matching EVERY live row of a file removes the
    file outright — no sidecar, no re-add."""
    T.delete_where(spark, table, "id % 4 = 2", mode="dv",
                   checkpoint_every=0)
    snap = T.snapshot(table)
    assert len(snap["files"]) == 3
    assert _dv_count(table) == 0  # no partial file -> no vectors
    assert _ids(T.read(spark, table)) == [
        i for i in range(40) if i % 4 != 2]


def test_dv_time_travel_and_restore(spark, table):
    v0 = T.snapshot(table)["version"]
    T.delete_where(spark, table, "id < 20", mode="dv",
                   checkpoint_every=0)
    # pre-delete version reads the original add actions: all rows
    assert _ids(T.read(spark, table, version=v0)) == list(range(40))
    # restore across the dv commit rolls the vector refs back
    T.restore(table, v0, checkpoint_every=0)
    assert _ids(T.read(spark, table)) == list(range(40))
    assert _dv_count(table) == 0
    # and restoring FORWARD onto the dv'd version re-applies them
    T.restore(table, v0 + 1, checkpoint_every=0)
    assert _ids(T.read(spark, table)) == list(range(20, 40))
    assert _dv_count(table) == 4


def test_dv_merge_materializes_and_drops_ref(spark, table):
    """A merge touching dv'd files must not resurrect deleted rows,
    and its rewrite drops the vector ref for the touched files."""
    T.delete_where(spark, table, "id < 10", mode="dv",
                   checkpoint_every=0)
    updates = spark.createDataFrame([(12, ), (999, )], "id bigint")
    T.merge_upsert(spark, table, updates, "id", checkpoint_every=0)
    ids = _ids(T.read(spark, table))
    assert ids == sorted(set(range(10, 40)) | {999})
    # every touched file was rewritten clean; untouched keep vectors
    snap = T.snapshot(table)
    for p, m in snap["files"].items():
        if "dv" in m:
            # untouched files: their dv still applies
            assert m["dv"]["deleted"] > 0


def test_dv_update_where_applies_vectors(spark, table):
    T.delete_where(spark, table, "id >= 35", mode="dv",
                   checkpoint_every=0)
    T.update_where(spark, table, "id % 2 = 0", {"id": "id + 100"},
                   checkpoint_every=0)
    expect = sorted((i + 100 if i % 2 == 0 else i)
                    for i in range(35))
    assert _ids(T.read(spark, table)) == sorted(expect)


def test_dv_optimize_purges(spark, table):
    """Plain OPTIMIZE volunteers dv'd files past the deleted-rows
    ratio (10% here > 5% rule) and materializes the delete."""
    T.delete_where(spark, table, "id % 10 = 1", mode="dv",
                   checkpoint_every=0)
    assert _dv_count(table) == 2  # ids 1,11,21,31 -> slices 1 and 3
    T.optimize(spark, table, checkpoint_every=0)
    assert _dv_count(table) == 0
    assert _ids(T.read(spark, table)) == [
        i for i in range(40) if i % 10 != 1]


def test_dv_optimize_ratio_rule_and_explicit_purge(spark, tmp_path):
    """Below the 5% ratio a big file keeps its vector through plain
    OPTIMIZE; purge=True rewrites it regardless."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(1000).coalesce(1), root, checkpoint_every=0)
    T.delete_where(spark, root, "id = 7", mode="dv",
                   checkpoint_every=0)  # 0.1% deleted
    # make the file look "full size" so compaction skips it
    T.optimize(spark, root, target_bytes=1, checkpoint_every=0)
    assert _dv_count(root) == 1
    T.optimize(spark, root, target_bytes=1, purge=True,
               checkpoint_every=0)
    assert _dv_count(root) == 0
    assert _ids(T.read(spark, root)) == [i for i in range(1000)
                                         if i != 7]


def test_dv_read_changes_survivors_contract(spark, table):
    v = T.delete_where(spark, table, "id < 4", mode="dv",
                       checkpoint_every=0)
    feed = T.read_changes(spark, table, from_version=v - 1,
                          to_version=v)
    rows = feed.collect()
    assert all(r._commit_op == "delete" for r in rows)
    # survivors of the touched files only — deleted ids absent
    assert sorted(r.id for r in rows) == list(range(4, 40))


def test_dv_stream_raises_then_skips(spark, table):
    """The stream source refuses a dv-delete commit by default and
    SKIPS its (no-new-rows) adds under ignore_changes."""
    lo = T.snapshot(table)["version"]
    T.delete_where(spark, table, "id = 0", mode="dv",
                   checkpoint_every=0)
    hi = T.snapshot(table)["version"]
    with pytest.raises(T.NonAppendChange):
        T._plan_window(table, lo, hi, ignore_changes=False)
    assert T._plan_window(table, lo, hi, ignore_changes=True) == []
    # appends after the delete still stream
    T.append(spark.range(100, 103), table, checkpoint_every=0)
    plan = T._plan_window(table, hi, hi + 1, ignore_changes=True)
    assert len(plan) == 1 and plan[0][1] == "append"


def test_dv_vacuum_keeps_referenced_sidecars(spark, table):
    T.delete_where(spark, table, "id < 6", mode="dv",
                   checkpoint_every=0)
    dv_dir = os.path.join(table, "_dv")
    parts = [os.path.join(dp, f) for dp, _, fs in os.walk(dv_dir)
             for f in fs if f.endswith(".parquet")]
    assert parts
    removed = T.vacuum(table, retention_seconds=0.0)
    assert not any("_dv/" in r for r in removed)
    assert _ids(T.read(spark, table)) == list(range(6, 40))
    # merge rewrites every file -> vectors unreferenced at head,
    # but still REACHABLE through pre-checkpoint history (no
    # checkpoint exists), so vacuum keeps them for time travel
    T.merge_upsert(spark, table,
                   spark.range(40).select("id"), "id",
                   checkpoint_every=0)
    assert T.vacuum(table, retention_seconds=0.0, dry_run=True) == []
    # a checkpoint bounds the reference scan; vectors now age out
    T._maybe_checkpoint(table, T.snapshot(table)["version"], 1)
    removed = T.vacuum(table, retention_seconds=0.0)
    assert any(r.startswith("_dv/") for r in removed)
    assert _ids(T.read(spark, table)) == list(range(40))


def test_dv_clone_carries_vectors(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    T.append(spark.range(20).coalesce(1), src, checkpoint_every=0)
    T.delete_where(spark, src, "id >= 15", mode="dv",
                   checkpoint_every=0)
    T.clone(src, dst, checkpoint_every=0)
    assert _ids(T.read(spark, dst)) == list(range(15))
    # copy-on-write: deleting more on the clone leaves the source
    T.delete_where(spark, dst, "id >= 10", mode="dv",
                   checkpoint_every=0)
    assert _ids(T.read(spark, dst)) == list(range(10))
    assert _ids(T.read(spark, src)) == list(range(15))


def test_dv_on_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.range(30).select(
        "id", (F.col("id") % 3).alias("k"))
    T.append(df, root, partition_by=["k"], checkpoint_every=0)
    T.delete_where(spark, root, "id < 9", mode="dv",
                   checkpoint_every=0)
    got = sorted((r.id, r.k) for r in T.read(spark, root).collect())
    assert got == [(i, i % 3) for i in range(9, 30)]
    # partition pruning composes with the vector apply
    assert sorted(r.id for r in
                  T.read_where(spark, root, "k = 1").collect()) == \
        [i for i in range(9, 30) if i % 3 == 1]


def test_dv_on_schema_evolved_table(spark, tmp_path):
    """Vectors apply through the recorded-schema NULL-backfill
    projection: delete rows of a pre-evolution file by a predicate
    on an original column."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(10).coalesce(1), root, checkpoint_every=0)
    T.merge_upsert(spark, root,
                   spark.range(10, 12).select(
                       "id", F.lit(1.0).alias("w")),
                   "id", merge_schema=True, checkpoint_every=0)
    T.delete_where(spark, root, "id <= 3", mode="dv",
                   checkpoint_every=0)
    rows = sorted((r.id, r.w) for r in T.read(spark, root).collect())
    assert [i for i, _ in rows] == list(range(4, 12))
    assert rows[-1] == (11, 1.0)


def test_dv_update_matches_rewrite_semantics(spark, tmp_path):
    """update_where(mode='dv') == rewrite mode, including the SQL
    rules: NULL-predicate rows untouched, assignments read the OLD
    row, values cast back to the column type."""
    rows = [(i, float(i) if i % 5 else None) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    T.append(df, r1, checkpoint_every=0)
    T.append(df, r2, checkpoint_every=0)
    sets = {"id": "id + 1000", "v": "id * 1.0"}  # old-row reads
    T.update_where(spark, r1, "v < 12", sets, checkpoint_every=0)
    T.update_where(spark, r2, "v < 12", sets, mode="dv",
                   checkpoint_every=0)
    a = sorted((r.id, r.v) for r in T.read(spark, r1).collect())
    b = sorted((r.id, r.v) for r in T.read(spark, r2).collect())
    assert a == b


def test_dv_update_writes_only_updates(spark, table):
    files0 = set(T.snapshot(table)["files"])
    T.update_where(spark, table, "id < 4", {"id": "id + 100"},
                   mode="dv", checkpoint_every=0)
    snap = T.snapshot(table)
    # originals all still live (now vectored), plus new small files
    assert files0 < set(snap["files"])
    new = set(snap["files"]) - files0
    assert all("dv" not in snap["files"][p] for p in new)
    assert T.describe(table)["deleted_rows"] == 4
    assert _ids(T.read(spark, table)) == sorted(
        set(range(4, 40)) | {100, 101, 102, 103})


def test_dv_update_moves_partition_value(spark, tmp_path):
    """A dv-mode UPDATE that changes the partition column lands the
    new row in its new directory and vectors the old position."""
    root = str(tmp_path / "tbl")
    df = spark.range(12).select("id", (F.col("id") % 2).alias("k"))
    T.append(df, root, partition_by=["k"], checkpoint_every=0)
    T.update_where(spark, root, "id = 3", {"k": "0"}, mode="dv",
                   checkpoint_every=0)
    got = sorted((r.id, r.k) for r in T.read(spark, root).collect())
    assert got == sorted([(i, i % 2) for i in range(12)
                          if i != 3] + [(3, 0)])
    assert sorted(r.id for r in T.read_where(
        spark, root, "k = 0").collect()) == [0, 2, 3, 4, 6, 8, 10]


def test_dv_merge_delete_matches_rewrite(spark, tmp_path):
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    for r in (r1, r2):
        T.append(spark.range(40), r, checkpoint_every=0)
    keys = spark.createDataFrame(
        [(i,) for i in (3, 17, 29, 999)], "id bigint")
    T.merge_delete(spark, r1, keys, "id", checkpoint_every=0)
    T.merge_delete(spark, r2, keys, "id", mode="dv",
                   checkpoint_every=0)
    assert _ids(T.read(spark, r1)) == _ids(T.read(spark, r2))
    # dv mode: no data file rewritten
    assert T.describe(r2)["deleted_rows"] == 3


def test_dv_merge_delete_no_real_hit_commits_nothing(spark, table):
    """Keys that survive stat pruning but match no live row must
    not commit in dv mode (tighter than the rewrite path)."""
    T.delete_where(spark, table, "id = 20", mode="dv",
                   checkpoint_every=0)
    v = T.snapshot(table)["version"]
    # 20 is in-range for its file's footer stats but already deleted
    keys = spark.createDataFrame([(20,)], "id bigint")
    assert T.merge_delete(spark, table, keys, "id",
                          mode="dv", checkpoint_every=0) == v
    assert _ids(T.read(spark, table)) == [
        i for i in range(40) if i != 20]


def test_dv_update_change_feed_and_stream(spark, table):
    """CDF on a dv-update window = updated rows + survivors of the
    touched files; the stream's ignore_changes emits ONLY the new
    updated-row files (the vectored re-adds carry no new rows)."""
    lo = T.snapshot(table)["version"]
    v = T.update_where(spark, table, "id < 2", {"id": "id + 50"},
                       mode="dv", checkpoint_every=0)
    feed = T.read_changes(spark, table, from_version=lo,
                          to_version=v)
    # touched file = slice 0 (ids 0,4,...36) and slice 1 (1,5,...37)
    got = sorted(r.id for r in feed.collect())
    touched_survivors = sorted(
        i for i in range(40) if i % 4 in (0, 1) and i >= 2)
    assert got == sorted(touched_survivors + [50, 51])
    plan = T._plan_window(table, lo, v, ignore_changes=True)
    assert len(plan) == 1
    paths = [p for p, _b, _pt in plan[0][2]]
    rows = spark.read.parquet(
        *[f"{table}/{p}" for p in paths]).collect()
    assert sorted(r.id for r in rows) == [50, 51]


def test_cdf_rows_insert_delete(spark, table):
    """read_changes_rows: appends type as insert; a dv delete emits
    EXACTLY this commit's deleted rows (no survivors) — including a
    second delete, whose rows are the cumulative-minus-previous
    vector diff, and a fully-dropped file's remaining live rows."""
    v0 = T.snapshot(table)["version"]
    T.delete_where(spark, table, "id < 6", mode="dv",
                   checkpoint_every=0)
    T.delete_where(spark, table, "id % 4 = 2", mode="dv",
                   checkpoint_every=0)  # drops slice-2's file fully
    feed = T.read_changes_rows(spark, table, from_version=0)
    rows = [(r.id, r._commit_version, r._change_type)
            for r in feed.collect()]
    ins = sorted(i for i, _v, t in rows if t == "insert")
    assert ins == list(range(40))
    d1 = sorted(i for i, v, t in rows
                if t == "delete" and v == v0 + 1)
    assert d1 == [0, 1, 2, 3, 4, 5]
    d2 = sorted(i for i, v, t in rows
                if t == "delete" and v == v0 + 2)
    assert d2 == [i for i in range(6, 40) if i % 4 == 2]
    # applying the feed reproduces the table exactly
    state = set(ins) - set(d1) - set(d2)
    assert sorted(state) == _ids(T.read(spark, table))


def test_cdf_rows_update_images(spark, table):
    v0 = T.snapshot(table)["version"]
    T.update_where(spark, table, "id < 3", {"id": "id + 100"},
                   mode="dv", checkpoint_every=0)
    feed = T.read_changes_rows(spark, table, from_version=v0)
    rows = [(r.id, r._change_type) for r in feed.collect()]
    assert sorted(i for i, t in rows if t == "update_preimage") \
        == [0, 1, 2]
    assert sorted(i for i, t in rows if t == "update_postimage") \
        == [100, 101, 102]
    assert not [i for i, t in rows if t == "delete"]


def test_cdf_rows_merge_delete_and_refusals(spark, table):
    v0 = T.snapshot(table)["version"]
    keys = spark.createDataFrame([(8,), (9,)], "id bigint")
    T.merge_delete(spark, table, keys, "id", mode="dv",
                   checkpoint_every=0)
    feed = T.read_changes_rows(spark, table, from_version=v0)
    assert sorted((r.id, r._change_type) for r in feed.collect()) \
        == [(8, "delete"), (9, "delete")]
    # a rewrite-mode commit in the window refuses with a clear error
    T.delete_where(spark, table, "id = 10", checkpoint_every=0)
    with pytest.raises(ValueError, match="row-level"):
        T.read_changes_rows(spark, table,
                            from_version=v0).collect()
    # optimize commits stay invisible (dataChange=false)
    T.optimize(spark, table, checkpoint_every=0)
    v = T.snapshot(table)["version"]
    assert T.read_changes_rows(spark, table,
                               from_version=v - 1).count() == 0


def _rows(spark, root):
    from gcp_data_engineering_workshop_spark.sources import txlog
    return sorted(tuple(r) for r in txlog.read(spark, root).collect())


def test_replicate_incremental_exact_copy(spark, tmp_path):
    """replicate_incremental maintains dst == src through appends
    and all three dv-mode DML verbs, exactly-once across calls."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(30).select(
        "id", (F.col("id") * 3).alias("v"))
    T.append(df.where("id < 15"), src, checkpoint_every=0)
    T.append(df.where("id >= 15"), src, checkpoint_every=0)
    T.delete_where(spark, src, "id % 5 = 0", mode="dv",
                   checkpoint_every=0)
    assert T.replicate_incremental(spark, src, dst, "id",
                                   checkpoint_every=0) is not None
    assert _rows(spark, dst) == _rows(spark, src)
    # nothing new -> no-op
    assert T.replicate_incremental(spark, src, dst, "id",
                                   checkpoint_every=0) is None
    # more source history: update + by-key delete + append
    T.update_where(spark, src, "id < 8", {"v": "v + 1"}, mode="dv",
                   checkpoint_every=0)
    T.merge_delete(spark, src,
                   spark.createDataFrame([(11,)], "id bigint"),
                   "id", mode="dv", checkpoint_every=0)
    T.append(spark.range(100, 103).select(
        "id", (F.col("id") * 3).alias("v")), src, checkpoint_every=0)
    T.replicate_incremental(spark, src, dst, "id",
                            checkpoint_every=0)
    assert _rows(spark, dst) == _rows(spark, src)


def test_replicate_handles_key_moving_update(spark, tmp_path):
    """An update that MOVES the key column deletes the old key on
    the replica instead of leaving a stale twin."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    T.append(spark.range(10), src, checkpoint_every=0)
    T.replicate_incremental(spark, src, dst, "id",
                            checkpoint_every=0)
    T.update_where(spark, src, "id = 4", {"id": "id + 500"},
                   mode="dv", checkpoint_every=0)
    T.replicate_incremental(spark, src, dst, "id",
                            checkpoint_every=0)
    assert _rows(spark, dst) == _rows(spark, src)
    assert 4 not in _ids(T.read(spark, dst))


def _dml_history(spark, src, n_versions=20, seed=7):
    """A deterministic pseudo-random append/dv-DML history covering
    the collapse edge cases: in-place updates, key-moving updates,
    deletes of re-inserted keys, re-inserts of deleted keys."""
    import random
    rng = random.Random(seed)
    T.append(spark.range(40).select(
        "id", (F.col("id") * 3).alias("v")), src, checkpoint_every=0)
    nxt = 1000
    while T.snapshot(src)["version"] < n_versions:
        op = rng.choice(["append", "delete", "update", "move",
                         "merge_delete"])
        if op == "append":
            T.append(spark.range(nxt, nxt + 3).select(
                "id", (F.col("id") * 3).alias("v")), src,
                checkpoint_every=0)
            nxt += 3
        elif op == "delete":
            T.delete_where(spark, src, f"id % 7 = {rng.randrange(7)}",
                           mode="dv", checkpoint_every=0)
        elif op == "update":
            T.update_where(spark, src,
                           f"id % 5 = {rng.randrange(5)}",
                           {"v": "v + 1"}, mode="dv",
                           checkpoint_every=0)
        elif op == "move":
            T.update_where(spark, src, f"id = {rng.randrange(40)}",
                           {"id": f"id + {nxt}"}, mode="dv",
                           checkpoint_every=0)
            nxt += 100
        else:
            ids = _ids(T.read(spark, src))
            if ids:
                pick = sorted(ids)[rng.randrange(len(ids))]
                T.merge_delete(
                    spark, src,
                    spark.createDataFrame([(pick,)], "id bigint"),
                    "id", mode="dv", checkpoint_every=0)


def test_replicate_long_window_collapses_to_two_merges(spark,
                                                       tmp_path):
    """VERDICT r11 #4: a window spanning > collapse_after versions
    reduces to latest-change-per-key and applies as ONE merge_delete
    + ONE merge_upsert — bit-equal to the per-version path on the
    final table, O(1) jobs for any window length."""
    src = str(tmp_path / "src")
    # 12 versions still exceed collapse_after=8 (the property under
    # test); 20 cost 61 s of suite wall via the per-version replica
    _dml_history(spark, src, n_versions=12)
    dst_per = str(tmp_path / "dst_per")
    dst_col = str(tmp_path / "dst_col")
    T.replicate_incremental(spark, src, dst_per, "id",
                            checkpoint_every=0, collapse_after=None)
    T.replicate_incremental(spark, src, dst_col, "id",
                            checkpoint_every=0, collapse_after=8)
    assert _rows(spark, dst_col) == _rows(spark, src)
    assert _rows(spark, dst_col) == _rows(spark, dst_per)
    # job-count pin: the 20-version window applied as AT MOST one
    # delete-merge + one upsert-merge + the txn watermark stamp
    hist = T.history(dst_col)
    merges = [h for h in hist if h["op"] == "merge"]
    assert len(merges) <= 2, [h["op"] for h in hist]
    assert hist[-1]["op"] == "txn"
    # the per-version replica's history is strictly longer
    assert len(T.history(dst_per)) > len(hist)
    # exactly-once carries: nothing new -> no-op on both
    assert T.replicate_incremental(spark, src, dst_col, "id",
                                   checkpoint_every=0) is None


def test_replicate_collapse_key_lifecycle(spark, tmp_path):
    """Collapse winners: deleted-then-reinserted keys survive,
    inserted-then-deleted keys vanish, moved keys leave no twin —
    all inside ONE collapsed window."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    T.append(spark.range(10).select(
        "id", (F.col("id") * 3).alias("v")), src, checkpoint_every=0)
    T.merge_delete(spark, src,
                   spark.createDataFrame([(3,)], "id bigint"),
                   "id", mode="dv", checkpoint_every=0)
    T.append(spark.createDataFrame([(3, 999)], "id bigint, v bigint"),
             src, checkpoint_every=0)     # re-insert deleted key
    T.append(spark.createDataFrame([(77, 1)], "id bigint, v bigint"),
             src, checkpoint_every=0)
    T.merge_delete(spark, src,
                   spark.createDataFrame([(77,)], "id bigint"),
                   "id", mode="dv", checkpoint_every=0)  # ins+del
    T.update_where(spark, src, "id = 5", {"id": "id + 500"},
                   mode="dv", checkpoint_every=0)        # move
    T.update_where(spark, src, "id = 2", {"v": "v + 1"},
                   mode="dv", checkpoint_every=0)        # in-place
    T.replicate_incremental(spark, src, dst, "id",
                            checkpoint_every=0, collapse_after=0)
    assert _rows(spark, dst) == _rows(spark, src)
    got = {r.id: r.v for r in T.read(spark, dst).collect()}
    assert got[3] == 999 and 77 not in got and 5 not in got \
        and got[505] == 15 and got[2] == 7


def test_dv_noop_and_mode_validation(spark, table):
    v = T.snapshot(table)["version"]
    assert T.delete_where(spark, table, "id > 10000",
                          mode="dv") == v  # provable miss: no commit
    with pytest.raises(ValueError):
        T.delete_where(spark, table, "id = 1", mode="nope")


def test_clone_of_dv_table_row_feed_and_specs(spark, tmp_path):
    """Code-review r11 findings: a clone of a dv-bearing table must
    (a) emit only LIVE rows as the row feed's inserts — reading the
    referenced files raw resurrected deleted rows — and (b) carry
    the generated-column and bloom specs, not just schema/colmap."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    T.set_bloom_index(src, ["id"], checkpoint_every=0)
    T.append(spark.range(20).selectExpr("id", "id as s"), src,
             generated={"twice": "s * 2"}, checkpoint_every=0)
    T.delete_where(spark, src, "id < 5", mode="dv",
                   checkpoint_every=0)
    T.clone(src, dst, checkpoint_every=0)
    feed = T.read_changes_rows(spark, dst, from_version=0)
    ins = sorted(r.id for r in feed.collect())
    assert ins == list(range(5, 20))  # no resurrection
    assert all(r._change_type == "insert" for r in feed.collect())
    # replication from the clone lands exactly the live rows
    rep = str(tmp_path / "rep")
    T.replicate_incremental(spark, dst, rep, "id",
                            checkpoint_every=0)
    assert _ids(T.read(spark, rep)) == list(range(5, 20))
    # specs carried: omitted generated column computes on the clone
    assert T.snapshot(dst)["generated"] == {"twice": "s * 2"}
    assert T.snapshot(dst)["bloom"]["cols"] == ["id"]
    T.append(spark.range(20, 22).selectExpr("id", "id as s"), dst,
             checkpoint_every=0)
    row = T.read(spark, dst).where("id = 21").collect()[0]
    assert row.twice == 42
    newest = [m for m in T.snapshot(dst)["files"].values()
              if not os.path.isabs(m["path"])]
    assert any("bloom" in m for m in newest)  # index still builds


def test_replace_where_on_generated_partition(spark, tmp_path):
    """Code-review r11: replaceWhere on a generated partition
    column must compute the column before the leak guard."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(30).selectExpr("id", "id as s"), root,
             partition_by=["bucket"],
             generated={"bucket": "s % 3"}, checkpoint_every=0)
    repl = spark.range(100, 103).selectExpr(
        "id", "cast(1 as bigint) as s")  # s%3=1 -> bucket 1
    T.overwrite_where(spark, repl, root, "bucket = 1",
                      checkpoint_every=0)
    got = sorted(r.id for r in T.read(spark, root).collect())
    assert got == sorted([i for i in range(30) if i % 3 != 1]
                         + [100, 101, 102])
