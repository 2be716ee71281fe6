"""E22: per-file bloom filter indexes — point-equality data
skipping on high-cardinality unordered columns where footer
[min,max] ranges cannot prune (sources/txlog.py, the Delta
bloom-filter-index idea on parquet's own optional-bloom shape)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T


def _cand(root, cond):
    snap = T.snapshot(root)
    return T._files_possibly_matching(
        snap, T._parse_conjuncts(cond), root)


@pytest.fixture
def table(spark, tmp_path):
    """Four HASH-sliced files (id % 4): every file's [min,max] id
    range covers nearly the whole domain, so range stats alone
    cannot prune a point lookup — the bloom case."""
    root = str(tmp_path / "tbl")
    T.set_bloom_index(root, ["id", "tag"], checkpoint_every=0)
    df = spark.range(400).select(
        "id", F.concat(F.lit("u"), F.col("id")).alias("tag"))
    for b in range(4):
        T.append(df.where(F.col("id") % 4 == b).coalesce(1), root,
                 checkpoint_every=0)
    return root


def test_bloom_prunes_point_lookups(spark, table):
    # ranges alone keep all 4 files; the bloom keeps exactly the
    # one hash slice holding the key
    assert len(_cand(table, "id = 17")) == 1
    assert len(_cand(table, "tag = 'u18'")) == 1
    # a value NO file holds prunes everything
    assert _cand(table, "id = 100000") == []
    assert _cand(table, "tag = 'nope'") == []
    # range predicates are untouched by the index (still 4)
    assert len(_cand(table, "id >= 0")) == 4
    # and exactness holds end to end
    assert [r.id for r in
            T.read_where(spark, table, "id = 17").collect()] == [17]
    assert T.read_where(spark, table, "id = 100000").count() == 0


def test_bloom_dml_and_rewrite_recompute(spark, table):
    """Equality DML rides the same pruning; rewrites (merge/
    OPTIMIZE) recompute sidecars for their fresh files."""
    T.delete_where(spark, table, "id = 17", checkpoint_every=0)
    assert T.read(spark, table).count() == 399
    # the rewrite's fresh file carries a new sidecar
    snap = T.snapshot(table)
    assert all("bloom" in m for m in snap["files"].values())
    assert len(_cand(table, "id = 21")) == 1
    T.optimize(spark, table, checkpoint_every=0)
    snap = T.snapshot(table)
    assert all("bloom" in m for m in snap["files"].values())
    # after compaction to one file, the lookup opens that one
    assert len(_cand(table, "id = 21")) == len(snap["files"])


def test_bloom_pre_index_files_and_drop(spark, tmp_path):
    """Files written BEFORE the index have no sidecar and never
    prune (conservative); OPTIMIZE back-fills by rewriting;
    drop_bloom_index stops new sidecars."""
    root = str(tmp_path / "tbl")
    df = spark.range(100).select("id")
    T.append(df.where("id % 2 = 0").coalesce(1), root,
             checkpoint_every=0)
    T.set_bloom_index(root, ["id"], checkpoint_every=0)
    T.append(df.where("id % 2 = 1").coalesce(1), root,
             checkpoint_every=0)
    snap = T.snapshot(root)
    assert sum(1 for m in snap["files"].values()
               if "bloom" in m) == 1
    # an in-range odd id: the indexed odd file's bloom keeps it AND
    # the unindexed even file survives on its covering range
    # (conservative) -> 2 candidates where full indexing gives 1
    assert len(_cand(root, "id = 3")) == 2
    # an in-range even id: the odd file's bloom EXCLUDES it -> 1
    assert len(_cand(root, "id = 2")) == 1
    T.optimize(spark, root, target_bytes=1 << 30, checkpoint_every=0)
    assert len(_cand(root, "id = 3")) == 1  # back-filled by rewrite
    T.drop_bloom_index(root, checkpoint_every=0)
    T.append(spark.range(100, 103).select("id"), root,
             checkpoint_every=0)
    newest = [m for m in T.snapshot(root)["files"].values()
              if m["stats"]["id"][0] >= 100]
    assert all("bloom" not in m for m in newest)


def test_bloom_caps_and_vacuum(spark, tmp_path):
    """A column whose distinct count exceeds max_ndv is omitted in
    that file (no filter, no pruning, never wrong); referenced
    sidecars survive vacuum, orphaned ones age out."""
    root = str(tmp_path / "tbl")
    T.set_bloom_index(root, ["id"], max_ndv=10, checkpoint_every=0)
    T.append(spark.range(100).select("id").coalesce(1), root,
             checkpoint_every=0)  # 100 distinct > cap 10
    snap = T.snapshot(root)
    assert all("bloom" not in m for m in snap["files"].values())
    # re-index with a real cap; rewrite picks it up
    T.set_bloom_index(root, ["id"], checkpoint_every=0)
    T.optimize(spark, root, target_bytes=1 << 30, purge=True,
               checkpoint_every=0)
    T.append(spark.range(100, 200).select("id").coalesce(1), root,
             checkpoint_every=0)
    removed = T.vacuum(root, retention_seconds=0.0)
    assert not any(r.startswith("_bloom/") for r in removed)
    assert len(_cand(root, "id = 150")) == 1
    # a rewrite orphans the old sidecars; a checkpoint bounds the
    # reference scan and vacuum reclaims them
    T.optimize(spark, root, target_bytes=1 << 30, checkpoint_every=0)
    T._maybe_checkpoint(root, T.snapshot(root)["version"], 1)
    removed = T.vacuum(root, retention_seconds=0.0)
    assert any(r.startswith("_bloom/") for r in removed)
    assert T.read(spark, root).count() == 200


def test_bloom_with_column_mapping(spark, tmp_path):
    """Sidecars key LOGICAL names; physically renamed files index
    correctly, and renaming an indexed column refuses."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(50).selectExpr("id", "id * 2 as v")
             .coalesce(1), root, checkpoint_every=0)
    T.rename_column(root, "v", "value", checkpoint_every=0)
    T.set_bloom_index(root, ["value"], checkpoint_every=0)
    T.append(spark.range(50, 100).selectExpr("id", "id * 2 as value")
             .coalesce(1), root, checkpoint_every=0)
    # post-index file prunes on the logical name (stored phys 'v')
    assert len(_cand(root, "value = 120")) == 1  # indexed file hit
    # value=121 is odd -> not in the indexed file; the pre-index
    # file has no sidecar and survives on its range
    assert len(_cand(root, "value = 121")) <= 1
    with pytest.raises(ValueError, match="bloom"):
        T.rename_column(root, "value", "w")


def test_bloom_refines_merge_key_pruning(spark, table):
    """A scattered-key upsert on a hash-laid-out table: ranges keep
    every file, the bloom keeps ~the files actually holding the
    keys — MERGE rewrites those only."""
    ups = spark.createDataFrame(
        [(17, "u17"), (18, "u18"), (19, "u19")],
        "id bigint, tag string")
    # ids 17,18,19 live in slices 1,2,3 -> exactly 3 files touched
    T.merge_upsert(spark, table, ups, "id", checkpoint_every=0)
    h = T.history(table)[-1]
    assert h["op"] == "merge" and h["n_remove"] <= 3
    got = T.read(spark, table).where("id in (17,18,19)").collect()
    assert sorted(r.tag for r in got) == ["u17", "u18", "u19"]
    # by-key delete rides the same refinement
    T.merge_delete(spark, table,
                   spark.createDataFrame([(20,)], "id bigint"),
                   "id", checkpoint_every=0)
    assert T.history(table)[-1]["n_remove"] <= 1
    assert T.read(spark, table).where("id = 20").count() == 0


def test_stale_sidecar_never_prunes_after_drop_and_rename(spark,
                                                          tmp_path):
    """Code-review r11: a dropped index's stale sidecar keyed by a
    REUSED logical name must not prune. drop index -> rename the
    indexed column away -> rename another column into its name: the
    old per-file filters describe the wrong column's values and are
    ignored (only the LIVE spec's columns probe)."""
    root = str(tmp_path / "tbl")
    T.set_bloom_index(root, ["a"], checkpoint_every=0)
    T.append(spark.range(50).selectExpr("id as a", "id + 1000 as c")
             .coalesce(1), root, checkpoint_every=0)
    T.drop_bloom_index(root, checkpoint_every=0)
    T.rename_column(root, "a", "x", checkpoint_every=0)
    T.rename_column(root, "c", "a", checkpoint_every=0)
    # 'a' now holds 1000..1049; the stale sidecar knows 0..49 only
    assert len(_cand(root, "a = 1005")) == 1  # NOT pruned away
    assert T.read_where(spark, root, "a = 1005").count() == 1
    # merge on the reused name also keeps the file: the existing
    # a=1005 row MATCHES and updates (x -> 60). Had the stale
    # sidecar mis-pruned the file, the merge would have missed it
    # and inserted a duplicate (count 2) instead.
    T.merge_upsert(spark, root, spark.createDataFrame(
        [(60, 1005)], "x bigint, a bigint"), "a",
        checkpoint_every=0)
    got = T.read(spark, root).where("a = 1005").collect()
    assert len(got) == 1 and got[0].x == 60


def test_reindexed_reused_name_never_probes_stale_sidecars(
        spark, tmp_path):
    """ADVICE r12 (medium): the r11 live-spec guard only covers the
    NO-reindex case — drop index -> drop_column -> rename another
    column into the freed name -> set_bloom_index REVIVES the stale
    probes if sidecar entries key logical names. Entries now key
    PHYSICAL names (never reused, _evolved_colmap tombstones them),
    so the old files' sidecars describe a physical name the reused
    logical can never map to."""
    root = str(tmp_path / "tbl")
    T.set_bloom_index(root, ["a"], checkpoint_every=0)
    T.append(spark.range(50).selectExpr("id as a", "id + 1000 as c")
             .coalesce(1), root, checkpoint_every=0)
    T.drop_bloom_index(root, checkpoint_every=0)
    T.drop_column(root, "a", checkpoint_every=0)
    T.rename_column(root, "c", "a", checkpoint_every=0)
    T.set_bloom_index(root, ["a"], checkpoint_every=0)
    # 'a' now holds 1000..1049; the old file's sidecar knows the
    # DROPPED column's 0..49 — probing it would prune the hit away
    assert len(_cand(root, "a = 1010")) == 1
    assert T.read_where(spark, root, "a = 1010").count() == 1
    # new writes key sidecars physically; lookups keep pruning
    T.append(spark.range(1).selectExpr("id + 2000 as a")
             .coalesce(1), root, checkpoint_every=0)
    assert T.read_where(spark, root, "a = 2000").count() == 1
    assert T.read_where(spark, root, "a = 1010").count() == 1
    # the merge fast path probes through the same physical keying:
    # the matched row updates in place, never duplicates
    T.merge_upsert(spark, root, spark.createDataFrame(
        [(1010,)], "a bigint"), "a", checkpoint_every=0)
    assert T.read(spark, root).where("a = 1010").count() == 1


def test_torn_sidecar_degrades_to_no_pruning(spark, tmp_path):
    """ADVICE r12 (low): a corrupt/truncated sidecar whose add
    action committed must degrade to no-pruning, not crash every
    probing read with JSONDecodeError."""
    root = str(tmp_path / "tbl")
    T.set_bloom_index(root, ["id"], checkpoint_every=0)
    T.append(spark.range(50).select("id").coalesce(1), root,
             checkpoint_every=0)
    snap = T.snapshot(root)
    (path, meta), = snap["files"].items()
    ref = meta["bloom"]
    sidecar = os.path.join(
        root, ref["path"] if isinstance(ref, dict) else ref)
    with open(sidecar, "w") as fh:
        fh.write('{"id": {"m": 64, "k"')  # torn mid-write
    T._bloom_load.cache_clear()
    # driver probe regime: survives, conservatively keeps the file
    assert _cand(root, "id = 7") == [path]
    assert T.read_where(spark, root, "id = 7").count() == 1
    # with a spark handle the same candidate set survives
    got = T._files_possibly_matching(
        T.snapshot(root), T._parse_conjuncts("id = 7"), root, spark)
    assert got == [path]
    # merge fast path
    T.merge_upsert(spark, root, spark.createDataFrame(
        [(7,)], "id bigint"), "id", checkpoint_every=0)
    assert T.read(spark, root).where("id = 7").count() == 1
    T._bloom_load.cache_clear()


def test_restore_rolls_bloom_spec(spark, tmp_path):
    root = str(tmp_path / "tbl")
    T.append(spark.range(10).select("id"), root, checkpoint_every=0)
    v_pre = T.snapshot(root)["version"]
    T.set_bloom_index(root, ["id"], checkpoint_every=0)
    T.restore(root, v_pre, checkpoint_every=0)
    assert T.snapshot(root)["bloom"] == {}
    T.append(spark.range(10, 12).select("id"), root,
             checkpoint_every=0)
    newest = [m for m in T.snapshot(root)["files"].values()
              if m["stats"]["id"][0] >= 10]
    assert all("bloom" not in m for m in newest)


def test_backfill_prunes_like_born_indexed(spark, tmp_path):
    """VERDICT r11 #3: backfill_bloom_index builds sidecars for
    pre-index files WITHOUT rewriting data — the back-filled table
    prunes point reads identically to a born-indexed one, and the
    back-fill commit removes zero files."""
    # born-indexed twin
    born = str(tmp_path / "born")
    T.set_bloom_index(born, ["id"], checkpoint_every=0)
    df = spark.range(400).select("id")
    for b in range(4):
        T.append(df.where(F.col("id") % 4 == b).coalesce(1), born,
                 checkpoint_every=0)
    # back-filled twin: same layout, index declared AFTER the data
    late = str(tmp_path / "late")
    for b in range(4):
        T.append(df.where(F.col("id") % 4 == b).coalesce(1), late,
                 checkpoint_every=0)
    T.set_bloom_index(late, ["id"], checkpoint_every=0)
    assert len(_cand(late, "id = 17")) == 4  # nothing indexed yet
    v = T.backfill_bloom_index(spark, late, checkpoint_every=0)
    assert v is not None
    # identical pruning to the born-indexed table
    for cond in ("id = 17", "id = 100000", "id >= 0"):
        assert len(_cand(late, cond)) == len(_cand(born, cond))
    assert len(_cand(late, "id = 17")) == 1
    # zero files rewritten: n_remove == 0 on the back-fill commit,
    # and the data files are byte-identical paths
    h = T.history(late)[-1]
    assert h["op"] == "bloom-backfill" and h["n_remove"] == 0
    assert T.read_where(spark, late, "id = 17").count() == 1
    # idempotent: everything indexed -> no-op
    assert T.backfill_bloom_index(spark, late,
                                  checkpoint_every=0) is None


def test_backfill_is_datachange_false_for_streams(spark, tmp_path):
    """A back-fill commit re-adds every file; the stream and CDF
    planners must NOT re-emit those rows (optimize's
    dataChange=false rule), and the row feed skips it."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(10).select("id").coalesce(1), root,
             checkpoint_every=0)
    T.set_bloom_index(root, ["id"], checkpoint_every=0)
    T.backfill_bloom_index(spark, root, checkpoint_every=0)
    head = T.snapshot(root)["version"]
    assert T._plan_window(root, 0, head, False) != []  # the append
    assert [v for v, _op, _a in T._plan_window(root, 0, head, False)
            ] == [1]
    assert all(t[3] == 1 for t in T._plan_cdf_window(root, 0, head))
    feed = T.read_changes_rows(spark, root, from_version=0)
    assert feed.count() == 10  # inserts only, no re-emit
    # vacuum keeps the consolidated sidecar while referenced
    assert not [r for r in T.vacuum(root, retention_seconds=0)
                if r.startswith("_bloom/")]


def test_backfill_consolidates_sidecars(spark, tmp_path):
    """Consolidated group sidecars: a back-fill (or one commit) of
    many files writes O(files/_BLOOM_GROUP) JSONs, not one per
    file; probing still resolves per-file entries."""
    root = str(tmp_path / "tbl")
    df = spark.range(200).select("id")
    # 10 pre-index files
    for b in range(10):
        T.append(df.where(F.col("id") % 10 == b).coalesce(1), root,
                 checkpoint_every=0)
    T.set_bloom_index(root, ["id"], checkpoint_every=0)
    import gcp_data_engineering_workshop_spark.sources.txlog as _T
    old = _T._BLOOM_GROUP
    try:
        _T._BLOOM_GROUP = 4  # force 3 groups for 10 files
        T.backfill_bloom_index(spark, root, checkpoint_every=0)
    finally:
        _T._BLOOM_GROUP = old
    sidecars = os.listdir(os.path.join(root, T._BLOOM_DIR))
    assert len(sidecars) == 3
    snap = T.snapshot(root)
    assert all(isinstance(m["bloom"], dict)
               for m in snap["files"].values())
    assert len(_cand(root, "id = 17")) == 1
    assert T.read_where(spark, root, "id = 17").count() == 1
    # merge fast path probes through the consolidated refs too
    T.merge_upsert(spark, root, spark.createDataFrame(
        [(17,)], "id bigint"), "id", checkpoint_every=0)
    assert T.history(root)[-1]["n_remove"] <= 1


def test_backfill_requires_index(spark, tmp_path):
    root = str(tmp_path / "tbl")
    T.append(spark.range(5).select("id"), root, checkpoint_every=0)
    with pytest.raises(ValueError, match="no bloom index"):
        T.backfill_bloom_index(spark, root)


def test_bloom_distributed_probe_regime(spark, table, monkeypatch):
    """Above _BLOOM_DRIVER_LOAD_BOUND candidates, the sidecar
    probes run as one Spark job — same candidate set as the driver
    regime (forced here by dropping the bound to 0)."""
    want = T._files_possibly_matching(
        T.snapshot(table), T._parse_conjuncts("id = 17"), table)
    monkeypatch.setattr(T, "_BLOOM_DRIVER_LOAD_BOUND", 0)
    got = T._files_possibly_matching(
        T.snapshot(table), T._parse_conjuncts("id = 17"), table,
        spark)
    assert got == want and len(got) == 1
    # without a spark handle the over-bound case skips refinement
    # (conservative: range survivors stay)
    loose = T._files_possibly_matching(
        T.snapshot(table), T._parse_conjuncts("id = 17"), table)
    assert set(want) <= set(loose) and len(loose) == 4
    # the DML path (which passes spark) still prunes end to end
    T.delete_where(spark, table, "id = 17", checkpoint_every=0)
    assert T.history(table)[-1]["n_remove"] == 1
