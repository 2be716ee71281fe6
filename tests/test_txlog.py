"""E22: transaction-log table format — ACID guarantees each tested
against the documented protocol (sources/txlog.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_append_overwrite_read_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = T.append(spark.range(10), root)
    v2 = T.append(spark.range(10, 15), root)
    assert (v1, v2) == (1, 2)
    assert _ids(T.read(spark, root)) == list(range(15))
    v3 = T.overwrite(spark.range(100, 103), root)
    assert v3 == 3
    assert _ids(T.read(spark, root)) == [100, 101, 102]
    # time travel: every historical snapshot is still readable
    assert _ids(T.read(spark, root, version=1)) == list(range(10))
    assert _ids(T.read(spark, root, version=2)) == list(range(15))
    hist = T.history(root)
    assert [h["op"] for h in hist] == ["append", "append", "overwrite"]
    assert hist[2]["n_remove"] > 0


def test_snapshot_isolation(spark, tmp_path):
    """A DataFrame resolved before a commit must not see it."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(5), root)
    before = T.read(spark, root)
    T.overwrite(spark.range(50, 52), root)
    assert _ids(before) == [0, 1, 2, 3, 4]  # snapshot unchanged
    assert _ids(T.read(spark, root)) == [50, 51]


def test_atomicity_staged_files_invisible_and_vacuumable(spark, tmp_path):
    """A writer that stages data but dies before commit leaves
    garbage, never corruption: readers see nothing, vacuum removes
    the orphans, and historical files survive vacuum."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(3), root)
    # simulate a crashed writer: staged file moved in, no commit
    orphan = os.path.join(root, "part-deadbeef.parquet")
    spark.range(1000, 1001).coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "o"))
    src = [f for f in os.listdir(str(tmp_path / "o"))
           if f.endswith(".parquet")][0]
    os.replace(os.path.join(str(tmp_path / "o"), src), orphan)
    assert _ids(T.read(spark, root)) == [0, 1, 2]
    removed = T.vacuum(root)
    assert removed == ["part-deadbeef.parquet"]
    T.overwrite(spark.range(7, 9), root)
    T.vacuum(root)
    # overwrite's REMOVED files stay on disk for time travel
    assert _ids(T.read(spark, root, version=1)) == [0, 1, 2]


def test_optimistic_concurrency_interleaved_appends(spark, tmp_path):
    """Two writers racing the same version: the loser's O_EXCL
    create fails and it retries at the next number — both commits
    land, no rows lost. Simulated deterministically by pre-claiming
    the version the second writer will try first."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(5), root)
    # writer A claims version 2 out-of-band (as if it won the race)
    a_entry = {"op": "append", "ts": 0.0, "actions": []}
    assert T._try_commit(root, 2, a_entry)
    # writer B's append sees head=2 and lands at 3
    v = T.append(spark.range(5, 8), root)
    assert v == 3
    assert _ids(T.read(spark, root)) == list(range(8))


def test_overwrite_cas_conflict(spark, tmp_path):
    """Compare-and-swap overwrite: a commit between the caller's
    read and its write is detected, not silently clobbered."""
    root = str(tmp_path / "tbl")
    T.append(spark.range(4), root)
    snap_v = T.snapshot(root)["version"]
    T.append(spark.range(4, 6), root)  # concurrent commit
    with pytest.raises(T.CommitConflict):
        T.overwrite(spark.range(99, 100), root,
                    expected_version=snap_v)
    # the table is untouched by the failed overwrite
    assert _ids(T.read(spark, root)) == list(range(6))


def test_checkpoint_bounds_log_replay(spark, tmp_path):
    """After checkpoint_every commits, snapshot() starts from the
    checkpoint and replays only the suffix — resolution stays O(1)
    as the log grows, and the resolved set matches full replay."""
    root = str(tmp_path / "tbl")
    for i in range(12):
        T.append(spark.range(i * 2, i * 2 + 2), root,
                 checkpoint_every=5)
    cps = T._list_checkpoints(root)
    assert cps == [5, 10]
    snap = T.snapshot(root)
    assert snap["version"] == 12
    assert _ids(T.read(spark, root)) == list(range(24))
    # checkpoint content equals a from-scratch replay at its version
    cp = json.load(open(os.path.join(
        root, T.LOG_DIR, f"checkpoint-{10:0{T._W}d}.json")))
    full = {}
    for v in range(1, 11):
        e = json.load(open(T._version_file(root, v)))
        for a in e["actions"]:
            if "add" in a:
                full[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                full.pop(a["remove"]["path"], None)
    assert cp["files"] == full


def test_empty_table_read(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    assert T.read(spark, root).count() == 0


def test_merge_upsert_semantics(spark, tmp_path):
    """MERGE INTO over the log: matched keys replaced, unmatched
    kept, new keys inserted — and the pre-merge snapshot still
    time-travels."""
    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    T.append(base, root)
    ups = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k int, v string")
    v = T.merge_upsert(spark, root, ups, "k")
    got = {(r.k, r.v) for r in T.read(spark, root).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
    assert {(r.k, r.v) for r in T.read(spark, root, version=1).collect()} \
        == {(1, "a"), (2, "b"), (3, "c")}
    assert v == 2


def test_merge_upsert_retries_on_cas_conflict(spark, tmp_path, monkeypatch):
    """A commit landing between the merge's snapshot and its write
    fails the CAS; the merge re-runs on the fresh snapshot and the
    interleaved commit's rows survive — no lost update."""
    root = str(tmp_path / "tbl")
    T.append(spark.createDataFrame([(1, "a")], "k int, v string"), root)
    real_overwrite = T.overwrite
    state = {"raced": False}

    def racing_overwrite(df, r, expected_version=None, **kw):
        if not state["raced"]:
            state["raced"] = True
            # a concurrent append lands AFTER the merge snapshotted
            T.append(spark.createDataFrame([(9, "z")],
                                           "k int, v string"), r)
        return real_overwrite(df, r, expected_version=expected_version,
                              **kw)

    monkeypatch.setattr(T, "overwrite", racing_overwrite)
    T.merge_upsert(spark, root,
                   spark.createDataFrame([(1, "A")], "k int, v string"),
                   "k")
    got = {(r.k, r.v) for r in T.read(spark, root).collect()}
    assert got == {(1, "A"), (9, "z")}  # the raced append survived
    assert state["raced"]


def test_optimize_compacts_transactionally(spark, tmp_path):
    """OPTIMIZE: many tiny commits -> one compacted file set, rows
    identical, committed as a normal version (old snapshots still
    time-travel), and file count actually drops."""
    root = str(tmp_path / "tbl")
    for i in range(8):
        T.append(spark.range(i * 10, i * 10 + 10).repartition(4), root)
    before = T.snapshot(root)
    assert len(before["files"]) >= 16
    v = T.optimize(spark, root)
    after = T.snapshot(root)
    assert v == after["version"] == before["version"] + 1
    assert len(after["files"]) < len(before["files"])
    assert _ids(T.read(spark, root)) == list(range(80))
    # pre-optimize snapshot unchanged
    assert len(T.snapshot(root, before["version"])["files"]) \
        == len(before["files"])


def test_optimize_with_clustering_sorts_within_files(spark, tmp_path):
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    T.append(spark.range(1000).select(
        (F.col("id") * 2654435761 % 1000).alias("k")), root)
    T.optimize(spark, root, target_bytes=1500, sort_cols=["k"])
    snap = T.snapshot(root)
    assert len(snap["files"]) > 1
    # each output file is internally sorted and files are
    # range-disjoint (footer pruning keeps working)
    ranges = []
    for p in snap["files"]:
        col = pq.read_table(os.path.join(root, p)).column("k").to_pylist()
        assert col == sorted(col)
        ranges.append((min(col), max(col)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_stream_sink_exactly_once(spark, tmp_path):
    """The foreachBatch txlog sink: a real micro-batch stream lands
    each batch as one commit, and a REPLAYED batch (same batchId) is
    a no-op — no duplicate rows after restart-style redelivery."""
    root = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    spark.range(30).select(F.col("id")).coalesce(1) \
        .write.mode("overwrite").json(src)
    stream = spark.readStream.schema("id bigint").json(src)
    sink = T.stream_sink(root)
    q = stream.writeStream.foreachBatch(sink) \
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _ids(T.read(spark, root)) == list(range(30))
    committed = [h for h in T.history(root) if h["op"] == "stream-append"]
    assert committed
    # simulate Spark's replay-after-crash: same batch id, same data
    sink(spark.range(30), 0)
    assert _ids(T.read(spark, root)) == list(range(30))  # no dupes
    # a genuinely new batch still lands
    sink(spark.range(100, 103), 99)
    assert _ids(T.read(spark, root)) == list(range(30)) + [100, 101, 102]
