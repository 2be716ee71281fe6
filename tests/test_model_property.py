"""Model-based property test (hypothesis): random SEQUENCES of
table ops applied to the real transaction log and to a pure-Python
model must agree through read() — the interaction coverage the
per-op properties can't give (a dv delete under a rename after a
merge after a replace...). Data stays non-null ints so the model is
trivially exact; NULL/NaN edge semantics are the dedicated
per-op property files' job (test_dml_property, test_merge_property,
test_readwhere_property).

r12 widens the op vocabulary (VERDICT r11 #6): CLONE-then-DML (the
sequence hops to a shallow clone mid-history and keeps mutating —
copy-on-write, vector carry and constraint carry all interact),
GENERATED-column tables (a computed column rides every write path:
appends/merges omit it, updates recompute it, replace validates it),
and CONSTRAINT add/drop toggles (the enforcement pass runs on every
subsequent write) — the r11 review rounds found bugs exactly in
these cross-feature seams (clone x CDF, replaceWhere x generated)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T

# op vocabulary: (kind, draw...) tuples the executor interprets
_op = st.one_of(
    st.tuples(st.just("append"), st.integers(3, 12)),
    st.tuples(st.just("delete"), st.integers(0, 60),
              st.sampled_from(["rewrite", "dv"])),
    st.tuples(st.just("update"), st.integers(0, 60),
              st.integers(1, 9),
              st.sampled_from(["rewrite", "dv"])),
    st.tuples(st.just("merge_upsert"), st.integers(0, 60),
              st.integers(10, 99)),
    st.tuples(st.just("merge_delete"), st.integers(0, 60),
              st.sampled_from(["rewrite", "dv"])),
    st.tuples(st.just("replace"), st.integers(0, 60),
              st.integers(2, 5)),
    st.tuples(st.just("optimize"), st.booleans()),
    st.tuples(st.just("rename"),),
    st.tuples(st.just("clone"),),
    st.tuples(st.just("constraint"),),
    # r12 second stint: the NATIVE WRITER as a sequence op — the
    # same rows land through df.write.format("txlog") wherever the
    # writer's contract allows (it refuses constraint/generated
    # tables, where the documented route is append(); the model
    # must agree either way)
    st.tuples(st.just("native_append"), st.integers(3, 12)),
)


def _append_df(spark, state, rows):
    """Build an append frame in the table's current logical shape —
    generated tables never supply the computed column."""
    idc, vc = state["names"]
    return spark.createDataFrame(rows, f"{idc} bigint, {vc} bigint")


def _apply(spark, state, op):
    """Apply one op to the table AND the model. ``state`` carries
    root, {id: v} model, live (id-col, v-col) logical names (rename
    flips the v column's name), next_id, generated flag, constraint
    flag, and a clone counter."""
    root = state["root"]
    idc, vc = state["names"]
    model = state["model"]
    kind = op[0]
    if kind in ("append", "native_append"):
        n = op[1]
        base = state["next_id"]
        rows = [(base + i, (base + i) * 3) for i in range(n)]
        df = _append_df(spark, state, rows)
        if (kind == "native_append" and not state["constraint"]
                and not state["gen"]):
            (df.write.format("txlog").mode("append")
             .option("checkpoint_every", str(state["ckpt"])).save(root))
        else:
            # constraint/generated tables refuse the native writer
            # by contract; the function API is the documented route
            T.append(df, root, checkpoint_every=state["ckpt"])
        model.update({i: v for i, v in rows})
        state["next_id"] = base + n
        return
    if kind == "clone":
        # hop the whole sequence onto a SHALLOW clone: later DML is
        # copy-on-write against the source's files (and vectors);
        # constraints/colmap/generated specs must carry
        state["n_clones"] += 1
        dst = f"{root}-c{state['n_clones']}"
        T.clone(root, dst, checkpoint_every=state["ckpt"])
        state["root"] = dst
        return
    if kind == "constraint":
        if state["constraint"]:
            T.drop_constraint(root, "c_nonneg", checkpoint_every=state["ckpt"])
        else:
            T.add_constraint(root, "c_nonneg", f"{idc} >= 0",
                             checkpoint_every=state["ckpt"])
        state["constraint"] = not state["constraint"]
        return
    if not model:
        return  # mutations on an empty table: skip
    if kind == "delete":
        _, lo, mode = op
        T.delete_where(spark, root,
                       f"{idc} >= {lo} AND {idc} < {lo + 10}",
                       mode=mode, checkpoint_every=state["ckpt"])
        for i in [i for i in model if lo <= i < lo + 10]:
            del model[i]
    elif kind == "update":
        _, lo, add, mode = op
        T.update_where(spark, root,
                       f"{idc} >= {lo} AND {idc} < {lo + 10}",
                       {vc: f"{vc} + {add}"},
                       mode=mode, checkpoint_every=state["ckpt"])
        for i in [i for i in model if lo <= i < lo + 10]:
            model[i] += add
    elif kind == "merge_upsert":
        _, lo, val = op
        # two maybe-hits + an insert in a DISJOINT id space so a
        # later append can never collide with the inserted key
        keys = [lo, lo + 3, lo + 100000]
        ups = [(k, val) for k in keys]
        T.merge_upsert(spark, root, _append_df(spark, state, ups),
                       idc, checkpoint_every=state["ckpt"])
        for k in keys:
            model[k] = val
        # an upsert may INSERT lo/lo+3 — keep the append id space
        # ahead of them or a later append would duplicate the id
        # (the model is a dict; the table would hold both rows)
        state["next_id"] = max(state["next_id"], lo + 4)
    elif kind == "merge_delete":
        _, lo, mode = op
        keys = [lo, lo + 1, lo + 2]
        T.merge_delete(spark, root, spark.createDataFrame(
            [(k,) for k in keys], f"{idc} bigint"), idc,
            mode=mode, checkpoint_every=state["ckpt"])
        for k in keys:
            model.pop(k, None)
    elif kind == "replace":
        _, lo, n = op
        rows = [(lo + i, -1 - i) for i in range(n)]
        T.overwrite_where(spark, _append_df(spark, state, rows),
                          root,
                          f"{idc} >= {lo} AND {idc} < {lo + 10}",
                          checkpoint_every=state["ckpt"])
        for i in [i for i in model if lo <= i < lo + 10]:
            del model[i]
        model.update({i: v for i, v in rows})
        # replace INSERTS lo..lo+n-1 — same id-space rule as above
        state["next_id"] = max(state["next_id"], lo + n)
    elif kind == "optimize":
        T.optimize(spark, root, target_bytes=1 << 20,
                   purge=op[1], checkpoint_every=state["ckpt"])
    elif kind == "rename":
        new = "w" if vc == "v" else "v"
        T.rename_column(root, vc, new, checkpoint_every=state["ckpt"])
        state["names"][1] = new


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op, min_size=4, max_size=8),
       gen=st.booleans())
# pinned seams the r11 review rounds showed are where the bugs live:
# clone-then-DML under a generated column with a rename and a
# replace; constraint toggles around a clone hop with a dv purge
@example(ops=[("clone",), ("delete", 0, "dv"), ("constraint",),
              ("update", 0, 5, "dv"), ("clone",),
              ("merge_delete", 3, "dv"), ("replace", 10, 3),
              ("rename",)], gen=True)
@example(ops=[("constraint",), ("append", 5), ("constraint",),
              ("clone",), ("append", 4), ("optimize", True),
              ("merge_upsert", 2, 42), ("constraint",)], gen=False)
# the native writer across the sharpest seams: through a RENAME
# (physical-name projection), onto a CLONE (absolute + relative
# file refs mix), before and after dv DML, and under a constraint
# toggle (where it must route to the function API)
@example(ops=[("native_append", 4), ("rename",),
              ("native_append", 3), ("delete", 0, "dv"),
              ("clone",), ("native_append", 3),
              ("constraint",), ("native_append", 2)], gen=False)
def test_op_sequences_match_model(spark, tmp_path_factory, ops, gen):
    root = str(tmp_path_factory.mktemp("model") / "t")
    T.register(spark)
    state = {"root": root, "model": {}, "names": ["id", "v"],
             "next_id": 0, "constraint": False, "n_clones": 0,
             "gen": gen, "ckpt": 0}
    # always start with data so every op sequence is meaningful; a
    # generated table declares g = id*2+1 on the creating append
    # (writers omit it forever after — every write path computes it)
    base_rows = [(i, i * 3) for i in range(30)]
    if gen:
        T.append(_append_df(spark, state, base_rows), root,
                 checkpoint_every=state["ckpt"], generated={"g": "id * 2 + 1"})
    else:
        T.append(_append_df(spark, state, base_rows), root,
                 checkpoint_every=state["ckpt"])
    state["model"].update({i: v for i, v in base_rows})
    state["next_id"] = 30
    for op in ops:
        _apply(spark, state, op)
    root = state["root"]
    model = state["model"]
    idc, vc = state["names"]
    got = sorted(tuple(r) for r in T.read(spark, root).collect())
    want = sorted((i, v, i * 2 + 1) if gen else (i, v)
                  for i, v in model.items())
    assert got == want, (ops, gen, state["names"])
    # the row-level feed replays to the same state when the history
    # is feed-compatible (no rewrite-mode DML in the log)
    modes = {h.get("mode", h["op"]) for h in T.history(root)}
    if {"delete", "update", "merge", "replace"} & modes == set():
        feed = T.read_changes_rows(spark, root, from_version=0)
        st_: dict[int, tuple] = {}
        for r in sorted(
                feed.collect(),
                key=lambda r: (r._commit_version,
                               0 if r._change_type in
                               ("delete", "update_preimage") else 1)):
            i = getattr(r, idc)
            row = (tuple(r)[:3] if gen else tuple(r)[:2])
            t = r._change_type
            if t in ("insert", "update_postimage"):
                st_[i] = row
            else:  # delete / update_preimage
                st_.pop(i, None)
        assert sorted(st_.values()) == want, (ops, gen)


def _full_replay_snapshot(root, v):
    """snapshot(v) resolved with every checkpoint IGNORED — the
    ground truth the checkpoint machinery must reproduce."""
    orig = T._list_checkpoints
    T._SNAPSHOTS.clear()
    T._list_checkpoints = lambda r: []
    try:
        return T.snapshot(root, v)
    finally:
        T._list_checkpoints = orig
        T._SNAPSHOTS.clear()


# r16 (VERDICT r15 #2, driver verify budget): 10 derandomized
# examples, matching the base model property — this variant was 25
# and alone cost 272 s of the 2740 s suite; the three pinned
# regression @examples below are unaffected.
@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op, min_size=4, max_size=8),
       gen=st.booleans(), tear=st.booleans())
@example(ops=[("clone",), ("delete", 0, "dv"), ("constraint",),
              ("update", 0, 5, "dv"), ("rename",),
              ("merge_delete", 3, "dv"), ("replace", 10, 3),
              ("optimize", True)], gen=True, tear=True)
def test_op_sequences_under_aggressive_checkpointing(
        spark, tmp_path_factory, ops, gen, tear):
    """VERDICT r13 #7: the model property under checkpoint_every=2
    — every other commit lands a columnar checkpoint (incremental
    stats_parsed build through DML/rename/clone/optimize), read
    parity holds after EVERY op, snapshot(v) equals the
    checkpoint-free full replay at EVERY version, and a TORN
    checkpoint mid-sequence (parquet sidecar deleted) degrades to
    older/full-replay with identical results."""
    import os

    root = str(tmp_path_factory.mktemp("modelck") / "t")
    T.register(spark)
    state = {"root": root, "model": {}, "names": ["id", "v"],
             "next_id": 0, "constraint": False, "n_clones": 0,
             "gen": gen, "ckpt": 2}
    base_rows = [(i, i * 3) for i in range(30)]
    if gen:
        T.append(_append_df(spark, state, base_rows), root,
                 checkpoint_every=state["ckpt"],
                 generated={"g": "id * 2 + 1"})
    else:
        T.append(_append_df(spark, state, base_rows), root,
                 checkpoint_every=state["ckpt"])
    state["model"].update({i: v for i, v in base_rows})
    state["next_id"] = 30

    def check_read():
        got = sorted(tuple(r) for r in
                     T.read(spark, state["root"]).collect())
        want = sorted((i, v, i * 2 + 1) if gen else (i, v)
                      for i, v in state["model"].items())
        assert got == want, (ops, gen, tear, state["names"])

    for j, op in enumerate(ops):
        _apply(spark, state, op)
        check_read()  # parity after EVERY op
        if tear and j == len(ops) // 2:
            # torn checkpoint: newest parquet sidecar vanishes
            cps = T._list_checkpoints(state["root"])
            if cps:
                sidecar = os.path.join(
                    T._log_path(state["root"]),
                    f"checkpoint-{cps[-1]:0{T._W}d}.files.parquet")
                if os.path.exists(sidecar):
                    os.unlink(sidecar)
                T._SNAPSHOTS.clear()
                T._CP_STORES.clear()
                check_read()  # degraded resolution stays exact
    # snapshot(v) == full replay(v) at EVERY version of the final
    # table (checkpoints are pure acceleration, never semantics)
    root = state["root"]
    for v in T._list_versions(root):
        T._SNAPSHOTS.clear()
        got_s = T.snapshot(root, v)
        want_s = _full_replay_snapshot(root, v)
        assert dict(got_s["files"].items()) == \
            dict(want_s["files"].items()), (ops, v)
        for k in ("txn", "schema", "partition_by", "colmap",
                  "generated", "bloom", "constraints", "features",
                  "phys_dropped"):
            assert got_s[k] == want_s[k], (ops, v, k)
