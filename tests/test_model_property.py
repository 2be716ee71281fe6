"""Model-based property test (hypothesis): random SEQUENCES of
table ops applied to the real transaction log and to a pure-Python
model must agree through read() — the interaction coverage the
per-op properties can't give (a dv delete under a rename after a
merge after a replace...). Data stays non-null ints so the model is
trivially exact; NULL/NaN edge semantics are the dedicated
per-op property files' job (test_dml_property, test_merge_property,
test_readwhere_property)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
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
)


def _apply(spark, root, model, names, next_id, op):
    """Apply one op to the table AND the model. ``model`` is
    {id: v}; ``names`` is the live (id-col, v-col) logical names
    (rename flips the v column's name); returns next_id."""
    idc, vc = names
    kind = op[0]
    if kind == "append":
        n = op[1]
        rows = [(next_id + i, (next_id + i) * 3) for i in range(n)]
        T.append(spark.createDataFrame(
            rows, f"{idc} bigint, {vc} bigint"), root,
            checkpoint_every=0)
        model.update({i: v for i, v in rows})
        return next_id + n
    if not model:
        return next_id  # mutations on an empty table: skip
    if kind == "delete":
        _, lo, mode = op
        T.delete_where(spark, root, f"{idc} >= {lo} AND {idc} < {lo + 10}",
                       mode=mode, checkpoint_every=0)
        for i in [i for i in model if lo <= i < lo + 10]:
            del model[i]
    elif kind == "update":
        _, lo, add, mode = op
        T.update_where(spark, root,
                       f"{idc} >= {lo} AND {idc} < {lo + 10}",
                       {vc: f"{vc} + {add}"},
                       mode=mode, checkpoint_every=0)
        for i in [i for i in model if lo <= i < lo + 10]:
            model[i] += add
    elif kind == "merge_upsert":
        _, lo, val = op
        # two maybe-hits + an insert in a DISJOINT id space so a
        # later append can never collide with the inserted key
        keys = [lo, lo + 3, lo + 100000]
        ups = [(k, val) for k in keys]
        T.merge_upsert(spark, root, spark.createDataFrame(
            ups, f"{idc} bigint, {vc} bigint"), idc,
            checkpoint_every=0)
        for k in keys:
            model[k] = val
    elif kind == "merge_delete":
        _, lo, mode = op
        keys = [lo, lo + 1, lo + 2]
        T.merge_delete(spark, root, spark.createDataFrame(
            [(k,) for k in keys], f"{idc} bigint"), idc,
            mode=mode, checkpoint_every=0)
        for k in keys:
            model.pop(k, None)
    elif kind == "replace":
        _, lo, n = op
        rows = [(lo + i, -1 - i) for i in range(n)]
        T.overwrite_where(spark, spark.createDataFrame(
            rows, f"{idc} bigint, {vc} bigint"), root,
            f"{idc} >= {lo} AND {idc} < {lo + 10}",
            checkpoint_every=0)
        for i in [i for i in model if lo <= i < lo + 10]:
            del model[i]
        model.update({i: v for i, v in rows})
    elif kind == "optimize":
        T.optimize(spark, root, target_bytes=1 << 20,
                   purge=op[1], checkpoint_every=0)
    elif kind == "rename":
        new = "w" if vc == "v" else "v"
        T.rename_column(root, vc, new, checkpoint_every=0)
        names[1] = new
    return next_id


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op, min_size=4, max_size=8))
def test_op_sequences_match_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("model") / "t")
    model: dict[int, int] = {}
    names = ["id", "v"]
    next_id = 0
    # always start with data so every op sequence is meaningful
    next_id = _apply(spark, root, model, names, next_id,
                     ("append", 30))
    for op in ops:
        next_id = _apply(spark, root, model, names, next_id, op)
    got = sorted(tuple(r) for r in T.read(spark, root).collect())
    want = sorted((i, v) for i, v in model.items())
    assert got == want, (ops, names)
    # the row-level feed replays to the same state when the history
    # is feed-compatible (no rewrite-mode DML in the log)
    modes = {h.get("mode", h["op"]) for h in T.history(root)}
    if {"delete", "update", "merge", "replace"} & modes == set():
        feed = T.read_changes_rows(spark, root, from_version=0)
        state: dict[int, int] = {}
        idc, vc = names
        for r in sorted(
                feed.collect(),
                key=lambda r: (r._commit_version,
                               0 if r._change_type in
                               ("delete", "update_preimage") else 1)):
            i, v = getattr(r, idc), getattr(r, vc)
            t = r._change_type
            if t in ("insert", "update_postimage"):
                state[i] = v
            elif t == "delete":
                state.pop(i, None)
            elif t == "update_preimage":
                state.pop(i, None)
        assert sorted(state.items()) == want, ops
