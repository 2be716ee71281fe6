"""Property test (hypothesis): merge_upsert == the stated MERGE
semantics for arbitrary generated key/update sets — every base row
whose key matches an update key is replaced (ALL duplicates of a
matched key collapse to the single update row), unmatched base rows
survive, unmatched update keys insert. Keys include NaN (Spark join
keys match NaN = NaN) and values None; each example builds a fresh
3-file table so footer-stat pruning (fast bisect regime) runs for
real before the rewrite."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gcp_data_engineering_workshop_spark.sources import txlog as T

_key = st.one_of(
    st.integers(min_value=-5, max_value=25).map(float),
    st.just(float("nan")))


def _tok(k: float) -> str:
    return "nan" if k != k else repr(k)


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=st.lists(_key, min_size=1, max_size=30),
       ups=st.lists(_key, min_size=1, max_size=10, unique_by=_tok))
def test_merge_upsert_matches_semantics(spark, tmp_path_factory,
                                        base, ups):
    root = str(tmp_path_factory.mktemp("merge_prop") / "t")
    rows = [(k, float(i)) for i, k in enumerate(base)]
    per = max(1, len(rows) // 3)
    for c in range(0, len(rows), per):
        T.append(spark.createDataFrame(rows[c:c + per],
                                       "k double, v double")
                 .coalesce(1), root, checkpoint_every=0)
    updates = [(k, -1.0 - i) for i, k in enumerate(ups)]
    T.merge_upsert(spark, root,
                   spark.createDataFrame(updates,
                                         "k double, v double"),
                   "k", checkpoint_every=0)
    got = sorted((_tok(r.k), r.v)
                 for r in T.read(spark, root).collect())
    upd = {_tok(k): v for k, v in updates}
    want = sorted([( _tok(k), v) for k, v in rows
                   if _tok(k) not in upd]
                  + list(upd.items()))
    assert got == want
