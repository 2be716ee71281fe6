"""Property test (hypothesis): read_where(cond) == read().where(cond)
for ARBITRARY generated predicates — the conjunct parser and
_stat_excludes may only ever skip IO, never change rows. The data is
built once per session with every blind spot the pruning rules have
to respect: NULLs, NaN, negative floats, empty/quoted strings, and
range-clustered files so pruning actually fires; one flat table and
one hive-partitioned twin."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T

_COLS = ("i", "f", "s", "p")
_OPS = ("<", "<=", ">", ">=", "=", "==")

_lit_int = st.integers(min_value=-50, max_value=150)
_lit_float = st.floats(min_value=-50, max_value=150,
                       allow_nan=False, allow_infinity=False,
                       width=32).map(lambda v: round(v, 3))
_lit_str = st.sampled_from(
    ["", "a", "abc", "x AND y", "zzz", "s1", "s-17"])


def _render(lit) -> str:
    if isinstance(lit, str):
        return "'" + lit + "'"
    return repr(lit)


# literals stay type-compatible with their column (Spark's ANSI
# cast rejects e.g. bigint < '' outright — an invalid predicate,
# not a pruning case); numeric columns see int AND float literals
# (promotion is the interesting path), the string column strings
_cmp_clause = st.sampled_from(("i", "f", "p", "s")).flatmap(
    lambda c: st.tuples(
        st.just(c), st.sampled_from(_OPS),
        _lit_str if c == "s" else st.one_of(_lit_int, _lit_float))
).map(lambda t: f"{t[0]} {t[1]} {_render(t[2])}")

_null_clause = st.tuples(
    st.sampled_from(_COLS),
    st.sampled_from(("IS NULL", "IS NOT NULL"))
).map(lambda t: f"{t[0]} {t[1]}")

_comparison = st.one_of(_cmp_clause, _cmp_clause, _null_clause)

_predicate = st.lists(_comparison, min_size=1, max_size=3).flatmap(
    lambda cs: st.sampled_from([" AND ", " OR "]).map(
        lambda j: j.join(cs)))


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("rw_prop")
    mk = (lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id as i",
        # f: NaN every 13th, NULL every 11th, negative shifts
        "if(id % 11 = 0, cast(null as double),"
        " if(id % 13 = 0, cast('NaN' as double),"
        "  cast(id - 40 as double))) as f",
        "if(id % 7 = 0, '', concat('s', id % 19)) as s",
        "cast(id % 3 as int) as p").coalesce(1))
    flat = str(base / "flat")
    part = str(base / "part")
    for lo in range(0, 120, 30):  # 4 range-clustered files
        T.append(mk(lo, lo + 30), flat, checkpoint_every=0)
    T.append(mk(0, 120), part, partition_by=["p"], checkpoint_every=0)
    return flat, part


def _norm(v):
    # NaN != NaN and None is unorderable: fold both to sortable,
    # equality-stable tokens before comparing row sets
    if v is None:
        return "<null>"
    if isinstance(v, float) and v != v:
        return "<nan>"
    return str(v)


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cond=_predicate)
def test_read_where_equals_full_filter(spark, tables, cond):
    for root in tables:
        got = sorted(
            tuple(_norm(v) for v in r)
            for r in T.read_where(spark, root, cond).collect())
        want = sorted(
            tuple(_norm(v) for v in r)
            for r in T.read(spark, root).where(cond).collect())
        assert got == want, (root, cond)


@pytest.fixture(scope="module")
def mapped_table(spark, tmp_path_factory):
    """A COLUMN-MAPPED twin (r11 third stint): the same data lands
    under original names (i0/f0/s0), three renames re-point the
    logical schema, and one more file lands POST-rename (written
    physically under the original names) — so the property runs
    over a mixed-age mapped table with every pruning blind spot."""
    base = tmp_path_factory.mktemp("rw_prop_map")
    mk = (lambda lo, hi, a, b, c: spark.range(lo, hi).selectExpr(
        f"id as {a}",
        f"if(id % 11 = 0, cast(null as double),"
        f" if(id % 13 = 0, cast('NaN' as double),"
        f"  cast(id - 40 as double))) as {b}",
        f"if(id % 7 = 0, '', concat('s', id % 19)) as {c}",
        "cast(id % 3 as int) as p").coalesce(1))
    root = str(base / "mapped")
    for lo in range(0, 90, 30):
        T.append(mk(lo, lo + 30, "i0", "f0", "s0"), root,
                 checkpoint_every=0)
    for old, new in (("i0", "i"), ("f0", "f"), ("s0", "s")):
        T.rename_column(root, old, new, checkpoint_every=0)
    T.append(mk(90, 120, "i", "f", "s"), root, checkpoint_every=0)
    return root


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cond=_predicate)
def test_read_where_equals_full_filter_mapped(spark, mapped_table,
                                              cond):
    got = sorted(
        tuple(_norm(v) for v in r)
        for r in T.read_where(spark, mapped_table, cond).collect())
    want = sorted(
        tuple(_norm(v) for v in r)
        for r in T.read(spark, mapped_table).where(cond).collect())
    assert got == want, cond
