"""Property test (hypothesis): the NATIVE batch format with real
Catalyst filter pushdown returns exactly read().where(cond) for
arbitrary generated predicates — Spark converts the .where() into
pushed Filter objects, so this drives TxLogBatchReader.pushFilters'
translation (ranges, equality, In, null checks, LIKE-prefix) over
every blind spot the pruning rules must respect: NULLs, NaN,
negative floats, empty strings, a dv-deleted slice, range-clustered
files (so skipping actually fires) and a hive-partitioned twin."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gcp_data_engineering_workshop_spark.sources import txlog as T

_COLS = ("i", "f", "s", "p", "d", "m", "t")
_OPS = ("<", "<=", ">", ">=", "=", "==")

_lit_int = st.integers(min_value=-50, max_value=150)
_lit_float = st.floats(min_value=-50, max_value=150,
                       allow_nan=False, allow_infinity=False,
                       width=32).map(lambda v: round(v, 3))
_lit_str = st.sampled_from(
    ["", "a", "abc", "zzz", "s1", "s-17"])
# date literals straddling the generated domain (2024-01-01 .. +12d)
# plus out-of-range ends; decimal literals on and off the value grid
_lit_date = st.sampled_from(
    ["2023-12-31", "2024-01-01", "2024-01-04", "2024-01-06",
     "2024-01-07", "2024-01-13", "2024-02-01"])
_lit_dec = st.sampled_from(
    ["0.00", "7.25", "12.50", "12.51", "-3.00", "29.75"])
# timestamp literals straddling the generated 4-partition domain
# (2024-03-01 08:00 UTC + 6h steps) plus out-of-range ends
_lit_ts = st.sampled_from(
    ["2024-02-28 00:00:00", "2024-03-01 08:00:00",
     "2024-03-01 11:30:00", "2024-03-01 14:00:00",
     "2024-03-01 20:00:00", "2024-03-02 02:00:00",
     "2024-03-05 00:00:00"])


def _render(lit) -> str:
    if isinstance(lit, str):
        return "'" + lit + "'"
    return repr(lit)


_cmp_clause = st.sampled_from(("i", "f", "p", "s")).flatmap(
    lambda c: st.tuples(
        st.just(c), st.sampled_from(_OPS),
        _lit_str if c == "s" else st.one_of(_lit_int, _lit_float))
).map(lambda t: f"{t[0]} {t[1]} {_render(t[2])}")

# r13 (VERDICT r12 #3): date and decimal literals push through
# pushFilters' normalization — dates prune via ISO partition
# tokens, decimals ride the inert-but-pushed path
_date_clause = st.tuples(
    st.sampled_from(_OPS), _lit_date
).map(lambda t: f"d {t[0]} date '{t[1]}'")

_dec_clause = st.tuples(
    st.sampled_from(_OPS), _lit_dec
).map(lambda t: f"m {t[0]} {t[1]}")

# r14 (VERDICT r13 #5): timestamp literals push tz-aware and
# normalize to the UTC token domain — they must prune the
# ts-partitioned twin and stay exact everywhere
_ts_clause = st.tuples(
    st.sampled_from(_OPS), _lit_ts
).map(lambda t: f"t {t[0]} timestamp '{t[1]}'")

_null_clause = st.tuples(
    st.sampled_from(_COLS),
    st.sampled_from(("IS NULL", "IS NOT NULL"))
).map(lambda t: f"{t[0]} {t[1]}")

# the two pushed shapes the function-API property can't reach:
# In-lists and LIKE-prefix (StringStartsWith)
_in_clause = st.tuples(
    st.sampled_from(("i", "p")),
    st.lists(_lit_int, min_size=1, max_size=4, unique=True)
).map(lambda t: f"{t[0]} IN ({', '.join(map(repr, t[1]))})")

_like_clause = st.sampled_from(
    ["s LIKE 's1%'", "s LIKE 's%'", "s LIKE 'z%'", "s LIKE '%7'"])

_between_clause = st.tuples(
    st.sampled_from(("i", "f")), _lit_int, _lit_int
).map(lambda t: f"{t[0]} BETWEEN {min(t[1], t[2])}"
                f" AND {max(t[1], t[2])}")

_comparison = st.one_of(_cmp_clause, _cmp_clause, _null_clause,
                        _in_clause, _like_clause, _between_clause,
                        _date_clause, _dec_clause, _ts_clause)

# NOT wraps push as Not(...) filters the translation deliberately
# skips — the residual filter must carry the whole predicate
_maybe_not = _comparison.flatmap(
    lambda c: st.booleans().map(
        lambda n: f"NOT ({c})" if n else c))

_predicate = st.lists(_maybe_not, min_size=1, max_size=3).flatmap(
    lambda cs: st.sampled_from([" AND ", " OR "]).map(
        lambda j: j.join(cs)))


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    T.register(spark)
    base = tmp_path_factory.mktemp("fmt_prop")
    mk = (lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id as i",
        "if(id % 11 = 0, cast(null as double),"
        " if(id % 13 = 0, cast('NaN' as double),"
        "  cast(id - 40 as double))) as f",
        "if(id % 7 = 0, '', concat('s', id % 19)) as s",
        "cast(id % 3 as int) as p",
        "if(id % 17 = 0, cast(null as date), date_add("
        "date'2024-01-01', cast(id % 5 as int) * 3)) as d",
        "cast(id as decimal(10,2)) / 4 as m",
        "if(id % 23 = 0, cast(null as timestamp), "
        "timestamp_seconds(1709280000 + (id % 4) * 21600)) as t")
        .coalesce(1))
    flat = str(base / "flat")
    part = str(base / "part")
    for lo in range(0, 120, 30):  # 4 range-clustered files
        T.append(mk(lo, lo + 30), flat, checkpoint_every=0)
    # deletion vectors must mask identically through the format
    T.delete_where(spark, flat, "i >= 100 AND i < 110", mode="dv")
    T.append(mk(0, 120), part, partition_by=["p"],
             checkpoint_every=0)
    # a DATE-partitioned twin: ISO tokens must prune date literals
    dpart = str(base / "dpart")
    T.append(mk(0, 120), dpart, partition_by=["d"],
             checkpoint_every=0)
    # a TIMESTAMP-partitioned twin (r14): UTC-normalized tokens
    # must prune aware timestamp literals, NULL ts rides the hive
    # default sentinel
    tpart = str(base / "tpart")
    T.append(mk(0, 120), tpart, partition_by=["t"],
             checkpoint_every=0)
    return flat, part, dpart, tpart


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float) and v != v:
        return "<nan>"
    return str(v)


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cond=_predicate)
def test_format_scan_equals_full_filter(spark, tables, cond):
    for root in tables:
        got = sorted(
            tuple(_norm(v) for v in r)
            for r in (spark.read.format("txlog").load(root)
                      .where(cond).collect()))
        want = sorted(
            tuple(_norm(v) for v in r)
            for r in T.read(spark, root).where(cond).collect())
        assert got == want, (root, cond)


_cell_i = st.one_of(st.none(), st.integers(-1000, 1000))
_cell_d = st.one_of(st.none(), st.just(float("nan")),
                    st.floats(-100, 100, allow_nan=False,
                              width=32).map(lambda v: round(v, 3)))
_cell_s = st.one_of(st.none(), st.sampled_from(
    ["", "a", "x y", "ü", "comma,sep", "qu'ote"]))
_cell_p = st.one_of(st.none(), st.integers(0, 3))
_row = st.tuples(_cell_i, _cell_d, _cell_s, _cell_p)


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row, min_size=1, max_size=30),
       use_part=st.booleans())
def test_native_writer_parity_with_append(spark, tmp_path_factory,
                                          rows, use_part):
    """df.write.format("txlog") lands EXACTLY what append() lands
    for arbitrary typed rows — NULLs everywhere, NaN, empty and
    quoted strings, NULL partition values (the hive default
    sentinel) — flat and hive-partitioned."""
    T.register(spark)
    base = tmp_path_factory.mktemp("w_prop")
    df = spark.createDataFrame(
        rows, "i bigint, d double, s string, p int")
    root_w, root_f = str(base / "w"), str(base / "f")
    wr = df.write.format("txlog").mode("append")
    if use_part:
        wr = wr.option("partition_by", "p")
        T.append(df, root_f, checkpoint_every=0,
                 partition_by=["p"])
    else:
        T.append(df, root_f, checkpoint_every=0)
    wr.save(root_w)
    got = sorted(tuple(_norm(v) for v in r)
                 for r in T.read(spark, root_w).collect())
    want = sorted(tuple(_norm(v) for v in r)
                  for r in T.read(spark, root_f).collect())
    assert got == want, (rows, use_part)
    # and the native reader agrees with the function reader
    got2 = sorted(tuple(_norm(v) for v in r)
                  for r in (spark.read.format("txlog")
                            .load(root_w).collect()))
    assert got2 == got, (rows, use_part)
