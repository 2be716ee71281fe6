"""Property test (hypothesis): delete_where/update_where equal the
direct DataFrame transform of the pre-image — whatever the pruning
and two-phase hit scan decide to rewrite, the table must read back
as if the predicate ran over every row. Reuses the read_where
property's predicate generator (comparisons + NULL conjuncts over
NULL/NaN/string-edge data); each example builds a fresh multi-file
table so file finding runs for real."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.sources import txlog as T
from tests.test_readwhere_property import _norm, _predicate


def _mk(spark, root):
    mk = (lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id as i",
        "if(id % 11 = 0, cast(null as double),"
        " if(id % 13 = 0, cast('NaN' as double),"
        "  cast(id - 40 as double))) as f",
        "if(id % 7 = 0, '', concat('s', id % 19)) as s",
        "cast(id % 3 as int) as p").coalesce(1))
    for lo in range(0, 90, 30):
        T.append(mk(lo, lo + 30), root, checkpoint_every=0)


def _rows(df):
    return sorted(tuple(_norm(v) for v in r) for r in df.collect())


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cond=_predicate)
def test_predicate_dml_equals_direct_transform(spark, tmp_path_factory,
                                               cond):
    base = tmp_path_factory.mktemp("dml_prop")
    # DELETE: survivors are NOT cond OR cond IS NULL
    droot = str(base / "d")
    _mk(spark, droot)
    c = F.expr(cond)
    want_del = _rows(T.read(spark, droot).where(~c | c.isNull()))
    T.delete_where(spark, droot, cond, checkpoint_every=0)
    assert _rows(T.read(spark, droot)) == want_del, cond
    # UPDATE: matched rows transform, others (incl. NULL cond) keep
    uroot = str(base / "u")
    _mk(spark, uroot)
    pre = T.read(spark, uroot)
    want_upd = _rows(pre.select(
        "i",
        F.when(c.isNotNull() & c, F.col("f") + 1)
        .otherwise(F.col("f")).alias("f"),
        F.when(c.isNotNull() & c, F.concat(F.col("s"), F.lit("!")))
        .otherwise(F.col("s")).alias("s"),
        "p"))
    T.update_where(spark, uroot, cond,
                   {"f": "f + 1", "s": "concat(s, '!')"},
                   checkpoint_every=0)
    assert _rows(T.read(spark, uroot)) == want_upd, cond


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cond=_predicate)
def test_dv_dml_equals_rewrite_dml(spark, tmp_path_factory, cond):
    """Merge-on-read (mode='dv') and copy-on-write (the default)
    must be indistinguishable through read() for ANY generated
    predicate — same NULL/NaN/string-edge data, same verbs, the
    only difference the write strategy. Runs delete THEN update on
    the same table so update vectors stack on delete vectors."""
    base = tmp_path_factory.mktemp("dv_prop")
    roots = {}
    for m in ("rewrite", "dv"):
        root = str(base / m)
        _mk(spark, root)
        T.delete_where(spark, root, cond, mode=m, checkpoint_every=0)
        T.update_where(spark, root, "f >= 0 AND s > ''",
                       {"f": "f + i", "s": "upper(s)"},
                       mode=m, checkpoint_every=0)
        roots[m] = _rows(T.read(spark, root))
    assert roots["dv"] == roots["rewrite"], cond
