"""examples/run_lakehouse_table.py — the E22 user-surface tour
(partitioned create, pruned read, predicate DML, composite merge,
optimize, both time-travel modes, change feed, restore, vacuum) runs
end to end and its own invariants hold (the example asserts restore
parity and the change-feed op set internally)."""

from __future__ import annotations

import importlib.util


def _load_example():
    spec = importlib.util.spec_from_file_location(
        "run_lakehouse_table",
        "/root/repo/examples/run_lakehouse_table.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_lakehouse_table_tour(spark, sf_dir):
    res = _load_example().main(sf_dir, spark=spark)
    assert res["rows_created"] == res["rows_after_restore"] \
        == res["rows_at_create_ts"] > 0
    assert 0 < res["rows_pruned_scan"] < res["rows_created"]
    assert res["feed_ops"] == ["delete", "merge", "update"]
