"""Smoke-check the driver contract surface itself."""

from __future__ import annotations


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_contract_is_consistent():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle_sql keys without queries: {unknown}"
