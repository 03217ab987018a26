"""Every contract query with an oracle must match DuckDB exactly at
sf0.01 — the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from taxi_rides_ny_duckdb_spark import contract
from tests.oracle import compare, duckdb_connection

contract.load_all()

_WITH_ORACLE = sorted(contract.ORACLES)
_ROWS_ONLY = sorted(set(contract.QUERIES) - set(contract.ORACLES))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, con):
    df = contract.QUERIES[name](spark, sf_dir)
    compare(df, con, contract.ORACLES[name])


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_pandas_hash_parity(name, spark, sf_dir, con):
    """Driver-faithful check: BOTH sides through pandas, stringified.

    Catches representation divergences the collect()-based compare
    normalizes away (Spark DECIMAL vs DuckDB float64, int vs HUGEINT→
    float64) — the exact classes that hash-failed p2_typed_projection
    and prof_documents_text on the real driver in rounds 1-2."""
    from tests.pandas_hash import compare_pandas_hash

    df = contract.QUERIES[name](spark, sf_dir)
    compare_pandas_hash(df, con, contract.ORACLES[name], name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    df = contract.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0
