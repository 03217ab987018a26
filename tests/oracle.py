"""Local replica of the driver's DuckDB-oracle comparison.

Runs a contract query's Spark DataFrame and its DuckDB oracle SQL on
the same parquet tables and compares row count, column names, and the
order-insensitive multiset of row values. Stricter than a hash: exact
value equality (the engine's parity rules are designed to make values
bit-identical, not merely close).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb

from taxi_rides_ny_duckdb_spark.sources.registry import TESTDATA_TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))  # repr → full precision; demands bit-equality
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    oracle = con.sql(sql)
    o_cols = list(oracle.columns)
    s_cols = list(spark_df.columns)
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"

    cols_sorted = sorted(s_cols)
    s_rows = [
        tuple(_norm(r[c]) for c in cols_sorted) for r in spark_df.collect()
    ]
    o_raw = oracle.fetchall()
    idx = [o_cols.index(c) for c in cols_sorted]
    o_rows = [tuple(_norm(row[i]) for i in idx) for row in o_raw]

    assert len(s_rows) == len(o_rows), f"row counts differ: {len(s_rows)} vs {len(o_rows)}"
    s_sorted = sorted(s_rows, key=repr)
    o_sorted = sorted(o_rows, key=repr)
    if s_sorted != o_sorted:
        diffs = [
            (a, b) for a, b in zip(s_sorted, o_sorted) if a != b
        ][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(s_sorted, o_sorted) if a != b)} rows); "
            f"first diffs (spark, duckdb): {diffs}"
        )
