"""Driver-faithful hash replica: compare contract queries the way the
driver does — BOTH sides converted to pandas, columns sorted by name,
rows stringified and compared order-insensitively.

The softer collect()-based compare in tests/oracle.py normalizes
decimals (``Decimal.normalize()``), which hid two real driver failures
in rounds 1-2: Spark DECIMAL(18,2) ``Decimal('96262.50')`` vs DuckDB
float64 ``96262.5``, and Spark int32 ``length()`` vs DuckDB BIGINT.
Through pandas those become different strings and the driver's hash
diverges even when values are numerically identical. This module
reproduces that exact failure mode locally.
"""

from __future__ import annotations

import pandas as pd


def pandas_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_cell(v) for v in row))
    return sorted(out, key=repr)


def _cell(v) -> str:
    # numpy arrays / lists stringify element-wise so container type
    # (np.ndarray vs list) doesn't affect the comparison.
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_cell(x) for x in v) + "]"
    # STRICT temporal stringification — no date==midnight tolerance.
    # Round 5 eliminated it at source (ADVICE r3 #4 / VERDICT r4 #6):
    # every calendar-bucket output is now TIMESTAMP on BOTH sides, so
    # Spark and DuckDB reach pandas with the same datetime64 shape and
    # identical isoformat strings. A datetime.date here means a query
    # reintroduced a DATE output that DuckDB's .df() would render as
    # datetime64 — surface it as a plain-isoformat mismatch instead of
    # papering over it.
    import datetime as dt

    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, pd.Timestamp):
        return v.isoformat(sep=" ")
    return str(v)


def compare_pandas_hash(spark_df, con, sql: str, name: str = "?") -> None:
    """Assert the pandas-stringified multisets match — the driver's
    order-insensitive value hash, minus the actual hashing."""
    s_pdf = spark_df.toPandas()
    o_pdf = con.sql(sql).df()
    assert sorted(s_pdf.columns) == sorted(o_pdf.columns), (
        f"{name}: columns differ: {sorted(s_pdf.columns)} vs {sorted(o_pdf.columns)}"
    )
    s_rows = pandas_rows(s_pdf)
    o_rows = pandas_rows(o_pdf)
    assert len(s_rows) == len(o_rows), (
        f"{name}: row counts differ: {len(s_rows)} vs {len(o_rows)}"
    )
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        sd = dict(s_pdf.dtypes.astype(str))
        od = dict(o_pdf.dtypes.astype(str))
        dtype_diff = {c: (sd[c], od[c]) for c in sd if sd[c] != od.get(c)}
        raise AssertionError(
            f"{name}: pandas-hash mismatch ({len(diffs)} rows); "
            f"dtype diffs (spark, duckdb): {dtype_diff}; "
            f"first value diffs: {diffs[:3]}"
        )
