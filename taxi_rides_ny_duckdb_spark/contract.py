"""Driver contract registry.

Every implemented operator from SURVEY.md §2 (plus the EXTENSION
operators) registers here as a named query: a callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, an
equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. The driver compares row-count + schema + order-insensitive
value-hash per query (``__spark_entry__`` docstring).

Parity rules every query follows (SURVEY §5 gotchas):
- identical output column names on both sides (alias everything);
- no raw ``sum(double)``/``avg(double)`` — deterministic decimal-routed
  forms from ``functions.parity``;
- timestamps keyed as strings go through one pinned format
  (``functions.macros.ts_key``);
- ``date_trunc`` results cast to DATE (DuckDB's return type);
- survivors of dedup made deterministic via a total order.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a contract query; ``oracle=None`` ⇒ rows-only check
    (non-SQL-expressible op)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate contract query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers contract queries."""
    from . import contract_reference  # noqa: F401
    from . import contract_extensions  # noqa: F401
    from . import contract_taxi  # noqa: F401
