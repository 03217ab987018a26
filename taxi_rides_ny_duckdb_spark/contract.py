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
# Unmemoized builders — physical-plan tests need a virgin QueryExecution
# (an already-executed DataFrame's adaptive plan string includes both
# initial and final plans, breaking operator-count assertions).
BUILDERS: dict[str, QueryFn] = {}

# Built logical plans, keyed by (query, session, sf_dir). DataFrames are
# immutable and lazy, so handing the same object back is semantically a
# re-run — this is exactly dbt's view materialization (the compiled
# plan persists; every query re-executes it). It matters for timing
# honesty too: expression-heavy plans (e.g. IVF centroid rankings)
# cost ~1 s of py4j round trips to BUILD, which would otherwise be
# billed to every execution, while the DuckDB baseline re-parses a SQL
# string in microseconds.
_PLANS: dict[tuple, DataFrame] = {}


def query(
    name: str, oracle: str | None = None, memoize: bool = True
) -> Callable[[QueryFn], QueryFn]:
    """Register a contract query; ``oracle=None`` ⇒ rows-only check
    (non-SQL-expressible op). ``memoize=False`` opts out of plan reuse —
    required for queries that do eager work inside the builder (e.g.
    driving a streaming job to a sink), where handing back the old
    result table would skip the work a re-run is supposed to measure."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate contract query {name!r}")
        BUILDERS[name] = fn
        if memoize:

            def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
                key = (name, id(spark), sf_dir)
                if key not in _PLANS:
                    _PLANS[key] = fn(spark, sf_dir)
                return _PLANS[key]

            cached.__name__ = fn.__name__
            cached.__doc__ = fn.__doc__
            QUERIES[name] = cached
        else:
            QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers contract queries."""
    from . import contract_reference  # noqa: F401
    from . import contract_tpch  # noqa: F401
    from . import contract_extensions  # noqa: F401
    from . import contract_taxi  # noqa: F401
