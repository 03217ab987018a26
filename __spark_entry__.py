"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``taxi_rides_ny_duckdb_spark`` package;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from taxi_rides_ny_duckdb_spark import contract  # noqa: E402
from taxi_rides_ny_duckdb_spark.session import tune_for_comparison  # noqa: E402

contract.load_all()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the 12-aggregate pricing summary
    (the dm_monthly_zone_revenue shape, SURVEY §2 A1-A4)."""
    tune_for_comparison(spark)
    return contract.QUERIES["a1_pricing_summary"](spark, _SMOKE_SF_DIR)


def _pinned(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin parity-critical session confs (UTC timezone, AQE) before the
    query builds its plan — the driver's session is not ours, and a
    non-UTC session timezone would shift every timestamp value."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_for_comparison(spark)
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ EXTENSION)."""
    return {name: _pinned(fn) for name, fn in contract.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return dict(contract.ORACLES)
