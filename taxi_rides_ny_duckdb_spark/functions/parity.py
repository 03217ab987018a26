"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent; Spark sums partitions in a
nondeterministic order while a single-node engine (the DuckDB oracle)
sums sequentially, so ``sum(double)`` can differ in the last ulp between
engines AND between runs. That breaks value-hash comparison and, at
100 TB, reproducibility of pipeline outputs.

The engine's pattern: route every money/measure sum through an exact
DECIMAL, then present as double. ``cast(double AS decimal(p,s))`` is
deterministic (round-to-nearest of the same IEEE value in both engines),
decimal addition is exact and associative → order-independent, and the
final ``cast(decimal AS double)`` is again deterministic. The same trick
makes AVG deterministic: exact decimal sum / count.

DuckDB-equivalent SQL for ``dsum(c, 18, 4)``:
``CAST(SUM(CAST(c AS DECIMAL(18,4))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, precision: int = 18, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression, presented as double.

    ``scale`` must cover the true decimal scale of the expression (e.g.
    price(2dp) * (1 - discount(2dp)) is exact at 4dp) so the decimal
    round-trip is lossless.
    """
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def present_doubles(df):
    """Present every DECIMAL column as DOUBLE at a contract boundary.

    Internal plans keep decimals (exact, order-independent sums); the
    driver's hash compares pandas string forms, where a Spark decimal
    arrives as ``Decimal('96262.50')`` but DuckDB's pandas path yields
    float64 ``96262.5`` — value-identical, string-different. Casting to
    double on BOTH sides (oracle: ``CAST(... AS DOUBLE)``) pins one
    representation. ``cast(decimal AS double)`` is deterministic, so
    this never reorders or perturbs the compared values.
    """
    from pyspark.sql.types import DecimalType

    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, DecimalType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def davg(col: Column, precision: int = 18, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count.

    ``try_divide``: an all-NULL group has count 0 — built-in avg()
    returns NULL there, a bare ``/`` raises DIVIDE_BY_ZERO under the
    ambient ANSI mode (r7 sweep); try_divide returns NULL in both ANSI
    modes, which is also what the DuckDB oracle's x/0 yields."""
    return F.try_divide(
        F.sum(col.cast(f"decimal({precision},{scale})")).cast("double"),
        F.count(col),
    )
