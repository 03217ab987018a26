"""Scalar "macros" — the engine's reusable expression library.

The reference's only macro is a Jinja snippet that inlines SQL
(reference ``macros/get_payment_type_description.sql:5-16``); the dbt
package ``dbt_utils.generate_surrogate_key`` inlines an md5 expression
(call sites: reference ``stg_green_tripdata.sql:12``,
``stg_yellow_tripdata.sql:12``). The Spark-native equivalent of "a macro
that inlines SQL" is a Python function returning a Column expression —
it stays JVM-side inside whole-stage codegen, never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dbt_utils 1.0.0 null sentinel used inside generate_surrogate_key.
SURROGATE_KEY_NULL = "_dbt_utils_surrogate_key_null_"

# Normalized timestamp rendering used when a timestamp participates in a
# surrogate key. DuckDB and Spark render ``CAST(ts AS VARCHAR)`` with
# different fractional-second trimming (SURVEY §1.4), so the engine pins
# one canonical format; the DuckDB-equivalent is
# ``strftime(ts, '%Y-%m-%d %H:%M:%S')``.
TS_KEY_FORMAT = "yyyy-MM-dd HH:mm:ss"


def payment_type_description(payment_type: Column) -> Column:
    """6-branch CASE decode of payment_type codes.

    Matches reference ``macros/get_payment_type_description.sql:5-16``:
    no ELSE branch, so unknown codes and NULL fall through to NULL
    (documented at ``macros/macros_properties.yml:8-12``).
    """
    return (
        F.when(payment_type == 1, "Credit card")
        .when(payment_type == 2, "Cash")
        .when(payment_type == 3, "No charge")
        .when(payment_type == 4, "Dispute")
        .when(payment_type == 5, "Unknown")
        .when(payment_type == 6, "Voided trip")
    )


def surrogate_key(*cols: Column) -> Column:
    """md5 surrogate key over N columns, dbt_utils-1.0.0 compatible.

    Compiles to ``md5(coalesce(cast(c AS string), sentinel) || '-' ...)``
    exactly as ``dbt_utils.generate_surrogate_key`` does (reference
    ``packages.yml:2-3``). Timestamp inputs must be pre-normalized with
    :data:`TS_KEY_FORMAT` by the caller for cross-engine stability.

    Pure column expression → whole-stage codegen, no shuffle, no UDF.
    """
    parts = [F.coalesce(c.cast("string"), F.lit(SURROGATE_KEY_NULL)) for c in cols]
    return F.md5(F.concat_ws("-", *parts))


def ts_key(ts: Column) -> Column:
    """Canonical string rendering of a timestamp for keying (§1.4)."""
    return F.date_format(ts, TS_KEY_FORMAT)
