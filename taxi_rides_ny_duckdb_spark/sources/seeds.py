"""Seed loader — CSV with explicit schema + column-type overrides.

Reference analog: ``dbt seed`` loading ``data/taxi_zone_lookup.csv``
with the ``locationid: numeric`` column override (reference
``dbt_project.yml:45-49``). dbt infers types then applies overrides; we
require an explicit StructType (never ``inferSchema`` — a second pass
over the file and nondeterministic at scale) and apply overrides as
post-read casts so the override surface matches dbt's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Canonical seed schema for the zone lookup (reference
# data/taxi_zone_lookup.csv:1 header: locationid,borough,zone,service_zone).
TAXI_ZONE_LOOKUP_SCHEMA = T.StructType(
    [
        T.StructField("locationid", T.IntegerType()),
        T.StructField("borough", T.StringType()),
        T.StructField("zone", T.StringType()),
        T.StructField("service_zone", T.StringType()),
    ]
)


def load_seed_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    column_overrides: dict[str, str] | None = None,
) -> DataFrame:
    """Load a seed CSV with a declared schema and optional per-column
    type overrides (dbt ``column_types`` semantics).

    Note on the reference's ``locationid: numeric`` override: we keep the
    join key INTEGER by default (exact equi-join keys; SURVEY §1.4) and
    expose the override mechanism for callers that want literal parity.
    """
    df = spark.read.csv(path, header=True, schema=schema, quote='"', escape='"')
    for col, dtype in (column_overrides or {}).items():
        df = df.withColumn(col, df[col].cast(dtype))
    return df
