"""Core models — dimension, fact, and data-mart plans.

Reference analogs: ``models/core/dim_zones.sql``, ``fact_trips.sql``,
``dm_monthly_zone_revenue.sql`` plus the README's optional
``dm_monthly_zone_statistics`` (reference ``README.md:96-119``). These
are dbt ``table`` materializations (``dbt_project.yml:40-41``) — the
runner persists them (see runner.py); the functions here only declare
the logical plan so Catalyst sees the whole DAG when optimizing.

Scale notes (100 TB design):

- Both fact joins broadcast the 265-row zone dim (reference
  ``fact_trips.sql:54-57``): explicitly hinted so the plan is two
  BroadcastHashJoins with zero shuffle regardless of fact size.
- The revenue mart's groupBy is the workload's only shuffle; keys are
  (zone, month, service) — bounded cardinality (~265 × months × 2), so
  partial (map-side) aggregation collapses almost everything before the
  exchange. AQE coalesces the post-shuffle partitions.
- At scale the fact table write should be partitioned by month —
  ``writer_partition_by=('pickup_month',)`` in the runner — enabling
  partition pruning for month-ranged queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parity import davg
from .staging import STAGING_COLUMNS


def dim_zones(zone_lookup: DataFrame) -> DataFrame:
    """Reference ``models/core/dim_zones.sql:4-9`` — project the seed,
    rewriting 'Boro' → 'Green' in service_zone."""
    return zone_lookup.select(
        F.col("locationid"),
        F.col("borough"),
        F.col("zone"),
        F.regexp_replace(F.col("service_zone"), "Boro", "Green").alias("service_zone"),
    )


def fact_trips(green: DataFrame, yellow: DataFrame, zones: DataFrame) -> DataFrame:
    """Reference ``models/core/fact_trips.sql`` — union both services,
    tag service_type, inner-join pickup+dropoff zones (dropping Unknown
    boroughs and unmatched locationids, sql:21-24,54-57)."""
    for c in STAGING_COLUMNS:  # canonical-schema assert before union (SURVEY §1.3)
        assert c in green.columns and c in yellow.columns, f"staging schema drift: {c}"

    trips = green.withColumn("service_type", F.lit("Green")).unionByName(
        yellow.withColumn("service_type", F.lit("Yellow"))
    )  # fact_trips.sql:3-19 (positional union all; unionByName + assert is safer)

    known = zones.filter(F.col("borough") != "Unknown")  # fact_trips.sql:21-24
    pu = F.broadcast(
        known.select(
            F.col("locationid").alias("_pu_locationid"),
            F.col("borough").alias("pickup_borough"),
            F.col("zone").alias("pickup_zone"),
        )
    )
    do = F.broadcast(
        known.select(
            F.col("locationid").alias("_do_locationid"),
            F.col("borough").alias("dropoff_borough"),
            F.col("zone").alias("dropoff_zone"),
        )
    )
    joined = trips.join(
        pu, trips["pickup_locationid"] == pu["_pu_locationid"], "inner"
    ).join(do, trips["dropoff_locationid"] == do["_do_locationid"], "inner")

    # 27-column projection, fact_trips.sql:25-52 order.
    return joined.select(
        "tripid",
        "vendorid",
        "service_type",
        "ratecodeid",
        "pickup_locationid",
        "pickup_borough",
        "pickup_zone",
        "dropoff_locationid",
        "dropoff_borough",
        "dropoff_zone",
        "pickup_datetime",
        "dropoff_datetime",
        "store_and_fwd_flag",
        "passenger_count",
        "trip_distance",
        "trip_type",
        "fare_amount",
        "extra",
        "mta_tax",
        "tip_amount",
        "tolls_amount",
        "ehail_fee",
        "improvement_surcharge",
        "total_amount",
        "payment_type",
        "payment_type_description",
        "congestion_surcharge",
    )


def dm_monthly_zone_revenue(fact: DataFrame) -> DataFrame:
    """Reference ``models/core/dm_monthly_zone_revenue.sql:6-31`` —
    monthly revenue per pickup zone and service: 9 decimal sums, a trip
    count, 2 averages, grouped by (zone, month, service).

    ``date_trunc('month', ts)`` returns DATE in DuckDB but TIMESTAMP in
    Spark — cast to date for cross-engine parity (SURVEY §2.3 X5).
    Averages use the deterministic decimal-sum/count form (parity.py).
    """
    # Output names follow the reference exactly (dm_monthly_zone_revenue.sql:15-28).
    aggs = [
        F.sum("fare_amount").alias("revenue_monthly_fare"),
        F.sum("extra").alias("revenue_monthly_extra"),
        F.sum("mta_tax").alias("revenue_monthly_mta_tax"),
        F.sum("tip_amount").alias("revenue_monthly_tip_amount"),
        F.sum("tolls_amount").alias("revenue_monthly_tolls_amount"),
        F.sum("ehail_fee").alias("revenue_monthly_ehail_fee"),
        F.sum("improvement_surcharge").alias("revenue_monthly_improvement_surcharge"),
        F.sum("total_amount").alias("revenue_monthly_total_amount"),
        F.sum("congestion_surcharge").alias("revenue_monthly_congestion_surcharge"),
        F.count("tripid").alias("total_monthly_trips"),
        davg(F.col("passenger_count"), 18, 0).alias("avg_monthly_passenger_count"),
        davg(F.col("trip_distance"), 18, 3).alias("avg_monthly_trip_distance"),
    ]
    return fact.groupBy(
        F.col("pickup_zone").alias("revenue_zone"),
        F.date_trunc("month", F.col("pickup_datetime")).alias("revenue_month"),
        F.col("service_type"),
    ).agg(*aggs)


def dm_monthly_zone_statistics(fact: DataFrame) -> DataFrame:
    """README's optional statistics mart (reference ``README.md:96-119``):
    trips count + avg distance per (pickup zone, month, service)."""
    return fact.groupBy(
        F.col("pickup_zone"),
        F.date_trunc("month", F.col("pickup_datetime")).alias("trip_month"),
        F.col("service_type"),
    ).agg(
        F.count("tripid").alias("total_monthly_trips"),
        davg(F.col("passenger_count"), 18, 0).alias("avg_monthly_passenger_count"),
        davg(F.col("trip_distance"), 18, 3).alias("avg_monthly_trip_distance"),
    )
