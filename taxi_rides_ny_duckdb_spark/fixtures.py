"""Synthetic taxi fixtures per FIXTURES.md §1-3 (seed=42, deterministic).

Lives in the package (not tests/) because the driver-contract taxi
queries also need it: fixtures are written once to a stable path
(`default_fixture_dir`) so the Spark pipeline AND the DuckDB oracle can
read the same raw inputs.

Green/yellow raw trips + a 265-row zone lookup. Duplicate
(vendorid, pickup_datetime) pairs are FULL-ROW duplicates so the
arbitrary-survivor dedup (SURVEY §2.4 W1) yields identical values no
matter which row survives — required for cross-engine comparison.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

BOROUGHS = ["Manhattan", "Queens", "Brooklyn", "Bronx", "Staten Island", "EWR"]
SERVICE_ZONES = ["Boro Zone", "Yellow Zone", "EWR", "N/A"]


def make_zone_lookup() -> pd.DataFrame:
    rng = np.random.default_rng(42)
    n = 265
    rows = {
        "locationid": np.arange(1, n + 1),
        "borough": [BOROUGHS[i % len(BOROUGHS)] for i in range(n)],
        "zone": [f"Zone {i + 1}" for i in range(n)],
        "service_zone": [SERVICE_ZONES[i % len(SERVICE_ZONES)] for i in range(n)],
    }
    df = pd.DataFrame(rows)
    # Rows 264/265 are the real seed's Unknown zones (FIXTURES.md §3).
    df.loc[df["locationid"] >= 264, "borough"] = "Unknown"
    df.loc[df["locationid"] >= 264, "service_zone"] = "N/A"
    return df


def _trips(rng: np.random.default_rng, n: int, pickup_name: str, dropoff_name: str,
           with_green_cols: bool) -> pd.DataFrame:
    pickup = pd.Timestamp("2019-01-01") + pd.to_timedelta(
        rng.integers(0, 730 * 24 * 3600, n), unit="s"
    )
    duration = rng.integers(60, 3 * 3600, n)
    vendor = rng.choice([1, 2], n).astype("float64")
    vendor[rng.random(n) < 0.03] = np.nan  # exercises `vendorid is not null`
    # locationids: mostly 1-263, a few Unknown (264/265), a few ∉ seed (266-270)
    loc = lambda: np.where(
        rng.random(n) < 0.95,
        rng.integers(1, 264, n),
        rng.integers(264, 271, n),
    )
    fare = np.round(rng.uniform(2.5, 300.0, n), 2)
    tip = np.round(rng.uniform(0, 60.0, n), 2)
    tolls = np.round(rng.uniform(0, 40.0, n) * (rng.random(n) < 0.2), 2)
    extra = rng.choice([0.0, 0.5, 1.0], n)
    mta = rng.choice([0.0, 0.5], n)
    imp = rng.choice([0.0, 0.3], n)
    congestion = rng.choice([0.0, 2.5, 2.75, np.nan], n)
    pay = rng.choice([1, 2, 3, 4, 5, 6, 7, 0], n, p=[0.4, 0.3, 0.1, 0.05, 0.05, 0.04, 0.03, 0.03]).astype("float64")
    pay[rng.random(n) < 0.02] = np.nan
    df = pd.DataFrame(
        {
            "vendorid": vendor,
            pickup_name: pickup,
            dropoff_name: pickup + pd.to_timedelta(duration, unit="s"),
            "ratecodeid": np.where(rng.random(n) < 0.05, np.nan, rng.integers(1, 7, n)),
            "pulocationid": loc(),
            "dolocationid": loc(),
            "store_and_fwd_flag": rng.choice(["Y", "N", None], n, p=[0.05, 0.9, 0.05]),
            "passenger_count": np.where(rng.random(n) < 0.04, np.nan, rng.integers(0, 7, n)),
            "trip_distance": np.round(rng.uniform(0.0, 50.0, n), 2),
            "fare_amount": fare,
            "extra": extra,
            "mta_tax": mta,
            "tip_amount": tip,
            "tolls_amount": tolls,
            "improvement_surcharge": imp,
            "total_amount": np.round(fare + extra + mta + tip + tolls + imp, 2),
            "payment_type": pay,
            "congestion_surcharge": congestion,
        }
    )
    if with_green_cols:
        df["trip_type"] = rng.choice([1, 2], n).astype("float64")
        ehail = np.zeros(n)
        ehail[rng.random(n) < 0.9] = np.nan
        df["ehail_fee"] = ehail
    # Append full-row duplicates (~5%) so dedup is exercised but
    # survivor-agnostic (module docstring).
    dups = df.sample(frac=0.05, random_state=42)
    return pd.concat([df, dups], ignore_index=True)


def write_taxi_fixtures(out_dir: str) -> dict[str, str]:
    """Write green/yellow parquet + zone CSV; returns name → path."""
    os.makedirs(out_dir, exist_ok=True)
    rng_g = np.random.default_rng(42)
    rng_y = np.random.default_rng(43)
    green = _trips(rng_g, 2000, "lpep_pickup_datetime", "lpep_dropoff_datetime", True)
    yellow = _trips(rng_y, 2000, "tpep_pickup_datetime", "tpep_dropoff_datetime", False)
    zones = make_zone_lookup()
    paths = {
        "green_tripdata": os.path.join(out_dir, "green_tripdata.parquet"),
        "yellow_tripdata": os.path.join(out_dir, "yellow_tripdata.parquet"),
        "taxi_zone_lookup": os.path.join(out_dir, "taxi_zone_lookup.csv"),
    }
    # µs timestamps: Spark's parquet reader rejects TIMESTAMP(NANOS).
    kw = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    green.to_parquet(paths["green_tripdata"], **kw)
    yellow.to_parquet(paths["yellow_tripdata"], **kw)
    zones.to_csv(paths["taxi_zone_lookup"], index=False)
    return paths


DEFAULT_FIXTURE_DIR = "/tmp/taxi_rides_ny_duckdb_spark_fixtures"


def ensure_taxi_fixtures(out_dir: str | None = None) -> dict[str, str]:
    """Write the fixtures once (idempotent — same seed, same bytes) and
    return name → path. Used by tests and by the taxi contract queries."""
    out_dir = out_dir or DEFAULT_FIXTURE_DIR
    paths = {
        "green_tripdata": os.path.join(out_dir, "green_tripdata.parquet"),
        "yellow_tripdata": os.path.join(out_dir, "yellow_tripdata.parquet"),
        "taxi_zone_lookup": os.path.join(out_dir, "taxi_zone_lookup.csv"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    return write_taxi_fixtures(out_dir)
