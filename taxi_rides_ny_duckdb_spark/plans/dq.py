"""Data-quality test framework — dbt generic tests as engine features.

Reference analog: the four generic dbt tests wired in YAML
(``models/staging/schema.yml:33-65,86-93,124-157,178-185`` and
``models/core/schema.yml:19-24``) compile to "count the violating rows"
queries; nonzero counts fail (severity ``error``) or log (``warn``)
(SURVEY §3.2, §5.1). Here each test is a function DataFrame → violating
rows; the runner counts and applies severity.

All four tests are single-pass distributed plans: anti-join for
relationships, hash-aggregate for unique, filters for the rest — no
collect loops, no windows. At 100 TB each test is one scan (plus one
broadcast of the parent's key column for relationships).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def not_null_violations(df: DataFrame, column: str) -> DataFrame:
    """dbt ``not_null`` (e.g. reference ``models/staging/schema.yml:38-39``)."""
    return df.filter(F.col(column).isNull())


def unique_violations(df: DataFrame, column: str) -> DataFrame:
    """dbt ``unique`` (reference ``schema.yml:35-37``): keys seen >1×."""
    return (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") > 1)
    )


def accepted_values_violations(
    df: DataFrame, column: str, values: Sequence
) -> DataFrame:
    """dbt ``accepted_values`` (reference ``schema.yml:86-93``; value list
    from var ``payment_type_values``, ``dbt_project.yml:42-43``).

    dbt's generated SQL groups by the column and keeps groups outside the
    list; NULL is not reported as a violation — match that by requiring
    the column non-null."""
    return df.filter(F.col(column).isNotNull() & ~F.col(column).isin(list(values)))


def relationships_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """dbt ``relationships`` (reference ``schema.yml:55-65``): child keys
    absent from the parent. Left-anti join; the parent side is a single
    projected key column — broadcast it (at 100 TB the child is the big
    side and never shuffles)."""
    parent_keys = F.broadcast(parent.select(F.col(parent_key).alias("__pk")).distinct())
    return (
        child.filter(F.col(child_key).isNotNull())
        .join(parent_keys, child[child_key] == parent_keys["__pk"], "left_anti")
    )


@dataclass
class DQTest:
    """One wired test instance (model + test + severity), mirroring a
    YAML entry. ``severity``: 'error' raises, 'warn' logs — dbt defaults
    to error when unspecified (SURVEY §5.1)."""

    name: str
    model: str
    build: Callable[[DataFrame], DataFrame]  # df -> violating rows
    severity: str = "error"


@dataclass
class DQResult:
    test: DQTest
    violations: int
    failures_path: str | None = None  # set when store_failures wrote rows

    @property
    def passed(self) -> bool:
        return self.violations == 0


class DQError(AssertionError):
    pass


def run_tests(
    models: dict[str, DataFrame],
    tests: Sequence[DQTest],
    raise_on_error: bool = True,
    store_failures_dir: str | None = None,
) -> list[DQResult]:
    """Execute tests, enforcing severities like ``dbt build`` (§3.2).

    ``store_failures_dir``: dbt's ``--store-failures`` — each test's
    violating ROWS (not just the count) are written to
    ``{dir}/{test.name}`` so failures can be inspected/joined later.
    The violations plan runs once: write, then count the written
    parquet (dbt likewise counts from the audit table)."""
    import os

    results: list[DQResult] = []
    errors: list[str] = []
    for t in tests:
        viol = t.build(models[t.model])
        if store_failures_dir is not None:
            path = os.path.join(store_failures_dir, t.name)
            viol.write.mode("overwrite").parquet(path)
            stored = viol.sparkSession.read.parquet(path)
            n = stored.count()
            results.append(DQResult(t, n, failures_path=path))
        else:
            n = viol.count()
            results.append(DQResult(t, n))
        if n > 0:
            msg = f"dq test {t.name} on {t.model}: {n} violating rows (severity={t.severity})"
            if t.severity == "error":
                errors.append(msg)
            else:
                log.warning(msg)
    if errors and raise_on_error:
        raise DQError("; ".join(errors))
    return results


def reference_test_suite(payment_type_values: Sequence[int] = (1, 2, 3, 4, 5, 6)) -> list[DQTest]:
    """The reference's exact test matrix, severities included:

    - unique + not_null on tripid, both staging models, severity warn
      (``models/staging/schema.yml:35-39,126-130``);
    - relationships pickup/dropoff → zone lookup: green pickup warn,
      green dropoff **error** (no severity key ⇒ default,
      ``schema.yml:60-65``), yellow both warn (``schema.yml:145-157``);
    - accepted_values payment_type ∈ vars (warn, ``schema.yml:86-93``);
    - not_null revenue_monthly_total_amount **error**
      (``models/core/schema.yml:19-24``).

    Models dict keys expected: stg_green_tripdata, stg_yellow_tripdata,
    taxi_zone_lookup, dm_monthly_zone_revenue.
    """
    tests: list[DQTest] = []
    for stg, (pu_sev, do_sev) in {
        "stg_green_tripdata": ("warn", "error"),
        "stg_yellow_tripdata": ("warn", "warn"),
    }.items():
        tests += [
            DQTest(f"unique__{stg}__tripid", stg,
                   lambda df: unique_violations(df, "tripid"), "warn"),
            DQTest(f"not_null__{stg}__tripid", stg,
                   lambda df: not_null_violations(df, "tripid"), "warn"),
            DQTest(
                f"accepted_values__{stg}__payment_type", stg,
                lambda df, v=tuple(payment_type_values): accepted_values_violations(
                    df, "payment_type", v),
                "warn",
            ),
        ]
        tests.append(
            DQTest(f"relationships__{stg}__pickup_locationid", stg, None, pu_sev)
        )
        tests.append(
            DQTest(f"relationships__{stg}__dropoff_locationid", stg, None, do_sev)
        )
    tests.append(
        DQTest(
            "not_null__dm_monthly_zone_revenue__revenue_monthly_total_amount",
            "dm_monthly_zone_revenue",
            lambda df: not_null_violations(df, "revenue_monthly_total_amount"),
            "error",
        )
    )
    return tests


def bind_relationship_tests(tests: list[DQTest], zone_lookup: DataFrame) -> list[DQTest]:
    """Fill in the relationship tests' build functions, which need the
    parent table (the zone seed) captured."""
    bound = []
    for t in tests:
        if t.build is None and t.name.startswith("relationships__"):
            key = "pickup_locationid" if "pickup" in t.name else "dropoff_locationid"
            bound.append(
                DQTest(
                    t.name,
                    t.model,
                    lambda df, k=key: relationships_violations(df, k, zone_lookup, "locationid"),
                    t.severity,
                )
            )
        else:
            bound.append(t)
    return bound


def source_freshness(
    df: DataFrame,
    loaded_at: str,
    now,
    warn_after_s: int,
    error_after_s: int,
) -> DataFrame:
    """``dbt source freshness`` — is the source table stale? dbt's
    freshness block (``loaded_at_field`` + ``warn_after`` /
    ``error_after``) compiles to exactly this: ``max(loaded_at)``,
    its age against an evaluation instant, and a pass/warn/error
    verdict. ``now`` is an explicit parameter (dbt uses the wall
    clock; an explicit instant keeps runs reproducible and the oracle
    replayable — the snapshots-``as_of`` convention). NULL
    ``loaded_at`` rows are ignored by MAX, matching dbt; an all-NULL
    or empty source yields a NULL age and status 'error' (no evidence
    of freshness is staleness).

    One row out of one MAX aggregate — a single scan, map-side
    combined; the cheapest possible check to schedule before every
    pipeline run. Output: (max_loaded_at, age_seconds, status)."""
    if not (0 < warn_after_s <= error_after_s):
        raise ValueError(
            "need 0 < warn_after_s <= error_after_s, got "
            f"{warn_after_s=} {error_after_s=}"
        )
    now_ts = F.lit(now).cast("timestamp")
    mx = F.max(F.col(loaded_at))
    age = now_ts.cast("long") - mx.cast("long")
    status = (
        F.when(age.isNull() | (age > error_after_s), F.lit("error"))
        .when(age > warn_after_s, F.lit("warn"))
        .otherwise(F.lit("pass"))
    )
    return df.agg(
        mx.alias("max_loaded_at"),
        age.alias("age_seconds"),
        status.alias("status"),
    )
