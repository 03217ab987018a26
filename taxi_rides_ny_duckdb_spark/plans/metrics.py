"""Metrics layer — a dbt-metrics-style compiler over DataFrames.

Reference analog: the dbt metric ``average_distance`` on ``fact_trips``
(reference ``README.md:228-242``) with calculation_method ``average``,
time grains [month, quarter, year], dimension + equality-filter support
(``README.md:286-308``). PipeRider issues one grouped aggregate per
(metric, grain); we compile the same YAML-shaped spec into a grouped
DataFrame per grain — no extra process, same engine (SURVEY §3.3).

Supported calculation methods: the full dbt metric surface —
count, count_distinct, sum, average, min, max (the reference exercises
``average``; the rest complete the public dbt contract).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parity import davg

_METHODS = {
    "count": lambda c: F.count(c),
    "count_distinct": lambda c: F.count_distinct(c),
    "sum": lambda c: F.sum(c),
    "average": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}

GRAINS = ("day", "week", "month", "quarter", "year")


@dataclass
class MetricFilter:
    """One equality filter, dbt-style (README.md:296-304)."""

    field: str
    operator: str  # '=', '!=', '>', '>=', '<', '<='
    value: object

    def to_column(self):
        c = F.col(self.field)
        return {
            "=": c == self.value,
            "!=": c != self.value,
            ">": c > self.value,
            ">=": c >= self.value,
            "<": c < self.value,
            "<=": c <= self.value,
        }[self.operator]


@dataclass
class Metric:
    """A dbt-metric spec (README.md:228-242 field-for-field)."""

    name: str
    calculation_method: str
    expression: str
    timestamp: str
    time_grains: tuple[str, ...] = ("month",)
    dimensions: tuple[str, ...] = ()
    filters: tuple[MetricFilter, ...] = ()
    deterministic_avg: bool = True  # route average via exact decimal sum (parity.py)


def compile_metric(model: DataFrame, metric: Metric, grain: str) -> DataFrame:
    """One (metric, grain) → grouped DataFrame.

    Output columns: ``period_<grain>`` (date), *dimensions, ``<name>``.
    """
    if grain not in GRAINS:
        raise ValueError(f"unsupported grain {grain!r}")
    if metric.calculation_method not in _METHODS:
        raise ValueError(f"unsupported calculation_method {metric.calculation_method!r}")

    df = model
    for f_ in metric.filters:
        df = df.filter(f_.to_column())

    expr = F.expr(metric.expression)
    if metric.calculation_method == "average" and metric.deterministic_avg:
        agg = davg(expr, 18, 6).alias(metric.name)
    else:
        agg = _METHODS[metric.calculation_method](expr).alias(metric.name)

    period = (
        F.date_trunc(grain, F.col(metric.timestamp)).cast("date").alias(f"period_{grain}")
    )
    keys = [period] + [F.col(d) for d in metric.dimensions]
    return df.groupBy(*keys).agg(agg)


def compile_all_grains(model: DataFrame, metric: Metric) -> dict[str, DataFrame]:
    return {g: compile_metric(model, metric, g) for g in metric.time_grains}


@dataclass
class DerivedMetric:
    """dbt derived metric (calculation_method: derived): an expression
    over other metrics' values at the same (period, dimensions) grain —
    e.g. revenue_per_order = total_revenue / n_orders."""

    name: str
    expression: str  # SQL over the parent metric names as columns
    metrics: tuple[Metric, ...]
    time_grains: tuple[str, ...] = ("month",)
    dimensions: tuple[str, ...] = ()


def compile_derived(model: DataFrame, metric: DerivedMetric, grain: str) -> DataFrame:
    """Compile parents at the grain, join them on (period, dims), apply
    the expression. Parents share one upstream model, so Catalyst plans
    this as one scan feeding N aggregates joined on the (tiny)
    period×dims key — the joins are broadcast at any model size."""
    if not metric.metrics:
        raise ValueError(f"derived metric {metric.name!r} needs parent metrics")
    keys = [f"period_{grain}", *metric.dimensions]
    joined: DataFrame | None = None
    for parent in metric.metrics:
        if tuple(parent.dimensions) != tuple(metric.dimensions):
            raise ValueError(
                f"parent {parent.name!r} dimensions {parent.dimensions} != "
                f"derived metric dimensions {metric.dimensions}"
            )
        p = compile_metric(model, parent, grain)
        joined = p if joined is None else joined.join(p, keys, "full_outer")
    return joined.select(
        *keys, F.expr(metric.expression).alias(metric.name)
    )
