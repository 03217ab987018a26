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
- calendar buckets stay TIMESTAMP on BOTH sides (Spark: ``date_trunc``
  with no DATE cast, day-grain = ``date_trunc('day', ...)``; oracle:
  ``CAST(date_trunc(...) AS TIMESTAMP)`` since DuckDB's date_trunc
  returns DATE at day-or-coarser grains): Spark's toPandas() renders
  DATE as datetime.date but DuckDB's .df() renders it datetime64, so
  a DATE output forced a stringification tolerance in the hash
  replica — identical TIMESTAMP types need none (r5);
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
# DuckDB oracle (CORRECTNESS_r{N}.json); the window rotates per round so
# that over rounds every query accumulates a driver-green row. After r5,
# exactly 4 oracled queries (added in the final r5 commit, after the
# window was set) had never sat in a verified window:
# q9_product_type_profit, ext_text_regex_redact, ext_vocab_coverage,
# ext_quantile_binning. The ROUND-6 window keeps the taxi DAG as the
# permanent prefix (the parity claim the whole repo makes), takes those
# 4 — closing the loop: r3∪r4∪r5∪r6 covers every oracled query — plus
# every query whose code or guard semantics changed THIS round
# (q9 merge-hint, prof_lineitem_approx_guarded's independent exact
# band, the ngram-jaccard round-before-threshold), plus anything newly
# oracled in round 6. The remaining slots re-verify the TPC-H join
# family that this round's broadcast-hazard sweep audited. Rows-only
# queries are never windowed (their slot would carry no value
# verification — ADVICE r3). Everything outside the window is verified
# by the local replica of the gate (tests/test_contract_parity.py,
# collect-compare and driver-faithful pandas-hash paths).
DRIVER_WINDOW: tuple[str, ...] = (
    # Reference taxi DAG — permanent prefix.
    "taxi_stg_green_tripdata",
    "taxi_stg_yellow_tripdata",
    "taxi_dim_zones",
    "taxi_fact_trips",
    "taxi_dm_monthly_zone_revenue",
    "taxi_dm_monthly_zone_statistics",
    "taxi_metric_average_distance_month",
    "taxi_metric_avg_distance_manhattan_quarter",
    # The 4 never-driver-verified round-5 additions.
    "q9_product_type_profit",
    "ext_text_regex_redact",
    "ext_vocab_coverage",
    "ext_quantile_binning",
    # Changed this round (guard semantics / plan pins / rounding /
    # inverted-index rewrite) and the NEW round-6 queries.
    "prof_lineitem_approx_guarded",
    "ext_dedup_ngram_jaccard",
    "ext_text_chunk_windows",
    "ext_ann_recall_eval",
    "ext_decontaminate_bloom",
    "ext_partitioned_sink_prune",
    "ext_bucketed_join_colocated",
    # TPC-H broadcast-hazard sweep family (plans audited this round).
    "q3_shipping_priority",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q18_large_volume_customers",
    "q11_important_parts",
    "q22_dormant_customers",
    # Re-verification: flagship + staples.
    "a1_pricing_summary",
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "q20_part_promo_suppliers",
    "j6_outer_join_count_dist",
    "j7_semi_anti_multicond",
    "s6_correlated_subquery",
    "a9_conditional_agg_promo",
    # LLM-pipeline staples re-verified under the round-6 code.
    "ext_mixture_sample",
    "ext_epoch_upsample",
    "ext_dedup_minhash_lsh",
    "ext_mixture_sample_tokens",
    "ext_dedup_cluster_components",
    "ext_profile_correlation",
    "ext_dedup_cluster_keep_best",
    "ext_similarity_ivf_topk",
    "ext_leakage_safe_split",
    "ext_streaming_stateful_totals",
    "ext_streaming_dedup",
    "ext_text_tfidf_topk",
    "ext_quality_robust_normalize",
    "ext_cap_per_group",
    "ext_hard_negative_topk",
    # Dropped to fit 50: ext_embedding_near_dup, ext_streaming_tumbling,
    # ext_streaming_stream_join, ext_multimodal_frame_sample,
    # ext_dedup_exact, ext_dedup_simhash, ext_similarity_lsh_topk,
    # ext_decontaminate_ngram, ext_dedup_edit_distance,
    # a10_groupwise_median, ext_pack_sequences, q16_supplier_diversity,
    # j5_star_join_revenue — all r5/r6-green and UNCHANGED
    # this round (union coverage keeps them verified); streaming_dedup,
    # mixture_sample, epoch_upsample, and cluster_keep_best are NEW.
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
