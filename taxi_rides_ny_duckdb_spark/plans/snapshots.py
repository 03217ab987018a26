"""dbt snapshots — SCD type-2 change capture over DataFrames.

Reference analog: the reference project ships the standard dbt snapshot
skeleton (``/root/reference/snapshots/.gitkeep``) — the directory is
empty, but snapshots are part of the dbt surface the project's users
have available. This module reproduces dbt's two public snapshot
strategies with idiomatic Spark joins:

- **timestamp** strategy: a source row supersedes the snapshotted
  current row for its ``unique_key`` when ``updated_at`` is strictly
  newer; the old row is closed (``dbt_valid_to`` set) and the new row
  inserted open-ended.
- **check** strategy: supersedes when any of ``check_cols`` changed,
  stamped with a caller-supplied ``as_of`` timestamp (dbt uses "now";
  an explicit parameter keeps runs reproducible).

Both produce dbt's meta columns ``dbt_scd_id``, ``dbt_updated_at``,
``dbt_valid_from``, ``dbt_valid_to``; ``dbt_scd_id`` follows the
dbt_utils surrogate-key recipe (md5 over key + timestamp, pinned
string format — see functions/parity notes on cross-engine timestamp
rendering).

Scale: one full-outer shuffle join of current rows × source per apply
(history rows pass through untouched — at 100 TB store the snapshot
partitioned by ``dbt_valid_to IS NULL`` so the current slice is a
partition-pruned scan), plus a union. No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_COLS = ("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")


def _scd_id(unique_key: str, ts_col) -> F.Column:
    """md5(key || '|' || ts) with the engine's pinned timestamp format —
    matches DuckDB ``md5(coalesce(CAST(k AS VARCHAR),'_null_') || '|' ||
    strftime(ts,'%Y-%m-%d %H:%M:%S'))``."""
    key_s = F.coalesce(F.col(unique_key).cast("string"), F.lit("_null_"))
    ts_s = F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss")
    return F.md5(F.concat_ws("|", key_s, ts_s))


def snapshot_stage(source: DataFrame, unique_key: str, updated_at: str) -> DataFrame:
    """Stamp a source state with snapshot meta columns (the initial
    snapshot is exactly the staged source)."""
    for c in META_COLS:
        if c in source.columns:
            raise ValueError(f"source already has snapshot column {c!r}")
    ts = F.col(updated_at)
    ts_type = source.schema[updated_at].dataType
    return (
        source.withColumn("dbt_scd_id", _scd_id(unique_key, ts))
        .withColumn("dbt_updated_at", ts)
        .withColumn("dbt_valid_from", ts)
        .withColumn("dbt_valid_to", F.lit(None).cast(ts_type))
    )


def snapshot_timestamp(
    existing: DataFrame | None,
    source: DataFrame,
    unique_key: str,
    updated_at: str,
) -> DataFrame:
    """Apply one source state to a snapshot (dbt timestamp strategy).

    Returns the new full snapshot table. Keys absent from the source are
    left open (dbt's default: hard deletes are not invalidated). Source
    rows with ``updated_at <= `` the snapshotted ``dbt_updated_at`` are
    ignored, matching dbt's strictly-newer check.
    """
    staged = snapshot_stage(source, unique_key, updated_at)
    if existing is None:
        return staged

    history = existing.filter(F.col("dbt_valid_to").isNotNull())
    current = existing.filter(F.col("dbt_valid_to").isNull())

    s = staged.select([F.col(c).alias(f"__s_{c}") for c in staged.columns])
    j = current.join(
        s, F.col(unique_key).eqNullSafe(F.col(f"__s_{unique_key}")), "full_outer"
    )

    c_exists = F.col("dbt_scd_id").isNotNull()
    s_exists = F.col("__s_dbt_scd_id").isNotNull()
    newer = c_exists & s_exists & (
        F.col(f"__s_{updated_at}") > F.col("dbt_updated_at")
    )

    out_cols = existing.columns
    # current rows that survive unchanged: no source row, or a stale one
    kept = j.filter(c_exists & ~F.coalesce(newer, F.lit(False))).select(*out_cols)
    # current rows closed by a strictly-newer source row
    closed = j.filter(newer).select(
        *[F.col(c) for c in out_cols if c != "dbt_valid_to"],
        F.col(f"__s_{updated_at}").alias("dbt_valid_to"),
    ).select(*out_cols)
    # inserts: brand-new keys, plus the new version of changed keys
    inserted = j.filter(s_exists & (~c_exists | newer)).select(
        *[F.col(f"__s_{c}").alias(c) for c in out_cols]
    )
    return history.unionByName(kept).unionByName(closed).unionByName(inserted)


def snapshot_check(
    existing: DataFrame | None,
    source: DataFrame,
    unique_key: str,
    check_cols: list[str],
    as_of,
) -> DataFrame:
    """Apply one source state under dbt's check strategy: a row is a new
    version when any of ``check_cols`` differs (null-safe) from the
    snapshotted current row; versions are stamped ``as_of`` (a datetime
    — dbt stamps wall-clock "now"; explicit here for reproducibility)."""
    stamped = source.withColumn("__snapshot_at", F.lit(as_of))
    staged = snapshot_stage(stamped, unique_key, "__snapshot_at").drop(
        "__snapshot_at"
    )
    if existing is None:
        return staged

    history = existing.filter(F.col("dbt_valid_to").isNotNull())
    current = existing.filter(F.col("dbt_valid_to").isNull())

    s = staged.select([F.col(c).alias(f"__s_{c}") for c in staged.columns])
    j = current.join(
        s, F.col(unique_key).eqNullSafe(F.col(f"__s_{unique_key}")), "full_outer"
    )
    c_exists = F.col("dbt_scd_id").isNotNull()
    s_exists = F.col("__s_dbt_scd_id").isNotNull()
    diff = F.lit(False)
    for c in check_cols:
        diff = diff | ~F.col(c).eqNullSafe(F.col(f"__s_{c}"))
    changed = c_exists & s_exists & diff

    out_cols = existing.columns
    kept = j.filter(c_exists & ~F.coalesce(changed, F.lit(False))).select(*out_cols)
    closed = j.filter(changed).select(
        *[F.col(c) for c in out_cols if c != "dbt_valid_to"],
        F.col("__s_dbt_updated_at").alias("dbt_valid_to"),
    ).select(*out_cols)
    inserted = j.filter(s_exists & (~c_exists | changed)).select(
        *[F.col(f"__s_{c}").alias(c) for c in out_cols]
    )
    return history.unionByName(kept).unionByName(closed).unionByName(inserted)


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    unique_key: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a CDC changeset to a snapshot — MERGE INTO semantics
    (the Delta/Hudi/Iceberg upsert primitive) as plain DataFrame ops;
    the inverse of ``snapshot_diff``: applying the changeset that
    ``snapshot_diff(old, new)`` implies onto ``old`` reproduces ``new``
    exactly (property-tested round trip in tests/test_snapshots.py).

    ``changes`` carries the full row payload plus ``op_col`` ∈
    {'upsert', 'delete'} (any other value raises at execution — bad
    ops must not silently vanish). With ``seq_col`` the changeset may
    hold MULTIPLE entries per key (the raw CDC-log shape); they are
    compacted to the latest per key first (``row_number`` over
    (key) ordered by seq DESC — ``seq_col`` must be unique per key,
    the CDC-log contract). Semantics per surviving change row:
    delete removes the key, upsert replaces-or-inserts the payload.

    Scale shape: the changeset is the small side by construction (a
    day's changes vs the full corpus), so the plan is ONE left-anti
    join of base × change-keys (AQE broadcasts the keys — the base is
    never shuffled) plus a union with the upsert payloads. At 100 TB
    with the base bucketed on ``unique_key``
    (operators/scale.write_bucketed) even a fact-sized changeset
    merges exchange-free. No Python anywhere.
    """
    allowed = ("upsert", "delete")
    payload_cols = [c for c in base.columns]
    checked_op = F.when(
        F.col(op_col).isin(*allowed), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"cdc_apply: {op_col} must be one of {allowed}; got "),
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
            )
        )
    )
    ch = changes.withColumn(op_col, checked_op)
    if seq_col is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy(unique_key).orderBy(F.desc(seq_col))
        ch = (
            ch.withColumn("__cdc_rn", F.row_number().over(w))
            .where(F.col("__cdc_rn") == 1)
            .drop("__cdc_rn")
        )
    survivors = base.join(
        ch.select(unique_key), unique_key, "left_anti"
    )
    upserts = ch.where(F.col(op_col) == "upsert").select(*payload_cols)
    return survivors.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    unique_key: str,
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Row-level diff of two table snapshots — the data-versioning
    primitive behind "what changed between yesterday's corpus build
    and today's": every key classified as ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` with both sides' content fingerprints.
    PipeRider's compare (plans/profile.profile_compare) answers the
    DISTRIBUTION question; this answers the ROW question, and its
    output feeds audits ("show me the changed docs") and incremental
    downstream refresh (recompute only added ∪ changed).

    Change detection is md5 over the compare columns with the
    NULL-sentinel coalesce of the dbt surrogate-key recipe
    (functions/macros.py) — NULL ≠ '' and column order is part of the
    contract. One full-outer hash join on the key: at 100 TB both
    snapshots bucket by ``unique_key`` (operators/scale.write_bucketed)
    and the join is exchange-free; the fingerprint is map-side.

    Output: (unique_key, status, old_fingerprint, new_fingerprint) —
    fingerprints NULL on the side the key is absent from.
    """
    sentinel = "_snapshot_diff_null_"

    def fp(df: DataFrame) -> F.Column:
        return F.md5(
            F.concat_ws(
                "||",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit(sentinel))
                    for c in compare_cols
                ],
            )
        )

    o = old.select(F.col(unique_key), fp(old).alias("old_fingerprint"))
    n = new.select(F.col(unique_key), fp(new).alias("new_fingerprint"))
    joined = o.join(n, unique_key, "full_outer")
    status = (
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("removed"))
        .when(
            F.col("old_fingerprint") != F.col("new_fingerprint"), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.col(unique_key),
        status.alias("status"),
        "old_fingerprint",
        "new_fingerprint",
    )
