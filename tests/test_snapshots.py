"""dbt snapshot (SCD2) semantics — plans/snapshots.py. The timestamp
strategy is oracled in the driver contract; here we pin the strategy
rules themselves (strictly-newer, hard-delete survival, idempotence)
and the check strategy, which has no SQL oracle."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from taxi_rides_ny_duckdb_spark.plans.snapshots import (
    snapshot_check,
    snapshot_timestamp,
)

T1 = dt.datetime(2024, 1, 1)
T2 = dt.datetime(2024, 2, 1)
T3 = dt.datetime(2024, 3, 1)


def _src(spark, rows):
    return spark.createDataFrame(rows, ["id", "val", "updated_at"])


def _by_version(snap):
    out = {}
    for r in snap.collect():
        out.setdefault(r["id"], []).append(
            (r["dbt_valid_from"], r["dbt_valid_to"], r["val"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_timestamp_strategy_versions(spark):
    s1 = _src(spark, [(1, "a", T1), (2, "b", T1)])
    s2 = _src(spark, [(1, "a2", T2), (3, "c", T2)])
    snap = snapshot_timestamp(
        snapshot_timestamp(None, s1, "id", "updated_at"), s2, "id", "updated_at"
    )
    v = _by_version(snap)
    # id=1 changed: closed v1 + open v2
    assert v[1] == [(T1, T2, "a"), (T2, None, "a2")]
    # id=2 absent from s2 (hard delete): stays open — dbt default
    assert v[2] == [(T1, None, "b")]
    # id=3 brand new
    assert v[3] == [(T2, None, "c")]


def test_timestamp_strategy_ignores_stale_and_equal(spark):
    s1 = _src(spark, [(1, "new", T2)])
    stale = _src(spark, [(1, "old", T1)])
    same = _src(spark, [(1, "same-ts", T2)])
    base = snapshot_timestamp(None, s1, "id", "updated_at")
    assert _by_version(snapshot_timestamp(base, stale, "id", "updated_at")) == {
        1: [(T2, None, "new")]
    }
    # equal updated_at is NOT strictly newer → no new version
    assert _by_version(snapshot_timestamp(base, same, "id", "updated_at")) == {
        1: [(T2, None, "new")]
    }


def test_timestamp_strategy_idempotent(spark):
    s1 = _src(spark, [(1, "a", T1), (2, "b", T2)])
    once = snapshot_timestamp(None, s1, "id", "updated_at")
    twice = snapshot_timestamp(once, s1, "id", "updated_at")
    assert _by_version(twice) == _by_version(once)


def test_timestamp_strategy_three_generations(spark):
    snap = None
    for t, val in [(T1, "a"), (T2, "b"), (T3, "c")]:
        snap = snapshot_timestamp(
            snap, _src(spark, [(1, val, t)]), "id", "updated_at"
        )
    assert _by_version(snap) == {
        1: [(T1, T2, "a"), (T2, T3, "b"), (T3, None, "c")]
    }
    # exactly one current row, scd_ids all distinct
    rows = snap.collect()
    assert sum(r["dbt_valid_to"] is None for r in rows) == 1
    assert len({r["dbt_scd_id"] for r in rows}) == 3


def test_check_strategy_detects_value_change_only(spark):
    def src(rows):
        return spark.createDataFrame(rows, ["id", "val", "other"])

    base = snapshot_check(None, src([(1, "a", "x"), (2, "b", "x")]), "id", ["val"], T1)
    # val changed for 1; only `other` (not a check_col) changed for 2
    nxt = snapshot_check(
        base, src([(1, "a2", "x"), (2, "b", "y")]), "id", ["val"], T2
    )
    v = {
        r["id"]: (r["dbt_valid_from"], r["dbt_valid_to"], r["val"])
        for r in nxt.filter(F.col("dbt_valid_to").isNull()).collect()
    }
    assert v[1] == (T2, None, "a2")
    assert v[2] == (T1, None, "b")  # untouched: check_cols unchanged
    assert nxt.count() == 3  # closed id=1 v1, current id=1 v2, current id=2


def test_check_strategy_null_safe(spark):
    def src(rows):
        return spark.createDataFrame(rows, "id int, val string")

    base = snapshot_check(None, src([(1, None)]), "id", ["val"], T1)
    unchanged = snapshot_check(base, src([(1, None)]), "id", ["val"], T2)
    assert unchanged.count() == 1  # NULL == NULL under eqNullSafe → no version
    changed = snapshot_check(base, src([(1, "now-set")]), "id", ["val"], T2)
    assert changed.count() == 2


def test_rolling_metric_spans_calendar_gaps(spark):
    """RANGE frame over the period index: a 2-day window must NOT reach
    across a gap larger than the window."""
    from taxi_rides_ny_duckdb_spark.plans.metrics import Metric, compile_rolling

    rows = [
        (dt.datetime(2024, 1, 1), 10.0),
        (dt.datetime(2024, 1, 2), 20.0),
        (dt.datetime(2024, 1, 10), 40.0),  # far from the first cluster
    ]
    df = spark.createDataFrame(rows, ["ts", "x"])
    m = Metric("s", "sum", "x", "ts")
    got = {
        str(r["period_day"]): r["s"]
        for r in compile_rolling(df, m, "day", 2).collect()
    }
    # period_day is TIMESTAMP (midnight) since r5 — the shared calendar
    # type on both engines (contract.py parity rules).
    assert got == {
        "2024-01-01 00:00:00": 10.0,
        "2024-01-02 00:00:00": 30.0,
        "2024-01-10 00:00:00": 40.0,
    }


# ---------------------------------------------------------------------------
# CDC apply (MERGE INTO semantics) — plans/snapshots.cdc_apply
# ---------------------------------------------------------------------------


def _tbl(spark, rows):
    return spark.createDataFrame(rows, ["id", "val"])


def test_cdc_apply_merge_semantics(spark):
    """delete removes, upsert replaces-or-inserts, untouched rows
    survive."""
    from taxi_rides_ny_duckdb_spark.plans.snapshots import cdc_apply

    base = _tbl(spark, [(1, "a"), (2, "b"), (3, "c")])
    changes = spark.createDataFrame(
        [(2, None, "delete"), (3, "c2", "upsert"), (4, "d", "upsert")],
        ["id", "val", "op"],
    )
    got = sorted(
        (r["id"], r["val"]) for r in cdc_apply(base, changes, "id").collect()
    )
    assert got == [(1, "a"), (3, "c2"), (4, "d")]


def test_cdc_apply_latest_per_key_compaction(spark):
    """With seq_col, the raw CDC log compacts to latest-per-key before
    applying: upsert-then-delete deletes; delete-then-upsert lands."""
    from taxi_rides_ny_duckdb_spark.plans.snapshots import cdc_apply

    base = _tbl(spark, [(5, "e"), (6, "f")])
    changes = spark.createDataFrame(
        [
            (5, "e2", "upsert", 1),
            (5, None, "delete", 2),
            (6, None, "delete", 1),
            (6, "f2", "upsert", 2),
        ],
        ["id", "val", "op", "seq"],
    )
    got = sorted(
        (r["id"], r["val"])
        for r in cdc_apply(base, changes, "id", seq_col="seq").collect()
    )
    assert got == [(6, "f2")]


def test_cdc_apply_rejects_unknown_op(spark):
    """A typo'd op must raise at execution, not silently vanish."""
    import pytest

    from taxi_rides_ny_duckdb_spark.plans.snapshots import cdc_apply

    base = _tbl(spark, [(1, "a")])
    changes = spark.createDataFrame(
        [(2, "b", "upsart")], ["id", "val", "op"]
    )
    with pytest.raises(Exception, match="cdc_apply"):
        cdc_apply(base, changes, "id").collect()


def test_cdc_apply_inverts_snapshot_diff(spark):
    """The round trip: build the changeset snapshot_diff(old, new)
    implies (added/changed → upsert with new payload, removed →
    delete) and apply it to old — the result must equal new exactly."""
    from taxi_rides_ny_duckdb_spark.plans.snapshots import (
        cdc_apply,
        snapshot_diff,
    )

    old = _tbl(spark, [(i, f"v{i}") for i in range(40)])
    new = _tbl(
        spark,
        [
            (i, f"v{i}" + ("!" if i % 3 == 0 else ""))
            for i in range(40)
            if i % 5 != 0
        ]
        + [(i, f"v{i}") for i in range(40, 46)],
    )
    diff = snapshot_diff(old, new, "id", ("val",))
    upserts = (
        diff.filter(F.col("status").isin("added", "changed"))
        .select("id")
        .join(new, "id")
        .withColumn("op", F.lit("upsert"))
    )
    deletes = (
        diff.filter(F.col("status") == "removed")
        .select("id")
        .join(old, "id")
        .withColumn("op", F.lit("delete"))
    )
    applied = cdc_apply(old, upserts.unionByName(deletes), "id")
    got = sorted((r["id"], r["val"]) for r in applied.collect())
    want = sorted((r["id"], r["val"]) for r in new.collect())
    assert got == want
