"""Window/time operators (EXTENSION beyond the reference's single
row_number dedup — SURVEY §2.4): top-k per group, sessionization,
batch tumbling/sliding windows. All pure DataFrame plans."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int, descending: bool = True,
    tiebreak_cols: list[str] = (),
) -> DataFrame:
    """Classic top-k per group via row_number ≤ k. Tie-break columns
    make the result deterministic (required for oracle hashing).
    One shuffle on the group keys; Spark's WindowExec sorts within
    partitions — for huge groups prefer pre-aggregation or AQE skew
    handling."""
    ordering = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    ordering += [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: lag(ts) per user, new-session flag on
    gap > threshold, running sum → session index.

    Oracle-parity notes: the order within a user must be total (ts +
    tiebreak), and the gap comparison uses epoch seconds (integer
    arithmetic, exact in both engines). Two window passes over one
    shuffle on user_col."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(gap_s.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("session_seq", F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))


def tumbling_window_agg(
    df: DataFrame, ts_col: str, width: str, agg_exprs: list[Column], extra_keys: list[str] = (),
) -> DataFrame:
    """Batch tumbling-window aggregation via F.window. Emits
    window_start/window_end as timestamps (DuckDB oracle:
    ``time_bucket(INTERVAL width, ts)`` equals window_start)."""
    win = F.window(F.col(ts_col), width)
    out = df.groupBy(win.alias("w"), *[F.col(c) for c in extra_keys]).agg(*agg_exprs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[F.col(c) for c in out.columns if c != "w"],
    )


def sliding_window_agg(
    df: DataFrame, ts_col: str, width: str, slide: str, agg_exprs: list[Column],
    extra_keys: list[str] = (),
) -> DataFrame:
    """Sliding (hopping) windows — each row lands in width/slide
    windows; Spark expands them JVM-side (no explode needed)."""
    win = F.window(F.col(ts_col), width, slide)
    out = df.groupBy(win.alias("w"), *[F.col(c) for c in extra_keys]).agg(*agg_exprs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[F.col(c) for c in out.columns if c != "w"],
    )
