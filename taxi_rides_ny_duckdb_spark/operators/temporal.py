"""Temporal joins Spark has no native operator for (EXTENSION):
as-of joins and range (interval) joins, built as compositions of
DataFrame ops — the sort-based / bucket-based scale idioms, not
nested-loop translations.

Reference has no temporal joins (SURVEY §2.5); DuckDB's native
``ASOF JOIN`` serves as the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """As-of join (trades×quotes shape): for every left row, attach the
    single right row with the greatest ``right_ts <= left_ts``
    (``backward``; ``forward`` = smallest ``right_ts >= left_ts``) for
    the same key. Left-outer semantics: unmatched left rows keep NULL
    right columns.

    **Spark-first plan** — the sort-based idiom, not a join at all:
    union both inputs tagged by side, one window per key ordered by
    (ts, side), and carry the last non-null right payload forward with
    ``last(..., ignorenulls=True)``. One shuffle on the key, linear
    scan within partitions, no row explosion — this is the plan that
    survives 100 TB of trades against 100 TB of quotes, unlike the
    inequality-join form (BroadcastNestedLoop) or per-key
    ``collect_list`` UDFs (memory explosion on hot keys).

    Ties: a right row at exactly ``left_ts`` matches (<= / >=). Right
    rows must be unique per (key, ts) — pre-aggregate duplicates, or
    which-row-wins is unspecified (same caveat as DuckDB ASOF).

    Output: all left columns + right's non-key non-ts columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.lit(None).alias(f"__r_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
    )
    u = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal ts → ties match
        order = [F.col("__t").asc(), F.col("__is_left").asc()]
    else:
        order = [F.col("__t").desc(), F.col("__is_left").asc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "__is_left",
        "__l",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in payload_cols
        ],
    ).filter(F.col("__is_left") == 1)
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r_{c}").alias(c) for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval join: left rows whose ``left_point`` falls inside a
    right row's ``[right_start, right_end]`` (inclusive), optionally
    also matching an equality key ``on``.

    **Scale path**: a raw inequality join degenerates to a
    BroadcastNestedLoopJoin — O(n·m) and a broadcast of one whole side.
    Instead both sides are mapped to coarse epoch buckets: the left
    point to its bucket, each right interval exploded (``sequence()``,
    JVM-side) to every bucket it overlaps; equi-join on (bucket [+
    key]); exact-filter the candidates. Work is proportional to genuine
    overlaps per bucket and shuffles hash-partitioned on the bucket.
    Pick ``bucket_seconds`` ≈ typical interval length: shorter buckets
    replicate intervals more; longer buckets admit more false
    candidates for the post-filter.

    Output: all left columns + right's columns not shadowed by left's.
    """
    bs = int(bucket_seconds)
    overlap = set(left.columns) & set(right.columns) - ({on} if on else set())
    if overlap:
        raise ValueError(
            f"rename overlapping non-key columns before range_join: {sorted(overlap)}"
        )
    keys = ["__bucket"] + ([on] if on else [])
    l = left.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(left_point)) / bs).cast("long")
    )
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(right_start)) / bs).cast("long"),
                F.floor(F.unix_timestamp(F.col(right_end)) / bs).cast("long"),
            )
        ),
    )
    out_right = [c for c in right.columns if c not in left.columns and c != on]
    joined = (
        l.join(r, keys, "inner")
        .filter(
            (F.col(left_point) >= F.col(right_start))
            & (F.col(left_point) <= F.col(right_end))
        )
        .select(*left.columns, *out_right)
    )
    return joined
