"""Structured Streaming jobs (EXTENSION — the reference is batch-only,
SURVEY §2.9). Each job is a function: streaming DataFrame in →
streaming DataFrame out, so the same logic binds to any source
(parquet drops in tests, Kafka in production) and any sink.

Batch/stream symmetry: the batch analogs of these operators live in
``operators/windows.py`` — same window/gap semantics, so a backfill
(batch over history) and the live stream produce consistent results.

State & scale notes:
- Watermarks bound state: without them, windowed aggs and dedup state
  grow forever. Every stateful job here takes an explicit watermark.
- ``dropDuplicatesWithinWatermark`` keeps keys only inside the
  watermark horizon — the streaming analog of staging's
  dropDuplicates (plans/staging.py).
- Output modes: windowed aggs use append (emit once the watermark
  passes window end) so downstream parquet sinks get immutable files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-drop streaming source over an events directory (schema must
    be explicit for readStream)."""
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(path)


def tumbling_counts(events: DataFrame, width: str = "10 minutes",
                    watermark: str = "30 minutes") -> DataFrame:
    """Windowed count+sum per event_type with late-data tolerance."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes", watermark: str = "30 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Native session windows (gap-merged per user) — the streaming
    analog of operators/windows.sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str] | None = None,
                           watermark: str = "30 minutes") -> DataFrame:
    """Stateful streaming dedup: exactly-one-survivor per key among
    events whose event-times fall inside the watermark horizon; state
    is evicted as the watermark advances (bounded memory)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def view_click_join(views: DataFrame, clicks: DataFrame,
                    max_delay: str = "10 minutes",
                    watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream inner join: each click matched to same-user views
    it followed within ``max_delay`` (attribution join). Both sides are
    watermarked and the join condition bounds event-time distance, so
    Spark can size the join state buffer and evict rows once the
    watermark passes — the required shape for an unbounded×unbounded
    join (an unconstrained stream-stream join would buffer forever).

    Batch symmetry: on static frames the same condition is the bucketed
    ``operators/temporal.range_join`` with views as intervals
    [view_ts, view_ts + max_delay]."""
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_delay}")),
    ).select(
        F.col("v_user").alias("user_id"), "view_id", "view_ts", "click_id", "click_ts"
    )


def run_to_memory_sink(stream_df: DataFrame, query_name: str,
                       output_mode: str = "append"):
    """Drive a streaming query over all currently-available input and
    block until done (availableNow) — the deterministic harness used by
    tests and backfills. Returns the StreamingQuery (stopped)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
