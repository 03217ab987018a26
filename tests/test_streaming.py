"""Structured Streaming jobs: drive each over the events parquet with
availableNow + memory sink and check against the batch analog —
batch/stream symmetry is the contract (streaming/jobs.py docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_rides_ny_duckdb_spark.sources.registry import load, table_path
from taxi_rides_ny_duckdb_spark.streaming import jobs


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # readStream wants a directory of files with a known (µs) schema;
    # rewrite the nanos-timestamp source once via the batch loader.
    out = str(tmp_path_factory.mktemp("events_stream"))
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def test_tumbling_counts_stream_equals_batch(spark, sf_dir, events_dir):
    stream = jobs.tumbling_counts(jobs.read_events_stream(spark, events_dir))
    jobs.run_to_memory_sink(stream, "t_tumbling", output_mode="complete")
    got = spark.table("t_tumbling")

    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    g = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert g == b


def test_session_windows_stream(spark, events_dir):
    stream = jobs.session_windows(jobs.read_events_stream(spark, events_dir))
    jobs.run_to_memory_sink(stream, "t_sessions", output_mode="complete")
    got = spark.table("t_sessions")
    assert got.count() > 0
    # session windows are per-user, disjoint, gap-separated
    rows = got.orderBy("user_id", "session_start").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    some_user_has_multiple = False
    for sess in by_user.values():
        for a, b in zip(sess, sess[1:]):
            some_user_has_multiple = True
            # next session starts ≥ 30min after previous one ends
            assert (b["session_start"] - a["session_end"]).total_seconds() >= 0
    assert some_user_has_multiple


def test_dedup_within_watermark(spark, events_dir, tmp_path_factory):
    # duplicate the input directory content → stream sees every event twice
    dup_dir = str(tmp_path_factory.mktemp("events_dup"))
    base = spark.read.parquet(events_dir)
    base.union(base).write.mode("overwrite").parquet(dup_dir)

    stream = jobs.dedup_within_watermark(
        jobs.read_events_stream(spark, dup_dir), keys=["event_id"], watermark="10 days"
    )
    jobs.run_to_memory_sink(stream, "t_dedup", output_mode="append")
    assert spark.table("t_dedup").count() == base.count()


def test_sliding_counts_stream(spark, events_dir):
    stream = jobs.sliding_counts(jobs.read_events_stream(spark, events_dir))
    jobs.run_to_memory_sink(stream, "t_sliding", output_mode="complete")
    got = spark.table("t_sliding")
    # each event lands in width/slide = 2 windows
    total_events = spark.read.parquet(events_dir).count()
    assert got.agg(F.sum("n_events")).first()[0] == 2 * total_events
