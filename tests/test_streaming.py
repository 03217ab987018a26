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


@pytest.fixture(scope="module")
def chunked_events_dir(spark, sf_dir, tmp_path_factory):
    """Events split into 4 time-ordered parquet files so a
    maxFilesPerTrigger=1 stream sees them as 4 in-order micro-batches
    (no late data ⇒ stateful results comparable to batch analogs)."""
    out = tmp_path_factory.mktemp("events_chunks")
    pdf = load(spark, sf_dir, "events").toPandas().sort_values("ts").reset_index(drop=True)
    k = len(pdf) // 4
    for i in range(4):
        chunk = pdf.iloc[i * k : (i + 1) * k if i < 3 else len(pdf)]
        chunk.to_parquet(
            str(out / f"{i:02d}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    return str(out)


def _read_chunked(spark, path):
    from taxi_rides_ny_duckdb_spark.streaming import jobs

    return (
        spark.readStream.schema(jobs.EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def test_running_user_totals_stateful(spark, sf_dir, chunked_events_dir):
    """applyInPandasWithState running totals: the LAST update row per
    user equals the batch groupBy — state accumulated across 4
    micro-batches."""
    from taxi_rides_ny_duckdb_spark.streaming import jobs, stateful

    stream = stateful.running_user_totals(_read_chunked(spark, chunked_events_dir))
    jobs.run_to_memory_sink(stream, "t_running", output_mode="update")
    got = spark.table("t_running").collect()
    # update mode: several rows per user; the final one is the total
    final: dict = {}
    for r in got:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = (
        spark.read.parquet(chunked_events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("tot"),
        )
        .collect()
    )
    assert len(final) == len(batch)
    multi_update = len(got) > len(final)  # state really crossed batches
    assert multi_update
    for r in batch:
        n, tot = final[r["user_id"]]
        assert n == r["n"]
        assert abs(tot - r["tot"]) < 1e-6


def test_inactivity_sessions_stateful(spark, sf_dir, chunked_events_dir):
    """Custom event-time-timeout sessionization: every emitted (closed)
    session matches the batch sessionize result exactly."""
    from taxi_rides_ny_duckdb_spark.operators.windows import sessionize
    from taxi_rides_ny_duckdb_spark.streaming import jobs, stateful

    stream = stateful.inactivity_sessions(
        _read_chunked(spark, chunked_events_dir), gap_minutes=30, watermark="1 minute"
    )
    jobs.run_to_memory_sink(stream, "t_inact", output_mode="append")
    got = spark.table("t_inact").collect()
    assert len(got) > 0  # the watermark closed at least the early sessions

    batch = (
        sessionize(spark.read.parquet(chunked_events_dir), gap_minutes=30)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    batch_by_key = {
        (r["user_id"], r["session_start"]): r for r in batch
    }
    for r in got:
        b = batch_by_key[(r["user_id"], r["session_start"])]
        assert r["session_end"] == b["session_end"]
        assert r["n_events"] == b["n_events"]


def test_stateful_state_survives_restart(spark, chunked_events_dir, tmp_path_factory):
    """Checkpoint recovery: stop the stateful query after half the
    input, restart with the same checkpoint over the full input — the
    restarted run must resume from persisted state, so final totals
    equal the batch aggregate over ALL data."""
    import shutil
    from pathlib import Path

    from taxi_rides_ny_duckdb_spark.streaming import jobs, stateful

    src = sorted(Path(chunked_events_dir).glob("*.parquet"))
    live = tmp_path_factory.mktemp("events_live")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out = str(tmp_path_factory.mktemp("restart_out"))

    def run_once():
        stream = stateful.running_user_totals(
            spark.readStream.schema(jobs.EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(live))
        )

        # memory sink can't recover from a checkpoint; foreachBatch can
        def sink(df, epoch_id):
            df.withColumn("__epoch", F.lit(epoch_id)).write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in src[:2]:
        shutil.copy(f, live / f.name)
    run_once()

    for f in src[2:]:
        shutil.copy(f, live / f.name)
    run_once()

    # epoch ids keep increasing across the restart; a user's row at
    # their max epoch carries the running total including recovered
    # first-run state
    updates = spark.read.parquet(out).collect()
    assert max(r["__epoch"] for r in updates) >= 2, "no post-restart batches"
    final_b: dict = {}
    for r in sorted(updates, key=lambda r: r["__epoch"]):
        final_b[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final_b, "nothing emitted"

    full = {
        r["user_id"]: (r["n"], r["tot"])
        for r in spark.read.parquet(str(live))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("tot"),
        )
        .collect()
    }
    for uid, (n, tot) in final_b.items():
        assert n == full[uid][0], (uid, n, full[uid])
        assert abs(tot - full[uid][1]) < 1e-6


def test_stream_to_partitioned_parquet_incremental(spark, sf_dir, tmp_path):
    """foreachBatch sink: all available input lands once, partition
    layout is readable with pruning, and a restart with the same
    checkpoint is a no-op (no duplicate batches)."""
    from taxi_rides_ny_duckdb_spark.sources.registry import load
    from taxi_rides_ny_duckdb_spark.streaming import jobs

    src_dir = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = load(spark, sf_dir, "events")
    ev.coalesce(1).write.parquet(src_dir)

    stream = jobs.read_events_stream(spark, src_dir)
    jobs.stream_to_partitioned_parquet(stream, out, ckpt, partition_by=("event_type",))
    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    # partition pruning works: one event_type reads a subset
    one = got.filter(F.col("event_type") == "view").count()
    assert 0 < one < ev.count()

    # restart with same checkpoint: no new input -> nothing appended
    stream2 = jobs.read_events_stream(spark, src_dir)
    jobs.stream_to_partitioned_parquet(stream2, out, ckpt, partition_by=("event_type",))
    assert spark.read.parquet(out).count() == ev.count()
