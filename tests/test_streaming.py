"""Structured Streaming delivery tests.

The window SEMANTICS are validated by the DuckDB oracles on the batch
twins (plans/events.py); here we validate STREAMING delivery: a file
source fed incrementally must converge to the batch answer, and the
watermark must actually bound state.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from infinidb_spark.session import load_tables
from infinidb_spark.streaming.events import (
    events_stream_from_directory,
    stream_tumbling_counts,
    tumbling_event_stats,
)


def test_stream_converges_to_batch(spark, sf_dir):
    events = load_tables(spark, sf_dir, names=("events",))["events"]
    workdir = tempfile.mkdtemp(prefix="infinidb_stream_")
    in_dir = os.path.join(workdir, "in")
    try:
        # land the events table as multiple files → incremental triggers
        events.repartition(4).write.parquet(in_dir)

        stream = events_stream_from_directory(spark, in_dir, max_files_per_trigger=1)
        agg = stream_tumbling_counts(stream, width="1 hour", watermark="100 days")
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("select * from stream_counts").collect()
        }
        want = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in tumbling_event_stats(events)
            .select(
                "window_start",
                "event_type",
                "n_events",
                "sum_value",
            )
            .collect()
        }
        assert got == want, f"stream/batch divergence: {len(got)} vs {len(want)} groups"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_watermark_drops_late_rows(spark):
    workdir = tempfile.mkdtemp(prefix="infinidb_late_")
    in_dir = os.path.join(workdir, "in")
    os.makedirs(in_dir)
    try:
        on_time = spark.createDataFrame(
            [(1, "2024-01-01 10:00:05", 1, "click", 1.0, "{}"),
             (2, "2024-01-01 12:00:05", 1, "click", 1.0, "{}")],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        late = spark.createDataFrame(
            [(3, "2024-01-01 10:00:10", 1, "click", 1.0, "{}")],  # 2h late vs max ts
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))

        on_time.coalesce(1).write.mode("append").parquet(in_dir)
        stream = events_stream_from_directory(spark, in_dir, max_files_per_trigger=1)
        agg = stream_tumbling_counts(stream, width="1 hour", watermark="30 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("late_counts")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()  # watermark advances past 11:30
            # second file: a row 2h older than the watermark → dropped
            late.coalesce(1).write.mode("append").parquet(in_dir)
            q.processAllAvailable()
            rows = spark.sql("select * from late_counts").collect()
        finally:
            q.stop()
        # the closed 10:00 window must have been emitted exactly once,
        # counting only the on-time row — the late row must not re-open
        # it or inflate the count
        emitted = [r.window_start for r in rows]
        assert len(emitted) == len(set(emitted)), f"late row re-opened a closed window: {rows}"
        ten = [r for r in rows if r.window_start.hour == 10]
        assert ten and ten[0].n_events == 1, f"late row leaked into closed window: {rows}"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_stream_dedup_converges_to_distinct(spark, sf_dir):
    """Duplicated ingest (the same file set landed twice) must come out
    of the watermarked dedup exactly once per event_id."""
    from infinidb_spark.streaming.events import stream_deduplicate

    events = load_tables(spark, sf_dir, names=("events",))["events"].limit(1500)
    workdir = tempfile.mkdtemp(prefix="infinidb_stream_dedup_")
    in_dir = os.path.join(workdir, "in")
    try:
        events.repartition(3).write.parquet(in_dir)
        events.repartition(2).write.mode("append").parquet(in_dir)  # dupes

        stream = events_stream_from_directory(spark, in_dir, max_files_per_trigger=2)
        deduped = stream_deduplicate(stream, keys=("event_id",), watermark="100 days")
        q = (
            deduped.writeStream.format("memory")
            .queryName("stream_dedup")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = spark.sql("select count(*) n, count(distinct event_id) d from stream_dedup").collect()[0]
        want = events.select("event_id").distinct().count()
        assert (got.n, got.d) == (want, want)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_sessionize_null_ts_matches_duckdb_order(spark):
    """r10 review pin: a NULL-ts event must sort LAST (DuckDB/oracle
    parity — Spark's bare ASC sorts NULLs first and shifted every
    lag/cumsum value for the user), and the first NULL-ts row CONTINUES
    the prior session (its gap-diff is NULL → falsy, the oracle's exact
    CASE semantics)."""
    import datetime

    from infinidb_spark.streaming.events import sessionize

    rows = [
        (1, 1, datetime.datetime(2024, 1, 1, 10, 0, 0)),
        (1, 2, datetime.datetime(2024, 1, 1, 10, 5, 0)),
        (1, 3, None),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp")
    out = sessionize(df, gap_minutes=30).orderBy("event_id").collect()
    assert [r["session_id"] for r in out] == ["1-1", "1-1", "1-1"]
