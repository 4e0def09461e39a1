"""Stateful streaming: session windows close correctly; arbitrary
per-key state survives across micro-batches and converges to the batch
answer."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from infinidb_spark.session import load_tables
from infinidb_spark.streaming.events import events_stream_from_directory
from infinidb_spark.streaming.stateful import (
    stream_running_totals,
    stream_session_windows,
)


def test_session_window_closes_on_gap(spark):
    workdir = tempfile.mkdtemp(prefix="infinidb_sess_")
    in_dir = os.path.join(workdir, "in")
    os.makedirs(in_dir)
    try:
        # user 1: two events 10 min apart (one session), then one 2 h
        # later (a second session); a final late-hour event advances the
        # watermark so both sessions close and emit in append mode
        rows = [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:10:00", 1, "click", 2.0, "{}"),
            (3, "2024-01-01 12:30:00", 1, "click", 4.0, "{}"),
            (4, "2024-01-01 20:00:00", 2, "click", 8.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("append").parquet(in_dir)

        stream = events_stream_from_directory(spark, in_dir)
        agg = stream_session_windows(stream, gap="30 minutes", watermark="1 hour")
        q = (
            agg.writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.n_events, r.sum_value)
            for r in spark.sql("select * from sessions").collect()
        }
        # user 1 splits into (2 events, 3.0) and (1 event, 4.0)
        assert (1, 2, 3.0) in got, got
        assert (1, 1, 4.0) in got, got
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_running_totals_accumulate_across_batches(spark, sf_dir):
    events = load_tables(spark, sf_dir, names=("events",))["events"]
    events = events.filter(F.col("user_id") < 20)
    workdir = tempfile.mkdtemp(prefix="infinidb_state_")
    in_dir = os.path.join(workdir, "in")
    try:
        events.repartition(3).write.parquet(in_dir)
        stream = events_stream_from_directory(spark, in_dir, max_files_per_trigger=1)
        q = (
            stream_running_totals(stream)
            .writeStream.format("memory")
            .queryName("running_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # update mode: the LAST emission per user is the final total
        # the operator emits the RAW accumulator (rounding is the
        # consumer's job, engine-side F.round — see streaming/stateful)
        final = spark.sql(
            """
            select user_id, n_events, round(total_value, 4) as total_value from (
              select *, row_number() over (partition by user_id order by rn desc) as pick
              from (select *, monotonically_increasing_id() as rn from running_totals))
            where pick = 1
            """
        ).collect()
        got = {(r.user_id, r.n_events, r.total_value) for r in final}
        want = {
            (r.user_id, r.n_events, r.total_value)
            for r in events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
            .collect()
        }
        assert got == want, f"{len(got)} vs {len(want)}: {sorted(got)[:3]} {sorted(want)[:3]}"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_stream_stream_join_converges_to_batch(spark, sf_dir):
    from infinidb_spark.streaming.stateful import stream_stream_join

    events = load_tables(spark, sf_dir, names=("events",))["events"]
    events = events.filter(F.col("user_id") < 30)
    clicks_b = events.filter(F.col("event_type") == "click")
    views_b = events.filter(F.col("event_type") == "view")
    workdir = tempfile.mkdtemp(prefix="infinidb_ssj_")
    c_dir, v_dir = os.path.join(workdir, "c"), os.path.join(workdir, "v")
    try:
        clicks_b.repartition(2).write.parquet(c_dir)
        views_b.repartition(2).write.parquet(v_dir)
        joined = stream_stream_join(
            events_stream_from_directory(spark, c_dir),
            events_stream_from_directory(spark, v_dir),
            max_delay="1 hour",
            watermark="100 days",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("ssj")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.user_id, r.click_id, r.view_id)
            for r in spark.sql("select * from ssj").collect()
        }
        want = {
            (r.user_id, r.click_id, r.view_id)
            for r in clicks_b.alias("c")
            .join(
                views_b.alias("v"),
                (F.col("c.user_id") == F.col("v.user_id"))
                & (F.col("v.ts") >= F.col("c.ts") - F.expr("INTERVAL 1 hour"))
                & (F.col("v.ts") <= F.col("c.ts")),
            )
            .select(
                F.col("c.user_id").alias("user_id"),
                F.col("c.event_id").alias("click_id"),
                F.col("v.event_id").alias("view_id"),
            )
            .collect()
        }
        assert got == want, f"{len(got)} vs {len(want)}"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_running_totals_idle_timeout_wiring(spark, sf_dir):
    """idle_timeout engages ProcessingTimeTimeout eviction; in an
    availableNow drain the timeout never fires, so totals must equal
    the default path's (validates the timeout updater's accumulate +
    setTimeoutDuration wiring end-to-end)."""
    events = load_tables(spark, sf_dir, names=("events",))["events"]
    events = events.filter(F.col("user_id") < 10)
    workdir = tempfile.mkdtemp(prefix="infinidb_state_to_")
    in_dir = os.path.join(workdir, "in")
    try:
        events.repartition(2).write.parquet(in_dir)
        stream = events_stream_from_directory(spark, in_dir, max_files_per_trigger=1)
        q = (
            stream_running_totals(stream, idle_timeout="30 minutes")
            .writeStream.format("memory")
            .queryName("running_totals_to")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        final = spark.sql(
            """
            select user_id, n_events, round(total_value, 4) as total_value from (
              select *, row_number() over (partition by user_id order by rn desc) as pick
              from (select *, monotonically_increasing_id() as rn
                    from running_totals_to))
            where pick = 1
            """
        ).collect()
        want = {
            (r.user_id, r.n_events, r.total_value)
            for r in events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
            .collect()
        }
        got = {(r.user_id, r.n_events, r.total_value) for r in final}
        assert got == want
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
