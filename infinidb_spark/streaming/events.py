"""Event-stream operators: tumbling/sliding windows, watermarked state.

Batch/stream duality: ``tumbling_event_stats`` / ``sliding_event_counts``
are plain DataFrame transforms usable on either a static or a streaming
DataFrame — Structured Streaming's incrementalization handles the rest.

Scale notes: windowed aggregation state is keyed on (window, event_type)
— bounded cardinality; the watermark bounds state retention, so a
1000-executor streaming job holds hours of state, not the full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def tumbling_event_stats(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window stats per event type (works batch or streaming)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            # avg derives from the ROUNDED sum, not avg(value): the raw
            # double sum carries order-dependent ULP noise, and at sf1 a
            # group's true mean sat exactly on the 6-decimal .5 boundary
            # (15212.7/320 = 47.5396875) so the noise flipped the
            # rounding between engines.  round-4 absorbs the noise (the
            # generator's 1-decimal values keep sums far from 4-decimal
            # boundaries); the identical double ÷ identical count is
            # then deterministic on both engines, and floor(x*1e6+0.5)
            # keeps HALF_UP semantics engines agree on (IEEE floor is
            # exact; see the r06 .472812/.472813 round() divergence)
            (
                F.floor(
                    F.round(F.sum("value"), 4) / F.count(F.lit(1)) * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("avg_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
            "approx_users",
        )
    )


def sliding_event_counts(
    events: DataFrame, width: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session assignment per user: a new session starts after a gap
    (batch formulation with lag/cumsum — the window-function equivalent
    of stream session windows; ``F.session_window`` is the streaming
    twin)."""
    from pyspark.sql import Window

    # asc_nulls_last: Spark's default ASC sorts NULLs FIRST while
    # DuckDB (and the events_sessionize oracle) sort them LAST — a
    # single NULL-ts event would otherwise land at opposite ends of
    # the partition and shift every lag/cumsum value for that user.
    # With NULLs last, the gap formula below also matches the oracle's
    # exact semantics for the trailing NULL block (first NULL-ts row
    # continues the session: its gap is non-NULL but the diff is NULL
    # → falsy; later NULL-ts rows see a NULL lag → new session).
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    gap = F.lag("ts").over(w)
    new_session = (
        F.when(gap.isNull(), 1)
        # ALL-INTEGER microsecond gap: unix_timestamp truncates to
        # whole seconds while DuckDB epoch() keeps microseconds, so a
        # gap in (1800s, 1801s) would split sessions in one engine only
        .when(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(gap.cast("timestamp"))
            > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    return (
        events.withColumn("_new", new_session)
        .withColumn("session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(
            "user_id",
            "event_id",
            "ts",
            F.concat_ws("-", F.col("user_id"), F.col("session_seq")).alias("session_id"),
        )
    )


def events_stream_from_directory(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream with the events schema (the cpimport-style
    landing-directory ingest pattern, streamed)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def stream_deduplicate(
    stream: DataFrame, keys: tuple[str, ...] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked streaming exact-dedup — the streaming twin of
    ``operators/dedup.dedup_exact``: duplicate keys arriving within the
    watermark horizon are dropped, and the dedup state itself is evicted
    past it (``dropDuplicatesWithinWatermark``), so state stays bounded
    no matter how long the stream runs — the property that makes
    exactly-once ingest dedup viable on an unbounded 100 TB/day feed."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_tumbling_counts(
    stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
):
    """Watermarked tumbling aggregation on a streaming DataFrame.

    Returns an unstarted writeStream-ready DataFrame; callers pick sink +
    output mode.  The watermark bounds state: late rows beyond it are
    dropped — the knob the reference simply doesn't have (SURVEY §2.10).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
