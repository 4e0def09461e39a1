"""Custom stateful streaming operators — session windows and
arbitrary per-key state (`applyInPandasWithState`).

This is the operator class the reference fundamentally cannot express
(SURVEY §2.10: no streaming, no state): unbounded keyed state evolving
per micro-batch with timeout-driven emission.

Scale notes: state lives in the executor state store partitioned by
key (user_id) — uniform hash, no driver involvement.  Session windows
and the stream-stream join bound retention by watermark; the
running-totals accumulator keeps state per key FOREVER by default
(that is what a running total means) — long-running deployments over
unbounded key domains pass ``idle_timeout`` to evict keys idle past
the threshold (the key restarts from zero if it reappears).
`applyInPandasWithState` moves one Arrow batch per key-group per
trigger — the Python hop prices in only on the (small) grouped state
path, never on the main event stream.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_session_windows(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows: per-user sessions closed after `gap` of
    inactivity (`F.session_window` — the streaming twin of the batch
    lag/cumsum sessionize in plans/events.py)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


#: output/state schemas for the running-totals stateful operator
RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Arbitrary-state update function: accumulate per-user event count
    and value sum across micro-batches, emitting the running totals on
    every batch that touches the key."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(len(pdf))
        total += float(pdf["value"].sum())
    state.update((n, total))
    # emit the RAW accumulator: rounding happens engine-side (F.round,
    # HALF_UP like the DuckDB oracle) — Python's banker's rounding
    # diverges on exact ties (round(0.03125, 4) -> 0.0312 vs 0.0313)
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def _make_timeout_updater(idle_timeout: str):
    """Timeout-aware variant of ``_update_running_totals``: evicts a
    key's accumulator after ``idle_timeout`` of processing-time
    inactivity (emits nothing on eviction; a reappearing key restarts
    from zero — documented in the module docstring)."""

    # setTimeoutDuration takes milliseconds; pandas parses the human
    # duration string ("30 minutes") once at operator build
    timeout_ms = int(pd.Timedelta(idle_timeout).total_seconds() * 1000)

    def _update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return _update


def stream_running_totals(
    stream: DataFrame, idle_timeout: str | None = None
) -> DataFrame:
    """Per-user running totals via applyInPandasWithState — the
    'custom stateful operator' extension point (a keyed accumulator the
    engine keeps alive across triggers).

    ``idle_timeout`` (e.g. ``"30 minutes"``): evict a key's state after
    that much processing-time inactivity — the retention bound for
    continuous runs over unbounded key domains.  Default ``None`` keeps
    state forever (a drain-style availableNow run, or a bounded key
    domain)."""
    if idle_timeout is None:
        fn, conf = _update_running_totals, GroupStateTimeout.NoTimeout
    else:
        fn = _make_timeout_updater(idle_timeout)
        conf = GroupStateTimeout.ProcessingTimeTimeout
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )


def stream_stream_join(
    clicks: DataFrame,
    views: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: click events joined to the
    same user's view events within ``max_delay`` — both sides buffer
    state bounded by the watermark (the interval condition lets Spark
    evict rows older than watermark+delay; without it state grows
    forever).  The operator class the reference cannot express at all:
    a join whose both inputs are unbounded.
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    v = views.withWatermark("ts", watermark).alias("v")
    return c.join(
        v,
        (F.col("c.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") >= F.col("c.ts") - F.expr(f"INTERVAL {max_delay}"))
        & (F.col("v.ts") <= F.col("c.ts")),
    ).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("v.ts").alias("view_ts"),
    )
