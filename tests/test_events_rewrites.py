"""r11 optimization: the events funnel/cohort queries were restructured
to stop re-scanning the events relation per consumed subtree.  Pin each
rewrite against its old DataFrame shape recomputed here — the driver's
DuckDB oracle also replays the old shape in SQL, but these run in CI."""

from __future__ import annotations

from pyspark.sql import functions as F

from infinidb_spark.plans.events import events_cohort_retention, events_strict_funnel
from infinidb_spark.session import load_tables


def _events(spark, sf_dir):
    return load_tables(spark, sf_dir, names=("events",))["events"]


def test_strict_funnel_single_agg_matches_per_step_union(spark, sf_dir):
    """One LEFT-join funnel relation + stack replaces three per-step
    .agg(count) branches (which re-scanned events five times)."""
    events = _events(spark, sf_dir)
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    old = [
        ("step1_view", v.count()),
        ("step2_click", c.count()),
        ("step3_purchase", p.count()),
    ]
    new = [(r.step, r.n_users) for r in events_strict_funnel(spark, sf_dir).collect()]
    assert new == old
    assert new[0][1] >= new[1][1] >= new[2][1]  # funnel monotonicity


def test_cohort_retention_window_matches_two_agg_shape(spark, sf_dir):
    """distinct (user, week) + min-over-user-partition window replaces
    the separate groupBy-min `first` relation (which re-scanned events
    and defeated exchange reuse via column pruning)."""
    events = _events(spark, sf_dir)
    week = F.date_trunc("week", F.col("ts"))
    first = events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = events.select("user_id", week.alias("week")).distinct()
    sizes = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    act = (
        activity.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    old = sorted(
        tuple(r)
        for r in act.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("date").cast("string").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .collect()
    )
    new_rows = events_cohort_retention(spark, sf_dir).collect()
    assert sorted(tuple(r) for r in new_rows) == old
    assert new_rows  # non-vacuous at this SF
    keys = [(r.cohort_week, r.week_offset) for r in new_rows]
    assert keys == sorted(keys)  # ordering contract
