"""Event-table corpus: time-window aggregation (batch twins of the
streaming operators), sessionization, and JSON-props analytics.

The reference has no streaming and no time-window operators — these are
the post-parity extension flagged in SURVEY §2.10/§7, validated through
DuckDB ``time_bucket`` oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.plans.registry import query
from infinidb_spark.streaming.events import (
    sessionize,
    sliding_event_counts,
    tumbling_event_stats,
)


# load_registered owns the load/register contract (plans/registry.py);
# _t is just the conventional short local name
from infinidb_spark.plans.registry import load_registered as _t  # noqa: E402


@query(
    "events_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*)                    AS n_events,
           round(sum(value), 4)        AS sum_value,
           -- avg from the ROUNDED sum (mirrors tumbling_event_stats):
           -- raw-double avg carries order-dependent ULP noise that
           -- flipped the 6-decimal rounding at sf1 (47.5396875 boundary)
           floor(round(sum(value), 4) / count(*) * 1000000 + 0.5) / 1000000 AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch twin of the
    streaming operator; approx_count_distinct omitted — not oracle-able)."""
    (events,) = _t(spark, sf_dir, "events")
    return tumbling_event_stats(events).drop("approx_users")


@query(
    "events_sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS b, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT w.window_start, w.event_type, CAST(sum(b2.n) AS BIGINT) AS n_events
    FROM (SELECT DISTINCT b - INTERVAL 1 HOUR AS window_start, event_type FROM buckets
          UNION SELECT DISTINCT b, event_type FROM buckets) w
    JOIN buckets b2
      ON b2.event_type = w.event_type
     AND b2.b >= w.window_start AND b2.b < w.window_start + INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h windows (each event in 2 windows)."""
    (events,) = _t(spark, sf_dir, "events")
    return sliding_event_counts(events, "2 hours", "1 hour")


@query(
    "events_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           -- concat_ws, not ||: the Spark side builds session_id with
           -- concat_ws (NULL parts skipped); || would NULL the whole
           -- id for a NULL user_id
           concat_ws('-', user_id, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR)) AS session_id
    FROM g
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) — lag + running sum."""
    (events,) = _t(spark, sf_dir, "events")
    return sessionize(events, gap_minutes=30)


@query(
    "events_json_funnel",
    oracle="""
    SELECT event_type,
           count(*)                                             AS n,
           CAST(count(DISTINCT user_id) AS BIGINT)              AS uniq_users,
           floor(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS avg_k
    -- DOUBLE on both the filter and the avg (the Spark side mirrors):
    -- a BIGINT cast truncates in Spark but ERRORS in DuckDB for a
    -- non-integral k, and a truncated filter/avg would diverge on
    -- fractional values ('50.5' > 50 as double, false as bigint)
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
    GROUP BY event_type
    """,
)
def events_json_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-prop filter + per-type aggregation over the event stream
    shape (get_json_object stays JVM-side)."""
    (events,) = _t(spark, sf_dir, "events")
    # DOUBLE, not BIGINT: Spark's bigint cast TRUNCATES a fractional k
    # where DuckDB's errors, and the truncated filter/avg diverge on
    # values like 50.5 — double semantics agree in both engines
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        events.withColumn("_k", k)
        .filter(F.col("_k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("uniq_users"),
            # floor(x*1e6+0.5)/1e6, not round: engines disagree on the
            # exact .5 double boundary (the tumbling-window avg hit
            # this live at sf0.1) — IEEE floor is exact in both
            (
                F.floor(F.avg(F.col("_k")) * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("avg_k"),
        )
    )


@query(
    "events_hypertable_rollup",
    oracle="""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
             count(*) AS n, sum(value) AS sv,
             min(value) AS mn, max(value) AS mx
      FROM events GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL '1 day', h) AS day_start,
           event_type,
           CAST(sum(n) AS BIGINT)   AS n_events,
           round(sum(sv), 4)        AS sum_value,
           round(min(mn), 4)        AS min_value,
           round(max(mx), 4)        AS max_value,
           CAST(count(*) AS BIGINT) AS hours_with_data
    FROM hourly
    GROUP BY 1, 2
    """,
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading rollup: the daily aggregate is
    computed FROM the hourly aggregate (aggregate-of-aggregates over
    decomposable functions), not from raw events — at 100 TB the hourly
    layer is a materialized continuous aggregate and the daily cascade
    reads ~1/3600th of the data.  The oracle mirrors the two-level
    cascade exactly."""
    (events,) = _t(spark, sf_dir, "events")
    hourly = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .select(F.col("w.start").alias("h"), "event_type", "n", "sv", "mn", "mx")
    )
    return (
        hourly.groupBy(F.window("h", "1 day").alias("w"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("sv"), 4).alias("sum_value"),
            F.round(F.min("mn"), 4).alias("min_value"),
            F.round(F.max("mx"), 4).alias("max_value"),
            F.count(F.lit(1)).alias("hours_with_data"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "event_type",
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
            "hours_with_data",
        )
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ),
    sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY cohort_week
    ),
    act AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT) AS week_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM a JOIN f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT CAST(CAST(act.cohort_week AS DATE) AS VARCHAR) AS cohort_week,
           week_offset,
           n_active,
           cohort_size,
           round(n_active / CAST(cohort_size AS DOUBLE), 6) AS retention
    FROM act JOIN sizes USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-seen week,
    distinct-active counts per (cohort, week offset), retention vs the
    cohort size.  Two aggregations + a broadcast join on the tiny cohort
    relation — at 100 TB the only big shuffles are the two user-keyed
    groupBys; the cohort matrix itself is O(weeks²) rows whatever the
    event volume (the aggregate-of-aggregates cascade shape)."""
    from pyspark.sql import Window

    (events,) = _t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    # ONE events pass: the distinct (user, week) relation both carries
    # the activity AND determines the cohort (first-seen week = min of
    # the user's distinct weeks, a window over the user partition).  The
    # former two-subtree form (groupBy-min `first` + distinct `activity`
    # + a third `first` copy under `sizes`) scanned events three times —
    # column pruning specialised each copy, so AQE exchange reuse never
    # deduped them.  Cohort sizes fall out of the same relation: each
    # user's first-week row (week <=> cohort_week, null-safe so an
    # all-null-ts user still counts once, as groupBy-min counted it)
    # appears exactly once.
    activity = events.select("user_id", week.alias("week")).distinct()
    acts = activity.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    sizes = (
        acts.filter(F.col("week").eqNullSafe(F.col("cohort_week")))
        .groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    act = (
        acts.groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return (
        act.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("date").cast("string").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH buckets AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, bucket, n,
             avg(n)         OVER w AS mu,
             stddev_samp(n) OVER w AS sigma,
             count(*)       OVER w AS n_window
      FROM buckets
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(bucket AS VARCHAR) AS bucket,
           CAST(n AS BIGINT)       AS n,
           round(mu, 6)            AS mu,
           round((n - mu) / nullif(sigma, 0), 6) AS zscore
    FROM stats
    -- filter on the ROUNDED z: a bucket can sit exactly on 2.0 (one
    -- does at sf0.01) and the unrounded quotient's last ulp is engine-
    -- implementation-dependent
    WHERE n_window >= 12 AND abs(round((n - mu) / nullif(sigma, 0), 6)) >= 2.0
    ORDER BY event_type, bucket
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed anomaly detection: hourly event counts per type scored
    against the trailing 24-hour window's mean/stddev; buckets with
    |z| >= 2 (and at least half a day of history) flag.  Aggregate →
    bounded window — the cascade never holds more than O(window) state
    per type, the monitoring shape that scales with bucket count, not
    event volume."""
    from pyspark.sql import Window

    (events,) = _t(spark, sf_dir, "events")
    buckets = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-24, -1)
    )
    z = (F.col("n") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0))
    return (
        buckets.withColumn("mu", F.avg("n").over(w))
        .withColumn("sigma", F.stddev_samp("n").over(w))
        .withColumn("n_window", F.count(F.lit(1)).over(w))
        # rounded-z filter: one sf0.01 bucket sits exactly on 2.0 and
        # the unrounded quotient's last ulp is engine-dependent
        .filter((F.col("n_window") >= 12) & (F.abs(F.round(z, 6)) >= 2.0))
        .select(
            "event_type",
            F.col("bucket").cast("string").alias("bucket"),
            "n",
            F.round("mu", 6).alias("mu"),
            F.round(z, 6).alias("zscore"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "events_strict_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT 'step1_view' AS step, count(*) AS n_users FROM v
    UNION ALL SELECT 'step2_click', count(*) FROM c
    UNION ALL SELECT 'step3_purchase', count(*) FROM p
    ORDER BY step
    """,
)
def events_strict_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence conversion funnel: first view, then the first
    click AFTER that view, then the first purchase AFTER that click —
    order matters, unlike containment funnels.  Three user-keyed
    aggregations chained by conditional joins; each stage's relation is
    one row per surviving user (monotonically shrinking), so the chain
    costs three shuffles on user_id and nothing rescans raw events more
    than once per stage."""
    (events,) = _t(spark, sf_dir, "events")
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
    # All three step counts from ONE funnel relation: LEFT-join the
    # (monotonically shrinking) stage relations, count in a single
    # global aggregate, unpivot to the step rows.  The former per-step
    # `.agg(count)` union consumed v three times and c twice; column
    # pruning specialised each copy, so AQE exchange reuse never
    # deduped them — 5 scans executed.  The left joins keep one row per
    # v-user (c and p are user-unique), so count(*) is step 1 exactly —
    # including a user whose every view ts is NULL (t_view NULL, which
    # count("t_view") would miss); t_click / t_purchase are never null
    # for a surviving user (min over ts values that passed a `>`
    # filter), so their non-null counts equal the stage row counts.
    f = v.join(c, "user_id", "left").join(p, "user_id", "left")
    counts = f.agg(
        F.count(F.lit(1)).alias("n1"),
        F.count("t_click").alias("n2"),
        F.count("t_purchase").alias("n3"),
    )
    return counts.select(
        F.expr(
            "stack(3, 'step1_view', n1, 'step2_click', n2, 'step3_purchase', n3)"
            " as (step, n_users)"
        )
    ).orderBy("step")


@query(
    "orders_week_over_week",
    oracle="""
    WITH w AS (
      SELECT CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS VARCHAR) AS week,
             round(sum(o_totalprice), 4) AS revenue,
             count(*) AS n_orders
      FROM orders
      WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
      GROUP BY 1
    )
    SELECT week, n_orders, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY week), 4)  AS delta,
           round((revenue - lag(revenue) OVER (ORDER BY week))
                 / nullif(lag(revenue) OVER (ORDER BY week), 0) * 100, 6) AS pct_change
    FROM w ORDER BY week
    """,
)
def orders_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: weekly revenue with lag-based
    deltas and percent change — the navigation-window shape every BI
    workload runs.  Aggregate first (weeks are few), then a single
    ordered window over the tiny weekly relation."""
    from pyspark.sql import Window

    (orders,) = _t(spark, sf_dir, "orders")
    w = (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
        )
        .groupBy(
            F.date_trunc("week", F.col("o_orderdate"))
            .cast("date")
            .cast("string")
            .alias("week")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    win = Window.orderBy("week")
    prev = F.lag("revenue").over(win)
    return (
        w.withColumn("delta", F.round(F.col("revenue") - prev, 4))
        .withColumn(
            "pct_change",
            F.round((F.col("revenue") - prev) / F.nullif(prev, F.lit(0)) * 100, 6),
        )
        .select("week", "n_orders", "revenue", "delta", "pct_change")
        .orderBy("week")
    )


@query(
    "events_variant_props",
    oracle="""
    -- json_extract replays variant_get's typed path extraction
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*)                                        AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           floor(avg(value) * 1000000 + 0.5) / 1000000     AS avg_value
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    GROUP BY 1, 2
    """,
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured event properties through Spark 4's VARIANT type:
    ``parse_json`` once into a variant column, typed path extraction
    via ``try_variant_get`` feeding a filter + two-level aggregation —
    the modern engine path for schemaless props (binary-encoded
    variant beats per-expression JSON string re-parsing: N extractions
    re-tokenize the string N times, a variant decodes once).  The
    reference stores JSON as text and re-parses per call
    (funcexp json_* functions); this is the Spark-4-native upgrade.
    Oracle: DuckDB json_extract replays the typed paths."""
    (ev,) = _t(spark, sf_dir, "events")
    v = ev.withColumn("_v", F.parse_json("props"))
    k = F.try_variant_get("_v", "$.k", "long")
    return (
        v.select("event_type", "value", k.alias("_k"))
        .filter(F.col("_k") >= 50)
        .groupBy("event_type", (F.col("_k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_k").alias("k_sum"),
            # floor-half-up, not round: the engines' .5-boundary
            # disagreement hit this exact column live at sf0.1
            (F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "avg_value"
            ),
        )
    )
