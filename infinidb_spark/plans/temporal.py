"""Temporal-join corpus: as-of join and range join (operators/asof.py)
— the extension operators Spark lacks natively, hash-checked against
DuckDB's native ASOF JOIN / BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.operators.asof import asof_join, range_join
# load_registered owns the load/register contract (plans/registry.py)
from infinidb_spark.plans.registry import load_registered as _t
from infinidb_spark.plans.registry import query


@query(
    "asof_join_events",
    oracle="""
    SELECT c.event_id                       AS click_id,
           c.user_id,
           c.ts                             AS click_ts,
           v.event_id                       AS view_id,
           round(v.value, 4)                AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (
      -- tie dedup: ASOF picks an ARBITRARY row among equal (user, ts)
      -- views in both engines; keeping the max event_id per instant
      -- makes the pick deterministic on any data
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, ts ORDER BY event_id DESC) AS _rn
        FROM events WHERE event_type = 'view') WHERE _rn = 1
    ) v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click matched to the user's latest
    prior view — merged-stream window formulation (one shuffle, no
    per-key cross product); oracle is DuckDB's native ASOF JOIN."""
    (events,) = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    from pyspark.sql import Window

    # deterministic tie-break: one view per (user, instant) — max
    # event_id — since an as-of match among equal timestamps is
    # otherwise an arbitrary pick in BOTH engines (current test data
    # has no ties; this pins the semantics for data that does)
    w_tie = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    views = (
        events.filter(F.col("event_type") == "view")
        .withColumn("_rn", F.row_number().over(w_tie))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("user_id"), F.col("ts"),
            F.col("event_id").alias("vid"), F.col("value"),
        )
    )
    joined = asof_join(clicks, views, on="user_id", right_cols=["vid", "value"])
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("vid_right").alias("view_id"),
        F.round("value_right", 4).alias("view_value"),
    )


@query(
    "range_join_bands",
    oracle="""
    SELECT b.band_id,
           count(*)                     AS n_orders,
           round(sum(o_totalprice), 2)  AS sum_price
    FROM orders o
    JOIN (SELECT i AS band_id,
                 i * 40000.0       AS lo,
                 i * 40000.0 + 60000.0 AS hi
          FROM range(8) t(i)) b
      ON o.o_totalprice BETWEEN b.lo AND b.hi
    GROUP BY b.band_id
    """,
)
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: orders matched into OVERLAPPING price bands via
    bin-bucketed equi-join (no nested loop; each interval replicates
    into its bins).  Oracle is the plain BETWEEN theta join."""
    (orders,) = _t(spark, sf_dir, "orders")
    bands = spark.range(8).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 40000.0).alias("lo"),
        (F.col("id") * 40000.0 + 60000.0).alias("hi"),
    )
    joined = range_join(
        orders.select("o_orderkey", "o_totalprice"),
        bands,
        on=None,
        left_value="o_totalprice",
        right_lo="lo",
        right_hi="hi",
        bin_width=20000.0,
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )
