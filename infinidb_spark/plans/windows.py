"""Window-function corpus — SURVEY.md §2.5: the reference's 36 window
functions (``utils/windowfunction/windowfunctiontype.h:62-100``, 5.8k LoC
executed UM-side by sorting on (partition, order) keys and fanning
partitions over a thread pool, ``dbcon/joblist/windowfunctionstep.cpp:562``).

Spark executes the same structure distributed: shuffle on partition keys,
sort within partitions, WindowExec per partition — the thread-pool-per-
partition design generalized to executors.  At 100 TB the cardinality of
the PARTITION BY key is the scale knob: these queries partition on keys
with ~#customers/#orders cardinality so no single partition exceeds
executor memory.

Determinism: every ORDER BY inside a window whose function is
order-sensitive (row_number, lag, nth_value, ntile, framed sums) uses a
unique key; ranking-with-ties queries use tie-producing keys since
rank/dense_rank/percent_rank/cume_dist are well-defined under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# load_registered owns the load/register contract (plans/registry.py);
# _t is just the conventional short local name
from infinidb_spark.plans.registry import load_registered as _t
from infinidb_spark.plans.registry import query


@query(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist()    OVER w AS cdist
    FROM orders
    WHERE o_orderkey <= 500
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST (tie semantics).

    Reference: ``wf_ranking.cpp`` (``utils/windowfunction/``).  Ordered by
    a low-cardinality key on purpose — ties are the interesting case and
    all four functions are deterministic under them.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderpriority")
    return orders.filter(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "window_row_number_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_row_number_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER + the canonical top-k-per-group pattern.

    Reference: ``wf_row_number.cpp``.  Spark optimizes rn<=k into a
    per-partition bounded sort (WindowGroupLimit) — the distributed analog
    of the reference's per-partition priority queue.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_agg_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           -- full sort-key tiebreak: the synthetic lineitem has
           -- duplicate (l_orderkey, l_linenumber) pairs at sf1, and a
           -- tie makes ROWS-frame running sums engine-order-dependent
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)   AS running_qty,
           round(avg(l_extendedprice) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6)           AS mavg_price,
           count(*) OVER (PARTITION BY l_orderkey)                       AS n_lines,
           round(min(l_extendedprice) OVER (PARTITION BY l_orderkey), 2) AS min_price,
           round(max(l_extendedprice) OVER (PARTITION BY l_orderkey), 2) AS max_price
    FROM lineitem WHERE l_orderkey <= 2000
    """,
)
def window_agg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM/AVG/COUNT/MIN/MAX over ROWS frames (running + sliding).

    Reference: aggregate-over-window group (``wf_sum_avg.cpp``,
    ``wf_count.cpp``, ``wf_min_max.cpp``) with ROWS frames
    (``utils/windowfunction/windowframe.h:31``).
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    wp = Window.partitionBy("l_orderkey")
    # l_quantity/l_extendedprice tiebreakers: duplicate (l_orderkey,
    # l_linenumber) pairs exist at sf1, and a tie makes the ROWS-frame
    # outputs engine-order-dependent (caught by scripts/sf1_parity.py)
    wo = wp.orderBy("l_linenumber", "l_quantity", "l_extendedprice")
    return li.filter(F.col("l_orderkey") <= 2000).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(
            F.sum("l_quantity").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2,
        ).alias("running_qty"),
        F.round(F.avg("l_extendedprice").over(wo.rowsBetween(-1, 1)), 6).alias("mavg_price"),
        F.count(F.lit(1)).over(wp).alias("n_lines"),
        F.round(F.min("l_extendedprice").over(wp), 2).alias("min_price"),
        F.round(F.max("l_extendedprice").over(wp), 2).alias("max_price"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING) AS n_similar
    FROM orders WHERE o_custkey <= 200
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with value offsets on a numeric order key.

    Reference: RANGE-with-value frames (``frameboundrange.cpp``); Spark
    supports value-RANGE on a single numeric/date key — the same
    constraint class as the reference (SURVEY §2.5 frames row).
    """
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-50000, 50000)
    return orders.filter(F.col("o_custkey") <= 200).select(
        "o_orderkey", "o_custkey", "o_totalprice", F.count(F.lit(1)).over(w).alias("n_similar")
    )


@query(
    "window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)     OVER w                         AS prev_price,
           lead(o_totalprice, 2) OVER w                         AS next2_price,
           first_value(o_totalprice) OVER w_full                AS first_price,
           last_value(o_totalprice)  OVER w_full                AS last_price,
           nth_value(o_totalprice, 2) OVER w_full               AS second_price,
           ntile(4) OVER w                                      AS quartile
    FROM orders WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
           w_full AS (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG / LEAD / FIRST_VALUE / LAST_VALUE / NTH_VALUE / NTILE.

    Reference: ``wf_lead_lag.cpp``, ``wf_nth_value.cpp``, ``wf_ntile.cpp``.
    LAST_VALUE/NTH_VALUE use the full-partition frame (the default
    running frame makes last_value ≡ current row — same gotcha in both
    engines, pinned explicitly).
    """
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.filter(F.col("o_custkey") <= 100).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice", 2).over(w).alias("next2_price"),
        F.first("o_totalprice").over(w_full).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_stats",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(stddev_pop(o_totalprice)  OVER w, 4) AS sd_pop,
           round(stddev_samp(o_totalprice) OVER w, 4) AS sd_samp,
           round(var_pop(o_totalprice)     OVER w, -2) AS v_pop,
           round(var_samp(o_totalprice)    OVER w, -2) AS v_samp
    FROM orders WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey)
    """,
)
def window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV / VARIANCE over windows.

    Reference: ``wf_stats.cpp`` (computed in LONGDOUBLE; Spark double).
    """
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return orders.filter(F.col("o_custkey") <= 100).select(
        "o_custkey",
        "o_orderkey",
        F.round(F.stddev_pop("o_totalprice").over(w), 4).alias("sd_pop"),
        F.round(F.stddev_samp("o_totalprice").over(w), 4).alias("sd_samp"),
        F.round(F.var_pop("o_totalprice").over(w), -2).alias("v_pop"),
        F.round(F.var_samp("o_totalprice").over(w), -2).alias("v_samp"),
    )


@query(
    "window_distinct_agg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           count(DISTINCT o_orderpriority) OVER w               AS uniq_prio,
           round(sum(DISTINCT o_totalprice) OVER w, 4)          AS sum_distinct
    FROM orders WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey)
    """,
)
def window_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM DISTINCT over a window — NOT a Spark builtin.

    Reference: WF__COUNT_DISTINCT / WF__SUM_DISTINCT
    (``utils/windowfunction/windowfunctiontype.h:69-71``).  Composition:
    ``collect_set`` over the partition frame, then ``size`` /
    ``aggregate`` over the (sorted, hence deterministic) array —
    SURVEY §7 hard-parts item, solved JVM-side (no UDF).
    """
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    prio_set = F.collect_set("o_orderpriority").over(w)
    price_set = F.array_sort(F.collect_set("o_totalprice").over(w))
    return orders.filter(F.col("o_custkey") <= 100).select(
        "o_custkey",
        "o_orderkey",
        F.size(prio_set).cast("bigint").alias("uniq_prio"),
        # SQL sum(DISTINCT) over an all-NULL/empty set is NULL, not 0.0
        # — the fold's 0.0 seed must not leak out for empty sets
        F.when(
            F.size(price_set) > 0,
            F.round(
                F.aggregate(price_set, F.lit(0.0), lambda acc, x: acc + x), 4
            ),
        ).alias("sum_distinct"),
    )


@query(
    "percentiles_within_group",
    oracle="""
    SELECT l_returnflag,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity), 6) AS median_qty,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 6) AS p25_qty,
           round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity), 6) AS median_disc_qty,
           round(percentile_disc(0.9)  WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentiles_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT / PERCENTILE_DISC (WITHIN GROUP) — exact.

    Reference: ``wf_percentile.cpp`` (WITHIN GROUP over partitions).
    Spark 3.4+ has exact percentile_cont/disc in SQL; expressed per
    group (the reference's own usage pattern is percentile per
    partition, which this reproduces with groupBy as the partitioning).
    Interpolated values are rounded (6 dp) on both sides — unrounded
    doubles were green only because l_quantity is integer-valued, an
    accident of the test data, and percentile interpolation may differ
    in the last ulp between engines.  Memory note: EXACT percentile
    buffers per-group distinct values; the 3 l_returnflag groups are
    fine at gate scale, but a 100 TB deployment swaps in
    approx_percentile for giant low-cardinality groups.
    """
    _t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity), 6) AS median_qty,
               round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 6) AS p25_qty,
               round(percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity), 6) AS median_disc_qty,
               round(percentile_disc(0.9)  WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p90_price
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "window_regr",
    oracle="""
    SELECT c_nationkey,
           regr_count(c_acctbal, c_custkey)             AS r_count,
           round(regr_slope(c_acctbal, c_custkey), 8)   AS r_slope,
           round(regr_intercept(c_acctbal, c_custkey), 6) AS r_intercept,
           round(regr_r2(c_acctbal, c_custkey), 8)      AS r_r2,
           round(regr_avgx(c_acctbal, c_custkey), 6)    AS r_avgx,
           round(regr_avgy(c_acctbal, c_custkey), 6)    AS r_avgy,
           round(regr_sxx(c_acctbal, c_custkey), -2)    AS r_sxx,
           round(regr_sxy(c_acctbal, c_custkey), -2)    AS r_sxy,
           round(regr_syy(c_acctbal, c_custkey), -2)    AS r_syy
    FROM customer
    GROUP BY c_nationkey
    """,
)
def window_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 9 REGR_* linear-regression functions.

    Reference: ``windowfunctiontype.h:92-100`` (enum; only a subset wired
    in the reference — we wire all nine).  Spark 3.3+ aggregates, applied
    per partition-key group.

    Rounding note: the second-moment sums (SXX/SXY/SYY) grow ~SF^3, so
    they are pinned on an ABSOLUTE 100 grid (round(x, -2)) instead of a
    fine decimal — at a grain where the double ulp of the sum (2e-6 at
    sf0.1, 2e-3 at sf1) plus partial-aggregation order drift stays far
    below the grid, keeping the hash stable across engines AND across
    shuffle orders at any realistic SF; ratio statistics (slope, r2,
    averages) keep fine grids since their magnitude is scale-free.
    """
    _t(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               regr_count(c_acctbal, c_custkey)               AS r_count,
               round(regr_slope(c_acctbal, c_custkey), 8)     AS r_slope,
               round(regr_intercept(c_acctbal, c_custkey), 6) AS r_intercept,
               round(regr_r2(c_acctbal, c_custkey), 8)        AS r_r2,
               round(regr_avgx(c_acctbal, c_custkey), 6)      AS r_avgx,
               round(regr_avgy(c_acctbal, c_custkey), 6)      AS r_avgy,
               round(regr_sxx(c_acctbal, c_custkey), -2)      AS r_sxx,
               round(regr_sxy(c_acctbal, c_custkey), -2)      AS r_sxy,
               round(regr_syy(c_acctbal, c_custkey), -2)      AS r_syy
        FROM customer
        GROUP BY c_nationkey
        """
    )
