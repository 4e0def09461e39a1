"""Core relational operator corpus: scans, filters, joins, aggregation,
sort/limit, set ops, subqueries.

Each query demonstrates one (or a few) rows of SURVEY.md §2 and is paired
with a DuckDB oracle.  Reference citations are per-query docstrings.

Spark-first notes: filters/projections are plain DataFrame expressions so
Catalyst pushes them into the Parquet scan (the analog of the reference's
PM-side block primitives, ``primitives/linux-port/column.cpp:105``);
dimension-table joins use ``F.broadcast`` — the analog of the reference's
PM join with its 64 MB small-side cap
(``dbcon/joblist/resourcemanager.h:56``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# load_registered owns the load/register contract (plans/registry.py);
# _t is just the conventional short local name (same binding as
# events.py / ref_perf.py — the old per-call wrapper re-imported the
# registry on every query build)
from infinidb_spark.plans.registry import load_registered as _t
from infinidb_spark.plans.registry import query


# ---------------------------------------------------------------------------
# Scans / filters / projections  (SURVEY §2.1, §2.2)
# ---------------------------------------------------------------------------


@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
      AND l_quantity > 45
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column scan + vectorized predicate + projection.

    Reference: ``pColScanStep`` (``dbcon/joblist/primitivestep.h:357``) +
    ``p_Col`` compare primitives (``primitives/linux-port/column.cpp:105``).
    Spark: Parquet vectorized scan; both predicates and the 4-column
    projection reach the scan (PushedFilters / ReadSchema).
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1998-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "filter_between_in_like",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 200000
      AND o_orderstatus IN ('F', 'O')
      AND o_orderpriority LIKE '%URGENT%'
    """,
)
def filter_between_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN / IN / LIKE predicate shapes.

    Reference op codes COMPARE_* + LIKE (``dbcon/joblist/primitivemsg.h:49-63``);
    string LIKE ran as a dictionary scan (``primitivestep.h:674``) — Parquet
    dictionary filtering makes that free.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").like("%URGENT%")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@query(
    "filter_regexp_null",
    oracle="""
    SELECT c_custkey, c_name, nullif(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    WHERE regexp_matches(c_name, '.*[02468]$')
      AND nullif(c_mktsegment, 'BUILDING') IS NOT NULL
    """,
)
def filter_regexp_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP predicate + IS [NOT] NULL semantics.

    Reference: ``utils/funcexp/func_regexp.cpp`` and NULL-sentinel filters
    (``dbcon/joblist/joblisttypes.h:37-80``); Spark nulls are first-class.
    Nulls are synthesized via ``nullif`` (testdata has none).
    """
    (customer,) = _t(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        customer.withColumn("seg", seg)
        .filter(F.col("c_name").rlike(".*[02468]$") & F.col("seg").isNotNull())
        .select("c_custkey", "c_name", "seg")
    )


@query(
    "filter_col_vs_col",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount, l_tax
    FROM lineitem
    WHERE l_discount > l_tax AND l_returnflag = 'R'
    """,
)
def filter_col_vs_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-vs-column predicate.

    Reference: ``FilterStep`` combining two filtered RID streams
    (``dbcon/joblist/primitivestep.h:1216``).  Spark: a plain comparison
    between two columns inside one codegen stage.
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_discount") > F.col("l_tax")) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_discount", "l_tax"
    )


@query(
    "filter_expression",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    WHERE l_extendedprice * (1 - l_discount) > 90000
    """,
)
def filter_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary scalar-expression filter + computed projection.

    Reference: ``ExpressionStep`` + interpreted ``FuncExp``
    (``dbcon/joblist/expressionstep.h:49``,
    ``utils/funcexp/funcexpwrapper.cpp``) — Spark compiles the same
    expression into whole-stage codegen instead of interpreting it.
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(disc > 90000)
        .select(
            "l_orderkey",
            "l_linenumber",
            (disc * (1 + F.col("l_tax"))).alias("charge"),
        )
    )


@query(
    "constant_select",
    oracle="""
    SELECT o_orderkey, 'infinidb' AS engine, CAST(42 AS BIGINT) AS answer
    FROM orders WHERE o_orderkey <= 100
    """,
)
def constant_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant columns attached to rows.

    Reference: ``TupleConstantStep`` (``dbcon/joblist/tupleconstantstep.h:32``).
    Spark: ``F.lit`` folded by Catalyst ConstantFolding.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 100).select(
        "o_orderkey",
        F.lit("infinidb").alias("engine"),
        F.lit(42).cast("bigint").alias("answer"),
    )


# ---------------------------------------------------------------------------
# Aggregation  (SURVEY §2.4)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary — scan + filter + 2-phase agg.

    Reference: the group-by perf corpus (``utils/scenarios/perf/sql/200``,
    ``sql/300``) + ``TupleAggregateStep`` 2-phase PM-partial/UM-final
    aggregation (``dbcon/joblist/tupleaggregatestep.cpp:710-766``).
    Spark: partial/final HashAggregateExec — identical plan shape, free.
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "groupby_join_agg",
    oracle="""
    SELECT c_nationkey,
           count(*)                      AS cnt,
           round(sum(o_totalprice), 2)   AS sum_price,
           round(avg(c_acctbal), 6)      AS avg_bal
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def groupby_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own representative agg query (perf group 200).

    Reference: ``utils/scenarios/perf/sql/200`` —
    ``count(*), sum(o_totalprice), avg(c_acctbal) … group by c_nationkey``;
    join via ``TupleHashJoinStep`` (``dbcon/joblist/tuplehashjoin.h:42``).
    Spark: broadcast the customer side (PM-join analog), then 2-phase agg.
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_bal"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)                         AS uniq_custs,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT)   AS uniq_prios,
           round(sum(DISTINCT o_totalprice), 2)              AS sum_distinct_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM DISTINCT incl. multiple distinct columns in one agg.

    Reference: ``RowAggregationDistinct`` / ``RowAggregationMultiDistinct``
    (``utils/rowgroup/rowaggregation.h:348``).  Spark rewrites
    multi-distinct via Expand — free.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("uniq_custs"),
        F.countDistinct("o_orderpriority").alias("uniq_prios"),
        F.round(F.sum_distinct(F.col("o_totalprice")), 2).alias("sum_distinct_price"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_pop(l_quantity), 6)  AS std_pop,
           round(stddev_samp(l_quantity), 6) AS std_samp,
           round(var_pop(l_quantity), 6)     AS v_pop,
           round(var_samp(l_quantity), 6)    AS v_samp
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV/VARIANCE pop+samp aggregates.

    Reference: ``RowAggFunctionType`` STDDEV_POP/SAMP, VAR_POP/SAMP
    (``utils/rowgroup/rowaggregation.h:74-116``), computed in LONGDOUBLE
    (``calpontsystemcatalog.h:156``) — Spark computes in double.
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_pop("l_quantity"), 6).alias("std_pop"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_samp"),
        F.round(F.var_pop("l_quantity"), 6).alias("v_pop"),
        F.round(F.var_samp("l_quantity"), 6).alias("v_samp"),
    )


@query(
    "agg_bit",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber) AS b_and,
           bit_or(l_linenumber)  AS b_or,
           bit_xor(l_linenumber) AS b_xor
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIT_AND / BIT_OR / BIT_XOR aggregates.

    Reference: ``RowAggFunctionType`` ROWAGG_BIT_AND/OR/XOR
    (``utils/rowgroup/rowaggregation.h:74-116``).
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_and(l_linenumber)").alias("b_and"),
        F.expr("bit_or(l_linenumber)").alias("b_or"),
        F.expr("bit_xor(l_linenumber)").alias("b_xor"),
    )


@query(
    "group_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name)                   AS names,
           string_agg(DISTINCT n_name, ',' ORDER BY n_name)          AS names_distinct
    FROM nation
    GROUP BY n_regionkey
    """,
)
def group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT(DISTINCT expr ORDER BY expr SEPARATOR sep).

    Reference: ``GroupConcator`` / ``GroupConcatOrderBy``
    (``dbcon/joblist/groupconcat.h:100-159``).  Spark has no ordered
    GROUP_CONCAT; composition: collect_list → array_sort → concat_ws
    (see operators.aggregates.group_concat for the general helper).
    """
    from infinidb_spark.operators.aggregates import group_concat as gc

    (nation,) = _t(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        gc(F.col("n_name"), separator="|").alias("names"),
        gc(F.col("n_name"), distinct=True, separator=",").alias("names_distinct"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation filter.

    Reference: ``TupleHavingStep`` (``dbcon/joblist/tuplehavingstep.h:39``).
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .filter(F.col("cnt") >= 12)
    )


# ---------------------------------------------------------------------------
# Joins  (SURVEY §2.3, §2.9)
# ---------------------------------------------------------------------------


@query(
    "join_inner_broadcast",
    oracle="""
    SELECT n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, small dimension broadcast.

    Reference: PM join — small side serialized to every PM and probed
    during the scan (``primitives/primproc/batchprimitiveprocessor.h:257``),
    small-side cap 64 MB (``resourcemanager.h:56``).  Spark:
    ``F.broadcast`` = the same decision made explicit.
    """
    customer, nation = _t(spark, sf_dir, "customer", "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("c_acctbal"), 2).alias("bal"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    WHERE c_custkey <= 50
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join — the reference's own perf group 3 query shape.

    Reference: ``utils/scenarios/perf/sql/3`` (customer left outer join
    orders); LARGEOUTER join flag (``dbcon/joblist/joblisttypes.h:83-95``).
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.filter(F.col("c_custkey") <= 50)
        .join(orders, customer.c_custkey == orders.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT k, a_val, b_val FROM
      (SELECT o_custkey AS k, count(*) AS a_val FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) a
      FULL OUTER JOIN
      (SELECT o_custkey AS k2, count(*) AS b_val FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) b
      ON a.k = b.k2
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (LARGEOUTER+SMALLOUTER flag combination).

    Reference: join-type flags (``dbcon/joblist/joblisttypes.h:83-95``) —
    LARGE+SMALL outer = full outer.  Note: the oracle's ``k`` comes from
    side ``a`` only, so we reproduce exactly that (nulls where only b
    matched) rather than coalescing.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    a = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("a_val"))
    )
    b = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k2"))
        .agg(F.count(F.lit(1)).alias("b_val"))
    )
    return a.join(b, a.k == b.k2, "full").select("k", "a_val", "b_val")


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join.

    Reference: ``doCorrelatedExists`` (``dbcon/joblist/jlf_subquery.cpp:339``)
    → SEMI join flag.  Spark: ``left_semi``.
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join.

    Reference: ANTI join flag (``dbcon/joblist/joblisttypes.h:83-95``),
    ``doNonCorrelatedExists`` (``jlf_subquery.cpp:359``).

    The subquery is price-restricted so the anti side is non-empty at
    every test SF — the unrestricted form returned 0 rows at sf0.01
    (every customer has an order), which attests vacuously.
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_not_in_nullaware",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
    """,
)
def join_not_in_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN — null-aware anti join (MATCHNULLS flag).

    Reference: ``ha_in_sub.cpp`` + MATCHNULLS
    (``dbcon/joblist/joblisttypes.h:93``).  Expressed via spark.sql so
    Catalyst plans the null-aware anti join exactly as the reference's
    MATCHNULLS semantics require.
    """
    _t(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
        """
    )


@query(
    "join_multiway",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS cnt,
           round(min(s_acctbal), 2) AS min_bal,
           round(max(s_acctbal), 2) AS max_bal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + MIN/MAX — the reference's perf group 104 shape.

    Reference: ``utils/scenarios/perf/sql/104`` (3-way join min/max);
    N-way ``TupleHashJoinStep`` with multiple small sides
    (``dbcon/joblist/tuplehashjoin.h:42``) → chained broadcast joins.
    """
    supplier, nation, region = _t(spark, sf_dir, "supplier", "nation", "region")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("s_acctbal"), 2).alias("min_bal"),
            F.round(F.max("s_acctbal"), 2).alias("max_bal"),
        )
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name AS r1, r2.r_name AS r2, n_name
    FROM region r CROSS JOIN region r2 JOIN nation ON n_regionkey = r.r_regionkey
    WHERE r.r_regionkey < r2.r_regionkey
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (+ self-join aliasing) with post-filter.

    Reference: expression-step cross-like joins (theta handled as
    post-filter, SURVEY §2.3 preamble).
    """
    nation, region = _t(spark, sf_dir, "nation", "region")
    r1 = region.select(F.col("r_name").alias("r1"), F.col("r_regionkey").alias("rk1"))
    r2 = region.select(F.col("r_name").alias("r2"), F.col("r_regionkey").alias("rk2"))
    return (
        r1.crossJoin(r2)
        .filter(F.col("rk1") < F.col("rk2"))
        .join(F.broadcast(nation), F.col("n_regionkey") == F.col("rk1"))
        .select("r1", "r2", "n_name")
    )


@query(
    "join_theta",
    oracle="""
    SELECT s_suppkey, count(*) AS richer_customers
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    GROUP BY s_suppkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a theta (non-equi) residual condition.

    Reference: WITHFCNEXP join flag + ``joinFEFilters`` — theta conditions
    evaluated as post-filters on an equi-hash join
    (``primitives/primproc/batchprimitiveprocessor.h:257-280``).
    Spark plans exactly this: hash join on the equi key, residual filter.
    """
    supplier, customer = _t(spark, sf_dir, "supplier", "customer")
    return (
        supplier.join(
            customer,
            (supplier.s_nationkey == customer.c_nationkey)
            & (customer.c_acctbal > supplier.s_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("richer_customers"))
    )


# ---------------------------------------------------------------------------
# Subqueries / derived tables  (SURVEY §2.9)
# ---------------------------------------------------------------------------


@query(
    "scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) + 2000 FROM customer)
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-correlated scalar subquery in WHERE.

    Reference: SCALAR join flag, >1-row runtime error
    (``dbcon/mysql/ha_scalar_sub.cpp``).  Catalyst subquery — free.
    """
    _t(spark, sf_dir, "customer")
    return spark.sql(
        "SELECT c_custkey, c_acctbal FROM customer "
        "WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) + 2000 "
        "FROM customer)"
    )


@query(
    "select_list_subquery",
    oracle="""
    SELECT c_custkey,
           (SELECT round(max(o_totalprice), 2) FROM orders WHERE o_custkey = c_custkey) AS max_price
    FROM customer WHERE c_custkey <= 100
    """,
)
def select_list_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list.

    Reference: ``doSelectSubquery`` (``dbcon/joblist/jlf_subquery.cpp:426``).
    """
    _t(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT round(max(o_totalprice), 2) FROM orders WHERE o_custkey = c_custkey) AS max_price
        FROM customer WHERE c_custkey <= 100
        """
    )


@query(
    "in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > 300000
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → semi join.

    Reference: ``ha_in_sub.cpp`` → SEMI flag.
    """
    _t(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > 300000
        """
    )


@query(
    "derived_table",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_big, round(avg(tot), 2) AS avg_tot
    FROM (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS tot FROM orders GROUP BY o_custkey
    ) t JOIN customer ON c_custkey = t.o_custkey
    WHERE tot > 1000000
    GROUP BY c_mktsegment
    """,
)
def derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM-clause derived table feeding a join + agg.

    Reference: ``FromSubQuery::transform`` → ``SubQueryStep``
    (``dbcon/mysql/ha_from_sub.cpp:304``, ``dbcon/joblist/subquerystep.h:39``).
    Spark: nested DataFrames — the plan IS the derived table.
    """
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    # threshold on the ROUNDED sum (the corpus determinism rule): a raw
    # double sum's last-ulp summation-order drift could flip a customer
    # across the strict '>' between engines
    t = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("tot")
    )
    return (
        t.filter(F.col("tot") > 1000000)
        .join(F.broadcast(customer), t.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_big"), F.round(F.avg("tot"), 2).alias("avg_tot"))
    )


@query(
    "view_query",
    oracle="""
    SELECT n_name, cnt FROM (
      SELECT n_name, count(*) AS cnt
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    ) v WHERE cnt > 3
    """,
)
def view_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views merged into the plan at translate time.

    Reference: ``dbcon/mysql/ha_view.cpp`` — views expand inline.
    Spark: ``createOrReplaceTempView`` + reference in SQL, same inlining.
    """
    _t(spark, sf_dir, "customer", "nation")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW cust_by_nation AS
        SELECT n_name, count(*) AS cnt
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    return spark.sql("SELECT n_name, cnt FROM cust_by_nation WHERE cnt > 3")


# ---------------------------------------------------------------------------
# Sort / limit / distinct / set ops  (SURVEY §2.6, §2.7)
# ---------------------------------------------------------------------------


@query(
    "topn_order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topn_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → top-N with a bounded heap.

    Reference: ``LimitedOrderBy`` priority queue
    (``dbcon/joblist/limitedorderby.h:43``).  Spark plans
    ``TakeOrderedAndProject`` — per-partition heaps then merge, no global
    sort: exactly the reference's structure, distributed.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT with OFFSET (fStart/fCount).

    Reference: ``limitedorderby.h:57-58`` (``fStart``, ``fCount``).
    Spark 3.4+ supports OFFSET natively in SQL.
    """
    _t(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10"
    )


@query(
    "order_nulls_last",
    oracle="""
    SELECT c_custkey, nullif(c_mktsegment, 'MACHINERY') AS seg
    FROM customer
    ORDER BY seg ASC NULLS LAST, c_custkey LIMIT 120
    """,
)
def order_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering (MySQL default is nulls-first ASC;
    Spark's too, but we pin explicitly — SURVEY §2.6 sort-spec row).

    Reference: ``IdbSortSpec`` per-key asc/desc + nulls-first/last
    (``utils/windowfunction/idborderby.h:70-138``).  The LIMIT makes null
    placement observable through the selected set.
    """
    (customer,) = _t(spark, sf_dir, "customer")
    return (
        customer.select(
            "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg")
        )
        .orderBy(F.col("seg").asc_nulls_last(), F.col("c_custkey"))
        .limit(120)
    )


@query(
    "distinct_select",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT.

    Reference: distinct handled in ``TupleAnnexStep``
    (``dbcon/joblist/tupleannexstep.h:46``) via hash dedup — Spark
    HashAggregate on all columns.
    """
    (customer,) = _t(spark, sf_dir, "customer")
    return customer.select("c_nationkey", "c_mktsegment").distinct()


@query(
    "union_all_normalize",
    oracle="""
    SELECT CAST(c_custkey AS DOUBLE) AS id, c_name AS name FROM customer WHERE c_custkey <= 30
    UNION ALL
    SELECT s_acctbal AS id, s_name AS name FROM supplier
    """,
)
def union_all_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with cross-branch type normalization (long vs double).

    Reference: ``TupleUnion::normalize`` — widest type wins
    (``dbcon/joblist/tupleunion.h:136``).  Spark's
    ``WidenSetOperationTypes`` does the same; we use unionByName after an
    explicit widening cast to keep the schema deterministic.
    """
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    a = customer.filter(F.col("c_custkey") <= 30).select(
        F.col("c_custkey").cast("double").alias("id"), F.col("c_name").alias("name")
    )
    b = supplier.select(F.col("s_acctbal").alias("id"), F.col("s_name").alias("name"))
    return a.unionByName(b)


@query(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey AS k FROM supplier
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (dedup) over N inputs.

    Reference: ``TupleUnion`` with per-input distinctFlags + hash-set
    dedup (``dbcon/joblist/tupleunion.h:47,96,144``).
    """
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("k"))
        .union(supplier.select(F.col("s_nationkey").alias("k")))
        .distinct()
    )


@query(
    "intersect_except",
    oracle="""
    SELECT k, 'both' AS side FROM (
      SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT k, 'cust_only' AS side FROM (
      SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    """,
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT — absent in the reference's MySQL-5.1 surface
    (SURVEY §2.7: "may exceed reference"), provided as a capability bonus.
    """
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    c = customer.select(F.col("c_nationkey").alias("k"))
    s = supplier.select(F.col("s_nationkey").alias("k"))
    both = c.intersect(s).withColumn("side", F.lit("both"))
    only = c.subtract(s).withColumn("side", F.lit("cust_only"))
    return both.unionByName(only)


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag, l_linestatus) AS gid,
           count(*)                  AS n,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregation.  The reference REJECTS rollup
    (``ha_calpont_execplan.cpp:4088-4092`` "rollup is currently not
    supported") — capability bonus flagged in SURVEY §2.4; free via
    Catalyst's Expand-based grouping sets."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus, o_orderpriority) AS gid,
           count(*)                     AS n,
           round(sum(o_totalprice), 4)  AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over all grouping-key subsets (SURVEY §2.4
    bonus; one Expand, one shuffle — same plan class as plain rollup)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube compile to
    (SURVEY §2.4 bonus)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "set_ops_all",
    oracle="""
    SELECT k, 'inter_all' AS side FROM (
      SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT k, 'except_all' AS side FROM (
      SELECT c_nationkey AS k FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
    """,
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — bag-semantics set ops (multiplicity
    min / difference), beyond the reference's UNION-only surface."""
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    c = customer.select(F.col("c_nationkey").alias("k"))
    s = supplier.select(F.col("s_nationkey").alias("k"))
    inter = c.intersectAll(s).withColumn("side", F.lit("inter_all"))
    exc = c.exceptAll(s).withColumn("side", F.lit("except_all"))
    return inter.unionByName(exc)


@query(
    "join_salted_skew",
    oracle="""
    SELECT s_nationkey,
           count(*)                    AS n,
           round(sum(l_quantity), 4)   AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew-join (operators/skew.py): result must be identical to
    the plain equi-join the oracle runs — only the shuffle layout
    differs (hot keys spread over salt buckets; build side replicated)."""
    from infinidb_spark.operators.skew import salted_join

    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    joined = salted_join(
        lineitem.withColumnRenamed("l_suppkey", "k"),
        supplier.withColumnRenamed("s_suppkey", "k"),
        ["k"],
        n_salt=8,
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@query(
    "agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price_dec,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))      AS VARCHAR) AS sum_qty_dec,
           concat(
             CAST((CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS HUGEINT) * 100000
                   // count(l_extendedprice) + 5) // 10 // 1000000 AS VARCHAR),
             '.',
             lpad(CAST((CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS HUGEINT) * 100000
                        // count(l_extendedprice) + 5) // 10 % 1000000 AS VARCHAR), 6, '0')
           ) AS avg_price_dec
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT decimal aggregation — the reference stores DECIMAL as
    scaled int64 (`dbcon/execplan/simplecolumn_decimal.h`) so sums are
    exact, never float-drifty; Spark's DecimalType(+Sum with precision
    widening) gives the same guarantee, hash-checked against DuckDB's
    exact decimal engine with NO rounding on either side.

    The compare serializes through pandas, where DuckDB decimals decay
    to float64 (trailing scale lost) while Spark yields Decimal objects
    — so both engines CAST the final decimals to strings, which is the
    only pandas-safe exact representation (fixed scale: '506627.00' on
    both sides)."""
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    # the avg is computed in EXACT integer arithmetic (cents → micros,
    # HALF_UP) on BOTH engines: DuckDB's avg/decimal-division detours
    # through DOUBLE, so a 7th-fractional-digit halfway case could
    # round differently between engines — integer DIV cannot
    agg = lineitem.groupBy("l_returnflag").agg(
        F.sum(price).cast("decimal(38,2)").cast("string").alias("sum_price_dec"),
        F.sum(qty).cast("decimal(38,2)").cast("string").alias("sum_qty_dec"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("_cents"),
        F.count("l_extendedprice").alias("_cnt"),
    )
    # DECIMAL(38,0) intermediate (oracle: HUGEINT): the bigint product
    # _cents * 100000 wraps silently past ~sf8 with ANSI off — the
    # quotient itself (avg micros) fits bigint at any scale
    micros = F.expr(
        "(CAST(_cents AS DECIMAL(38,0)) * 100000 DIV _cnt + 5) DIV 10"
    )
    return agg.select(
        "l_returnflag",
        "sum_price_dec",
        "sum_qty_dec",
        F.concat(
            (micros / 1000000).cast("long").cast("string"),
            F.lit("."),
            F.lpad((micros % 1000000).cast("string"), 6, "0"),
        ).alias("avg_price_dec"),
    )


@query(
    "quantified_subquery",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_acctbal > ALL (SELECT c_acctbal FROM customer
                           WHERE c_nationkey = 3 AND c_acctbal < 1000)
      AND s_acctbal < ANY (SELECT c_acctbal FROM customer
                           WHERE c_mktsegment = 'BUILDING')
    """,
)
def quantified_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL / ANY quantified comparisons (ref
    ``dbcon/execplan/calpontselectexecutionplan.h:120-133``,
    ``dbcon/mysql/ha_scalar_sub.cpp``), rewritten to one broadcast
    aggregate each with exact three-valued semantics — see
    operators.quantified.  DuckDB runs its native ALL/ANY as the oracle.
    """
    from infinidb_spark.operators.quantified import quantified_filter

    supplier, customer = _t(spark, sf_dir, "supplier", "customer")
    out = quantified_filter(
        supplier,
        F.col("s_acctbal"),
        ">",
        customer.filter((F.col("c_nationkey") == 3) & (F.col("c_acctbal") < 1000)).select(
            "c_acctbal"
        ),
        "all",
    )
    out = quantified_filter(
        out,
        F.col("s_acctbal"),
        "<",
        customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_acctbal"),
        "any",
    )
    return out.select("s_suppkey", "s_name", "s_acctbal")


@query(
    "group_concat_ordered",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, '|' ORDER BY c_acctbal DESC, c_name) AS names_by_bal,
           string_agg(c_mktsegment, ',' ORDER BY c_custkey)        AS segs_by_key
    FROM customer WHERE c_custkey <= 200
    GROUP BY c_nationkey
    """,
)
def group_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT ordered by an INDEPENDENT expression (ref
    ``GroupConcatOrderBy``, ``dbcon/joblist/groupconcat.h:100-159``):
    the sort key (account balance / custkey) is not the concatenated
    value.  Composition: collect_list(struct(keys..., value)) →
    sort_array → transform — see operators.aggregates.group_concat.
    Descending numeric keys sort by negation; c_name tiebreaks DESC
    balances so both engines agree on equal keys."""
    from infinidb_spark.operators.aggregates import group_concat

    (customer,) = _t(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_custkey") <= 200)
        .groupBy("c_nationkey")
        .agg(
            group_concat(
                F.col("c_name"),
                order_by=[-F.col("c_acctbal"), F.col("c_name")],
                separator="|",
            ).alias("names_by_bal"),
            group_concat(
                F.col("c_mktsegment"), order_by=[F.col("c_custkey")], separator=","
            ).alias("segs_by_key"),
        )
    )


@query(
    "part_lineitem_agg",
    oracle="""
    SELECT p_type,
           count(*)                                          AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 4)                         AS avg_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 15
    GROUP BY p_type
    """,
)
def part_lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part ⋈ lineitem + revenue aggregation — mirrors the reference's
    perf scenario groups 5/104 (`utils/scenarios/perf/sql/5/`,
    `sql/104/`), which join fact to the part dim.  part is a dim →
    broadcast (PM-join); at 100 TB part outgrows broadcast and the same
    plan shuffles on partkey."""
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_size") <= 15)),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
    )


@query(
    "pivot_unpivot_roundtrip",
    oracle="""
    -- the pivot expressed relationally: one cell per (status, priority)
    WITH cells AS (
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT status, priority, n FROM cells
    """,
)
def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT → UNPIVOT roundtrip: orders pivoted into one column per
    priority (groupBy().pivot() — Spark plans it as a single
    conditional aggregation, NOT one pass per column), then melted back
    to (status, priority, n) with ``unpivot``.  The roundtrip proves
    the wide↔long reshaping operators are lossless; the oracle states
    the same relation directly.  At scale: pivot = one shuffle (the
    groupBy), unpivot = a map-only Expand."""
    (orders,) = _t(spark, sf_dir, "orders")
    # the TPC-H spec's fixed priority domain, as literals — a discovery
    # scan+collect per call would cost an extra job for values the spec
    # pins (the same literal-pinning rule as the LSH planes)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    wide = (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("o_orderpriority", prios)
        .count()
    )
    long = wide.unpivot("status", prios, "priority", "n")
    return long.filter(F.col("n").isNotNull()).select(
        "status", "priority", F.col("n").cast("long").alias("n")
    )


@query(
    "lateral_topn_per_group",
    oracle="""
    -- LATERAL top-N replayed as a ranking window
    SELECT n_name, c_name, c_acctbal
    FROM (
      SELECT n.n_name, c.c_name, c.c_acctbal,
             row_number() OVER (
               PARTITION BY n.n_nationkey
               ORDER BY c.c_acctbal DESC, c.c_custkey
             ) AS rk
      FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    ) WHERE rk <= 2
    """,
)
def lateral_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 / Spark 4 LATERAL): for
    each nation, the top-2 customers by balance via a per-row derived
    table — the iterate-a-subquery-per-outer-row surface MySQL 8 calls
    LATERAL.  Catalyst decorrelates it into the same ranking-window
    plan the oracle states; the test is that the decorrelation is
    semantically exact (ties broken by key)."""
    _t(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_name, c_acctbal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        """
    )
