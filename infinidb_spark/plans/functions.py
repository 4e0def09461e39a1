"""Scalar-function parity queries — SURVEY.md §2.8.

Each query projects a batch of the MySQL-dialect function library
(infinidb_spark.functions, the rebuild of ``utils/funcexp``) over real
table columns, with a DuckDB oracle computing the same values through
DuckDB's own function surface.  Functions whose semantics DuckDB can't
express (week modes, crc32, conv, format translation) are pinned by unit
tests in tests/test_functions.py instead — both layers together cover
the ~140-name registry.

Most expressions here are per-row and deterministic and hash bit-identically.
Transcendentals (ln/log10) drift in the last ULP between the JVM's StrictMath
and DuckDB's libm, so those two are rounded to 9 decimals on BOTH sides —
the same pinning rule the aggregate corpus uses.  Caveat inherent to
round-based pinning: two values 1 ULP apart can still straddle a 9-dp
rounding boundary and flip the hash on unlucky data; if that ever flakes,
drop to 6-7 dp or hash a quantized integer (round(x*1e9) AS BIGINT) on
both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.functions import func
from infinidb_spark.plans.registry import query


# load_registered owns the load/register contract (plans/registry.py);
# _t is just the conventional short local name
from infinidb_spark.plans.registry import load_registered as _t  # noqa: E402


@query(
    "func_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - l_tax)                 AS f_abs,
           CAST(ceil(l_quantity / 7) AS BIGINT)    AS f_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS f_floor,
           round(l_extendedprice / 7, 3)           AS f_round,
           CAST(l_orderkey % 7 AS BIGINT)          AS f_mod,
           sqrt(l_quantity)                        AS f_sqrt,
           power(l_discount, 2)                    AS f_pow,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS f_sign,
           round(ln(l_extendedprice), 9)           AS f_ln,
           round(log10(l_extendedprice), 9)        AS f_log10,
           round(CASE WHEN l_quantity <= 0 OR l_quantity = 1 THEN NULL
                      ELSE ln(l_extendedprice) / ln(l_quantity) END, 9)
                                                   AS f_log_base,
           greatest(l_discount, l_tax)             AS f_greatest,
           least(l_discount, l_tax)                AS f_least
    FROM lineitem WHERE l_orderkey <= 300
    """,
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions over lineitem (ref func_math.cpp & friends)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 300).select(
        "l_orderkey",
        "l_linenumber",
        func("abs", F.col("l_discount") - F.col("l_tax")).alias("f_abs"),
        func("ceil", F.col("l_quantity") / 7).cast("bigint").alias("f_ceil"),
        func("floor", F.col("l_extendedprice") / 1000).cast("bigint").alias("f_floor"),
        func("round", F.col("l_extendedprice") / 7, 3).alias("f_round"),
        func("mod", F.col("l_orderkey"), 7).alias("f_mod"),
        func("sqrt", F.col("l_quantity")).alias("f_sqrt"),
        func("pow", F.col("l_discount"), 2).alias("f_pow"),
        func("sign", F.col("l_discount") - 0.05).cast("double").alias("f_sign"),
        F.round(func("ln", F.col("l_extendedprice")), 9).alias("f_ln"),
        F.round(func("log10", F.col("l_extendedprice")), 9).alias("f_log10"),
        # 2-arg LOG with a VARYING base exercises the r11 base-domain
        # guard (func_math.cpp:585-591): l_quantity hits 1.00 on real
        # rows, which used to yield ±inf (ln/ln(1)) instead of NULL
        F.round(
            func("log", F.col("l_quantity"), F.col("l_extendedprice")), 9
        ).alias("f_log_base"),
        func("greatest", F.col("l_discount"), F.col("l_tax")).alias("f_greatest"),
        func("least", F.col("l_discount"), F.col("l_tax")).alias("f_least"),
    )


@query(
    "func_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS f_upper,
           lower(c_mktsegment)                             AS f_lower,
           length(c_name)                                  AS f_length,
           ascii(c_name)                                   AS f_ascii,
           concat(c_name, '#', c_mktsegment)               AS f_concat,
           concat_ws('-', c_name, c_mktsegment)            AS f_concat_ws,
           substr(c_name, 1, 8)                            AS f_substr,
           left(c_name, 4)                                 AS f_left,
           right(c_name, 3)                                AS f_right,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')        AS f_lpad,
           rpad(c_mktsegment, 12, '.')                     AS f_rpad,
           replace(c_name, 'Customer', 'Cust')             AS f_replace,
           reverse(c_mktsegment)                           AS f_reverse,
           repeat(c_mktsegment[1:1], 3)                    AS f_repeat,
           trim('  ' || c_name || ' ')                     AS f_trim,
           instr(c_name, 'er')                             AS f_instr,
           split_part(c_name, 'r', 1)                      AS f_sidx,
           md5(c_name)                                     AS f_md5
    FROM customer WHERE c_custkey <= 200
    """,
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions over customer (ref func_str family)."""
    (customer,) = _t(spark, sf_dir, "customer")
    name = F.col("c_name")
    seg = F.col("c_mktsegment")
    return customer.filter(F.col("c_custkey") <= 200).select(
        "c_custkey",
        func("ucase", name).alias("f_upper"),
        func("lcase", seg).alias("f_lower"),
        func("length", name).cast("bigint").alias("f_length"),
        func("ascii", name).alias("f_ascii"),
        func("concat", name, F.lit("#"), seg).alias("f_concat"),
        func("concat_ws", "-", name, seg).alias("f_concat_ws"),
        func("substr", name, 1, 8).alias("f_substr"),
        func("left", name, 4).alias("f_left"),
        func("right", name, 3).alias("f_right"),
        func("lpad", F.col("c_custkey").cast("string"), 8, "0").alias("f_lpad"),
        func("rpad", seg, 12, ".").alias("f_rpad"),
        func("replace", name, F.lit("Customer"), F.lit("Cust")).alias("f_replace"),
        func("reverse", seg).alias("f_reverse"),
        func("repeat", F.substring(seg, 1, 1), 3).alias("f_repeat"),
        func("trim", F.concat(F.lit("  "), name, F.lit(" "))).alias("f_trim"),
        func("instr", name, "er").cast("bigint").alias("f_instr"),
        func("substring_index", name, "r", 1).alias("f_sidx"),
        func("md5", name).alias("f_md5"),
    )


@query(
    "func_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                        AS f_year,
           month(o_orderdate)                                       AS f_month,
           dayofmonth(o_orderdate)                                  AS f_day,
           quarter(o_orderdate)                                     AS f_quarter,
           dayofyear(o_orderdate)                                   AS f_doy,
           CAST(isodow(o_orderdate) % 7 + 1 AS BIGINT)              AS f_dow,
           CAST(isodow(o_orderdate) - 1 AS BIGINT)                  AS f_weekday,
           weekofyear(o_orderdate)                                  AS f_week_iso,
           strftime(o_orderdate, '%Y-%m')                           AS f_fmt,
           strftime(o_orderdate, '%d/%m/%Y')                        AS f_fmt2,
           last_day(o_orderdate)                                    AS f_last_day,
           CAST(date_diff('day', DATE '1970-01-01', o_orderdate) + 719528 AS BIGINT) AS f_to_days,
           CAST(epoch(o_orderdate) AS BIGINT)                       AS f_unix,
           o_orderdate + INTERVAL 31 DAY                            AS f_plus31,
           o_orderdate - INTERVAL 2 MONTH                           AS f_minus2m,
           CAST(date_diff('day', TIMESTAMP '1995-06-17', o_orderdate) AS INTEGER) AS f_datediff,
           monthname(o_orderdate)                                   AS f_monthname,
           dayname(o_orderdate)                                     AS f_dayname
    FROM orders WHERE o_orderkey <= 300
    """,
)
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions over orders (ref func_date*/func_day* family).

    MySQL DAYOFWEEK (Sun=1) == DuckDB ``isodow % 7 + 1``; MySQL WEEKDAY
    (Mon=0) == ``isodow - 1``; TO_DAYS == days-since-epoch + 719528.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.filter(F.col("o_orderkey") <= 300).select(
        "o_orderkey",
        func("year", d).cast("bigint").alias("f_year"),
        func("month", d).cast("bigint").alias("f_month"),
        func("day", d).cast("bigint").alias("f_day"),
        func("quarter", d).cast("bigint").alias("f_quarter"),
        func("dayofyear", d).cast("bigint").alias("f_doy"),
        func("dayofweek", d).cast("bigint").alias("f_dow"),
        func("weekday", d).cast("bigint").alias("f_weekday"),
        func("weekofyear", d).cast("bigint").alias("f_week_iso"),
        func("date_format", d, "%Y-%m").alias("f_fmt"),
        func("date_format", d, "%d/%m/%Y").alias("f_fmt2"),
        func("last_day", d).alias("f_last_day"),
        func("to_days", d).cast("bigint").alias("f_to_days"),
        func("unix_timestamp", d).alias("f_unix"),
        # timestamp_ntz: DATE + day interval is a MySQL DATETIME, which
        # is zoneless (dataconvert.h:142-160) — and the DuckDB oracle's
        # date + INTERVAL is Arrow timestamp[us] (ntz)
        func("date_add", d, 31, "day").cast("timestamp_ntz").alias("f_plus31"),
        func("date_sub", d, 2, "month").alias("f_minus2m"),
        func("datediff", d, F.lit("1995-06-17")).alias("f_datediff"),
        func("monthname", d).alias("f_monthname"),
        func("dayname", d).alias("f_dayname"),
    )


@query(
    "func_control",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END                                     AS f_case,
           CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
                ELSE 'other' END                                     AS f_case_simple,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END           AS f_if,
           CASE WHEN o_orderkey % 2 <> 0 THEN 'odd' ELSE 'even' END  AS f_if_numeric,
           coalesce(nullif(o_orderstatus, 'P'), 'pending')           AS f_ifnull,
           nullif(o_orderstatus, 'F')                                AS f_nullif,
           (o_totalprice BETWEEN 50000 AND 60000)                    AS f_between,
           (o_orderpriority IN ('1-URGENT', '2-HIGH'))               AS f_in,
           (nullif(o_orderstatus, 'F') IS NULL)                      AS f_isnull
    FROM orders WHERE o_orderkey <= 400
    """,
)
def func_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-flow / null functions (ref func_case/if/ifnull/nullif/...)."""
    (orders,) = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    status = F.col("o_orderstatus")
    return orders.filter(F.col("o_orderkey") <= 400).select(
        "o_orderkey",
        func(
            "case",
            (price > 300000, F.lit("big")),
            (price > 100000, F.lit("mid")),
            default=F.lit("small"),
        ).alias("f_case"),
        func(
            "case",
            (status == "F", F.lit("final")),
            (status == "O", F.lit("open")),
            default=F.lit("other"),
        ).alias("f_case_simple"),
        func("if", status == "F", 1, 0).alias("f_if"),
        # IF with a NUMERIC first argument — MySQL boolVal coercion
        # (func_if.cpp:38-72), the r11 truthiness fix on the Column path
        func("if", F.col("o_orderkey") % 2, F.lit("odd"), F.lit("even"))
        .alias("f_if_numeric"),
        func("ifnull", func("nullif", status, F.lit("P")), F.lit("pending")).alias("f_ifnull"),
        func("nullif", status, F.lit("F")).alias("f_nullif"),
        func("between", price, 50000, 60000).alias("f_between"),
        func("in", F.col("o_orderpriority"), "1-URGENT", "2-HIGH").alias("f_in"),
        func("isnull", func("nullif", status, F.lit("F"))).alias("f_isnull"),
    )


@query(
    "func_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(round(o_totalprice, 0) AS BIGINT)          AS c_signed,
           CAST(o_orderkey AS VARCHAR)                     AS c_char,
           CAST(o_orderdate AS DATE)                       AS c_date,
           CAST(CAST(round(o_totalprice, 1) AS DECIMAL(18,2)) AS VARCHAR) AS c_decimal,
           printf('%.4f', CAST(o_orderkey AS DOUBLE))      AS c_double,
           coalesce(TRY_CAST(o_orderstatus AS BIGINT),
                    CASE WHEN o_orderstatus IS NOT NULL
                         THEN 0 END)                       AS c_bad
    FROM orders WHERE o_orderkey <= 300
    """,
)
def func_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family (ref func_cast.cpp; funcexp.cpp:83-88).

    MySQL CAST(double AS SIGNED) rounds half-away; DuckDB's BIGINT cast
    rounds too — same semantics.  Non-numeric strings PREFIX-parse to 0
    (atoll, func_cast.cpp:144 — r10 fix; only NULL input stays NULL),
    which the oracle hand-writes with coalesce.

    The decimal/double outputs are pinned through fixed-format strings on
    BOTH sides (the bal_sum recipe): the casts themselves still execute;
    only the comparison channel is serialization-stable.  This query was
    rows/schema-green but hash-red in r04 with zero repr-level diffs and
    matching Arrow dtypes — the residual channel is float/decimal
    serialization inside the driver hash.
    """
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 300).select(
        "o_orderkey",
        F.round(F.col("o_totalprice"), 0).cast("bigint").alias("c_signed"),
        func("cast_char", F.col("o_orderkey")).alias("c_char"),
        func("cast_date", F.col("o_orderdate")).alias("c_date"),
        func("cast_decimal", F.round(F.col("o_totalprice"), 1), 18, 2)
        .cast("string")
        .alias("c_decimal"),
        F.format_string("%.4f", func("cast_double", F.col("o_orderkey"))).alias(
            "c_double"
        ),
        func("cast_signed", F.col("o_orderstatus")).alias("c_bad"),
    )


@query(
    "func_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS VARCHAR)          AS k_raw,
           CAST(json_extract_string(props, '$.k') AS BIGINT)    AS k_num
    FROM events WHERE event_id <= 300
    """,
)
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props — capability bonus beyond the
    reference (no JSON in InfiniDB's type system, SURVEY §1.1)."""
    (events,) = _t(spark, sf_dir, "events")
    return events.filter(F.col("event_id") <= 300).select(
        "event_id",
        func("json_extract", F.col("props"), "$.k").alias("k_raw"),
        func("json_extract", F.col("props"), "$.k").try_cast("bigint").alias("k_num"),
    )


@query(
    "func_time",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS TIMESTAMP) AS ts0,
             CAST(o_orderdate AS TIMESTAMP)
               + ((o_orderkey * 977) % 200000) * INTERVAL 1 SECOND AS ts1,
             o_orderkey % 90000 AS s
      FROM orders WHERE o_orderkey <= 300
    )
    SELECT o_orderkey,
           lpad(CAST(s // 3600 AS VARCHAR), 2, '0') || ':' ||
             lpad(CAST((s % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
             lpad(CAST(s % 60 AS VARCHAR), 2, '0')                      AS f_s2t,
           lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0') || ':' ||
             lpad(CAST(o_orderkey % 60 AS VARCHAR), 2, '0') || ':' ||
             lpad(CAST((o_orderkey * 7) % 60 AS VARCHAR), 2, '0')       AS f_maketime,
           CAST(s AS BIGINT)                                            AS f_tts,
           CASE WHEN epoch(ts0) < epoch(ts1) THEN '-' ELSE '' END ||
             lpad(CAST(CAST(abs(epoch(ts0) - epoch(ts1)) AS BIGINT) // 3600 AS VARCHAR), 2, '0') || ':' ||
             lpad(CAST((CAST(abs(epoch(ts0) - epoch(ts1)) AS BIGINT) % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
             lpad(CAST(CAST(abs(epoch(ts0) - epoch(ts1)) AS BIGINT) % 60 AS VARCHAR), 2, '0') AS f_timediff,
           strftime(ts1, '%H:%M:%S')                                    AS f_tf,
           CAST(hour(ts1) AS BIGINT)                                    AS f_hour,
           CAST(minute(ts1) AS BIGINT)                                  AS f_minute,
           CAST(second(ts1) AS BIGINT)                                  AS f_second
    FROM t
    """,
)
def func_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-family functions (ref func_maketime/sec_to_time/timediff/
    time_format .cpp) — hash-checked against DuckDB arithmetic that
    reproduces MySQL's HH:MM:SS rendering (hours unbounded, zero-padded
    to ≥2; TIMEDIFF keeps the sign of a−b)."""
    (orders,) = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    s = k % 90000
    ts0 = F.col("o_orderdate").cast("timestamp")
    # date_add SECOND, not addtime: ADDTIME's 2nd arg is a packed TIME
    # value (130 = 1m30s), while this oracle adds plain seconds
    ts1 = func("date_add", ts0, (k * 977) % 200000, "second")
    return orders.filter(k <= 300).select(
        "o_orderkey",
        func("sec_to_time", s).alias("f_s2t"),
        func("maketime", k % 24, k % 60, (k * 7) % 60).alias("f_maketime"),
        func("time_to_sec", func("sec_to_time", s)).cast("bigint").alias("f_tts"),
        func("timediff", ts0, ts1).alias("f_timediff"),
        func("time_format", ts1, "%H:%i:%s").alias("f_tf"),
        func("hour", ts1).cast("bigint").alias("f_hour"),
        func("minute", ts1).cast("bigint").alias("f_minute"),
        func("second", ts1).cast("bigint").alias("f_second"),
    )
