"""Compound INTERVAL units — DATE_ADD/DATE_SUB/EXTRACT, both paths.

Reference: ``utils/funcexp/func_date_add.cpp:173-246`` (field fill,
right-aligned), ``utils/funcexp/funchelpers.h:508-571`` (getNumbers
operand scan), ``utils/funcexp/func_extract.cpp:68-86`` (packed
integers), ``dbcon/execplan/intervalcolumn.h:58-60`` (unit roster).
"""

from __future__ import annotations

import datetime

import pytest

from infinidb_spark.dialect import DialectError, translate_mysql
from infinidb_spark.functions import intervals as iv
from infinidb_spark.functions.registry import FUNC_MAP as FUNCTIONS


# ------------------------------------------------------------ pure parser


def test_get_numbers_basic():
    assert iv.interval_numbers("1:30", False) == [1, 30]
    assert iv.interval_numbers("2 12", False) == [2, 12]
    assert iv.interval_numbers("1 2:03:04", False) == [1, 2, 3, 4]
    assert iv.interval_numbers("30", False) == [30]


def test_get_numbers_signs():
    # '-' before a number negates it; DATE_SUB negates every number
    assert iv.interval_numbers("-1:30", False) == [-1, 30]
    assert iv.interval_numbers("-1:30", True) == [1, -30]
    assert iv.interval_numbers("1:30", True) == [-1, -30]


def test_get_numbers_dash_truncates():
    # NN-NN is the reference's error path: keep what was parsed, stop
    assert iv.interval_numbers("1-2", False) == [1]
    assert iv.interval_numbers("10:20-30", False) == [10, 20]


def test_get_numbers_cap_and_empty():
    assert iv.interval_numbers("", False) == []
    assert iv.interval_numbers("abc", False) == []
    assert len(iv.interval_numbers(" ".join("1" * 1 for _ in range(15)), False)) == 10


def test_compound_slots_right_aligned():
    assert iv.compound_slots("DAY_MINUTE", [5]) == {"minute": 5}
    assert iv.compound_slots("DAY_MINUTE", [2, 5]) == {"hour": 2, "minute": 5}
    assert iv.compound_slots("DAY_MINUTE", [1, 2, 5]) == {
        "day": 1, "hour": 2, "minute": 5,
    }
    assert iv.compound_slots("DAY_MINUTE", [1, 2, 3, 4]) is None


def test_ansi_interval_rendering():
    assert iv.ansi_interval_sql("YEAR_MONTH", {"year": 1, "month": 2}) == (
        "INTERVAL '1-2' YEAR TO MONTH"
    )
    assert iv.ansi_interval_sql("YEAR_MONTH", {"year": 0, "month": -14}) == (
        "INTERVAL '-1-2' YEAR TO MONTH"
    )
    assert iv.ansi_interval_sql("HOUR_MINUTE", {"hour": 1, "minute": 30}) == (
        "INTERVAL '0 01:30:00' DAY TO SECOND"
    )
    # mixed signs fold into one exact signed total
    assert iv.ansi_interval_sql("HOUR_MINUTE", {"hour": -1, "minute": 30}) == (
        "INTERVAL '-0 00:30:00' DAY TO SECOND"
    )
    assert iv.ansi_interval_sql(
        "SECOND_MICROSECOND", {"second": 1, "microsecond": 5}
    ) == "INTERVAL '0 00:00:01.000005' DAY TO SECOND"


# ------------------------------------------------------- dialect, live

_TS = "'2020-01-31 10:00:00'"

DATE_ADD_CASES = [
    (f"DATE_ADD({_TS}, INTERVAL '1:30' HOUR_MINUTE)", "2020-01-31 11:30:00"),
    (f"DATE_SUB({_TS}, INTERVAL '1:30' HOUR_MINUTE)", "2020-01-31 08:30:00"),
    (f"DATE_ADD({_TS}, INTERVAL '2 12' DAY_HOUR)", "2020-02-02 22:00:00"),
    (f"DATE_SUB({_TS}, INTERVAL '2 12' DAY_HOUR)", "2020-01-28 22:00:00"),
    (f"DATE_ADD({_TS}, INTERVAL '1:01:01' HOUR_SECOND)", "2020-01-31 11:01:01"),
    (f"DATE_ADD({_TS}, INTERVAL '1 2:03:04' DAY_SECOND)", "2020-02-01 12:03:04"),
    (f"DATE_ADD({_TS}, INTERVAL '2:03' MINUTE_SECOND)", "2020-01-31 10:02:03"),
    (f"DATE_ADD({_TS}, INTERVAL '1 2:03' DAY_MINUTE)", "2020-02-01 12:03:00"),
    (f"DATE_ADD({_TS}, INTERVAL '1 2' YEAR_MONTH)", "2021-03-31 10:00:00"),
    (f"DATE_SUB({_TS}, INTERVAL '0 2' YEAR_MONTH)", "2019-11-30 10:00:00"),
    # one number fills the SMALLEST field
    (f"DATE_ADD({_TS}, INTERVAL '30' HOUR_MINUTE)", "2020-01-31 10:30:00"),
    (f"DATE_ADD({_TS}, INTERVAL '5' DAY_SECOND)", "2020-01-31 10:00:05"),
    # microsecond units
    (
        f"DATE_ADD({_TS}, INTERVAL '1.5' SECOND_MICROSECOND)",
        "2020-01-31 10:00:01.000005",
    ),
    (
        f"DATE_ADD({_TS}, INTERVAL '1 0:0:0.000001' DAY_MICROSECOND)",
        "2020-02-01 10:00:00.000001",
    ),
    (
        f"DATE_ADD({_TS}, INTERVAL '1:2:3.000004' HOUR_MICROSECOND)",
        "2020-01-31 11:02:03.000004",
    ),
    (
        f"DATE_ADD({_TS}, INTERVAL '2:3.000004' MINUTE_MICROSECOND)",
        "2020-01-31 10:02:03.000004",
    ),
    # per-field sign; DATE_SUB(-1:30) = +1 h −30 m
    (f"DATE_SUB({_TS}, INTERVAL '-1:30' HOUR_MINUTE)", "2020-01-31 10:30:00"),
    # dash after a number truncates the scan (reference NN-NN path)
    (f"DATE_ADD({_TS}, INTERVAL '1-2' YEAR_MONTH)", "2020-02-29 10:00:00"),
    # bare ± INTERVAL syntax
    (f"{_TS} + INTERVAL '1:30' HOUR_MINUTE", "2020-01-31 11:30:00"),
    (f"TIMESTAMP {_TS} - INTERVAL '1:30' HOUR_MINUTE", "2020-01-31 08:30:00"),
]


@pytest.mark.parametrize("expr,expected", DATE_ADD_CASES)
def test_dialect_compound_date_add(spark, expr, expected):
    v = spark.sql(translate_mysql(f"SELECT {expr} AS v")).collect()[0][0]
    if isinstance(v, datetime.datetime):
        v = v.strftime("%Y-%m-%d %H:%M:%S.%f").rstrip("0").rstrip(".")
    assert str(v) == expected, translate_mysql(f"SELECT {expr} AS v")


def test_dialect_date_promotion(spark):
    """MySQL promotes DATE → DATETIME when time fields are added;
    YEAR_MONTH keeps DATE (ANSI typed-interval addition gives both)."""
    df = spark.sql(translate_mysql(
        "SELECT DATE_ADD(DATE '2020-01-31', INTERVAL '1:30' HOUR_MINUTE) AS t,"
        "       DATE_ADD(DATE '2020-01-31', INTERVAL '1 2' YEAR_MONTH) AS d"
    ))
    assert dict(df.dtypes) == {"t": "timestamp", "d": "date"}
    row = df.collect()[0]
    assert row.t == datetime.datetime(2020, 1, 31, 1, 30)
    assert row.d == datetime.date(2021, 3, 31)


def test_dialect_overflowed_fields_null(spark):
    """More numbers than the unit has fields → reference returns
    datetime 0, surfaced as NULL."""
    v = spark.sql(translate_mysql(
        f"SELECT DATE_ADD({_TS}, INTERVAL '1 2 3' HOUR_MINUTE) AS v"
    )).collect()[0][0]
    assert v is None


def test_dialect_errors():
    with pytest.raises(DialectError):
        translate_mysql("SELECT DATE_ADD(ts, INTERVAL col HOUR_MINUTE) FROM t")
    with pytest.raises(DialectError):
        translate_mysql("SELECT DATE_ADD(ts, INTERVAL 'abc' HOUR_MINUTE) FROM t")


EXTRACT_CASES = [
    ("YEAR_MONTH", 202003),
    ("DAY_HOUR", 510),
    ("DAY_MINUTE", 51020),
    ("DAY_SECOND", 5102030),
    ("HOUR_MINUTE", 1020),
    ("HOUR_SECOND", 102030),
    ("MINUTE_SECOND", 2030),
]


@pytest.mark.parametrize("field,expected", EXTRACT_CASES)
def test_dialect_extract_packed(spark, field, expected):
    sql = translate_mysql(
        f"SELECT EXTRACT({field} FROM '2020-03-05 10:20:30') AS v"
    )
    assert spark.sql(sql).collect()[0][0] == expected


def test_dialect_extract_second_microsecond(spark):
    sql = translate_mysql(
        "SELECT EXTRACT(SECOND_MICROSECOND FROM"
        " TIMESTAMP '2020-03-05 10:20:30.000123') AS v"
    )
    assert spark.sql(sql).collect()[0][0] == 30000123


def test_dialect_extract_single_unit_passthrough(spark):
    sql = translate_mysql("SELECT EXTRACT(YEAR FROM DATE '2020-03-05') AS v")
    assert spark.sql(sql).collect()[0][0] == 2020


def test_dialect_extract_week_mode0(spark):
    """EXTRACT(WEEK) is MySQL week mode 0 (func_extract.cpp:79), not
    Spark's ISO weekofyear: 2020-01-04 is week 0."""
    sql = translate_mysql("SELECT EXTRACT(WEEK FROM DATE '2020-01-04') AS v")
    assert spark.sql(sql).collect()[0][0] == 0


# ------------------------------------------------------- registry path


def test_registry_compound_date_add(spark):
    date_add = FUNCTIONS["date_add"]
    date_sub = FUNCTIONS["date_sub"]
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        F.lit("2020-01-31 10:00:00").cast("timestamp").alias("ts")
    )
    out = df.select(
        date_add(F.col("ts"), "1:30", "HOUR_MINUTE").alias("a"),
        date_sub(F.col("ts"), "1:30", "hour_minute").alias("b"),
        date_add(F.col("ts"), "1 2", "YEAR_MONTH").alias("c"),
    ).collect()[0]
    assert out.a == datetime.datetime(2020, 1, 31, 11, 30)
    assert out.b == datetime.datetime(2020, 1, 31, 8, 30)
    assert out.c == datetime.datetime(2021, 3, 31, 10, 0)


def test_registry_compound_extract(spark):
    extract = FUNCTIONS["extract"]
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        F.lit("2020-03-05 10:20:30").cast("timestamp").alias("ts")
    )
    out = df.select(
        extract("DAY_HOUR", "ts").alias("a"),
        extract("hour_second", "ts").alias("b"),
        extract("YEAR", "ts").alias("c"),
    ).collect()[0]
    assert (out.a, out.b, out.c) == (510, 102030, 2020)


def test_registry_column_operand_refused(spark):
    import pyspark.sql.functions as F

    with pytest.raises(NotImplementedError):
        FUNCTIONS["date_add"](F.col("ts"), F.col("n"), "HOUR_MINUTE")


def test_dialect_single_unit_microsecond(spark):
    """Single-unit MICROSECOND was missing from the dialect's unit map
    (the registry path had it) — all 9 single units now translate."""
    v = spark.sql(translate_mysql(
        "SELECT DATE_ADD(TIMESTAMP '2020-01-31 10:00:00',"
        " INTERVAL 5 MICROSECOND) AS v"
    )).collect()[0][0]
    assert v == datetime.datetime(2020, 1, 31, 10, 0, 0, 5)


def test_registry_extract_week_mode0(spark):
    """Registry extract('week') matches the dialect's EXTRACT(WEEK):
    MySQL mode 0, where 2020-01-04 is week 0 (Spark ISO says 1)."""
    import pyspark.sql.functions as F

    df = spark.range(1).select(F.lit("2020-01-04").cast("date").alias("d"))
    assert df.select(FUNCTIONS["extract"]("week", "d").alias("v")).collect()[0].v == 0


def test_compound_interval_translation_idempotent():
    """translate_mysql(translate_mysql(x)) == translate_mysql(x) for
    compound-interval SQL (the emitted ANSI literals and CAST wrappers
    must pass back through untouched)."""
    for sql in [
        f"SELECT DATE_ADD({_TS}, INTERVAL '1:30' HOUR_MINUTE) AS v",
        f"SELECT DATE_SUB({_TS}, INTERVAL '1 2' YEAR_MONTH) AS v",
        f"SELECT {_TS} + INTERVAL '1 2:03:04' DAY_SECOND AS v",
        "SELECT EXTRACT(DAY_HOUR FROM o_orderdate) AS v FROM orders",
        "SELECT EXTRACT(WEEK FROM o_orderdate) AS v FROM orders",
    ]:
        once = translate_mysql(sql)
        assert translate_mysql(once) == once, sql


def test_compound_unit_case_insensitive(spark):
    v = spark.sql(translate_mysql(
        f"SELECT date_add({_TS}, interval '1:30' hour_minute) AS v"
    )).collect()[0][0]
    assert v == datetime.datetime(2020, 1, 31, 11, 30)


def test_extract_second_microsecond_pre_epoch(spark):
    """Pre-1970 timestamps: unix_micros is negative and % follows the
    dividend's sign — pmod keeps the packed value correct
    (59.5 s → 59500000, not 58500000)."""
    sql = translate_mysql(
        "SELECT EXTRACT(SECOND_MICROSECOND FROM"
        " TIMESTAMP '1969-12-31 23:59:59.5') AS v"
    )
    assert spark.sql(sql).collect()[0][0] == 59500000
