"""Unit tests for the MySQL-dialect function library.

Expected values are pinned from MySQL documented semantics (the
reference implements MySQL 5.1 behavior, ``utils/funcexp/``) — these
cover the functions whose oracle can't be expressed in DuckDB
(week modes, to_days, period arithmetic, inet, format translation).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from infinidb_spark.functions import FUNC_MAP, func, mysql_datetime_format_to_spark


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_registry_size():
    # reference fFuncMap registers ~140 names (funcexp.cpp:68-207)
    assert len(FUNC_MAP) >= 120


def test_format_translation():
    assert mysql_datetime_format_to_spark("%Y-%m-%d") == "yyyy-MM-dd"
    assert mysql_datetime_format_to_spark("%H:%i:%s") == "HH:mm:ss"
    assert mysql_datetime_format_to_spark("%d/%b/%Y") == "dd/MMM/yyyy"
    with pytest.raises(ValueError):
        mysql_datetime_format_to_spark("%U")  # composed token


@pytest.mark.parametrize(
    "name,args,expected",
    [
        # MySQL doc examples (raw values — builders wrap via F.lit)
        ("to_days", ["2007-10-07"], 733321),
        ("to_days", ["1970-01-01"], 719528),
        ("weekday", ["2008-02-03"], 6),  # Sunday → 6
        ("weekday", ["2008-05-05"], 0),  # Monday → 0
        ("period_add", [200801, 2], 200803),
        ("period_add", [200811, 2], 200901),
        ("period_diff", [200802, 200703], 11),
        ("inet_aton", ["10.0.5.9"], 167773449),
        ("inet_ntoa", [167773449], "10.0.5.9"),
        ("sec_to_time", [2378], "00:39:38"),
        ("time_to_sec", ["22:23:00"], 80580),
        ("strcmp", ["text", "text2"], -1),
        ("substring_index", ["www.mysql.com", ".", 2], "www.mysql"),
        ("elt", [1, "Aa", "Bb"], "Aa"),
        ("find_in_set", ["b", "a,b,c,d"], 2),
        ("insert", ["Quadratic", 3, 4, "What"], "QuWhattic"),
        ("conv", ["a", 16, 2], "1010"),
        ("truncate", [1.999, 1], 1.9),
        ("truncate", [-1.999, 1], -1.9),
        ("left", ["foobarbar", 5], "fooba"),
        ("right", ["foobarbar", 4], "rbar"),
        ("char", [77, 121], "My"),
        ("makedate", [2011, 32], None),  # checked below
        ("maketime", [12, 15, 30], "12:15:30"),
        # fractional seconds are preserved (MySQL keeps the argument's
        # fraction, capped at 6 dp), not truncated to the integer second
        ("maketime", [12, 15, 30.5], "12:15:30.5"),
        ("maketime", [-1, 2, 3.25], "-01:02:03.25"),
        ("maketime", [120, 5, 59.999], "120:05:59.999"),
        ("maketime", [12, 15, 60.5], None),  # second out of [0, 60)
    ],
)
def test_mysql_semantics(spark, name, args, expected):
    v = one(spark, func(name, *args))
    if name == "makedate":
        assert str(v) == "2011-02-01"
    elif isinstance(expected, float):
        assert v == pytest.approx(expected)
    else:
        assert v == expected


def test_week_mode0(spark):
    # MySQL: WEEK('2008-02-20') = 7; WEEK('2008-12-31') = 52;
    # WEEK('2000-01-01') = 0 (Jan 1 2000 is a Saturday).
    assert one(spark, func("week", F.lit("2000-01-01").cast("date"))) == 0
    assert one(spark, func("week", F.lit("2008-02-20").cast("date"))) == 7
    assert one(spark, func("week", F.lit("2008-12-31").cast("date"))) == 52


def test_date_format_mysql(spark):
    d = F.lit("2009-10-04 22:23:00").cast("timestamp")
    assert one(spark, func("date_format", d, "%W %M %Y")) == "Sunday October 2009"
    assert one(spark, func("date_format", d, "%H:%i:%s")) == "22:23:00"
    assert one(spark, func("date_format", F.lit("2006-06-01").cast("date"), "%d")) == "01"
    # composed tokens
    assert one(spark, func("date_format", d, "%D of %M")) == "4th of October"
    assert one(spark, func("date_format", d, "%w")) == "0"  # Sunday=0


def test_str_to_date(spark):
    v = one(spark, func("str_to_date", F.lit("01,5,2013"), "%d,%c,%Y"))
    assert str(v).startswith("2013-05-01")


def test_timestampdiff(spark):
    a = F.lit("2003-02-01").cast("timestamp")
    b = F.lit("2003-05-01 12:05:55").cast("timestamp")
    assert one(spark, func("timestampdiff", "month", a, b)) == 3
    assert (
        one(
            spark,
            func(
                "timestampdiff",
                "second",
                F.lit("2003-05-01 00:00:00").cast("timestamp"),
                b,
            ),
        )
        == 43555
    )


def test_timediff(spark):
    v = one(
        spark,
        func(
            "timediff",
            F.lit("2000-01-01 00:00:00").cast("timestamp"),
            F.lit("2000-01-01 00:00:30").cast("timestamp"),
        ),
    )
    assert v == "-00:00:30"


def test_math_misc(spark):
    assert one(spark, func("crc32", F.lit("MySQL"))) == 3259397556
    assert one(spark, func("hex", F.lit(255))) == "FF"
    assert one(spark, func("mod", F.lit(29), F.lit(9))) == 2
    assert one(spark, func("format", F.lit(12332.123456), 4)) == "12,332.1235"
    assert one(spark, func("bitand", F.lit(29), F.lit(15))) == 13
    assert one(spark, func("leftshift", F.lit(1), 2)) == 4


def test_control(spark):
    assert one(spark, func("if", F.lit(1) > 2, F.lit("a"), F.lit("b"))) == "b"
    assert one(spark, func("ifnull", F.lit(None).cast("int"), F.lit(7))) == 7
    assert one(spark, func("nullif", F.lit(3), F.lit(3))) is None
    assert one(spark, func("greatest", F.lit(2), F.lit(0), F.lit(34))) == 34
    assert one(spark, func("strcmp", F.lit("a"), F.lit("a"))) == 0


def test_casts(spark):
    assert one(spark, func("cast_signed", F.lit("12"))) == 12
    assert one(spark, func("cast_char", F.lit(1234), 2)) == "12"
    assert str(one(spark, func("cast_date", F.lit("2020-05-05 01:02:03")))) == "2020-05-05"
    # string→integer is a PREFIX parse (atoll, func_cast.cpp:144):
    # garbage → 0, numeric prefix parses (r10 fix; was NULL)
    assert one(spark, func("cast_signed", F.lit("xyz"))) == 0
    assert one(spark, func("cast_signed", F.lit("12abc"))) == 12
    assert one(spark, func("cast_signed", F.lit(None).cast("string"))) is None


def test_not_in_is_negated(spark):
    """Regression: `notin` was aliased to the POSITIVE in-builder.
    MySQL three-valued semantics: NULL input -> NULL (filtered out)."""
    assert one(spark, func("in", F.lit(2), 1, 2, 3)) is True
    assert one(spark, func("notin", F.lit(2), 1, 2, 3)) is False
    assert one(spark, func("notin", F.lit(9), 1, 2, 3)) is True
    assert one(spark, func("not in ", F.lit(9), 1, 2, 3)) is True
    assert one(spark, func("notin", F.lit(None).cast("int"), 1, 2)) is None


def test_idbpartition_func_map_entry(spark, tmp_path):
    """The scalar-function form of the idbpartition pseudo-column
    (funcexp.cpp registers it in the FuncMap too) resolves and returns
    the file identity over a real scan."""
    from infinidb_spark.functions.registry import FUNC_MAP

    p = str(tmp_path / "t")
    spark.range(10).coalesce(1).write.parquet(p)
    rows = (
        spark.read.parquet(p)
        .select(FUNC_MAP["idbpartition"]().alias("part"))
        .distinct()
        .collect()
    )
    assert len(rows) == 1 and rows[0].part.endswith(".parquet")


def test_registry_edge_semantics_round8(spark):
    """Round-8 review fixes, Column path: TIME_TO_SEC input classes,
    MAKETIME/MAKEDATE NULL rules, MICROSECOND pre-epoch pmod,
    STR_TO_DATE NULL-on-garbage, TIMEDIFF over bare TIME strings,
    TRUNCATE decimal exactness, INET_ATON validity, DATE_ADD preserving
    time-of-day."""
    from decimal import Decimal

    from infinidb_spark.functions.registry import func

    df = spark.range(1)

    def one(col):
        return df.select(col.alias("v")).collect()[0].v

    assert one(func("time_to_sec", F.lit("12:30"))) == 45000
    assert one(func("time_to_sec", F.lit(1230))) == 750
    assert one(func("time_to_sec", F.lit("-01:00:30"))) == -3630
    assert one(func("time_to_sec", F.lit("12:30:45.5"))) == Decimal("45045.5")
    assert one(func("maketime", F.lit(None).cast("int"), F.lit(1), F.lit(2))) is None
    assert one(func("makedate", F.lit(2020), F.lit(0))) is None
    assert str(one(func("makedate", F.lit(2020), F.lit(32)))) == "2020-02-01"
    assert one(func("microsecond", F.lit("1969-12-31 23:59:59.5"))) == 500000
    assert one(func("str_to_date", F.lit("garbage"), "%Y-%m-%d")) is None
    assert one(func("timediff", F.lit("10:00:00"), F.lit("08:00:00"))) == "02:00:00"
    assert one(func("timediff", F.lit("08:00:00"), F.lit("10:00:00"))) == "-02:00:00"
    assert one(
        func("truncate", F.lit("0.29").cast("decimal(5,2)"), 2)
    ) == Decimal("0.29")
    assert one(func("truncate", F.lit(123), -1)) == 120
    assert one(func("inet_aton", F.lit("1.2.3.999"))) is None
    assert one(func("inet_aton", F.lit("1.2.3.abc"))) is None
    assert one(func("inet_aton", F.lit("192.168.0.1"))) == 3232235521
    ts = F.lit("2020-01-01 10:30:00").cast("timestamp")
    assert str(one(func("date_add", ts, 1))) == "2020-01-02 10:30:00"
    assert str(one(func("date_sub", ts, 1))) == "2019-12-31 10:30:00"


def test_group_concat_numeric_order_and_all_null_group(spark):
    """r10 review pins: values sort in their OWN type (10 after 9, not
    lexicographic '10' < '9'), and a group whose every value is NULL
    yields NULL like MySQL/listagg — not '' (the dialect _group_concat
    path already returned NULL; the two paths now agree)."""
    from infinidb_spark.operators.aggregates import group_concat

    df = spark.createDataFrame(
        [("a", 2), ("a", 10), ("a", 9), ("b", None), ("b", None)],
        "g string, n int",
    )
    out = {
        r["g"]: r["s"]
        for r in df.groupBy("g")
        .agg(group_concat(F.col("n")).alias("s"))
        .collect()
    }
    assert out["a"] == "2,9,10"
    assert out["b"] is None
    out2 = {
        r["g"]: r["s"]
        for r in df.groupBy("g")
        .agg(group_concat(F.col("n"), distinct=True).alias("s"))
        .collect()
    }
    assert out2["a"] == "2,9,10"
    assert out2["b"] is None
