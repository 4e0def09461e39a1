"""Round-4 feature tests: composed DATE_FORMAT tokens in SQL text,
case-insensitive collation mode, and AUTO_INCREMENT columns."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from infinidb_spark.dialect import DialectError, translate_mysql
from infinidb_spark.session import InfiniSession


# ---------------------------------------------------- DATE_FORMAT tokens


def test_composed_tokens_translate_without_error():
    out = translate_mysql("SELECT DATE_FORMAT(d, '%X-W%V') FROM t")
    assert "concat(" in out and "date_format" not in out.split("concat(")[0]
    out2 = translate_mysql("SELECT DATE_FORMAT(d, '%Y-%m-%d') FROM t")
    assert "date_format" in out2 and "concat(" not in out2


def test_str_to_date_composed_still_refuses():
    with pytest.raises(DialectError):
        translate_mysql("SELECT STR_TO_DATE(s, '%X-%V') FROM t")


# MySQL ground truth for the week-token matrix (values from MySQL 8 docs
# & server behavior; the reference implements the same in
# utils/funcexp/func_date_format.cpp / func_week.cpp).
_WEEK_CASES = [
    # date,        %U,   %u,   %V,   %X,     %v,   %x,    %w
    ("2021-01-01", "00", "00", "52", "2020", "53", "2020", "5"),
    ("2020-12-31", "52", "53", "52", "2020", "53", "2020", "4"),
    ("2017-01-01", "01", "00", "01", "2017", "52", "2016", "0"),
    ("2012-01-01", "01", "00", "01", "2012", "52", "2011", "0"),
    ("2012-12-31", "53", "53", "53", "2012", "01", "2013", "1"),
    ("1996-12-30", "52", "53", "52", "1996", "01", "1997", "1"),
    ("1997-01-05", "01", "01", "01", "1997", "01", "1997", "0"),
]


@pytest.mark.parametrize("d,u,lu,v,x,iv,ix,w", _WEEK_CASES)
def test_week_token_matrix(spark, d, u, lu, v, x, iv, ix, w):
    sql = translate_mysql(
        f"SELECT DATE_FORMAT(DATE'{d}', '%U') AS u, DATE_FORMAT(DATE'{d}', '%u') AS lu,"
        f" DATE_FORMAT(DATE'{d}', '%V') AS v, DATE_FORMAT(DATE'{d}', '%X') AS x,"
        f" DATE_FORMAT(DATE'{d}', '%v') AS iv, DATE_FORMAT(DATE'{d}', '%x') AS ix,"
        f" DATE_FORMAT(DATE'{d}', '%w') AS w"
    )
    row = spark.sql(sql).collect()[0]
    assert (row.u, row.lu, row.v, row.x, row.iv, row.ix, row.w) == (u, lu, v, x, iv, ix, w)


def test_day_suffix_token(spark):
    sql = translate_mysql(
        "SELECT DATE_FORMAT(DATE'2021-03-01', '%D') AS a,"
        " DATE_FORMAT(DATE'2021-03-02', '%D') AS b,"
        " DATE_FORMAT(DATE'2021-03-03', '%D') AS c,"
        " DATE_FORMAT(DATE'2021-03-11', '%D') AS d,"
        " DATE_FORMAT(DATE'2021-03-21', '%D') AS e,"
        " DATE_FORMAT(DATE'2021-03-30', '%D') AS f"
    )
    row = spark.sql(sql).collect()[0]
    assert (row.a, row.b, row.c, row.d, row.e, row.f) == (
        "1st", "2nd", "3rd", "11th", "21st", "30th",
    )


def test_mixed_literal_and_composed(spark):
    sql = translate_mysql("SELECT DATE_FORMAT(DATE'2021-01-01', 'wk %V of %X') AS s")
    assert spark.sql(sql).collect()[0].s == "wk 52 of 2020"


def test_week_yearweek_sql_text(spark):
    """MySQL WEEK(d[,mode]) / YEARWEEK in SQL text — Spark has no WEEK
    function; the dialect expands the composed SQL.  Ground truth from
    MySQL (ref func_week.cpp)."""
    sql = translate_mysql(
        "SELECT WEEK(DATE'2021-01-01') AS w0, WEEK(DATE'2021-01-01', 1) AS w1,"
        " WEEK(DATE'2021-01-01', 2) AS w2, WEEK(DATE'2021-01-01', 3) AS w3,"
        " YEARWEEK(DATE'2021-01-01') AS y0, YEARWEEK(DATE'2021-01-01', 1) AS y1"
    )
    row = spark.sql(sql).collect()[0]
    assert (row.w0, row.w1, row.w2, row.w3) == (0, 0, 52, 53)
    assert (row.y0, row.y1) == (202052, 202053)
    with pytest.raises(DialectError):
        translate_mysql("SELECT WEEK(d, 7) FROM t")  # modes 4-7 unsupported


# ---------------------------------------------------------- ci collation


def test_ci_collation_rewrites_comparisons():
    out = translate_mysql("SELECT * FROM t WHERE a = 'X' AND b != 'y'", ci_collation=True)
    assert out.count("collate(") == 2 and "UTF8_LCASE" in out


def test_ci_collation_in_list(spark):
    sql = translate_mysql(
        "SELECT count(*) AS n FROM VALUES ('AA'), ('bb'), ('Cc') t(s)"
        " WHERE s IN ('aa', 'BB')",
        ci_collation=True,
    )
    assert spark.sql(sql).collect()[0].n == 2


def test_ci_collation_off_by_default(spark):
    sql = translate_mysql(
        "SELECT count(*) AS n FROM VALUES ('AA') t(s) WHERE s = 'aa'"
    )
    assert "collate" not in sql
    assert spark.sql(sql).collect()[0].n == 0


def test_ci_collation_leaves_aliases_alone():
    out = translate_mysql("SELECT count(*) 'Total' FROM t", ci_collation=True)
    assert "collate" not in out and "`Total`" in out


# --------------------------------------------------------- AUTO_INCREMENT


def test_auto_increment_requires_integer():
    from infinidb_spark.dialect import parse_statement

    with pytest.raises(DialectError):
        parse_statement("CREATE TABLE t (id VARCHAR(10) AUTO_INCREMENT)")
    with pytest.raises(DialectError):
        parse_statement(
            "CREATE TABLE t (a BIGINT AUTO_INCREMENT, b BIGINT AUTO_INCREMENT)"
        )


def test_assign_auto_increment_distributed(spark):
    from pyspark.sql import functions as F

    from infinidb_spark.operators.dml import assign_auto_increment

    df = spark.range(0, 1000, 1, 8).select(
        F.when(F.col("id") % 10 == 0, F.col("id") + 5000).alias("k"),
        F.col("id").alias("payload"),
    )
    out = assign_auto_increment(df, "k", start=7000).collect()
    assigned = sorted(r.k for r in out if r.payload % 10 != 0)
    assert assigned == list(range(7000, 7900))  # 900 nulls, contiguous
    explicit = [r.k for r in out if r.payload % 10 == 0]
    assert all(k >= 5000 and k < 7000 for k in explicit)  # untouched


def test_auto_increment_session_end_to_end(spark):
    sess = InfiniSession(spark)
    workdir = tempfile.mkdtemp(prefix="ai_test_")
    try:
        sess.execute(
            "CREATE TABLE ai_u (id BIGINT AUTO_INCREMENT, v VARCHAR(5))"
        )
        sess.execute("INSERT INTO ai_u (v) VALUES ('a'), ('b')")
        sess.execute("INSERT INTO ai_u (id, v) VALUES (50, 'c')")
        sess.execute("INSERT INTO ai_u (v) VALUES ('d')")
        rows = {r.v: r.id for r in sess.sql("SELECT id, v FROM ai_u").collect()}
        assert sorted((rows["a"], rows["b"])) == [1, 2]
        assert rows["c"] == 50 and rows["d"] == 51
        ddl = sess.execute("SHOW CREATE TABLE ai_u").collect()[0]["Create Table"]
        assert "AUTO_INCREMENT" in ddl
        # LOAD DATA without the id column continues the sequence
        csv = os.path.join(workdir, "x.csv")
        with open(csv, "w") as fh:
            fh.write("e\nf\n")
        sess.execute(f"LOAD DATA INFILE '{csv}' INTO TABLE ai_u (v)")
        rows = {r.v: r.id for r in sess.sql("SELECT id, v FROM ai_u").collect()}
        assert sorted((rows["e"], rows["f"])) == [52, 53]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        if sess._managed_root:
            shutil.rmtree(sess._managed_root, ignore_errors=True)
