"""Regression tests for the round-11 ADVICE findings.

1. ci-collation LIKE fold double-escaped backslashes — any LIKE
   pattern containing a regex metacharacter ('.', '+', …) silently
   mismatched (dialect.py ci fold; _sql_str already doubles).
2. The same double-escape in STR_TO_DATE's input normalization made
   the \\s+ whitespace collapse a no-op on the SQL-text path, so
   multi-space inputs parsed via the registry builder but NULLed via
   translate_mysql.
3. TIME_FORMAT with an empty format string raised IndexError on both
   paths; MySQL returns ''.
4. quality_gate.score_and_route passed input columns named
   'quality'/'lang_guess'/'status' through, producing duplicate
   columns and AMBIGUOUS_REFERENCE downstream.
5. bulk_load_csv silently fell through to the escape-unaware CSV
   reader for unquoted+escaped files with header=True.
"""

from __future__ import annotations

import os

import pytest

from infinidb_spark.dialect import translate_mysql


@pytest.mark.parametrize(
    ("expr", "want"),
    [
        # '.' must stay a literal dot after the LIKE→RLIKE fold
        ("'a.b' LIKE 'a.b'", True),
        ("'aXb' LIKE 'a.b'", False),
        ("'WWW.EXAMPLE.COM' LIKE '%.com'", True),
        ("'commercial' LIKE '%.com'", False),
        ("'c++ guide' LIKE '%c++%'", True),
        ("'cpp guide' LIKE '%c++%'", False),
        # escaped wildcard still works alongside metachars
        ("'50.5%' LIKE '50.5\\%'", True),
        ("'50.5X' LIKE '50.5\\%'", False),
    ],
)
def test_ci_like_fold_metachars(spark, expr, want):
    t1 = translate_mysql(f"SELECT {expr} AS v", ci_collation=True)
    assert translate_mysql(t1, ci_collation=True) == t1  # idempotent
    assert spark.sql(t1).collect()[0][0] is want


@pytest.mark.parametrize(
    "inp",
    ["May 1,  2013", "May  1, 2013", "May\t1, 2013"],
    ids=["double-space-late", "double-space-early", "tab"],
)
def test_str_to_date_whitespace_collapse_dialect_path(spark, inp):
    """Dialect path must parse multi-space/tab inputs exactly like the
    registry twin (MYSQL_PARSE_INPUT_NORM \\s+ collapse)."""
    got = spark.sql(
        translate_mysql(f"SELECT STR_TO_DATE('{inp}', '%M %d,%Y') AS v")
    ).collect()[0].v
    assert str(got) == "2013-05-01", f"{inp!r}: got {got!r}"


def test_time_format_empty_format_dialect(spark):
    got = spark.sql(
        translate_mysql("SELECT TIME_FORMAT('10:30:00', '') AS v")
    ).collect()[0].v
    assert got == ""


def test_time_format_empty_format_null_operand(spark):
    got = spark.sql(
        translate_mysql("SELECT TIME_FORMAT(NULL, '') AS v")
    ).collect()[0].v
    assert got is None


def test_time_format_empty_format_registry(spark):
    from pyspark.sql import functions as F

    from infinidb_spark.functions.registry import FUNC_MAP

    df = spark.range(1).select(
        FUNC_MAP["time_format"](F.lit("10:30:00"), "").alias("v"),
        FUNC_MAP["time_format"](F.lit(None), "").alias("n"),
    )
    row = df.collect()[0]
    assert row.v == "" and row.n is None


def test_quality_gate_reserved_column_collision(spark):
    from infinidb_spark.streaming.quality_gate import score_and_route

    df = spark.createDataFrame(
        [("d1", "some text", 0.5)], "doc_id string, text string, quality double"
    )
    with pytest.raises(ValueError, match="quality"):
        score_and_route(df, 0.6, ("en",))


def test_quality_gate_metadata_still_passes(spark):
    from infinidb_spark.streaming.quality_gate import score_and_route

    df = spark.createDataFrame(
        [("d1", "a perfectly ordinary sentence about the weather today.", "web")],
        "doc_id string, text string, source string",
    )
    out = score_and_route(df, 0.0, ("en", "und"))
    assert out.columns == [
        "doc_id", "text", "source", "quality", "lang_guess", "status"
    ]
    assert out.collect()[0].source == "web"


def test_bulk_load_unquoted_escaped_with_header(spark, tmp_path):
    """header=True on the unquoted+escaped path: per-file header lines
    are skipped (whole-line CSV read with a NUL separator, JVM-side)
    and MySQL everywhere-escaping still parses — the old code fell
    through to the quote-only CSV reader whose esc+separator handling
    diverges."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from infinidb_spark.sources.bulk_load import bulk_load_csv

    d = os.path.join(str(tmp_path), "in")
    os.makedirs(d)
    for name, rows in (
        ("a.txt", ["1|with\\|pipe", "2|plain"]),
        ("b.txt", ["3|tab\\\there", "4|\\N"]),
    ):
        with open(os.path.join(d, name), "w") as f:
            f.write("id|s\n")
            f.write("\n".join(rows) + "\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("s", StringType())]
    )
    res = bulk_load_csv(
        spark, d, schema, delimiter="|", quote=None, escape="\\", header=True,
    )
    assert res.rows_rejected == 0, res.rejected.collect()
    got = sorted((r.id, r.s) for r in res.loaded.collect())
    assert got == [(1, "with|pipe"), (2, "plain"), (3, "tab\there"), (4, None)]
    res.unpersist()


# ---------------------------------------------------------------------------
# Round-11 diff-review findings (the same-round adversarial pass).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    ("expr", "want"),
    [
        # literal-cmp fold must NOT fire next to a tighter-binding
        # arithmetic operator — the operand belongs to the arithmetic.
        # (the arith fold then coerces the string itself, so these now
        # produce MySQL's answers: (6)='abc'->(6)=0.0 false, 'abc'*2=0)
        ("3 * 2 = 'abc'", False),
        ("0 = 'abc' * 2", True),
        # ...but the plain literal-vs-literal case folds exactly
        ("0 = 'abc'", True),
        ("1 = '1a'", True),
        # hex/bit literals: numeric when compared with a NUMBER
        # literal, binary when compared with a string
        ("0x41 = 65", True),
        ("65 = 0x41", True),
        ("X'41' = 'A'", True),
        # empty bit literal folds to 0 in numeric context like X''
        ("B'' + 1", 1),
        ("X'' + 1", 1),
    ],
)
def test_r11_review_cmp_and_hex_guards(spark, expr, want):
    t = translate_mysql(f"SELECT {expr} AS v")
    assert translate_mysql(t) == t
    got = spark.sql(t).collect()[0][0]
    assert got == want, f"{expr}: got {got!r}"


def test_r11_review_registry_if_string_prefix(spark):
    """Registry IF() must prefix-parse string conditions exactly like
    the dialect path (func_if.cpp:62-66 atoi): '2x' -> true,
    'true' -> 0 -> false (NOT Spark's boolean-string cast)."""
    from pyspark.sql import functions as F

    from infinidb_spark.functions.registry import FUNC_MAP

    iff = FUNC_MAP["if"]
    row = spark.range(1).select(
        iff(F.lit("2x"), F.lit(1), F.lit(0)).alias("px"),
        iff(F.lit("true"), F.lit(1), F.lit(0)).alias("word"),
        iff(F.lit("abc"), F.lit(1), F.lit(0)).alias("junk"),
        iff(F.lit(0.1), F.lit(1), F.lit(0)).alias("num"),
        iff(F.lit(None).cast("int"), F.lit(1), F.lit(0)).alias("nul"),
        iff(F.lit(True), F.lit(1), F.lit(0)).alias("boo"),
    ).collect()[0]
    assert (row.px, row.word, row.junk, row.num, row.nul, row.boo) == (
        1, 0, 0, 1, 0, 1
    )
