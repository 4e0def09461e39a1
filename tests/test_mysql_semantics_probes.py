"""The round-8 judge's live MySQL-semantics probe battery, retired into
the suite (VERDICT r08 "Next round" item 8).

Each probe is a SQL-TEXT expression through the dialect front-end with
the value MySQL 8 documents for it — the probes that caught the round-8
findings (ADDTIME's today-anchored wrong answer, abbreviated
DAY/MONTHNAME, boolean ISNULL, missing 2^64 cast wrap, unrouted
INSERT/CHAR/GET_FORMAT) plus the families the judge verified as already
exact (MOD/DIV/ROUND/TRUNCATE/CONV/HEX, TO_DAYS/PERIOD_*/YEARWEEK/
MAKEDATE, INET_ATON/NTOA, CRC32, GREATEST null-strictness, compound
INTERVAL units, week modes, %r/%j tokens).

Reference for the function roster: utils/funcexp/funcexp.cpp FuncMap;
per-function cpp files cited in functions/registry.py.
"""

from __future__ import annotations

import math

import pytest

from infinidb_spark.dialect import translate_mysql

# (expression, MySQL-documented value).  Values compare with == after
# str() for strings / float() for numerics (see _check).
PROBES = [
    # --- math family (verified exact by the r08 judge battery) ---
    ("MOD(29, 9)", 2),
    ("29 MOD 9", 2),
    ("29 DIV 9", 3),
    ("-29 DIV 9", -3),
    ("ROUND(2.5)", 3),
    ("ROUND(-2.5)", -3),
    ("TRUNCATE(3.14159, 2)", 3.14),
    ("TRUNCATE(0.29, 2)", 0.29),
    ("TRUNCATE(-3.999, 1)", -3.9),
    ("TRUNCATE(12345, -2)", 12300),
    ("CONV('a', 16, 2)", "1010"),
    ("HEX(255)", "FF"),
    ("CRC32('MySQL')", 3259397556),
    # --- date/time family ---
    ("TO_DAYS('2007-10-07')", 733321),
    ("FROM_DAYS(733321)", "2007-10-07"),
    ("PERIOD_ADD(200801, 2)", 200803),
    ("PERIOD_DIFF(200802, 200703)", 11),
    ("YEARWEEK('1987-01-01')", 198652),
    ("MAKEDATE(2011, 31)", "2011-01-31"),
    ("MAKEDATE(2011, 0)", None),
    ("WEEK('2008-02-20')", 7),
    ("WEEK('2008-02-20', 1)", 8),
    ("DATE_FORMAT('2006-06-01', '%j')", "152"),
    ("DATE_FORMAT('1997-10-04 22:23:00', '%r')", "10:23:00 PM"),
    ("MAKETIME(12, 15, 30)", "12:15:30"),
    ("SEC_TO_TIME(2378)", "00:39:38"),
    ("TIME_TO_SEC('22:23:00')", 80580),
    ("MICROSECOND('2019-12-31 23:59:59.000010')", 10),
    # the round-8 finding: TIME-string FIRST operand must yield TIME,
    # never a today-anchored timestamp (func_add_time.cpp)
    ("ADDTIME('01:00:00', '01:30:00')", "02:30:00"),
    ("ADDTIME('2007-12-31 23:59:59', '1:1:1')", "2008-01-01 01:01:00"),
    ("SUBTIME('01:00:00', '00:30:00')", "00:30:00"),
    # full names, not Spark's abbreviations (funchelpers.h:150)
    ("DAYNAME('2007-02-03')", "Saturday"),
    ("MONTHNAME('2008-02-03')", "February"),
    # --- compound INTERVAL units (funcexp getNumbers operand scan) ---
    ("DATE_ADD('2020-01-01', INTERVAL '1 2:30' DAY_MINUTE)",
     "2020-01-02 02:30:00"),
    ("DATE_ADD('2020-01-01', INTERVAL '1 2' YEAR_MONTH)", "2021-03-01"),
    # string date + date-only unit preserves date-ness
    # (func_date_add.cpp) — closed this round, no longer deferred
    ("DATE_ADD('2020-01-31', INTERVAL 1 MONTH)", "2020-02-29"),
    ("DATE_SUB('2020-03-31', INTERVAL 1 MONTH)", "2020-02-29"),
    ("DATE_ADD('2020-01-31', INTERVAL 1 DAY)", "2020-02-01"),
    ("EXTRACT(YEAR_MONTH FROM DATE '2019-07-02')", 201907),
    # --- casts (func_cast.cpp; the 2^64 wrap is func_cast.cpp:234) ---
    ("CAST(2.63 AS SIGNED)", 3),
    ("CAST('2.9' AS SIGNED)", 2),
    ("CAST(-1 AS UNSIGNED)", 18446744073709551615),
    ("CAST(18446744073709551615 AS SIGNED)", -1),
    ("CAST(-1.5 AS UNSIGNED)", 18446744073709551614),
    ("CAST('nope' AS DATETIME)", None),
    # --- control/null family ---
    ("GREATEST(2, NULL, 5)", None),
    ("LEAST(2, NULL, 5)", None),
    ("ISNULL(NULL)", 1),
    ("ISNULL(1/0)", 1),  # MySQL: division by zero yields NULL
    ("ISNULL(5)", 0),
    ("IFNULL(NULL, 10)", 10),
    ("NULLIF(1, 1)", None),
    # --- string family + the three names routed this round ---
    ("INSERT('Quadratic', 3, 4, 'What')", "QuWhattic"),
    ("INSERT('Quadratic', -1, 4, 'What')", "Quadratic"),
    ("INSERT('Quadratic', 3, 100, 'What')", "QuWhat"),
    ("CHAR(77, 121, 83, 81, 76)", "MySQL"),
    ("CHAR(77, 77.3, '77.3')", "MMM"),
    ("GET_FORMAT(DATE, 'USA')", "%m.%d.%Y"),
    ("GET_FORMAT(DATETIME, 'JIS')", "%Y-%m-%d %H:%i:%s"),
    ("GET_FORMAT(TIME, 'INTERNAL')", "%H%i%s"),
    ("STRCMP('text', 'text2')", -1),
    ("QUOTE(\"Don't\")", "'Don\\'t'"),
    ("FIELD('Bb', 'Aa', 'Bb', 'Cc', 'Dd', 'Ff')", 2),
    ("FIELD('bb', 'Aa', 'Bb', 'Cc')", 2),  # ci like MySQL's collation
    ("TRUNCATE(1.5, 40)", 1.5),   # MySQL clamps d to 30
    ("SUBSTRING(NULL, 0)", None),  # NULL-ness beats the pos-0 fold
    # --- string family, round-9 extended sweep (MySQL-doc examples) ---
    ("LENGTH('héllo')", 6),  # BYTES (func_length.cpp strlen), not chars
    ("CHAR_LENGTH('héllo')", 5),
    ("LENGTH(CAST('ab' AS BINARY))", 2),
    ("SUBSTRING('Quadratically', 5)", "ratically"),
    ("SUBSTRING('Sakila', -5, 3)", "aki"),
    ("SUBSTRING('Sakila', 0)", ""),  # pos 0 = before-start sentinel
    ("SUBSTRING_INDEX('www.mysql.com', '.', -2)", "mysql.com"),
    ("TRIM(BOTH 'x' FROM 'xxbarxx')", "bar"),
    ("TRIM(LEADING 'x' FROM 'xxbarxx')", "barxx"),
    ("ELT(2, 'Heja', 'ej')", "ej"),
    ("FIND_IN_SET('b', 'a,b,c,d')", 2),
    ("CONCAT_WS(',', 'a', NULL, 'b')", "a,b"),
    ("REPLACE('www.mysql.com', 'w', 'Ww')", "WwWwWw.mysql.com"),
    ("LOCATE('bar', 'foobarbar', 5)", 7),
    ("LPAD('hi', 1, '??')", "h"),
    ("FORMAT(12332.123456, 4)", "12,332.1235"),
    # --- date/time, round-9 extended sweep ---
    ("LAST_DAY('2003-02-05')", "2003-02-28"),
    ("DAYOFWEEK('2007-02-03')", 7),
    ("WEEKDAY('2008-02-03')", 6),
    ("TIMESTAMPDIFF(MONTH, '2003-02-01', '2003-05-01')", 3),
    ("TIMESTAMPDIFF(YEAR, '2002-05-01', '2001-01-01')", -1),
    ("TIMESTAMPADD(MINUTE, 1, '2003-01-02')", "2003-01-02 00:01:00"),
    ("FROM_UNIXTIME(1447430881)", "2015-11-13 16:08:01"),  # UTC session
    ("UNIX_TIMESTAMP('2015-11-13 10:20:19')", 1447410019),
    ("TIME_FORMAT('19:30:10', '%H %k %h %I %l')", "19 19 07 07 7"),
    ("DATE_FORMAT('2009-10-04 22:23:00', '%W %M %Y')", "Sunday October 2009"),
    ("DATEDIFF('2007-12-31 23:59:59', '2007-12-30')", 1),
    # --- misc (func_inet_aton.cpp incl. the dot_count short forms) ---
    ("INET_ATON('10.0.5.9')", 167773449),
    ("INET_ATON('127.1')", 2130706433),
    ("INET_ATON('127.2.1')", 2130837505),
    ("INET_ATON('1.2.3.999')", None),
    ("INET_NTOA(167773449)", "10.0.5.9"),
    # --- round-9 review batch: period YYMM forms, temporal numeric
    # casts, fractional intervals, format edge tokens ---
    ("PERIOD_ADD(6801, 2)", 206803),          # YY < 70 → 20xx
    ("PERIOD_DIFF(200802, 6703)", -709),      # mixed YYMM/YYYYMM
    ("CAST(DATE '2020-01-01' AS SIGNED)", 20200101),
    ("CAST(TIMESTAMP '2020-01-01 10:20:30' AS SIGNED)", 20200101102030),
    ("CAST(DATE '2020-01-01' AS UNSIGNED)", 20200101),
    ("INSERT('abc', 10, 2, 'xy')", "abc"),    # pos out of range → unchanged
    ("INSERT('abc', 0, 2, 'xy')", "abc"),
    ("INSERT('Quadratic', 3, 100, 'What')", "QuWhat"),
    ("CHAR(65, NULL, 66)", "AB"),             # NULL args skipped
    ("GET_FORMAT(DATE, 'bogus')", None),
    ("CAST('abc' AS CHAR(0))", ""),
    ("DATE_FORMAT('2009-09-01', '%e%d')", "101"),   # adjacent tokens
    ("DATE_FORMAT('2009-09-01 14:30:05', '%H''%i')", "14'30"),
    ("DATE_ADD('2020-01-01', INTERVAL 1.5 DAY)", "2020-01-03"),
    ("DATE_ADD('2020-01-10', INTERVAL -1.4 DAY)", "2020-01-09"),  # signed frac
    ("DATE_ADD('2020-01-01', INTERVAL '1.5' DAY)", "2020-01-03"),  # quoted frac
    ("DATE_ADD('2020-01-01', INTERVAL 15e-1 DAY)", "2020-01-03"),  # e-notation
    ("CAST(NULL > 1 AS SIGNED)", None),  # NULL boolean stays NULL
    # --- multi-char TRIM remstr (full-string occurrences, not a char
    # set) and negative pad lengths ---
    ("TRIM(TRAILING 'xyz' FROM 'barxxyz')", "barx"),
    ("TRIM(LEADING 'ab' FROM 'ababfoo')", "foo"),
    ("TRIM(BOTH 'ab' FROM 'abfooab')", "foo"),
    ("TRIM(TRAILING '.*' FROM 'v1.*.*')", "v1"),  # regex metachars
    ("TRIM(BOTH 'x' FROM 'xxbarxx')", "bar"),
    ("LPAD('hi', -1, '?')", None),
    ("RPAD('hi', -1, '?')", None),
    ("LPAD('hi', 4, '??')", "??hi"),
    ("SUBSTRING_INDEX('www.mysql.com', '.', -2)", "mysql.com"),
    ("STRCMP('text', 'text2')", -1),
    ("ELT(4, 'a', 'b')", None),
    # --- NULL-condition CASE, integer SIGN, null-safe compare ---
    ("CASE WHEN NULL THEN 'a' ELSE 'b' END", "b"),   # bare NULL is falsy
    ("CASE 1 WHEN NULL THEN 'a' ELSE 'b' END", "b"),  # value form untouched
    ("SIGN(-32)", -1),
    ("NULL <=> NULL", 1),
    ("5 DIV 0", None),
    ("LAST_DAY('2004-02-05')", "2004-02-29"),
    ("TIMESTAMPDIFF(YEAR, '2002-05-01', '2001-01-01')", -1),
    # --- TIMEDIFF over TIME and DATETIME operands, TIME() extraction,
    # EXTRACT(MICROSECOND) ---
    ("TIMEDIFF('08:59:40', '07:00:10')", "01:59:30"),
    ("TIMEDIFF('2000-01-01 00:00:00', '2000-01-01 00:00:00.000001')",
     "-00:00:00.000001"),
    ("TIMEDIFF(NULL, '07:00:10')", None),
    ("TIME('2003-12-31 01:02:03')", "01:02:03"),
    ("TIME('8:3:2')", "08:03:02"),
    ("EXTRACT(MICROSECOND FROM '2003-01-02 10:30:00.000123')", 123),
    # --- round-10 fixes: the r09 judge battery's failures retired as
    # regression pins (VERDICT r09 "Next round" #2-#7) ---
    # the reference registers atan AND atan2 to one functor and
    # dispatches on arity (funcexp.cpp:78-79, func_math.cpp:294-300)
    ("ATAN(-2, 2)", -0.7853981633974483),
    ("ATAN2(-2, 2)", -0.7853981633974483),
    ("ATAN(2)", 1.1071487177940904),
    # out-of-domain math is NULL, never NaN (func_math.cpp:969-972)
    ("SQRT(-1)", None),
    ("SQRT(20.25)", 4.5),
    ("ASIN(2)", None),
    ("ACOS(-1.1)", None),
    ("ACOS(1)", 0.0),
    # string→integer CAST is a PREFIX parse (atoll func_cast.cpp:144,
    # strtoul :253): garbage → 0, numeric prefix parses, never NULL
    # for a non-NULL string
    ("CAST('abc' AS SIGNED)", 0),
    ("CAST('12abc' AS SIGNED)", 12),
    ("CAST('-12.7xyz' AS SIGNED)", -12),
    ("CAST('abc' AS UNSIGNED)", 0),
    ("CAST('' AS SIGNED)", 0),
    ("CAST('18446744073709551615abc' AS UNSIGNED)", 18446744073709551615),
    # STR_TO_DATE's lenient format scan (func_str_to_date.cpp):
    # non-padded numeric fields, month names, whitespace after
    # delimiters; date-only formats return DATE (see TYPED_PROBES)
    ("STR_TO_DATE('01,5,2013','%d,%m,%Y')", "2013-05-01"),
    ("STR_TO_DATE('May 1, 2013','%M %d,%Y')", "2013-05-01"),
    ("STR_TO_DATE('1 May 2013','%e %M %Y')", "2013-05-01"),
    ("STR_TO_DATE('20130501','%Y%m%d')", "2013-05-01"),
    ("STR_TO_DATE('2013-05-01 12:30:45','%Y-%m-%d %H:%i:%s')",
     "2013-05-01 12:30:45"),
    ("STR_TO_DATE('nonsense','%d,%m,%Y')", None),
    # TIME_FORMAT over a TIME VALUE: >24 h hours render in full
    # (func_time_format.cpp); %h/%I/%l are mod-12 with 0 → 12
    ("TIME_FORMAT('100:00:00','%H %k %h %I %l')", "100 100 04 04 4"),
    ("TIME_FORMAT('25:30:10','%T')", "25:30:10"),
    ("TIME_FORMAT('00:30:00','%h %p')", "12 AM"),
    # date-only strings convert to DATETIME first
    # (func_unix_timestamp.cpp), not NULL under a datetime pattern
    ("UNIX_TIMESTAMP('1970-01-02')", 86400),
    # TIMEDIFF with MIXED operand classes is NULL (func_timediff.cpp);
    # results clamp to MySQL's TIME range ±838:59:59.999999
    ("TIMEDIFF('2000-01-01 00:00:00', '01:00:00')", None),
    ("TIMEDIFF('01:00:00', '2000-01-01 00:00:00')", None),
    ("TIMEDIFF('2008-12-31 23:59:59.000001', '2008-01-01 00:00:00')",
     "838:59:59.999999"),
    ("TIMEDIFF('2008-01-01 00:00:00', '2008-12-31 23:59:59.000001')",
     "-838:59:59.999999"),
    # searched-CASE numeric truthiness (nonzero = true); value-form
    # CASE keeps the literal as a comparison operand
    ("CASE WHEN 1 THEN 'a' ELSE 'b' END", "a"),
    ("CASE WHEN 0 THEN 'a' ELSE 'b' END", "b"),
    ("CASE WHEN -1 THEN 'a' ELSE 'b' END", "a"),
    ("CASE 0 WHEN 0 THEN 'a' ELSE 'b' END", "a"),
    # r10 review pins: trailing lone '%' must not hang translation;
    # '%%' escapes must not leak the next literal into the token gate;
    # literal-only formats still take the TIME path; datetime operands
    # keep their microseconds; TIMEDIFF's clamp follows the operands'
    # second resolution (838:59:59 plain, .999999 with micros)
    ("TIME_FORMAT('10:20:30', '%H%')", "10%"),
    ("TIME_FORMAT('100:00:00', '%k%%Y')", "100%Y"),
    ("TIME_FORMAT('25:30:10', 'abc')", "abc"),
    ("TIME_FORMAT('2003-12-31 01:02:03.000123', '%H:%i:%s.%f')",
     "01:02:03.000123"),
    ("TIME_FORMAT('10:20:30.000123', '%f')", "000123"),
    ("TIMEDIFF('500:00:00', '-500:00:00')", "838:59:59"),
    ("TIMEDIFF('-500:00:00', '500:00:00')", "-838:59:59"),
    # HOUR/MINUTE/SECOND over TIME VALUES (func_hour.cpp — the MySQL
    # doc example HOUR('272:59:59') = 272); a timestamp cast NULLed
    # every >24 h TIME.  Negatives read their magnitude.
    ("HOUR('272:59:59')", 272),
    ("MINUTE('272:59:59')", 59),
    ("SECOND('272:59:58')", 58),
    ("HOUR('-26:10:05')", 26),
    ("HOUR('2007-02-03 13:02:03')", 13),
    ("SECOND(130)", 30),
    ("HOUR('abc')", None),
    # r10 edge battery, verified exact: negative/zero string lengths,
    # REPEAT counts, SPACE, ASCII('')
    ("LEFT('foobar', -1)", ""),
    ("RIGHT('foobar', -1)", ""),
    ("REPEAT('ab', -1)", ""),
    ("SUBSTRING('foobar', 2, -1)", ""),
    ("SPACE(3)", "   "),
    ("ASCII('')", 0),
    ("MD5('testing')", "ae2b1fca515949e5d54fb22b8ed95575"),
    ("SHA1('abc')", "a9993e364706816aba3e25717850c26c9cd0d89d"),
]

#: probes whose MySQL-exact form is deliberately deferred —
#: documented divergences, not silent wrong values.  The round-8
#: verdict's one deferred probe (DATE_ADD date-string render) was FIXED
#: and moved into PROBES; the round-11 BIT_* empty-group defers were
#: FIXED by the uint64 bit-aggregate rewrite (init values per
#: rowaggregation.cpp — see test_bit_aggregates_uint64) and promoted
#: below.  Currently empty.
XFAIL_PROBES: list[tuple[str, object]] = []

#: promoted from XFAIL_PROBES when the bit-aggregate rewrite landed
PROBES.append(
    ("(SELECT BIT_AND(x) FROM (SELECT 1 AS x WHERE FALSE))",
     18446744073709551615)
)
PROBES.append(
    ("(SELECT BIT_OR(x) FROM (SELECT 1 AS x WHERE FALSE))", 0)
)


def _check(spark, expr: str, expected) -> None:
    got = spark.sql(translate_mysql(f"SELECT {expr} AS v")).collect()[0].v
    if expected is None:
        assert got is None, f"{expr}: got {got!r}, MySQL gives NULL"
        return
    assert got is not None, f"{expr}: got NULL, MySQL gives {expected!r}"
    if isinstance(expected, (int, float)) and not isinstance(expected, bool):
        assert not (isinstance(got, float) and math.isnan(got)), expr
        assert float(got) == float(expected), f"{expr}: got {got!r}"
    else:
        assert str(got) == str(expected), f"{expr}: got {got!r}"


@pytest.mark.parametrize("expr,expected", PROBES, ids=[p[0][:50] for p in PROBES])
def test_mysql_probe(spark, expr, expected):
    _check(spark, expr, expected)


@pytest.mark.parametrize(
    "expr,expected", XFAIL_PROBES, ids=[p[0][:50] for p in XFAIL_PROBES]
)
@pytest.mark.xfail(reason="documented render-level divergence")
def test_mysql_probe_deferred(spark, expr, expected):
    _check(spark, expr, expected)


#: (expression, (rendered value, Spark result type)) — DATE_ADD's
#: date-ness/zonelessness matrix (func_date_add.cpp): string-date +
#: date-only unit stays DATE; any time-bearing unit or datetime string
#: promotes to zoneless DATETIME (TIMESTAMP_NTZ — never the tz-aware
#: TIMESTAMP Spark returns for DATE + sub-day intervals).
TYPED_PROBES = [
    ("DATE_ADD('2020-01-01', INTERVAL '1 2:30' DAY_MINUTE)",
     ("2020-01-02 02:30:00", "timestamp_ntz")),
    ("DATE_ADD('2020-01-01', INTERVAL '2' DAY)", ("2020-01-03", "date")),
    ("DATE_ADD('2020-01-31', INTERVAL 1 MONTH)", ("2020-02-29", "date")),
    ("DATE_ADD('2020-01-01', INTERVAL '1 2' YEAR_MONTH)",
     ("2021-03-01", "date")),
    ("DATE_ADD('2020-01-01', INTERVAL 2 WEEK)", ("2020-01-15", "date")),
    ("DATE_ADD('2020-01-01', INTERVAL 1 QUARTER)", ("2020-04-01", "date")),
    ("DATE_ADD('2020-01-01', INTERVAL 90 MINUTE)",
     ("2020-01-01 01:30:00", "timestamp_ntz")),
    ("DATE_ADD('2020-01-01 10:00:00', INTERVAL 1 DAY)",
     ("2020-01-02 10:00:00", "timestamp_ntz")),
    ("DATE_SUB('2020-03-31', INTERVAL 1 MONTH)", ("2020-02-29", "date")),
    ("ADDDATE('2008-01-02', 31)", ("2008-02-02", "date")),
    ("CAST('2024-01-03 10:30:45' AS DATETIME)",
     ("2024-01-03 10:30:45", "timestamp_ntz")),
    ("STR_TO_DATE('2024-03-01 10:30:00', '%Y-%m-%d %H:%i:%s')",
     ("2024-03-01 10:30:00", "timestamp_ntz")),
    # MySQL types STR_TO_DATE by the format's FIELDS: no time tokens →
    # DATE (func_str_to_date.cpp / r09 verdict "What's missing" #2)
    ("STR_TO_DATE('01,5,2013', '%d,%m,%Y')", ("2013-05-01", "date")),
    ("STR_TO_DATE('May 1, 2013', '%M %d,%Y')", ("2013-05-01", "date")),
]


@pytest.mark.parametrize(
    "expr,expected", TYPED_PROBES, ids=[p[0][:50] for p in TYPED_PROBES]
)
def test_mysql_probe_typed(spark, expr, expected):
    want_val, want_type = expected
    df = spark.sql(translate_mysql(f"SELECT {expr} AS v"))
    got_type = df.schema["v"].dataType.simpleString()
    got_val = str(df.collect()[0].v)
    assert (got_val, got_type) == (want_val, want_type), (
        f"{expr}: got ({got_val!r}, {got_type})"
    )


def test_mysql_probe_packed_time_string():
    """TIME_TO_SEC('130'): MySQL reads a colon-less TIME string as the
    packed form (00:01:30 → 90) — pinned separately because the packed
    read is easy to regress to an epoch-seconds cast."""
    from infinidb_spark.session import get_spark

    spark = get_spark()
    got = spark.sql(
        translate_mysql("SELECT TIME_TO_SEC('130') AS v")
    ).collect()[0].v
    assert got == 90


# ---------------------------------------------------------------------------
# Round-11 battery: the r10 judge's 70-probe MySQL-semantics sweep,
# retired into the suite (VERDICT r10 "Next round" item 7) plus the
# round-11 fixes it motivated.  Families: boolean-context numeric
# truthiness (func_if.cpp:38-72 boolVal), LOG base domain
# (func_math.cpp:585-591), numeric-vs-string comparison prefix
# coercion (func_cast.cpp:144 atoll class), hex/bit literals in
# numeric context, and the function families the judge verified exact
# (ATAN 2-arg, domain-guarded SQRT/ASIN/ACOS, SUBSTRING_INDEX /
# INSERT / LPAD / FIELD / ELT / FIND_IN_SET / STRCMP / LOCATE /
# FORMAT, STR_TO_DATE leniency, TIME_FORMAT >24 h, UNIX_TIMESTAMP
# date-only, HOUR-of-TIME).
# ---------------------------------------------------------------------------

R11_PROBES = [
    # --- boolean-context numeric truthiness (booleans compare as 1/0) ---
    ("IF(2, 'y', 'n')", "y"),
    ("IF(0.1, 1, 0)", 1),
    ("IF(0, 1, 0)", 0),
    ("IF(0.0, 1, 0)", 0),
    ("IF(NULL, 1, 0)", 0),
    ("IF('abc', 1, 0)", 0),
    ("IF('2x', 1, 0)", 1),
    ("IF(-0.5, 1, 0)", 1),
    ("NOT 0.1", 0),
    ("NOT 0", 1),
    ("NOT 2", 0),
    ("1 AND 0.5", 1),
    ("1 AND 0", 0),
    ("0 OR 0.7", 1),
    ("0 OR 0", 0),
    ("CASE WHEN 2 THEN 'a' ELSE 'b' END", "a"),
    ("CASE WHEN 0.0 THEN 'a' ELSE 'b' END", "b"),
    # --- LOG base domain (base <= 0 or == 1 -> NULL, never inf) ---
    ("LOG(1, 100)", None),
    ("LOG(0, 100)", None),
    ("LOG(-2, 100)", None),
    ("LOG(2, 8)", 3),
    ("LOG(2, -8)", None),
    ("LOG(-1)", None),
    ("LN(-2)", None),
    ("LOG(EXP(1))", 1),
    # --- 2-arg ATAN routes to atan2; domain guards NULL not NaN ---
    ("ATAN(1, 1)", 0.7853981633974483),
    ("ATAN(-2, 2)", -0.7853981633974483),
    ("SQRT(-1)", None),
    ("SQRT(4)", 2),
    ("ASIN(2)", None),
    ("ACOS(-2)", None),
    ("ACOS(1)", 0),
    # --- numeric-vs-string comparison prefix coercion (literal fold) ---
    ("0 = 'abc'", 1),
    ("1 = '1a'", 1),
    ("0 <> 'abc'", 0),
    ("2 > '1a'", 1),
    ("'1.5x' < 2", 1),
    ("'-3z' < -1", 1),
    ("1 = '1'", 1),
    ("1 = '1.0'", 1),
    ("0 = ''", 1),
    # --- string literals in arithmetic: DOUBLE numeric-prefix coercion ---
    ("'3x' + 1", 4),
    ("'abc' + 1", 1),
    ("'abc' * 2", 0),
    ("0 = 'abc' * 2", 1),
    ("- 'abc' = 0", 1),
    ("'1.5' + 1", 2.5),
    ("5 DIV '2x'", 2),
    ("'-2.5e1x' + 0", -25),
    ("CONCAT('a', 'b')", "ab"),
    # date-string INTERVAL arithmetic stays DATE math (the arith fold
    # must NOT turn '2020-01-01' into 2020): value checked by prefix
    ("CAST('2020-01-01' + INTERVAL 1 DAY AS CHAR) LIKE '2020-01-02%'", 1),
    # --- hex/bit literals in numeric context (string context keeps binary) ---
    ("CONV(10+'10'+'10'+X'0a',10,10)", "40"),
    ("10 + 0x0a", 20),
    ("0x0a * 2", 20),
    ("0b101 + 1", 6),
    ("HEX(0x41)", "41"),
    # --- string family (judge-verified exact, pinned) ---
    ("SUBSTRING_INDEX('www.mysql.com', '.', 2)", "www.mysql"),
    ("SUBSTRING_INDEX('www.mysql.com', '.', -2)", "mysql.com"),
    ("SUBSTRING_INDEX('www.mysql.com', '.', 0)", ""),
    ("INSERT('Quadratic', 3, 4, 'What')", "QuWhattic"),
    ("INSERT('Quadratic', -1, 4, 'What')", "Quadratic"),
    ("INSERT('Quadratic', 3, 100, 'What')", "QuWhat"),
    ("LPAD('hi', 1, '?')", "h"),
    ("LPAD('hi', 4, '??')", "??hi"),
    ("RPAD('hi', 1, '?')", "h"),
    ("FIELD('Bb', 'Aa', 'Bb', 'Cc', 'Dd', 'Ff')", 2),
    ("FIELD('Gg', 'Aa', 'Bb')", 0),
    ("ELT(1, 'Aa', 'Bb')", "Aa"),
    ("ELT(4, 'Aa', 'Bb')", None),
    ("FIND_IN_SET('b', 'a,b,c,d')", 2),
    ("STRCMP('text', 'text2')", -1),
    ("STRCMP('text2', 'text')", 1),
    ("STRCMP('text', 'text')", 0),
    ("LOCATE('bar', 'foobarbar')", 4),
    ("LOCATE('bar', 'foobarbar', 5)", 7),
    ("LOCATE('xbar', 'foobar')", 0),
    ("FORMAT(12332.123456, 4)", "12,332.1235"),
    ("FORMAT(12332.2, 0)", "12,332"),
    # --- date/time leniency (judge-verified exact, pinned) ---
    ("STR_TO_DATE('May 1, 2013', '%M %d,%Y')", "2013-05-01"),
    ("TIME_FORMAT('100:00:00', '%H %k')", "100 100"),
    ("TIME_FORMAT('10:30:00', '')", ""),
    ("UNIX_TIMESTAMP('2020-01-01')", 1577836800),
    ("HOUR('272:59:59')", 272),
    ("MINUTE('23:59:59')", 59),
    ("SECOND('10:05:03')", 3),
]


@pytest.mark.parametrize(
    "expr,expected", R11_PROBES, ids=[p[0][:50] for p in R11_PROBES]
)
def test_mysql_probe_r11(spark, expr, expected):
    got = spark.sql(translate_mysql(f"SELECT {expr} AS v")).collect()[0].v
    if expected is None:
        assert got is None, f"{expr}: got {got!r}, MySQL gives NULL"
        return
    assert got is not None, f"{expr}: got NULL, MySQL gives {expected!r}"
    if isinstance(got, bool):
        got = int(got)  # MySQL renders boolean results as 1/0
    if isinstance(expected, (int, float)) and not isinstance(expected, bool):
        assert not (isinstance(got, float) and math.isnan(got)), expr
        assert float(got) == float(expected), f"{expr}: got {got!r}"
    else:
        assert str(got) == str(expected), f"{expr}: got {got!r}"


#: Documented divergences from the MySQL 8 manual where the engine
#: deliberately matches the REFERENCE instead (adjudicated NOT bugs by
#: the r10 judge): the reference rounds doubles half-AWAY-from-zero
#: (func_round.cpp:155-158 floor(x+0.5) -> ROUND(25E-1) = 3, manual
#: says 2), and ABS of bigint-min wraps like C llabs.
R11_XFAIL_PROBES: list[tuple[str, object]] = [
    ("ROUND(25E-1)", 2),
    ("ABS(-9223372036854775808)", 9223372036854775808),
]


@pytest.mark.parametrize(
    "expr,expected",
    R11_XFAIL_PROBES,
    ids=[p[0][:50] for p in R11_XFAIL_PROBES],
)
@pytest.mark.xfail(
    reason="engine matches the reference (half-away double rounding / "
    "C-abs wrap), diverging from the MySQL 8 manual by design"
)
def test_mysql_probe_r11_deferred(spark, expr, expected):
    _check(spark, expr, expected)


def test_r11_truthiness_where_clause(spark):
    """Bare numerics / columns in WHERE, HAVING, and join-ON coerce
    through MySQL truthiness instead of failing analysis."""
    probes = [
        ("SELECT v FROM (SELECT 1 AS v) t WHERE 0.1", [1]),
        ("SELECT v FROM (SELECT 1 AS v) t WHERE 0", []),
        ("SELECT v FROM (SELECT 2 AS v) t WHERE v", [2]),
        ("SELECT v FROM (SELECT 0 AS v) t WHERE v", []),
        ("SELECT v FROM (SELECT 2 AS v) t WHERE v AND v - 1", [2]),
        ("SELECT v FROM (SELECT 2 AS v) t WHERE NOT (v - 2)", [2]),
        ("SELECT a.v FROM (SELECT 2 AS v) a JOIN (SELECT 1 AS w) b"
         " ON b.w WHERE a.v > 1", [2]),
        # already-boolean predicates keep their exact shape
        ("SELECT v FROM (SELECT 2 AS v) t"
         " WHERE v IN (1, 2) AND v BETWEEN 1 AND 3", [2]),
    ]
    for sql, want in probes:
        t1 = translate_mysql(sql)
        assert translate_mysql(t1) == t1, f"not idempotent: {sql}"
        got = [r[0] for r in spark.sql(t1).collect()]
        assert got == want, f"{sql}: got {got}"


# --- r11 second-session probes: the post-review fold fixes -----------
# (float()-vs-MySQL-lexer fully-numeric, signed cmp-vs-number symmetry,
# integral fold values rendering as INT literals, unit-named columns)
R11B_PROBES = [
    # Python float() accepts these; MySQL's lexer prefix-parses them
    ("'1_0' + 1", 2),
    ("'nan' + 1", 1),
    ("'inf' * 2", 0),
    ("'Infinity' + 0", 0),
    ("0 = 'nan'", 1),
    ("1 = '1_0'", 1),
    # cmp-vs-number fold must see through a unary sign (both orders)
    ("'abc' = -3 * 2", 0),
    ("-3 * 2 = 'abc'", 0),
    ("'abc' >= -1 * 1", 1),
    # integral fold values emit as INT literals: double rendering
    # ('0.0b') diverged from MySQL's ('0b') in string contexts
    ("CONCAT('a' + 0, 'b')", "0b"),
    ("CONCAT('3x' + 1, '!')", "4!"),
    ("CONCAT('1.5x' + 1, '!')", "2.5!"),
]


@pytest.mark.parametrize(
    "expr,expected", R11B_PROBES, ids=[p[0][:50] for p in R11B_PROBES]
)
def test_mysql_probe_r11b(spark, expr, expected):
    got = spark.sql(translate_mysql(f"SELECT {expr} AS v")).collect()[0].v
    if isinstance(got, bool):
        got = int(got)
    if isinstance(expected, (int, float)) and not isinstance(expected, bool):
        assert float(got) == float(expected), f"{expr}: got {got!r}"
    else:
        assert str(got) == str(expected), f"{expr}: got {got!r}"


def test_r11b_unit_named_columns_still_fold():
    """hour/day/week/... are everyday COLUMN names; the interval guard
    must require an actual `INTERVAL <qty> <unit>` chain, not a unit
    word alone, or string-arith on such columns silently NULLs."""
    assert "hour - 1" in translate_mysql("SELECT hour - '1h' FROM t")
    assert "day + 2" in translate_mysql("SELECT day + '2d' FROM t")


def test_r11b_interval_guard_preserved():
    """Genuine date-INTERVAL arithmetic keeps its string operand —
    folding '2020-01-01' to 2020 would destroy the date math."""
    for sql in (
        "SELECT '2020-01-01' + INTERVAL 1 DAY",
        "SELECT INTERVAL 1 DAY + '2020-01-01'",
        "SELECT INTERVAL -1 DAY + '2020-01-01'",
        "SELECT INTERVAL (1 + 1) DAY + '2020-01-01'",
        "SELECT INTERVAL FLOOR(2.5) HOUR + '2020-01-01 00:00:00'",
    ):
        assert "'2020-01-01" in translate_mysql(sql), sql


def test_r11b_nonfinite_prefix_emits_valid_sql():
    """A '9e999' literal prefix overflows float to inf; repr(inf) is
    not valid SQL — it must clamp to the DBL_MAX literal instead."""
    out = translate_mysql("SELECT '9e999x' + 0 AS v")
    assert "inf" not in out
    assert "1.7976931348623157e308" in out


# --- bitwise operators: uint64 semantics (ref funcexp.cpp:68-72,
# func_bitwise.cpp getUIntValFromParm — every operand through uint64;
# result type BIGINT UNSIGNED).  The naive Spark spelling shifted
# 32-bit literals in 32-bit width (1 << 35 was silently wrong), used
# an arithmetic right shift, and displayed bit-63 results negative.
R11_BITOP_PROBES = [
    ("1 << 2", 4),
    ("1 << 35", 34359738368),
    ("1 << 63", 9223372036854775808),
    ("1 << 64", 0),         # count outside 0-63 -> 0 (MySQL manual)
    ("1 << -1", 0),         # negative count reads as huge unsigned
    ("16 >> 2", 4),
    ("-1 >> 60", 15),       # LOGICAL shift of uint64(-1)
    ("5 & 3", 1),
    ("5 | 3", 7),
    ("5 ^ 3", 6),
    ("-1 | 0", 18446744073709551615),
    ("1 | 2 & 3", 3),       # & binds tighter than |
    ("4 | 2 ^ 3", 5),       # ^ binds tighter than |
    ("1 << 1 + 1", 4),      # + binds tighter than <<
    ("2 * 3 << 2", 24),
    ("1 + 1 << 2 = 8", 1),  # << binds tighter than =
    ("1 << 2 << 2", 16),    # left-assoc
    ("0x0a << 1", 20),      # hex literal is numeric inside bit ops
    ("X'0a' & 0xff", 10),
    ("0b101 | 0", 5),
    ("NULL & 1", None),
    ("1 << NULL", None),
    ("CASE WHEN 1 THEN 2 ELSE 3 END << 1", 4),
]


@pytest.mark.parametrize(
    "expr,expected",
    R11_BITOP_PROBES,
    ids=[p[0][:50] for p in R11_BITOP_PROBES],
)
def test_mysql_probe_bitops(spark, expr, expected):
    sql = translate_mysql(f"SELECT {expr} AS v")
    assert translate_mysql(sql) == sql, f"not idempotent: {expr}"
    got = spark.sql(sql).collect()[0].v
    if expected is None:
        assert got is None, f"{expr}: got {got!r}"
        return
    if isinstance(got, bool):
        got = int(got)
    assert float(got) == float(expected), f"{expr}: got {got!r}"


# '~' unary inversion (uint64; absent from the reference FuncMap —
# supporting it MySQL-exactly is a strict superset) and bit-op
# chaining through the DECIMAL(20,0) unsigned stand-in
R11_BITNOT_PROBES = [
    ("~0", 18446744073709551615),
    ("~~0", 0),
    ("5 & ~1", 4),
    ("~0 >> 60", 15),
    ("~(1 | 2)", 18446744073709551612),
    ("~2.6", 18446744073709551612),     # rounds to 3, then inverts
    ("(1 << 63) << 1", 0),              # chained uint64 wraps, no NULL
    ("(1 << 63) | 1", 9223372036854775809),
    ("0xFFFFFFFFFFFFFFFF & 1", 1),
]


@pytest.mark.parametrize(
    "expr,expected",
    R11_BITNOT_PROBES,
    ids=[p[0][:50] for p in R11_BITNOT_PROBES],
)
def test_mysql_probe_bitnot(spark, expr, expected):
    sql = translate_mysql(f"SELECT {expr} AS v")
    assert translate_mysql(sql) == sql, f"not idempotent: {expr}"
    got = spark.sql(sql).collect()[0].v
    assert float(got) == float(expected), f"{expr}: got {got!r}"


# --- r11 second-session battery: hash/math/date/string families ---
R11C_PROBES = [
    ("MD5('testing')", "ae2b1fca515949e5d54fb22b8ed95575"),
    ("SHA1('abc')", "a9993e364706816aba3e25717850c26c9cd0d89d"),
    ("SHA('abc')", "a9993e364706816aba3e25717850c26c9cd0d89d"),
    ("HEX('abc')", "616263"),
    ("COT(12)", -1.5726734063976893),
    ("LOG2(65536)", 16),
    ("LOG10(100)", 2),
    ("LOG(2, 65536)", 16),
    ("EXP(0)", 1),
    ("POW(2, -2)", 0.25),
    ("SIGN(-32)", -1),
    ("CEILING(-1.23)", -1),
    ("FLOOR(-1.23)", -2),
    ("QUARTER('2008-04-01')", 2),
    ("WEEKOFYEAR('2008-02-20')", 8),
    ("DAYOFYEAR('2007-02-03')", 34),
    ("MID('Quadratically', 5, 6)", "ratica"),
    ("UCASE('hej')", "HEJ"),
    ("LCASE('HEJ')", "hej"),
    ("TRIM('  bar   ')", "bar"),
    ("INSTR('foobarbar', 'bar')", 4),
]


@pytest.mark.parametrize(
    "expr,expected", R11C_PROBES, ids=[p[0][:50] for p in R11C_PROBES]
)
def test_mysql_probe_r11c(spark, expr, expected):
    got = spark.sql(translate_mysql(f"SELECT {expr} AS v")).collect()[0].v
    if isinstance(got, bool):
        got = int(got)
    if isinstance(expected, str):
        assert str(got) == expected, f"{expr}: got {got!r}"
    else:
        assert abs(float(got) - float(expected)) < 1e-9, f"{expr}: got {got!r}"


def test_unhex_returns_binary_like_mysql():
    """MySQL's UNHEX result type is VARBINARY — bytes, not str, is the
    faithful Python rendering (mysqld only DISPLAYS it as text)."""
    got = (
        _spark_probe_session()
        .sql(translate_mysql("SELECT UNHEX('4D7953514C') AS v"))
        .collect()[0].v
    )
    assert bytes(got) == b"MySQL"


def _spark_probe_session():
    from infinidb_spark.session import get_spark

    return get_spark("probes")


@pytest.mark.xfail(
    reason="engine returns inf like the reference (func_math.cpp "
    "Func_cot: unguarded 1.0/tan(value)); MySQL 8 raises an "
    "out-of-range error instead — reference semantics win by the "
    "standing adjudication (same class as ROUND half-away)"
)
def test_cot_zero_divergence(spark):
    got = spark.sql(translate_mysql("SELECT COT(0) AS v")).collect()[0].v
    assert got is None


def test_bitop_qualified_columns_and_windows(spark):
    """Review findings: the extent scanner must keep qualified
    references whole (t.flags & 4 stranded the 't.' prefix), leave
    window functions untouched rather than swallow the OVER clause,
    translate MySQL constructs INSIDE bit-op operands, and take a
    unary sign into ^'s operand (MySQL's unary minus binds above ^)."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW bt AS"
        " SELECT 5 AS flags, 3 AS n, 2 AS x"
    )
    spark.sql("CREATE OR REPLACE TEMP VIEW bt2 AS SELECT 6 AS flags")
    cases = [
        ("SELECT bt.flags & 4 AS v FROM bt", 4),
        ("SELECT bt.flags | bt2.flags AS v FROM bt, bt2", 7),
        ("SELECT SUM(x) OVER (PARTITION BY n) & 1 AS v FROM bt", 0),
        ("SELECT 2 & CAST(x AS UNSIGNED) AS v FROM bt", 2),
        ("SELECT -1 ^ 2 AS v", 18446744073709551613),
        ("SELECT 1 - 2 ^ 3 AS v", 0),
    ]
    for sql_in, exp in cases:
        sql = translate_mysql(sql_in)
        assert translate_mysql(sql) == sql, f"not idempotent: {sql_in}"
        got = spark.sql(sql).collect()[0].v
        if isinstance(got, bool):
            got = int(got)
        assert float(got) == float(exp), f"{sql_in}: got {got!r}"


def test_interval_expression_quantity_not_folded():
    """INTERVAL <expr> DAY + '<date>' must keep the date string — the
    unit-chain guard walks back over expression quantities (1+1, t.n,
    FLOOR(...)), not just single literals."""
    for q in ("1+1", "t.n", "FLOOR(2.5)", "(1+1)*2"):
        out = translate_mysql(f"SELECT INTERVAL {q} DAY + '2020-06-01'")
        assert "'2020-06-01'" in out, (q, out)


def test_json_arrow_ops_not_right_shift():
    """doc->>'$.a' lexes as one token, never as '-' + '>>' (a right
    shift): the translation must not emit a shift fragment."""
    out = translate_mysql("SELECT doc->>'$.name' AS v FROM t")
    assert "shiftrightunsigned" not in out
    out2 = translate_mysql("SELECT doc->>'$.a' & 1 AS v FROM t")
    assert "doc->>'$.a'" in out2


def test_registry_bitops_chain_through_unsigned(spark):
    """Chained registry bit functions must wrap a DECIMAL(20,0)
    intermediate above 2^63 back to its bit pattern, not NULL it."""
    from pyspark.sql import functions as F

    from infinidb_spark.functions.registry import func

    def one(c):
        return spark.range(1).select(c.alias("v")).collect()[0].v

    assert one(func("bitand", func("bitnot", F.lit(0)), F.lit(1))) == 1
    assert one(
        func("leftshift", func("leftshift", F.lit(1), 63), 1)
    ) == 0
    assert one(func("bitnot", F.lit(2.6))) == 18446744073709551612


def test_bit_aggregates_uint64(spark):
    """BIT_AND/BIT_OR/BIT_XOR aggregates are uint64 with the
    reference's INIT values on empty/all-NULL groups (rowaggregation
    .cpp: BIT_AND inits 0xFFFF…, OR/XOR 0 — never NULL) and unsigned
    display; Spark's natives NULL on empty and render signed."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW bav AS"
        " SELECT * FROM VALUES (5),(3),(-1) AS t(v)"
    )
    spark.sql("CREATE OR REPLACE TEMP VIEW bae AS SELECT v FROM bav WHERE v > 99")
    cases = [
        ("SELECT BIT_AND(v) AS r FROM bav", 1),
        ("SELECT BIT_OR(v) AS r FROM bav", 18446744073709551615),
        ("SELECT BIT_XOR(v) AS r FROM bav", 18446744073709551609),
        ("SELECT BIT_AND(v) AS r FROM bae", 18446744073709551615),
        ("SELECT BIT_OR(v) AS r FROM bae", 0),
        ("SELECT BIT_XOR(v) AS r FROM bae", 0),
        ("SELECT BIT_AND(v & 7) AS r FROM bav", 1),
    ]
    for sql_in, exp in cases:
        sql = translate_mysql(sql_in)
        assert translate_mysql(sql) == sql, f"not idempotent: {sql_in}"
        got = spark.sql(sql).collect()[0].r
        assert float(got) == float(exp), f"{sql_in}: got {got!r}"


def test_stats_aggregates_population_default(spark):
    """MySQL's STD/STDDEV/VARIANCE are POPULATION statistics (the SQL
    standard's sample variants are the _SAMP spellings) — pinned
    because Spark's stddev/variance default to SAMPLE."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW sv AS"
        " SELECT * FROM VALUES (1.0),(2.0),(3.0),(4.0) AS t(v)"
    )
    cases = [
        ("STD(v)", 1.118033988749895),
        ("STDDEV(v)", 1.118033988749895),
        ("VARIANCE(v)", 1.25),
        ("STDDEV_SAMP(v)", 1.2909944487358056),
        ("VAR_SAMP(v)", 1.6666666666666667),
    ]
    for expr, exp in cases:
        got = spark.sql(
            translate_mysql(f"SELECT {expr} AS r FROM sv")
        ).collect()[0].r
        assert abs(float(got) - exp) < 1e-9, (expr, got)


def test_soundex_mysql_extended(spark):
    """MySQL's SOUNDEX is the EXTENDED form — 'Q36324', never Spark's
    4-char truncation — and `a SOUNDS LIKE b` compares the fragments
    (mysqld's Item_func_sounds_like; both absent from the reference
    FuncMap, supported here as a MySQL-exact superset)."""
    cases = [
        ("SELECT SOUNDEX('Hello') AS v", "H400"),
        ("SELECT SOUNDEX('Quadratically') AS v", "Q36324"),
        ("SELECT SOUNDEX('123') AS v", ""),
        ("SELECT SOUNDEX(NULL) AS v", None),
        ("SELECT 'Hello' SOUNDS LIKE 'hallo' AS v", True),
        ("SELECT 'Hello' SOUNDS LIKE 'world' AS v", False),
    ]
    for sql_in, exp in cases:
        sql = translate_mysql(sql_in)
        assert translate_mysql(sql) == sql, f"not idempotent: {sql_in}"
        assert spark.sql(sql).collect()[0].v == exp, sql_in

    from infinidb_spark.functions.registry import func
    from pyspark.sql import functions as F

    got = spark.range(1).select(
        func("soundex", F.lit("Quadratically")).alias("v")
    ).collect()[0].v
    assert got == "Q36324"


def test_date_format_token_tail(spark):
    """The remaining DATE_FORMAT token families, verified MySQL-exact:
    week numbers (%U %u %V %v) with their year pairs (%X %x),
    microseconds (%f), 12-hour fields at midnight/noon (%h %I %l %p),
    no-pad month/day (%c %e), 2-digit year (%y), ordinal days (%D)."""
    cases = [
        ("DATE_FORMAT('2020-01-05', '%U %u %V %v %X %x')",
         "01 01 01 01 2020 2020"),
        ("DATE_FORMAT('2020-01-01 10:20:30.123456', '%f')", "123456"),
        ("DATE_FORMAT('2020-01-01 00:30:00', '%h %I %l %p')", "12 12 12 AM"),
        ("DATE_FORMAT('2020-01-01 12:30:00', '%h %l %p')", "12 12 PM"),
        ("DATE_FORMAT('2006-06-03', '%c %e %y')", "6 3 06"),
        ("DATE_FORMAT('2006-06-01', '%D')", "1st"),
        ("DATE_FORMAT('2006-06-02', '%D')", "2nd"),
        ("DATE_FORMAT('2006-06-03', '%D')", "3rd"),
        ("DATE_FORMAT('2006-06-11', '%D')", "11th"),
        ("DATE_FORMAT('2006-06-21', '%D')", "21st"),
        ("DATE_FORMAT('2006-06-22', '%D')", "22nd"),
    ]
    for expr, exp in cases:
        got = spark.sql(
            translate_mysql(f"SELECT {expr} AS v")
        ).collect()[0].v
        assert str(got) == exp, (expr, got)
