"""The function registry — name-for-name parity with the reference's
``fFuncMap`` (``utils/funcexp/funcexp.cpp:68-207``).

Every entry is a builder returning a Catalyst ``Column`` (JVM-side,
codegen-friendly; zero Python UDFs).  Grouping below follows the
reference's source layout (``func_math.cpp``, ``func_str.cpp`` family,
``func_date*.cpp``, control/null functions, casts, misc).

MySQL semantics notes implemented here:

* ``TO_DAYS``/``FROM_DAYS`` — days since year 0; epoch offset 719528
  (= TO_DAYS('1970-01-01')), ref ``func_to_days.cpp``/``func_from_days.cpp``.
* ``WEEKDAY`` — Monday=0..Sunday=6 (ref ``func_weekday.cpp``), vs
  Spark ``dayofweek`` Sunday=1.
* ``WEEK(d)`` default mode 0 — Sunday-start, days before the first
  Sunday are week 0 (ref ``func_week.cpp``); composed from dayofyear /
  dayofweek arithmetic.
* ``PERIOD_ADD/PERIOD_DIFF`` — YYYYMM month arithmetic
  (ref ``func_period_add.cpp``).
* ``INET_ATON/INET_NTOA`` — pure bit math (ref ``func_inet_aton.cpp``).
* numeric ``TRUNCATE(x, d)`` — toward zero (ref ``func_truncate.cpp``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from infinidb_spark.functions import intervals as _iv
from infinidb_spark.functions.mysql_format import (
    MYSQL_PARSE_INPUT_NORM,
    MYSQL_TIME_FORMAT_TOKENS,
    mysql_datetime_format_to_spark,
    mysql_datetime_format_to_spark_chunks,
    mysql_format_has_time,
    mysql_format_tokens,
    mysql_parse_format_to_spark,
)

FUNC_MAP: dict[str, Callable[..., Column]] = {}


def _reg(*names: str) -> Callable[[Callable[..., Column]], Callable[..., Column]]:
    def deco(fn: Callable[..., Column]) -> Callable[..., Column]:
        for n in names:
            FUNC_MAP[n] = fn
        return fn

    return deco


def func(name: str, *args, **kw) -> Column:
    """Dynamic dispatch by MySQL function name (case-insensitive)."""
    return FUNC_MAP[name.lower()](*args, **kw)


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# ---------------------------------------------------------------------------
# Math — ref func_math.cpp, func_abs/ceil/exp/pow/mod/round/sign/
# truncate/conv/crc32.cpp  (funcexp.cpp:68-110)
# ---------------------------------------------------------------------------

for _n, _f in {
    "abs": F.abs,
    "cos": F.cos, "cot": F.cot, "degrees": F.degrees, "exp": F.exp,
    "floor": F.floor, "ln": F.log, "log2": F.log2, "log10": F.log10,
    "radians": F.radians, "sin": F.sin,
    "tan": F.tan, "ceil": F.ceil, "ceiling": F.ceil, "crc32": F.crc32,
    "hex": F.hex, "unhex": F.unhex, "rand": F.rand,
}.items():
    FUNC_MAP[_n] = _f


@_reg("sqrt")
def sqrt_(x) -> Column:
    # MySQL and the reference return NULL for a negative operand
    # (func_math.cpp:969-972 `if (isNull || value < 0) isNull = true`);
    # bare F.sqrt returns NaN, which silently poisons aggregates.
    # when() without otherwise → NULL for negatives AND NULL input.
    v = _c(x)
    return F.when(v >= 0, F.sqrt(v))


@_reg("asin")
def asin_(x) -> Column:
    # out-of-domain |x| > 1 is NULL in MySQL/reference, NaN in Spark
    v = _c(x)
    return F.when((v >= -1) & (v <= 1), F.asin(v))


@_reg("acos")
def acos_(x) -> Column:
    v = _c(x)
    return F.when((v >= -1) & (v <= 1), F.acos(v))


@_reg("atan")
def atan_(y, x=None) -> Column:
    # the reference registers atan AND atan2 to the same functor and
    # dispatches on parm.size() (funcexp.cpp:78-79, func_math.cpp:
    # 294-300): ATAN(y, x) is ATAN2(y, x)
    return F.atan(_c(y)) if x is None else F.atan2(_c(y), _c(x))


@_reg("sign")
def sign_(x) -> Column:
    # MySQL SIGN returns an INTEGER -1/0/1 (func_sign.cpp); Spark's
    # sign/signum is a double
    return F.sign(_c(x)).cast("bigint")


@_reg("atan2")
def atan2(y, x) -> Column:
    return F.atan2(_c(y), _c(x))


@_reg("log")
def log(a, b=None) -> Column:
    # MySQL LOG(x) = ln(x); LOG(b, x) = log_b(x).  Base domain: b <= 0
    # or b == 1 → NULL (ref func_math.cpp:585-591) — Spark's ln(x)/ln(1)
    # otherwise yields ±inf, the NaN-class aggregate poison the SQRT/
    # ASIN/ACOS guards already eliminate.
    if b is None:
        return F.log(_c(a))
    # call_function: F.log() only takes a python-float base, and the
    # SQL Logarithm expression keeps bit-exact parity with the dialect
    # path's emitted log(base, x)
    base = _c(a)
    return F.when(
        (base > 0) & (base != 1), F.call_function("log", base, _c(b))
    )


@_reg("mod")
def mod(a, b) -> Column:
    return _c(a) % _c(b)


@_reg("pow", "power")
def power(a, b) -> Column:
    return F.pow(_c(a), _c(b))


@_reg("round")
def round_(x, d=0) -> Column:
    return F.round(_c(x), d)


@_reg("truncate")
def truncate(x, d=0) -> Column:
    # MySQL TRUNCATE: toward zero at d decimal places.  The scale is an
    # INTEGER literal (10**d), not pow(10.0, d): double multiplication
    # corrupted exactly-representable decimals (0.29 * 100 = 28.999…
    # floored to 0.28), and signum() returns double, which would force
    # the whole expression out of decimal arithmetic.
    x = _c(x)
    if d >= 0:
        e = F.lit(10 ** d)
        mag = F.floor(F.abs(x) * e) / e
    else:
        e = F.lit(10 ** (-d))
        mag = F.floor(F.abs(x) / e) * e
    return F.when(x < 0, -mag).otherwise(mag)


@_reg("conv")
def conv(n, from_base, to_base) -> Column:
    return F.conv(_c(n), from_base, to_base)


@_reg("format")
def format_(x, d) -> Column:
    # MySQL FORMAT(x, d): thousands separators + d decimals.
    return F.format_number(_c(x), d)


# MySQL bit operators work on BIGINT UNSIGNED (ref func_bitwise.cpp
# getUIntValFromParm: every operand through uint64).  Three divergences
# this closes vs the naive Spark spelling: 32-bit literals shifted in
# 32-bit width (1 << 35 was silently wrong), arithmetic >> instead of
# logical (uint64(-1) >> 60 must be 15, not -1), and signed display
# (1 << 63 renders 9223372036854775808, not a negative).  Results carry
# the engine's BIGINT-UNSIGNED stand-in, DECIMAL(20,0) — the same type
# CAST(x AS UNSIGNED) produces.
_TWO_64 = "18446744073709551616"


def _unsigned_render(c: Column) -> Column:
    """int64 bit pattern → its uint64 value as DECIMAL(20,0)."""
    return F.when(
        c < 0, (c.cast("decimal(21,0)") + F.expr(_TWO_64)).cast("decimal(20,0)")
    ).otherwise(c.cast("decimal(20,0)"))


def _in64(x) -> Column:
    """Operand → its int64 BIT PATTERN, through DECIMAL(38,0) with the
    (2^63, 2^64-1] wrap: a chained bit function's own DECIMAL(20,0)
    result (or a uint64-sized value) must wrap, not NULL in a plain
    long cast — func('bitand', func('bitnot', lit(0)), lit(1)) is 1.
    The decimal cast also rounds doubles to nearest like the
    reference's getIntVal (2.6 → 3, not a truncated 2)."""
    d = _c(x).cast("decimal(38,0)")
    return F.when(
        (d > F.expr("9223372036854775807")) & (d <= F.expr(_UMAX_64)),
        (d - F.expr(_TWO_64)).cast("long"),
    ).otherwise(d.cast("long"))


_UMAX_64 = "18446744073709551615"


def _shift_count(n) -> Column:
    """MySQL reads the count as uint64 too: negative (= huge unsigned)
    or > 63 shifts the value out entirely → 0 (manual: 'If the shift
    count is outside 0-63, the result is 0')."""
    return _in64(n)


@_reg("bitand")
def bitand(a, b) -> Column:
    return _unsigned_render(_in64(a).bitwiseAND(_in64(b)))


@_reg("bitor")
def bitor(a, b) -> Column:
    return _unsigned_render(_in64(a).bitwiseOR(_in64(b)))


@_reg("bitxor")
def bitxor(a, b) -> Column:
    return _unsigned_render(_in64(a).bitwiseXOR(_in64(b)))


@_reg("bitnot")
def bitnot(a) -> Column:
    # '~' is absent from the reference FuncMap (it errors there); this
    # MySQL-exact uint64 inversion is a strict superset
    return _unsigned_render(F.bitwise_not(_in64(a)))


@_reg("leftshift")
def leftshift(a, n) -> Column:
    cnt = _shift_count(n)
    val = _in64(a)
    return (
        F.when(cnt.isNull() | val.isNull(), F.lit(None).cast("decimal(20,0)"))
        .when((cnt < 0) | (cnt > 63), F.lit(0).cast("decimal(20,0)"))
        # call_function: F.shiftleft only takes a Python-int count
        .otherwise(_unsigned_render(
            F.call_function("shiftleft", val, cnt.cast("int"))
        ))
    )


@_reg("rightshift")
def rightshift(a, n) -> Column:
    cnt = _shift_count(n)
    val = _in64(a)
    return (
        F.when(cnt.isNull() | val.isNull(), F.lit(None).cast("decimal(20,0)"))
        .when((cnt < 0) | (cnt > 63), F.lit(0).cast("decimal(20,0)"))
        # shiftrightunsigned = LOGICAL shift — the uint64 semantics
        .otherwise(_unsigned_render(
            F.call_function("shiftrightunsigned", val, cnt.cast("int"))
        ))
    )


# ---------------------------------------------------------------------------
# String — ref func_concat/substr/trim/... (funcexp.cpp:111-160)
# ---------------------------------------------------------------------------

for _n, _f in {
    # LENGTH is BYTES in MySQL and the reference (func_length.cpp uses
    # strlen) — octet_length, not the char-counting F.length
    "ascii": F.ascii, "char_length": F.char_length, "length": F.octet_length,
    "lcase": F.lower, "lower": F.lower, "ucase": F.upper, "upper": F.upper,
    "ltrim": F.ltrim, "rtrim": F.rtrim, "trim": F.trim, "md5": F.md5,
    "reverse": F.reverse, "sha": F.sha1, "sha1": F.sha1,
    "bin": F.bin,
}.items():
    FUNC_MAP[_n] = _f


@_reg("soundex")
def soundex(s) -> Column:
    """MySQL's EXTENDED soundex (SOUNDEX('Quadratically') = 'Q36324',
    not Spark's 4-char truncation 'Q363'): letters only, standard
    digit map, adjacent-code collapse BEFORE vowel removal, first
    letter kept, right-padded with '0' to at least 4 — never
    truncated.  Absent from the reference FuncMap (it errors); this is
    a MySQL-exact superset shared with the dialect's SOUNDEX/SOUNDS
    LIKE fragments."""
    c = F.regexp_replace(F.upper(_c(s)), "[^A-Z]", "")
    d = F.translate(
        c, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"
    )
    collapsed = F.regexp_replace(d, r"(.)\1+", "$1")
    rest = F.regexp_replace(
        F.substring(collapsed, 2, 2147483647), "0", ""
    )
    core = F.concat(F.substring(c, 1, 1), rest)
    padded = F.concat(
        core,
        F.call_function(
            "repeat", F.lit("0"), (F.lit(4) - F.char_length(core)).cast("int")
        ),
    )
    return F.when(c == "", F.lit("")).otherwise(padded)


@_reg("concat")
def concat(*args) -> Column:
    return F.concat(*[_c(a) for a in args])


@_reg("concat_ws")
def concat_ws(sep, *args) -> Column:
    return F.concat_ws(sep, *[_c(a) for a in args])


@_reg("char")
def char_(*args) -> Column:
    # MySQL CHAR(65,66) -> 'AB'; NULL arguments are SKIPPED
    # (CHAR(65,NULL,66) -> 'AB'), where concat would propagate them
    return F.concat(*[F.coalesce(F.chr(_c(a)), F.lit("")) for a in args])


@_reg("elt")
def elt(n, *args) -> Column:
    return F.elt(_c(n), *[_c(a) for a in args])


@_reg("find_in_set")
def find_in_set(x, s) -> Column:
    return F.call_function("find_in_set", _c(x), _c(s))


@_reg("field")
def field(x, *vals) -> Column:
    # bonus beyond the reference FuncMap (it lacks FIELD): MySQL
    # FIELD(x, a, b, ...) = 1-based index of x, 0 when absent or NULL.
    # String comparison is CASE-INSENSITIVE (MySQL's default ci
    # collation — the typical enum-ordering use case); the upper()
    # normalization coerces numerics through their string render, so
    # FIELD(2, 1.0, 2.0) diverges ('2' vs '2.0') — numeric callers
    # should pass consistently-typed literals.
    arr = F.array(*[F.upper(_c(v).cast("string")) for v in vals])
    return F.coalesce(
        F.array_position(arr, F.upper(_c(x).cast("string"))),
        F.lit(0).cast("bigint"),
    )


@_reg("insert")
def insert(s, pos, length, repl) -> Column:
    # MySQL INSERT(str, pos, len, newstr) (func_insert.cpp): OVERLAY,
    # except a pos outside 1..CHAR_LENGTH(str) returns str UNCHANGED
    # (overlay splices anyway: pos=10 on 'abc' appended, pos=0
    # prepended), and a negative len replaces through the END of the
    # string (overlay reads -1 as "length of newstr").
    sc, pc, lc = _c(s), _c(pos), _c(length)
    eff_len = F.when(lc < 0, F.lit(2147483647)).otherwise(lc)
    return F.when(
        (pc < 1) | (pc > F.length(sc)), sc
    ).otherwise(F.overlay(sc, _c(repl), pc, eff_len))


@_reg("instr")
def instr(s, sub) -> Column:
    return F.instr(_c(s), sub)


@_reg("locate", "position")
def locate(sub, s, pos=1) -> Column:
    return F.locate(sub, _c(s), pos)


@_reg("left")
def left(s, n) -> Column:
    return F.substring(_c(s), 1, n)


@_reg("right")
def right(s, n) -> Column:
    return F.substring(_c(s), -n, n)


@_reg("lpad")
def lpad(s, n, pad=" ") -> Column:
    # MySQL: a NEGATIVE target length is NULL (func_lpad.cpp); Spark
    # clamps it to ''
    nn = _c(n)
    return F.when(nn < 0, F.lit(None).cast("string")).otherwise(
        F.lpad(_c(s), nn, pad)
    )


@_reg("rpad")
def rpad(s, n, pad=" ") -> Column:
    nn = _c(n)
    return F.when(nn < 0, F.lit(None).cast("string")).otherwise(
        F.rpad(_c(s), nn, pad)
    )


@_reg("mid", "substr", "substring")
def substr(s, pos, length=None) -> Column:
    # MySQL SUBSTRING(str, 0[, len]) is defined as the EMPTY string
    # (position 0 is the before-start sentinel); Spark treats 0 like 1
    s = _c(s)
    p = _c(pos) if isinstance(pos, Column) else F.lit(pos)
    out = (
        F.substring(s, pos, length)
        if length is not None
        else s.substr(p, F.length(s))
    )
    return F.when(p == 0, F.lit("")).otherwise(out)


@_reg("repeat")
def repeat(s, n) -> Column:
    return F.repeat(_c(s), n)


@_reg("replace")
def replace(s, search, repl) -> Column:
    return F.replace(_c(s), _c(search), _c(repl))


@_reg("strcmp")
def strcmp(a, b) -> Column:
    a, b = _c(a), _c(b)
    return F.when(a < b, -1).when(a > b, 1).when(a == b, 0)


@_reg("substring_index")
def substring_index(s, delim, count) -> Column:
    return F.substring_index(_c(s), delim, count)


@_reg("regexp", "rlike")
def regexp(s, pattern) -> Column:
    return _c(s).rlike(pattern) if isinstance(pattern, str) else F.rlike(_c(s), pattern)


@_reg("like")
def like(s, pattern) -> Column:
    return _c(s).like(pattern)


# ---------------------------------------------------------------------------
# Date / time — ref func_date*.cpp etc. (funcexp.cpp:161-207)
# ---------------------------------------------------------------------------

_MYSQL_EPOCH_TO_DAYS = 719528  # TO_DAYS('1970-01-01'), ref func_to_days.cpp

for _n, _f in {
    "day": F.dayofmonth, "dayofmonth": F.dayofmonth, "dayofyear": F.dayofyear,
    "last_day": F.last_day,
    "month": F.month, "quarter": F.quarter,
    "year": F.year, "weekofyear": F.weekofyear,
    "from_unixtime": F.from_unixtime,
}.items():
    FUNC_MAP[_n] = _f


def _time_field(c, field: str) -> Column:
    """HOUR/MINUTE/SECOND over the full MySQL operand class (ref
    func_hour/minute/second.cpp): a TIME VALUE keeps its full hour
    count — HOUR('272:59:59') = 272 (MySQL doc example) where a
    timestamp cast NULLed every >24 h TIME — and negatives read their
    magnitude; datetime-looking input takes its time-of-day field."""
    v = _c(c)
    sv = F.trim(v.try_cast("string"))
    ts = sv.try_cast("timestamp")
    looks_dt = ts.isNotNull() & sv.rlike(
        "^[0-9][0-9][0-9][0-9]-[0-9][0-9]?-[0-9][0-9]?"
    )
    a = F.abs(_time_value_secs(v))
    tval = {
        "hour": F.floor(a / 3600),
        "minute": F.floor((a % 3600) / 60),
        "second": F.floor(a % 60),
    }[field]
    dval = {"hour": F.hour(ts), "minute": F.minute(ts), "second": F.second(ts)}[
        field
    ]
    return F.when(looks_dt, dval).otherwise(tval).cast("int")


@_reg("hour")
def hour_(c) -> Column:
    return _time_field(c, "hour")


@_reg("minute")
def minute_(c) -> Column:
    return _time_field(c, "minute")


@_reg("second")
def second_(c) -> Column:
    return _time_field(c, "second")


@_reg("unix_timestamp")
def unix_timestamp_(c=None, fmt: str | None = None) -> Column:
    # UNIX_TIMESTAMP('1970-01-02') — a date-only STRING — is 86400 in
    # MySQL (func_unix_timestamp.cpp converts the operand to DATETIME
    # first); F.unix_timestamp's default 'yyyy-MM-dd HH:mm:ss' pattern
    # NULLed it.  A timestamp try_cast accepts date-only AND full
    # datetime strings; an explicit caller format keeps the old path.
    if c is None:
        return F.unix_timestamp()
    if fmt is not None:
        return F.unix_timestamp(_c(c), fmt)
    return F.unix_timestamp(_c(c).try_cast("string").try_cast("timestamp"))


@_reg("microsecond")
def microsecond(c) -> Column:
    # pmod, not %: pre-epoch timestamps have negative unix_micros and
    # % follows the dividend's sign (same rule as intervals.py)
    return F.pmod(F.unix_micros(_c(c).cast("timestamp")), F.lit(1000000)).cast("int")


@_reg("dayofweek")
def dayofweek(c) -> Column:
    # MySQL: Sunday=1..Saturday=7 — same as Spark.
    return F.dayofweek(_c(c))


@_reg("weekday")
def weekday(c) -> Column:
    # MySQL: Monday=0..Sunday=6.
    return (F.dayofweek(_c(c)) + 5) % 7


@_reg("dayname")
def dayname(c) -> Column:
    return F.date_format(_c(c), "EEEE")


@_reg("monthname")
def monthname(c) -> Column:
    return F.date_format(_c(c), "MMMM")


def _calc_week(c: Column, mode: int, force_week_year: bool) -> tuple[Column, Column]:
    """MySQL `calc_week` (documented WEEK() behavior, all 8 modes) as
    Column expressions, returning (year, week).  Mode flags — Monday
    first (bit 0), week-of-year 1-53 semantics (bit 1), 'first week has
    the first weekday' vs '≥4 days' rule (bit 2, xor-adjusted exactly
    like MySQL's week_mode()); YEARWEEK forces the week-year flag.
    All flags are Python constants, so each mode compiles to a small
    when-tree (ref parity target: `utils/funcexp/func_week.cpp`)."""
    mode &= 7
    if not (mode & 1):
        mode ^= 4
    monday_first = bool(mode & 1)
    week_year = bool(mode & 2) or force_week_year
    first_weekday = bool(mode & 4)

    cd = c.cast("date")
    y = F.year(cd)
    doy = F.dayofyear(cd)
    jan1 = F.trunc(cd, "year")
    # weekday of Jan 1: 0=Monday if monday_first else 0=Sunday
    wd = ((F.dayofweek(jan1) + 5) % 7) if monday_first else (F.dayofweek(jan1) - 1)
    days_prev = F.dayofyear(F.make_date(y - 1, F.lit(12), F.lit(31)))
    days_cur = F.dayofyear(F.make_date(y, F.lit(12), F.lit(31)))

    def shift(wd_: Column) -> Column:
        return (wd_ != 0) if first_weekday else (wd_ >= 4)

    def roll_cond(wd2: Column) -> Column:
        return (wd2 == 0) if first_weekday else (wd2 < 4)

    in_partial_first = (F.month(cd) == 1) & (F.dayofmonth(cd) <= F.lit(7) - wd)

    # --- previous-year path (date in the partial first week that isn't week 0)
    wd_p = (wd + F.lit(53 * 7) - days_prev) % 7
    days_p = F.when(shift(wd_p), doy - 1 + days_prev - (F.lit(7) - wd_p)).otherwise(
        doy - 1 + days_prev + wd_p
    )
    wd2_p = (wd_p + days_prev) % 7
    roll_p = (days_p >= 52 * 7) & roll_cond(wd2_p)
    week_p = F.when(roll_p, 1).otherwise((days_p / 7).cast("int") + 1)
    year_p = F.when(roll_p, y).otherwise(y - 1)

    # --- normal path
    days_n = F.when(shift(wd), doy - 1 - (F.lit(7) - wd)).otherwise(doy - 1 + wd)
    if week_year:
        wd2 = (wd + days_cur) % 7
        roll_n = (days_n >= 52 * 7) & roll_cond(wd2)
        week_n = F.when(roll_n, 1).otherwise((days_n / 7).cast("int") + 1)
        year_n = F.when(roll_n, y + 1).otherwise(y)
    else:
        week_n = (days_n / 7).cast("int") + 1
        year_n = y

    if week_year:
        week_out = F.when(in_partial_first, week_p).otherwise(week_n)
        year_out = F.when(in_partial_first, year_p).otherwise(year_n)
    else:
        week_out = (
            F.when(in_partial_first & shift(wd), 0)
            .when(in_partial_first, week_p)
            .otherwise(week_n)
        )
        year_out = (
            F.when(in_partial_first & shift(wd), y)
            .when(in_partial_first, year_p)
            .otherwise(year_n)
        )
    return year_out, week_out.cast("int")


@_reg("week")
def week(c, mode: int = 0) -> Column:
    """MySQL WEEK(date, mode) — all 8 modes (`func_week.cpp`)."""
    _, w = _calc_week(_c(c), mode, force_week_year=False)
    return w


@_reg("yearweek")
def yearweek(c, mode: int = 0) -> Column:
    """MySQL YEARWEEK(date, mode): year*100+week with week-year
    semantics forced (weeks never 0; year shifts at boundaries)."""
    yr, w = _calc_week(_c(c), mode, force_week_year=True)
    return (yr * 100 + w).cast("long")


@_reg("to_days")
def to_days(c) -> Column:
    return F.datediff(_c(c).cast("date"), F.lit("1970-01-01").cast("date")) + F.lit(
        _MYSQL_EPOCH_TO_DAYS
    )


@_reg("from_days")
def from_days(n) -> Column:
    return F.date_add(F.lit("1970-01-01").cast("date"), (_c(n) - _MYSQL_EPOCH_TO_DAYS).cast("int"))


@_reg("makedate")
def makedate(y, doy) -> Column:
    # MySQL: NULL for dayofyear <= 0 (the unguarded date_add walked
    # into the previous year)
    d = _c(doy)
    return F.when(
        d >= 1, F.date_add(F.make_date(_c(y), F.lit(1), F.lit(1)), (d - 1).cast("int"))
    )


@_reg("maketime")
def maketime(h, m, s) -> Column:
    # format_string, not lpad: Spark lpad TRUNCATES >2-char fields, so
    # hours >= 100 (MySQL TIME allows up to 838) or a '-1' hour would be
    # silently mangled; minutes/seconds out of [0,60) -> NULL (MySQL).
    # Fractional seconds are PRESERVED (MySQL keeps the argument's
    # fraction, capped at 6 dp), not truncated to the integer second.
    h, m = _c(h).cast("bigint"), _c(m).cast("bigint")
    sd = _c(s).cast("double")
    si = F.floor(sd).cast("bigint")
    # clamp ONLY the rounding boundary: %09.6f rounds, so seconds in
    # [59.9999995, 60) pass the < 60 guard yet would render as the
    # invalid '60'.  A blanket floor(sd*1e6)/1e6 is wrong the other
    # way — double(1.000001)*1e6 = 1000000.999…, floor corrupts it to
    # 1.0 where %09.6f rounds correctly.
    sd6 = F.when(sd >= 59.9999995, F.lit(59.999999)).otherwise(sd)
    sec_txt = F.when(
        sd == si.cast("double"), F.format_string("%02d", si)
    ).otherwise(
        F.regexp_replace(F.format_string("%09.6f", sd6), r"\.?0+$", "")
    )
    body = F.concat(F.format_string("%02d:%02d:", F.abs(h), m), sec_txt)
    # h.isNotNull in the guard: format_string renders a NULL hour as
    # the TEXT 'null' ('null:01:02'); MySQL MAKETIME(NULL, …) is NULL
    return F.when(
        h.isNotNull() & m.between(0, 59) & (sd >= 0) & (sd < 60),
        F.concat(F.when(h < 0, F.lit("-")).otherwise(F.lit("")), body),
    )


def _period_months(p: Column) -> Column:
    """Months since year 0 of a MySQL period.  Periods may be YYMM as
    well as YYYYMM (func_period_add.cpp); 2-digit years resolve 00-69
    → 20xx, 70-99 → 19xx — without this PERIOD_ADD(6801, 2) returned
    6803 where MySQL gives 206803."""
    y = (p / 100).cast("int")
    y = (
        F.when(y < 70, y + 2000)
        .when(y < 100, y + 1900)
        .otherwise(y)
    )
    return y * 12 + (p % 100)


@_reg("period_add")
def period_add(p, n) -> Column:
    months = _period_months(_c(p)) - 1 + _c(n)
    return ((months / 12).cast("int") * 100 + (months % 12) + 1).cast("bigint")


@_reg("period_diff")
def period_diff(p1, p2) -> Column:
    return (_period_months(_c(p1)) - _period_months(_c(p2))).cast("bigint")


@_reg("sec_to_time")
def sec_to_time(s) -> Column:
    # sign applies to the whole value and renders once out front
    # ('-01:00:30' for -3630); format_string because lpad truncates
    # 3-digit hour fields (> 99 h) and negative intermediates.
    # NULL guard: format_string renders NULL args as the text 'null'
    # ('null:null:null'), where MySQL SEC_TO_TIME(NULL) is NULL.
    s = _c(s).cast("bigint")
    a = F.abs(s)
    body = F.format_string(
        "%02d:%02d:%02d",
        (a / 3600).cast("bigint"),
        ((a % 3600) / 60).cast("bigint"),
        a % 60,
    )
    return F.when(
        s.isNotNull(),
        F.concat(F.when(s < 0, F.lit("-")).otherwise(F.lit("")), body),
    )


@_reg("time_to_sec")
def time_to_sec(t) -> Column:
    # _time_value_secs handles the full TIME input class — '[-]H:MM'
    # 2-part strings, packed 1230 numerics, fractional '.5' seconds —
    # where the old 3-way ':'-split crashed under ANSI on 2-part input
    # and raw-cast fractional seconds.  The sign applies to the WHOLE
    # value; fractions are preserved (MySQL returns the decimal).
    return _time_value_secs(_c(t))


@_reg("date_format")
def date_format_mysql(c, fmt: str) -> Column:
    """DATE_FORMAT with MySQL tokens (ref func_date_format.cpp).

    Pattern-translatable tokens go through one ``date_format``; the
    composed tokens (%D %U %u %V %X %w) are built from expressions.
    """
    c = _c(c)
    try:
        return F.date_format(c, mysql_datetime_format_to_spark(fmt))
    except ValueError:
        pass
    # composed path: split on tokens needing expressions
    parts: list[Column] = []
    lit: list[str] = []
    i = 0

    def flush_lit() -> None:
        if lit:
            s = "".join(lit)
            if "%" in s:
                # chunked: adjacent tokens like %e%d must render as
                # separate date_format calls — a merged 'ddd' pattern
                # is one 3-digit field, not '1' then '01'
                parts.extend(
                    F.date_format(c, ch)
                    for ch in mysql_datetime_format_to_spark_chunks(s)
                )
            else:
                parts.append(F.lit(s))
            lit.clear()

    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i + 1]
            if tok in "DUuVvXxw":
                flush_lit()
                if tok == "w":
                    parts.append((F.dayofweek(c) - 1).cast("string"))
                elif tok in "UuVv":
                    # MySQL week tokens map 1:1 onto WEEK() modes
                    # (func_date_format.cpp): %U=0 Sunday-first 00-53,
                    # %u=1 Monday-first 00-53, %V=2 Sunday-first 01-53
                    # (pairs with %X), %v=3 ISO (pairs with %x).
                    mode = {"U": 0, "u": 1, "V": 2, "v": 3}[tok]
                    parts.append(F.lpad(week(c, mode).cast("string"), 2, "0"))
                elif tok in "Xx":
                    # week-year matching %V/%v resp. — from _calc_week
                    # with the week-year flag, so the year shifts at the
                    # same boundaries the paired week token does.
                    mode = 2 if tok == "X" else 3
                    yr, _ = _calc_week(c, mode, force_week_year=True)
                    parts.append(F.lpad(yr.cast("string"), 4, "0"))
                elif tok == "D":
                    d = F.dayofmonth(c)
                    suffix = (
                        F.when((d % 100).isin(11, 12, 13), "th")
                        .when(d % 10 == 1, "st")
                        .when(d % 10 == 2, "nd")
                        .when(d % 10 == 3, "rd")
                        .otherwise("th")
                    )
                    parts.append(F.concat(d.cast("string"), suffix))
                i += 2
                continue
            lit.append(fmt[i]); lit.append(tok)
            i += 2
        else:
            lit.append(fmt[i]); i += 1
    flush_lit()
    return F.concat(*parts) if len(parts) > 1 else parts[0]


@_reg("time_format")
def time_format(c, fmt: str) -> Column:
    """TIME_FORMAT over a MySQL TIME VALUE (ref func_time_format.cpp):
    the operand converts to TIME — which may exceed 24 h or be negative
    ('100:00:00') — so rendering goes through the value's seconds, not
    a timestamp (a timestamp cast NULLed every >24 h TIME).  %H/%k show
    the full hour count; %h/%I/%l are mod-12 (0 → 12).  Formats with
    date tokens keep the datetime path (MySQL renders zeros for date
    fields of a TIME; callers passing datetimes get full rendering)."""
    if mysql_format_tokens(fmt) - MYSQL_TIME_FORMAT_TOKENS:
        return date_format_mysql(c, fmt)
    v = _c(c)
    sv = F.trim(v.try_cast("string"))
    ts = sv.try_cast("timestamp")
    # datetime-looking input takes its time-of-day (same gate as
    # cast_time); everything else reads as a TIME value.  pmod of
    # unix_micros keeps the FRACTIONAL second (hour/minute/second
    # dropped it, rendering %f as 000000) and stays positive for
    # pre-1970 datetimes.
    looks_dt = ts.isNotNull() & sv.rlike(
        "^[0-9][0-9][0-9][0-9]-[0-9][0-9]?-[0-9][0-9]?"
    )
    secs = F.when(
        looks_dt,
        (
            F.pmod(F.unix_micros(ts), F.lit(86400000000))
            .cast("decimal(20,0)")
            / 1000000
        ).cast("decimal(17,6)"),
    ).otherwise(_time_value_secs(v))
    a = F.abs(secs)
    sign = F.when(secs < 0, F.lit("-")).otherwise(F.lit(""))
    h = F.floor(a / 3600).cast("bigint")
    mi = F.floor((a % 3600) / 60).cast("bigint")
    se = F.floor(a % 60).cast("bigint")
    micros = F.round((a % 1) * 1000000, 0).cast("bigint")
    h12 = F.when(h % 12 == 0, F.lit(12)).otherwise(h % 12)
    ampm = F.when((h % 24) < 12, F.lit("AM")).otherwise(F.lit("PM"))
    # format_string('%02d'), not lpad: lpad TRUNCATES a 3-digit hour
    parts: list[Column] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i + 1]
            if tok == "H":
                parts.append(F.concat(sign, F.format_string("%02d", h)))
            elif tok == "k":
                parts.append(F.concat(sign, h.cast("string")))
            elif tok in ("h", "I"):
                parts.append(F.format_string("%02d", h12))
            elif tok == "l":
                parts.append(h12.cast("string"))
            elif tok == "i":
                parts.append(F.format_string("%02d", mi))
            elif tok in ("s", "S"):
                parts.append(F.format_string("%02d", se))
            elif tok == "f":
                parts.append(F.format_string("%06d", micros))
            elif tok == "p":
                parts.append(ampm)
            elif tok == "r":
                parts.append(
                    F.concat(
                        F.format_string("%02d:%02d:%02d", h12, mi, se),
                        F.lit(" "), ampm,
                    )
                )
            elif tok == "T":
                parts.append(
                    F.concat(sign, F.format_string("%02d:%02d:%02d", h, mi, se))
                )
            else:  # %% and unknown tokens render literally
                parts.append(F.lit(tok))
            i += 2
        else:
            parts.append(F.lit(fmt[i]))
            i += 1
    if not parts:  # empty format → '' (MySQL), still NULL-gated below
        parts.append(F.lit(""))
    body = F.concat(*parts) if len(parts) > 1 else parts[0]
    # NULL/invalid TIME → NULL (concat of literals would mask it)
    return F.when(secs.isNotNull(), body)


@_reg("str_to_date")
def str_to_date(s, fmt: str) -> Column:
    # try_to_timestamp: MySQL STR_TO_DATE returns NULL on unparseable
    # input; to_timestamp raises under ANSI (the gate-session default).
    # The PARSE-variant pattern accepts non-padded numeric fields and
    # %M/%b month names the way MySQL's format scan does
    # (func_str_to_date.cpp: 1-2 digit numeric reads) — the strict
    # render-side pattern rejected '01,5,2013' with '%d,%m,%Y'.
    # Result type follows the format's fields (MySQL): time tokens →
    # zoneless DATETIME; date-only format → DATE.
    v = F.trim(_c(s).try_cast("string"))
    for pat, rep in MYSQL_PARSE_INPUT_NORM:
        v = F.regexp_replace(v, pat, rep)
    ts = F.try_to_timestamp(v, F.lit(mysql_parse_format_to_spark(fmt)))
    if mysql_format_has_time(fmt):
        return ts.try_cast("timestamp_ntz")
    return ts.try_cast("date")


@_reg("get_format")
def get_format(kind: str, standard: str) -> Column:
    # ref func_get_format.cpp — static lookup, shared with the dialect
    # SQL-text fold (ONE copy in functions/mysql_format.py).  Unknown
    # kind/region → NULL like MySQL, not a KeyError at plan build
    from infinidb_spark.functions.mysql_format import GET_FORMAT_TABLE

    hit = GET_FORMAT_TABLE.get((kind.lower(), standard.lower()))
    return F.lit(hit) if hit is not None else F.lit(None).cast("string")


_UNIT_TO_INTERVAL = {
    "microsecond": "microsecond", "second": "second", "minute": "minute",
    "hour": "hour", "day": "day", "week": "week", "month": "month",
    "quarter": "quarter", "year": "year",
}


def _unit_interval(n, unit: str) -> Column:
    """An INTERVAL of ``n`` ``unit``s where ``n`` may be a Column —
    built with make_interval, never f-string SQL (interpolating a
    Column into INTERVAL text is a guaranteed ParseException)."""
    nc = _c(n) if isinstance(n, Column) else F.lit(n)
    if unit == "second":
        # fractional seconds are REAL in MySQL (+ INTERVAL 1.5 SECOND
        # adds 1.5 s) — no int cast, pass decimal seconds through
        return F.make_interval(secs=nc.cast("double"))
    if unit == "microsecond":
        # no int cast: 3e9 us (50 min) is a legal MySQL operand that
        # overflowed INT (ANSI crash / silent wrap); double keeps
        # integer us exact up to 2^53
        return F.make_interval(secs=nc.cast("double") / F.lit(1e6))
    # MySQL ROUNDS a fractional operand for whole units (INTERVAL 1.5
    # DAY = 2 days, func_date_add.cpp via getNumbers) — the old bare
    # int cast truncated it to 1
    whole = F.round(nc.cast("double"), 0).cast("int")
    args = {
        "year": dict(years=whole),
        "quarter": dict(months=whole * 3),
        "month": dict(months=whole),
        "week": dict(weeks=whole),
        "day": dict(days=whole),
        "hour": dict(hours=whole),
        "minute": dict(mins=whole),
    }[unit]
    return F.make_interval(**args)


def _compound_interval_col(n, unit: str, negate: bool) -> Column:
    """Typed-interval Column for a compound unit — reference dateAdd
    (``utils/funcexp/func_date_add.cpp:173-246``): the operand must be
    a literal (the reference parses the operand string with getNumbers;
    a Column operand has no MySQL-exact Spark rewrite)."""
    if isinstance(n, Column):
        raise NotImplementedError(
            f"compound INTERVAL {unit} needs a literal operand"
        )
    nums = _iv.interval_numbers(str(n), negate=negate)
    if not nums:
        raise ValueError(f"INTERVAL operand {n!r} has no numbers")
    slots = _iv.compound_slots(unit, nums)
    if slots is None:
        # more numbers than fields → reference returns datetime 0
        return F.expr("CAST(NULL AS INTERVAL DAY TO SECOND)")
    return F.expr(_iv.ansi_interval_sql(unit, slots))


@_reg("date_add", "adddate")
def date_add(c, n, unit: str = "day") -> Column:
    c = _c(c)
    if unit.upper() in _iv.COMPOUND_UNITS:
        return c + _compound_interval_col(n, unit.upper(), negate=False)
    unit = unit.lower()
    # no DATE-cast fast path for day: it silently dropped the
    # time-of-day of datetime inputs (MySQL preserves it); the typed
    # interval keeps DATE inputs DATE and timestamps timestamps
    return c + _unit_interval(n, unit)


@_reg("date_sub", "subdate")
def date_sub(c, n, unit: str = "day") -> Column:
    c = _c(c)
    if unit.upper() in _iv.COMPOUND_UNITS:
        # getNumbers negates each field for OP_SUB and addition is
        # distributive over the field sum, so negate-at-parse ≡ c - ival
        return c + _compound_interval_col(n, unit.upper(), negate=True)
    unit = unit.lower()
    return c - _unit_interval(n, unit)


def _time_value_secs(x: Column) -> Column:
    """Seconds in a MySQL TIME value (ref func_add_time.cpp
    stringToTime): '[-][H]H:MM:SS[.us]' / '[-]H:MM' strings, or packed
    [-]HHMMSS[.us] numerics (130 -> 1m30s, not 130s).  Invalid field
    ranges (MM/SS >= 60) -> NULL, matching the reference's NULL-on-bad-
    time contract."""
    s = F.trim(x.cast("string"))
    a = F.regexp_replace(s, "^-", "")
    rx = r"^([0-9]+):([0-9][0-9]?)(:([0-9][0-9]?([.][0-9]+)?))?$"
    h = F.regexp_extract(a, rx, 1)
    m = F.regexp_extract(a, rx, 2).try_cast("decimal(4,0)")
    sec = F.coalesce(
        F.nullif(F.regexp_extract(a, rx, 4), F.lit("")).try_cast("decimal(9,6)"),
        F.lit(0).cast("decimal(9,6)"),
    )
    colon = F.when(
        (m < 60) & (sec < 60),
        h.try_cast("decimal(10,0)") * 3600 + m * 60 + sec,
    )
    n = a.try_cast("decimal(17,6)")
    pm = F.floor(n / 100) % 100
    ps = n % 100
    packed = F.when((pm < 60) & (ps < 60), F.floor(n / 10000) * 3600 + pm * 60 + ps)
    body = F.when(h != "", colon).otherwise(packed)
    return F.when(s.startswith("-"), -body).otherwise(body)


@_reg("addtime")
def addtime(c, t) -> Column:
    # 2nd operand is a TIME value, not plain seconds (func_add_time.cpp)
    return _c(c) + F.make_interval(secs=_time_value_secs(_c(t)))


@_reg("subtime")
def subtime(c, t) -> Column:
    return _c(c) - F.make_interval(secs=_time_value_secs(_c(t)))


@_reg("datediff")
def datediff(a, b) -> Column:
    # MySQL DATEDIFF(a, b) = a - b in days
    return F.datediff(_c(a).cast("date"), _c(b).cast("date"))


@_reg("timediff")
def timediff(a, b) -> Column:
    # returns HH:MM:SS string of a - b (ref func_timediff.cpp).
    # Datetime operands diff on the epoch; bare TIME operands
    # ('10:00:00', which no timestamp cast accepts) diff through
    # _time_value_secs.  sec_to_time renders the sign itself — the old
    # sign/abs wrapper was byte-identical duplication.
    a, b = _c(a), _c(b)
    secs = F.coalesce(
        F.unix_timestamp(a.try_cast("timestamp"))
        - F.unix_timestamp(b.try_cast("timestamp")),
        (_time_value_secs(a) - _time_value_secs(b)).cast("bigint"),
    )
    return sec_to_time(secs)


@_reg("timestampdiff")
def timestampdiff(unit: str, a, b) -> Column:
    # MySQL TIMESTAMPDIFF(unit, a, b) = b - a in unit
    a, b = _c(a), _c(b)
    unit = unit.lower()
    if unit in ("second", "minute", "hour", "day", "week"):
        secs = F.unix_timestamp(b) - F.unix_timestamp(a)
        div = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}[unit]
        return (secs / div).cast("bigint")
    # truncation TOWARD ZERO with time-of-day considered (MySQL): the
    # raw month delta over-counts by one when the within-month position
    # of b has not yet reached a's (going forward), and symmetrically
    # under-counts going backward — the one-sided day(b) < day(a)
    # correction was wrong for negative diffs (verified: MONTH from
    # 2020-03-15 to 2020-01-20 must be -1, not -2)
    pos_a = (
        F.dayofmonth(a) * F.lit(86400)
        + F.hour(a) * 3600 + F.minute(a) * 60 + F.second(a)
    )
    pos_b = (
        F.dayofmonth(b) * F.lit(86400)
        + F.hour(b) * 3600 + F.minute(b) * 60 + F.second(b)
    )
    raw = (F.year(b) - F.year(a)) * 12 + (F.month(b) - F.month(a))
    months = (
        raw
        - F.when((raw > 0) & (pos_b < pos_a), 1).otherwise(0)
        + F.when((raw < 0) & (pos_b > pos_a), 1).otherwise(0)
    )
    if unit == "month":
        return months.cast("bigint")
    if unit == "quarter":
        return (months / 3).cast("bigint")
    if unit == "year":
        return (months / 12).cast("bigint")
    raise NotImplementedError(unit)


@_reg("extract")
def extract(field: str, c) -> Column:
    f_u = field.upper()
    if f_u in _iv.EXTRACT_PACKED:
        # packed compound fields (func_extract.cpp:68-86):
        # DAY_HOUR → day*100+hour, SECOND_MICROSECOND → sec*1e6+usec, …
        x = f"CAST({_colname(c)} AS TIMESTAMP)"
        return F.expr(f"CAST({_iv.EXTRACT_PACKED[f_u].format(x=x)} AS BIGINT)")
    if f_u == "WEEK":
        # MySQL week mode 0 (func_extract.cpp:79 calc_mysql_week(...,0)),
        # not Spark's ISO extract — same rule as the dialect's EXTRACT.
        # extract() takes column NAMES as strings (F.expr composition),
        # so resolve before handing to week(), whose _c treats a plain
        # string as a literal.
        return week(F.col(c) if isinstance(c, str) else c, 0)
    return F.expr(f"extract({field} FROM {_colname(c)})")


@_reg("now", "sysdate", "current_timestamp")
def now() -> Column:
    return F.current_timestamp()


@_reg("curdate", "current_date")
def curdate() -> Column:
    return F.current_date()


# ---------------------------------------------------------------------------
# Control / null — ref func_case/if/ifnull/nullif/coalesce/greatest/
# least/between/in.cpp
# ---------------------------------------------------------------------------


@_reg("if")
def if_(cond, a, b) -> Column:
    # MySQL coerces ANY condition type through boolVal — numeric != 0,
    # string via an atoi-style PREFIX parse != 0 (func_if.cpp:38-72);
    # Spark's when() is boolean-strict and failed analysis on
    # IF(2, ...).  typeof() folds statically, so string conditions take
    # the prefix-parse branch ('2x' → 2 → true, 'true' → 0 → false —
    # NOT Spark's boolean-string cast) and everything else goes through
    # try_cast-to-boolean, Spark's numeric != 0 read (0.1→true,
    # 0→false, NULL→NULL), an identity no-op on boolean input.  Same
    # prefix regex as the dialect's _mysql_str_truthy so the two paths
    # cannot drift.
    v = _c(cond)
    s = F.trim(v.try_cast("string"))
    pfx = F.regexp_extract(
        s, "^[+-]?([0-9]+[.]?[0-9]*|[.][0-9]+)([eE][+-]?[0-9]+)?", 0
    )
    truthy = F.when(
        F.call_function("typeof", v).startswith("string"),
        pfx.try_cast("double") != 0,  # no prefix → NULL → falsy
    ).otherwise(v.try_cast("boolean"))
    return F.when(truthy, _c(a)).otherwise(_c(b))


@_reg("ifnull")
def ifnull(a, b) -> Column:
    return F.coalesce(_c(a), _c(b))


@_reg("nullif")
def nullif(a, b) -> Column:
    return F.nullif(_c(a), _c(b))


@_reg("coalesce")
def coalesce(*args) -> Column:
    return F.coalesce(*[_c(a) for a in args])


@_reg("isnull")
def isnull(a) -> Column:
    return _c(a).isNull()


@_reg("isnotnull")
def isnotnull(a) -> Column:
    return _c(a).isNotNull()


def _null_strict(cols: list[Column], agg) -> Column:
    # MySQL (and the reference — func_greatest.cpp propagates isNull
    # through every operand) return NULL when ANY argument is NULL;
    # Spark's greatest/least SKIP nulls
    any_null = cols[0].isNull()
    for c in cols[1:]:
        any_null = any_null | c.isNull()
    return F.when(~any_null, agg(*cols))


@_reg("greatest")
def greatest(*args) -> Column:
    return _null_strict([_c(a) for a in args], F.greatest)


@_reg("least")
def least(*args) -> Column:
    return _null_strict([_c(a) for a in args], F.least)


@_reg("between")
def between(x, lo, hi) -> Column:
    return _c(x).between(_c(lo), _c(hi))


@_reg("in")
def in_(x, *vals) -> Column:
    return _c(x).isin(*vals)


@_reg("case")
def case(*pairs, default=None) -> Column:
    """case((cond1, val1), (cond2, val2), ..., default=...)"""
    col = None
    for cond, val in pairs:
        col = F.when(_c(cond), _c(val)) if col is None else col.when(_c(cond), _c(val))
    return col.otherwise(_c(default)) if default is not None else col


# ---------------------------------------------------------------------------
# Casts — ref func_cast.cpp (funcexp.cpp:83-88)
#
# The reference converters are permissive by construction (func_cast.cpp /
# dataconvert.cpp: malformed input -> 0/NULL, never a runtime error), so the
# whole family uses ``try_cast`` semantics.  This also makes every cast
# session-independent: the same Column works whether the hosting session has
# spark.sql.ansi.enabled on (Spark 4 default — the driver's gate session) or
# off (the engine's own session).
# ---------------------------------------------------------------------------


@_reg("cast_signed")
def cast_signed(c) -> Column:
    # MySQL CAST(x AS SIGNED) ROUNDS half-away-from-zero on NUMERIC
    # fractional input (2.6 -> 3) but TRUNCATES string input at the
    # decimal point ('2.9' -> 2, the string-to-integer prefix parse).
    # typeof() is static per plan, so the branch constant-folds.
    # Exactness: integer-typed input and integer-LOOKING strings cast
    # DIRECTLY — a double detour corrupts values above 2^53 and NULLs
    # max-range bigint strings.  startswith('string'), not equality:
    # collated columns render typeof as 'string collate <NAME>'.
    v = _c(c)
    # string detour for the double probe: try_cast(date AS DOUBLE) is
    # STATICALLY illegal (analysis error for the whole expression, not
    # a runtime NULL), and the temporal branches below never run
    s = F.trim(v.try_cast("string"))
    # MySQL's string→integer conversion is a PREFIX parse (atoll,
    # func_cast.cpp:144): 'abc' → 0, '12abc' → 12, '-12.7xyz' → −12.
    # regexp_extract pulls the leading numeric; no prefix at all → 0
    # (never NULL for a non-NULL string).  [.] dodges regex escaping.
    pfx = F.regexp_extract(s, "^[+-]?[0-9]+([.][0-9]+)?", 0)
    d = pfx.try_cast("double")
    # run through DECIMAL(38,0) so the (2^63−1, 2^64−1] band survives
    # to the 2^64 wrap below (func_cast.cpp:234 C-cast semantics:
    # CAST(18446744073709551615 AS SIGNED) = −1) instead of NULLing
    # in a premature bigint try_cast
    trunc = F.when(d >= 0, F.floor(d)).otherwise(F.ceil(d)).try_cast("decimal(38,0)")
    str_val = (
        F.when(s.rlike("^[+-]?[0-9]+$"), s.try_cast("decimal(38,0)"))
        .when(pfx == "", F.lit(0).cast("decimal(38,0)"))
        # integer-looking prefix casts directly (exact to 2^64)
        .when(pfx.rlike("^[+-]?[0-9]+$"), pfx.try_cast("decimal(38,0)"))
        .otherwise(trunc)
    )
    # EVERY branch must be analysis-legal for EVERY static input type
    # (a CASE type-checks all branches even though typeof folds): the
    # temporal branches read fields from a string→timestamp re-parse
    # (year(bigint) would fail analysis for numeric inputs), and the
    # numeric branches go string→decimal (decimal(date) would fail for
    # date inputs).  The string renders are exact for every numeric
    # type, so runtime values are unchanged.
    sv = v.try_cast("string")
    ts = sv.try_cast("timestamp")
    t = F.call_function("typeof", v)
    # ONE numeric fallthrough: every numeric type's string render
    # parses back to DECIMAL(38,0) exactly (int/decimal digits are
    # verbatim; double round-trips incl. scientific notation) and the
    # string→decimal cast rounds HALF_UP like MySQL's numeric CAST —
    # fewer branches keeps the whole CASE inside codegen's method-size
    # budget.  Temporal input packs to MySQL's numeric render
    # (dataconvert DATE/DATETIME → YYYYMMDD / YYYYMMDDHHMMSS), NOT
    # epoch seconds.
    w = (
        F.when(t.startswith("string"), str_val)
        .when(t == "date", _packed_date_num(ts))
        .when(t.startswith("timestamp"), _packed_datetime_num(ts))
        .when(t == "boolean",
              # no otherwise: a NULL boolean stays NULL (MySQL)
              F.when(sv == "true", 1).when(sv == "false", 0).cast("decimal(38,0)"))
        .otherwise(sv.try_cast("decimal(38,0)"))
    )
    max_i64 = F.lit("9223372036854775807").cast("decimal(38,0)")
    max_u64 = F.lit("18446744073709551615").cast("decimal(38,0)")
    two_64 = F.lit("18446744073709551616").cast("decimal(38,0)")
    return F.when(
        (w > max_i64) & (w <= max_u64), (w - two_64).try_cast("bigint")
    ).otherwise(w.try_cast("bigint"))


@_reg("cast_unsigned")
def cast_unsigned(c) -> Column:
    # Spark has no unsigned; DECIMAL(20,0) holds the UBIGINT range
    # (SURVEY §7 hard-parts).  Same round-vs-truncate split as
    # cast_signed: numeric input rounds (DECIMAL cast is HALF_UP —
    # exact for int/decimal input, no double detour needed), string
    # input truncates at the decimal point ('2.9' -> 2; integer-
    # looking strings cast directly for full-range exactness).
    # Negative operands wrap into the 2^64 domain the way the
    # reference's C cast does (func_cast.cpp:234): CAST(-1 AS
    # UNSIGNED) = 18446744073709551615.
    v = _c(c)
    # same string detour as cast_signed: date input must not poison
    # the expression at analysis.  Same PREFIX parse (strtoul,
    # func_cast.cpp:253): 'abc' → 0, '12abc' → 12.
    s = F.trim(v.try_cast("string"))
    pfx = F.regexp_extract(s, "^[+-]?[0-9]+([.][0-9]+)?", 0)
    d = pfx.try_cast("double")
    trunc = F.when(d >= 0, F.floor(d)).otherwise(F.ceil(d)).try_cast("decimal(20,0)")
    str_val = (
        F.when(s.rlike("^[+-]?[0-9]+$"), s.try_cast("decimal(20,0)"))
        .when(pfx == "", F.lit(0).cast("decimal(20,0)"))
        .when(pfx.rlike("^[+-]?[0-9]+$"), pfx.try_cast("decimal(20,0)"))
        .otherwise(trunc)
    )
    # same analysis-legality rule as cast_signed: every branch via the
    # string render, exact for every numeric type
    sv = v.try_cast("string")
    ts = sv.try_cast("timestamp")
    t = F.call_function("typeof", v)
    u = (
        F.when(t.startswith("string"), str_val)
        # temporal input packs like cast_signed (MySQL numeric render)
        .when(t == "date", _packed_date_num(ts).cast("decimal(20,0)"))
        .when(
            t.startswith("timestamp"),
            _packed_datetime_num(ts).cast("decimal(20,0)"),
        )
        .when(t == "boolean",
              # no otherwise: a NULL boolean stays NULL (MySQL)
              F.when(sv == "true", 1).when(sv == "false", 0).cast("decimal(20,0)"))
        .otherwise(sv.try_cast("decimal(20,0)"))
    )
    two_64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    return F.when(u < 0, (u + two_64).cast("decimal(20,0)")).otherwise(u)


def _packed_date_num(v: Column) -> Column:
    """MySQL's numeric render of a DATE: YYYYMMDD."""
    return (
        F.year(v).cast("decimal(38,0)") * 10000
        + F.month(v) * 100
        + F.dayofmonth(v)
    )


def _packed_datetime_num(v: Column) -> Column:
    """MySQL's numeric render of a DATETIME: YYYYMMDDHHMMSS
    (fractional seconds truncate)."""
    return (
        F.year(v).cast("decimal(38,0)") * F.lit(10000000000)
        + F.month(v).cast("decimal(38,0)") * 100000000
        + F.dayofmonth(v) * 1000000
        + F.hour(v) * 10000
        + F.minute(v) * 100
        + F.second(v)
    )


@_reg("cast_char")
def cast_char(c, n=None) -> Column:
    s = _c(c).try_cast("string")
    # `n is not None`, not truthiness: CAST(x AS CHAR(0)) is ''
    return F.substring(s, 1, n) if n is not None else s


@_reg("cast_date")
def cast_date(c) -> Column:
    return _c(c).try_cast("date")


@_reg("cast_datetime")
def cast_datetime(c) -> Column:
    # timestamp_ntz, not timestamp: MySQL DATETIME is zoneless (the
    # reference stores a tz-free bitfield, dataconvert.h:142-160);
    # mirrors the SQL-text _cast_frag DATETIME branch
    return _c(c).try_cast("timestamp_ntz")


@_reg("cast_time")
def cast_time(c) -> Column:
    # MySQL CAST(x AS TIME) (ref funcexp.cpp:83-88 cast_as_time,
    # dataconvert.h TIME bitfield): date/datetime input -> its
    # time-of-day; TIME strings ('[-][H]H:MM[:SS[.us]]', hours up to
    # 838) and packed numerics (130045 -> '13:00:45') -> the canonical
    # 'HH:MM:SS' render; malformed input -> NULL.  Rendered as a string
    # because >24 h and negative TIME values have no Spark type.
    v = _c(c)
    ts = v.try_cast("timestamp")
    s = F.trim(v.try_cast("string"))
    # numerics also try_cast to timestamp (epoch seconds), so gate the
    # datetime path on the rendered text actually LOOKING like a date;
    # month/day may be single-digit ('2024-1-3'), which Spark's
    # timestamp cast accepts
    is_dt = ts.isNotNull() & s.rlike(
        "^[0-9][0-9][0-9][0-9]-[0-9][0-9]?-[0-9][0-9]?"
    )
    # fractional TIME seconds ROUND to the second ('10:30:45.9' ->
    # '10:30:46', MySQL TIME(0)); round-on-decimal is exact HALF_UP
    return F.when(is_dt, F.date_format(ts, "HH:mm:ss")).otherwise(
        sec_to_time(F.round(_time_value_secs(v), 0))
    )


@_reg("cast_decimal", "decimal_typecast")
def cast_decimal(c, precision=18, scale=2) -> Column:
    return _c(c).try_cast(f"decimal({precision},{scale})")


@_reg("cast_double")
def cast_double(c) -> Column:
    return _c(c).try_cast("double")


@_reg("idbpartition")
def idbpartition() -> Column:
    """Scalar-function form of the ``idbpartition`` pseudo-column —
    the one FuncMap name (``funcexp.cpp:68-207``) whose implementation
    lives in the pseudo-column family (sources/pseudocol.py,
    ``ha_pseudocolumn.cpp:29-51``): the reference registers it in BOTH
    places, so the registry mirrors that.  Requires a file-based scan
    (Parquet ``_metadata``), like the reference requires an InfiniDB
    table."""
    from infinidb_spark.sources.pseudocol import PSEUDO_COLUMNS

    return PSEUDO_COLUMNS["idbpartition"]()


# ---------------------------------------------------------------------------
# Misc — inet (ref func_inet_aton.cpp), json (post-parity bonus)
# ---------------------------------------------------------------------------


@_reg("inet_aton")
def inet_aton(ip) -> Column:
    # try_cast + octet range guard: MySQL returns NULL for malformed
    # addresses and out-of-range octets; a raw cast raised under ANSI
    # and '1.2.3.999' computed a bogus non-NULL sum.  1-3 part short
    # forms resolve per the reference (func_inet_aton.cpp dot_count
    # switch): the LAST part fills the low bytes — '127.1' →
    # 127.0.0.1, '127.2.1' → 127.2.0.1.
    p = F.split(_c(ip), r"\.")
    parts = F.transform(p, lambda x: x.try_cast("bigint"))
    bad = F.exists(parts, lambda x: x.isNull() | (x < 0) | (x > 255))
    o = [parts.getItem(i) for i in range(4)]
    n = F.size(p)
    val = (
        F.when(n == 4, o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3])
        .when(n == 3, o[0] * 16777216 + o[1] * 65536 + o[2])
        .when(n == 2, o[0] * 16777216 + o[1])
        .when(n == 1, o[0])
    )
    return F.when(~bad, val)


@_reg("inet_ntoa")
def inet_ntoa(n) -> Column:
    n = _c(n).cast("bigint")
    return F.concat_ws(
        ".",
        (n / 16777216).cast("bigint") % 256,
        (n / 65536).cast("bigint") % 256,
        (n / 256).cast("bigint") % 256,
        n % 256,
    )


@_reg("json_extract")
def json_extract(c, path: str) -> Column:
    return F.get_json_object(_c(c), path)


def _colname(c) -> str:
    """Best-effort SQL name for a Column (used by expr-composed funcs)."""
    if isinstance(c, Column):
        return c._jc.toString()
    return str(c)


# ---------------------------------------------------------------------------
# Reference-name aliases — every name the reference's fFuncMap registers
# (utils/funcexp/funcexp.cpp:68-207) resolves here too, including the
# operator spellings and MySQL's alternate function names.  `idbpartition`
# is registered above (it mirrors sources/pseudocol.py — the reference
# registers it in BOTH the FuncMap and the pseudo-column table).
_ALIASES = {
    "%": "mod",
    "&": "bitand",
    "|": "bitor",
    "^": "bitxor",
    "<<": "leftshift",
    ">>": "rightshift",
    " in ": "in",
    "notbetween": "between",  # corrected to not_between by the rebind below
    "case_searched": "case",
    "case_simple": "case",
    "cast_as_signed": "cast_signed",
    "cast_as_unsigned": "cast_unsigned",
    "cast_as_char": "cast_char",
    "cast_as_date": "cast_date",
    "cast_as_datetime": "cast_datetime",
    "cast_as_time": "cast_time",
    "convert": "cast_char",
    "character_length": "char_length",
    "add_time": "addtime",
    "date_add_interval": "date_add",
}
for _alias, _target in _ALIASES.items():
    FUNC_MAP[_alias] = FUNC_MAP[_target]


@_reg("div_int")
def div_int(a, b) -> Column:
    """MySQL `a DIV b` — integer division truncating toward zero
    (`funcexp.cpp` '%'/DIV operator family).

    EXACT over the full bigint range: the double-division form loses
    precision above 2^53 (9007199254740995 DIV 1 came back ...996) and a
    rounded decimal quotient can flip the floor (599999999999 DIV
    200000000000 must be 2, not 3), so no quotient is ever rounded:
    `a % b` is an EXACT truncated remainder in Spark decimal arithmetic,
    which makes `(a - a % b) / b` an exact integer — decimal(38,9)
    operands cover the full bigint range without overflow.  A zero
    divisor short-circuits to NULL (MySQL) before any ANSI error."""
    a, b = _c(a), _c(b)
    ad = a.cast("decimal(38,9)")
    bd = b.cast("decimal(38,9)")
    return F.when(
        bd.isNotNull() & (bd != 0), ((ad - ad % bd) / bd).cast("bigint")
    )


FUNC_MAP["div"] = div_int


@_reg("not_between")
def not_between(c, lo, hi) -> Column:
    return ~_c(c).between(_c(lo), _c(hi))


FUNC_MAP["notbetween"] = not_between


@_reg("not_in")
def not_in(x, *vals) -> Column:
    """Negated IN — the reference registers a distinct Func_notin
    (utils/funcexp/funcexp.cpp:157-158); `~isin` keeps MySQL's
    three-valued semantics (NULL input -> NULL, filtered out)."""
    return ~_c(x).isin(*vals)


FUNC_MAP["not in "] = not_in
FUNC_MAP["notin"] = not_in
