"""WEEK()/YEARWEEK() all-mode parity against a pure-Python port of
MySQL's documented calc_week algorithm, swept over year-boundary dates
(where every mode differs) plus random dates."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from infinidb_spark.functions.registry import FUNC_MAP


def _py_calc_week(d: dt.date, mode: int, force_week_year: bool) -> tuple[int, int]:
    """Reference implementation of MySQL WEEK()/YEARWEEK() semantics
    (documented behavior of calc_week + week_mode)."""
    mode &= 7
    if not (mode & 1):
        mode ^= 4
    monday_first = bool(mode & 1)
    week_year = bool(mode & 2) or force_week_year
    first_weekday = bool(mode & 4)

    year = d.year
    jan1 = dt.date(year, 1, 1)
    # weekday of Jan 1: 0=Monday if monday_first else 0=Sunday
    wd = jan1.weekday() if monday_first else (jan1.weekday() + 1) % 7
    doy = (d - jan1).days + 1

    def shift(w):
        return (w != 0) if first_weekday else (w >= 4)

    def roll(w2):
        return (w2 == 0) if first_weekday else (w2 < 4)

    def days_in(y):
        return 366 if (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)) else 365

    if d.month == 1 and d.day <= 7 - wd:
        if not week_year and shift(wd):
            return year, 0
        # previous-year fallthrough
        prev = days_in(year - 1)
        wd_p = (wd + 53 * 7 - prev) % 7
        days = (doy - 1 + prev) - (7 - wd_p) if shift(wd_p) else (doy - 1 + prev) + wd_p
        if days >= 52 * 7 and roll((wd_p + prev) % 7):
            return year, 1
        return year - 1, days // 7 + 1

    days = (doy - 1) - (7 - wd) if shift(wd) else (doy - 1) + wd
    if week_year and days >= 52 * 7 and roll((wd + days_in(year)) % 7):
        return year + 1, 1
    return year, days // 7 + 1


def _dates():
    out = []
    for y in (1998, 1999, 2000, 2015, 2016, 2017, 2020, 2021, 2024, 2025, 2026):
        for m, dd in [(1, 1), (1, 2), (1, 3), (1, 7), (1, 8), (2, 29), (6, 15), (12, 28), (12, 31)]:
            try:
                out.append(dt.date(y, m, dd))
            except ValueError:
                pass
    return out


@pytest.mark.parametrize("mode", range(8))
def test_week_all_modes_match_reference(spark, mode):
    dates = _dates()
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    got = [
        (r.w, r.yw)
        for r in df.select(
            FUNC_MAP["week"](F.col("d"), mode).alias("w"),
            FUNC_MAP["yearweek"](F.col("d"), mode).alias("yw"),
        ).collect()
    ]
    for d, (w, yw) in zip(dates, got):
        assert w == _py_calc_week(d, mode, False)[1], f"WEEK({d}, {mode})={w}"
        ry, rw = _py_calc_week(d, mode, True)
        assert yw == ry * 100 + rw, f"YEARWEEK({d}, {mode})={yw} want {ry*100+rw}"


def test_mode3_is_iso(spark):
    dates = _dates()
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    rows = df.select(
        FUNC_MAP["week"](F.col("d"), 3).alias("w"), F.weekofyear("d").alias("iso")
    ).collect()
    assert all(r.w == r.iso for r in rows)


def test_date_format_week_tokens_at_year_boundaries(spark):
    """%U/%u/%V/%v/%X/%x golden values (MySQL DATE_FORMAT semantics:
    %U=WEEK mode 0, %u=mode 1, %V+%X=mode 2, %v+%x=mode 3/ISO) — these
    diverge exactly at year boundaries."""
    cases = [
        # date, %U, %u, %V, %X, %v, %x
        ("1999-01-01", "00", "00", "52", "1998", "53", "1998"),
        ("2000-01-01", "00", "00", "52", "1999", "52", "1999"),
        ("2008-02-20", "07", "08", "07", "2008", "08", "2008"),
        ("2026-01-01", "00", "01", "52", "2025", "01", "2026"),
        ("2024-12-31", "52", "53", "52", "2024", "01", "2025"),
    ]
    df_fmt = FUNC_MAP["date_format"]
    df = spark.createDataFrame([(c[0],) for c in cases], "d string").withColumn(
        "d", F.col("d").cast("date")
    )
    rows = df.select(
        df_fmt(F.col("d"), "%U").alias("U"),
        df_fmt(F.col("d"), "%u").alias("u"),
        df_fmt(F.col("d"), "%X-%V").alias("XV"),
        df_fmt(F.col("d"), "%x-%v").alias("xv"),
    ).collect()
    for (ds, U, u, V, X, v, x), r in zip(cases, rows):
        assert r.U == U, f"%U({ds}) = {r.U}, want {U}"
        assert r.u == u, f"%u({ds}) = {r.u}, want {u}"
        assert r.XV == f"{X}-{V}", f"%X-%V({ds}) = {r.XV}"
        assert r.xv == f"{x}-{v}", f"%x-%v({ds}) = {r.xv}"


def test_known_mysql_values(spark):
    """Golden values from the MySQL manual's WEEK() examples."""
    cases = [
        ("2000-01-01", 0, 0), ("2000-01-01", 2, 52),
        ("2008-02-20", 0, 7), ("2008-02-20", 1, 8),
        ("1998-12-31", 1, 53),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "d string")
    for (ds, mode, want) in cases:
        got = (
            spark.createDataFrame([(ds,)], "d string")
            .select(FUNC_MAP["week"](F.col("d").cast("date"), mode).alias("w"))
            .collect()[0]
            .w
        )
        assert got == want, f"WEEK({ds},{mode}) = {got}, want {want}"
