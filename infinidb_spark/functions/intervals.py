"""MySQL compound INTERVAL units — shared by the Column registry and the
SQL-text dialect.

The reference implements DATE_ADD/DATE_SUB for all compound units
(``utils/funcexp/func_date_add.cpp:173-246``) and EXTRACT for the eight
packed-integer fields (``utils/funcexp/func_extract.cpp:68-86``); the
unit roster is ``dbcon/execplan/intervalcolumn.h:58-60``.  Operand
parsing follows the reference's ``getNumbers``
(``utils/funcexp/funchelpers.h:508-571``) exactly:

* digit runs separated by ANY non-digit delimiter become the numbers;
* a ``-`` immediately BEFORE a number negates that number;
* a ``-`` AFTER a number truncates the scan there (the reference's
  NN-NN "error condition" keeps what was parsed so far);
* DATE_SUB negates every number;
* at most 10 numbers are read.

Fewer numbers than the unit has fields → they fill the SMALLEST fields
(``INTERVAL '1:30' DAY_MINUTE`` adds 1 hour 30 minutes); more numbers
than fields → the reference returns datetime 0, surfaced here as NULL.
"""

from __future__ import annotations

#: compound unit → make_interval slots, largest field first.
COMPOUND_UNITS: dict[str, tuple[str, ...]] = {
    "YEAR_MONTH": ("year", "month"),
    "DAY_HOUR": ("day", "hour"),
    "DAY_MINUTE": ("day", "hour", "minute"),
    "DAY_SECOND": ("day", "hour", "minute", "second"),
    "HOUR_MINUTE": ("hour", "minute"),
    "HOUR_SECOND": ("hour", "minute", "second"),
    "MINUTE_SECOND": ("minute", "second"),
    "DAY_MICROSECOND": ("day", "hour", "minute", "second", "microsecond"),
    "HOUR_MICROSECOND": ("hour", "minute", "second", "microsecond"),
    "MINUTE_MICROSECOND": ("minute", "second", "microsecond"),
    "SECOND_MICROSECOND": ("second", "microsecond"),
}

#: EXTRACT's packed-integer compound fields (func_extract.cpp:68-86 —
#: note DAY/HOUR/MINUTE_MICROSECOND are NOT extractable in the
#: reference, matching MySQL's EXTRACT).  Formulas over a bound
#: timestamp operand ``{x}``.
#: extract() spellings, not hour()/minute()/second() calls: the
#: dialect rewrites those names through the TIME-field handler on
#: re-entry (translator idempotency).  extract's SECOND is a
#: fractional decimal — floor() keeps MySQL's truncation.
_H = "extract(HOUR FROM {x})"
_M = "extract(MINUTE FROM {x})"
_S = "CAST(floor(extract(SECOND FROM {x})) AS BIGINT)"

EXTRACT_PACKED: dict[str, str] = {
    "YEAR_MONTH": "year({x}) * 100 + month({x})",
    "DAY_HOUR": "day({x}) * 100 + " + _H,
    "DAY_MINUTE": "day({x}) * 10000 + " + _H + " * 100 + " + _M,
    "DAY_SECOND": (
        "day({x}) * 1000000 + " + _H + " * 10000"
        " + " + _M + " * 100 + " + _S
    ),
    "HOUR_MINUTE": _H + " * 100 + " + _M,
    "HOUR_SECOND": _H + " * 10000 + " + _M + " * 100 + " + _S,
    "MINUTE_SECOND": _M + " * 100 + " + _S,
    "SECOND_MICROSECOND": (
        # pmod, not %: Spark's % follows the dividend's sign, so a
        # pre-1970 timestamp's negative unix_micros would subtract the
        # fraction instead of adding it
        _S + " * 1000000 + pmod(unix_micros({x}), 1000000)"
    ),
}


def interval_numbers(expr: str, negate: bool) -> list[int]:
    """Reference ``getNumbers``: the numbers in ``expr``, signed."""
    out: list[int] = []
    number, neg, found = 0, 1, False
    func_neg = -1 if negate else 1
    for ch in expr:
        if "0" <= ch <= "9":
            found = True
            number = number * 10 + (ord(ch) - ord("0"))
        elif ch == "-" and not found:
            neg = -1
        elif ch == "-":
            # NN-NN: keep what was parsed, stop (funchelpers.h:538-548)
            out.append(number * func_neg * neg)
            return out
        elif found:
            out.append(number * func_neg * neg)
            number, neg, found = 0, 1, False
            if len(out) > 9:
                return out
    if found:
        out.append(number * func_neg * neg)
    return out


def compound_slots(unit: str, numbers: list[int]) -> dict[str, int] | None:
    """Right-align ``numbers`` into ``unit``'s fields; None when the
    operand has MORE numbers than fields (reference returns 0 → NULL).

    ``numbers`` must be non-empty (the reference throws on an empty
    operand before reaching the field-fill switch).
    """
    fields = COMPOUND_UNITS[unit]
    if len(numbers) > len(fields):
        return None
    return dict(zip(fields[len(fields) - len(numbers):], numbers))


def ansi_interval_sql(unit: str, slots: dict[str, int]) -> str:
    """Render the parsed fields as an ANSI interval literal.

    ANSI typed intervals (not make_interval's CalendarInterval) are what
    give MySQL's type promotion for free: Spark evaluates
    DATE + day-time interval to TIMESTAMP (MySQL promotes DATE →
    DATETIME when time fields are added) and DATE + year-month interval
    to DATE — whereas DATE + make_interval(...hours...) silently stays
    DATE and drops the time.  Mixed-sign fields (getNumbers can yield
    e.g. -1 hour +30 min) fold exactly into one signed total.
    """
    g = slots.get
    if unit == "YEAR_MONTH":
        months = g("year", 0) * 12 + g("month", 0)
        if abs(months) > 2**31 - 1:
            # beyond Spark's int-month literal range the parser raises
            # AnalysisException — the reference overflows to datetime 0,
            # surfaced as NULL (module contract), so render NULL
            return "CAST(NULL AS INTERVAL YEAR TO MONTH)"
        sign = "-" if months < 0 else ""
        y, m = divmod(abs(months), 12)
        return f"INTERVAL '{sign}{y}-{m}' YEAR TO MONTH"
    usec = (
        g("day", 0) * 86400 + g("hour", 0) * 3600 + g("minute", 0) * 60
        + g("second", 0)
    ) * 10**6 + g("microsecond", 0)
    if abs(usec) > 2**63 - 1:
        # long-microsecond literal cap (~106751991 days) — same
        # NULL-on-overflow surface as the too-many-numbers case
        return "CAST(NULL AS INTERVAL DAY TO SECOND)"
    sign = "-" if usec < 0 else ""
    usec = abs(usec)
    sec_total, frac = divmod(usec, 10**6)
    d, rem = divmod(sec_total, 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    f = f".{frac:06d}" if frac else ""
    return f"INTERVAL '{sign}{d} {h:02d}:{m:02d}:{s:02d}{f}' DAY TO SECOND"
