"""MySQL ↔ Spark datetime format-string translation.

The reference implements MySQL ``DATE_FORMAT`` / ``STR_TO_DATE`` /
``TIME_FORMAT`` token semantics in ``utils/funcexp/func_date_format.cpp``
and ``func_str_to_date.cpp``.  Spark uses Java-style patterns
(``yyyy-MM-dd``), so the dialect layer is exactly this translation —
SURVEY.md §7 names it the main "hard part" of function parity.
"""

from __future__ import annotations

#: MySQL '%x' token → Spark/Java datetime pattern fragment.
#: Tokens with no Spark-pattern equivalent are handled in registry.py by
#: expression composition (see ``date_format_mysql``) and marked None here.
_TOKENS: dict[str, str | None] = {
    "a": "EEE",        # abbreviated weekday  Sun..Sat
    "b": "MMM",        # abbreviated month    Jan..Dec
    "c": "M",          # month 1..12
    "D": None,         # day with english suffix 1st, 2nd ... (composed)
    "d": "dd",         # day 00..31
    "e": "d",          # day 0..31
    "f": "SSSSSS",     # microseconds
    "H": "HH",         # hour 00..23
    "h": "hh",         # hour 01..12
    "I": "hh",         # hour 01..12
    "i": "mm",         # minutes
    "j": "DDD",        # day of year 001..366
    "k": "H",          # hour 0..23
    "l": "h",          # hour 1..12
    "M": "MMMM",       # month name
    "m": "MM",         # month 00..12
    "p": "a",          # AM/PM
    "r": "hh:mm:ss a", # 12-hour time
    "S": "ss",         # seconds
    "s": "ss",         # seconds
    "T": "HH:mm:ss",   # 24-hour time
    "U": None,         # week (Sunday first) 00..53 (composed, WEEK mode 0)
    "u": None,         # week (Monday first) 00..53 (composed, WEEK mode 1)
    "V": None,         # week 01..53 with %X (composed, WEEK mode 2)
    "v": None,         # ISO week 01..53 with %x (composed, WEEK mode 3)
    "W": "EEEE",       # weekday name
    "w": None,         # day of week 0=Sunday..6 (composed)
    "X": None,         # week-year for %V (composed)
    "x": None,         # ISO week-year for %v (composed; Java 'Y' week
                       # patterns are rejected by Spark >= 3.0)
    "Y": "yyyy",       # 4-digit year
    "y": "yy",         # 2-digit year
    "%": "%",          # literal percent
}


def _translate_pieces(fmt: str) -> list[tuple[bool, str]]:
    """(is_field, text) pieces of the translated pattern.  Raises
    ``ValueError`` for tokens that need expression composition
    (``%D %U %u %V %v %X %x %w``)."""
    out: list[tuple[bool, str]] = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            s = "".join(lit)
            # quote when the run contains a LETTER (Java reads bare
            # letters as fields) or a QUOTE (a bare quote starts an
            # unbalanced quoted section — "%H'%i" used to emit the
            # dangling-quote pattern HH'mm and crash at render)
            if any(c.isalpha() for c in s) or "'" in s:
                out.append((False, "'" + s.replace("'", "''") + "'"))
            else:
                out.append((False, s))
            lit.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            tok = fmt[i + 1]
            mapped = _TOKENS.get(tok)
            if mapped is None and tok in _TOKENS:
                raise ValueError(f"MySQL token %{tok} needs expression composition")
            flush()
            if mapped is not None:
                out.append((True, mapped))
            else:
                lit.append(tok)  # unknown token: MySQL emits it literally
            i += 2
        else:
            lit.append(c)
            i += 1
    flush()
    return out


def mysql_datetime_format_to_spark_chunks(fmt: str) -> list[str]:
    """Spark pattern CHUNKS for ``fmt``, split wherever two adjacent
    Java fields would merge into one longer field: '%e%d' is 'd' then
    'dd', but a single 'ddd' pattern renders a 3-digit day (001, not
    MySQL's '101').  Callers concat the per-chunk renders; the common
    no-hazard case returns one chunk."""
    chunks: list[str] = []
    cur = ""
    prev_field_last = ""  # last pattern letter when the previous piece was a field
    for is_field, text in _translate_pieces(fmt):
        if is_field and prev_field_last and text[0] == prev_field_last:
            chunks.append(cur)
            cur = ""
        cur += text
        prev_field_last = text[-1] if is_field else ""
    if cur:
        chunks.append(cur)
    return chunks or [""]


#: parse-side overlay: MySQL's format scan (ref func_str_to_date.cpp)
#: accepts 1-2 digit numeric fields ('%d' reads '1' AND '01'), where the
#: render-side 2-letter Java patterns are FIXED-width and reject '1,5'.
#: Single-letter Java numeric patterns parse 1-2 digits, so parsing maps
#: through these.  %y stays 'yy' (single 'y' reads '13' as year 13, not
#: 2013); %f stays 'SSSSSS'.
_PARSE_TOKENS: dict[str, str] = {
    "d": "d", "e": "d", "m": "M", "c": "M", "Y": "y", "j": "D",
    "H": "H", "k": "H", "h": "h", "I": "h", "l": "h",
    "i": "m", "s": "s", "S": "s", "T": "H:m:s", "r": "h:m:s a",
}

#: tokens that carry time-of-day: a format with NONE of these makes
#: STR_TO_DATE return a DATE, not a DATETIME (func_str_to_date.cpp —
#: MySQL types the result by which fields the format populates).
_TIME_PART_TOKENS = frozenset("fHhIiklprSsT")


#: the TIME_FORMAT tokens renderable from a TIME value's seconds (ref
#: func_time_format.cpp) — the ONE copy both the registry Column
#: builder and the dialect SQL-text fragment gate on, so the two paths
#: can never route the same format differently.
MYSQL_TIME_FORMAT_TOKENS = frozenset("HhIiklprSsTf%")


def mysql_format_tokens(fmt: str) -> set[str]:
    """The set of %-token characters in a MySQL format string.  Scans
    pairwise so a '%%'-escaped percent doesn't leak the FOLLOWING
    literal character into the set ('%k%%Y' is {'k', '%'}, not
    {'k', '%', 'Y'})."""
    out: set[str] = set()
    i = 0
    while i < len(fmt) - 1:
        if fmt[i] == "%":
            out.add(fmt[i + 1])
            i += 2
        else:
            i += 1
    return out


def mysql_format_has_time(fmt: str) -> bool:
    """True when the MySQL format string contains any time-part token."""
    return bool(mysql_format_tokens(fmt) & _TIME_PART_TOKENS)


def mysql_parse_format_to_spark(fmt: str) -> str:
    """Translate a MySQL format string to a Spark pattern for PARSING
    (STR_TO_DATE): numeric fields map to lenient single-letter Java
    patterns that accept 1-2 digits, matching MySQL's format scan.

    Falls back to the strict (fixed-width) translation when any two
    fields are ADJACENT in the format ('%Y%m%d'): Java resolves
    adjacent numeric fields only when their widths are fixed, so
    '20130501' needs 'yyyyMMdd' — leniency there would break parsing
    entirely.  Raises ``ValueError`` for composed tokens, same as the
    strict path."""
    import re as _re2

    pieces = _translate_pieces(fmt)
    adjacent = any(
        pieces[i][0] and pieces[i + 1][0] for i in range(len(pieces) - 1)
    )
    if adjacent:
        return mysql_datetime_format_to_spark(fmt)
    out: list[str] = []
    i = 0
    lit: list[str] = []

    def flush() -> None:
        if lit:
            s = "".join(lit)
            # MySQL's scan skips input whitespace around delimiters
            # ('May 1, 2013' parses under '%M %d,%Y'); Java literals
            # are exact.  Normalize pattern literals the same way
            # STR_TO_DATE normalizes its input (see
            # mysql_parse_input_norm): collapse whitespace runs,
            # drop whitespace after punctuation.
            s = _re2.sub(r"\s+", " ", s)
            s = _re2.sub(r"([^0-9A-Za-z]) ", r"\1", s)
            if any(c.isalpha() for c in s) or "'" in s:
                out.append("'" + s.replace("'", "''") + "'")
            elif s:
                out.append(s)
            lit.clear()

    while i < len(fmt):
        c = fmt[i]
        if c == "%" and i + 1 < len(fmt):
            tok = fmt[i + 1]
            lenient = _PARSE_TOKENS.get(tok)
            mapped = _TOKENS.get(tok)
            if mapped is None and tok in _TOKENS:
                raise ValueError(f"MySQL token %{tok} needs expression composition")
            flush()
            if lenient is not None:
                out.append(lenient)
            elif mapped is not None:
                out.append(mapped)
            else:
                lit.append(tok)
            i += 2
        else:
            lit.append(c)
            i += 1
    flush()
    return "".join(out)


#: the input-side twin of the pattern-literal normalization in
#: mysql_parse_format_to_spark: (collapse-ws regex, drop-ws-after-punct
#: regex with '$1' replacement) applied in that order before parsing.
MYSQL_PARSE_INPUT_NORM: tuple[tuple[str, str], ...] = (
    (r"\s+", " "),
    (r"([^0-9A-Za-z]) ", r"$1"),
)


def mysql_datetime_format_to_spark(fmt: str) -> str:
    """Translate a MySQL format string to ONE Spark datetime pattern.

    Literal (non-token) characters that are letters must be quoted in
    Java patterns; we quote every literal run defensively.  Raises
    ``ValueError`` for tokens that need expression composition
    (``%D %U %u %V %v %X %x %w``) — ``date_format_mysql`` in
    registry.py handles those above the pattern layer — and for
    adjacent-field merge hazards (``%e%d``), which the same composed
    path renders chunk-by-chunk."""
    chunks = mysql_datetime_format_to_spark_chunks(fmt)
    if len(chunks) > 1:
        raise ValueError(
            f"adjacent MySQL tokens in {fmt!r} merge into one Java field"
            " — needs chunked composition"
        )
    return chunks[0]


#: GET_FORMAT(kind, region) lookup (ref func_get_format.cpp) — the ONE
#: copy both the registry Column builder and the dialect SQL-text fold
#: read, so the two paths can never drift.  Values are MySQL's own
#: format strings, exactly what the reference emits.
GET_FORMAT_TABLE = {
    ("date", "iso"): "%Y-%m-%d", ("date", "usa"): "%m.%d.%Y",
    ("date", "eur"): "%d.%m.%Y", ("date", "jis"): "%Y-%m-%d",
    ("date", "internal"): "%Y%m%d",
    ("time", "iso"): "%H:%i:%s", ("time", "usa"): "%h:%i:%s %p",
    ("time", "eur"): "%H.%i.%s", ("time", "jis"): "%H:%i:%s",
    ("time", "internal"): "%H%i%s",
    ("datetime", "iso"): "%Y-%m-%d %H:%i:%s",
    ("datetime", "usa"): "%Y-%m-%d %H.%i.%s",
    ("datetime", "eur"): "%Y-%m-%d %H.%i.%s",
    ("datetime", "jis"): "%Y-%m-%d %H:%i:%s",
    ("datetime", "internal"): "%Y%m%d%H%i%s",
}
