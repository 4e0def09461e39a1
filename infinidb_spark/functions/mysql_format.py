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
