"""SELECT ... INTO OUTFILE — the delimited-text export sink.

The reference exposes MySQL's ``SELECT ... INTO OUTFILE`` surface (the
mysqld front-end handles it above the storage engine; its natural pair
is re-ingest via cpimport, ``writeengine/bulk/cpimport.cpp:102``).
Semantics mirrored here: headerless delimited text, ``\\N`` for NULL,
default tab field / newline line terminators, ESCAPED BY escaping,
[OPTIONALLY] ENCLOSED BY quoting, refuse-to-overwrite.

Lines are assembled as Column expressions (escape → enclose →
``concat_ws``) and written through the text sink — exact control over
the byte format, all codegen, no writer-library quoting heuristics.

Scale design: the library default writes a DIRECTORY of part files —
every executor streams its partitions straight to the sink, no
single-writer bottleneck, the only layout that works at 100 TB.
``single_file=True`` gives MySQL's literal one-file contract (coalesce
to one writer + rename) — correct for small result exports through the
dialect surface, an anti-pattern for bulk data, and says so.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: MySQL writes NULL as \N (never enclosed) in OUTFILE exports.
NULL_MARKER = r"\N"


class OutfileExistsError(FileExistsError):
    """MySQL ER_FILE_EXISTS analog: INTO OUTFILE never overwrites."""


def _line_expr(
    df: DataFrame, sep: str, quote: str | None, escape: str, line_sep: str,
    quote_optional: bool,
):
    """One string Column per row in MySQL OUTFILE byte format.

    Without ENCLOSED BY, MySQL escapes the escape char, the field
    separator and the line terminator inside values; with it, fields
    are enclosed (strings only under OPTIONALLY) and embedded quote
    chars escaped.  NULL renders as \\N, never enclosed.
    """
    fields = []
    for f in df.schema.fields:
        c = F.col(f.name).cast("string")
        if quote is None:
            for special in (escape, sep, line_sep):
                c = F.replace(c, F.lit(special), F.lit(escape + special))
        elif not quote_optional or isinstance(f.dataType, StringType):
            if escape != quote:
                c = F.replace(c, F.lit(escape), F.lit(escape + escape))
            # when ENCLOSED BY == ESCAPED BY (CSV-style), doubling the
            # quote IS the escape — a separate escape pass would turn
            # every embedded quote into four characters
            c = F.replace(c, F.lit(quote), F.lit(escape + quote))
            # MySQL escapes the first char of LINES TERMINATED BY even
            # inside enclosed fields (SELECT INTO OUTFILE escaping rules)
            c = F.replace(c, F.lit(line_sep[0]), F.lit(escape + line_sep[0]))
            c = F.concat(F.lit(quote), c, F.lit(quote))
        else:
            # OPTIONALLY ENCLOSED leaves non-string fields unenclosed,
            # but MySQL still applies ESCAPED BY to them — an exotic
            # separator colliding with numeric/date/time text ('.',
            # '-', ':') would otherwise split the line on re-import
            for special in (escape, sep, line_sep):
                c = F.replace(c, F.lit(special), F.lit(escape + special))
        fields.append(F.coalesce(c, F.lit(NULL_MARKER)))
    return F.concat_ws(sep, *fields)


def export_outfile(
    df: DataFrame,
    path: str,
    *,
    sep: str = "\t",
    quote: str | None = None,
    escape: str = "\\",
    line_sep: str = "\n",
    quote_optional: bool = True,
    single_file: bool = False,
) -> int:
    """Write ``df`` as MySQL-OUTFILE-style delimited text; return the
    row count (MySQL reports rows written).

    The count is a ``count()`` of the PERSISTED line relation, not a
    byte-scan of the output files: an escaped line terminator still
    contains the raw terminator byte (and enclosed values may embed
    it), so terminator-counting over-reports for such data.  The
    persist keeps the source query from running twice (one compute,
    cached for the write); exports big enough for the cache to matter
    should carry their row count from upstream instead.
    """
    if os.path.exists(path):
        raise OutfileExistsError(f"File '{path}' already exists")
    tmp = path + "__outfile_tmp"
    if single_file and os.path.exists(tmp):
        shutil.rmtree(tmp)  # stale leftover from an earlier failure
    out = df.select(
        _line_expr(df, sep, quote, escape, line_sep, quote_optional).alias("value")
    )
    if single_file:
        out = out.coalesce(1)
    out = out.persist()
    try:
        total = out.count()
        writer = out.write.format("text").option("lineSep", line_sep)
        target = tmp if single_file else path
        writer.save(target)
    finally:
        out.unpersist()
    if single_file:
        try:
            parts = sorted(glob.glob(os.path.join(glob.escape(target), "part-*")))
            if len(parts) != 1:
                # explicit raise, not assert (stripped under python -O)
                raise RuntimeError(
                    f"expected exactly one part file in {target}, "
                    f"found {len(parts)}"
                )
            shutil.move(parts[0], path)
        finally:
            # never leave the tmp dir behind: a stale one would make
            # the NEXT export die inside writer.save with a generic
            # path-exists error instead of OutfileExistsError
            shutil.rmtree(target, ignore_errors=True)
    return total
