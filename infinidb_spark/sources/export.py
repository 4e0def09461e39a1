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
        # backtick-quoted: a column literally named 'price.usd' must
        # not parse as struct-field access (df[name] has the same trap)
        c = F.col("`" + f.name.replace("`", "``") + "`").cast("string")
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
        # ASCII NUL renders as escape + the DIGIT zero in every branch
        # (MySQL OUTFILE rule) — also the invariant bulk_load's
        # NUL-sentinel parser relies on ("a raw NUL cannot occur in
        # MySQL-escaped text"); the loader decodes esc+'0' back
        c = F.replace(c, F.lit("\x00"), F.lit(escape + "0"))
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

    The count comes from the Observation API — measured DURING the
    single write pass, so the source query runs exactly once with no
    persist (the old persist+count cached the whole export just to
    count it — doubled I/O at scale).  It is not a byte-scan of the
    output files: an escaped line terminator still contains the raw
    terminator byte, so terminator-counting over-reports.

    All path operations go through the Hadoop FileSystem of the target
    path, not ``os.path``: the writer itself resolves paths against the
    default Hadoop FS, so on a cluster whose default FS is HDFS (or
    with an explicit s3a://... path) a driver-local ``os.path.exists``
    never saw the real target — overwrite protection silently vanished
    and single_file mode failed after writing.
    """
    from pyspark.sql import Observation

    spark = df.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        raise OutfileExistsError(f"File '{path}' already exists")
    tmp = path + "__outfile_tmp"
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    if single_file and fs.exists(jtmp):
        fs.delete(jtmp, True)  # stale leftover from an earlier failure
    out = df.select(
        _line_expr(df, sep, quote, escape, line_sep, quote_optional).alias("value")
    )
    if single_file:
        out = out.coalesce(1)
    obs = Observation()
    out = out.observe(obs, F.count(F.lit(1)).alias("n"))
    target = tmp if single_file else path
    out.write.format("text").option("lineSep", line_sep).save(target)
    total = obs.get["n"]
    if single_file:
        jtarget = jvm.org.apache.hadoop.fs.Path(target)
        try:
            parts = [
                st.getPath()
                for st in fs.globStatus(
                    jvm.org.apache.hadoop.fs.Path(target, "part-*")
                )
            ]
            if len(parts) != 1:
                # explicit raise, not assert (stripped under python -O)
                raise RuntimeError(
                    f"expected exactly one part file in {target}, "
                    f"found {len(parts)}"
                )
            fs.rename(parts[0], jpath)
        finally:
            # never leave the tmp dir behind: a stale one would make
            # the NEXT export die inside writer.save with a generic
            # path-exists error instead of OutfileExistsError
            fs.delete(jtarget, True)
    return int(total)
