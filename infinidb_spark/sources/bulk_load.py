"""Bulk delimited-file loader — the `cpimport` equivalent.

Reference: `writeengine/bulk/cpimport.cpp:102-168` + `we_bulkload.cpp`
(~99k LoC of parallel parse/convert/write with per-column buffers and a
`.bad` rejected-row file).  On Spark the whole subsystem collapses to a
schema'd CSV scan + Parquet write; what we preserve is the *contract*:

* explicit schema (schema-on-write, DDL-defined — SURVEY §1.1);
* malformed rows are not silently dropped: they are captured and
  reported (cpimport's `.bad` file ≅ the rejected DataFrame / file);
* the load reports row counts (cpimport's job log).

Scale notes: the CSV scan parallelizes by file split (128 MB default
`maxPartitionBytes`), the Parquet write preserves that parallelism; an
optional `partition_by` writes hive-style directories (the analog of the
reference's partition/segment layout, `versioning/BRM/extentmap.h:116`).
Parquet row-group stats then give extent-style min/max elimination for
free on every subsequent scan.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

_CORRUPT = "_corrupt_record"

#: sentinel for the unquoted-escape parse: a raw NUL byte can never
#: appear in MySQL-escaped text (OUTFILE writes it as ESCAPED BY + '0')
_SENT = "\x00"


@dataclass
class BulkLoadResult:
    """Outcome of a bulk load — counts are exact, computed in one pass."""

    loaded: DataFrame  #: well-formed rows, typed to the target schema
    rejected: DataFrame  #: raw text of rows that failed parse/cast (≅ .bad file)
    rows_loaded: int
    rows_rejected: int
    _raw: DataFrame | None = None  #: the cached single-pass scan

    def unpersist(self) -> None:
        """Release the single-pass scan cache once rejects have been
        persisted or inspected.  ``loaded`` stays valid (plain re-scan);
        ``rejected`` must not be re-collected afterwards (querying only
        the corrupt-record column off a raw CSV scan is disallowed)."""
        if self._raw is not None:
            self._raw.unpersist()
            self._raw = None


def bulk_load_csv(
    spark: SparkSession,
    src: str,
    schema: StructType,
    *,
    delimiter: str = "|",
    header: bool = False,
    null_value: str = "",
    quote: str | None = None,
    escape: str = "\\",
    line_sep: str | None = None,
    dest: str | None = None,
    partition_by: list[str] | None = None,
    reject_dest: str | None = None,
    multi_line: bool | None = None,
) -> BulkLoadResult:
    """Load a delimited file (tree) with an explicit schema.

    PERMISSIVE scan with a corrupt-record column splits well-formed rows
    from rejects in a single pass — rows whose field count or casts fail
    land in `rejected` with their raw text, like cpimport's `.bad` file
    (`writeengine/bulk/we_bulkloadbuffer.cpp` reject path).

    If ``dest`` is given the clean rows are written as Parquet (the
    column-store segment-file write, `writeengine/bulk/we_colbuf.cpp` ≅
    Parquet encoder) and ``loaded`` re-reads from there so downstream
    scans get row-group statistics.

    ``multi_line``: None (default) enables Spark's multiLine mode
    whenever a quote is declared — MySQL-correct (ENCLOSED fields may
    embed the line terminator) but NON-SPLITTABLE: one giant file
    parses in a single task.  Callers who know their quoted data has no
    embedded terminators pass ``multi_line=False`` to keep the scan
    split-by-offset parallel (the right call for a 100 TB load).

    A LINES TERMINATED BY string longer than one character (MySQL
    allows any string; Spark's CSV ``lineSep`` takes exactly one) is
    handled by splitting records with Hadoop's record reader and
    parsing fields with ``from_csv`` — still splittable by record.
    """
    read_schema = StructType(schema.fields[:]).add(_CORRUPT, StringType())
    multiline_ok = line_sep in (None, "\n", "\r\n")
    use_multiline = (
        multi_line if multi_line is not None else (quote is not None and multiline_ok)
    )
    if line_sep is not None and len(line_sep) != 1 and not (
        use_multiline and multiline_ok
    ):
        if header:
            raise ValueError(
                "bulk_load_csv: header=True is unsupported with a "
                "multi-character line terminator"
            )
        return _bulk_load_custom_terminator(
            spark, src, read_schema, line_sep,
            delimiter=delimiter, null_value=null_value, quote=quote,
            escape=escape, dest=dest, partition_by=partition_by,
            reject_dest=reject_dest,
        )
    if quote is None and escape:
        # unquoted mode parses with MySQL's everywhere-escaping rules
        # (_parse_unquoted_escaped) — Spark's CSV reader honors
        # `escape` only INSIDE quoted fields, so a re-ingested OUTFILE
        # row embedding the separator as esc+sep used to split on the
        # raw byte and land in rejects (the r09 documented divergence,
        # now closed; escaped line-terminator BYTES are the remaining
        # narrower one — see the parser docstring)
        if header:
            # header skip needs per-file first-line knowledge the text
            # source lacks.  A whole-line CSV read does it JVM-side:
            # sep = NUL (cannot occur in MySQL-escaped text, the same
            # invariant _parse_unquoted_escaped's sentinel relies on)
            # keeps every line a single unsplit field, quoting is
            # disabled, and Spark CSV's native header handling skips
            # the first line of EACH file — no Python round-trip for
            # the bulk of the load.
            hdr_reader = (
                spark.read.schema("value string")
                .option("header", True)
                .option("sep", "\x00")
                .option("quote", "")
                .option("mode", "PERMISSIVE")
            )
            if line_sep is not None:
                hdr_reader = hdr_reader.option("lineSep", line_sep)
            lines = hdr_reader.csv(src)
        else:
            text_reader = spark.read
            if line_sep is not None:
                text_reader = text_reader.option("lineSep", line_sep)
            lines = text_reader.text(src)
        raw = _parse_unquoted_escaped(
            lines, read_schema,
            delimiter=delimiter, escape=escape, null_value=null_value,
        )
        return _split_rejects(spark, raw, dest, partition_by, reject_dest)
    reader = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("sep", delimiter)
        .option("header", header)
        .option("nullValue", null_value)
        .option("escape", escape)
    )
    # LOAD DATA [OPTIONALLY] ENCLOSED BY / LINES TERMINATED BY map onto
    # the CSV reader's quote / lineSep; quote='' (disabled) when the
    # statement declared none, matching MySQL's unquoted default.
    reader = reader.option("quote", quote if quote is not None else "")
    if use_multiline and multiline_ok:
        # an ENCLOSED field may carry embedded line terminators (the
        # export writes them raw inside quotes); without multiLine the
        # reader splits such a record mid-row and rejects both halves.
        # multiLine handles \n and \r\n natively.
        reader = reader.option("multiLine", "true")
    elif line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    raw = reader.csv(src)
    return _split_rejects(spark, raw, dest, partition_by, reject_dest)


def _bulk_load_custom_terminator(
    spark: SparkSession,
    src: str,
    read_schema: StructType,
    line_sep: str,
    *,
    delimiter: str,
    null_value: str,
    quote: str | None,
    escape: str,
    dest: str | None,
    partition_by: list[str] | None,
    reject_dest: str | None,
) -> BulkLoadResult:
    """LINES TERMINATED BY a multi-character string (MySQL allows any
    string; Spark's CSV ``lineSep`` takes exactly one character, so the
    whole load used to crash).  Records are split by Hadoop's
    TextInputFormat — ``textinputformat.record.delimiter`` supports
    arbitrary strings and splits BY RECORD, keeping the scan parallel —
    and fields are parsed per record with ``from_csv`` under the same
    PERMISSIVE/corrupt-record contract as the main path.  One of the
    few justified RDD touches in the repo: no DataFrame source exposes
    a multi-char record delimiter."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        src,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf={"textinputformat.record.delimiter": line_sep},
    ).map(lambda kv: (kv[1],))
    lines = spark.createDataFrame(rdd, "value string").filter(
        F.col("value") != ""  # trailing terminator yields one empty record
    )
    if quote is None and escape:
        # same MySQL everywhere-escaping parse as the main path
        raw = _parse_unquoted_escaped(
            lines, read_schema,
            delimiter=delimiter, escape=escape, null_value=null_value,
        )
        return _split_rejects(spark, raw, dest, partition_by, reject_dest)
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in read_schema.fields
    )
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": _CORRUPT,
        "sep": delimiter,
        "nullValue": null_value,
        "escape": escape,
        "quote": quote if quote is not None else "",
    }
    raw = lines.select(
        F.from_csv(F.col("value"), ddl, opts).alias("_row")
    ).select("_row.*")
    return _split_rejects(spark, raw, dest, partition_by, reject_dest)


def bulk_load_jsonl(
    spark: SparkSession,
    src: str,
    schema: StructType,
    *,
    dest: str | None = None,
    partition_by: list[str] | None = None,
    reject_dest: str | None = None,
) -> BulkLoadResult:
    """Load newline-delimited JSON with an explicit schema — the
    interchange format of web-crawl / LLM-corpus dumps, under the same
    cpimport contract as the CSV path: PERMISSIVE single-pass scan,
    malformed lines captured (not dropped), exact counts.  Scale: the
    JSON scan splits by line like the CSV one (JSONL is splittable);
    everything downstream is identical."""
    read_schema = StructType(schema.fields[:]).add(_CORRUPT, StringType())
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(src)
    )
    return _split_rejects(spark, raw, dest, partition_by, reject_dest)


def _parse_unquoted_escaped(
    lines: DataFrame,
    read_schema: StructType,
    *,
    delimiter: str,
    escape: str,
    null_value: str,
) -> DataFrame:
    """Parse unquoted MySQL-escaped records (LOAD DATA with no
    ENCLOSED BY): ESCAPED BY applies EVERYWHERE, which Spark's CSV
    reader cannot do (univocity honors escapes only inside quoted
    fields) — a re-ingested OUTFILE row whose data embedded the
    separator as esc+sep used to split on the raw byte and land in
    rejects, and an escaped escape came back doubled
    (`writeengine/bulk` parses escapes unconditionally, like MySQL).

    Two sentinel passes make the field split unambiguous: escaped-
    escape then escaped-separator collapse to NUL-marked tokens (a raw
    NUL cannot occur in MySQL-escaped text), the line splits on the
    remaining separators, and each field unescapes — a field that IS
    ``esc+N`` is NULL, the mysqldump letter escapes map to their
    control characters, any other esc+X is X (this recovers the
    escaped line-terminator byte too).  Wrong field count or a failed
    cast rejects the row with its ORIGINAL text, the same
    PERMISSIVE-mode contract as the CSV path.

    Remaining (narrower) divergence, documented: a literal line-
    terminator byte inside an unquoted value is still a raw byte in
    the file, so the record SPLITTER breaks the row before this parser
    sees it — use ENCLOSED BY for data embedding line terminators."""
    data_fields = [f for f in read_schema.fields if f.name != _CORRUPT]
    n = len(data_fields)
    v = F.col("value")
    r = F.replace(v, F.lit(escape + escape), F.lit(_SENT + "E"))
    r = F.replace(r, F.lit(escape + delimiter), F.lit(_SENT + "S"))
    arr = F.split(r, _re.escape(delimiter), -1)

    def unesc(x: F.Column) -> F.Column:
        # esc+'0' (a NUL in the data) goes through its own sentinel --
        # converting it to a raw NUL before the SENT restores would
        # fabricate marker sequences out of data
        y = F.replace(x, F.lit(escape + "0"), F.lit(_SENT + "0"))
        for ch, rep in (
            ("b", "\b"), ("n", "\n"),
            ("r", "\r"), ("t", "\t"), ("Z", "\x1a"),
        ):
            y = F.replace(y, F.lit(escape + ch), F.lit(rep))
        # generic esc+X → X; (?s) so an escaped raw newline unescapes
        y = F.regexp_replace(y, "(?s)" + _re.escape(escape) + "(.)", "$1")
        y = F.replace(y, F.lit(_SENT + "S"), F.lit(delimiter))
        y = F.replace(y, F.lit(_SENT + "E"), F.lit(escape))
        y = F.replace(y, F.lit(_SENT + "0"), F.lit("\u0000"))
        out = F.when(y == null_value, F.lit(None).cast("string")).otherwise(y)
        # \N (the exact field) is NULL — tested on the PRE-unescape
        # text so a data value that unescapes to 'N' stays data
        return F.when(x == escape + "N", F.lit(None).cast("string")).otherwise(
            out
        )

    cols = []
    bad_cast = F.lit(False)
    for i, f0 in enumerate(data_fields):
        # F.get (0-based) is NULL out of bounds even under ANSI
        val = unesc(F.get(arr, i))
        if isinstance(f0.dataType, StringType):
            cols.append(val.alias(f0.name))
        else:
            cast = val.try_cast(f0.dataType)
            bad_cast = bad_cast | (val.isNotNull() & cast.isNull())
            cols.append(cast.alias(f0.name))
    corrupt = F.when((F.size(arr) != n) | bad_cast, v).alias(_CORRUPT)
    return lines.select(*cols, corrupt)


def _split_rejects(
    spark: SparkSession,
    raw: DataFrame,
    dest: str | None,
    partition_by: list[str] | None,
    reject_dest: str | None,
) -> BulkLoadResult:
    # cache + materialize: one scan feeds the good/bad split, and Spark
    # disallows querying only the corrupt-record column straight off a
    # raw CSV/JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — reading
    # from the cache is the supported path.
    raw = raw.persist()
    counts = raw.agg(
        F.count(F.lit(1)).alias("_t"), F.count(_CORRUPT).alias("_bad")
    ).collect()[0]
    rows_total, rows_rejected = counts._t, counts._bad
    rows_loaded = rows_total - rows_rejected
    loaded = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    rejected = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_record")
    )

    if reject_dest is not None and rows_rejected:
        rejected.write.mode("overwrite").text(reject_dest)
    if dest is not None:
        writer = loaded.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(dest)
        # re-read with the DECLARED schema and column order: default
        # partition-column inference re-types directory values (string
        # '000' -> int 0, destroying leading zeros) and moves partition
        # columns to the end of the schema
        loaded = spark.read.schema(loaded.schema).parquet(dest).select(
            *[f.name for f in loaded.schema.fields]
        )
    # NOTE: `raw` stays cached so the returned `rejected` plan keeps
    # reading from the cache (the corrupt-record-only-query rule rejects
    # the raw-scan plan); callers release it with `.unpersist()` once
    # rejects are persisted/inspected.
    return BulkLoadResult(loaded, rejected, rows_loaded, rows_rejected, _raw=raw)
