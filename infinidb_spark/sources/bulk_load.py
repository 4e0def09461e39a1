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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

_CORRUPT = "_corrupt_record"


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
    """
    read_schema = StructType(schema.fields[:]).add(_CORRUPT, StringType())
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
    if quote is not None and line_sep in (None, "\n", "\r\n"):
        # an ENCLOSED field may carry embedded line terminators (the
        # export writes them raw inside quotes); without multiLine the
        # reader splits such a record mid-row and rejects both halves.
        # multiLine handles \n and \r\n natively; an exotic declared
        # terminator falls through to lineSep below (mutually exclusive
        # options in Spark's CSV source)
        reader = reader.option("multiLine", "true")
    elif line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    # KNOWN DIVERGENCE (documented): in unquoted mode Spark's CSV
    # reader only honors `escape` INSIDE quoted fields, so a MySQL
    # OUTFILE row whose data embeds the separator as '\|' still splits
    # on the raw byte and lands in the reject relation — re-export with
    # ENCLOSED BY for lossless round-trips (plans/sources.py pins the
    # quoted round-trip end-to-end).
    raw = reader.csv(src)
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
