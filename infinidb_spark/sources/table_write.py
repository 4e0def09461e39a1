"""Managed table writes — the storage conventions that make scans prune.

Reference analog: InfiniDB's extents carry min/max ("casual
partitioning", `versioning/BRM/extentmap.h:116` + `lbidlist.h:80`) and
scans eliminate extents before reading.  Parquet gives the same skip
machinery (row-group stats, partition directories) — but only if the
writer lays data out well.  This module encodes the layout rules:

* `partition_by` — hive directories; equality/IN filters prune at the
  DIRECTORY level before any IO (the strongest elimination).
* `cluster_by` — sortWithinPartitions before write: values arrive at
  row groups in key order, so each row group's min/max is TIGHT and
  range filters skip most groups (exactly the reference's per-extent
  min/max validity).  Without clustering, every row group spans the
  whole value range and stats never eliminate anything.
* `max_records_per_file` — bounds file size (≅ extent size), keeping
  elimination granular and tasks even.
* snappy Parquet — the reference's own block compression
  (`utils/compress/idbcompress.cpp:29`), Spark's default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    out = df
    if cluster_by:
        if partition_by:
            out = out.repartition(*[out[c] for c in partition_by])
            # the partition columns LEAD the sort: Spark's dynamic-
            # partition write requires ordering on them and would
            # otherwise insert its own SortExec on top, double-sorting
            # and (under spill-merge) destroying the cluster order
            out = out.sortWithinPartitions(*partition_by, *cluster_by)
        else:
            # range-shuffle FIRST: sorting only within the arriving
            # (hash/round-robin) partitioning leaves every output file
            # spanning the full key range — per-file min/max never
            # eliminates anything (same shape as layout.cluster_write)
            out = out.repartitionByRange(*cluster_by).sortWithinPartitions(
                *cluster_by
            )
    writer = out.write.mode(mode).option("compression", "snappy")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
