"""Batch DML over Parquet tables — INSERT / UPDATE / DELETE.

Reference: row DML flows through DMLProc + the version buffer for MVCC
(`dbcon/mysql/ha_calpont_dml.cpp:605` `ha_calpont_impl_write_row_`,
`dbcon/dmlpackage/dml.y:424-530`, VSS `versioning/BRM/vss.h:180`);
UPDATE/DELETE internally run a SELECT to locate rows
(`calpontselectexecutionplan.h:98-109` IDB_QUERYTYPE UPDATE/DELETE).

Spark-native model: **copy-on-write** over Parquet directories — the
same model Delta/Iceberg v1 use, and the honest analog of the
reference's version buffer (old data remains readable until the swap).

* INSERT  = append new Parquet files to the table directory (exactly
  cpimport's incremental load; no rewrite).
* UPDATE  = SELECT-transform-rewrite: read, apply SET under WHERE,
  write a new version directory, atomically swap.
* DELETE  = read, anti-filter, rewrite, swap.

Atomicity: writes land in `<table>.__new__`, the live directory is
replaced with a rename pair — a crash leaves either the old or the new
version, never a mix (single-writer; a real lakehouse deployment swaps
in a transaction log instead — out of scope, SURVEY §1.1).

Scale notes: UPDATE/DELETE rewrite cost is proportional to the data
scanned, so at 100 TB the WHERE should prune partitions — pass
`partition_by` at table-creation time and predicate on those columns;
unfiltered partitions could be hard-linked rather than rewritten in a
future optimization (the reference's block-level version buffer is the
same idea at 8 KB granularity).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession


def _swap(table_dir: str, new_dir: str) -> None:
    old = table_dir.rstrip("/") + ".__old__"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(table_dir, old)
    os.rename(new_dir, table_dir)
    shutil.rmtree(old)


def create_table(df: DataFrame, table_dir: str, partition_by: list[str] | None = None) -> None:
    """Materialize a DataFrame as a managed Parquet table directory."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_dir)


def insert_into(df: DataFrame, table_dir: str) -> None:
    """INSERT: append-only new files — no existing file is touched
    (≅ cpimport incremental load / ha_calpont_impl_write_row_)."""
    df.write.mode("append").parquet(table_dir)


def update_table(
    spark: SparkSession,
    table_dir: str,
    condition: Column,
    assignments: dict[str, Column],
) -> int:
    """UPDATE <table> SET <assignments> WHERE <condition>.

    Returns the number of rows updated.  Copy-on-write: the SELECT
    locates rows (the reference's internal UPDATE-as-SELECT), the
    rewrite applies SET to matching rows and passes others through.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(table_dir)
    n = df.filter(condition).count()
    updated = df
    for col_name, expr in assignments.items():
        updated = updated.withColumn(
            col_name, F.when(condition, expr).otherwise(F.col(col_name))
        )
    new_dir = table_dir.rstrip("/") + ".__new__"
    updated.write.mode("overwrite").parquet(new_dir)
    _swap(table_dir, new_dir)
    return n


def delete_from(spark: SparkSession, table_dir: str, condition: Column) -> int:
    """DELETE FROM <table> WHERE <condition>; returns rows deleted."""
    df = spark.read.parquet(table_dir)
    n = df.filter(condition).count()
    kept = df.filter(~condition)
    new_dir = table_dir.rstrip("/") + ".__new__"
    kept.write.mode("overwrite").parquet(new_dir)
    _swap(table_dir, new_dir)
    return n
