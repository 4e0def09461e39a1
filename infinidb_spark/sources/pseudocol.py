"""Pseudo-columns — storage-location metadata exposed as columns.

Reference: `dbcon/mysql/ha_pseudocolumn.cpp:29-51` registers
`idbdbroot, idbpm, idbpartition, idbsegment, idbsegmentdir,
idbextentmin, idbextentmax, idbextentid, idbextentrelativerid,
idbblockid, idblocalpm` — functions revealing which DBRoot/PM/
partition/segment/extent a row physically lives in
(`dbcon/joblist/primitivestep.h:1348` `PseudoColStep`).

Spark's physical analogs: the Parquet `_metadata` struct (file path,
name, size, block start) for file/segment identity, partition id for
the executor-placement family, and per-file window min/max for the
extent-statistics family (extent ≅ Parquet file/row-group, SURVEY §1.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: reference pseudo-column name → builder taking the source DataFrame.
#: Columns in the `_metadata` family require a file-based DataFrame
#: (parquet/csv scan) — Spark raises otherwise, same as the reference
#: rejecting pseudo-columns on non-InfiniDB tables.
PSEUDO_COLUMNS = {
    # physical file ≅ segment file (one per column-set partition)
    "idbsegment": lambda df: F.col("_metadata.file_name"),
    "idbpartition": lambda df: F.col("_metadata.file_path"),
    # executor/thread placement ≅ PM / DBRoot assignment
    "idbpm": lambda df: F.spark_partition_id(),
    "idbdbroot": lambda df: F.spark_partition_id(),
    "idblocalpm": lambda df: F.spark_partition_id(),
    # block offset within the file ≅ LBID block id
    "idbblockid": lambda df: F.col("_metadata.file_block_start"),
    # extent id ≅ file identity (hashed for a stable int64)
    "idbextentid": lambda df: F.xxhash64(F.col("_metadata.file_path")),
    # row id within the segment file ≅ extent-relative RID
    "idbrowid": lambda df: F.col("_metadata.row_index"),
}


def with_pseudo_columns(df: DataFrame, names: list[str] | None = None) -> DataFrame:
    """Attach the requested pseudo-columns (default: all; an explicit
    empty list attaches none — only None means 'all')."""
    out = df
    for name in (names if names is not None else list(PSEUDO_COLUMNS)):
        fn = PSEUDO_COLUMNS.get(name)
        if fn is None:
            # a bare KeyError gave no hint where the per-extent stats
            # live — route the caller instead of stranding them
            extra = (
                " (extent min/max stats are exposed by extent_min_max)"
                if name in ("idbextentmin", "idbextentmax")
                else ""
            )
            raise ValueError(
                f"unknown pseudo-column {name!r}; supported: "
                f"{sorted(PSEUDO_COLUMNS)}{extra}"
            )
        out = out.withColumn(name, fn(df))
    return out


def extent_min_max(df: DataFrame, value_col: str) -> DataFrame:
    """`idbextentmin` / `idbextentmax` — the casual-partitioning stats
    for the extent a row lives in (`dbcon/joblist/lbidlist.h:80-114`,
    min/max per extent used for elimination).

    Computed as per-file window aggregates over the Parquet scan; these
    are exactly the row-group/file statistics Parquet already stores —
    this operator *exposes* them rowwise, while scan-time elimination
    itself is Spark's Parquet filter pushdown (free, SURVEY §4).
    """
    w = Window.partitionBy(F.col("_metadata.file_path"))
    return df.withColumn("idbextentmin", F.min(value_col).over(w)).withColumn(
        "idbextentmax", F.max(value_col).over(w)
    )
