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

#: reference pseudo-column name → zero-arg Column builder.  Columns in
#: the `_metadata` family require a file-based DataFrame — Spark raises
#: otherwise, same as the reference rejecting pseudo-columns on
#: non-InfiniDB tables — and `row_index` additionally requires Parquet.
PSEUDO_COLUMNS: dict[str, callable] = {
    # physical file ≅ segment file (one per column-set partition)
    "idbsegment": lambda: F.col("_metadata.file_name"),
    "idbpartition": lambda: F.col("_metadata.file_path"),
    # directory holding the segment file ≅ segment dir
    "idbsegmentdir": lambda: F.regexp_extract(
        F.col("_metadata.file_path"), "^(.*)/[^/]*$", 1
    ),
    # executor/thread placement ≅ PM / DBRoot assignment
    "idbpm": lambda: F.spark_partition_id(),
    "idbdbroot": lambda: F.spark_partition_id(),
    "idblocalpm": lambda: F.spark_partition_id(),
    # block offset within the file ≅ LBID block id
    "idbblockid": lambda: F.col("_metadata.file_block_start"),
    # extent id ≅ file identity (hashed for a stable int64)
    "idbextentid": lambda: F.xxhash64(F.col("_metadata.file_path")),
    # row id within the segment file ≅ extent-relative RID; Parquet-only
    # (`_metadata.row_index` does not exist for CSV/JSON scans)
    "idbrowid": lambda: F.col("_metadata.row_index"),
    "idbextentrelativerid": lambda: F.col("_metadata.row_index"),
}


def with_pseudo_columns(df: DataFrame, names: list[str] | None = None) -> DataFrame:
    """Attach the requested pseudo-columns (an explicit empty list
    attaches none).  Default (``names=None``) attaches every
    pseudo-column THIS source supports — analysis-probing each builder
    and skipping unsupported ones (``row_index`` is Parquet-only; the
    whole ``_metadata`` family needs a file scan), exactly like the
    reference only offering pseudo-columns on its own tables.  An
    EXPLICITLY requested unsupported column still raises."""
    if names is None:
        selected = []
        for name, fn in PSEUDO_COLUMNS.items():
            try:
                df.select(fn())  # analysis-only probe, nothing runs
            except Exception:
                continue
            selected.append(name)
    else:
        selected = list(names)
    cols: dict[str, Column] = {}
    for name in selected:
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
        cols[name] = fn()
    # one projection for the whole batch (withColumn-in-a-loop stacked
    # one Project node per pseudo-column)
    return df.withColumns(cols) if cols else df


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
    return df.withColumns(
        {
            "idbextentmin": F.min(value_col).over(w),
            "idbextentmax": F.max(value_col).over(w),
        }
    )
