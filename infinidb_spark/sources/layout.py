"""Physical-layout operators: sort-clustered writes + file compaction.

Casual-partitioning elimination (sources/manifest.py) only pays off
when each file covers a NARROW key range — the reference makes the same
point about extent min/max: stats are near-useless on randomly-loaded
data and sharpest on ordered loads (`dbcon/joblist/lbidlist.h:80-114`;
extent map `versioning/BRM/extentmap.h:103`).

* ``cluster_write`` — range-repartition on the cluster keys, sort
  within partitions, write: every output file covers a disjoint key
  range, so a manifest predicate prunes to O(1) files instead of all
  of them.  This is the Delta/Iceberg "OPTIMIZE ... ZORDER/ORDER BY"
  shape, built from two Spark primitives (one range shuffle).
* ``compact_table`` — rewrite a managed table's accumulated small
  files (INSERT appends, operators/dml.py) into size-targeted files,
  swapped in atomically.  File count comes from footer metadata, not a
  data scan; at 100 TB compaction is the difference between a scan
  scheduling millions of tiny splits and thousands of full ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.operators.dml import _new_version_dir, _swap

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
) -> None:
    """Write ``df`` range-clustered on ``cluster_by``: one range shuffle,
    each file a disjoint sorted key range (sharpest possible per-file
    min/max for manifest elimination and row-group skip)."""
    part = (
        df.repartitionByRange(n_files, *cluster_by)
        if n_files
        else df.repartitionByRange(*cluster_by)
    )
    part.sortWithinPartitions(*cluster_by).write.mode("overwrite").parquet(path)


def zorder_value(cols: list, bits: int = 16):
    """Interleave the bits of rank-normalized columns into one Z-value.

    Each column is first rank-normalized to [0, 2^bits) with
    ``percent_rank`` (making the curve robust to skew and to arbitrary
    numeric ranges), then bit-interleaved.  Range-partitioning on the
    Z-value gives every file a tight hyper-rectangle in ALL clustered
    dimensions — single-column range clustering makes one predicate
    prunable, Z-order keeps each of them prunable.
    """
    from pyspark.sql.window import Window

    max_v = (1 << bits) - 1
    quantized = [
        F.least(
            F.lit(max_v),
            F.floor(F.percent_rank().over(Window.orderBy(c)) * (1 << bits)).cast("long"),
        )
        for c in cols
    ]
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for q in quantized:
            # Column & / | are LOGICAL in PySpark — bitwise needs methods
            z = F.shiftleft(z, 1).bitwiseOR(F.shiftright(q, b).bitwiseAND(one))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` Z-order-clustered on ``cluster_by`` columns.

    Note the rank-normalization uses a global window (one-pass sort of
    the key projection) — at 100 TB replace ``percent_rank`` with an
    approx-quantile lookup table (computed once, broadcast) to keep the
    quantization shuffle-free; the interleave/write path is unchanged.
    """
    z = zorder_value([F.col(c) for c in cluster_by], bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def table_file_stats(table_dir: str) -> tuple[int, int]:
    """(n_files, total_bytes) from directory metadata — no data scan."""
    real = os.path.realpath(table_dir)
    files = [
        os.path.join(real, f)
        for f in os.listdir(real)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_table(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite a managed table into ``ceil(total/target)`` files
    (optionally re-clustering), atomically swapped in via the DML
    version-directory protocol.  Returns the new file count."""
    n_files, total = table_file_stats(table_dir)
    n_target = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(table_dir)
    new_dir = _new_version_dir(table_dir)
    if cluster_by:
        (
            df.repartitionByRange(n_target, *cluster_by)
            .sortWithinPartitions(*cluster_by)
            .write.mode("overwrite")
            .parquet(new_dir)
        )
    else:
        df.repartition(n_target).write.mode("overwrite").parquet(new_dir)
    _swap(table_dir, new_dir)
    return table_file_stats(table_dir)[0]
