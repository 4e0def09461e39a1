"""Bucketed tables — shuffle-free co-located joins.

Reference analog: InfiniDB co-locates join work by shipping the small
side to every PM (`batchprimitiveprocessor.h:257` PM join) because its
storage has no key-based placement.  Spark's bucketing gives the
stronger primitive the reference lacks: both sides pre-hash-partitioned
on the join key AT WRITE TIME, so a fact-fact join needs NO exchange at
read time — the 100 TB answer for repeated large-large joins where
neither side broadcasts (e.g. lineitem ⋈ orders on the order key).

Write once, join many: the bucket count is the write-time analog of
`spark.sql.shuffle.partitions` — size it so (table_size / buckets) fits
an executor core's memory at target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Save as a bucketed (optionally sorted) managed table.

    Sorted buckets additionally enable merge-join without a sort step —
    the full TupleBPS scan → join pipeline with zero shuffle AND zero
    sort at query time.

    The input repartitions on the bucket column first (same murmur3
    hash family the bucket spec uses), so each task holds exactly one
    bucket and every bucket lands in ONE file.  Without it each input
    task wrote a file per bucket — n_tasks × n_buckets small files at
    scale — and Spark only honors the sortBy metadata (eliding the
    query-time Sort) when a bucket has a single file (SPARK-19256).
    """
    df = df.repartition(n_buckets, df[bucket_col])
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    sorted_scan: bool = False,
) -> DataFrame:
    """Join two bucketed tables on their bucket key — planner elides
    both Exchanges when bucket specs line up (verify with
    `df.explain()`: no Exchange above either scan).

    ``sorted_scan=True`` additionally elides the merge-join Sort by
    enabling ``spark.sql.legacy.bucketedTableScan.outputOrdering``
    (off by default since Spark 3.0 because a bucket spread over
    MULTIPLE files is only per-file sorted).  Safe exactly when every
    joined bucketed table was written by ``write_bucketed`` with a
    ``sort_col``: its repartition guarantees one file per bucket.
    The flag is session-wide — callers joining foreign bucketed
    tables with multi-file buckets must leave it off."""
    if sorted_scan:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    return spark.table(left_table).join(spark.table(right_table), on, how)
