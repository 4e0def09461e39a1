"""Physical layout (sources/layout.py): clustering sharpens manifest
elimination; compaction collapses DML-append small files atomically."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from infinidb_spark.operators.dml import create_table, insert_into
from infinidb_spark.sources.layout import (
    cluster_write,
    compact_table,
    table_file_stats,
)
from infinidb_spark.sources.manifest import build_manifest, prune

from conftest import SF_DIR

LINEITEM = os.path.join(SF_DIR, "lineitem.parquet")


def test_clustering_sharpens_manifest_elimination(spark, tmp_path):
    """Random layout → overlapping per-file ranges → little pruning.
    Clustered layout → disjoint ranges → all but one file eliminated."""
    li = spark.read.parquet(LINEITEM).select("l_orderkey", "l_quantity")

    shuffled = str(tmp_path / "shuffled")
    # round-robin on an unrelated expression: every file spans the key range
    li.repartition(8, F.col("l_quantity")).write.parquet(shuffled)
    clustered = str(tmp_path / "clustered")
    cluster_write(li, clustered, ["l_orderkey"], n_files=8)

    pred = [("l_orderkey", "between", 0, 50)]
    kept_shuffled = prune(build_manifest(shuffled), pred)
    kept_clustered = prune(build_manifest(clustered), pred)
    assert len(kept_shuffled) == 8          # stats useless on random layout
    assert len(kept_clustered) == 1         # disjoint ranges → one survivor

    # clustered scan is still the same relation
    a = spark.read.parquet(clustered).agg(F.sum("l_orderkey"), F.count(F.lit(1)))
    b = li.agg(F.sum("l_orderkey"), F.count(F.lit(1)))
    assert a.collect() == b.collect()


def test_compact_table_collapses_appends(spark, tmp_path):
    nation = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    table = str(tmp_path / "nation_m")
    create_table(nation, table)
    for _ in range(5):
        insert_into(nation.limit(3), table)
    n_before, total = table_file_stats(table)
    assert n_before >= 6                    # base + 5 appended file sets
    expected = nation.count() + 15

    n_after = compact_table(spark, table, target_file_bytes=total + 1)
    assert n_after == 1
    assert table_file_stats(table)[0] == 1
    assert spark.read.parquet(table).count() == expected
    # still a symlinked managed table (atomic-swap protocol intact)
    assert os.path.islink(table)


def test_compact_with_recluster(spark, tmp_path):
    li = spark.read.parquet(LINEITEM).select("l_orderkey", "l_quantity")
    table = str(tmp_path / "li_m")
    create_table(li.repartition(6, "l_quantity"), table)
    _, total = table_file_stats(table)
    compact_table(
        spark, table, target_file_bytes=total // 3, cluster_by=["l_orderkey"]
    )
    kept = prune(
        build_manifest(os.path.realpath(table)),
        [("l_orderkey", "between", 0, 10)],
    )
    assert len(kept) == 1                   # re-clustered → prunable again
    assert spark.read.parquet(table).count() == li.count()


def test_zorder_keeps_both_dimensions_prunable(spark, tmp_path):
    """Single-column clustering makes only that column prunable; Z-order
    prunes meaningfully on EITHER clustered column."""
    from infinidb_spark.sources.layout import zorder_write

    li = spark.read.parquet(LINEITEM).select("l_orderkey", "l_partkey")
    n_files = 16

    single = str(tmp_path / "single")
    cluster_write(li, single, ["l_orderkey"], n_files=n_files)
    zed = str(tmp_path / "zorder")
    zorder_write(li, zed, ["l_orderkey", "l_partkey"], n_files=n_files)

    # identical relation either way
    assert (
        spark.read.parquet(zed).orderBy("l_orderkey", "l_partkey").collect()
        == li.orderBy("l_orderkey", "l_partkey").collect()
    )

    key_hi = li.agg(F.max("l_orderkey")).collect()[0][0]
    part_hi = li.agg(F.max("l_partkey")).collect()[0][0]
    key_pred = [("l_orderkey", "between", 0, key_hi // 10)]
    part_pred = [("l_partkey", "between", 0, part_hi // 10)]

    def kept(path, pred):
        return len(prune(build_manifest(path), pred))

    # the secondary column is unprunable under single-column clustering…
    assert kept(single, part_pred) == n_files
    # …while z-order prunes BOTH dimensions well below the file count
    assert kept(zed, key_pred) <= n_files // 2
    assert kept(zed, part_pred) <= n_files // 2
    # and the primary column stays prunable too (sanity on single)
    assert kept(single, key_pred) <= 2


def test_compact_partitioned_table_reduces_files(spark, tmp_path):
    """r10 review fix: compacting a hive-partitioned table used to
    round-robin repartition, writing one file per partition VALUE per
    task (n_target × n_values files — MULTIPLYING the count).  Each
    partition value now compacts to target-sized files."""
    import glob
    import os

    table = str(tmp_path / "pt")
    df = spark.range(2000).selectExpr(
        "id", "CAST(id % 5 AS STRING) AS pv", "id * 2 AS v"
    )
    # many tasks × 5 partition values → lots of small files
    df.repartition(8).write.partitionBy("pv").parquet(table)
    before = len(glob.glob(os.path.join(table, "pv=*", "*.parquet")))
    assert before >= 20
    n_after = compact_table(spark, table, target_file_bytes=1 << 30)
    files = glob.glob(os.path.join(table, "pv=*", "*.parquet"))
    assert len(files) == 5, files  # one file per partition value
    assert n_after == 5
    # data intact, partition columns preserved
    got = spark.read.parquet(table)
    assert got.count() == 2000
    assert set(got.columns) == {"id", "pv", "v"}


def test_validate_check_empty_input_reports_zero(spark):
    """r10 review fix: sum over zero rows is NULL — an empty batch must
    report 0 violations, not NULLs that fall out of threshold gates."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.validate import check

    df = spark.range(10).filter("id < 0")  # empty
    out = check(df, {"pos": F.col("id") >= 0}).collect()
    assert out[0]["n_violations"] == 0
    assert out[0]["violation_rate"] == 0.0
