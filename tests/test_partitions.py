"""Logical-partition admin: the cal*partitions UDF surface.

Reference: `dbcon/mysql/ha_calpont_partition.cpp` — show/disable/
enable/drop by partition id (854-1160) and by column value range
(`partitionByValue_common`, 530-780: a partition qualifies iff its
[min,max] is fully contained in [start,end]; NULL bound = ±infinity;
stat-less extents are never selected).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from infinidb_spark.operators import partitions as P
from infinidb_spark.operators.dml import create_table, read_table
from infinidb_spark.session import InfiniSession, load_tables


@pytest.fixture()
def orders_8(spark, sf_dir):
    """Managed orders clustered into 8 disjoint o_orderkey ranges."""
    workdir = tempfile.mkdtemp(prefix="infinidb_part_")
    table = os.path.join(workdir, "orders")
    df = (
        load_tables(spark, sf_dir, names=("orders",))["orders"]
        .repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    create_table(df, table)
    yield table
    shutil.rmtree(workdir, ignore_errors=True)


def test_show_disable_enable_roundtrip(spark, orders_8):
    files = P._part_files(P._real(orders_8))
    assert len(files) == 8
    total = read_table(spark, orders_8).count()

    assert "successfully" in P.disable_partitions(orders_8, "0,3")
    rel = P.show_partitions(spark, orders_8, "o_orderkey")
    status = {r["part"]: r["status"] for r in rel.collect()}
    assert status[0] == "Disabled" and status[3] == "Disabled"
    assert status[1] == "Enabled"
    # scans see only enabled files
    visible = sum(
        spark.read.parquet(p).count() for p in P.enabled_files(orders_8)
    )
    assert visible < total

    P.enable_partitions(orders_8, [files[0], files[3]])
    assert P.disabled_partitions(orders_8) == set()


def test_partitions_by_value_containment(spark, orders_8):
    rel = P.show_partitions(spark, orders_8, "o_orderkey").collect()
    # ranges are disjoint ascending; take file 2's exact [min,max]
    r2 = next(r for r in rel if r["part"] == 2)
    lo, hi = int(r2["min"]), int(r2["max"])

    # exact containment selects file 2 only
    assert P.partitions_by_value(orders_8, "o_orderkey", lo, hi) == [r2["file"]]
    # a strictly interior range selects nothing (min < start)
    assert P.partitions_by_value(orders_8, "o_orderkey", lo + 1, hi) == []
    # NULL bounds = ±infinity: every partition qualifies
    assert len(P.partitions_by_value(orders_8, "o_orderkey", None, None)) == 8
    # a column with no footer stats is never selected (CPINVALID analog)
    assert P.partitions_by_value(orders_8, "no_such_col", None, None) == []


def test_byvalue_admin_statements(spark, sf_dir):
    sess = InfiniSession(spark, sf_dir)
    df = (
        sess.tables["orders"]
        .repartitionByRange(4, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    sess.create_table_as("orders_m", df)
    total = sess.sql("select count(*) c from orders_m").collect()[0]["c"]

    shown = sess.execute(
        "select calshowpartitionsbyvalue('orders_m', 'o_orderkey', NULL, NULL)"
    )
    assert shown.count("Enabled") == 4

    rel = P.show_partitions(spark, sess._managed["orders_m"], "o_orderkey")
    r0 = next(r for r in rel.collect() if r["part"] == 0)
    lo, hi = int(r0["min"]), int(r0["max"])

    msg = sess.execute(
        f"select caldisablepartitionsbyvalue('orders_m', 'o_orderkey', {lo}, {hi})"
    )
    assert "disabled successfully" in msg
    after = sess.sql("select count(*) c from orders_m").collect()[0]["c"]
    assert after < total

    # out-of-range → the reference's no-partition warning, no state change
    warn = sess.execute(
        "select caldroppartitionsbyvalue('orders_m', 'o_orderkey', -500, -100)"
    )
    assert "No partition found" in warn

    sess.execute(
        f"select calenablepartitionsbyvalue('orders_m', 'o_orderkey', {lo}, {hi})"
    )
    assert sess.sql("select count(*) c from orders_m").collect()[0]["c"] == total

    # droppartitionsbyvalue physically removes the range
    sess.execute(
        f"select caldroppartitionsbyvalue('orders_m', 'o_orderkey', {lo}, {hi})"
    )
    assert sess.sql("select count(*) c from orders_m").collect()[0]["c"] == total - (
        hi - lo + 1
    ) or sess.sql("select count(*) c from orders_m").collect()[0]["c"] < total


def test_lastinsertid_and_version_and_onlinealter(spark, sf_dir):
    sess = InfiniSession(spark, sf_dir)
    sess.execute(
        "CREATE TABLE ai_t (id INT AUTO_INCREMENT, v VARCHAR(10))"
    )
    assert sess.execute("select callastinsertid('ai_t')") == 0
    sess.execute("INSERT INTO ai_t (v) VALUES ('a'), ('b'), ('c')")
    assert sess.execute("select callastinsertid('ai_t')") == 3

    ver = sess.execute("select calgetversion()")
    assert "infinidb_spark" in ver and "Spark" in ver

    sess.execute(
        "select calonlinealter('ALTER TABLE ai_t ADD COLUMN w DOUBLE')"
    )
    cols = sess.sql("select * from ai_t").columns
    assert "w" in cols

    # no AUTO_INCREMENT column → error, like the reference's UDF message
    sess.create_table_as("plain_t", sess.tables["nation"])
    with pytest.raises(ValueError):
        sess.execute("select callastinsertid('plain_t')")


def test_byvalue_timestamp_bounds(spark, sf_dir):
    """String bounds coerce to the column's stat type (IDB_format
    analog) — a date-ranged byvalue selection on o_orderdate."""
    sess = InfiniSession(spark, sf_dir)
    df = (
        sess.tables["orders"]
        .repartitionByRange(4, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
    )
    sess.create_table_as("orders_d", df)
    table_dir = sess._managed["orders_d"]
    rel = P.show_partitions(spark, table_dir, "o_orderdate").collect()
    r0 = next(r for r in rel if r["part"] == 0)
    sel = P.partitions_by_value(
        table_dir, "o_orderdate", None, r0["max"]
    )
    assert sel == [r0["file"]]


def test_drop_by_value_never_selects_null_bearing_partitions(spark, tmp_path):
    """r10 review fix: Parquet min/max exclude NULLs, so a partition
    whose stats sit inside [start, end] can still hold NULL rows that
    are NOT in the value range — selecting it for drop destroyed them."""
    import os

    from infinidb_spark.operators.partitions import partitions_by_value

    table = str(tmp_path / "t")
    os.makedirs(table)
    spark.createDataFrame(
        [(5, "a"), (50, "b"), (None, "null-row")], "v int, s string"
    ).coalesce(1).write.mode("append").parquet(table)
    spark.createDataFrame(
        [(10, "c"), (20, "d")], "v int, s string"
    ).coalesce(1).write.mode("append").parquet(table)
    sel = partitions_by_value(table, "v", 0, 100)
    # only the NULL-free partition qualifies
    assert len(sel) == 1
