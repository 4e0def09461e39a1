"""Batch DML (copy-on-write Parquet): insert/update/delete semantics."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from infinidb_spark.operators.dml import (
    create_table,
    delete_from,
    insert_into,
    update_table,
)
from infinidb_spark.session import load_tables


@pytest.fixture()
def nation_table(spark, sf_dir):
    workdir = tempfile.mkdtemp(prefix="infinidb_dml_")
    table = os.path.join(workdir, "nation")
    create_table(load_tables(spark, sf_dir, names=("nation",))["nation"], table)
    yield table
    shutil.rmtree(workdir, ignore_errors=True)


def test_insert_appends_without_rewrite(spark, nation_table):
    before_files = set(os.listdir(nation_table))
    n0 = spark.read.parquet(nation_table).count()
    new_rows = spark.createDataFrame(
        [(99, "NEWLAND", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    insert_into(new_rows, nation_table)
    after = spark.read.parquet(nation_table)
    assert after.count() == n0 + 1
    assert after.filter(F.col("n_name") == "NEWLAND").count() == 1
    # append-only: every pre-existing data file is still there
    assert before_files - {"_SUCCESS"} <= set(os.listdir(nation_table))


def test_update_applies_set_under_where(spark, nation_table):
    n = update_table(
        spark,
        nation_table,
        F.col("n_regionkey") == 0,
        {"n_name": F.concat(F.col("n_name"), F.lit("_EU"))},
    )
    df = spark.read.parquet(nation_table)
    assert n == df.filter(F.col("n_regionkey") == 0).count()
    assert df.filter(F.col("n_regionkey") == 0).filter(
        ~F.col("n_name").endswith("_EU")
    ).count() == 0
    # untouched rows keep their values
    assert df.filter(F.col("n_regionkey") != 0).filter(
        F.col("n_name").endswith("_EU")
    ).count() == 0


def test_delete_removes_only_matching(spark, nation_table):
    total = spark.read.parquet(nation_table).count()
    n = delete_from(spark, nation_table, F.col("n_regionkey") == 1)
    df = spark.read.parquet(nation_table)
    assert df.count() == total - n
    assert df.filter(F.col("n_regionkey") == 1).count() == 0


def test_delete_keeps_null_condition_rows(spark, nation_table):
    """MySQL DELETE removes rows where WHERE is TRUE; NULL-condition
    rows must be KEPT (regression: ~cond dropped them)."""
    workdir = os.path.dirname(nation_table)
    table = os.path.join(workdir, "nullable")
    create_table(
        spark.createDataFrame(
            [(1, 10), (2, None), (3, 5)], "id int, v int"
        ),
        table,
    )
    n = delete_from(spark, table, F.col("v") > 7)
    df = spark.read.parquet(table)
    assert n == 1
    assert sorted(r.id for r in df.collect()) == [2, 3]  # NULL row kept


def test_rewrite_swap_is_pointer_based(spark, nation_table):
    """After any rewrite the live path is a symlink to a version dir —
    the atomic-commit layout (a crash never leaves the table missing)."""
    delete_from(spark, nation_table, F.col("n_regionkey") == 0)
    assert os.path.islink(nation_table)
    target = os.path.join(
        os.path.dirname(nation_table), os.readlink(nation_table)
    )
    assert os.path.isdir(target)
    # readable through the pointer, and old version dirs are GC'd
    assert spark.read.parquet(nation_table).count() > 0
    versions = [
        d
        for d in os.listdir(os.path.dirname(nation_table))
        if d.startswith(os.path.basename(nation_table) + ".__v")
    ]
    assert versions == [os.readlink(nation_table)]


def test_update_then_delete_roundtrip_consistency(spark, nation_table):
    update_table(spark, nation_table, F.lit(True), {"n_regionkey": F.col("n_regionkey") + 10})
    assert spark.read.parquet(nation_table).filter(F.col("n_regionkey") < 10).count() == 0
    deleted = delete_from(spark, nation_table, F.lit(True))
    assert spark.read.parquet(nation_table).count() == 0
    assert deleted > 0
