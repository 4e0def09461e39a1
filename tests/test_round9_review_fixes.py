"""Regression pins for the round-9 review findings (dml.py/dedup.py):
partitioned-table writers keep the hive layout, rename carries the
name-keyed sidecars, connected_components is id-type agnostic, and the
incremental exact-dedup join tolerates a store with repeated hashes."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def work():
    with tempfile.TemporaryDirectory() as d:
        yield d


def test_partitioned_insert_keeps_layout(spark, work):
    from infinidb_spark.operators.dml import (
        _hive_partition_cols,
        create_table,
        insert_into,
        read_table,
        update_table,
    )

    t = os.path.join(work, "pt")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id long, k string, v double"
    )
    create_table(df, t, partition_by=["k"])
    assert _hive_partition_cols(t) == ["k"]
    # a flat append used to drop part files at the root next to k=...
    # dirs and break partition discovery on the next read
    insert_into(spark.createDataFrame([(4, "c", 40.0)], df.schema), t)
    got = read_table(spark, t)
    assert got.count() == 4
    assert set(r.k for r in got.select("k").collect()) == {"a", "b", "c"}
    # rewrites must also keep the layout (update used to flatten it)
    update_table(spark, t, F.col("id") == 1, {"v": F.lit(11.0)})
    assert _hive_partition_cols(t) == ["k"]
    got = read_table(spark, t)
    assert got.filter("id = 1").collect()[0].v == 11.0
    assert got.count() == 4


def test_rename_table_carries_retention_and_pins(spark, work):
    from infinidb_spark.operators.dml import (
        create_table,
        rename_table,
        retain_version,
        retained_versions,
    )

    t = os.path.join(work, "rt")
    create_table(spark.range(3).toDF("id"), t)
    live = os.path.basename(os.path.realpath(t))
    retain_version(t, live)
    t2 = os.path.join(work, "rt2")
    rename_table(t, t2)
    # the retention sidecar must follow the table — a rewrite under the
    # new name would otherwise GC the version an open transaction reads
    assert retained_versions(t2) == {live}
    assert not os.path.exists(t + ".__retain__")


def test_connected_components_string_ids(spark):
    from infinidb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-c", "doc-b"), ("doc-x", "doc-y")],
        "id_a string, id_b string",
    )
    labels = {
        r.id: r.cluster_id for r in connected_components(pairs).collect()
    }
    # the old hard cast("long") made every string id NULL and the
    # clustering silently degenerated
    assert labels == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "doc-x": "doc-x", "doc-y": "doc-x",
    }


def test_exact_incremental_tolerates_duplicate_store_hashes(spark):
    from infinidb_spark.operators.dedup import (
        dedup_exact_incremental,
        normalize_text,
    )

    corpus = spark.createDataFrame(
        [(1, "same text"), (2, "same text")], "doc_id long, text string"
    )
    # the documented accumulation pattern unions every batch's OUTPUT
    # (one row per doc) into the store, so a hash repeats there
    store = corpus.select(
        F.sha2(normalize_text(F.col("text")), 256).alias("content_hash")
    )
    assert store.count() == 2  # the duplicated hash IS stored twice
    batch = spark.createDataFrame([(10, "same text")], "doc_id long, text string")
    out = dedup_exact_incremental(batch, store).collect()
    # one row per batch doc — the duplicate store rows used to multiply it
    assert len(out) == 1
    assert out[0].status == "corpus_dup"
