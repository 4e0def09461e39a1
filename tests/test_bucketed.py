"""Bucketed co-located join: the no-shuffle invariant, asserted on the
physical plan — the key large-large join strategy at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from infinidb_spark.session import load_tables
from infinidb_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
    write_bucketed(t["lineitem"], "li_bkt", "l_orderkey", n_buckets=8)
    write_bucketed(
        t["orders"].withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bkt",
        "l_orderkey",
        n_buckets=8,
    )
    yield "li_bkt", "ord_bkt"
    spark.sql("drop table if exists li_bkt")
    spark.sql("drop table if exists ord_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li, ords = bucketed_tables
    # disable broadcast so the join strategy is genuinely shuffle-or-bucket
    saved_bht = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, li, ords, ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bht)


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    li, ords = bucketed_tables
    t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
    want = (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
        .collect()[0]
    )
    got = (
        bucketed_join(spark, li, ords, ["l_orderkey"])
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
        .collect()[0]
    )
    assert (got.n, got.q) == (want.n, want.q)


def test_ann_recall_floor(spark, sf_dir):
    """Index-quality attestation floors (VERDICT-r05 #5): IVF recall@10
    improves monotonically with n_probe and clears a pinned mean floor;
    measured 0.45->0.65 (sf0.001), 0.48->0.67 (sf0.01), 0.26->0.37
    (sf0.1) for n_probe 2->4."""
    from collections import defaultdict

    import infinidb_spark.plans.pipeline  # noqa: F401 — populates registry
    from infinidb_spark.plans.registry import QUERIES

    rows = QUERIES["ann_recall_attest"](spark, sf_dir).collect()
    by = defaultdict(list)
    for r in rows:
        by[r.variant].append(float(r.recall))
    assert set(by) == {"ivf_p2", "ivf_p4", "ivfpq"}
    mean = {v: sum(x) / len(x) for v, x in by.items()}
    assert mean["ivf_p4"] >= mean["ivf_p2"]       # more probes, more recall
    assert mean["ivf_p4"] >= 0.3                  # pinned quality floor
    assert all(0.0 <= r <= 1.0 for rs in by.values() for r in rs)


def test_bucketed_sorted_write_one_file_per_bucket(spark, sf_dir):
    """r10 review pin: write_bucketed repartitions on the bucket column
    first, so a many-task input still lands ONE file per bucket —
    without it Spark ignores the sortBy metadata (SPARK-19256) and
    re-adds the query-time Sort the module promises to elide."""
    import glob
    import os

    t = load_tables(spark, sf_dir, names=("lineitem",))
    df = t["lineitem"].repartition(6)
    write_bucketed(
        df, "li_bkt_sorted", "l_orderkey", n_buckets=4, sort_col="l_orderkey"
    )
    saved_bht = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED li_bkt_sorted")
            .filter("col_name = 'Location'")
            .collect()[0][1]
        )
        files = glob.glob(os.path.join(loc.replace("file:", ""), "*.parquet"))
        assert len(files) == 4, f"expected 4 bucket files, got {files}"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(
            spark, "li_bkt_sorted", "li_bkt_sorted", ["l_orderkey"],
            sorted_scan=True,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # ' Sort [' matches only genuine Sort nodes (SortMergeJoin has
        # no space-bracket after 'Sort')
        assert " Sort [" not in plan, f"sorted buckets still re-sort:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bht)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        spark.sql("drop table if exists li_bkt_sorted")
