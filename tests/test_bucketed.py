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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, li, ords, ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


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
