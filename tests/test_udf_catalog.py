"""UDF SDK registration tiers + system-catalog views."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from infinidb_spark.functions.registry import FUNC_MAP
from infinidb_spark.functions.udf_sdk import (
    apply_udaf,
    register_column_fn,
    register_pandas_udaf,
    register_pandas_udf,
    register_python_udf,
)
from infinidb_spark.plans.catalog import register_system_catalog, syscolumn
from infinidb_spark.session import load_tables


def test_register_column_fn_stays_jvm_side(spark):
    register_column_fn("double_it", lambda c: F.col(c) * 2)
    df = spark.range(5).select(FUNC_MAP["double_it"]("id").alias("v"))
    # pure Column expression: no BatchEvalPython / ArrowEvalPython node
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert [r.v for r in df.collect()] == [0, 2, 4, 6, 8]


def test_register_pandas_udf_and_sql_visibility(spark):
    register_pandas_udf(
        spark, "squared_pd", lambda s: s * s, "bigint"
    )
    got = spark.sql("select squared_pd(id) as v from range(4)").collect()
    assert [r.v for r in got] == [0, 1, 4, 9]
    # and via FUNC_MAP for DataFrame use
    df = spark.range(3).select(FUNC_MAP["squared_pd"]("id").alias("v"))
    assert [r.v for r in df.collect()] == [0, 1, 4]


def test_register_python_udf(spark):
    register_python_udf(spark, "shout", lambda s: (s or "") + "!", "string")
    got = spark.sql("select shout('hi') as v").collect()
    assert got[0].v == "hi!"


def test_pandas_udaf_via_apply(spark, sf_dir):
    def acctbal_spread(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "spread": [float(pdf["c_acctbal"].max() - pdf["c_acctbal"].min())],
            }
        )

    register_pandas_udaf("acctbal_spread", acctbal_spread, "c_nationkey int, spread double")
    customer = load_tables(spark, sf_dir, names=("customer",))["customer"]
    out = apply_udaf(customer.groupBy("c_nationkey"), "acctbal_spread")
    rows = out.collect()
    assert len(rows) == customer.select("c_nationkey").distinct().count()
    assert all(r.spread >= 0 for r in rows)


def test_system_catalog_views(spark, sf_dir):
    load_tables(spark, sf_dir, register=True)
    register_system_catalog(spark)
    cols = {
        r.columnname
        for r in syscolumn(spark).filter(F.col("tablename") == "nation").collect()
    }
    assert {"n_nationkey", "n_name", "n_regionkey"} <= cols
    # queryable through SQL like the reference's calpontsys schema
    n = spark.sql(
        "select count(*) as n from syscolumn where tablename = 'lineitem'"
    ).collect()[0].n
    assert n >= 10


def test_cogrouped_apply(spark, sf_dir):
    import pandas as pd
    from infinidb_spark.functions.udf_sdk import apply_cogrouped

    cust = load_tables(spark, sf_dir, names=("customer",))["customer"]
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]

    def spend_per_customer(key, c_pdf: pd.DataFrame, o_pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": [key[0]],
                "n_orders": [len(o_pdf)],
                "acctbal": [float(c_pdf["c_acctbal"].iloc[0]) if len(c_pdf) else None],
            }
        )

    out = apply_cogrouped(
        cust.groupBy("c_custkey"),
        orders.groupBy("o_custkey"),
        spend_per_customer,
        "c_custkey long, n_orders long, acctbal double",
    )
    got = {r.c_custkey: r.n_orders for r in out.collect()}
    want = {
        r.o_custkey: r["count"]
        for r in orders.groupBy("o_custkey").count().collect()
    }
    for k, n in want.items():
        assert got.get(k) == n
