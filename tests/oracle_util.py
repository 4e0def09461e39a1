"""Mimic the driver's correctness gate: run a registered Spark query and
its DuckDB oracle on the same parquet tables, compare row count, schema
(column names), and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb

from infinidb_spark.session import TPCH_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # tolerate last-bit drift between engines
        return round(v, 9) + 0.0
    if isinstance(v, int):
        return v
    return str(v)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sp_rows = spark_df.collect()
    sp_cols = list(spark_df.columns)
    duck = con.execute(sql)
    du_cols = [d[0] for d in duck.description]
    du_rows = duck.fetchall()

    if sorted(sp_cols) != sorted(du_cols):
        return False, f"schema mismatch: spark={sorted(sp_cols)} duck={sorted(du_cols)}"
    if len(sp_rows) != len(du_rows):
        return False, f"row count mismatch: spark={len(sp_rows)} duck={len(du_rows)}"

    order = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
    sp_set = sorted(
        (tuple(_canon(r[sp_cols[i]]) for i in order) for r in sp_rows), key=repr
    )
    du_order = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
    du_set = sorted((tuple(_canon(r[i]) for i in du_order) for r in du_rows), key=repr)
    if sp_set != du_set:
        diff = [(a, b) for a, b in zip(sp_set, du_set) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
