"""Registry for (query, oracle) pairs.

Contract (driver, __spark_entry__.py): a query is a callable
``(spark, sf_dir) -> DataFrame``; an oracle is an ANSI-SQL string DuckDB
runs on the same Parquet tables registered as views.  Column names are
aligned on both sides (the driver sorts columns by name before hashing).

Determinism rules applied throughout the registered corpus:

* every floating aggregate is ``round``-ed identically on both sides so
  summation-order differences between engines can't flip the value hash;
* every LIMIT/top-N query orders by a key that is unique, so the selected
  set is well-defined;
* both engines run with UTC session semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` → driver runs a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            # a silent overwrite would DROP the shadowed query from the
            # corpus invisibly: the driver gate and the mirror's union
            # guard are both keyed by name and would keep attesting
            # green using the survivor
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_registered(spark: "SparkSession", sf_dir: str, *names: str):
    """Shared table loader for the plan modules (each module's ``_t``
    delegates here — ONE place for the load/register contract)."""
    from infinidb_spark.session import load_tables

    tables = load_tables(spark, sf_dir, register=True, names=names)
    return [tables[n] for n in names]


def run_mysql(spark: "SparkSession", sf_dir: str, text: str, *tables: str):
    """Shared MySQL-text runner for the plan modules: register the
    named tables, translate the statement through the dialect
    front-end, execute via Spark SQL.  ONE copy (tpch.py and
    ref_perf.py each carried an identical inline `_mysql`) so the
    load/translate contract can never drift between them."""
    from infinidb_spark.dialect import translate_mysql
    from infinidb_spark.session import load_tables

    load_tables(spark, sf_dir, register=True, names=tables)
    return spark.sql(translate_mysql(text))
