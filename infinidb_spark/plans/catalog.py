"""System catalog exposed as queryable tables — `systable` / `syscolumn`.

Reference: the catalog IS SQL tables (`dbcon/mysql/syscatalog_mysql.sql`,
`dbcon/execplan/calpontsystemcatalog.h:107` — `systable`, `syscolumn`
with columnname/datatype/columnlength...).  Spark analog: `spark.catalog`
introspection materialized as DataFrames and registered as temp views,
so `engine.sql("select * from syscolumn where ...")` works like the
reference's `calpontsys` schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.plans.registry import query
from infinidb_spark.session import load_tables

#: the catalog surface's own helper views — excluded from every
#: listing, otherwise two IDENTICAL consecutive catalog queries return
#: different results (the first registration makes the second listing
#: see the views the first one created), and migration tools would try
#: to migrate the catalog itself as InfiniDB tables
_CATALOG_VIEWS = frozenset(
    {"systable", "syscolumn", "infoschema_tables", "infoschema_columns"}
)


def _qualified(t) -> str:
    """Name to hand spark.catalog.listColumns: qualified with the
    listing's own namespace, so a table outside the current database
    (or shadowed by a same-named temp view) resolves to the row being
    reported, not whatever the bare name happens to bind to."""
    ns = list(t.namespace or [])
    return ".".join([*ns, t.name]) if ns else t.name


def systable(spark: SparkSession) -> DataFrame:
    """One row per registered table (≅ calpontsys.systable)."""
    rows = [
        (t.name, t.catalog, t.namespace[0] if t.namespace else None, t.tableType, t.isTemporary)
        for t in spark.catalog.listTables()
        if t.name not in _CATALOG_VIEWS
    ]
    return spark.createDataFrame(
        rows, "tablename string, catalog string, schema string, tabletype string, istemporary boolean"
    )


def syscolumn(
    spark: SparkSession, only: set[str] | None = None
) -> DataFrame:
    """One row per column of every registered table (≅ syscolumn).

    ``only`` restricts the listColumns calls to the named tables
    (case-insensitive: the Spark catalog lowercases registered names) —
    the shared gate session accumulates dozens of leftover temp views,
    and resolving EVERY one costs a catalog round-trip each and fails
    the whole relation if any single leftover no longer resolves."""
    only_low = {n.lower() for n in only} if only is not None else None
    rows = []
    for t in spark.catalog.listTables():
        if t.name in _CATALOG_VIEWS:
            continue
        if only_low is not None and t.name.lower() not in only_low:
            continue
        try:
            cols = spark.catalog.listColumns(_qualified(t))
        except Exception:
            # a stale temp view over a since-replaced relation must not
            # abort the catalog of the tables that DO resolve
            continue
        for c in cols:
            rows.append((t.name, c.name, c.dataType, c.nullable, c.isPartition, c.isBucket))
    return spark.createDataFrame(
        rows,
        "tablename string, columnname string, datatype string, "
        "nullable boolean, ispartition boolean, isbucket boolean",
    )


def register_system_catalog(spark: SparkSession) -> None:
    """Register systable/syscolumn as temp views (the calpontsys schema)."""
    systable(spark).createOrReplaceTempView("systable")
    syscolumn(spark).createOrReplaceTempView("syscolumn")


@query(
    "system_catalog",
    # both engines derive their catalog from the SAME parquet schemas,
    # so the per-table column counts and type-class histograms must
    # agree: string≅VARCHAR, int/bigint≅INTEGER/BIGINT.
    oracle="""
    SELECT table_name AS tablename,
           CAST(count(*) AS BIGINT) AS n_columns,
           CAST(sum(CASE WHEN data_type = 'VARCHAR' THEN 1 ELSE 0 END) AS BIGINT) AS n_string,
           CAST(sum(CASE WHEN data_type IN ('BIGINT', 'INTEGER') THEN 1 ELSE 0 END) AS BIGINT) AS n_int
    FROM information_schema.columns
    WHERE table_name IN ('lineitem', 'orders', 'customer', 'nation', 'region')
    GROUP BY table_name ORDER BY tablename
    """,
)
def system_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """syscolumn over the registered TPC-H tables: per-table column
    counts + a type histogram — proves the catalog surface works."""
    load_tables(spark, sf_dir, register=True)
    wanted = {"lineitem", "orders", "customer", "nation", "region"}
    return (
        syscolumn(spark, only=wanted)
        .groupBy("tablename")
        .agg(
            F.count(F.lit(1)).alias("n_columns"),
            F.sum(F.when(F.col("datatype") == "string", 1).otherwise(0)).alias("n_string"),
            F.sum(F.when(F.col("datatype").isin("bigint", "int"), 1).otherwise(0)).alias("n_int"),
        )
        .orderBy("tablename")
    )


def information_schema_tables(
    spark: SparkSession, view_names: set[str] | frozenset = frozenset()
) -> DataFrame:
    """MySQL ``information_schema.tables`` shape (the subset every
    migration tool queries: schema/name/type/engine).  The reference
    serves this from mysqld with ENGINE='InfiniDB' for its tables.

    ``view_names``: names the session created via CREATE VIEW.  Spark
    registers BOTH managed tables and dialect views as TEMPORARY temp
    views (tableType 'VIEW' never appears for them), so without this
    set every view reports as 'BASE TABLE'.  The match is
    case-insensitive: the catalog lowercases registered names
    (CREATE VIEW MyView lists as 'myview') while the dialect preserves
    the typed case."""
    vlow = {v.lower() for v in view_names}
    rows = [
        (
            t.namespace[0] if t.namespace else "default",
            t.name,
            "VIEW" if (t.tableType == "VIEW" or t.name.lower() in vlow)
            else "BASE TABLE",
            "InfiniDB",
        )
        for t in spark.catalog.listTables()
        if t.name not in _CATALOG_VIEWS
    ]
    return spark.createDataFrame(
        rows, "table_schema string, table_name string, table_type string, engine string"
    )


def information_schema_columns(spark: SparkSession) -> DataFrame:
    """MySQL ``information_schema.columns`` shape: one row per column
    with ordinal position, MySQL-ish data type, and nullability."""
    to_mysql = {
        "string": "text", "bigint": "bigint", "int": "int",
        "integer": "int", "smallint": "smallint", "tinyint": "tinyint",
        "double": "double", "float": "float", "boolean": "tinyint",
        "date": "date", "timestamp": "datetime", "timestamp_ntz": "datetime",
        "binary": "blob", "decimal": "decimal",
    }
    rows = []
    for t in spark.catalog.listTables():
        if t.name in _CATALOG_VIEWS:
            continue
        try:
            cols = spark.catalog.listColumns(_qualified(t))
        except Exception:
            # same stale-temp-view guard as syscolumn: one leftover
            # unresolvable view must not abort the whole refresh
            continue
        for pos, c in enumerate(cols, start=1):
            base = c.dataType.split("(")[0].lower()
            rows.append(
                (
                    t.namespace[0] if t.namespace else "default",
                    t.name,
                    c.name,
                    pos,
                    # fall back to the BASE keyword, never the full
                    # parameterized render: MySQL's data_type column is
                    # 'decimal', not 'decimal(15,2)' — consumers filter
                    # WHERE data_type = 'decimal'
                    to_mysql.get(base, base),
                    "YES" if c.nullable else "NO",
                )
            )
    return spark.createDataFrame(
        rows,
        "table_schema string, table_name string, column_name string, "
        "ordinal_position int, data_type string, is_nullable string",
    )


def register_information_schema(
    spark: SparkSession, view_names: set[str] | frozenset = frozenset()
) -> None:
    """Register the information_schema views (the dialect rewrites
    ``information_schema.tables``/``.columns`` to these names — Spark
    temp views cannot be schema-qualified)."""
    information_schema_tables(spark, view_names).createOrReplaceTempView(
        "infoschema_tables"
    )
    information_schema_columns(spark).createOrReplaceTempView("infoschema_columns")
