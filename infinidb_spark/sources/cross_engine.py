"""Cross-engine table access — query foreign-DBMS tables inside a plan.

Reference: `dbcon/joblist/crossenginestep.h:47` / `crossenginestep.cpp:
60-81` — `CrossEngineStep` queries a non-InfiniDB MySQL table (InnoDB
etc.) over a client connection, streaming rows into the joblist so they
can join with column-store tables.

Spark analog: `spark.read.jdbc`.  Semantics preserved:

* the foreign table participates in joins/filters like any DataFrame;
* simple predicates and column pruning are pushed into the remote SQL
  (Catalyst JDBC pushdown ≅ the reference building a WHERE clause into
  its drizzle query, `crossenginestep.cpp` makeQuery path);
* small dimension tables read serially then broadcast — the common
  cross-engine shape (foreign dim ⋈ columnar fact).

Scale notes: a single JDBC connection is the default (fine for dims —
the reference's CrossEngineStep is likewise single-connection); for
large foreign tables pass ``partition_column``/``num_partitions`` to
fan out range-partitioned parallel reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read a foreign table (or `(subquery) alias`) over JDBC."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is None and (
        num_partitions is not None
        or lower_bound is not None
        or upper_bound is not None
    ):
        # the JDBC source ignores numPartitions/bounds without a
        # partition column — the caller would get a SINGLE-connection
        # serial scan while believing the read is fanned out
        raise ValueError(
            "read_jdbc_table: num_partitions/lower_bound/upper_bound "
            "require partition_column — without it the JDBC source "
            "reads over one connection"
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if driver:
        # AFTER properties: the explicit argument wins, matching
        # write_jdbc_table (the two directions used to resolve a
        # driver conflict in opposite ways)
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JVM as the literal 'None' and
            # die in a NumberFormatException deep in the JDBC source
            raise ValueError(
                "read_jdbc_table: partition_column requires lower_bound "
                "and upper_bound"
            )
        if num_partitions is not None and num_partitions < 1:
            # `or 8` silently rewrote an explicit 0 (a caller's
            # underflowed fan-out) to 8 — fail fast like the other
            # argument validations here
            raise ValueError(
                f"read_jdbc_table: num_partitions must be >= 1, got "
                f"{num_partitions}"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(8 if num_partitions is None else num_partitions))
        )
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    mode: str = "error",
    properties: dict[str, str] | None = None,
) -> None:
    """Write a DataFrame to a foreign table over JDBC (the reverse path;
    the reference only reads foreign engines — this is a superset).

    ``mode`` keeps Spark's fail-fast default ('error'): the old
    'overwrite' default silently DROPPED and recreated an existing
    foreign table — destroying its rows, indexes and declared column
    types — for any caller that omitted the argument."""
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    df.write.jdbc(url, table, mode=mode, properties=props)
