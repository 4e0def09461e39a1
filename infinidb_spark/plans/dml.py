"""DML corpus query: the full INSERT/UPDATE/DELETE lifecycle, verified.

The Spark side materializes a scratch copy of `nation`, runs real DML
(append, copy-on-write update, delete), and aggregates the final table;
the DuckDB oracle computes the same end-state relationally from the
original view — a hash match proves the DML engine's semantics.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.operators.dml import (
    create_table,
    delete_from,
    insert_into,
    update_table,
)
from infinidb_spark.plans.registry import query
from infinidb_spark.session import load_tables


@query(
    "dml_lifecycle",
    oracle="""
    WITH final AS (
      -- UPDATE nation SET n_name = n_name || '_X' WHERE n_regionkey = 2
      -- DELETE FROM nation WHERE n_regionkey = 4
      -- INSERT (99, 'NEWLAND', 0), (100, 'OLDLAND', 1)
      SELECT n_nationkey,
             CASE WHEN n_regionkey = 2 THEN n_name || '_X' ELSE n_name END AS n_name,
             n_regionkey
      FROM nation WHERE n_regionkey <> 4
      UNION ALL SELECT 99, 'NEWLAND', 0
      UNION ALL SELECT 100, 'OLDLAND', 1
    )
    SELECT n_regionkey,
           count(*)                       AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           sum(CASE WHEN right(n_name, 2) = '_X' THEN 1 ELSE 0 END) AS n_updated
    FROM final
    GROUP BY n_regionkey
    """,
)
def dml_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT + UPDATE + DELETE on a scratch Parquet table
    (`operators/dml.py` ≅ DMLProc, `ha_calpont_dml.cpp:605`), end state
    hash-checked against the oracle's relational equivalent."""
    nation = load_tables(spark, sf_dir, names=("nation",))["nation"]
    workdir = tempfile.mkdtemp(prefix="infinidb_dml_q_")
    table = os.path.join(workdir, "nation")
    try:
        create_table(nation, table)
        insert_into(
            spark.createDataFrame(
                [(99, "NEWLAND", 0), (100, "OLDLAND", 1)],
                schema=nation.schema,
            ),
            table,
        )
        update_table(
            spark,
            table,
            F.col("n_regionkey") == 2,
            {"n_name": F.concat(F.col("n_name"), F.lit("_X"))},
        )
        delete_from(spark, table, F.col("n_regionkey") == 4)
        out = (
            spark.read.parquet(table)
            .groupBy("n_regionkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_nationkey").alias("key_sum"),
                F.sum(F.when(F.col("n_name").endswith("_X"), 1).otherwise(0)).alias(
                    "n_updated"
                ),
            )
        )
        # materialize before the scratch dir disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@query(
    "mysql_ddl_alter",
    oracle="""
    -- relational equivalent of the ALTER sequence:
    --   ADD note VARCHAR (NULL), UPDATE fills r<region> for region<3,
    --   ADD flag INT DEFAULT 7, CHANGE note remark, MODIFY flag BIGINT,
    --   DROP n_name, RENAME TO target name
    WITH final AS (
      SELECT n_nationkey, n_regionkey,
             CASE WHEN n_regionkey < 3 THEN 'r' || CAST(n_regionkey AS VARCHAR) END AS remark,
             CAST(7 AS BIGINT) AS flag
      FROM nation
    )
    SELECT coalesce(remark, '~none~') AS remark,
           count(*) AS n,
           CAST(sum(flag) AS BIGINT) AS flag_sum,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM final GROUP BY 1
    """,
)
def mysql_ddl_alter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ALTER TABLE surface (`dbcon/ddlpackage/ddl.y:477`:
    AtaAddColumn / AtaRenameColumn / AtaModifyColumnType / AtaDropColumn
    / RENAME TO) executed as MySQL text through InfiniSession.execute on
    a managed table; the end state is hash-checked against the oracle's
    relational equivalent.  ADD COLUMN with NULL default is metadata-only
    (hard-linked files + a schema-carrying empty file; operators/dml.py
    alter_table)."""
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark)
    load_tables(spark, sf_dir, names=("nation",))
    try:
        sess.execute("CREATE TABLE alter_t AS SELECT n_nationkey, n_name, n_regionkey FROM nation")
        sess.execute("ALTER TABLE alter_t ADD COLUMN note VARCHAR(20)")
        sess.execute("UPDATE alter_t SET note = concat('r', n_regionkey) WHERE n_regionkey < 3")
        sess.execute("ALTER TABLE alter_t ADD flag INT DEFAULT 7, CHANGE note remark VARCHAR(40)")
        sess.execute("ALTER TABLE alter_t MODIFY flag BIGINT")
        sess.execute("ALTER TABLE alter_t DROP COLUMN n_name")
        sess.execute("ALTER TABLE alter_t RENAME TO alter_done")
        out = sess.sql(
            """SELECT coalesce(remark, '~none~') AS remark, count(*) AS n,
                      sum(flag) AS flag_sum, sum(n_nationkey) AS key_sum
               FROM alter_done GROUP BY 1"""
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil

        if sess._managed_root:
            shutil.rmtree(sess._managed_root, ignore_errors=True)
