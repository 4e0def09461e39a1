"""MySQL-dialect corpus query — the full mysqld→plan→execute path.

The query text below is what a reference user would type at a MySQL
prompt (`dbcon/mysql/ha_calpont_execplan.cpp:4076` translates the
parsed statement); here it goes through ``translate_mysql`` and then
Spark SQL.  The DuckDB oracle is the same query hand-written in ANSI
SQL, so a hash match verifies the translation end-to-end: LIMIT
offset-comma-count, ordered+DISTINCT GROUP_CONCAT, DATE_FORMAT token
translation, and the TO_DAYS expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from infinidb_spark.dialect import translate_mysql
from infinidb_spark.plans.registry import query
from infinidb_spark.session import load_tables

#: authentic MySQL-dialect text (backticks, LIMIT o,c, GROUP_CONCAT,
#: %-format tokens, TO_DAYS, a version comment).
MYSQL_QUERY = """
SELECT /*!40001 */ `o_orderpriority`,
       GROUP_CONCAT(DISTINCT o_orderstatus ORDER BY o_orderstatus SEPARATOR '|') AS statuses,
       DATE_FORMAT(MIN(o_orderdate), '%Y-%m') AS first_month,
       TO_DAYS(MAX(o_orderdate)) AS last_days,
       COUNT(*) AS n_orders
FROM `orders`
WHERE o_totalprice >= 1000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
LIMIT 1, 3
"""


@query(
    "mysql_dialect_query",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS statuses,
           strftime(MIN(o_orderdate), '%Y-%m')                            AS first_month,
           CAST(date_diff('day', DATE '1970-01-01',
                          CAST(MAX(o_orderdate) AS DATE)) + 719528 AS BIGINT) AS last_days,
           count(*)                                                       AS n_orders
    FROM orders
    WHERE o_totalprice >= 1000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    LIMIT 3 OFFSET 1
    """,
)
def mysql_dialect_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT lifecycle §3.1 via the dialect front-end: MySQL text in,
    Catalyst plan out — the oracle hand-writes the same semantics."""
    load_tables(spark, sf_dir, names=("orders",))
    return spark.sql(translate_mysql(MYSQL_QUERY))
