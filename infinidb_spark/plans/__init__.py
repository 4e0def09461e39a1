"""Query plans: the engine's demonstrable operator inventory.

Each registered query is one row of SURVEY.md §2 made executable — a
DataFrame-API implementation plus (where SQL-expressible) an equivalent
ANSI-SQL oracle string for DuckDB.  The driver's correctness gate runs
both sides at sf=0.01 and compares row-count + schema + value-hash.
"""

from infinidb_spark.plans.registry import ORACLES, QUERIES, query

__all__ = ["QUERIES", "ORACLES", "query"]
