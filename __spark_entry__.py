"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's operator corpus
(infinidb_spark.plans.*) for the duckdb-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the plan modules populates the registry.
import infinidb_spark.plans.relational  # noqa: F401,E402

try:  # optional modules appear as rounds progress
    import infinidb_spark.plans.windows  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.functions  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.pipeline  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.events  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.sources  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.catalog  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.dml  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.temporal  # noqa: F401,E402
except ImportError:
    pass

from infinidb_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

SF0_001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, SF0_001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
