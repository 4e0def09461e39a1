"""Sources & sinks: bulk load (cpimport equivalent), pseudo-columns,
cross-engine JDBC, result delivery.

Reference surface (SURVEY §2.1): `writeengine/bulk/cpimport.cpp` (bulk
delimited load), `dbcon/mysql/ha_pseudocolumn.cpp` (pseudo-columns),
`dbcon/joblist/crossenginestep.h` (foreign-engine table access).
"""

from infinidb_spark.sources.bulk_load import BulkLoadResult, bulk_load_csv
from infinidb_spark.sources.cross_engine import read_jdbc_table, write_jdbc_table
from infinidb_spark.sources.pseudocol import PSEUDO_COLUMNS, with_pseudo_columns

__all__ = [
    "BulkLoadResult",
    "bulk_load_csv",
    "read_jdbc_table",
    "write_jdbc_table",
    "PSEUDO_COLUMNS",
    "with_pseudo_columns",
]
