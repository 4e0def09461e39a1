"""MySQL-dialect scalar function library.

The PySpark rebuild of the reference's FuncExp registry
(``utils/funcexp/funcexp.cpp:68-207`` — ``fFuncMap``, 102 ``func_*.cpp``
files, 26.8k LoC of interpreted per-row evaluation).  Here every function
is a *Column expression builder*: the returned ``pyspark.sql.Column``
stays inside Catalyst/WholeStageCodegen — nothing is interpreted per row
and no Python UDF is involved anywhere in this module.

``FUNC_MAP`` mirrors the reference registry name-for-name; call
``func(name, *args)`` for dynamic dispatch or import the builders
directly.
"""

from infinidb_spark.functions.registry import FUNC_MAP, func
from infinidb_spark.functions.mysql_format import (
    mysql_datetime_format_to_spark,
)

__all__ = ["FUNC_MAP", "func", "mysql_datetime_format_to_spark"]
