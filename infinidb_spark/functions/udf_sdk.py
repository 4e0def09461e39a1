"""User-defined function SDK — the plugin-registration surface.

Reference: `utils/udfsdk/udfsdk.h:61-68` — a C++ plugin SDK whose
`UDFMap()` is merged into the engine's function registry at startup
(`utils/funcexp/funcexp.cpp:210-223`); UDAFs hook the aggregation path
the same way.

Spark-native equivalents, in preference order (fastest first):

1. `register_column_fn` — a PURE Column expression builder: composes
   built-in functions, stays JVM-side/codegen, zero serialization.
   This is what the reference's C++ plugins actually were: compiled
   expressions — most "UDFs" should be this.
2. `register_pandas_udf` — Arrow-batched vectorized Python (numpy per
   batch); the right tier when the logic genuinely needs Python.
3. `register_python_udf` — row-at-a-time Python; the slow path, kept
   for API completeness (ref's interpreter-style FuncExp evaluation is
   the moral analog).
4. `register_pandas_udaf` — grouped aggregation via applyInPandas
   (the UDAF surface, `udfsdk.h` `UDAF_MAP`).

All registrations land in the SAME `FUNC_MAP` the built-in library uses
(`infinidb_spark.functions.registry`), mirroring the reference's single
merged registry, and (for 2/3) in `spark.udf` so `spark.sql` sees them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.functions.registry import FUNC_MAP

#: UDAF registry: name -> (apply_fn, output schema DDL) for applyInPandas
UDAF_MAP: dict[str, tuple[Callable, str]] = {}


def _claim(name: str, replace: bool) -> str:
    """Collision gate for every register_* chokepoint: silently
    overwriting a built-in (or another plugin's) FUNC_MAP entry would
    change the semantics of every subsequently translated query using
    that name — require an explicit ``replace=True`` opt-in."""
    key = name.lower()
    if not replace and key in FUNC_MAP:
        raise ValueError(
            f"function {name!r} is already registered — pass replace=True "
            "to deliberately override it"
        )
    return key


def register_column_fn(
    name: str, fn: Callable[..., Column], *, replace: bool = False
) -> Callable[..., Column]:
    """Register a Column-expression builder (tier 1 — no Python at run
    time).  Returns the builder so it can be used directly."""
    FUNC_MAP[_claim(name, replace)] = fn
    return fn


def register_pandas_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str,
    *, replace: bool = False,
) -> Callable[..., Column]:
    """Register an Arrow-batched pandas UDF (tier 2) in both FUNC_MAP
    and spark.udf (usable from DataFrame code AND spark.sql)."""
    key = _claim(name, replace)
    udf = F.pandas_udf(fn, return_type)
    spark.udf.register(name, udf)
    FUNC_MAP[key] = udf
    return udf


def register_python_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str,
    *, replace: bool = False,
) -> Callable[..., Column]:
    """Register a row-at-a-time Python UDF (tier 3 — slow path)."""
    key = _claim(name, replace)
    udf = F.udf(fn, return_type)
    spark.udf.register(name, udf)
    FUNC_MAP[key] = udf
    return udf


def register_pandas_udaf(
    name: str, fn: Callable, output_schema: str, *, replace: bool = False
) -> Callable:
    """Register a grouped-aggregation UDAF (tier 4): ``fn(pdf) -> pdf``
    applied per group via ``apply_udaf``."""
    key = name.lower()
    if not replace and key in UDAF_MAP:
        raise ValueError(
            f"UDAF {name!r} is already registered — pass replace=True "
            "to deliberately override it"
        )
    UDAF_MAP[key] = (fn, output_schema)
    return fn


def apply_udaf(df_grouped, name: str) -> DataFrame:
    """Apply a registered UDAF to a GroupedData (applyInPandas)."""
    fn, schema = UDAF_MAP[name.lower()]
    return df_grouped.applyInPandas(fn, schema)


def apply_cogrouped(
    grouped_a, grouped_b, fn: Callable, output_schema: str
) -> DataFrame:
    """Co-grouped two-table Python processing (applyInPandas over a
    cogroup): ``fn(key, pdf_a, pdf_b) -> pdf``.  The two sides are
    co-shuffled on the group key and delivered to Python together — the
    extension point for per-key logic spanning two tables (e.g. doc
    text + its embeddings) that no single-table UDAF can express.
    Tier 4b of the SDK; same Arrow-batched cost profile as applyInPandas.
    """
    return grouped_a.cogroup(grouped_b).applyInPandas(fn, output_schema)
