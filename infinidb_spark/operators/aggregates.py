"""Composite aggregate builders Spark lacks as single functions.

``group_concat`` — MySQL GROUP_CONCAT([DISTINCT] expr [ORDER BY ...]
[SEPARATOR sep]).  Reference: ``GroupConcator`` / ``GroupConcatOrderBy``
(`dbcon/joblist/groupconcat.h:100-159`) keep a per-group ordered buffer;
the Spark-native composition is ``collect_list(struct(sort keys, value))
→ sort_array → transform → array_join`` — the sort happens per group on
arrays that are already reduced, so the shuffle carries only the
collect_list partials and the plan stays a standard 2-phase aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def group_concat(
    value: Column,
    order_by: Sequence[Column] | None = None,
    separator: str = ",",
    distinct: bool = False,
) -> Column:
    """Aggregate Column: concatenated ``value`` strings per group.

    ``order_by`` — sort-key Columns *independent of the value* (MySQL's
    `ORDER BY expr` list).  Keys sort ascending; for a descending
    numeric key pass its negation (struct sort is field-wise ascending).
    Without ``order_by`` the values themselves sort ascending IN THEIR
    OWN TYPE (numerics numerically — casting first made 10 sort before
    9), matching MySQL GROUP_CONCAT(x ORDER BY x).  ``distinct`` dedups
    values (MySQL requires the ORDER BY expr to BE the value then, and
    so does this builder).  NULL values are skipped, as in MySQL; a
    group whose every value is NULL yields NULL, not '' (MySQL and
    listagg/string_agg agree — the dialect path at
    dialect._group_concat already returned NULL)."""

    def _join(arr: Column) -> Column:
        joined = F.array_join(
            F.transform(arr, lambda v: v.cast("string")), separator
        )
        return F.when(F.size(arr) > 0, joined)

    if distinct:
        if order_by:
            raise ValueError("DISTINCT orders by the value itself (MySQL rule)")
        return _join(F.sort_array(F.collect_set(value)))
    if not order_by:
        return _join(F.sort_array(F.collect_list(value)))
    sval = value.cast("string")
    entry = F.struct(
        *[k.alias(f"_k{i}") for i, k in enumerate(order_by)], sval.alias("_v")
    )
    arr = F.sort_array(F.collect_list(F.when(sval.isNotNull(), entry)))
    joined = F.array_join(F.transform(arr, lambda s: s["_v"]), separator)
    return F.when(F.size(arr) > 0, joined)
