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
    Without ``order_by`` the values themselves sort ascending, matching
    the deterministic default the corpus uses.  ``distinct`` dedups
    values (MySQL requires the ORDER BY expr to BE the value then, and
    so does this builder).  NULL values are skipped, as in MySQL.
    """
    value = value.cast("string")
    if distinct:
        if order_by:
            raise ValueError("DISTINCT orders by the value itself (MySQL rule)")
        return F.array_join(F.sort_array(F.collect_set(value)), separator)
    if not order_by:
        return F.array_join(F.sort_array(F.collect_list(value)), separator)
    entry = F.struct(
        *[k.alias(f"_k{i}") for i, k in enumerate(order_by)], value.alias("_v")
    )
    arr = F.sort_array(F.collect_list(F.when(value.isNotNull(), entry)))
    return F.array_join(F.transform(arr, lambda s: s["_v"]), separator)
