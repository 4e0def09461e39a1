"""Quantified subquery comparisons — `x <op> ALL (sub)` / `x <op> ANY (sub)`.

Reference: the execution plan carries distinct join flags for quantified
subqueries (`dbcon/execplan/calpontselectexecutionplan.h:120-133`), and
the MySQL layer rewrites them before planning
(`dbcon/mysql/ha_scalar_sub.cpp`).  Spark SQL has no ALL/ANY syntax, so
the same rewrite lives here as a DataFrame transform:

* ordering comparisons reduce to ONE aggregate over the subquery —
  ``x > ALL(S)`` ≡ ``x > max(S)``, ``x > ANY(S)`` ≡ ``x > min(S)`` (and
  dually for ``<``) — injected as a scalar-subquery expression
  (``DataFrame.scalar()``), so the main plan has NO join node at all:
  Spark runs the one-row aggregate as a subquery job and feeds the
  result into a map-side filter, constant cost at any scale;
* SQL three-valued logic is preserved exactly: empty S → ALL is TRUE /
  ANY is FALSE regardless of x; a NULL in S can only turn a would-be
  TRUE (ALL) or would-be FALSE (ANY) into NULL; NULL x with non-empty S
  is NULL.
* ``= ANY`` ≡ IN and ``<> ALL`` ≡ NOT IN are not handled here — they
  are semi / null-aware-anti joins (see plans.relational ``join_semi``,
  ``join_not_in_nullaware``), exactly how the reference maps them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def quantified_filter(
    df: DataFrame,
    left: Column,
    op: str,
    sub: DataFrame,
    quantifier: str,
) -> DataFrame:
    """Filter `df` rows where ``left <op> <quantifier> (sub)`` is TRUE.

    ``sub`` must be a single-column DataFrame (the subquery's select
    list).  Rows where the predicate is FALSE or NULL are dropped —
    WHERE-clause semantics.
    """
    if op not in _OPS:
        raise ValueError(f"quantifier comparison supports {sorted(_OPS)}, got {op!r}")
    quantifier = quantifier.lower()
    if quantifier not in ("all", "any"):
        raise ValueError(f"quantifier must be 'all' or 'any', got {quantifier!r}")
    if len(sub.columns) != 1:
        raise ValueError("quantified_filter: sub must have exactly one column")
    # backtick-quoted: a column name containing '.' must not re-parse
    # as struct-field access (df[0] routes through the same name parse)
    sub_col = F.col("`" + sub.columns[0].replace("`", "``") + "`")

    # ALL with >/>= races against the maximum; ANY against the minimum
    # (mirrored for </<=).  All three stats pack into ONE struct so the
    # scalar subquery runs a single aggregate job.
    use_max = (op in (">", ">=")) == (quantifier == "all")
    bound_agg = (F.max if use_max else F.min)(sub_col).alias("b")
    stats = sub.agg(
        F.struct(
            bound_agg,
            F.count(sub_col).alias("cnt"),
            F.count(F.lit(1)).alias("total"),
        ).alias("_q")
    ).scalar()

    base = _OPS[op](left, stats.getField("b"))  # NULL iff x NULL or S empty
    cnt, total = stats.getField("cnt"), stats.getField("total")
    has_nulls = total > cnt
    if quantifier == "all":
        cond = (
            F.when(total == 0, F.lit(True))
            .when(base & has_nulls, F.lit(None).cast("boolean"))
            .otherwise(base)
        )
    else:
        cond = (
            F.when(total == 0, F.lit(False))
            .when((~base) & has_nulls, F.lit(None).cast("boolean"))
            .otherwise(base)
        )
    return df.filter(cond)
