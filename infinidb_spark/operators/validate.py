"""Data-quality validation — declarative constraint checking at scale.

A training-data pipeline's admission gate: every rule is a Column
predicate; one scan computes per-rule violation counts (all rules fused
into a single aggregation — no per-rule passes), and `violations`
returns the offending rows for quarantine (the cpimport `.bad`-file
idea generalized from parse errors to semantic constraints).

Scale: rule evaluation is a map-side conditional-sum aggregate —
one scan, one tiny shuffle regardless of rule count; violation
extraction pushes the OR-of-rules predicate down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_violations, violation_rate).
    A rule's Column is the VALIDITY predicate — violations are rows
    where it is false or NULL (three-valued logic counts unknown as
    invalid, the conservative gate)."""
    total = F.count(F.lit(1))
    aggs = [
        F.sum(F.when(cond.isNull() | ~cond, 1).otherwise(0)).alias(name)
        for name, cond in rules.items()
    ]
    row = df.agg(total.alias("_total"), *aggs)
    names = list(rules)
    stacked = row.selectExpr(
        "_total",
        f"stack({len(names)}, "
        + ", ".join(f"'{n}', {n}" for n in names)
        + ") as (rule, n_violations)",
    )
    return stacked.select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.col("n_violations") / F.greatest(F.col("_total"), F.lit(1)), 6).alias(
            "violation_rate"
        ),
    )


def violations(df: DataFrame, rules: dict[str, Column], limit_per_rule: int | None = None) -> DataFrame:
    """Rows failing any rule, tagged with the rule names they violate."""
    flags = F.array_compact(
        F.array(
            *[
                F.when(cond.isNull() | ~cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules.items()
            ]
        )
    )
    out = df.withColumn("violated_rules", flags).filter(F.size("violated_rules") > 0)
    if limit_per_rule is not None:
        out = out.limit(limit_per_rule * len(rules))
    return out
