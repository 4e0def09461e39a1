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
    # positional aliases + F.lit names, never interpolated SQL text: a
    # rule name like 'non-negative' or one containing a quote would
    # crash (or escape) a stack()-string selectExpr
    # coalesce: sum over ZERO rows is NULL — an empty (e.g. fully
    # pre-filtered) batch must report 0 violations, not a NULL that
    # drops the rule row out of every downstream threshold compare
    aggs = [
        F.coalesce(
            F.sum(F.when(cond.isNull() | ~cond, 1).otherwise(0)), F.lit(0)
        ).alias(f"_r{i}")
        for i, cond in enumerate(rules.values())
    ]
    row = df.agg(total.alias("_total"), *aggs)
    pair = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"_r{i}").alias("n_violations"),
                )
                for i, name in enumerate(rules)
            ]
        )
    ).alias("_p")
    return row.select("_total", pair).select(
        F.col("_p.rule").alias("rule"),
        F.col("_p.n_violations").cast("long").alias("n_violations"),
        F.round(
            F.col("_p.n_violations") / F.greatest(F.col("_total"), F.lit(1)), 6
        ).alias("violation_rate"),
    )


def violations(df: DataFrame, rules: dict[str, Column], limit_per_rule: int | None = None) -> DataFrame:
    """Rows failing any rule, tagged with the rule names they violate.

    ``limit_per_rule`` caps the sample at up to N rows PER RULE (a
    global ``limit(N * n_rules)`` could return thousands of rule-A rows
    and zero rule-B examples).  The per-rule pick is arbitrary (like
    ``limit``), and identical duplicate rows collapse in capped mode —
    the uncapped result is unaffected."""
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
        from pyspark.sql import Window

        ex = out.withColumn("_rule", F.explode("violated_rules"))
        w = Window.partitionBy("_rule").orderBy(F.lit(0))
        out = (
            ex.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= limit_per_rule)
            .drop("_rn", "_rule")
            .dropDuplicates()
        )
    return out
