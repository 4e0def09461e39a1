"""ANSI-session robustness: the driver's gate runs queries in its OWN
default-config Spark 4 session, where ``spark.sql.ansi.enabled`` is ON —
unlike the engine session (session.py pins it off, matching the
reference's permissive MySQL converters, ref utils/funcexp/func_cast.cpp
/ dataconvert.cpp: malformed input -> 0/NULL, never an error).

Every registered query must therefore execute under ANSI-on too; casts
on malformed-reachable input must use ``try_cast`` semantics
(functions/registry.py casts section).  This suite flips the runtime
conf and executes the cast-reachable corpus — the r03 driver failure
mode (CAST_INVALID_INPUT on func_cast) regresses here, not in the gate.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

# Queries whose plans contain casts over string/JSON data (the
# malformed-input-reachable surface) plus the full func_* family.
ANSI_SENSITIVE = [
    "func_math",
    "func_string",
    "func_datetime",
    "func_control",
    "func_cast",
    "func_json",
    "func_time",
    "mysql_dml_statements",
    "mysql_dialect_query",
    "mysql_dialect_datetime",
    # front-end TPC-H twins: date literals, extract->cast, conditional
    # sums, ratio divisions — the dialect surface a migrating user runs
    # (full-corpus ANSI-on sweep verified clean when these landed)
    "tpch_q2", "tpch_q8", "tpch_q12", "tpch_q14", "tpch_q22",
    # round-5 additions: conv()->long casts (portable hashes), decimal
    # string pins, array<float>->double casts
    "dedup_minhash_incremental", "dedup_exact_incremental",
    "ann_batch_topk", "multi_table_dml",
]


@pytest.fixture(scope="module")
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", ANSI_SENSITIVE)
def test_query_runs_under_ansi(ansi_spark, sf_dir, name):
    queries = entry_mod.queries()
    if name not in queries:
        pytest.skip(f"{name} not registered")
    df = queries[name](ansi_spark, sf_dir)
    # Executing is the assertion: ANSI-on must not raise CAST_INVALID_INPUT.
    assert df.count() >= 0


def test_try_cast_malformed_returns_null(ansi_spark):
    from infinidb_spark.functions.registry import func
    from pyspark.sql import functions as F

    df = ansi_spark.range(1).select(
        func("cast_signed", F.lit("not-a-number")).alias("s"),
        func("cast_date", F.lit("nope")).alias("d"),
        func("cast_decimal", F.lit("x"), 18, 2).alias("dec"),
        func("cast_double", F.lit("?")).alias("f"),
        func("cast_unsigned", F.lit("u?")).alias("u"),
        func("cast_datetime", F.lit("t?")).alias("t"),
    )
    row = df.collect()[0]
    # integer casts PREFIX-parse like the reference (atoll/strtoul,
    # func_cast.cpp:144/253): garbage strings → 0, not NULL (r10 fix)
    assert row["s"] == 0 and row["u"] == 0
    assert all(row[c] is None for c in ["d", "dec", "f", "t"])


def test_recursive_cte_capability_boundary(spark):
    """Spark 4 recursion supports UNION ALL (bounded DAG expansion) but
    NOT distinct UNION — so cyclic-graph fixpoints (min-label
    propagation) cannot terminate as a recursive CTE, which is exactly
    why dedup_clusters ships the distributed pointer-jumping loop
    (operators/dedup.py connected_components) while its ORACLE uses
    DuckDB's recursive CTE.  Pin both sides of that boundary."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    out = spark.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t "
        "WHERE n < 10) SELECT sum(n) AS s FROM t"
    ).collect()
    assert out[0].s == 55

    spark.sql(
        "SELECT * FROM VALUES (1, 2), (2, 1) AS e(s, d)"
    ).createOrReplaceTempView("_rc_edges")
    with pytest.raises(AnalysisException, match="UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"):
        spark.sql(
            "WITH RECURSIVE r(id, lab) AS (SELECT s, s FROM _rc_edges "
            "UNION SELECT e.s, r.lab FROM _rc_edges e JOIN r ON r.id = e.d) "
            "SELECT count(*) FROM r"
        ).collect()
