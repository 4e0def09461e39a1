"""Pin the round-7 attestation-flake classes (VERDICT r07 §What's wrong).

The driver's value hash is row-order-sensitive; the local compare()
sorts rows, so only the driver catches a non-total ORDER BY.  And a
0 = 0 row match attests vacuously.  scripts/audit_oracles.py checks
both classes for every registered oracle; this module keeps that audit
green in CI and pins the two specific regressions.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from audit_oracles import audit_one, top_level_order_by  # noqa: E402

GATE_SF = "/root/testdata/sf0.01"


def test_order_by_parser_ignores_window_and_nested():
    sql = """
    SELECT a, string_agg(b, ',' ORDER BY b) AS s,
           row_number() OVER (ORDER BY c DESC) AS rn
    FROM (SELECT * FROM t ORDER BY z LIMIT 5)
    GROUP BY a
    ORDER BY a, rn DESC
    """
    assert top_level_order_by(sql) == ["a", "rn"]


def test_order_by_parser_word_boundaries():
    # 'week_offset' must not be truncated by the LIMIT/OFFSET cut,
    # and a no-ORDER-BY statement returns None.
    assert top_level_order_by("SELECT 1 ORDER BY cohort_week, week_offset") == [
        "cohort_week",
        "week_offset",
    ]
    assert top_level_order_by("SELECT 1 ORDER BY a LIMIT 3 OFFSET 1") == ["a"]
    assert top_level_order_by("SELECT preorder FROM t") is None


def test_order_by_parser_strips_decoration():
    assert top_level_order_by(
        "SELECT 1 ORDER BY a ASC, b DESC NULLS LAST, 3"
    ) == ["a", "b", "3"]


@pytest.mark.skipif(not os.path.isdir(GATE_SF), reason="gate SF data missing")
def test_all_oracles_nonvacuous_and_total_order():
    """Every registered oracle, at the driver's gate SF: non-empty result
    and (when it has a top-level ORDER BY) a total sort key."""
    import __spark_entry__ as entry_mod
    from tests.oracle_util import duck_con

    con = duck_con(GATE_SF)
    fails = {}
    for name, sql in sorted(entry_mod.oracle_sql().items()):
        status, detail = audit_one(con, name, sql)
        if status != "PASS":
            fails[name] = f"{status}: {detail}"
    assert not fails, fails


@pytest.mark.skipif(not os.path.isdir(GATE_SF), reason="gate SF data missing")
def test_ngram_jaccard_nonvacuous(spark):
    """dedup_ngram_jaccard's r03 driver row was a 0 = 0 hash match; the
    query now runs the full doc range and must return rows at sf0.01."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["dedup_ngram_jaccard"](spark, GATE_SF)
    assert df.count() > 0
