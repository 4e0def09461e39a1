"""Engine-session facade + runtime semantics the reference guarantees:
scalar subqueries error on >1 row (SCALAR join flag,
`dbcon/joblist/joblisttypes.h:83-95` / `ha_scalar_sub.cpp`)."""

from __future__ import annotations

import pytest

from infinidb_spark.session import InfiniSession


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = InfiniSession(spark=spark)
    eng.load(sf_dir)
    return eng


def test_session_sql_and_table_surface(engine):
    df = engine.sql(
        "select c_nationkey, count(*) as n from customer group by c_nationkey"
    )
    assert df.count() > 0
    assert engine.table("nation").count() == 25


def test_explain_shows_pushdown(engine):
    text = engine.explain("select l_orderkey from lineitem where l_quantity > 30")
    assert "PushedFilters" in text and "GreaterThan" in text


def test_scalar_subquery_multirow_errors(engine):
    """`= (SELECT ...)` returning >1 row must raise at runtime — the
    reference's SCALAR-join error; Catalyst enforces the same contract."""
    bad = engine.sql(
        "select * from region where r_regionkey = (select n_regionkey from nation)"
    )
    with pytest.raises(Exception, match="(?i)more than one row|SCALAR_SUBQUERY"):
        bad.collect()


def test_scalar_subquery_single_row_ok(engine):
    good = engine.sql(
        "select * from region where r_regionkey = "
        "(select n_regionkey from nation where n_nationkey = 3)"
    )
    assert good.count() == 1
