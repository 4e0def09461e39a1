"""Every registered (query, oracle) pair must match DuckDB at sf0.001.

This is a local mirror of the driver's sf0.01 correctness gate — fast
enough to run per-commit.  Queries without an oracle get a rows-run
smoke check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_util import compare, duck_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        ok, msg = compare(df, con, ORACLES[name])
        assert ok, f"{name}: {msg}"
    else:
        # rows-only smoke: runs and returns a stable schema
        assert df.columns
        df.collect()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert len(df.collect()) > 0
