"""Replay of the reference's null-semantics harness
(`dbcon/joblist/nulltests.pl`): per column type, create a one-column
table, insert the script's exact rows through the MySQL front end, and
assert the script's exact expected counts.

The distinctive InfiniDB semantic this pins: ``check_char_counts``
expects **is-null = 2** after inserting (NULL, '', 'A') — an empty
string written to a char/varchar column is stored as NULL (the char
null magic value of the reference's storage layer; operators/dml.py
``charnull`` reproduces it at every managed-table write path).
"""

from __future__ import annotations

import pytest

from infinidb_spark.session import InfiniSession

INT_TYPES = [
    "tinyint", "smallint", "int", "bigint",
    "decimal(4,2)", "decimal(9,2)", "decimal(18,2)", "float", "double",
]
CHAR_TYPES = ["char(40)", "varchar(40)"]
DATE_TYPES = ["date", "datetime"]


@pytest.fixture(scope="module")
def sess(spark):
    return InfiniSession(spark)


def _count(sess, where: str = "") -> int:
    q = "SELECT count(*) c FROM nulltest" + (f" WHERE {where}" if where else "")
    return sess.execute(q).collect()[0].c


def _run(sess, coltype: str, inserts: list[str], checks: list[tuple[str, int]]):
    sess.execute("DROP TABLE IF EXISTS nulltest")
    sess.execute(f"CREATE TABLE nulltest (col1 {coltype}) ENGINE=InfiniDB")
    for v in inserts:
        sess.execute(f"INSERT INTO nulltest VALUES ({v})")
    for where, expect in checks:
        assert _count(sess, where) == expect, (coltype, where)
    sess.execute("DROP TABLE nulltest")


@pytest.mark.parametrize("coltype", INT_TYPES)
def test_numeric_null_counts(sess, coltype):
    _run(
        sess,
        coltype,
        ["null", "1"],
        [
            ("", 2),
            ("col1 is null", 1),
            ("col1 is not null", 1),
            ("col1 = 1", 1),
            ("col1 <> 1", 0),
            ("col1 < 127", 1),
            ("col1 > -126", 1),
        ],
    )


@pytest.mark.parametrize("coltype", CHAR_TYPES)
def test_char_null_counts(sess, coltype):
    """The empty string is stored as NULL — is-null = 2 of 3 rows."""
    _run(
        sess,
        coltype,
        ["null", "''", "'A'"],
        [
            ("", 3),
            ("col1 is null", 2),
            ("col1 is not null", 1),
            ("col1 = 'A'", 1),
            ("col1 <> 'A'", 0),
            ("col1 < 'Z'", 1),
            ("col1 > '!'", 1),
        ],
    )


@pytest.mark.parametrize("coltype", DATE_TYPES)
def test_date_null_counts(sess, coltype):
    _run(
        sess,
        coltype,
        ["null", "'2008-05-14'"],
        [
            ("", 2),
            ("col1 is null", 1),
            ("col1 is not null", 1),
            ("col1 = '2008-05-14'", 1),
            ("col1 <> '2008-05-14'", 0),
            ("col1 < '2018-05-14'", 1),
            ("col1 > '1998-05-14'", 1),
        ],
    )


def test_empty_string_into_not_null_char_rejected(sess):
    """'' ≡ NULL at char storage, so '' bound for a NOT NULL string
    column is a NOT NULL violation — BOTH insert paths (plain append
    and the staged NOT-NULL-validating path) agree, instead of the
    staged path silently storing ''."""
    sess.execute("DROP TABLE IF EXISTS nn")
    sess.execute("CREATE TABLE nn (a VARCHAR(10) NOT NULL, b INT)")
    with pytest.raises(ValueError, match="NOT NULL"):
        sess.execute("INSERT INTO nn VALUES ('', 1)")
    assert _x(sess, "SELECT count(*) c FROM nn") == 0  # statement rejected whole
    sess.execute("INSERT INTO nn VALUES ('A', 1)")
    assert _x(sess, "SELECT count(*) c FROM nn") == 1
    sess.execute("DROP TABLE nn")


def test_update_and_alter_writes_apply_char_null(sess):
    """SET col='' stores NULL through the copy-on-write rewrite, and an
    ALTER backfill of DEFAULT '' lands as NULL — every write path, not
    just INSERT."""
    sess.execute("DROP TABLE IF EXISTS cw")
    sess.execute("CREATE TABLE cw (id INT, s VARCHAR(10))")
    sess.execute("INSERT INTO cw VALUES (1, 'x'), (2, 'y')")
    sess.execute("UPDATE cw SET s = '' WHERE id = 1")
    assert _x(sess, "SELECT count(*) c FROM cw WHERE s IS NULL") == 1
    sess.execute("ALTER TABLE cw ADD t VARCHAR(5) DEFAULT ''")
    assert _x(sess, "SELECT count(*) c FROM cw WHERE t IS NULL") == 2
    sess.execute("DROP TABLE cw")


def _x(sess, q: str) -> int:
    return sess.execute(q).collect()[0].c
