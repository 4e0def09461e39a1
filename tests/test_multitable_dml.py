"""Multi-table DML (SQLCOM_UPDATE_MULTI / DELETE_MULTI analog), REPLACE
and ON DUPLICATE KEY degradation on keyless tables, and the reference's
unsupported-index DDL rejection (`ha_calpont_ddl.cpp:1862`)."""

from __future__ import annotations

import pytest

from infinidb_spark.dialect import DialectError
from infinidb_spark.session import InfiniSession


@pytest.fixture
def sess(spark, sf_dir):
    s = InfiniSession(spark, sf_dir)
    s.execute("CREATE TABLE m1 (id BIGINT, v BIGINT, tag VARCHAR(10))")
    s.execute(
        "INSERT INTO m1 VALUES (0,10,'a'), (1,20,'b'), (2,30,'c'), (99,40,'d')"
    )
    return s


def test_update_join_sets_from_matched_row(sess):
    n = sess.execute(
        "UPDATE m1 a JOIN region r ON a.id = r.r_regionkey "
        "SET a.tag = r.r_name, a.v = a.v + r.r_regionkey "
        "WHERE r.r_regionkey < 2"
    )
    assert n == 2
    rows = {r.id: (r.v, r.tag) for r in sess.execute("SELECT * FROM m1").collect()}
    assert rows[0] == (10, "AFRICA")
    assert rows[1] == (21, "AMERICA")
    assert rows[2] == (30, "c")  # matched but WHERE-filtered
    assert rows[99] == (40, "d")  # no join match


def test_update_join_unqualified_set_column(sess):
    # SET with a bare target column, values from the join table
    n = sess.execute(
        "UPDATE m1 JOIN region ON m1.id = region.r_regionkey "
        "SET tag = region.r_name"
    )
    assert n == 3
    rows = {r.id: r.tag for r in sess.execute("SELECT * FROM m1").collect()}
    assert rows[99] == "d"
    assert rows[0] == "AFRICA"


def test_delete_join(sess):
    n = sess.execute(
        "DELETE a FROM m1 a JOIN region r ON a.id = r.r_regionkey "
        "WHERE r.r_regionkey >= 2"
    )
    assert n == 1
    ids = {r.id for r in sess.execute("SELECT * FROM m1").collect()}
    assert ids == {0, 1, 99}


def test_delete_join_requires_target_ref(sess):
    with pytest.raises(DialectError):
        sess.execute(
            "DELETE r FROM m1 a JOIN region r ON a.id = r.r_regionkey"
        )


def test_update_alias_no_join(sess):
    n = sess.execute("UPDATE m1 a SET a.v = 0 WHERE a.id = 99")
    assert n == 1
    rows = {r.id: r.v for r in sess.execute("SELECT * FROM m1").collect()}
    assert rows[99] == 0


def test_multitable_on_condition_bounded(sess):
    with pytest.raises(DialectError):
        sess.execute(
            "UPDATE m1 a JOIN region r ON a.id < r.r_regionkey SET a.v = 0"
        )


def test_replace_degrades_to_insert(sess):
    # no unique keys → MySQL-documented REPLACE ≡ INSERT
    assert sess.execute("REPLACE INTO m1 VALUES (7, 70, 'x')") == 1
    assert sess.execute("SELECT count(*) AS c FROM m1").collect()[0].c == 5


def test_on_duplicate_key_clause_dropped(sess):
    assert sess.execute(
        "INSERT INTO m1 VALUES (8, 80, 'y') ON DUPLICATE KEY UPDATE v = 0"
    ) == 1
    rows = {r.id: r.v for r in sess.execute("SELECT * FROM m1").collect()}
    assert rows[8] == 80


@pytest.mark.parametrize("stmt", [
    "CREATE INDEX i1 ON m1 (id)",
    "CREATE UNIQUE INDEX i2 ON m1 (id)",
    "ALTER TABLE m1 ADD INDEX (v)",
    "ALTER TABLE m1 ADD KEY k1 (v)",
    "ALTER TABLE m1 ADD PRIMARY KEY (id)",
    "ALTER TABLE m1 ADD UNIQUE (id)",
    "ALTER TABLE m1 DROP INDEX i1",
    "DROP INDEX i1 ON m1",
])
def test_index_ddl_rejected_with_reference_message(sess, stmt):
    with pytest.raises(DialectError, match="not supported by InfiniDB"):
        sess.execute(stmt)
