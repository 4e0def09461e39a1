"""End-to-end migration scenario: the statement sequence a reference
(InfiniDB) user's session actually produces on day one — client
handshake, reference-syntax DDL, bulk load, DML + transactions, the
reference's own string-alias query style, maintenance, admin UDFs —
through ``InfiniSession.execute_script`` (the mysql-client batch
surface, ≅ pfSubmitGroupTest.sh feeding .sql files).

SELECT results are lazy DataFrames over the CURRENT table version, so
each phase collects its results before the next phase mutates state —
exactly the mysql-client rhythm (results stream back per statement).
"""

from __future__ import annotations

import pytest

from infinidb_spark.session import InfiniSession


@pytest.fixture(scope="module")
def sess(spark, sf_dir):
    return InfiniSession(spark, sf_dir)


def _run(sess, script):
    out = []
    for r in sess.execute_script(script):
        out.append(r.collect() if hasattr(r, "collect") else r)
    return out


def test_day_one_session(sess, tmp_path_factory):
    csv = tmp_path_factory.mktemp("mig") / "sales.csv"
    csv.write_text("1,100.5,2024-01-02\n2,25.0,2024-01-03\n3,7.25,2024-01-03\n")

    # phase 1: handshake + reference-syntax DDL + load
    r = _run(sess, f"""
    SET NAMES utf8;
    SET SESSION sql_mode = '';
    USE dwh;
    SELECT @@version_comment;
    CREATE TABLE sales (
        sale_id BIGINT COMMENT 'autoincrement',
        amount  DECIMAL(12,2) NOT NULL,
        sold_on DATE
    ) ENGINE=InfiniDB COMMENT='compression=2';
    LOAD DATA INFILE '{csv}' INTO TABLE sales FIELDS TERMINATED BY ',';
    INSERT INTO sales (amount, sold_on) VALUES (12.75, '2024-01-04');
    SELECT count(*) cnt, round(sum(amount), 2) total FROM sales;
    """)
    assert r[:3] == [0, 0, 0]
    assert r[3][0][0] == "infinidb_spark (PySpark engine)"  # same string SHOW VARIABLES reports
    assert r[4] == 0 and r[5] == 3 and r[6] == 1
    assert (r[7][0].cnt, float(r[7][0].total)) == (4, 145.5)

    # phase 2: transaction rolled back -> state unchanged
    r = _run(sess, """
    BEGIN;
    UPDATE sales SET amount = amount * 2 WHERE sold_on = '2024-01-03';
    ROLLBACK;
    SELECT round(sum(amount), 2) total_after_rollback FROM sales;
    """)
    assert r[0] == 0 and r[1] == 2 and r[2] == 0
    assert float(r[3][0].total_after_rollback) == 145.5

    # phase 3: multi-table UPDATE + maintenance + admin + the
    # reference's string-literal alias query style
    r = _run(sess, """
    UPDATE sales s JOIN region r ON s.sale_id = r.r_regionkey
        SET s.amount = s.amount + r.r_regionkey;
    ANALYZE TABLE sales;
    SHOW CREATE TABLE sales;
    SELECT calgetstats();
    SELECT count(*) 'Perf Probe' from customer where c_acctbal > 0;
    """)
    assert r[0] >= 1  # sale_ids 1.. match region keys 0-4
    assert r[1][0].Msg_type == "status"
    ddl = r[2][0]["Create Table"]
    assert "AUTO_INCREMENT" in ddl and "ENGINE=InfiniDB" in ddl
    assert "QueryTime" in r[3]
    assert r[4][0]["Perf Probe"] > 0

    # phase 4: teardown
    assert _run(sess, "DROP TABLE sales;") == [0]
