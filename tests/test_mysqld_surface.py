"""mysqld maintenance & handshake long tail through InfiniSession.

The statements every MySQL client/tool sends that are NOT queries:
information functions (DATABASE(), CONNECTION_ID(), LAST_INSERT_ID(),
FOUND_ROWS(), ROW_COUNT()), introspection SHOW forms (ENGINES, CHARSET,
COLLATION, INDEX, WARNINGS, GRANTS, OPEN TABLES, TRIGGERS), maintenance
statements (CHECK/ANALYZE/OPTIMIZE/REPAIR TABLE — wired to footer
validation, manifest rebuild, and compaction), and the ack family
(FLUSH/LOCK/UNLOCK TABLES, DO, SLEEP, BENCHMARK).

Reference: the mysqld layer handles these above the storage engine
(`dbcon/mysql/` registers only the cal* UDFs and the handler); a
migrating user's client sends them on day one.
"""

from __future__ import annotations

import pytest

from infinidb_spark.session import InfiniSession


@pytest.fixture(scope="module")
def sess(spark, sf_dir):
    return InfiniSession(spark, sf_dir)


def test_information_functions(sess):
    assert sess.execute("SELECT DATABASE() AS d").collect()[0].d == "infinidb"
    cid = sess.execute("SELECT CONNECTION_ID() AS c").collect()[0].c
    assert cid >= 1
    # stable within the session
    assert sess.execute("SELECT CONNECTION_ID() AS c").collect()[0].c == cid
    # SCHEMA() is the documented alias
    assert sess.execute("SELECT SCHEMA() AS s").collect()[0].s == "infinidb"


def test_last_insert_id_and_row_count(spark, sf_dir):
    s = InfiniSession(spark, sf_dir)
    assert s.execute("SELECT LAST_INSERT_ID() AS li").collect()[0].li == 0
    s.execute("CREATE TABLE li_t (id BIGINT AUTO_INCREMENT, v BIGINT)")
    n = s.execute("INSERT INTO li_t (v) VALUES (10),(20),(30)")
    assert n == 3
    # ROW_COUNT() reads the PREVIOUS statement's affected rows
    assert s._row_count == 3
    # first auto-generated id of the batch (MySQL multi-row rule)
    assert s.execute("SELECT LAST_INSERT_ID() AS li").collect()[0].li == 1
    n = s.execute("INSERT INTO li_t (v) VALUES (40)")
    assert s.execute("SELECT LAST_INSERT_ID() AS li").collect()[0].li == 4


def test_last_insert_id_with_argument_sets_and_returns(sess):
    """MySQL: LAST_INSERT_ID(expr) stores expr as the session value AND
    returns it (sequence emulation); a non-literal argument raises
    instead of silently returning the stored value."""
    import pytest

    from infinidb_spark.dialect import DialectError

    assert sess.execute("SELECT LAST_INSERT_ID(42) AS li").collect()[0].li == 42
    assert sess.execute("SELECT LAST_INSERT_ID() AS li").collect()[0].li == 42
    with pytest.raises(DialectError, match="integer literals"):
        sess.execute("SELECT LAST_INSERT_ID(c_custkey) AS li FROM customer")


def test_sleep_deferred_until_statement_classifies(sess):
    """SLEEP must not fire during token substitution: a statement that
    fails to parse must not have slept."""
    import time

    import pytest

    from infinidb_spark.dialect import DialectError

    t0 = time.monotonic()
    with pytest.raises(Exception):
        # SLEEP present, but the statement is unparseable garbage
        sess.execute("FROBNICATE SLEEP(2) WITH NONSENSE")
    assert time.monotonic() - t0 < 1.5, "SLEEP fired before classification"
    # a parseable statement still sleeps
    t0 = time.monotonic()
    assert sess.execute("SELECT SLEEP(0.3) AS s").collect()[0].s == 0
    assert time.monotonic() - t0 >= 0.25


def test_found_rows(sess):
    df = sess.execute(
        "SELECT SQL_CALC_FOUND_ROWS c_custkey FROM customer "
        "ORDER BY c_custkey LIMIT 5"
    )
    assert len(df.collect()) == 5
    total = sess.execute("SELECT FOUND_ROWS() AS fr").collect()[0].fr
    assert total == sess.table("customer").count()


def test_show_engines_charset_collation(sess):
    eng = sess.execute("SHOW ENGINES").collect()
    assert eng[0].Engine == "InfiniDB" and eng[0].Support == "DEFAULT"
    cs = sess.execute("SHOW CHARACTER SET").collect()
    assert cs[0].Charset == "utf8mb4"
    assert sess.execute("SHOW CHARSET").collect()[0].Charset == "utf8mb4"
    col = {r.Collation for r in sess.execute("SHOW COLLATION").collect()}
    assert {"utf8mb4_bin", "utf8mb4_general_ci"} <= col


def test_show_index_empty_no_indexes(sess):
    # InfiniDB has no index subsystem — zero rows, MySQL column shape
    rows = sess.execute("SHOW INDEX FROM customer").collect()
    assert rows == []
    cols = sess.execute("SHOW KEYS FROM customer").columns
    assert cols[:5] == [
        "Table", "Non_unique", "Key_name", "Seq_in_index", "Column_name",
    ]
    with pytest.raises(KeyError):
        sess.execute("SHOW INDEX FROM no_such_table")


def test_show_misc(sess):
    # failed statements now populate the diagnostics area (mysqld
    # semantics), and the module-scoped session just ran one in
    # test_show_index — a successful statement clears it again
    sess.execute("SELECT 1")
    assert sess.execute("SHOW WARNINGS").collect() == []
    assert sess.execute("SHOW ERRORS").collect() == []
    grants = sess.execute("SHOW GRANTS").collect()
    assert "GRANT ALL PRIVILEGES" in grants[0][0]
    open_tabs = {r.Table for r in sess.execute("SHOW OPEN TABLES").collect()}
    assert "customer" in open_tabs
    assert sess.execute("SHOW TRIGGERS").collect() == []


def test_ack_family(sess):
    assert sess.execute("FLUSH TABLES") == 0
    assert sess.execute("FLUSH PRIVILEGES") == 0
    assert sess.execute("LOCK TABLES customer READ") == 0
    assert sess.execute("UNLOCK TABLES") == 0
    assert sess.execute("DO 1+1") == 0
    assert sess.execute("SELECT SLEEP(0) AS s").collect()[0].s == 0
    assert sess.execute("SELECT BENCHMARK(10, 1+1) AS b").collect()[0].b == 0


def test_table_maintenance_managed(spark, sf_dir):
    s = InfiniSession(spark, sf_dir)
    s.create_table_as("mt", s.table("region"))
    for op, expect in (
        ("CHECK", "OK"),
        ("ANALYZE", "OK"),
        ("OPTIMIZE", "OK"),
        ("REPAIR", "OK"),
    ):
        rows = s.execute(f"{op} TABLE mt").collect()
        assert rows[0].Msg_type == "status", rows
        assert expect in rows[0].Msg_text
        assert rows[0].Table == "infinidb.mt"
    # ANALYZE persists a manifest next to the data (note: OPTIMIZE's
    # copy-on-write swap replaces the version dir, so analyze again)
    import os

    s.execute("ANALYZE TABLE mt")
    assert os.path.exists(
        os.path.join(s._managed["mt"], "_infinidb_manifest.json")
    )
    # table still reads correctly after OPTIMIZE's rewrite
    assert s.table("mt").count() == s.table("region").count()


def test_table_maintenance_external(sess):
    rows = sess.execute("ANALYZE TABLE customer").collect()
    assert rows[0].Msg_type == "note"
    rows = sess.execute("CHECK TABLE customer").collect()
    assert rows[0].Msg_type == "status"
    rows = sess.execute("CHECK TABLE customer, region").collect()
    assert len(rows) == 2


def test_load_data_rejects_surface_as_warnings(spark, sf_dir, tmp_path):
    s = InfiniSession(spark, sf_dir)
    s.execute("CREATE TABLE w_t (id BIGINT NOT NULL, v BIGINT)")
    bad = tmp_path / "bad.csv"
    bad.write_text("1,10\nnotanint,20\n3,30\n")
    s.execute(f"LOAD DATA INFILE '{bad}' INTO TABLE w_t FIELDS TERMINATED BY ','")
    warns = s.execute("SHOW WARNINGS").collect()
    assert warns and warns[0].Level == "Warning"
    assert "rejected" in warns[0].Message


def test_calsetparms(sess):
    msg = sess.execute(
        "SELECT calsetparms('spark.sql.shuffle.partitions', '16')"
    )
    assert "spark.sql.shuffle.partitions" in msg
    assert sess.spark.conf.get("spark.sql.shuffle.partitions") == "16"
    sess.spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_help(sess):
    rows = sess.execute("HELP 'SELECT'").collect()
    assert rows[0].name == "SELECT"


def test_reference_autoincrement_comment_syntax(spark, sf_dir):
    """The reference REJECTS MySQL's AUTO_INCREMENT attribute and
    defines its own comment forms (ha_autoi.cpp, ha_calpont_ddl.cpp:
    1855): column COMMENT 'autoincrement[,start]' and table
    COMMENT='autoincrement=col[,start][;compression=N]'.  Both are
    accepted here alongside the MySQL attribute (kept as an
    extension)."""
    s = InfiniSession(spark, sf_dir)
    s.execute(
        "CREATE TABLE ai_c (id INT COMMENT 'autoincrement,100', v BIGINT) "
        "ENGINE=InfiniDB"
    )
    s.execute("INSERT INTO ai_c (v) VALUES (1),(2)")
    assert {r.id for r in s.execute("SELECT * FROM ai_c").collect()} == {100, 101}
    assert s.execute("SELECT callastinsertid('ai_c')") == 101

    s.execute(
        "CREATE TABLE ai_t (id BIGINT, v BIGINT) ENGINE=InfiniDB "
        "COMMENT='autoincrement=id;compression=1'"
    )
    s.execute("INSERT INTO ai_t (v) VALUES (7)")
    assert s.execute("SELECT * FROM ai_t").collect()[0].id == 1

    s.execute(
        "CREATE TABLE ai_m (id BIGINT AUTO_INCREMENT, v BIGINT) "
        "AUTO_INCREMENT=50"
    )
    s.execute("INSERT INTO ai_m (v) VALUES (9)")
    assert s.execute("SELECT * FROM ai_m").collect()[0].id == 50


def test_autoincrement_comment_error_cases(spark, sf_dir):
    from infinidb_spark.dialect import DialectError

    s = InfiniSession(spark, sf_dir)
    with pytest.raises(DialectError, match="start value"):
        s.execute("CREATE TABLE ai_e1 (id INT COMMENT 'autoincrement,xyz')")
    with pytest.raises(DialectError, match="integer column"):
        s.execute("CREATE TABLE ai_e2 (id VARCHAR(10) COMMENT 'autoincrement')")
    with pytest.raises(DialectError, match="unknown column"):
        s.execute(
            "CREATE TABLE ai_e3 (id INT) COMMENT='autoincrement=nosuch'"
        )
    with pytest.raises(DialectError, match="one AUTO_INCREMENT"):
        s.execute(
            "CREATE TABLE ai_e4 (a INT COMMENT 'autoincrement', "
            "b INT COMMENT 'autoincrement')"
        )


def test_reference_compression_comment(spark, sf_dir):
    """COMMENT='compression=0' disables block compression in the
    reference (utils/compress/idbcompress.cpp; ha_calpont_ddl.cpp
    comment parsing); the Parquet analog writes UNCOMPRESSED pages,
    default stays snappy — asserted from the parquet footers."""
    import glob
    import os

    import pyarrow.parquet as pq

    s = InfiniSession(spark, sf_dir)
    s.execute("CREATE TABLE c0 (id BIGINT, v BIGINT) COMMENT='compression=0'")
    s.execute("INSERT INTO c0 VALUES (1, 10), (2, 20)")
    s.execute("CREATE TABLE c2 (id BIGINT, v BIGINT) COMMENT='compression=2'")
    s.execute("INSERT INTO c2 VALUES (1, 10)")

    def codecs(table):
        real = os.path.realpath(s._managed[table])
        out = set()
        for f in glob.glob(os.path.join(real, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                out.add(md.row_group(rg).column(0).compression)
        return out

    assert codecs("c0") == {"UNCOMPRESSED"}
    assert codecs("c2") == {"SNAPPY"}
    assert s.execute("SELECT count(*) AS c FROM c0").collect()[0].c == 2


def test_vtable_mode_autoswitch(spark, sf_dir):
    """infinidb_vtable_mode parity (ha_calpont_impl.cpp:151,4251):
    mode 0 autoswitches unsupported dialect syntax to standard mode
    (raw Spark SQL) with the reference's verbatim warning; mode 1
    (default) errors; mode 2 always runs standard mode."""
    from infinidb_spark.dialect import DialectError

    s = InfiniSession(spark, sf_dir)
    # a computed DATE_FORMAT pattern: the translator requires a string
    # literal (it must map %-tokens), but it is valid Spark SQL
    exotic = (
        "SELECT DATE_FORMAT(o_orderdate, concat('yyyy','-MM')) AS ym "
        "FROM orders LIMIT 2"
    )
    with pytest.raises(DialectError):
        s.execute(exotic)

    s.execute("SET infinidb_vtable_mode = 0")
    rows = s.execute(exotic).collect()
    assert len(rows) == 2 and "-" in rows[0].ym
    warns = s.execute("SHOW WARNINGS").collect()
    assert warns and "switched to standard mode" in warns[0].Message

    s.execute("SET infinidb_vtable_mode = 2")
    assert len(s.execute("SELECT r_regionkey FROM region").collect()) == 5

    s.execute("SET infinidb_vtable_mode = 1")
    with pytest.raises(DialectError):
        s.execute(exotic)


def test_warning_count_surface(spark, sf_dir, tmp_path):
    s = InfiniSession(spark, sf_dir)
    assert s.execute("SELECT @@warning_count AS w").collect()[0].w == 0
    s.execute("CREATE TABLE wc_t (id BIGINT NOT NULL, v BIGINT)")
    bad = tmp_path / "wc.csv"
    bad.write_text("1,10\nbad,20\n")
    s.execute(f"LOAD DATA INFILE '{bad}' INTO TABLE wc_t FIELDS TERMINATED BY ','")
    assert s.execute("SELECT @@warning_count AS w").collect()[0].w == 1
    assert s.execute("SELECT @@error_count AS e").collect()[0].e == 0
    row = s.execute("SHOW COUNT(*) WARNINGS").collect()[0]
    assert row[0] == 1
    assert s.execute("SHOW COUNT(*) ERRORS").collect()[0][0] == 0


def test_rename_table_statement(spark, sf_dir):
    """MySQL's standalone RENAME TABLE a TO b [, c TO d] — routes
    through the ALTER RENAME machinery per pair."""
    s = InfiniSession(spark, sf_dir)
    s.execute("CREATE TABLE rn1 (id BIGINT)")
    s.execute("CREATE TABLE rn2 (id BIGINT)")
    s.execute("INSERT INTO rn1 VALUES (1)")
    s.execute("INSERT INTO rn2 VALUES (2), (3)")
    assert s.execute("RENAME TABLE rn1 TO rn1x, rn2 TO rn2x") == 0
    assert s.execute("SELECT count(*) AS c FROM rn1x").collect()[0].c == 1
    assert s.execute("SELECT count(*) AS c FROM rn2x").collect()[0].c == 2
    import pytest

    from infinidb_spark.dialect import DialectError

    with pytest.raises(DialectError):
        s.execute("RENAME TABLE rn1x")  # missing TO
    with pytest.raises(Exception):
        s.execute("SELECT * FROM rn1").collect()  # old name gone


def test_mysql_operator_long_tail(sess):
    """Infix MOD, CAST AS UNSIGNED/SIGNED, the BINARY prefix operator,
    and MySQL collation names in COLLATE clauses — the expression-level
    long tail real clients send."""
    r = sess.execute(
        "SELECT 7 DIV 2 AS a, 7 MOD 2 AS b, MOD(9, 4) AS c"
    ).collect()[0]
    assert (r.a, r.b, r.c) == (3, 1, 1)
    r = sess.execute(
        "SELECT CAST('42' AS UNSIGNED) AS u, CAST('-3' AS SIGNED INTEGER) AS s"
    ).collect()[0]
    assert (r.u, r.s) == (42, -3)
    # BINARY prefix forces byte-wise comparison even in ci contexts
    r = sess.execute("SELECT BINARY 'a' = 'A' AS x, BINARY ('a') = 'a' AS y").collect()[0]
    assert (r.x, r.y) == (False, True)
    # MySQL collation names map onto Spark collations
    assert sess.execute(
        "SELECT 'a' = 'A' COLLATE utf8mb4_bin AS c"
    ).collect()[0].c is False
    assert sess.execute(
        "SELECT 'a' = 'A' COLLATE utf8mb4_general_ci AS c"
    ).collect()[0].c is True
    # type-position BINARY is untouched
    assert sess.execute(
        "SELECT LENGTH(CAST('ab' AS BINARY)) AS n"
    ).collect()[0].n == 2
    # XOR has no precedence-preserving token rewrite: refuse loudly
    from infinidb_spark.dialect import DialectError

    with pytest.raises(DialectError, match="XOR"):
        sess.execute("SELECT 1 XOR 0")


def test_funcmap_text_path_completions(sess):
    """The last reference-FuncMap names that had Column builders but no
    SQL-text translation: TRUNCATE / MAKEDATE / MAKETIME / ADDTIME /
    TIMEDIFF / MICROSECOND / SYSDATE (funcexp.cpp registry names)."""
    r = sess.execute(
        "SELECT TRUNCATE(3.14159, 2) AS a, TRUNCATE(-3.999, 1) AS b, "
        "TRUNCATE(12345, -2) AS c, TRUNCATE(0.29, 2) AS d"
    ).collect()[0]
    # decimal input now STAYS decimal (the registry truncate() parity
    # fix: pow(10.0,d) double arithmetic floored 0.29 to 0.28)
    assert (float(r.a), float(r.b), float(r.c), float(r.d)) == (
        3.14, -3.9, 12300.0, 0.29,
    )
    assert str(sess.execute("SELECT MAKEDATE(2024, 60) AS d").collect()[0].d) == "2024-02-29"
    assert sess.execute("SELECT MAKETIME(10, 5, 3) AS t").collect()[0].t == "10:05:03"
    # fractional seconds preserved through the SQL-text template too
    assert (
        sess.execute("SELECT MAKETIME(10, 5, 3.5) AS t").collect()[0].t
        == "10:05:03.5"
    )
    r = sess.execute(
        "SELECT TIMEDIFF(TIMESTAMP '2024-01-01 10:30:00', "
        "TIMESTAMP '2024-01-01 09:00:00') AS t, "
        "TIMEDIFF(TIMESTAMP '2024-01-01 09:00:00', "
        "TIMESTAMP '2024-01-01 10:30:00') AS u"
    ).collect()[0]
    assert (r.t, r.u) == ("01:30:00", "-01:30:00")
    assert sess.execute(
        "SELECT MICROSECOND(TIMESTAMP '2024-01-01 10:00:00.123456') AS m"
    ).collect()[0].m == 123456
    assert sess.execute("SELECT SYSDATE() IS NOT NULL AS s").collect()[0].s
