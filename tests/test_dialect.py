"""MySQL-dialect front-end (dialect.py) — translation + execution.

Expected values follow MySQL's documented semantics for each function
(the reference implements them in utils/funcexp/func_*.cpp; the
translator expands them to Spark expressions).
"""

from __future__ import annotations

import pytest

from infinidb_spark.dialect import DialectError, translate_mysql


def one(spark, expr_sql: str):
    return spark.sql(f"SELECT {translate_mysql(expr_sql)} AS v").collect()[0].v


# ------------------------------------------------------------ pure text


def test_limit_offset_rewrite():
    assert "LIMIT 3 OFFSET 1" in translate_mysql("SELECT a FROM t LIMIT 1, 3")
    # plain LIMIT untouched
    assert translate_mysql("SELECT a FROM t LIMIT 5").strip().endswith("LIMIT 5")
    # nested subquery LIMIT also rewritten
    out = translate_mysql("SELECT * FROM (SELECT a FROM t LIMIT 2, 4) s")
    assert "LIMIT 4 OFFSET 2" in out


def test_literals_and_comments_never_rewritten():
    sql = "SELECT 'LIMIT 1, 3 GROUP_CONCAT(x)' AS s, `TO_DAYS` FROM t -- TO_DAYS(a)"
    out = translate_mysql(sql)
    assert "'LIMIT 1, 3 GROUP_CONCAT(x)'" in out
    assert "`TO_DAYS`" in out
    assert "-- TO_DAYS(a)" in out


def test_infinidb_ordered_hint_dropped():
    # the reference's perf corpus writes /*! INFINIDB_ORDERED */ in the
    # select list (utils/scenarios/perf/sql/3/q4.3.sql); the hint is
    # accepted and dropped, never left as a bare token
    out = translate_mysql("Select /*! INFINIDB_ORDERED */ a, b from t")
    assert "INFINIDB_ORDERED" not in out
    assert "a, b from t" in out


def test_string_alias_becomes_backtick_identifier():
    out = translate_mysql("select count(*) 'Total Count' from t")
    assert "`Total Count`" in out and "'Total Count'" not in out
    out = translate_mysql("select c_acctbal AS 'bal', c_name 'nm' from customer")
    assert "`bal`" in out and "`nm`" in out
    out = translate_mysql("select case when a=1 then 'x' else 'y' end 'flag' from t")
    assert out.count("`flag`") == 1 and "'x'" in out and "'y'" in out


def test_operand_strings_never_aliased():
    sql = ("select 'lit', concat('a', 'b') from t where x in ('p','q') "
           "and y between 'l' and 'h' and z like 'm%' and d > date '2020-01-01'")
    assert translate_mysql(sql) == sql


def test_version_comment_executes_body():
    out = translate_mysql("SELECT a /*!40101 , b */ FROM t /* plain */")
    assert ", b" in out and "/*!" not in out
    assert "/* plain */" in out


def test_group_concat_forms():
    assert translate_mysql("SELECT GROUP_CONCAT(x) FROM t") == (
        "SELECT listagg(x, ',') FROM t"
    )
    out = translate_mysql(
        "SELECT GROUP_CONCAT(DISTINCT x ORDER BY y DESC SEPARATOR '|') FROM t"
    )
    assert out == "SELECT listagg(DISTINCT x, '|') WITHIN GROUP (ORDER BY y DESC) FROM t"


def test_date_format_token_translation():
    out = translate_mysql("SELECT DATE_FORMAT(d, '%Y-%m-%d %H:%i:%s') FROM t")
    assert "date_format(d, 'yyyy-MM-dd HH:mm:ss')" in out
    # composed tokens expand to SQL expressions (round 4; was a refusal)
    out = translate_mysql("SELECT DATE_FORMAT(d, '%V') FROM t")
    assert "datediff" in out
    with pytest.raises(DialectError):  # non-literal format
        translate_mysql("SELECT DATE_FORMAT(d, f) FROM t")


def test_tokenize_render_roundtrip_property():
    """The lexer must be lossless: render(tokenize(s)) == s for any
    input (version comments excepted — they unwrap by design)."""
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    from infinidb_spark.dialect import render, tokenize

    alphabet = list("abcXY01 \t\n'\"`\\%._,()<>=!-#/*;:+")

    @given(hst.text(alphabet=hst.sampled_from(alphabet), max_size=60))
    @settings(max_examples=300, deadline=None)
    def check(s):
        # three constructs intentionally normalize: version comments
        # unwrap, '#' comments become '--', no-space '--' splits into
        # double negation (MySQL rules Spark doesn't share)
        if "/*!" in s or "#" in s or "--" in s:
            return
        assert render(tokenize(s)) == s

    check()


# ----------------------------------------------------- executed semantics


def test_mysql_function_values(spark):
    # MySQL: TO_DAYS('2008-10-07') = 733687; FROM_DAYS inverts
    assert one(spark, "TO_DAYS(DATE '2008-10-07')") == 733687
    assert str(one(spark, "FROM_DAYS(733687)")) == "2008-10-07"
    # MySQL doc examples
    assert one(spark, "PERIOD_ADD(200801, 2)") == 200803
    assert one(spark, "PERIOD_DIFF(200802, 200703)") == 11
    assert one(spark, "TIME_TO_SEC('22:23:00')") == 80580
    assert one(spark, "SEC_TO_TIME(80580)") == "22:23:00"
    assert one(spark, "INET_ATON('10.0.5.9')") == 167773449
    assert one(spark, "INET_NTOA(167773449)") == "10.0.5.9"
    assert one(spark, "UCASE('ab')") == "AB"
    assert one(spark, "MID('quadratically', 5, 6)") == "ratica"


def test_mysql_comment_and_negation_rules(spark):
    # '#' comments execute (normalized to '--')
    assert spark.sql(translate_mysql("SELECT 7 AS v # seven")).collect()[0].v == 7
    # MySQL: '--' without whitespace is double negation, not a comment
    assert one(spark, "5--3") == 8
    # with whitespace it IS a comment
    assert "-- tail" in translate_mysql("SELECT 1 -- tail")


def test_wrong_arity_and_multi_expr_group_concat(spark):
    with pytest.raises(DialectError, match="TO_DAYS expects 1"):
        translate_mysql("SELECT TO_DAYS(a, b) FROM t")
    out = translate_mysql("SELECT GROUP_CONCAT(a, '-', b) FROM t")
    assert "listagg(concat(a, '-', b), ',')" in out
    with pytest.raises(DialectError):  # guard now covers the WHERE tail
        from infinidb_spark.dialect import parse_statement

        parse_statement("UPDATE t SET a = 1 WHERE x > 1 LIMIT 5")


def test_date_addsub_interval_forms(spark):
    # literal intervals keep DATE-ness; MySQL doc examples
    assert str(one(spark, "DATE_ADD(DATE '2008-01-02', INTERVAL 31 DAY)")) == "2008-02-02"
    assert str(one(spark, "DATE_SUB(DATE '2008-02-02', INTERVAL 31 DAY)")) == "2008-01-02"
    assert str(one(spark, "ADDDATE(DATE '2008-01-02', 31)")) == "2008-02-02"
    # WEEK/QUARTER normalize (×7 DAY / ×3 MONTH)
    assert str(one(spark, "DATE_ADD(DATE '2024-01-01', INTERVAL 2 WEEK)")).startswith("2024-01-15")
    assert str(one(spark, "DATE_ADD(DATE '2024-01-31', INTERVAL 1 QUARTER)")).startswith("2024-04-30")
    # expression quantity
    assert str(one(spark, "DATE_ADD(DATE '2024-01-01', INTERVAL 1 + 2 DAY)")).startswith("2024-01-04")
    with pytest.raises(DialectError):
        translate_mysql("SELECT DATE_ADD(d, INTERVAL 1 FORTNIGHT) FROM t")


def test_strcmp_and_format(spark):
    assert one(spark, "STRCMP('text', 'text2')") == -1
    assert one(spark, "STRCMP('text2', 'text')") == 1
    assert one(spark, "STRCMP('text', 'text')") == 0
    assert one(spark, "STRCMP(NULL, 'x')") is None
    assert one(spark, "FORMAT(1234567.891, 2)") == "1,234,567.89"


def test_str_to_date_roundtrip(spark):
    v = one(spark, "STR_TO_DATE('2024-03-01 10:30:00', '%Y-%m-%d %H:%i:%s')")
    assert str(v) == "2024-03-01 10:30:00"


def test_parse_statement_shapes():
    from infinidb_spark.dialect import parse_statement

    st = parse_statement("INSERT INTO `t` (a, b) VALUES (1, 'x'), (2, 'y')")
    assert st == {
        "kind": "insert", "table": "t", "columns": ["a", "b"],
        "select_sql": "SELECT * FROM VALUES (1, 'x'), (2, 'y')",
    }
    st = parse_statement("INSERT INTO t SELECT a, b FROM s LIMIT 1, 2")
    assert st["columns"] is None and "LIMIT 2 OFFSET 1" in st["select_sql"]
    st = parse_statement("UPDATE t SET a = a + 1, b = UCASE(b) WHERE a > 3")
    assert st["assignments"] == {"a": "a + 1", "b": "upper(b)"}
    assert st["where"] == "a > 3"
    st = parse_statement("DELETE FROM t WHERE b IN (SELECT b FROM s WHERE x = 1)")
    assert st["kind"] == "delete" and st["where"].startswith("b IN")
    # no-WHERE forms hit every row; ORDER BY/LIMIT tails are refused
    assert parse_statement("DELETE FROM t")["where"] is None
    with pytest.raises(DialectError):
        parse_statement("DELETE FROM t ORDER BY a LIMIT 5")
    with pytest.raises(DialectError):
        parse_statement("UPDATE t SET a = 1 LIMIT 5")


def test_mysql_dml_lifecycle_via_execute(spark, sf_dir):
    """The dml_lifecycle scenario issued as MySQL statement text."""
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    nation = sess.table("nation")
    sess.create_table_as("nation_m", nation)
    n0 = nation.count()

    assert sess.execute(
        "INSERT INTO nation_m (n_nationkey, n_name, n_regionkey) "
        "VALUES (99, 'NEWLAND', 0), (100, 'OLDLAND', 1)"
    ) == 2
    updated = sess.execute(
        "UPDATE nation_m SET n_name = CONCAT(n_name, '_X') WHERE n_regionkey = 2"
    )
    assert updated == nation.filter("n_regionkey = 2").count()
    deleted = sess.execute("DELETE FROM `nation_m` WHERE n_regionkey = 4")
    assert deleted == nation.filter("n_regionkey = 4").count()

    # end state queryable through the same session (view refreshed)
    final = sess.execute("SELECT COUNT(*) AS n FROM nation_m").collect()[0].n
    assert final == n0 + 2 - deleted
    marked = sess.execute(
        "SELECT GROUP_CONCAT(DISTINCT n_regionkey) AS r FROM nation_m "
        "WHERE n_name LIKE '%\\_X'"
    ).collect()[0].r
    assert marked == "2"


def test_execute_null_condition_rows_kept(spark, sf_dir):
    """DELETE/UPDATE with a NULL-evaluating WHERE keeps those rows
    (three-valued logic, operators/dml.py)."""
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark)
    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, 20)], "id bigint, v bigint"
    )
    sess.create_table_as("t_null", df)
    assert sess.execute("DELETE FROM t_null WHERE v < 10") == 1  # only id=2
    left = sorted(r.id for r in sess.execute("SELECT id FROM t_null").collect())
    assert left == [1, 3]
    assert sess.execute("UPDATE t_null SET v = 0 WHERE v > 100") == 0
    # MySQL errors on unknown INSERT columns — so do we (no silent drop)
    with pytest.raises(ValueError, match="nope"):
        sess.execute("INSERT INTO t_null (id, nope) VALUES (9, 9)")


def test_explain_statement_and_priority_pool(spark, sf_dir):
    from infinidb_spark.dialect import parse_statement
    from infinidb_spark.session import InfiniSession

    st = parse_statement("EXPLAIN SELECT a FROM t LIMIT 1, 2")
    assert st["kind"] == "explain" and "LIMIT 2 OFFSET 1" in st["sql"]

    sess = InfiniSession(spark, sf_dir)
    plan = sess.execute("EXPLAIN SELECT COUNT(*) FROM nation")
    assert isinstance(plan, str) and "Physical Plan" in plan

    sc = spark.sparkContext
    with sess.priority("etl"):
        assert sc.getLocalProperty("spark.scheduler.pool") == "etl"
        sess.sql("SELECT 1").collect()
    assert sc.getLocalProperty("spark.scheduler.pool") is None


def test_ddl_ctas_truncate_drop(spark, sf_dir):
    from infinidb_spark.dialect import DialectError, parse_statement
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    n = sess.execute(
        "CREATE TABLE nation_ctas AS SELECT n_nationkey, UCASE(n_name) AS nm "
        "FROM nation WHERE n_regionkey < 2"
    )
    assert n == sess.table("nation").filter("n_regionkey < 2").count() > 0
    got = sess.execute("SELECT COUNT(*) AS c FROM nation_ctas").collect()[0].c
    assert got == n
    # round-trips through DML on the created table
    sess.execute("DELETE FROM nation_ctas WHERE n_nationkey < 5")
    assert sess.execute("TRUNCATE TABLE nation_ctas") == 0
    assert sess.execute("SELECT COUNT(*) AS c FROM nation_ctas").collect()[0].c == 0
    # schema survives truncate
    assert set(sess.table("nation_ctas").columns) == {"n_nationkey", "nm"}
    sess.execute("DROP TABLE nation_ctas")
    assert "nation_ctas" not in sess._managed
    assert sess.execute("DROP TABLE IF EXISTS nation_ctas") == 0
    with pytest.raises(KeyError):
        sess.execute("DROP TABLE nation_ctas")
    # typed CREATE is the DDL path (ddl.y:280-296), parsed separately
    assert parse_statement("CREATE TABLE t (a INT)")["kind"] == "create_typed"
    with pytest.raises(DialectError):  # no AS and no column list
        parse_statement("CREATE TABLE t")


def test_show_tables_and_describe_mysql_shape(spark, sf_dir):
    """SHOW TABLES returns MySQL's single Tables_in_* column; DESCRIBE
    returns the Field/Type/Null/Key/Default/Extra shape."""
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    tables = {r[0] for r in sess.execute("SHOW TABLES").collect()}
    assert {"nation", "region", "orders", "lineitem"} <= tables
    cols = {r.Field for r in sess.execute("DESCRIBE nation").collect()}
    assert {"n_nationkey", "n_name", "n_regionkey"} <= cols


def test_execute_refuses_unmanaged_table(spark, sf_dir):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    with pytest.raises(KeyError):
        sess.execute("DELETE FROM nation WHERE n_regionkey = 0")


def test_session_mysql_dialect_end_to_end(spark, sf_dir):
    from infinidb_spark.plans.dialect import MYSQL_QUERY, mysql_dialect_query
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    via_session = sess.sql(MYSQL_QUERY, dialect="mysql")
    via_query = mysql_dialect_query(spark, sf_dir)
    rows = via_query.collect()
    assert rows == via_session.collect()
    assert 0 < len(rows) <= 3
    assert set(via_query.columns) == {
        "o_orderpriority", "statuses", "first_month", "last_days", "n_orders"
    }
    # statuses is an ordered, deduped concat like 'F|O|P'
    parts = rows[0].statuses.split("|")
    assert parts == sorted(set(parts))


def test_create_table_typed_defaults_and_notnull(spark):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark)
    sess.execute(
        "CREATE TABLE typed_t ("
        "  id BIGINT NOT NULL,"
        "  name VARCHAR(32) DEFAULT 'anon',"
        "  bal DECIMAL(10,2) DEFAULT 0.00,"
        "  note TEXT"
        ") ENGINE=InfiniDB DEFAULT CHARSET=utf8"
    )
    assert sess.execute("SELECT count(*) AS n FROM typed_t").collect()[0].n == 0
    # named INSERT: gaps fill from DEFAULT (name, bal), NULL (note)
    n = sess.execute("INSERT INTO typed_t (id) VALUES (1)")
    assert n == 1
    row = sess.execute("SELECT * FROM typed_t").collect()[0]
    assert (row.id, row.name, str(row.bal), row.note) == (1, "anon", "0.00", None)
    # NOT NULL violation rejects the whole statement
    import pytest as _pytest

    with _pytest.raises(ValueError, match="NOT NULL"):
        sess.execute("INSERT INTO typed_t (id, name) VALUES (NULL, 'x')")
    assert sess.execute("SELECT count(*) AS n FROM typed_t").collect()[0].n == 1


def test_create_table_typed_rejects_keys(spark):
    from infinidb_spark.dialect import DialectError, parse_statement
    import pytest as _pytest

    with _pytest.raises(DialectError, match="no indexes"):
        parse_statement("CREATE TABLE t (id INT, PRIMARY KEY (id))")
    # AUTO_INCREMENT is supported since round 4 (integer columns only)
    st = parse_statement("CREATE TABLE t (id INT AUTO_INCREMENT)")
    assert st["columns"][0]["auto_increment"] is True


def test_show_create_table_roundtrip(spark):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark)
    sess.execute(
        "CREATE TABLE sc_t (id BIGINT NOT NULL, v DOUBLE DEFAULT 1.5, s TEXT)"
    )
    out = sess.execute("SHOW CREATE TABLE sc_t").collect()[0]
    ddl = out["Create Table"]
    assert out["Table"] == "sc_t"
    assert "`id` BIGINT NOT NULL" in ddl
    assert "`v` DOUBLE DEFAULT 1.5" in ddl
    assert "`s` TEXT" in ddl and "ENGINE=InfiniDB" in ddl
    # the synthesized DDL parses back through the dialect
    from infinidb_spark.dialect import parse_statement

    st = parse_statement(ddl)
    assert st["kind"] == "create_typed" and len(st["columns"]) == 3


def test_create_table_like(spark, sf_dir):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    sess.execute(
        "CREATE TABLE like_src (id BIGINT NOT NULL, v DOUBLE DEFAULT 2.5)"
    )
    sess.execute("INSERT INTO like_src (id) VALUES (1)")
    assert sess.execute("CREATE TABLE like_dst LIKE like_src") == 0
    # structure copied, data not
    assert sess.execute("SELECT count(*) AS n FROM like_dst").collect()[0].n == 0
    assert [f.name for f in sess.table("like_dst").schema.fields] == ["id", "v"]
    # column metadata carries: DEFAULT fills, NOT NULL enforces
    sess.execute("INSERT INTO like_dst (id) VALUES (7)")
    row = sess.execute("SELECT * FROM like_dst").collect()[0]
    assert (row.id, row.v) == (7, 2.5)
    # LIKE from a read-only source table also works (schema only)
    sess.execute("CREATE TABLE like_nation LIKE nation")
    assert sess.execute("SELECT count(*) AS n FROM like_nation").collect()[0].n == 0


def test_split_statements_respects_strings_and_comments():
    from infinidb_spark.dialect import split_statements

    script = (
        "CREATE TABLE s1 (a INT); -- trailing; comment\n"
        "INSERT INTO s1 VALUES (1), (2);\n"
        "SELECT 'a;b' AS v FROM s1;\n"
        "/* block; comment */\n"
    )
    stmts = split_statements(script)
    assert len(stmts) == 3
    assert stmts[0].startswith("CREATE TABLE")
    assert "'a;b'" in stmts[2]


def test_execute_script_end_to_end(spark):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark)
    results = sess.execute_script(
        "CREATE TABLE script_t (id BIGINT, v DOUBLE DEFAULT 0.5);"
        "INSERT INTO script_t (id) VALUES (1), (2);"
        "SELECT count(*) AS n, round(sum(v), 2) AS sv FROM script_t"
    )
    assert results[0] == 0 and results[1] == 2
    row = results[2].collect()[0]
    assert (row.n, row.sv) == (2, 1.0)


def test_user_variables(spark, sf_dir):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    sess.execute("SET @lim = (SELECT max(n_nationkey) FROM nation)")
    assert sess.execute("SELECT @lim AS v").collect()[0].v == 24
    n = sess.execute(
        "SELECT count(*) AS n FROM nation WHERE n_nationkey < @lim"
    ).collect()[0].n
    assert n == 24
    # variables compose; strings quote correctly; undefined reads NULL
    sess.execute("SET @name = 'NATION_3'")
    got = sess.execute(
        "SELECT n_nationkey AS k FROM nation WHERE n_name = @name"
    ).collect()
    assert len(got) == 1
    assert sess.execute("SELECT @missing AS v").collect()[0].v is None
    sess.execute("SET @two = @lim - 22")
    assert sess.execute("SELECT @two AS v").collect()[0].v == 2


def test_prepared_statements(spark, sf_dir):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    sess.execute(
        "PREPARE top_n FROM 'SELECT n_name FROM nation WHERE n_regionkey = ? "
        "ORDER BY n_name LIMIT ?'"
    )
    rows = sess.execute("EXECUTE top_n USING 1, 2").collect()
    assert len(rows) == 2
    sess.execute("SET @r = 2")
    rows2 = sess.execute("EXECUTE top_n USING @r, 3").collect()
    assert len(rows2) == 3
    with pytest.raises(DialectError, match="placeholder"):
        sess.execute("EXECUTE top_n USING 1")
    sess.execute("DEALLOCATE PREPARE top_n")
    with pytest.raises(KeyError):
        sess.execute("EXECUTE top_n USING 1, 2")
    # '?' inside a string literal is not a placeholder
    sess.execute("PREPARE q FROM 'SELECT count(*) AS n FROM nation WHERE n_name <> ''?'''")
    assert sess.execute("EXECUTE q").collect()[0].n == 25


def test_select_into_var_and_insert_set(spark, sf_dir):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    sess.execute("SELECT max(n_nationkey), min(n_name) INTO @mx, @mn FROM nation")
    assert sess.execute("SELECT @mx AS v").collect()[0].v == 24
    assert sess.execute("SELECT @mn AS v").collect()[0].v == "NATION_0"
    with pytest.raises(ValueError, match="more than one row"):
        sess.execute("SELECT n_nationkey INTO @x FROM nation")
    # zero rows: variable unchanged
    sess.execute("SET @keep = 7")
    sess.execute("SELECT n_nationkey INTO @keep FROM nation WHERE n_nationkey < 0")
    assert sess.execute("SELECT @keep AS v").collect()[0].v == 7
    # INSERT ... SET with a variable reference
    sess.execute("CREATE TABLE iset_t (id BIGINT, s TEXT)")
    n = sess.execute("INSERT INTO iset_t SET id = @mx + 1, s = 'via set'")
    assert n == 1
    row = sess.execute("SELECT * FROM iset_t").collect()[0]
    assert (row.id, row.s) == (25, "via set")


def test_system_variables(spark):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark)
    assert "infinidb" in sess.execute("SELECT @@version AS v").collect()[0].v
    assert sess.execute("SELECT @@autocommit AS v").collect()[0].v == 1
    sess.execute("SET autocommit = 0")
    assert sess.execute("SELECT @@autocommit AS v").collect()[0].v == 0
    sess.execute("SET autocommit = 1")
    with pytest.raises(DialectError, match="unknown system variable"):
        sess.execute("SELECT @@no_such_var")


def test_tpch_q15_view_script_flow(spark, sf_dir):
    """The reference's Q15 runs as a SCRIPT — CREATE VIEW revenue0,
    argmax SELECT against it, DROP VIEW (dbcon/doc/tpch15.sql).  Drive
    the literal statement flow through execute_script and check the
    result against the inlined-derived-table twin (plans/tpch.py)."""
    import __spark_entry__ as entry_mod
    from infinidb_spark.session import InfiniSession

    QUERIES = entry_mod.queries()

    sess = InfiniSession(spark, sf_dir)
    results = sess.execute_script(
        """
        CREATE VIEW revenue0 (supplier_no, total_revenue) AS
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1 - l_discount)), 4)
          FROM lineitem
          WHERE l_shipdate >= date '1997-01-01'
            AND l_shipdate < date '1997-04-01'
          GROUP BY l_suppkey;
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue0
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
        ORDER BY s_suppkey;
        DROP VIEW revenue0;
        """
    )
    script_rows = [
        r for r in results if hasattr(r, "collect")
    ][0].collect()
    twin_rows = QUERIES["tpch_q15"](spark, sf_dir).collect()
    assert [tuple(r) for r in script_rows] == [tuple(r) for r in twin_rows]


def test_ansi_trim_specifiers_not_aliased(spark):
    """TRIM(BOTH/LEADING/TRAILING 'x' FROM s): the literal after the
    specifier sits between a non-blocker word and FROM — it must NOT be
    converted to a backtick alias (regression: translate_mysql turned
    it into `x` and Spark resolved it as a column)."""
    from infinidb_spark.dialect import translate_mysql

    for spec, want in [("both", "a"), ("leading", "axx"), ("trailing", "xxa")]:
        sql = f"select trim({spec} 'x' from 'xxaxx') as t"
        assert spark.sql(translate_mysql(sql)).collect()[0].t == want


def test_select_modifiers_accepted(spark, sf_dir):
    """mysqld's select_option_list: STRAIGHT_JOIN / SQL_NO_CACHE /
    SQL_CALC_FOUND_ROWS / HIGH_PRIORITY are accepted and dropped
    (cache/priority hints are mysqld-internal; join order goes to
    Catalyst/AQE like INFINIDB_ORDERED), DISTINCTROW normalizes to
    DISTINCT, and the join-operator form `a STRAIGHT_JOIN b ON`
    becomes INNER JOIN."""
    from infinidb_spark.session import load_tables

    load_tables(spark, sf_dir, register=True, names=("region", "nation"))
    t = translate_mysql
    assert spark.sql(t(
        "select sql_no_cache sql_calc_found_rows r_regionkey from region"
    )).count() == 5
    assert "DISTINCT" in t("select distinctrow r_name from region").upper()
    assert spark.sql(t(
        "select a.r_regionkey from region a straight_join nation b "
        "on a.r_regionkey = b.n_regionkey"
    )).count() == 25
    # strings are untouched; modifiers only drop right after SELECT
    sql = "select r_name from region where r_name <> 'HIGH_PRIORITY'"
    assert t(sql) == sql


def test_mysql_literals_and_dual(spark):
    """Hex literals (0x41 / x'41'), bit literals (b'1010' / 0b1010),
    charset introducers (_utf8'abc', _binary'A'), and FROM DUAL — the
    remaining mysqld literal surface."""
    t = translate_mysql
    run = lambda s: spark.sql(t(s)).collect()[0][0]
    assert run("select 1+1 from dual") == 2
    assert run("select 0x41") == b"A"
    assert run("select b'01000001'") == b"A"
    assert run("select 0b01000001") == b"A"
    assert run("select _utf8'abc'") == "abc"
    assert run("select _binary'A'") == b"A"
    assert run("select hex(0xABC)") == "0ABC"  # odd digits left-pad
    # a bare identifier x/b is never a literal
    assert run("select x from (select 7 x)") == 7


def test_row_lock_suffixes_dropped(spark, sf_dir):
    """FOR UPDATE / LOCK IN SHARE MODE parse in mysqld; the reference
    takes no row locks, so the clauses are accepted and dropped — but
    only as trailing clauses, never inside strings or identifiers."""
    from infinidb_spark.session import load_tables

    load_tables(spark, sf_dir, register=True, names=("region",))
    t = translate_mysql
    assert spark.sql(t("select r_name from region for update")).count() == 5
    assert spark.sql(t("select r_name from region lock in share mode")).count() == 5
    sql = "select r_name from region where r_name <> 'for update'"
    assert t(sql) == sql


def test_and_and_operator(spark):
    """MySQL && is AND; strings containing && are untouched."""
    assert spark.sql(translate_mysql("select (1=1) && (2=2) as v")).collect()[0].v is True
    assert translate_mysql("select 'a&&b'") == "select 'a&&b'"


def test_permissive_group_by(spark, sf_dir):
    """MySQL 5.x default (no ONLY_FULL_GROUP_BY): non-aggregated select
    columns outside GROUP BY are legal — translated to any_value(), the
    modeling MySQL 5.7+ itself documents.  Alias-grouped and fully
    grouped queries are untouched; expression GROUP BYs abort the
    rewrite conservatively."""
    from infinidb_spark.session import load_tables

    load_tables(spark, sf_dir, register=True, names=("nation",))
    t = translate_mysql
    out = t("select n_regionkey, n_name, count(*) cnt from nation group by n_regionkey")
    assert "any_value(n_name)" in out
    rows = spark.sql(out).collect()
    assert len(rows) == 5 and all(r.n_name is not None for r in rows)
    # ordinal GROUP BY resolves positionally
    assert spark.sql(t(
        "select n.n_regionkey, n.n_name from nation n group by 1"
    )).count() == 5
    # alias-grouped: NOT wrapped
    out = t("select n_regionkey as rk, count(*) c from nation group by rk")
    assert "any_value" not in out
    # fully grouped: untouched
    sql = "select n_regionkey, count(*) c from nation group by n_regionkey"
    assert t(sql) == sql


def test_permissive_order_by_under_group_by(spark, sf_dir):
    """MySQL 5.1 also allows ORDER BY on an ungrouped column: wrapped
    in any_value too; select aliases (including aggregate aliases) are
    recognized and never re-wrapped."""
    from infinidb_spark.session import load_tables

    load_tables(spark, sf_dir, register=True, names=("nation",))
    t = translate_mysql
    out = t("select n_regionkey, count(*) c from nation "
            "group by n_regionkey order by n_name")
    assert "order by any_value(n_name)" in out
    assert spark.sql(out).count() == 5
    # aggregate alias in ORDER BY: untouched
    sql = ("select n_regionkey, count(*) c from nation "
           "group by n_regionkey order by c desc")
    assert t(sql) == sql


def test_only_full_group_by_mode_disables_rewrite(spark, sf_dir):
    """SET sql_mode = 'ONLY_FULL_GROUP_BY' restores strictness — the
    permissive any_value rewrite is skipped and Spark's own rejection
    surfaces, matching real MySQL's mode switch."""
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    q = ("select n_regionkey, n_name, count(*) c from nation "
         "group by n_regionkey")
    assert sess.sql(q, dialect="mysql").count() == 5
    sess.execute("SET sql_mode = 'ONLY_FULL_GROUP_BY'")
    with pytest.raises(Exception):
        sess.sql(q, dialect="mysql").count()
    sess.execute("SET sql_mode = ''")
    assert sess.sql(q, dialect="mysql").count() == 5


def test_insert_modifiers_dropped():
    """INSERT IGNORE / LOW_PRIORITY / DELAYED: no unique keys to
    violate and no mysqld scheduler — modifiers accepted and dropped
    (regression: IGNORE was parsed as the table name)."""
    from infinidb_spark.dialect import parse_statement

    st = parse_statement("INSERT IGNORE INTO t (a) VALUES (1)")
    assert st["table"] == "t" and st["columns"] == ["a"]
    assert parse_statement("INSERT DELAYED INTO t VALUES (1)")["table"] == "t"
    assert parse_statement("INSERT LOW_PRIORITY t SET a = 1")["table"] == "t"


def test_update_delete_modifiers_dropped():
    from infinidb_spark.dialect import parse_statement

    assert parse_statement("UPDATE LOW_PRIORITY IGNORE t SET a = 1")["table"] == "t"
    assert parse_statement("DELETE QUICK IGNORE FROM t WHERE a = 1")["table"] == "t"


def test_translate_mysql_idempotent_on_corpus_texts():
    """translate(translate(x)) == translate(x) for every front-end
    corpus text — guards paths that re-enter the translator with
    already-rendered statements.  Known, semantically-correct
    exception: DATE_FORMAT/TIME_FORMAT — a %-less (already-Java)
    format re-reads as ALL-LITERAL under MySQL's format rules, so
    re-translation rightly quotes it; the session never re-translates
    those (the select path translates the ORIGINAL text once)."""
    from infinidb_spark.dialect import translate_mysql
    from infinidb_spark.plans import dialect as pd_mod
    from infinidb_spark.plans import ref_perf, tpch

    texts = []
    for mod in (pd_mod, ref_perf, tpch):
        for name, val in vars(mod).items():
            if name.isupper() and isinstance(val, str) and "select" in val.lower():
                texts.append(val)
    assert len(texts) >= 20
    checked = 0
    for t in texts:
        if "DATE_FORMAT" in t.upper() or "TIME_FORMAT" in t.upper():
            continue
        once = translate_mysql(t)
        assert translate_mysql(once) == once, t[:80]
        checked += 1
    assert checked >= 20


# ------------------------------------------- CAST type path (round 7)
# The SQL-text CAST path (ref utils/funcexp/func_cast.cpp,
# funcexp.cpp:83-88 cast_as_date/datetime/time/char): MySQL-only type
# names Spark's parser rejects (SIGNED/UNSIGNED/DATETIME/TIME/bare
# CHAR) or mis-handles (CHAR(n) pads, MySQL truncates).


@pytest.mark.parametrize(
    ("expr", "want"),
    [
        # SIGNED: numeric ROUNDS half-away, string TRUNCATES at the dot
        ("CAST(2.9 AS SIGNED)", 3),
        ("CAST(2.4 AS SIGNED)", 2),
        ("CAST(-2.5 AS SIGNED)", -3),
        ("CAST('2.9' AS SIGNED)", 2),
        ("CAST('-2.9' AS SIGNED)", -2),
        # string→integer is a PREFIX parse (atoll, func_cast.cpp:144):
        # no numeric prefix → 0 (r09 probe battery; was NULL)
        ("CAST('abc' AS SIGNED)", 0),
        ("CAST('12abc' AS SIGNED)", 12),
        ("CAST('-12.7xyz' AS SIGNED)", -12),
        ("CAST('' AS SIGNED)", 0),
        ("CAST(2.9 AS UNSIGNED)", 3),
        ("CAST('2.9' AS UNSIGNED)", 2),
        # CHAR: bare → string (Spark alone: DATATYPE_MISSING_SIZE
        # crash); CHAR(n) → prefix (Spark alone: pads)
        ("CAST(42 AS CHAR)", "42"),
        ("CAST('hello' AS CHAR(2))", "he"),
        # TIME: datetime → time-of-day; TIME strings (>24 h, negative)
        # and packed numerics → canonical render; malformed → NULL
        ("CAST('2024-01-03 10:30:45' AS TIME)", "10:30:45"),
        ("CAST('2024-01-03' AS TIME)", "00:00:00"),
        ("CAST('123:45:00' AS TIME)", "123:45:00"),
        ("CAST('-01:00:30' AS TIME)", "-01:00:30"),
        ("CAST(130045 AS TIME)", "13:00:45"),
        ("CAST('abc' AS TIME)", None),
        ("CAST(NULL AS TIME)", None),
        # DECIMAL / DATE keep their (shared-dialect) readings
        ("CAST('2024-01-03' AS DATE)", "2024-01-03"),
        ("CONVERT('2024-01-03', DATE)", "2024-01-03"),
        ("CONVERT(2.9, SIGNED)", 3),
        # SEC_TO_TIME NULL guard (format_string renders NULL as 'null')
        ("SEC_TO_TIME(NULL)", None),
        ("SEC_TO_TIME(-3630)", "-01:00:30"),
        # MAKETIME: seconds in [59.9999995, 60) must not round to '60'
        ("MAKETIME(12, 15, 59.99999951)", "12:15:59.999999"),
    ],
)
def test_cast_type_path(spark, expr, want):
    got = one(spark, expr)
    if want is None:
        assert got is None, (expr, got)
    else:
        assert str(got) == str(want), (expr, got, want)


def test_cast_datetime_type(spark):
    import datetime

    got = one(spark, "CAST('2024-01-03 10:30:45' AS DATETIME)")
    assert got == datetime.datetime(2024, 1, 3, 10, 30, 45)
    # permissive: malformed input is NULL, not an ANSI error
    assert one(spark, "CAST('nope' AS DATETIME)") is None


def test_cast_translation_idempotent():
    """The CAST rewrite's own rendered output must survive a second
    pass untouched (the session re-enters translated statements)."""
    for sql in [
        "SELECT CAST(x AS SIGNED) FROM t",
        "SELECT CAST(x AS TIME) FROM t",
        "SELECT CAST(x AS DATETIME), CAST(y AS CHAR(3)) FROM t",
        "SELECT CAST(x AS DATE), CAST(y AS BIGINT) FROM t",
    ]:
        once = translate_mysql(sql)
        assert translate_mysql(once) == once, sql


def test_cast_native_spark_types_untouched():
    out = translate_mysql("SELECT CAST(x AS STRING), CAST(y AS BIGINT) FROM t")
    assert "CAST(x AS STRING)" in out and "CAST(y AS BIGINT)" in out


@pytest.mark.parametrize(
    ("expr", "want"),
    [
        # exactness above 2^53 / at the bigint range: integer-typed and
        # integer-looking string input must never detour through DOUBLE
        ("CAST(9007199254740993 AS SIGNED)", 9007199254740993),
        ("CAST('9223372036854775807' AS SIGNED)", 9223372036854775807),
        ("CAST('-9223372036854775808' AS SIGNED)", -9223372036854775808),
        ("CAST('18446744073709551615' AS UNSIGNED)", 18446744073709551615),
        ("CAST(' 42 ' AS SIGNED)", 42),
        ("CAST('+7' AS SIGNED)", 7),
        # MAKETIME: fractional seconds whose double sits just below the
        # decimal value must not be floor-corrupted (only the [59.9999995,
        # 60) rounding boundary is clamped)
        ("MAKETIME(12, 15, 1.000001)", "12:15:01.000001"),
        ("MAKETIME(12, 15, 30.5)", "12:15:30.5"),
    ],
)
def test_cast_exactness_and_maketime_fractions(spark, expr, want):
    assert str(one(spark, expr)) == str(want)


def test_cast_signed_collated_string_truncates(spark):
    """typeof of a collated column is 'string collate <NAME>' — the
    string-truncate branch must still fire."""
    sql = "SELECT " + translate_mysql("CAST(c AS SIGNED)") + \
        " AS v FROM (SELECT '2.9' COLLATE UNICODE_CI_AI AS c)"
    assert spark.sql(sql).collect()[0].v == 2


def test_cast_registry_dialect_parity(spark):
    """The SIGNED/UNSIGNED/TIME cast semantics are implemented twice
    (registry Columns for the engine path, SQL fragments for the text
    path) with no shared source of truth — this pin keeps them from
    drifting: both paths must produce identical values over a matrix of
    typed inputs."""
    from pyspark.sql import functions as F

    from infinidb_spark.functions.registry import FUNC_MAP

    inputs = [
        ("2.9", "STRING"), ("-2.9", "STRING"), ("abc", "STRING"),
        ("9223372036854775807", "STRING"), (" 42 ", "STRING"),
        ("2.9", "DOUBLE"), ("-2.5", "DOUBLE"),
        ("9007199254740993", "BIGINT"),
        ("9007199254740993.4", "DECIMAL(25,1)"), ("2.9", "DECIMAL(10,1)"),
        ("10:30:45", "STRING"), ("123:45:00", "STRING"),
        ("-01:00:30", "STRING"), ("130045", "BIGINT"),
        ("2024-01-03 10:30:45", "STRING"), ("2024-1-3 10:30:45", "STRING"),
        ("10:30:45.9", "STRING"),
    ]
    for raw, typ in inputs:
        src = spark.sql(f"SELECT try_cast('{raw}' AS {typ}) AS x")
        for kind, reg in (
            ("SIGNED", "cast_signed"),
            ("UNSIGNED", "cast_unsigned"),
            ("TIME", "cast_time"),
        ):
            via_registry = src.select(
                FUNC_MAP[reg](F.col("x")).alias("v")
            ).collect()[0].v
            via_dialect = spark.sql(
                f"SELECT {translate_mysql(f'CAST(x AS {kind})')} AS v "
                f"FROM (SELECT try_cast('{raw}' AS {typ}) AS x)"
            ).collect()[0].v
            assert str(via_registry) == str(via_dialect), (
                raw, typ, kind, via_registry, via_dialect
            )


@pytest.mark.parametrize(
    ("expr", "want"),
    [
        # MySQL LEAST/GREATEST: NULL when ANY argument is NULL (the
        # reference's func_greatest.cpp propagates isNull); Spark's
        # built-ins skip nulls, so the translator folds its own form
        ("LEAST(3, 1, 2)", 1),
        ("GREATEST(3, 1, 2)", 3),
        ("LEAST(3, NULL, 2)", None),
        ("GREATEST(NULL, 1)", None),
        ("LEAST('b', 'a', 'c')", "a"),
        ("GREATEST(1, 2, 3, 4, 5)", 5),
    ],
)
def test_least_greatest_null_strict(spark, expr, want):
    got = one(spark, expr)
    if want is None:
        assert got is None, (expr, got)
    else:
        assert str(got) == str(want), (expr, got)


def test_least_greatest_translation_idempotent():
    for sql in ["SELECT LEAST(a, b, c) FROM t", "SELECT GREATEST(a, b) FROM t"]:
        once = translate_mysql(sql)
        assert translate_mysql(once) == once
        low = once.lower()
        assert "least(" not in low and "greatest(" not in low


def test_least_greatest_subquery_null_strict(spark):
    """Subquery arguments now fold as plain CASE text (no HOF bind), so
    null-strictness holds for EVERY operand — including when the NULL
    comes from a clean operand next to a subquery, and when the scalar
    subquery itself returns NULL (ADVICE r07: the old native-least
    fallback silently null-SKIPPED)."""
    one = lambda s: spark.sql(translate_mysql(f"SELECT {s} AS v")).collect()[0][0]
    assert one("LEAST((SELECT 5), 3)") == 3
    assert one("GREATEST((SELECT 5), 3)") == 5
    assert one("LEAST((SELECT 5), NULL, 3)") is None
    assert one("LEAST((SELECT NULL), 3)") is None
    assert one("GREATEST(2, (SELECT CAST(NULL AS INT)), 7)") is None
    assert one("LEAST((SELECT 2), (SELECT 8), 5)") == 2


def test_least_greatest_subquery_idempotent_and_capped():
    sql = "SELECT LEAST((SELECT max(x) FROM t), a, b) FROM u"
    once = translate_mysql(sql)
    assert translate_mysql(once) == once
    assert "least(" not in once.lower()
    subs = ", ".join(f"(SELECT {i})" for i in range(4))
    with pytest.raises(DialectError, match="subquery"):
        translate_mysql(f"SELECT LEAST({subs}, 1)")


@pytest.mark.parametrize(
    ("expr", "want"),
    [
        # ci-collation mode extends beyond =/IN literals (r10): LIKE
        # with a literal pattern folds to an anchored (?si) RLIKE —
        # MySQL's default ci collation governs LIKE too — and REGEXP
        # literal patterns gain (?i), matching MySQL's collation-aware
        # regex.  Both rewrites are idempotent on their own output.
        ("'ACME corp' LIKE 'acme%'", True),
        ("'ACME corp' LIKE 'acmX%'", False),
        ("'A_B' LIKE 'a\\_b'", True),
        ("'AXB' LIKE 'a_b'", True),
        ("'ACME' REGEXP '^acme$'", True),
        ("'xyz' REGEXP '^acme$'", False),
    ],
)
def test_ci_collation_like_regexp(spark, expr, want):
    from infinidb_spark.dialect import translate_mysql

    t1 = translate_mysql(f"SELECT {expr} AS v", ci_collation=True)
    assert translate_mysql(t1, ci_collation=True) == t1
    assert spark.sql(t1).collect()[0][0] is want
