"""Replay the reference's DDL/DML parser test corpora through the
dialect front-end.

The reference ships grammar acceptance suites for its standalone DDL
parser (`dbcon/ddlpackage/sql/*.sql`, 48 files) and DML parser
(`dbcon/dmlpackage/sql/*.sql`, 10 files).  This module feeds every
statement in them through ``parse_statement`` and asserts the GRACEFUL
contract: each statement either parses into a plan dict or raises
``DialectError`` (the documented reject, e.g. index/constraint DDL —
`ha_calpont_ddl.cpp:1862` has no index subsystem) — never a crash-class
exception (KeyError/IndexError/AttributeError).  A must-parse roster
pins the grammar we claim as implemented (the full ALTER TABLE action
set of `ddl.y:477-560` and plain CREATE/DROP TABLE), and the corpus'
own negative case (``fail.sql``) must be rejected.

The corpora are read from the reference tree when present (read-only);
the tests skip cleanly in a standalone checkout.
"""

from __future__ import annotations

import os

import pytest

from infinidb_spark.dialect import DialectError, parse_statement

REF_DDL = "/root/reference/dbcon/ddlpackage/sql"
REF_DML = "/root/reference/dbcon/dmlpackage/sql"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DDL), reason="reference corpus not available"
)

#: files whose every statement must PARSE (the grammar we implement):
#: the ALTER TABLE action roster, plain CREATE TABLE, DROP TABLE,
#: empty statements and comments.
MUST_PARSE = {
    "atac01.sql",   # ADD COLUMN NUMERIC(7)
    "atdc01.sql",   # DROP col CASCADE
    "atmcdd01.sql", # ALTER COLUMN ... DROP DEFAULT
    "atmcsd01.sql", # ALTER col SET DEFAULT <lit>/USER specials/NULL
    "atmct01.sql",  # MODIFY col type
    "atmct02.sql",
    "atrc01.sql",   # RENAME COLUMN old TO new
    "atrt01.sql",   # RENAME [TO] new_table
    "ct01.sql",     # plain CREATE TABLE
    "dt01.sql",     # DROP TABLE schema.name
    "dt02.sql",     # DROP TABLE ... cascade constraints
    "empty-stmt.sql",
    "comment.sql",
}


def _statements(path: str) -> list[str]:
    """Tokenizer-based batch split (the mysql-client surface the
    reference's scenario runner uses): ';' or '--' inside string
    literals never corrupts a statement, comment-only pieces drop."""
    from infinidb_spark.dialect import split_statements

    with open(path, errors="replace") as f:
        return split_statements(f.read())


def _corpus(d: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(d):
        rel = os.path.relpath(root, d)
        out.extend(
            os.path.join(rel, f) if rel != "." else f
            for f in files
            if f.endswith(".sql")
        )
    return sorted(out)


@pytest.mark.parametrize("fname", _corpus(REF_DDL) if os.path.isdir(REF_DDL) else [])
def test_ddl_corpus_handled_gracefully(fname):
    if fname == "fail.sql":
        pytest.skip("negative case, asserted separately")
    for stmt in _statements(os.path.join(REF_DDL, fname)):
        try:
            st = parse_statement(stmt)
            assert isinstance(st, dict) and "kind" in st, stmt
        except DialectError:
            assert fname not in MUST_PARSE, f"{fname}: must parse: {stmt}"


def test_ddl_corpus_negative_case_rejected(spark):
    """The corpus' ungrammatical case must be rejected by the front end
    as a whole: the classifier defers non-DDL/DML text to the SQL query
    path, whose parser throws — matching the reference where ddl.y
    errors bubble as a parse failure, not a crash."""
    from pyspark.errors.exceptions.captured import ParseException

    for stmt in _statements(os.path.join(REF_DDL, "fail.sql")):
        st = parse_statement(stmt)
        assert st["kind"] == "select"
        with pytest.raises(ParseException):
            spark.sql(st["sql"])


@pytest.mark.parametrize("fname", _corpus(REF_DML) if os.path.isdir(REF_DML) else [])
def test_dml_corpus_parses(fname):
    """The DML corpus (INSERT/UPDATE/DELETE incl. EXISTS subqueries and
    INSERT ... SELECT) is all within the implemented surface."""
    for stmt in _statements(os.path.join(REF_DML, fname)):
        st = parse_statement(stmt)
        assert st["kind"] in ("insert", "update", "delete", "insert_select"), stmt


REF_COMMON = "/root/reference/utils/scenarios/common/sql"


@pytest.mark.parametrize(
    "fname", _corpus(REF_COMMON) if os.path.isdir(REF_COMMON) else []
)
def test_scenario_common_corpus_parses(fname):
    """The perf-scenario harness's own result-table scripts (CREATE
    TABLE rosters + LOAD DATA INFILE with FIELDS/LINES options and
    explicit column lists, block comments included) must all parse.
    Exception: tblTestSummary.sql is ungrammatical IN THE REFERENCE
    (missing comma after ``numPM tinyint``) — MySQL rejects it too, so
    the required behavior is a clean DialectError."""
    for stmt in _statements(os.path.join(REF_COMMON, fname)):
        if fname == os.path.join("testResultTables", "tblTestSummary.sql"):
            with pytest.raises(DialectError):
                parse_statement(stmt)
            continue
        st = parse_statement(stmt)
        assert st["kind"] in ("create_typed", "create", "load_data"), (fname, st)


REF_PERF = "/root/reference/utils/scenarios/perf/sql"


@pytest.mark.skipif(not os.path.isdir(REF_PERF), reason="reference corpus absent")
def test_perf_scenario_corpus_classifies():
    """Every statement of the reference's perf workload corpus (308
    files: the numbered query groups, session-variable reports, DML
    mixes, and cal* admin calls) classifies through the front end with
    zero rejects — the whole nightly workload is inside the dialect."""
    import collections

    stats: collections.Counter = collections.Counter()
    for dirp, _dirs, files in os.walk(REF_PERF):
        for f in sorted(files):
            if f.endswith(".sql"):
                for stmt in _statements(os.path.join(dirp, f)):
                    stats[parse_statement(stmt)["kind"]] += 1
    assert stats["select"] >= 200 and stats["admin"] >= 10, dict(stats)
    assert set(stats) <= {"select", "select_into_vars", "admin", "delete", "update"}


def test_alter_column_default_lifecycle(spark, sf_dir):
    """SET DEFAULT is metadata-only and feeds later INSERTs; DROP
    DEFAULT reverts to NULL fill; RENAME COLUMN carries the default."""
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    sess.execute("CREATE TABLE ddlc (id BIGINT NOT NULL, v DOUBLE)")
    sess.execute("INSERT INTO ddlc (id) VALUES (1)")
    sess.execute("ALTER TABLE ddlc ALTER COLUMN v SET DEFAULT 2.5")
    sess.execute("INSERT INTO ddlc (id) VALUES (2)")
    sess.execute("ALTER TABLE ddlc ALTER v DROP DEFAULT")
    sess.execute("INSERT INTO ddlc (id) VALUES (3)")
    got = {r.id: r.v for r in sess.execute("SELECT id, v FROM ddlc").collect()}
    assert got == {1: None, 2: 2.5, 3: None}

    sess.execute("ALTER TABLE ddlc ALTER COLUMN v SET DEFAULT 9.0")
    sess.execute("ALTER TABLE ddlc RENAME COLUMN v TO w")
    sess.execute("INSERT INTO ddlc (id) VALUES (4)")
    rows = {r.id: r.w for r in sess.execute("SELECT id, w FROM ddlc").collect()}
    assert rows[4] == 9.0 and rows[2] == 2.5
    # SHOW CREATE TABLE reflects the renamed column and live default
    ddl = sess.execute("SHOW CREATE TABLE ddlc").collect()[0][1]
    assert "w" in ddl and "9.0" in ddl

    with pytest.raises(ValueError, match="no such column"):
        sess.execute("ALTER TABLE ddlc ALTER COLUMN ghost SET DEFAULT 1")
    with pytest.raises(ValueError, match="already exists"):
        sess.execute("ALTER TABLE ddlc RENAME COLUMN id TO w")


def test_add_column_default_feeds_inserts_and_drop_clears_meta(spark, sf_dir):
    """ADD COLUMN ... DEFAULT registers the default for FUTURE inserts
    (not just the backfill); an invalid default is rejected at ALTER
    time like MySQL ("Invalid default value"), and DROP TABLE clears
    the metadata so a re-created table of the same name starts clean."""
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    sess.execute("CREATE TABLE meta_t (id BIGINT NOT NULL)")
    sess.execute("ALTER TABLE meta_t ADD c INT DEFAULT 7")
    sess.execute("INSERT INTO meta_t (id) VALUES (1)")
    assert {r.id: r.c for r in sess.execute("SELECT id, c FROM meta_t").collect()} == {1: 7}

    with pytest.raises(ValueError, match="Invalid default value"):
        sess.execute("ALTER TABLE meta_t ALTER COLUMN c SET DEFAULT 'abc'")
    with pytest.raises(ValueError, match="Invalid default value"):
        sess.execute("ALTER TABLE meta_t ADD d INT DEFAULT 'xyz'")

    sess.execute("DROP TABLE meta_t")
    sess.execute("CREATE TABLE meta_t (id BIGINT NOT NULL, c INT)")
    sess.execute("INSERT INTO meta_t (id) VALUES (2)")
    rows = sess.execute("SELECT id, c FROM meta_t").collect()
    assert rows[0].c is None  # no phantom default from the dropped table


def test_parse_new_alter_forms():
    st = parse_statement(
        "ALTER TABLE t RENAME COLUMN a TO b, ALTER COLUMN c SET DEFAULT 3, "
        "ALTER d DROP DEFAULT"
    )
    assert st["actions"] == [
        {"op": "rename_column", "old": "a", "new": "b"},
        {"op": "set_default", "column": "c", "default": "3"},
        {"op": "drop_default", "column": "d"},
    ]
    # SQL-92 user specials map to the session user
    st = parse_statement("ALTER TABLE t ALTER c SET DEFAULT CURRENT_USER")
    assert st["actions"][0]["default"] == "current_user()"
    # SET DEFAULT NULL ≡ DROP DEFAULT (metadata cleared)
    st = parse_statement("ALTER TABLE t ALTER c SET DEFAULT NULL")
    assert st["actions"][0]["default"] is None
    with pytest.raises(DialectError):
        parse_statement("ALTER TABLE t ALTER c SET WIDTH 3")
    with pytest.raises(DialectError):
        parse_statement("ALTER TABLE t RENAME COLUMN a b")
    # DEFAULT takes exactly one literal (ddl.y default_clause): negative
    # numbers keep their sign, NUMBER ≡ DECIMAL, trailing ENGINE option
    # is ignored, junk after the value is rejected
    st = parse_statement(
        "ALTER TABLE t ADD c NUMBER(7,2) DEFAULT -1.5 ENGINE=InfiniDB"
    )
    assert st["actions"][0] == {
        "op": "add", "column": "c", "type": "decimal(7,2)", "default": "-1.5"
    }
    st = parse_statement("CREATE TABLE neg (v DOUBLE DEFAULT -2)")
    assert st["columns"][0]["default"] == "-2"
    with pytest.raises(DialectError):
        parse_statement("ALTER TABLE t ALTER c SET DEFAULT 3 bogus")
    with pytest.raises(DialectError):
        parse_statement("ALTER TABLE t ALTER c DROP DEFAULT bogus")
    with pytest.raises(DialectError):
        parse_statement("ALTER TABLE t RENAME COLUMN a TO b extra")
    # word literals and datetime specials stay supported (typed-CREATE
    # accepted them before _default_value existed)
    st = parse_statement("CREATE TABLE wl (b BOOLEAN DEFAULT TRUE, "
                         "ts DATETIME DEFAULT CURRENT_TIMESTAMP, "
                         "ts2 DATETIME DEFAULT NOW(), d DATE DEFAULT CURRENT_DATE)")
    assert [c["default"] for c in st["columns"]] == [
        "TRUE", "CURRENT_TIMESTAMP", "CURRENT_TIMESTAMP", "CURRENT_DATE"
    ]
