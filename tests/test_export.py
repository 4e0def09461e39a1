"""SELECT INTO OUTFILE export surface: dialect parse, MySQL file
semantics (headerless, \\N nulls, no-overwrite), escaping, roundtrip."""

import os

import pytest

from infinidb_spark.dialect import DialectError, parse_statement
from infinidb_spark.sources.export import OutfileExistsError, export_outfile


def test_parse_into_outfile_full_options():
    st = parse_statement(
        "SELECT n_name FROM nation "
        "INTO OUTFILE '/tmp/x.csv' "
        "FIELDS TERMINATED BY '|' OPTIONALLY ENCLOSED BY '\"' ESCAPED BY '\\\\' "
        "LINES TERMINATED BY '\\n'"
    )
    assert st["kind"] == "select_into_outfile"
    assert st["path"] == "/tmp/x.csv"
    assert st["sep"] == "|" and st["quote"] == '"' and st["escape"] == "\\"
    assert st["line_sep"] == "\n"
    assert st["sql"].upper().startswith("SELECT")
    assert "OUTFILE" not in st["sql"].upper()


def test_parse_into_outfile_before_from():
    st = parse_statement("SELECT n_name INTO OUTFILE '/tmp/y.csv' FROM nation")
    assert st["kind"] == "select_into_outfile"
    assert st["path"] == "/tmp/y.csv"
    assert "FROM" in st["sql"].upper() and "OUTFILE" not in st["sql"].upper()
    assert st["sep"] == "\t"  # MySQL defaults
    assert st["quote"] is None


def test_parse_into_dumpfile_rejected():
    with pytest.raises(DialectError):
        parse_statement("SELECT 1 INTO DUMPFILE '/tmp/z'")


def test_export_outfile_mysql_semantics(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "with|pipe")], "id long, s string"
    )
    path = str(tmp_path / "out.txt")
    n = export_outfile(df, path, sep="|", single_file=True)
    assert n == 3
    body = open(path).read()
    lines = sorted(body.rstrip("\n").split("\n"))
    assert lines == ["1|alpha", "2|\\N", "3|with\\|pipe"]  # \N null, escaped sep
    with pytest.raises(OutfileExistsError):
        export_outfile(df, path, single_file=True)


def test_export_outfile_directory_mode(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long").repartition(4)
    path = str(tmp_path / "dir_out")
    n = export_outfile(df, path)
    assert n == 100
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) == 4  # every partition streams to its own file


def test_outfile_statement_roundtrip(spark, sf_dir, tmp_path):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark, sf_dir)
    path = str(tmp_path / "nation.tsv")
    n = sess.execute(
        f"SELECT n_nationkey, n_name FROM nation INTO OUTFILE '{path}' "
        "FIELDS TERMINATED BY ','"
    )
    assert os.path.isfile(path)
    back = spark.read.option("sep", ",").schema("n_nationkey long, n_name string").csv(
        path
    )
    orig = sess.sql("SELECT n_nationkey, n_name FROM nation")
    assert n == orig.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_enclosed_by_all_vs_optionally(spark, tmp_path):
    df = spark.createDataFrame([(1, 'say "hi"')], "id long, s string")
    p_all = str(tmp_path / "all.txt")
    p_opt = str(tmp_path / "opt.txt")
    export_outfile(df, p_all, sep=",", quote='"', quote_optional=False, single_file=True)
    export_outfile(df, p_opt, sep=",", quote='"', quote_optional=True, single_file=True)
    assert open(p_all).read().rstrip("\n") == '"1","say \\"hi\\""'  # every field
    assert open(p_opt).read().rstrip("\n") == '1,"say \\"hi\\""'  # strings only


def test_parse_load_data():
    st = parse_statement(
        "LOAD DATA LOCAL INFILE '/tmp/in.csv' INTO TABLE t "
        "FIELDS TERMINATED BY ',' LINES TERMINATED BY '\\n' "
        "IGNORE 1 LINES (a, b)"
    )
    assert st["kind"] == "load_data"
    assert st["table"] == "t" and st["path"] == "/tmp/in.csv"
    assert st["sep"] == "," and st["skip_header"] is True
    assert st["columns"] == ["a", "b"]


def test_parse_load_data_replace_rejected():
    with pytest.raises(DialectError):
        parse_statement("LOAD DATA INFILE '/tmp/x' REPLACE INTO TABLE t")


def test_load_data_statement_roundtrip(spark, tmp_path):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark)
    base = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, s string, v double"
    )
    sess.create_table_as("loadt", base)
    # file with a header, a clean row, NULL marker, and one bad row
    src = tmp_path / "in.csv"
    src.write_text("id,s,v\n3,c,2.5\n4,\\N,\\N\nnot_a_number,x,1\n")
    n = sess.execute(
        f"LOAD DATA INFILE '{src}' INTO TABLE loadt "
        "FIELDS TERMINATED BY ',' IGNORE 1 LINES"
    )
    assert n == 2  # bad row rejected, header skipped
    assert "RowsRejected-1" in sess._last_stats
    rows = sorted(map(tuple, sess.sql("SELECT * FROM loadt").collect()))
    assert rows == [
        (1, "a", 1.5), (2, "b", None), (3, "c", 2.5), (4, None, None),
    ]


def test_load_data_partial_columns(spark, tmp_path):
    from infinidb_spark.session import InfiniSession

    sess = InfiniSession(spark)
    base = spark.createDataFrame([(1, "a", 9.9)], "id long, s string, v double")
    sess.create_table_as("loadt2", base)
    src = tmp_path / "partial.csv"
    src.write_text("5|e\n")
    n = sess.execute(
        f"LOAD DATA INFILE '{src}' INTO TABLE loadt2 "
        "FIELDS TERMINATED BY '|' (id, s)"
    )
    assert n == 1
    rows = sorted(map(tuple, sess.sql("SELECT * FROM loadt2").collect()))
    assert rows == [(1, "a", 9.9), (5, "e", None)]  # v NULL-filled
