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
