"""Source/sink tests: bulk load (good + reject paths), pseudo-columns,
cross-engine JDBC roundtrip.  Oracle parity for the registered queries
runs in test_oracle_parity.py; here we exercise the source-specific
behavior the oracles can't see (rejected rows, metadata columns).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from infinidb_spark.session import load_tables
from infinidb_spark.sources.bulk_load import bulk_load_csv
from infinidb_spark.sources.cross_engine import (
    DERBY_DRIVER,
    read_jdbc_table,
    write_jdbc_table,
)
from infinidb_spark.sources.pseudocol import extent_min_max, with_pseudo_columns

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("val", DoubleType()),
    ]
)


def test_bulk_load_splits_good_and_bad_rows(spark):
    workdir = tempfile.mkdtemp(prefix="infinidb_bulk_")
    try:
        src = os.path.join(workdir, "in.csv")
        with open(src, "w") as f:
            f.write("1|alpha|1.5\n")
            f.write("2|beta|2.5\n")
            f.write("oops|gamma|not_a_number\n")  # bad cast -> reject
            f.write("3|delta|3.5\n")
        res = bulk_load_csv(spark, src, SCHEMA, delimiter="|")
        assert res.rows_loaded == 3
        assert res.rows_rejected == 1
        assert sorted(r.id for r in res.loaded.collect()) == [1, 2, 3]
        bad = res.rejected.collect()
        assert len(bad) == 1 and "gamma" in bad[0].raw_record
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_bulk_load_writes_partitioned_parquet(spark):
    workdir = tempfile.mkdtemp(prefix="infinidb_bulk_")
    try:
        src = os.path.join(workdir, "in.csv")
        with open(src, "w") as f:
            for i in range(10):
                f.write(f"{i}|n{i}|{i}.0\n")
        dest = os.path.join(workdir, "out")
        res = bulk_load_csv(
            spark, src, SCHEMA, delimiter="|", dest=dest, partition_by=["name"]
        )
        assert res.rows_loaded == 10
        # hive-style partition dirs exist and the re-read sees all rows
        assert any(d.startswith("name=") for d in os.listdir(dest))
        assert res.loaded.count() == 10
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_pseudo_columns_on_parquet_scan(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    out = with_pseudo_columns(li, ["idbsegment", "idbextentid", "idbblockid"])
    row = out.select("idbsegment", "idbextentid", "idbblockid").first()
    assert row.idbsegment.endswith(".parquet") or ".parquet" in row.idbsegment
    assert row.idbblockid is not None

    mm = extent_min_max(li, "l_orderkey")
    agg = mm.select(
        F.min("l_orderkey").alias("true_min"),
        F.min("idbextentmin").alias("ext_min"),
        F.max("l_orderkey").alias("true_max"),
        F.max("idbextentmax").alias("ext_max"),
    ).first()
    # extent stats over all files must bracket exactly the global range
    assert agg.ext_min == agg.true_min and agg.ext_max == agg.true_max


def test_cross_engine_jdbc_roundtrip(spark, sf_dir):
    spark._jvm.java.lang.System.setProperty("derby.system.home", "/tmp")
    nation = load_tables(spark, sf_dir, names=("nation",))["nation"]
    workdir = tempfile.mkdtemp(prefix="infinidb_derby_")
    try:
        url = f"jdbc:derby:{workdir}/db;create=true"
        write_jdbc_table(nation, url, "nation", driver=DERBY_DRIVER)
        back = read_jdbc_table(spark, url, "nation", driver=DERBY_DRIVER)
        want = {(r.n_nationkey, r.n_name) for r in nation.collect()}
        got = {(r.n_nationkey, r.n_name) for r in back.collect()}
        assert got == want
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_bulk_load_jsonl_reject_capture(spark, tmp_path):
    """Malformed JSONL lines land in `rejected` with their raw text
    (the .bad-file contract), clean lines type to the schema."""
    from infinidb_spark.sources.bulk_load import bulk_load_jsonl

    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"id": 1, "s": "ok"}\n'
        'not json at all\n'
        '{"id": 2, "s": null}\n'
        '{"id": "NaN-ish", "s": "bad type"}\n'
    )
    res = bulk_load_jsonl(spark, str(src), __import__("pyspark").sql.types._parse_datatype_string("id bigint, s string"))
    assert res.rows_loaded == 2 and res.rows_rejected == 2
    bad = sorted(r.raw_record for r in res.rejected.collect())
    assert any("not json" in b for b in bad)
    rows = sorted(map(tuple, res.loaded.collect()))
    res.unpersist()
    assert rows == [(1, "ok"), (2, None)]


def test_unquoted_escape_roundtrip(spark, tmp_path):
    """r10 review fix: ESCAPED BY applies EVERYWHERE in unquoted mode
    (MySQL LOAD DATA / writeengine bulk parse) — a re-ingested OUTFILE
    row embedding the separator as esc+sep used to split on the raw
    byte and land in rejects, and an escaped escape came back doubled."""
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from infinidb_spark.sources.bulk_load import bulk_load_csv
    from infinidb_spark.sources.export import export_outfile

    rows = [
        (1, "with|pipe"),
        (2, "back\\slash"),
        (3, None),
        (5, "tab\there"),
        (6, "double\\\\esc"),
        (7, "N"),
        (8, "ends with esc\\"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    out = os.path.join(str(tmp_path), "t.txt")
    export_outfile(df, out, sep="|", quote=None, escape="\\", line_sep="\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("s", StringType())]
    )
    res = bulk_load_csv(
        spark, out, schema, delimiter="|", quote=None, escape="\\",
    )
    assert res.rows_rejected == 0
    got = sorted((r.id, r.s) for r in res.loaded.collect())
    assert got == sorted(rows)
    res.unpersist()


def test_unquoted_escape_rejects_bad_rows(spark, tmp_path):
    """Field-count and cast failures keep the PERMISSIVE reject
    contract on the escape-aware unquoted path."""
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from infinidb_spark.sources.bulk_load import bulk_load_csv

    p = os.path.join(str(tmp_path), "bad.txt")
    with open(p, "w") as f:
        f.write("1|ok\n")
        f.write("2|too|many|fields\n")
        f.write("notanint|x\n")
        f.write("\\N|nullkey\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("s", StringType())]
    )
    res = bulk_load_csv(spark, p, schema, delimiter="|", quote=None, escape="\\")
    assert res.rows_loaded == 2 and res.rows_rejected == 2
    got = sorted(((r.id, r.s) for r in res.loaded.collect()), key=repr)
    assert got == sorted([(None, "nullkey"), (1, "ok")], key=repr)
    bad = sorted(r.raw_record for r in res.rejected.collect())
    assert bad == ["2|too|many|fields", "notanint|x"]
    res.unpersist()
