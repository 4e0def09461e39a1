"""dwweek-style mixed workload — the reference's endurance scenario
(`utils/scenarios/dwweek/testcase/dwDMrun.sh`: daytime query groups,
nightly cpimport + DML) compressed into one integration test: bulk load
→ queries → incremental load → streamed ingest → update → delete, with
invariants checked after every phase."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from infinidb_spark.operators.dml import delete_from, update_table
from infinidb_spark.session import load_tables
from infinidb_spark.sources.bulk_load import bulk_load_csv
from infinidb_spark.streaming.events import EVENT_SCHEMA
from infinidb_spark.streaming.sink import stream_to_table


def test_week_cycle(spark, sf_dir):
    src = load_tables(spark, sf_dir, names=("orders",))["orders"]
    workdir = tempfile.mkdtemp(prefix="infinidb_dwweek_")
    table = os.path.join(workdir, "orders")
    try:
        # ---- night 0: initial bulk load (cpimport) via CSV
        csv_dir = os.path.join(workdir, "csv0")
        day0 = src.filter(F.col("o_orderkey") % 7 != 0)
        day0.write.option("sep", "|").csv(csv_dir)
        res = bulk_load_csv(spark, csv_dir, src.schema, delimiter="|", dest=table)
        assert res.rows_rejected == 0
        n0 = res.rows_loaded

        # ---- day 1: query group (scan/agg/join shapes on the live table)
        live = spark.read.parquet(table)
        agg = live.groupBy("o_orderstatus").count()
        assert sum(r["count"] for r in agg.collect()) == n0

        # ---- night 1: incremental cpimport of the held-back slice
        csv_dir2 = os.path.join(workdir, "csv1")
        day1 = src.filter(F.col("o_orderkey") % 7 == 0)
        day1.write.option("sep", "|").csv(csv_dir2)
        res2 = bulk_load_csv(spark, csv_dir2, src.schema, delimiter="|")
        res2.loaded.write.mode("append").parquet(table)
        assert spark.read.parquet(table).count() == src.count()

        # ---- day 2: streamed event ingest next to the batch table
        ev_in, ev_tbl, ckpt = (os.path.join(workdir, d) for d in ("ev_in", "events", "ckpt"))
        ev = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
             (2, "2024-01-01 11:00:00", 2, "view", 2.0, "{}")],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        ev.write.parquet(ev_in)
        q = stream_to_table(
            spark.readStream.schema(EVENT_SCHEMA).parquet(ev_in), ev_tbl, ckpt
        )
        q.awaitTermination(60)
        assert spark.read.parquet(ev_tbl).count() == 2

        # ---- night 2: DML maintenance (the nightly update/delete pass)
        n_upd = update_table(
            spark, table, F.col("o_orderstatus") == "P",
            {"o_orderpriority": F.lit("1-URGENT")},
        )
        after = spark.read.parquet(table)
        assert after.filter(
            (F.col("o_orderstatus") == "P") & (F.col("o_orderpriority") != "1-URGENT")
        ).count() == 0
        n_del = delete_from(spark, table, F.col("o_orderkey") % 100 == 0)
        final = spark.read.parquet(table)
        assert final.count() == src.count() - n_del
        # cross-check: the update survived the delete rewrite
        if n_upd:
            assert final.filter(
                (F.col("o_orderstatus") == "P") & (F.col("o_orderpriority") == "1-URGENT")
            ).count() > 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
