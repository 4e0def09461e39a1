"""Derive an sf1 slice (10x sf0.1) for the 1000x scale sweep.

The driver ships sf0.001/sf0.01/sf0.1; the sub-linear-scaling claim
(scripts/scale_check.py) should cover one more decade.  This script
replicates sf0.1 ten times with KEY-SHIFTED foreign keys so join
fan-outs, group cardinalities, and per-key row counts stay realistic
(a naive 10x row copy would multiply per-key density instead, turning
every join/group 10x denser rather than 10x wider):

* fact/dim keys shift by replica * (max_key + 1) per table, preserving
  customer->orders->lineitem and part/supplier references;
* nation/region stay fixed (true dimensions);
* document TEXT is salted per replica by inserting the replica digit
  every 4 chars - every 5-shingle crosses an insertion, so replicas of
  one doc are NOT near-dups of each other, while near-dup pairs WITHIN
  a replica transform identically and survive: the near-dup workload
  scales linearly like the corpus, instead of exploding into 10x-sized
  LSH buckets of self-copies;
* embeddings rotate by replica index (norm- and distribution-
  preserving, but cosine-distinct) for the same reason.

Usage:  python scripts/make_sf1.py [out_dir]   (default
/tmp/infinidb_testdata/sf1 — the basename MUST be 'sf1': bench/workdir
tags parse the scale factor from it)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from infinidb_spark.session import get_spark, load_tables  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/infinidb_testdata/sf1"
REPL = 10


def main() -> None:
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    t = load_tables(spark, SRC, register=False)
    r = spark.range(REPL).select(F.col("id").cast("bigint").alias("_r"))

    def base(df, col):
        return int(df.agg(F.max(col)).collect()[0][0]) + 1

    O = base(t["orders"], "o_orderkey")
    C = base(t["customer"], "c_custkey")
    P = base(t["part"], "p_partkey")
    S = base(t["supplier"], "s_suppkey")

    def write(name, df, files):
        dst = os.path.join(OUT, f"{name}.parquet")
        t0 = time.perf_counter()
        df.repartition(files).write.mode("overwrite").parquet(dst + ".dir")
        # single-file tables elsewhere are files; keep directory form —
        # load_tables reads either via spark.read.parquet
        if os.path.exists(dst):
            import shutil

            shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
        os.rename(dst + ".dir", dst)
        print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)

    def repl(df):
        return df.crossJoin(r)

    for name in ("region", "nation"):
        write(name, t[name], 1)

    cu = repl(t["customer"]).select(
        (F.col("c_custkey") + F.col("_r") * C).alias("c_custkey"),
        *[c for c in t["customer"].columns if c != "c_custkey"],
    )
    write("customer", cu, 2)

    su = repl(t["supplier"]).select(
        (F.col("s_suppkey") + F.col("_r") * S).alias("s_suppkey"),
        *[c for c in t["supplier"].columns if c != "s_suppkey"],
    )
    write("supplier", su, 1)

    pa = repl(t["part"]).select(
        (F.col("p_partkey") + F.col("_r") * P).alias("p_partkey"),
        *[c for c in t["part"].columns if c != "p_partkey"],
    )
    write("part", pa, 2)

    orders = repl(t["orders"]).select(
        (F.col("o_orderkey") + F.col("_r") * O).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_r") * C).alias("o_custkey"),
        *[c for c in t["orders"].columns if c not in ("o_orderkey", "o_custkey")],
    )
    write("orders", orders, 4)

    li = repl(t["lineitem"]).select(
        (F.col("l_orderkey") + F.col("_r") * O).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("_r") * P).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("_r") * S).alias("l_suppkey"),
        *[
            c
            for c in t["lineitem"].columns
            if c not in ("l_orderkey", "l_partkey", "l_suppkey")
        ],
    )
    write("lineitem", li, 8)

    E = base(t["events"], "event_id")
    U = base(t["events"], "user_id")
    ev = repl(t["events"]).select(
        (F.col("event_id") + F.col("_r") * E).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_r") * U).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    write("events", ev, 4)

    D = base(t["documents"], "doc_id")
    # salt once, derive n_chars from the SAME column — two copies of the
    # regex would have to stay byte-identical or n_chars silently
    # disagrees with text (load-bearing for the near-dup workload)
    salted = (
        F.when(F.col("_r") == 0, F.col("text"))
        .otherwise(
            F.expr("regexp_replace(text, '(.{4})', concat('$1', CAST(_r AS STRING)))")
        )
        .alias("text")
    )
    docs = repl(t["documents"]).select(
        (F.col("doc_id") + F.col("_r") * D).alias("doc_id"),
        salted, "lang", "source",
    ).select("doc_id", "text", "lang", "source", F.length("text").alias("n_chars"))
    write("documents", docs, 4)

    V = base(t["embeddings"], "vec_id")
    dim = len(t["embeddings"].select("embedding").first()[0])
    emb = repl(t["embeddings"]).select(
        (F.col("vec_id") + F.col("_r") * V).alias("vec_id"),
        F.when(F.col("_r") == 0, F.col("embedding"))
        .otherwise(
            F.concat(
                F.slice(F.col("embedding"), (F.col("_r") + 1).cast("int"),
                        F.lit(dim) - F.col("_r").cast("int")),
                F.slice(F.col("embedding"), F.lit(1), F.col("_r").cast("int")),
            )
        )
        .alias("embedding"),
        "label",
    )
    write("embeddings", emb, 2)

    # completion marker LAST: individual tables land atomically but the
    # table SET is not atomic — scale_check only trusts a slice that
    # carries this marker, so an interrupted build can't skew the sweep
    with open(os.path.join(OUT, "_SUCCESS"), "w") as fh:
        fh.write("ok\n")
    print(f"sf1 slice written to {OUT}")


if __name__ == "__main__":
    main()
