"""Streaming IVF index maintenance (streaming/ann_ingest.py): epoch
idempotence, partition-pruned serving, and zero drift vs batch IVF."""

from __future__ import annotations

import os
import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from infinidb_spark.operators.similarity import (
    ann_ivf_topk,
    train_ivf_centroids,
)
from infinidb_spark.plans.pipeline import _QUERY_VEC
from infinidb_spark.session import load_tables
from infinidb_spark.streaming.ann_ingest import (
    ann_index_serve,
    stream_ann_ingest,
)


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    centroids = train_ivf_centroids(emb, stride=50)
    work = tempfile.mkdtemp(prefix="ann_ingest_t_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    for b in (0, 1):
        batch_dir = os.path.join(work, f"b{b}")
        emb.filter(F.col("vec_id") % 2 == b).select(
            "vec_id", "embedding"
        ).coalesce(1).write.parquet(batch_dir)
        part = next(
            f for f in os.listdir(batch_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        dst = os.path.join(in_dir, f"batch{b}.parquet")
        shutil.move(os.path.join(batch_dir, part), dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))

    def run(tag: str) -> str:
        index_dir = os.path.join(work, f"index_{tag}")
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = stream_ann_ingest(
            stream, index_dir, os.path.join(work, f"ckpt_{tag}"), centroids
        )
        assert q.awaitTermination(300), "stream did not finish"
        return index_dir

    index_dir = run("a")
    yield {"emb": emb, "centroids": centroids, "work": work,
           "index_dir": index_dir, "run": run}
    shutil.rmtree(work, ignore_errors=True)


def test_streamed_index_matches_batch_ivf(spark, built):
    """Zero drift: serving from the streamed index equals batch
    ann_ivf_topk row for row (same model, probes, rerank)."""
    got = ann_index_serve(
        spark, built["index_dir"], _QUERY_VEC, built["centroids"], k=10, n_probe=2
    ).collect()
    want = ann_ivf_topk(
        built["emb"], _QUERY_VEC, k=10, n_probe=2, centroids=built["centroids"]
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_serving_scan_is_partition_pruned(spark, built):
    """The cid IN probes filter must hit the hive partition column —
    unprobed posting lists are never read."""
    df = ann_index_serve(
        spark, built["index_dir"], _QUERY_VEC, built["centroids"], k=10, n_probe=2
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cid" in m.group(1) and " IN " in m.group(1), plan[:800]


def test_index_rows_complete_and_replay_idempotent(spark, built):
    """Every streamed vector lands exactly once, and a second full run
    (fresh checkpoint, fresh index) builds an identical index."""
    idx = spark.read.parquet(built["index_dir"])
    n = built["emb"].count()
    assert idx.count() == n
    assert idx.select("vec_id").distinct().count() == n
    idx2 = spark.read.parquet(built["run"]("b"))
    a = sorted((r.vec_id, r.cid) for r in idx.select("vec_id", "cid").collect())
    b = sorted((r.vec_id, r.cid) for r in idx2.select("vec_id", "cid").collect())
    assert a == b
