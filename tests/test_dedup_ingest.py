"""Streaming dedup ingest: only never-seen documents land; the hash
store accumulates across epochs; restarts neither lose nor duplicate."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from infinidb_spark.streaming.dedup_ingest import (
    read_hash_store,
    stream_dedup_ingest,
)


def _doc_stream(spark, in_dir):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def _write_docs(spark, in_dir, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(in_dir)


@pytest.fixture
def workdir():
    d = tempfile.mkdtemp(prefix="infinidb_ingest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_ingest_drops_cross_epoch_dupes(spark, workdir):
    in_dir, out_dir, ckpt = (
        os.path.join(workdir, d) for d in ("in", "out", "ckpt")
    )
    _write_docs(spark, in_dir, [
        (1, "alpha document one"),
        (2, "beta document two"),
        (3, "alpha  DOCUMENT one"),  # batch dup of 1 after normalize
    ])
    q = stream_dedup_ingest(_doc_stream(spark, in_dir), out_dir, ckpt)
    q.awaitTermination(120)
    landed = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert landed == {1, 2}
    assert read_hash_store(spark, out_dir).count() == 2

    # second run: one genuinely new doc + one dup of a PRIOR epoch
    _write_docs(spark, in_dir, [
        (10, "gamma document three"),
        (11, "Beta document TWO"),  # dup of 2 from epoch 0
    ])
    q2 = stream_dedup_ingest(_doc_stream(spark, in_dir), out_dir, ckpt)
    q2.awaitTermination(120)
    landed = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert landed == {1, 2, 10}
    assert read_hash_store(spark, out_dir).count() == 3

    # restart with nothing new: no rows added, store unchanged
    q3 = stream_dedup_ingest(_doc_stream(spark, in_dir), out_dir, ckpt)
    q3.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 3
    assert read_hash_store(spark, out_dir).count() == 3


def test_hash_store_invisible_to_table_readers(spark, workdir):
    in_dir, out_dir, ckpt = (
        os.path.join(workdir, d) for d in ("in", "out", "ckpt")
    )
    _write_docs(spark, in_dir, [(1, "only document")])
    q = stream_dedup_ingest(_doc_stream(spark, in_dir), out_dir, ckpt)
    q.awaitTermination(120)
    # _hash_store and _epochs live INSIDE the table dir but underscore
    # prefixes keep them hidden from Spark's Parquet reader
    df = spark.read.parquet(out_dir)
    assert set(df.columns) == {"doc_id", "text"}
    assert df.count() == 1
    assert os.path.isdir(os.path.join(out_dir, "_hash_store"))


def test_null_id_docs_land_and_duplicate_ids_dedup(spark, workdir):
    """r11 review: a NULL-id doc used to classify 'new', poison the
    hash store, and then be DROPPED by the id-only join-back — its
    content permanently uningestable; and two rows sharing an id let a
    corpus-dup row slip in.  One doc per distinct content must land,
    NULL ids included."""
    in_dir, out_dir, ckpt = (
        os.path.join(workdir, d) for d in ("in", "out", "ckpt")
    )
    _write_docs(spark, in_dir, [
        (None, "null id unique text"),
        (5, "shared id text a"),
        (5, "shared id text a"),        # exact duplicate row
        (None, "null id unique text"),  # duplicate of the NULL-id doc
        (7, "plain doc"),
    ])
    q = stream_dedup_ingest(_doc_stream(spark, in_dir), out_dir, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["null id unique text", "plain doc", "shared id text a"]
    assert read_hash_store(spark, out_dir).count() == 3
    # the NULL-id doc is really there with its NULL id
    assert any(r.doc_id is None for r in rows)


def test_compact_hash_store_preserves_classification(spark, workdir):
    """Compaction folds the per-epoch store files into one and prior
    content still classifies as dup afterwards."""
    import glob as _g

    from infinidb_spark.streaming.dedup_ingest import compact_hash_store

    in_dir, out_dir, ckpt = (
        os.path.join(workdir, d) for d in ("in", "out", "ckpt")
    )
    _write_docs(spark, in_dir, [(1, "doc one"), (2, "doc two")])
    stream_dedup_ingest(_doc_stream(spark, in_dir), out_dir, ckpt).awaitTermination(120)
    _write_docs(spark, in_dir, [(3, "doc three")])
    stream_dedup_ingest(_doc_stream(spark, in_dir), out_dir, ckpt).awaitTermination(120)
    store = os.path.join(out_dir, "_hash_store")
    before = _g.glob(os.path.join(store, "*.parquet"))
    assert len(before) >= 2
    n = compact_hash_store(spark, out_dir)
    assert n == len(before)
    after = _g.glob(os.path.join(store, "*.parquet"))
    assert len(after) == 1 and "compacted_" in after[0]
    assert read_hash_store(spark, out_dir).count() == 3
    # prior content still classifies as dup; new content lands
    _write_docs(spark, in_dir, [(20, "DOC one"), (21, "doc four")])
    stream_dedup_ingest(_doc_stream(spark, in_dir), out_dir, ckpt).awaitTermination(120)
    landed = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert 21 in landed and 20 not in landed


def test_reserved_column_collision_rejected(spark, workdir):
    """A stream already carrying 'content_hash' (or a join-alias name)
    must be rejected up front: the ingest's own hash projection would
    silently CLOBBER then drop the user's column (same contract as
    skew.py's salt-collision guard)."""
    in_dir = os.path.join(workdir, "in")
    _write_docs(spark, in_dir, [(1, "alpha")])
    base = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(in_dir)
    )
    for bad in ("content_hash", "_cid", "_chash"):
        with pytest.raises(ValueError, match="reserved"):
            stream_dedup_ingest(
                base.withColumn(bad, F.lit("x")),
                os.path.join(workdir, "out"),
                os.path.join(workdir, "ckpt"),
            )


def test_reserved_collision_case_insensitive(spark, workdir):
    """Spark resolves columns case-insensitively by default, so a
    'Content_Hash' column collides with the ingest's projection all
    the same — the guard must compare case-insensitively."""
    in_dir = os.path.join(workdir, "in")
    _write_docs(spark, in_dir, [(1, "alpha")])
    base = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(in_dir)
    )
    with pytest.raises(ValueError, match="reserved"):
        stream_dedup_ingest(
            base.withColumn("Content_Hash", F.lit("x")),
            os.path.join(workdir, "out"),
            os.path.join(workdir, "ckpt"),
        )
