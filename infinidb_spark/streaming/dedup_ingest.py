"""Streaming corpus ingestion with exact incremental dedup.

The pipeline integration: documents stream in continuously; each
micro-batch is classified against the CONTENT-HASH STORE accumulated
from every prior epoch (operators/dedup.py dedup_exact_incremental) and
only ``status='new'`` docs land in the corpus table.  The reference's
closest pattern is nightly cpimport + a dedup pass; here it is one
continuously-running query with bounded per-epoch work.

Store layout: ``<table_dir>/_hash_store/`` — a Parquet relation of
``(content_hash)`` appended per epoch through the SAME idempotent-epoch
protocol as the row data (streaming/sink.py), so a replayed epoch
re-lands identical files and is skipped once its marker exists.

Replay safety around the store: the sink protocol links part files
BEFORE the commit marker, so a crash mid-epoch can leave partial
current-epoch hash files in the store.  Classification therefore reads
the store EXCLUDING files of the epoch being (re)written — otherwise a
replayed batch would classify its own half-committed hashes as corpus
dups and silently drop the docs.

At 100 TB: per-epoch work is O(batch) — the batch is hashed and
shuffle-joined against the store on the hash column; the store carries
32-byte hashes, never text.  When the store outgrows a comfortable
join, the same protocol works with the store bucketed by hash prefix
(sources/bucketed.py) for a co-partitioned join.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from infinidb_spark.operators.dedup import dedup_exact_incremental
from infinidb_spark.streaming.sink import (
    epoch_prefix,
    sink_id_for,
    start_epoch_stream,
    write_epoch_idempotent,
)

_STORE_DIR = "_hash_store"


def read_hash_store(
    spark: SparkSession, table_dir: str, exclude_prefix: str | None = None
) -> DataFrame:
    """The accumulated (content_hash) relation; empty-schema relation
    before the first epoch.  ``exclude_prefix`` drops files of the
    epoch currently being written (replay-safety, module docstring)."""
    store = os.path.join(table_dir, _STORE_DIR)
    # glob.escape: a table path containing glob metacharacters ([, *, ?)
    # would otherwise match nothing — an always-empty hash store means
    # every batch classifies as "new" and duplicates land silently
    files = sorted(glob.glob(os.path.join(glob.escape(store), "*.parquet")))
    if exclude_prefix:
        files = [f for f in files if not os.path.basename(f).startswith(exclude_prefix)]
    if not files:
        return spark.createDataFrame([], "content_hash string")
    from infinidb_spark.streaming.sink import hadoop_glob_escape

    # Spark's reader globs each path again JVM-side — escape those too
    return spark.read.parquet(*(hadoop_glob_escape(f) for f in files))


def compact_hash_store(spark: SparkSession, table_dir: str) -> int:
    """Rewrite the accumulated hash store as ONE deduplicated file.

    The store gains at least one parquet file per epoch forever, so a
    long-running stream's every micro-batch pays O(epochs) listing/open
    cost to classify — this maintenance hook restores O(1).  Run while
    the ingest is PAUSED (same contract as sink.vacuum_sink_table): a
    concurrent classify could read a file mid-delete.  Epoch commit
    MARKERS are kept, so a checkpoint replay of an already-compacted
    epoch still skips (and if it ever re-landed, the store read
    dropDuplicates the hashes anyway).  Returns the number of files
    replaced."""
    store = os.path.join(table_dir, _STORE_DIR)
    files = sorted(glob.glob(os.path.join(glob.escape(store), "*.parquet")))
    if len(files) <= 1:
        return 0
    from infinidb_spark.streaming.sink import _fsync_path, hadoop_glob_escape

    df = spark.read.parquet(
        *(hadoop_glob_escape(f) for f in files)
    ).dropDuplicates(["content_hash"])
    tmp = os.path.join(store, ".compact_tmp")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    df.coalesce(1).write.parquet(tmp)
    parts = glob.glob(os.path.join(glob.escape(tmp), "part-*.parquet"))
    if len(parts) != 1:
        raise RuntimeError(f"expected one compacted part, found {len(parts)}")
    gen = 1 + max(
        (int(os.path.basename(f)[10:-8])
         for f in files
         if os.path.basename(f).startswith("compacted_")
         and os.path.basename(f)[10:-8].isdigit()),
        default=0,
    )
    dst = os.path.join(store, f"compacted_{gen:06d}.parquet")
    os.replace(parts[0], dst)
    _fsync_path(dst)
    _fsync_path(store)
    shutil.rmtree(tmp, ignore_errors=True)
    for f in files:
        os.remove(f)
    _fsync_path(store)
    return len(files)


def stream_dedup_ingest(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest a document stream, landing only docs whose
    normalized content was never seen in ANY prior epoch (or earlier in
    the same batch — lowest id wins)."""
    os.makedirs(table_dir, exist_ok=True)
    sink_id = sink_id_for(checkpoint_dir)
    store_dir = os.path.join(table_dir, _STORE_DIR)
    # 'content_hash' would be silently CLOBBERED by the ingest's own
    # hash projection (then dropped — user data lost); the join aliases
    # would fail later with an opaque ambiguity.  Reject up front, the
    # same contract as skew.py's salt-collision guard.  Compared
    # case-insensitively: Spark resolves columns case-insensitively by
    # default, so a 'Content_Hash' column collides all the same.
    reserved = {
        c for c in stream.columns
        if c.lower() in ("content_hash", "_cid", "_chash")
    }
    if reserved:
        raise ValueError(
            f"input columns {sorted(reserved)} collide with "
            "stream_dedup_ingest's reserved working names — rename them "
            "before ingesting"
        )

    def _ingest_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        from infinidb_spark.operators.dedup import normalize_text

        # THE shared spelling (sink.epoch_prefix) — a hand-rolled
        # copy that drifted from the writer's prefix would stop
        # excluding the current epoch's partial store files on
        # replay, making the batch's own docs classify as dups
        prefix = epoch_prefix(sink_id, epoch_id)
        store = read_hash_store(spark, table_dir, exclude_prefix=prefix)
        # persist the HASHED batch and derive both the classification
        # and the join-back from it: normalize+sha2 runs once per epoch
        # (hash_col tells dedup_exact_incremental to reuse it), and the
        # classification is persisted too — it feeds two writes
        hashed = batch_df.withColumn(
            "content_hash",
            F.sha2(normalize_text(F.col(text_col)), 256),
        ).persist()
        classified = dedup_exact_incremental(
            hashed, store, text_col=text_col, id_col=id_col,
            hash_col="content_hash",
        ).filter(F.col("status") == "new").persist()
        try:
            # exact join-back on (id NULL-SAFE, content_hash), then one
            # row per hash: the old id-only leftsemi dropped NULL-id
            # docs entirely (while still poisoning their hash into the
            # store) and let a corpus-dup row sharing a 'new' row's id
            # slip into the corpus
            cls = classified.select(
                F.col(id_col).alias("_cid"),
                F.col("content_hash").alias("_chash"),
            )
            fresh = (
                hashed.join(
                    cls,
                    hashed[id_col].eqNullSafe(F.col("_cid"))
                    & (hashed["content_hash"] == F.col("_chash")),
                    "leftsemi",
                )
                # classified is unique per hash; exact duplicate
                # (id, hash) batch rows collapse to one landing
                .dropDuplicates(["content_hash"])
                .drop("content_hash")
            )
            write_epoch_idempotent(fresh, epoch_id, table_dir, sink_id=sink_id)
            write_epoch_idempotent(
                classified.select("content_hash").distinct(),
                epoch_id,
                store_dir,
                sink_id=sink_id,
            )
        finally:
            classified.unpersist()
            hashed.unpersist()

    return start_epoch_stream(stream, _ingest_epoch, checkpoint_dir, available_now)
