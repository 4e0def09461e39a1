"""Structured Streaming layer.

The reference has NO streaming of any kind (SURVEY §2.10 — verified
absent from ``dbcon/`` and ``utils/``; its closest pattern is the dwweek
batch load+query interleave).  This package is therefore a capability
extension: streaming ingest + windowed aggregation over the ``events``
table shape, built on ``readStream``/``writeStream`` with watermarks.

Design: every streaming query here has a batch twin in
``plans/events.py`` computed with the same ``F.window`` expressions —
the Dataflow-style "batch is a bounded stream" equivalence — so the
driver's DuckDB oracle validates the window semantics, and the
streaming tests only need to validate delivery (append/update modes,
watermark lateness) against the already-verified batch results.
"""

from infinidb_spark.streaming.events import (
    events_stream_from_directory,
    sliding_event_counts,
    stream_tumbling_counts,
    tumbling_event_stats,
)

__all__ = [
    "events_stream_from_directory",
    "stream_tumbling_counts",
    "tumbling_event_stats",
    "sliding_event_counts",
]
