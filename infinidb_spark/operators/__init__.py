"""Operator library — compositions Spark doesn't ship as single calls.

Two families live here:

* reference-parity helpers (ordered GROUP_CONCAT, set-op normalization,
  top-N) where the reference has a dedicated JobStep and Spark needs a
  documented composition;
* the large-scale training-data pipeline operators (deduplication,
  similarity search, text analysis, multimodal column plumbing) — the
  capability extension this engine adds beyond the reference surface,
  designed for 100 TB inputs: everything is expressed as DataFrame
  transformations whose shuffles are keyed on bounded-cardinality
  band/bucket keys, never on raw documents.
"""
