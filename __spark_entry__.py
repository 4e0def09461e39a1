"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's operator corpus
(infinidb_spark.plans.*) for the duckdb-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing the plan modules populates the registry.
import infinidb_spark.plans.relational  # noqa: F401,E402

try:  # optional modules appear as rounds progress
    import infinidb_spark.plans.windows  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.functions  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.pipeline  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.events  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.sources  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.catalog  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.dml  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.temporal  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.dialect  # noqa: F401,E402
except ImportError:
    pass
try:
    import infinidb_spark.plans.ref_perf  # noqa: F401,E402
except ImportError:
    pass

from infinidb_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

SF0_001 = "/root/testdata/sf0.001"

# The rounds-1/2 correctness gate stopped after the first 50 registered
# queries, so 29 operators never got a driver row.  Surface those first
# (plus queries fixed or added this round), then the long-green tail —
# correct under either a positional or a time-budget gate cap.
_PRIORITY = [
    # added round 5 — need first driver verdicts
    "embedding_quantize",
    "corpus_mixture",
    "outfile_export_roundtrip",
    "tpch_q3", "tpch_q5", "tpch_q10",
    "events_cohort_retention",
    "eval_decontamination",
    "multimodal_resize",
    "corpus_curation_pipeline",
    "jsonl_load_roundtrip",
    "orc_storage_parity",
    "ref_avg_battery",
    "events_anomaly_zscore",
    "data_profile_histogram",
    "events_strict_funnel",
    "orders_week_over_week",
    # added round 4 — need first driver verdicts
    "ann_ivf_topk",
    "ref_scan_order", "ref_filter_count", "ref_small_side_count",
    "ref_outer_left", "ref_outer_right", "ref_ordered_hint_join",
    "ref_pricing_summary", "ref_part_join_count", "ref_join_agg",
    "ref_discount_groups", "mysql_ddl_alter",
    # fixed round 3 — needed a fresh driver verdict
    "agg_decimal_exact",
    # added round 3
    "quantified_subquery",
    "group_concat_ordered",
    "part_lineitem_agg",
    "func_time",
    "extent_elimination_scan",
    "mysql_dialect_query",
    "mysql_dialect_datetime",
    "mysql_dml_statements",
    "dataset_split",
    "sequence_packing",
    "token_heavy_hitters_cms",
    # never driver-checked in rounds 1-2
    "func_string", "func_datetime", "func_control", "func_cast", "func_json",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "dedup_minhash_portable", "dedup_simhash_portable",
    "ann_cosine_topk", "ann_lsh_topk", "similarity_pairs_bucketed",
    "text_quality", "text_analyze", "text_analyze_portable", "multimodal_features",
    "multimodal_frame_plan", "data_validation",
    "events_tumbling_window", "events_sliding_window", "events_sessionize",
    "events_json_funnel", "events_hypertable_rollup",
    "bulk_load_csv_roundtrip", "pseudo_columns", "cross_engine_join",
    "system_catalog", "dml_lifecycle", "asof_join_events", "range_join_bands",
]


def _ordered(d: dict) -> dict:
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, SF0_001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return _ordered(ORACLES)
