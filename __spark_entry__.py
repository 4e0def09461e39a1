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
try:
    import infinidb_spark.plans.tpch  # noqa: F401,E402
except ImportError:
    pass

from infinidb_spark.plans.registry import ORACLES, QUERIES  # noqa: E402

SF0_001 = "/root/testdata/sf0.001"

# The driver's correctness gate checks a rotating ~50-query window in
# registration order, so this list decides who gets a verdict.  Round-4
# ordering (VERDICT r03 "Next round" #1): the 24 queries that have NEVER
# received a driver row in CORRECTNESS_r01-r03 come first, then the two
# queries fixed this round, then queries newly added this round, then
# the long-green tail (green in r02/r03, code unchanged).
_PRIORITY = [
    # never driver-checked in any round — first driver verdicts
    "dedup_minhash_portable", "dedup_simhash_portable",
    "ann_cosine_topk", "ann_lsh_topk", "similarity_pairs_bucketed",
    "dedup_embedding_cosine",
    "text_quality", "text_analyze", "text_analyze_portable",
    "multimodal_features", "multimodal_frame_plan",
    "data_validation",
    "events_tumbling_window", "events_sliding_window", "events_sessionize",
    "events_json_funnel", "events_hypertable_rollup",
    "bulk_load_csv_roundtrip", "pseudo_columns", "cross_engine_join",
    "system_catalog", "dml_lifecycle", "asof_join_events", "range_join_bands",
    # fixed round 4 — red in r03, need fresh verdicts
    "func_cast",
    "mysql_dml_statements",
    # added round 4 — first driver verdicts
    "mysql_ci_collation",
    "auto_increment_roundtrip",
    "date_format_week_tokens",
    # the reference's TPC-H suite (dbcon/doc/tpch01-22.sql) through the
    # MySQL front-end — added round 4, first driver verdicts (q3/q5/q10
    # hold green r03 rows already)
    "tpch_q1", "tpch_q2", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20",
    "tpch_q21", "tpch_q22",
    # new pipeline operators added round 4 — first driver verdicts
    "dedup_clusters",
    "text_pii_scrub",
    "text_repetition",
    "embedding_kmeans",
    "cluster_balanced_sample",
    # reference perf-group twins added this round
    "ref_minmax_join", "ref_part_probe", "ref_var_driven_report",
    # round-5 perf-group twins: the remaining numbered groups (2, 6,
    # 101-106, 111, 201-204) — first driver verdicts
    "ref_scan_range_order", "ref_point_lookup", "ref_agg_battery_wide",
    "ref_pm_join_ranges", "ref_um_join_ranges", "ref_single_avg",
    "ref_groupby_minmax_str", "ref_count_int_probe", "ref_global_min",
    "ref_full_count", "ref_star_self_join", "ref_multi_pred_max",
    # round-5 incremental dedup (batch vs stored signature/hash store)
    "dedup_exact_incremental", "dedup_minhash_incremental",
    "ann_batch_topk",
    "multi_table_dml",
    "streaming_dedup_ingest",
    "text_window_dedup",
    # long-green tail: re-verified as window budget allows.  (The
    # rows-only dedup_minhash_lsh / dedup_simhash already carry r03
    # driver rows; their hash pins are the portable twins above.)
    "q1_pricing_summary",
    "dedup_minhash_lsh", "dedup_simhash",
    "embedding_quantize", "corpus_mixture", "outfile_export_roundtrip",
    "tpch_q3", "tpch_q5", "tpch_q10",
    "events_cohort_retention", "eval_decontamination", "multimodal_resize",
    "corpus_curation_pipeline", "jsonl_load_roundtrip", "orc_storage_parity",
    "ref_avg_battery", "events_anomaly_zscore", "data_profile_histogram",
    "events_strict_funnel", "orders_week_over_week",
    "ann_ivf_topk",
    "ref_scan_order", "ref_filter_count", "ref_small_side_count",
    "ref_outer_left", "ref_outer_right", "ref_ordered_hint_join",
    "ref_pricing_summary", "ref_part_join_count", "ref_join_agg",
    "ref_discount_groups", "mysql_ddl_alter",
    "agg_decimal_exact", "quantified_subquery", "group_concat_ordered",
    "part_lineitem_agg", "func_time", "extent_elimination_scan",
    "mysql_dialect_query", "mysql_dialect_datetime",
    "dataset_split", "sequence_packing", "token_heavy_hitters_cms",
    "func_string", "func_datetime", "func_control", "func_json",
    "dedup_exact", "dedup_ngram_jaccard",
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
