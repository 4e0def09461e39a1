"""Scaling evidence: headline queries across sf0.001 / sf0.01 / sf0.1.

Runs each bench headline query at all three driver SFs (100× data range)
and prints per-query wall times plus the 0.01→0.1 growth ratio — the
measurable stand-in for "would this plan survive a 100× scale-up".  A
scale-correct plan grows at most linearly in data size (ratio ≤ ~10
for the 10× step; in practice far less, since small-SF times sit on
the fixed planning/dispatch floor); a quadratic or collect-bound
operator shows a ratio ≫ 10.

Usage:  python scripts/scale_check.py [n_repeats]
Prints one JSON line per query and a summary verdict; exits non-zero if
any query's marginal factor exceeds SUSPECT_FACTOR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from infinidb_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
HEADLINE = [
    "q1_pricing_summary", "groupby_join_agg", "join_multiway", "join_semi",
    "agg_distinct", "derived_table", "topn_order_limit", "group_concat",
    "window_rank", "window_agg_frame", "dedup_exact", "dedup_minhash_lsh",
    "ann_cosine_topk", "text_quality", "events_tumbling_window",
    "tpch_q5", "tpch_q18", "tpch_q21",
    # round-5 additions: classifier (explode+groupBy), PQ train+encode
    # (Lloyd + projections), IVF+PQ ADC serving, stratified rank-and-cut
    "text_classifier_quality", "embedding_pq", "ann_ivfpq_topk",
    "dataset_stratified_split",
    # late round-5: cluster-then-prune dedup (batch + incremental)
    "dedup_semantic", "dedup_semantic_incremental",
]
#: 10× data should cost ≤ ~10× time; 20 allows this box's run variance
#: without hiding quadratics (an all-pairs operator would show ≥ ~100).
SUSPECT_FACTOR = 20.0


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # warm the operator machinery once per query at the smallest SF so
    # measured times are execution, not first-run Catalyst/Janino compile
    for name in HEADLINE:
        queries[name](spark, SFS[0]).count()

    suspects = []
    for name in HEADLINE:
        times = []
        for sf in SFS:
            best = min(
                _timed(queries[name], spark, sf) for _ in range(repeats)
            )
            times.append(round(best, 3))
        t001, t01, t1 = times
        # growth across the 10× step 0.01→0.1.  Times at these SFs are
        # dominated by the per-query fixed floor (planning + task
        # dispatch), so a scale-correct plan shows a ratio well UNDER
        # 10; only a superlinear operator (all-pairs join, driver
        # collect) can push the ratio past SUSPECT_FACTOR once the run
        # is long enough for data cost to show (t1 >= 0.5 s).
        ratio = t1 / max(t01, 1e-3)
        ok = ratio <= SUSPECT_FACTOR or t1 < 0.5
        if not ok:
            suspects.append(name)
        print(json.dumps({
            "query": name, "sf0.001": t001, "sf0.01": t01, "sf0.1": t1,
            "ratio_10x_step": round(ratio, 2), "ok": ok,
        }), flush=True)

    print(json.dumps({"suspects": suspects, "n": len(HEADLINE)}))
    if suspects:
        sys.exit(1)


def _timed(fn, spark, sf) -> float:
    t0 = time.perf_counter()
    fn(spark, sf).count()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
