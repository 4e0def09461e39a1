"""Scaling evidence: headline queries across sf0.001 … sf1 (1000×).

Runs each bench headline query at the three driver SFs plus — when the
derived slice exists (scripts/make_sf1.py) — the sf1 tier, and prints
per-query wall times with the marginal growth of each 10× step.  A
scale-correct plan grows at most linearly in data size (step ratio
≤ ~10; in practice far less at the small end, where times sit on the
fixed planning/dispatch floor); a quadratic or collect-bound operator
shows a ratio ≫ 10.

Usage:  python scripts/scale_check.py [n_repeats]
Set SPARK_GRAFT_SF1_DIR to override the sf1 location (default
/tmp/infinidb_testdata/sf1).  Prints one JSON line per query and a
summary; exits non-zero if any query's marginal factor exceeds
SUSPECT_FACTOR on a step whose larger run is ≥ 0.5 s.
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
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/infinidb_testdata/sf1")
# only a COMPLETE slice joins the sweep: make_sf1 writes _SUCCESS last,
# so a partially-built directory (interrupted build) is skipped instead
# of crashing the sweep at its largest tier
if os.path.isfile(os.path.join(SF1_DIR, "_SUCCESS")):
    SFS = SFS + [SF1_DIR]
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
    # round-6: classifier-grade lang-id, IVF recall attestation
    "text_lang_id", "ann_recall_attest",
    # round-7: dialect CAST family (map-only over lineitem), keeper
    # selection (pairs -> connected components -> quality window)
    "mysql_dialect_cast", "dedup_keep_best",
    # round-8: compound-interval dialect arithmetic (map-side over a
    # groupBy), full-range n-gram Jaccard (size-banded bucket pairs),
    # price-restricted anti join
    "mysql_dialect_interval", "dedup_ngram_jaccard", "join_anti",
    # round-9: pretrained IVF+PQ serving (no inline Lloyd — the decade
    # step should sit near the dispatch floor), SQL-text function
    # routing battery (map-only over orders)
    "ann_ivfpq_topk_pretrained", "mysql_dialect_functions",
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
    worst = (0.0, None, None)  # (ratio, query, step)
    for name in HEADLINE:
        times = []
        for sf in SFS:
            best = min(
                _timed(queries[name], spark, sf) for _ in range(repeats)
            )
            times.append(round(best, 3))
        # marginal growth of every 10× step.  Small-SF times sit on the
        # per-query fixed floor (planning + task dispatch), so a
        # scale-correct plan shows ratios well UNDER 10; only a
        # superlinear operator (all-pairs join, driver collect) pushes a
        # step past SUSPECT_FACTOR once the run is long enough for data
        # cost to show (larger side ≥ 0.5 s).
        steps = {}
        ok = True
        for i in range(1, len(times)):
            lo, hi = times[i - 1], times[i]
            ratio = hi / max(lo, 1e-3)
            label = f"{_tag(SFS[i - 1])}->{_tag(SFS[i])}"
            steps[label] = round(ratio, 2)
            # compare RAW ratios (rounding only at print time): raw-vs-
            # rounded comparison could attribute the worst step to the
            # wrong query inside the rounding window
            if hi >= 0.5 and ratio > worst[0]:
                worst = (ratio, name, label)
            if ratio > SUSPECT_FACTOR and hi >= 0.5:
                ok = False
        if not ok:
            suspects.append(name)
        rec = {"query": name}
        rec.update({_tag(sf): t for sf, t in zip(SFS, times)})
        rec.update({"steps": steps, "ok": ok})
        print(json.dumps(rec), flush=True)

    print(json.dumps({
        "suspects": suspects, "n": len(HEADLINE), "tiers": len(SFS),
        "range_x": 10 ** (len(SFS) - 1),
        "worst_step": {"ratio": round(worst[0], 2), "query": worst[1], "step": worst[2]},
    }))
    if suspects:
        sys.exit(1)


def _tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def _timed(fn, spark, sf) -> float:
    t0 = time.perf_counter()
    fn(spark, sf).count()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
