"""Skew probe for the gram-frequency count (optimization round 12).

Builds a DELIBERATELY skewed synthetic corpus — every document shares
one boilerplate word 3-gram (the Zipfian-hot-key scenario VERDICT r11
flagged: a single gram's instances all routing to one reducer) — runs
``ngram_jaccard_pairs`` over it, and reports the per-task
shuffle-read-record and run-time distribution (min/median/max from the
UI REST taskSummary) for every multi-task stage.  Pass criterion: no
stage whose max shuffle-read records exceed 2x its median — i.e. the
salted two-level count spreads the hot gram.

Usage: python scripts/skew_probe_r12.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infinidb_spark.session import get_spark  # noqa: E402
from infinidb_spark.operators.dedup import ngram_jaccard_pairs  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CORPUS = "/tmp/skew_corpus_r12"


def build_corpus(spark) -> None:
    """200k docs x 12 words; words deterministic from xxhash64(doc, pos)
    over a 3000-word vocab, PLUS the same 3-word boilerplate suffix on
    EVERY doc — one gram with 100% document frequency (worse than the
    verdict's 20% scenario)."""
    from pyspark.sql import functions as F

    df = (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit("w"),
                            F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(3000)),
                        )
                        for i in range(9)
                    ],
                ),
                F.lit(" hot boiler plate"),
            ).alias("text"),
        )
    )
    df.repartition(8).write.mode("overwrite").parquet(CORPUS)


UI_BASE = None


def rest(app_id: str, path: str):
    url = f"{UI_BASE}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    global UI_BASE
    UI_BASE = spark.sparkContext.uiWebUrl
    build_corpus(spark)
    df = spark.read.parquet(CORPUS)

    app_id = spark.sparkContext.applicationId
    jobs_before = max((j["jobId"] for j in rest(app_id, "jobs")), default=-1)

    spark.sparkContext.setJobDescription("skew probe: ngram_jaccard_pairs")
    t0 = time.perf_counter()
    pairs = ngram_jaccard_pairs(df, threshold=0.8)
    pairs.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"wall: {wall:.2f}s", flush=True)

    worst = 0.0
    for j in sorted(rest(app_id, "jobs"), key=lambda x: x["jobId"]):
        if j["jobId"] <= jobs_before:
            continue
        for sid in sorted(j.get("stageIds", [])):
            try:
                stages = rest(app_id, f"stages/{sid}")
            except Exception:
                continue
            for s in stages:
                if s.get("status") == "SKIPPED":
                    continue
                n = s.get("numCompleteTasks", 0)
                if n < 4:
                    continue
                try:
                    q = rest(
                        app_id,
                        f"stages/{sid}/{s['attemptId']}/taskSummary"
                        "?quantiles=0.0,0.5,1.0",
                    )
                except Exception:
                    continue
                rec = q.get("shuffleReadMetrics", {}).get("readRecords", [0, 0, 0])
                rt = q.get("executorRunTime", [0, 0, 0])
                ratio = (rec[2] / rec[1]) if rec[1] else 0.0
                if rec[2] > 1000:
                    worst = max(worst, ratio)
                flag = " <-- STRAGGLER" if rec[1] and rec[2] > 1000 and ratio > 2 else ""
                print(
                    f"stage {sid:4d} tasks={n:3d} "
                    f"readRecords min/med/max={rec[0]:.0f}/{rec[1]:.0f}/{rec[2]:.0f} "
                    f"runTime med/max={rt[1]:.0f}/{rt[2]:.0f}ms "
                    f"name={s.get('name','')[:50]}{flag}",
                    flush=True,
                )
    print(
        f"worst max/median readRecords ratio (stages with max>1000): {worst:.2f}"
        + ("  PASS (<=2)" if worst <= 2 else "  FAIL"),
        flush=True,
    )


if __name__ == "__main__":
    main()
