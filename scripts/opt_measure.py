"""Optimization-round measurement harness (guide §1: measure first).

Runs the bench headline queries with the SAME session/warmup protocol as
bench.py, but separates per-query DRIVER build time (DataFrame
construction + analysis) from execution+collect time, runs N passes,
and optionally captures .explain("formatted") into plans/r11/.

Usage:
    python scripts/opt_measure.py [--plans before|after] [--passes N]
                                  [--queries q1,q2,...] [--stages]

--stages additionally dumps per-job/stage wall+task metrics from the
local Spark UI REST API for each query's final pass, so stage-level cost
attribution (scheduling waves vs compute) is measured, not guessed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

# stage metrics come over the UI REST API; the engine default is UI-off
os.environ.setdefault("SPARK_GRAFT_UI", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from infinidb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary", "groupby_join_agg", "join_multiway", "join_semi",
    "agg_distinct", "derived_table", "topn_order_limit", "group_concat",
    "window_rank", "window_agg_frame", "dedup_exact", "dedup_minhash_lsh",
    "ann_cosine_topk", "text_quality", "events_tumbling_window",
]


def _warmup(spark, queries):
    """bench.py's warmup, verbatim in spirit: generic operator families +
    two sf0.001 passes per headline + one sf0.01 minhash pass."""
    import pyspark.sql.functions as _F
    from pyspark.sql import Window as _W

    spark.range(1000).count()
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    region.groupBy("r_regionkey").agg(_F.count(_F.lit(1))).collect()
    region.join(_F.broadcast(region.select("r_regionkey")), "r_regionkey").count()
    spark.range(1000).repartition(4).count()
    tiny = spark.range(1000).select(
        "id",
        (_F.col("id") * 1.5).cast("decimal(18,2)").alias("d"),
        (_F.col("id") % 7).alias("g"),
        _F.conv(_F.substring(_F.md5(_F.col("id").cast("string")), 1, 7), 16, 10).alias("h"),
    )
    tiny.groupBy("g").agg(
        _F.sum("d"), _F.avg("d"), _F.count(_F.lit(1)), _F.min("h"), _F.max("h")
    ).collect()
    _w = _W.partitionBy("g").orderBy("id")
    tiny.select(_F.sum("d").over(_w), _F.row_number().over(_w)).collect()
    tiny.orderBy(_F.col("d").desc()).limit(5).collect()
    tiny.select(_F.sha2(_F.col("id").cast("string"), 256), _F.xxhash64("id")).collect()
    tiny.select(_F.explode(_F.sequence(_F.lit(1), _F.lit(3)))).count()

    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for _ in range(2):
            for name in HEADLINE:
                fn = queries.get(name)
                if fn is None:
                    continue
                try:
                    fn(spark, warm_dir).collect()
                except Exception:
                    pass
    mid_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    if os.path.isdir(mid_dir) and "dedup_minhash_lsh" in queries:
        try:
            queries["dedup_minhash_lsh"](spark, mid_dir).collect()
        except Exception:
            pass


def _rest(app_id: str, path: str):
    url = f"http://localhost:4040/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _stage_report(app_id: str, job_lo: int) -> list[dict]:
    jobs = [j for j in _rest(app_id, "jobs") if j["jobId"] >= job_lo]
    out = []
    for j in sorted(jobs, key=lambda x: x["jobId"]):
        for sid in sorted(j.get("stageIds", [])):
            try:
                stages = _rest(app_id, f"stages/{sid}")
            except Exception:
                continue
            for s in stages:
                if s.get("status") == "SKIPPED":
                    out.append({"job": j["jobId"], "stage": sid, "skipped": True})
                    continue
                sub = s.get("submissionTime")
                comp = s.get("completionTime")
                out.append({
                    "job": j["jobId"],
                    "stage": sid,
                    "name": s.get("name", "")[:60],
                    "tasks": s.get("numCompleteTasks"),
                    "wall_ms": None if not (sub and comp) else _ms(comp) - _ms(sub),
                    "task_time_ms": s.get("executorRunTime"),
                    "shuffle_read": s.get("shuffleReadBytes"),
                    "shuffle_write": s.get("shuffleWriteBytes"),
                })
    return out


def _ms(iso: str) -> int:
    from datetime import datetime, timezone

    return int(
        datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S.%f%Z")
        .replace(tzinfo=timezone.utc)
        .timestamp()
        * 1000
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, choices=["before", "after"])
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else HEADLINE

    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    queries = entry_mod.queries()
    _warmup(spark, queries)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("OPT_PLANS_SUBDIR", "r11"),
    )
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"SKIP {name} (not registered)")
            continue
        spark.sparkContext.setJobDescription(f"opt-measure: {name}")
        build_ts, run_ts = [], []
        job_lo = 0
        for p in range(args.passes):
            if args.stages and p == args.passes - 1:
                job_lo = max((j["jobId"] for j in _rest(app_id, "jobs")), default=-1) + 1
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            n = len(df.collect())
            t2 = time.perf_counter()
            build_ts.append(round(t1 - t0, 3))
            run_ts.append(round(t2 - t1, 3))
        if args.plans:
            try:
                plan = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    fn(spark, SF_DIR).explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        rec = {
            "build": build_ts,
            "run": run_ts,
            "best_total": round(min(b + r for b, r in zip(build_ts, run_ts)), 3),
            "rows": n,
        }
        if args.stages:
            try:
                rec["stages"] = _stage_report(app_id, job_lo)
            except Exception as e:
                rec["stages_err"] = str(e)
        results[name] = rec
        print(name, json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)

    total_best = round(sum(r["best_total"] for r in results.values()), 3)
    print(json.dumps({"total_best": total_best, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
