"""Job-level attribution for the connected-components queries (r12).

Runs a CC-backed query twice (pass 0 warms codegen/IO caches, pass 1 is
the measured pass), then lists every Spark JOB the measured pass
launched (UI REST API) with its wall time — the CC loop's driver-side
job count is the cost the r12 change targets, and job counts are
load-insensitive where wall clock is not.

Usage: python scripts/cc_probe_r12.py <query> <sf_dir> [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from infinidb_spark.session import get_spark  # noqa: E402


def _rest(app_id: str, path: str):
    url = f"http://localhost:4040/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    name, sf_dir = sys.argv[1], sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("cc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[name]
    app_id = spark.sparkContext.applicationId

    walls = []
    for i in range(passes):
        spark.sparkContext.setJobDescription(f"{name} pass {i}")
        job_lo = max((j["jobId"] for j in _rest(app_id, "jobs")), default=-1) + 1
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        jobs = sorted(
            (j for j in _rest(app_id, "jobs") if j["jobId"] >= job_lo),
            key=lambda j: j["jobId"],
        )
        if i == passes - 1:
            for j in jobs:
                ms = None
                if j.get("submissionTime") and j.get("completionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    ms = int(
                        (
                            datetime.strptime(j["completionTime"], fmt)
                            - datetime.strptime(j["submissionTime"], fmt)
                        ).total_seconds()
                        * 1000
                    )
                print(
                    f"  job {j['jobId']:4d}  {ms if ms is not None else '?':>6} ms"
                    f"  stages={len(j.get('stageIds', []))}"
                    f"  tasks={j.get('numTasks')}",
                    flush=True,
                )
        print(f"pass {i}: {walls[-1]:.3f}s  jobs={len(jobs)}", flush=True)
    print(json.dumps({"query": name, "sf_dir": sf_dir, "walls": walls,
                      "min": min(walls)}))


if __name__ == "__main__":
    main()
