"""Measure ONE registered query at a given SF dir with the noop sink.

Usage: python scripts/measure_one.py <query> <sf_dir> [passes] [--plan out.txt]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from infinidb_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 and not sys.argv[3].startswith("--") else 3
    plan_out = None
    if "--plan" in sys.argv:
        plan_out = sys.argv[sys.argv.index("--plan") + 1]

    spark = get_spark("measure-one")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[name]

    if plan_out:
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(plan_out, "w") as f:
            f.write(buf.getvalue())
        print("plan ->", plan_out, flush=True)

    for i in range(passes):
        spark.sparkContext.setJobDescription(f"{name} pass {i}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(f"pass {i}: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
