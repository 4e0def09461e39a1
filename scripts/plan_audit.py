"""Plan audit: capture .explain("formatted") for EVERY registered query
and flag anti-patterns (guide §7.2) — Python-boundary nodes, cartesian
products, unexpected sort-merge joins, exchange counts, scans without
pushdown.  Driver-side only (plans are built, not executed, except for
queries whose construction itself runs bounded driver jobs).

Usage: python scripts/plan_audit.py [sf_dir] [out_dir]
Writes <out_dir>/<query>.txt plans and prints one summary line per query:
  name  exchanges=N bhj=N smj=N gen=N python=N cartesian=N  flags...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from infinidb_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit"


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    rows = []
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:
            rows.append((name, None, f"ERROR {type(e).__name__}: {str(e)[:120]}"))
            continue
        with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
            f.write(plan)
        counts = {
            "exch": plan.count("+- Exchange") + plan.count(":- Exchange") + plan.count("\n(1) Exchange"),
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "cart": plan.count("CartesianProduct"),
            "py": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") + plan.count("MapInArrow") + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas"),
            "gen": plan.count("Generate"),
            "sort": plan.count(") Sort\n") + plan.count("+- Sort ") + plan.count("TakeOrdered"),
            "win": plan.count(") Window"),
        }
        flags = []
        if counts["cart"]:
            flags.append("CARTESIAN")
        if counts["bnlj"]:
            flags.append("BNLJ")
        if counts["py"]:
            flags.append("PYTHON")
        if counts["smj"]:
            flags.append("SMJ")
        dt = round(time.perf_counter() - t0, 2)
        rows.append((name, counts, " ".join(flags)))
        c = counts
        print(
            f"{name:40s} exch={c['exch']:2d} bhj={c['bhj']} smj={c['smj']} shj={c['shj']} "
            f"gen={c['gen']} py={c['py']} cart={c['cart']} bnlj={c['bnlj']} {rows[-1][2]} ({dt}s)",
            flush=True,
        )
    errs = [r for r in rows if r[1] is None]
    print(f"\n{len(rows)} plans, {len(errs)} errors")
    for name, _, msg in errs:
        print("ERR", name, msg)


if __name__ == "__main__":
    main()
