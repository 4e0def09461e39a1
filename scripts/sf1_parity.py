"""Targeted sf1 oracle-parity pass — run a named subset of registered
queries against their DuckDB oracles at a LARGER scale than the
driver's sf0.01 gate (catches value divergences that only materialize
with more rows: overflow, tie-ordering, float accumulation).

Usage:  python scripts/sf1_parity.py <sf_dir> <query> [<query> ...]
        python scripts/sf1_parity.py <sf_dir> --module windows
(--module filters by the plans module that registered the query.)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from infinidb_spark.session import get_spark  # noqa: E402
from tests.oracle_util import compare, duck_con  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if sys.argv[2] == "--module":
        from infinidb_spark.plans.registry import QUERIES

        mod = sys.argv[3]
        names = [
            n for n, fn in QUERIES.items()
            if getattr(fn, "__module__", "").endswith(mod)
        ]
    else:
        names = sys.argv[2:]
    spark = get_spark("sf1-parity")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    fails = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            sql = oracles.get(name)
            if sql is None:
                n = len(df.collect())
                ok, msg = n >= 0, f"rows-only ({n})"
            else:
                ok, msg = compare(df, con, sql)
        except Exception:
            ok, msg = False, traceback.format_exc(limit=3).replace("\n", " | ")
        dt = round(time.perf_counter() - t0, 2)
        print(
            f"{'PASS' if ok else 'FAIL'} {dt:7.2f}s {name}"
            + ("" if ok else f"  -> {msg[:400]}"),
            flush=True,
        )
        if not ok:
            fails.append(name)
    print(json.dumps({"sf_dir": sf_dir, "n": len(names), "fails": fails}))


if __name__ == "__main__":
    main()
