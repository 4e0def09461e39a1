"""Local mirror of the driver's sf0.01 correctness gate.

Runs every registered query and its DuckDB oracle at sf0.01 (the
driver's correctness SF), timing each, and prints a per-query verdict
plus total wall time — so gate cost and greenness are known BEFORE the
driver runs.  Usage:  python scripts/gate_mirror.py [sf_dir]
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

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("gate-mirror")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_con(SF_DIR)

    results = {}
    t_total = time.perf_counter()
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            sql = oracles.get(name)
            if sql is None:
                n = len(df.collect())
                ok, msg = n >= 0, f"rows-only ({n})"
            else:
                ok, msg = compare(df, con, sql)
        except Exception:
            ok, msg = False, traceback.format_exc(limit=3).replace("\n", " | ")
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"ok": ok, "sec": dt, "msg": msg if not ok else msg[:40]}
        flag = "PASS" if ok else "FAIL"
        print(f"{flag} {dt:7.2f}s {name}" + ("" if ok else f"  -> {msg[:300]}"), flush=True)

    total = round(time.perf_counter() - t_total, 1)
    fails = [k for k, v in results.items() if not v["ok"]]
    print(json.dumps({"total_sec": total, "n": len(results), "fails": fails}))
    slow = sorted(results.items(), key=lambda kv: -kv[1]["sec"])[:10]
    print("slowest:", [(k, v["sec"]) for k, v in slow])

    # Union guard: every registered query must be green in the union of
    # all driver CORRECTNESS rounds + this mirror run — a query that
    # was green last round but silently broke this round can't hide in
    # the driver's rotating window.
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    driver_green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, v in rows.items():
            ok = (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match") in (True, None)
                and not v.get("err")
            )
            if ok:
                driver_green.add(name)
    never_attested = sorted(
        k for k in queries if k not in driver_green and not results[k]["ok"]
    )
    no_driver_row = sorted(k for k in queries if k not in driver_green)
    if no_driver_row:
        print(f"awaiting first driver verdict ({len(no_driver_row)}): {no_driver_row}")
    if fails or never_attested:
        print(f"GATE GUARD: FAIL — mirror failures: {fails}")
        sys.exit(1)
    print("GATE GUARD: every registered query green (mirror ∪ driver rounds)")


if __name__ == "__main__":
    main()
