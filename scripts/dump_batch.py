"""Dump several registered queries' full results (sorted rows) across
several SF dirs in ONE Spark session — the batch form of dump_rows.py,
for before/after byte-identity proofs over a family of queries.

Usage: python scripts/dump_batch.py <out_dir> <q1,q2,...> <sf_dir1,sf_dir2,...>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from infinidb_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, names, sf_dirs = sys.argv[1], sys.argv[2].split(","), sys.argv[3].split(",")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-batch")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for sf_dir in sf_dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        for name in names:
            df = queries[name](spark, sf_dir)
            rows = sorted(repr(tuple(r)) for r in df.collect())
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write("\n".join(rows) + "\n")
            print(f"{name} @ {tag}: {len(rows)} rows -> {path}", flush=True)


if __name__ == "__main__":
    main()
