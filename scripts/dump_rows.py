"""Dump a registered query's full result as sorted rows to a file —
the byte-identity side of an equivalence proof (run from two trees,
diff the files).

Usage: python scripts/dump_rows.py <query> <sf_dir> <out_file>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from infinidb_spark.session import get_spark  # noqa: E402


def main() -> None:
    name, sf_dir, out = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = get_spark("dump-rows")
    spark.sparkContext.setLogLevel("ERROR")
    df = entry_mod.queries()[name](spark, sf_dir)
    rows = [repr(tuple(r)) for r in df.collect()]
    rows.sort()
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"{name}: {len(rows)} rows -> {out}", flush=True)


if __name__ == "__main__":
    main()
