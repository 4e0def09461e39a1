"""Corpus-wide oracle audit: non-vacuous results + total ORDER BY keys.

Two attestation-flake classes surfaced in round 7 (VERDICT.md):

* ``mysql_dialect_cast`` went red because its ORDER BY was not a total
  order — Spark's and DuckDB's tie permutations disagree, and the
  driver's value hash is row-order-sensitive (unlike
  tests/oracle_util.compare, which sorts rows before comparing).
* ``dedup_ngram_jaccard`` attested green *vacuously*: both sides
  returned 0 rows, which proves nothing about the operator.

This audit runs every registered DuckDB oracle at the gate SF and
checks, per oracle:

1. **non-empty** — the result has at least one row;
2. **total order** — if the oracle has a top-level ORDER BY, no two
   rows share the sort-key tuple while differing elsewhere (ties with
   identical full rows are harmless: any permutation hashes the same).

ORDER BY terms are resolved against the output columns (alias name or
1-based ordinal).  A term that is a raw expression (not an output
column) can't be mapped from the fetched result alone; those oracles
are reported as UNMAPPED for manual review rather than silently passed.

Usage:  python scripts/audit_oracles.py [sf_dir]
Exit status 1 if any oracle fails (vacuous or non-total).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle_util import _canon, duck_con, top_level_order_by  # noqa: E402


def audit_one(con, name: str, sql: str) -> tuple[str, str]:
    """Return (status, detail); status in PASS / VACUOUS / NONTOTAL /
    UNMAPPED / ERROR."""
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    except Exception as exc:  # noqa: BLE001
        return "ERROR", repr(exc)[:200]
    if not rows:
        return "VACUOUS", "oracle returned 0 rows at this SF"
    terms = top_level_order_by(sql)
    if terms is None:
        return "PASS", f"{len(rows)} rows, no top-level ORDER BY"
    lower_cols = {c.lower(): i for i, c in enumerate(cols)}
    idxs: list[int] = []
    for t in terms:
        key = t.strip().strip('"').lower()
        if key.isdigit():
            pos = int(key) - 1
            if 0 <= pos < len(cols):
                idxs.append(pos)
                continue
        if key in lower_cols:
            idxs.append(lower_cols[key])
        else:
            return "UNMAPPED", f"ORDER BY term not an output column: {t!r}"
    groups: dict[tuple, set] = {}
    for r in rows:
        k = tuple(repr(_canon(r[i])) for i in idxs)
        full = tuple(repr(_canon(v)) for v in r)
        groups.setdefault(k, set()).add(full)
    bad = [k for k, v in groups.items() if len(v) > 1]
    if bad:
        return (
            "NONTOTAL",
            f"{len(bad)} tie group(s) with differing rows, e.g. key={bad[0]}",
        )
    return "PASS", f"{len(rows)} rows, ORDER BY total on {len(idxs)} col(s)"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duck_con(sf_dir)
    oracles = entry_mod.oracle_sql()
    fails: dict[str, str] = {}
    counts: dict[str, int] = {}
    for name, sql in sorted(oracles.items()):
        status, detail = audit_one(con, name, sql)
        counts[status] = counts.get(status, 0) + 1
        if status != "PASS":
            fails[name] = f"{status}: {detail}"
            print(f"{status:8s} {name}  -> {detail}", flush=True)
    print(json.dumps({"n": len(oracles), "counts": counts, "fails": fails}))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
