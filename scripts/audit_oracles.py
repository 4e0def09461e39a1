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
from tests.oracle_util import _canon, duck_con  # noqa: E402


def top_level_order_by(sql: str) -> list[str] | None:
    """Return the column terms of the LAST paren-depth-0 ORDER BY, or
    None if the statement has no top-level ORDER BY.  Terms are
    stripped of ASC/DESC/NULLS FIRST|LAST decoration."""
    depth = 0
    in_str = None
    spans: list[int] = []
    i, n = 0, len(sql)
    upper = sql.upper()
    while i < n:
        c = sql[i]
        if in_str:
            if c == in_str:
                in_str = None
            i += 1
            continue
        if c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and upper.startswith("ORDER", i)
            and re.match(r"ORDER\s+BY\b", upper[i:])
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
        ):
            spans.append(i)
        i += 1
    if not spans:
        return None
    start = spans[-1]
    clause = sql[start:]
    clause = re.sub(r"(?is)^ORDER\s+BY", "", clause)
    # cut at a depth-0 LIMIT/OFFSET if present
    depth = 0
    in_str = None
    cut = len(clause)
    up = clause.upper()
    for j, c in enumerate(clause):
        if in_str:
            if c == in_str:
                in_str = None
            continue
        if c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and (re.match(r"LIMIT\b", up[j:]) or re.match(r"OFFSET\b", up[j:]))
            and (j == 0 or not (clause[j - 1].isalnum() or clause[j - 1] == "_"))
        ):
            cut = j
            break
    clause = clause[:cut]
    # split on depth-0 commas
    terms: list[str] = []
    buf: list[str] = []
    depth = 0
    in_str = None
    for c in clause:
        if in_str:
            buf.append(c)
            if c == in_str:
                in_str = None
            continue
        if c in ("'", '"'):
            in_str = c
            buf.append(c)
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            buf.append(c)
        elif c == "," and depth == 0:
            terms.append("".join(buf))
            buf = []
        else:
            buf.append(c)
    if buf:
        terms.append("".join(buf))
    out = []
    for t in terms:
        t = re.sub(r"(?is)\bNULLS\s+(FIRST|LAST)\s*$", "", t.strip()).strip()
        t = re.sub(r"(?is)\b(ASC|DESC)\s*$", "", t).strip()
        out.append(t)
    return out


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
