"""Mimic the driver's correctness gate: run a registered Spark query and
its DuckDB oracle on the same parquet tables, compare row count, schema
(column names), order-insensitive values, AND Arrow dtype compatibility.

The dtype check exists because the driver's value hash is type-sensitive:
r04 had four queries with repr-identical values that hash-FAILED purely
because DuckDB ``sum(int)`` returns HUGEINT → decimal128 while Spark
returns int64.  The old compare() stringified values and never saw it.
"""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa

from infinidb_spark.session import TPCH_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written table: a DIRECTORY of part files (the sf1
            # layout from scripts/make_sf1.py); glob the parts
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # tolerate last-bit drift between engines
        return round(v, 9) + 0.0
    if isinstance(v, int):
        return v
    return str(v)


def _canon_arrow_type(t: pa.DataType) -> str:
    """Canonical name for an Arrow dtype — strict enough that int64 vs
    decimal128 (the r04 driver-hash failure class) differs, loose enough
    that representation variants (large_string, timestamp units) don't."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        # width-insensitive: the driver hash passed r04 queries with
        # spark int32 vs duck int64 (text_quality) — only the int-vs-
        # decimal128 class fails.
        return "int"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        # tz-aware vs zoneless MUST differ: the r08 mysql_dialect_cast
        # driver-hash red was Spark timestamp[us, tz=UTC] vs DuckDB
        # timestamp[us] with every value identical — the old shared
        # "timestamp" canon made the mirror structurally blind to it
        return "timestamp_ltz" if t.tz is not None else "timestamp_ntz"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{_canon_arrow_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def _canon_spark_type(t) -> str:
    """Same canonical space, from a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, T.FloatType):
        return "float32"
    if isinstance(t, T.DoubleType):
        return "float64"
    if isinstance(t, T.DecimalType):
        return f"decimal({t.precision},{t.scale})"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.TimestampType):
        # Spark's toArrow() serializes TimestampType as
        # timestamp[us, tz=UTC] and TimestampNTZType as timestamp[us] —
        # mirror that split (see _canon_arrow_type)
        return "timestamp_ltz"
    if isinstance(t, T.TimestampNTZType):
        return "timestamp_ntz"
    if isinstance(t, T.ArrayType):
        return f"list<{_canon_spark_type(t.elementType)}>"
    if isinstance(t, T.StructType):
        inner = ",".join(
            f"{f.name}:{_canon_spark_type(f.dataType)}" for f in t.fields
        )
        return f"struct<{inner}>"
    return t.simpleString()


def top_level_order_by(sql: str) -> list[str] | None:
    """Return the column terms of the LAST paren-depth-0 ORDER BY, or
    None if the statement has no top-level ORDER BY.  Terms are
    stripped of ASC/DESC/NULLS FIRST|LAST decoration.  (Shared with
    scripts/audit_oracles.py, which uses the terms to prove the order
    total; compare() only needs presence.)"""
    import re

    # strip -- and /* */ comments first: a comment whose prose contains
    # the words "ORDER BY" at depth 0 flipped compare() into
    # order-sensitive mode (caught live on window_agg_frame's r11
    # tiebreak comment)
    sql = re.sub(r"--[^\n]*", " ", sql)
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.S)
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


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sp_rows = spark_df.collect()
    sp_cols = list(spark_df.columns)
    # one execution for dtypes (arrow), one for values (python objects,
    # same canon path as before) — oracles are pure SELECTs, so rerun is
    # safe and keeps _canon behavior unchanged.
    arrow = con.execute(sql).fetch_arrow_table()
    duck = con.execute(sql)
    du_cols = [d[0] for d in duck.description]
    du_rows = duck.fetchall()

    if sorted(sp_cols) != sorted(du_cols):
        return False, f"schema mismatch: spark={sorted(sp_cols)} duck={sorted(du_cols)}"

    sp_types = {f.name: _canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    du_types = {
        arrow.schema.field(i).name: _canon_arrow_type(arrow.schema.field(i).type)
        for i in range(len(arrow.schema))
    }
    type_diffs = [
        f"{c}: spark={sp_types[c]} duck={du_types[c]}"
        for c in sp_cols
        if sp_types[c] != du_types[c]
    ]
    if type_diffs:
        return False, "dtype mismatch (driver hash is type-sensitive): " + "; ".join(
            type_diffs
        )

    # Arrow-nullability parity (VERDICT r09 #1c) — DIAGNOSTIC, not a
    # failure: hash-green counterexamples exist (mysql_dialect_query's
    # n_orders is Spark not-null vs DuckDB nullable and attested green
    # r06/r09), so field nullability is provably NOT a driver-hash
    # channel.  Reported so the mirror can still SEE the last
    # schema-level divergence class when triaging a red row.
    sp_null = {f.name: f.nullable for f in spark_df.schema.fields}
    du_null = {
        arrow.schema.field(i).name: arrow.schema.field(i).nullable
        for i in range(len(arrow.schema))
    }
    null_diffs = [
        f"{c}(spark={'null' if sp_null[c] else 'not null'})"
        for c in sp_cols
        if sp_null[c] != du_null[c]
    ]
    null_note = (
        f" [nullability diff, diagnostic: {', '.join(null_diffs)}]"
        if null_diffs
        else ""
    )

    if len(sp_rows) != len(du_rows):
        return False, f"row count mismatch: spark={len(sp_rows)} duck={len(du_rows)}"

    order = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
    du_order = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
    sp_set = [tuple(_canon(r[sp_cols[i]]) for i in order) for r in sp_rows]
    du_set = [tuple(_canon(r[i]) for i in du_order) for r in du_rows]
    if top_level_order_by(sql) is None:
        # no ORDER BY → any permutation is acceptable: sort both sides
        sp_set = sorted(sp_set, key=repr)
        du_set = sorted(du_set, key=repr)
    # else: the driver's value hash is ROW-ORDER-sensitive and both
    # engines must emit the ordered result identically — compare in
    # fetched order (the r07/r08 mysql_dialect_cast lesson: the old
    # unconditional sort hid order-channel divergence from the mirror)
    if sp_set != du_set:
        diff = [(a, b) for a, b in zip(sp_set, du_set) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok" + null_note
