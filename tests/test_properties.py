"""Property-based null/type semantics — the `nulltests.pl` analog
(SURVEY §5.2): for arbitrary values including NULLs, engine semantics
must agree with the DuckDB oracle (three-valued logic, null
propagation) and with themselves (partition laws).

Hypothesis generates value batches; each example runs ONE Spark job
over the whole batch (not per-value) to keep runtime sane.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_ints = st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1))
# printable ASCII only: Unicode case mapping (ß→SS etc.) legitimately
# differs between JVM and DuckDB locales — not a semantics bug
_strs = st.one_of(
    st.none(),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12),
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(rows=st.lists(st.tuples(_ints, _ints), min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_arithmetic_null_propagation_matches_duckdb(spark, rows):
    pdf = pd.DataFrame(rows, columns=["a", "b"]).astype("Int64")
    df = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None), "a long, b long")
    got = (
        df.select(
            (F.col("a") + F.col("b")).alias("add"),
            (F.col("a") * F.col("b")).alias("mul"),
            F.greatest("a", "b").alias("grt"),
            F.coalesce("a", "b", F.lit(0)).alias("coal"),
        )
        .toPandas()
        .astype("Float64")
    )
    want = (
        duckdb.sql(
            "SELECT a + b AS add, a * b AS mul, greatest(a, b) AS grt,"
            " coalesce(a, b, 0) AS coal FROM pdf"
        )
        .df()
        .astype("Float64")
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(rows=st.lists(st.tuples(_ints, _ints), min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_three_valued_logic_partitions_rows(spark, rows):
    """Every row lands in exactly one of: (a>b), NOT(a>b), NULL verdict —
    the WHERE-clause partition law MySQL/InfiniDB and Spark share."""
    pdf = pd.DataFrame(rows, columns=["a", "b"])
    df = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None), "a long, b long")
    cond = F.col("a") > F.col("b")
    n_true = df.filter(cond).count()
    n_false = df.filter(~cond).count()
    n_null = df.filter(cond.isNull()).count()
    assert n_true + n_false + n_null == len(rows)


@given(rows=st.lists(st.tuples(_strs, _strs), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_string_functions_match_duckdb(spark, rows):
    pdf = pd.DataFrame(rows, columns=["s", "t"])
    df = spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None), "s string, t string"
    )
    got = df.select(
        F.upper("s").alias("up"),
        F.length("s").cast("long").alias("ln"),
        F.concat("s", "t").alias("cat"),  # NULL-propagating, like the ref's concat
        F.substring("s", 2, 3).alias("sub"),
    ).toPandas()
    want = duckdb.sql(
        "SELECT upper(s) AS up, CAST(length(s) AS BIGINT) AS ln,"
        " s || t AS cat, substring(s, 2, 3) AS sub FROM pdf"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_split_statements_roundtrip_property():
    """Joining arbitrary ;-free statements with ';' and re-splitting
    recovers them (modulo whitespace) — and semicolons inside string
    literals never split."""
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    from infinidb_spark.dialect import split_statements

    word = hst.text(
        alphabet=hst.sampled_from(list("abcXY01_ ")), min_size=1, max_size=20
    ).filter(lambda s: s.strip())

    @given(hst.lists(word, min_size=1, max_size=6))
    @settings(max_examples=200, deadline=None)
    def check(parts):
        stmts = split_statements("; ".join(parts) + ";")
        assert stmts == [p.strip() for p in parts]

    check()
    assert split_statements("SELECT 'a; b'; SELECT 1") == ["SELECT 'a; b'", "SELECT 1"]


def test_bind_placeholders_property():
    """Binding replaces exactly the top-level '?' marks, positionally,
    and never touches '?' inside string literals."""
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    from infinidb_spark.dialect import DialectError, bind_placeholders

    import pytest as _pytest

    @given(hst.integers(min_value=0, max_value=6))
    @settings(max_examples=50, deadline=None)
    def check(n):
        sql = "SELECT " + " + ".join(["?"] * n) if n else "SELECT 1"
        params = [str(i) for i in range(n)]
        bound = bind_placeholders(sql, params)
        assert "?" not in bound
        for p in params:
            assert p in bound

    check()
    assert bind_placeholders("SELECT '?' , ?", ["7"]) == "SELECT '?' , 7"
    with _pytest.raises(DialectError):
        bind_placeholders("SELECT ?", [])


def test_sql_literal_quoting_property():
    """String literals escape quotes/backslashes so render→tokenize
    yields exactly one string token."""
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    from infinidb_spark.dialect import sql_literal, tokenize

    @given(hst.text(alphabet=hst.sampled_from(list("ab'\\\"`; -")), max_size=30))
    @settings(max_examples=200, deadline=None)
    def check(s):
        toks = [t for t in tokenize(sql_literal(s)) if t[0] != "ws"]
        assert len(toks) == 1 and toks[0][0] == "string"

    check()


def test_alter_grammar_roundtrip_property():
    """Property: any composed ALTER statement built from the supported
    action grammar parses into exactly the expected action dicts —
    random identifiers, types, and DEFAULT values (literals, negatives,
    strings, NULL, word literals, user specials) never crash the parser
    or mis-bind across comma-separated actions."""
    from hypothesis import given, settings
    from hypothesis import strategies as hst

    from infinidb_spark.dialect import parse_statement

    ident = hst.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,10}", fullmatch=True).filter(
        lambda s: s.upper() not in {
            "ADD", "DROP", "ALTER", "MODIFY", "CHANGE", "RENAME", "TO",
            "COLUMN", "SET", "DEFAULT", "NULL", "NOT", "TABLE", "ENGINE",
        }
    )
    typ = hst.sampled_from(["INT", "BIGINT", "DOUBLE", "VARCHAR(20)", "DATE"])
    dflt = hst.one_of(
        hst.integers(-999, 999).map(str),
        hst.floats(-10, 10, allow_nan=False).map(lambda f: f"{f:.3f}"),
        hst.sampled_from(["'x'", "NULL", "TRUE", "CURRENT_TIMESTAMP", "USER"]),
    )

    def expect_default(d: str):
        up = d.upper()
        if up == "NULL":
            return None
        if up == "USER":
            return "current_user()"
        if up in ("TRUE", "CURRENT_TIMESTAMP"):
            return up
        return d

    action = hst.one_of(
        hst.tuples(hst.just("add"), ident, typ, dflt),
        hst.tuples(hst.just("drop"), ident),
        hst.tuples(hst.just("rename_column"), ident, ident),
        hst.tuples(hst.just("set_default"), ident, dflt),
        hst.tuples(hst.just("drop_default"), ident),
    )

    @given(hst.lists(action, min_size=1, max_size=4))
    @settings(max_examples=150, deadline=None)
    def check(actions):
        parts, want = [], []
        for a in actions:
            if a[0] == "add":
                _, col, t, d = a
                parts.append(f"ADD COLUMN {col} {t} DEFAULT {d}")
                spark_t = {
                    "INT": "int", "BIGINT": "bigint", "DOUBLE": "double",
                    "VARCHAR(20)": "string", "DATE": "date",
                }[t]
                want.append({"op": "add", "column": col, "type": spark_t,
                             "default": expect_default(d)})
            elif a[0] == "drop":
                parts.append(f"DROP COLUMN {a[1]}")
                want.append({"op": "drop", "column": a[1]})
            elif a[0] == "rename_column":
                parts.append(f"RENAME COLUMN {a[1]} TO {a[2]}")
                want.append({"op": "rename_column", "old": a[1], "new": a[2]})
            elif a[0] == "set_default":
                _, col, d = a
                parts.append(f"ALTER COLUMN {col} SET DEFAULT {d}")
                dd = expect_default(d)
                if dd is None:
                    want.append({"op": "set_default", "column": col, "default": None})
                else:
                    want.append({"op": "set_default", "column": col, "default": dd})
            else:
                parts.append(f"ALTER {a[1]} DROP DEFAULT")
                want.append({"op": "drop_default", "column": a[1]})
        st = parse_statement("ALTER TABLE t " + ", ".join(parts))
        assert st["kind"] == "alter" and st["actions"] == want

    check()


def test_lcg_golden_sequences_pinned():
    """The shared LCG (functions/prng.py) feeds MinHash params, LSH
    planes, and JL signs; persisted signature stores and oracle-embedded
    plane literals depend on these sequences bit-for-bit, so a refactor
    must never change them."""
    from infinidb_spark.operators.dedup import _hash_params
    from infinidb_spark.operators.embeddings import projection_signs
    from infinidb_spark.operators.similarity import _lsh_planes

    assert _hash_params(2) == [
        (930818101715844099, 756733711409122640),
        (1424422031489206581, 2047395389979782426),
    ]
    assert [round(c, 12) for c in _lsh_planes(1, 3)[0]] == [
        -0.22834025123, -0.369085486375, 0.452483627839,
    ]
    assert projection_signs(1, 6)[0] == [-1.0, 1.0, 1.0, 1.0, -1.0, 1.0]


def test_embedding_null_element_guards(spark):
    """Ragged/corrupt vectors (NULL element) yield NULL, never
    max-magnitude garbage (quantize) or 1e12-scale 'unit' vectors
    (l2_normalize) — the null-skipping least/greatest folds were
    silently absorbing the NULL (code-review r08)."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.embeddings import (
        l2_normalize,
        quant_scale,
        quantize_int8,
    )

    df = spark.sql(
        "SELECT array(0.5D, CAST(NULL AS DOUBLE)) AS bad,"
        "       array(0.5D, -1.0D) AS good"
    )
    row = df.select(
        l2_normalize(F.col("bad")).alias("n_bad"),
        quant_scale(F.col("bad")).alias("s_bad"),
        quantize_int8(F.col("bad"), F.lit(0.01)).alias("q_bad"),
        l2_normalize(F.col("good")).alias("n_good"),
        quantize_int8(F.col("good"), quant_scale(F.col("good"))).alias("q_good"),
    ).collect()[0]
    assert row.n_bad is None and row.s_bad is None and row.q_bad is None
    assert row.n_good is not None and row.q_good == [64, -127]


def test_ivf_assign_null_cosine_is_null_cid(spark):
    """A vector that cannot be scored against the centroid model
    (dimension mismatch → NULL cosine) must get cid NULL, not silently
    land in the lowest centroid's posting list."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.similarity import ivf_best_expr

    cents = [(3, [1.0, 0.0]), (7, [0.0, 1.0])]
    df = spark.sql(
        "SELECT array(1.0D) AS short_vec, array(1.0D, 0.0D) AS ok_vec"
    )
    row = df.select(
        ivf_best_expr("`short_vec`", cents).alias("bad"),
        ivf_best_expr("`ok_vec`", cents).alias("ok"),
    ).collect()[0]
    assert row.bad.cid is None
    assert row.ok.cid == 3 and abs(row.ok.sim - 1.0) < 1e-9
