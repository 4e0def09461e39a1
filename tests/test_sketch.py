"""Count-min sketch (operators/sketch.py): over-estimate guarantee,
fixed size, exactness when buckets don't collide."""

from __future__ import annotations

from pyspark.sql import functions as F

from infinidb_spark.operators.sketch import cms_estimate, count_min_sketch

DEPTH, WIDTH = 4, 256


def _tokens(spark, sf_dir):
    from infinidb_spark.operators.text import tokens
    from infinidb_spark.session import load_tables

    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return docs.select(F.explode(tokens(F.col("text"))).alias("tok")).filter(
        F.col("tok") != ""
    )


def test_cms_never_underestimates(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    sketch = count_min_sketch(toks, "tok", DEPTH, WIDTH)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(sketch, exact, "tok", DEPTH, WIDTH)
    joined = exact.join(est, "tok")
    assert joined.filter(F.col("est_n") < F.col("exact_n")).count() == 0
    # the guarantee is tight for heavy hitters: the top token estimates
    # within εN of truth (ε = e/width)
    top = joined.orderBy(F.desc("exact_n")).first()
    n_total = toks.count()
    assert top.est_n - top.exact_n <= (2.72 / WIDTH) * n_total * DEPTH


def test_cms_fixed_size_and_mass(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    sketch = count_min_sketch(toks, "tok", DEPTH, WIDTH).collect()
    assert len(sketch) <= DEPTH * WIDTH
    n = len(toks.collect())
    # every row of the matrix holds the full stream mass
    for j in range(DEPTH):
        assert sum(r.counter for r in sketch if r.j == j) == n


def test_cms_weighted_build_matches_raw_stream(spark, sf_dir):
    """r11 optimization: building the sketch from pre-aggregated
    (key, n) rows with weight_col must produce the identical counter
    matrix as the raw-stream build — integer-sum re-association."""
    toks = _tokens(spark, sf_dir)
    raw = count_min_sketch(toks, "tok", DEPTH, WIDTH, portable=True).collect()
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    weighted = count_min_sketch(
        counts, "tok", DEPTH, WIDTH, portable=True, weight_col="n"
    ).collect()
    as_map = lambda rows: {(r.j, r.bucket): r.counter for r in rows}
    assert as_map(raw) == as_map(weighted)
    assert {tuple(r)[3:] for r in weighted} == {(DEPTH, WIDTH, True)}


def test_cms_weighted_null_weight_counts_zero(spark):
    """r12 advice fix: sum() SKIPS nulls, so a bucket whose weights were
    all NULL used to yield a NULL counter (the unweighted build always
    produces a number) and cms_estimate's min over it misbehaved; NULL
    weights now coalesce to 0."""
    df = spark.createDataFrame(
        [("a", 3), ("a", None), ("b", None)], "k string, n int"
    )
    sketch = count_min_sketch(df, "k", depth=4, width=4096, weight_col="n")
    rows = sketch.collect()
    assert all(r.counter is not None for r in rows)
    est = {
        r.k: r.est_n
        for r in cms_estimate(
            sketch, df.select("k").distinct(), "k", 4, 4096
        ).collect()
    }
    assert est == {"a": 3, "b": 0}


def test_cms_exact_without_collisions(spark):
    df = spark.createDataFrame([("a",), ("a",), ("a",), ("b",), ("b",), ("c",)], "k string")
    sketch = count_min_sketch(df, "k", depth=4, width=4096)
    est = {
        r.k: r.est_n
        for r in cms_estimate(sketch, df.select("k").distinct(), "k", 4, 4096).collect()
    }
    assert est == {"a": 3, "b": 2, "c": 1}
    # an unseen key probes empty buckets (or small collisions) — with a
    # wide sketch and 3 distinct keys, it must estimate 0
    probe = spark.createDataFrame([("zzz",)], "k string")
    assert cms_estimate(sketch, probe, "k", 4, 4096).collect()[0].est_n == 0


def test_cms_builds_incrementally_on_stream(spark, sf_dir):
    """The sketch is a plain groupBy aggregation, so Structured
    Streaming incrementalizes it for free — the streaming heavy-hitter
    path (complete mode; state = the fixed d×w matrix, never the keys)."""
    import os
    import shutil
    import tempfile

    from infinidb_spark.session import load_tables
    from infinidb_spark.streaming.events import events_stream_from_directory

    events = load_tables(spark, sf_dir, names=("events",))["events"].limit(2000)
    workdir = tempfile.mkdtemp(prefix="infinidb_cms_stream_")
    in_dir = os.path.join(workdir, "in")
    try:
        events.repartition(4).write.parquet(in_dir)
        stream = events_stream_from_directory(spark, in_dir, max_files_per_trigger=1)
        q = (
            count_min_sketch(stream, "event_type", DEPTH, WIDTH)
            .writeStream.format("memory")
            .queryName("cms_stream")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.j, r.bucket): r.counter
            for r in spark.sql("select * from cms_stream").collect()
        }
        want = {
            (r.j, r.bucket): r.counter
            for r in count_min_sketch(events, "event_type", DEPTH, WIDTH).collect()
        }
        assert got == want  # stream converges to the batch sketch exactly
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_cms_estimate_parameter_mismatch_raises(spark):
    """Probing with different depth/width/portable than the build
    computes different buckets and silently estimates ~0 for every key
    (inverting the over-estimate guarantee) — a mismatch now raises,
    and omitted parameters default to the sketch's own metadata."""
    import pytest

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    sketch = count_min_sketch(df, "k", depth=4, width=512, portable=True)
    with pytest.raises(ValueError, match="width"):
        cms_estimate(sketch, df, "k", width=1024)
    with pytest.raises(ValueError, match="portable"):
        cms_estimate(sketch, df, "k", portable=False)
    est = {r.k: r.est_n for r in cms_estimate(sketch, df, "k").collect()}
    assert est == {"a": 1, "b": 1}
    # ALL THREE explicit skips the metadata read entirely (the first()
    # action executed the whole sketch aggregation once and the join
    # recomputed it — build cost paid twice); matching params still
    # estimate correctly, and consistency is the caller's contract
    est = {
        r.k: r.est_n
        for r in cms_estimate(
            sketch, df, "k", depth=4, width=512, portable=True
        ).collect()
    }
    assert est == {"a": 1, "b": 1}


def test_cms_estimate_zero_row_sketch_estimates_zero(spark):
    """A sketch built from an EMPTY corpus has zero rows, so first()
    yields no carried metadata — every key must estimate to 0 (all
    counters are zero whatever the probe parameters), not raise
    'carries no build metadata' when parameters were defaulted."""
    empty = spark.createDataFrame([], "k string")
    keys = spark.createDataFrame([("a",), ("b",)], "k string")
    sketch = count_min_sketch(empty, "k", depth=4, width=512, portable=True)
    est = {r.k: r.est_n for r in cms_estimate(sketch, keys, "k").collect()}
    assert est == {"a": 0, "b": 0}
    # explicit params over an empty sketch also estimate 0
    est2 = {
        r.k: r.est_n
        for r in cms_estimate(
            sketch, keys, "k", depth=4, width=512, portable=True
        ).collect()
    }
    assert est2 == {"a": 0, "b": 0}


def test_cms_null_keys_never_underestimate(spark):
    """r10 review fix: NULL keys hash through a sentinel — concat's
    null-propagation used to count them into a bucket=NULL row that the
    estimate probe could never match, returning 0 for a real frequency
    (inverting the over-estimate guarantee)."""
    from infinidb_spark.operators.sketch import cms_estimate, count_min_sketch

    df = spark.createDataFrame(
        [(None,), (None,), (None,), ("a",)], "k string"
    )
    sk = count_min_sketch(df, "k", depth=3, width=64)
    keys = spark.createDataFrame([(None,), ("a",)], "k string")
    est = {r.k: r.est_n for r in cms_estimate(sk, keys, "k").collect()}
    assert est[None] >= 3
    assert est["a"] >= 1
