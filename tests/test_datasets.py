"""Dataset-assembly operators (operators/datasets.py): split stability,
exact stratification, packing bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from infinidb_spark.operators.datasets import (
    exact_stratified_split,
    hash_split,
    pack_sequences,
    pack_stats,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from infinidb_spark.session import load_tables

    return load_tables(spark, sf_dir, names=("documents",))["documents"]


def test_hash_split_proportions_and_coverage(docs):
    counts = dict(
        hash_split(docs, "doc_id", WEIGHTS)
        .groupBy("split")
        .count()
        .collect()
    )
    total = sum(counts.values())
    assert total == docs.count()  # every row labeled
    assert set(counts) == set(WEIGHTS)
    for label, w in WEIGHTS.items():
        assert abs(counts[label] / total - w) < 0.05  # LLN at sf size


def test_hash_split_is_recomputation_stable(docs):
    """A doc's split must not change when the rest of the corpus does."""
    full = hash_split(docs, "doc_id", WEIGHTS).select("doc_id", "split")
    half = hash_split(docs.filter("doc_id % 2 = 0"), "doc_id", WEIGHTS).select(
        "doc_id", F.col("split").alias("split_half")
    )
    moved = (
        full.join(half, "doc_id")
        .filter("split <> split_half")
        .count()
    )
    assert moved == 0


def test_hash_split_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.1})


def test_exact_stratified_split_proportions(docs):
    out = exact_stratified_split(docs, "doc_id", "lang", WEIGHTS)
    per = (
        out.groupBy("lang")
        .pivot("split", list(WEIGHTS))
        .count()
        .na.fill(0)
        .collect()
    )
    for row in per:
        n = sum(row[label] or 0 for label in WEIGHTS)
        # exact to within 1 row per boundary
        assert abs((row["train"] or 0) - round(0.8 * n)) <= 1
        assert abs((row["val"] or 0) - round(0.1 * n)) <= 1


def test_pack_sequences_bounds_and_order(spark):
    from infinidb_spark.operators import text as T

    budget = 100
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 40))) for i in range(500)],
        "doc_id bigint, text string",
    ).select("doc_id", T.token_count(F.col("text")).alias("n_tokens"))
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=budget, n_shards=4)
    stats = pack_stats(packed, "n_tokens", budget)
    max_doc = df.agg(F.max("n_tokens")).collect()[0][0]
    rows = stats.collect()
    # every bin stays under budget + one document
    assert all(r.tokens_total < budget + max_doc for r in rows)
    # all docs packed exactly once
    assert sum(r.n_docs for r in rows) == 500
    # bins are dense per shard: 0..max consecutive
    for shard in {r.shard for r in rows}:
        bins = sorted(r.bin_id for r in rows if r.shard == shard)
        assert bins == list(range(len(bins)))


def test_pack_sequences_oversized_doc_overflow_semantics(spark):
    """Streaming packing: an oversized doc OVERFLOWS its current bin
    (bound: < budget + max doc), and the doc after it skips ahead by
    the overflow — bin ids from the cum_before formula exactly."""
    df = spark.createDataFrame(
        [(1, 50), (2, 500), (3, 50)], "doc_id bigint, n_tokens bigint"
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=100, n_shards=1)
    rows = {r.doc_id: r.bin_id for r in packed.collect()}
    # cum_before: doc1=0 → bin 0; doc2=50 → bin 0; doc3=550 → bin 5
    assert rows == {1: 0, 2: 0, 3: 5}
    stats = {r.bin_id: r.tokens_total for r in pack_stats(packed, "n_tokens", 100).collect()}
    assert stats == {0: 550, 5: 50}
    assert stats[0] < 100 + 500  # the documented overflow bound


def test_mixture_sample_semantics(spark):
    from infinidb_spark.operators.datasets import mixture_sample

    df = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(900)], "doc_id bigint, source string"
    )
    mixed = mixture_sample(
        df, "source", {"src0": 2.5, "src1": 1.0, "src2": 0.0}, key_col="doc_id"
    )
    rows = mixed.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    # src2 fully dropped
    assert "src2" not in by_src
    # src1 kept exactly once, epoch always 0
    assert len(by_src["src1"]) == 300
    assert all(r.epoch == 0 for r in by_src["src1"])
    # src0: every doc appears 2 or 3 times; total ≈ 2.5×300 within hash noise
    from collections import Counter

    c = Counter(r.doc_id for r in by_src["src0"])
    assert set(c.values()) <= {2, 3}
    assert 600 <= len(by_src["src0"]) <= 900
    # epochs dense from 0 per doc
    for doc, n in c.items():
        eps = sorted(r.epoch for r in by_src["src0"] if r.doc_id == doc)
        assert eps == list(range(n))


def test_mixture_sample_deterministic_and_stable(spark):
    """A doc's fate depends only on its own key: re-running and
    dropping other rows never changes survivors (recomputation-stable,
    same property as hash_split)."""
    from infinidb_spark.operators.datasets import mixture_sample

    df = spark.createDataFrame(
        [(i, "a") for i in range(400)], "doc_id bigint, source string"
    )
    keep1 = {r.doc_id for r in mixture_sample(df, "source", {"a": 0.3}, "doc_id").collect()}
    keep2 = {r.doc_id for r in mixture_sample(df, "source", {"a": 0.3}, "doc_id").collect()}
    assert keep1 == keep2
    sub = df.filter(F.col("doc_id") < 200)
    keep_sub = {
        r.doc_id for r in mixture_sample(sub, "source", {"a": 0.3}, "doc_id").collect()
    }
    assert keep_sub == {k for k in keep1 if k < 200}


def test_mixture_sample_rejects_negative_weight(spark):
    from infinidb_spark.operators.datasets import mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, source string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {"a": -0.5}, "doc_id")


def test_stratified_split_large_stratum_no_overflow(spark):
    """(row_number-1)*10000 silently wrapped 32-bit past rank ~214,748,
    landing EVERY row of a 300k-row stratum in the first label
    (code-review r08) — the rank is now bigint before the multiply."""
    from infinidb_spark.operators.datasets import exact_stratified_split

    df = spark.range(300_000).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("src")
    )
    out = exact_stratified_split(
        df, "doc_id", "src", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    got = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert got == {"train": 240_000, "val": 30_000, "test": 30_000}


def test_pack_sequences_rejects_nonpositive_budget(spark):
    import pytest

    from infinidb_spark.operators.datasets import pack_sequences

    df = spark.range(3).selectExpr("id AS doc_id", "10 AS n_tokens")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "doc_id", "n_tokens", budget=0)


def test_stratified_split_deterministic_with_duplicate_keys(spark):
    """r10 review fix: distinct rows sharing (bucket, key) tied in the
    rank order, so a boundary tie could flip a row between splits
    across recomputations; the production path adds a full-row hash
    tie-break."""
    from infinidb_spark.operators.datasets import exact_stratified_split

    rows = [(None, "s", f"payload-{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "k string, st string, body string")
    a = exact_stratified_split(df, "k", "st", {"train": 0.8, "test": 0.2})
    b = exact_stratified_split(df, "k", "st", {"train": 0.8, "test": 0.2})
    ga = sorted((r.body, r.split) for r in a.collect())
    gb = sorted((r.body, r.split) for r in b.collect())
    assert ga == gb
    assert sum(1 for _, s in ga if s == "train") == 40
