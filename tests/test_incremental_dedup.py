"""Incremental dedup: batch-vs-stored-corpus artifacts.

The at-scale operating mode: signatures/hashes persist between batches;
a new batch never re-reads corpus text (operators/dedup.py
minhash_signatures / minhash_lsh_pairs_incremental /
dedup_exact_incremental).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from infinidb_spark.operators import dedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def batch(spark):
    rows = [
        (10, "The quick  brown fox jumps over the lazy dog"),  # ≈ doc 1
        (11, "an entirely different document about spark sql engines"),
        (12, "an entirely different document about spark sql engines"),  # = 11
        (13, "Pack my box with five dozen liquor jugs"),  # = doc 2 (normalized)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_incremental_statuses(spark, corpus, batch):
    hashes = D.dedup_exact(corpus)
    out = {
        r.doc_id: r.status
        for r in D.dedup_exact_incremental(batch, hashes).collect()
    }
    # 13 normalizes to doc 2's content → corpus dup; 12 == 11 in-batch;
    # 10 differs from doc 1 only by case/whitespace → corpus dup too
    assert out == {
        10: "corpus_dup",
        11: "new",
        12: "batch_dup",
        13: "corpus_dup",
    }


def test_minhash_incremental_matches_store_roundtrip(spark, corpus, batch, tmp_path):
    sigs = D.minhash_signatures(corpus, n_hashes=16, shingle_k=5)
    # the store survives a parquet round trip (the persistence contract)
    path = str(tmp_path / "sig_store")
    sigs.write.parquet(path)
    stored = spark.read.parquet(path)
    direct = D.minhash_lsh_pairs_incremental(
        batch, sigs, n_hashes=16, bands=4, est_threshold=0.5
    ).collect()
    via_store = D.minhash_lsh_pairs_incremental(
        batch, stored, n_hashes=16, bands=4, est_threshold=0.5
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_store))
    pairs = {(r.id_a, r.id_b) for r in direct}
    # near-dup across batch/corpus found; identical in-batch pair found
    assert (1, 10) in pairs
    assert (11, 12) in pairs
    # old-vs-old pairs never emitted
    assert not any(a <= 3 and b <= 3 for a, b in pairs)


def test_minhash_incremental_estimates_bounded(spark, corpus, batch):
    rows = D.minhash_lsh_pairs_incremental(
        batch, D.minhash_signatures(corpus, n_hashes=16),
        n_hashes=16, bands=4, est_threshold=0.0,
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.jaccard_est <= 1.0
    # the identical pair estimates exactly 1.0
    exact = [r for r in rows if (r.id_a, r.id_b) == (11, 12)]
    assert exact and exact[0].jaccard_est == 1.0


# --- property: incremental ≡ batch, restricted to batch-touching pairs


def _gen_docs(spark, seed: int, n: int):
    """Deterministic word-soup corpus with planted near-dups."""
    import random

    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = []
    for i in range(n):
        base = " ".join(rng.choices(words, k=rng.randint(6, 14)))
        rows.append((i, base))
        if rng.random() < 0.4:  # planted near-dup of the doc
            mutated = base.replace(rng.choice(words), rng.choice(words), 1)
            rows.append((1000 + i, mutated))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_incremental_candidates_match_full_pipeline(spark, seed):
    """INVARIANT: with identical signature parameters, the incremental
    pipeline's candidate pairs (threshold 0) restricted to
    batch-touching pairs EQUAL the full pipeline's candidates
    restricted the same way — the signature store changes WHERE
    signatures come from, never WHAT they are."""
    docs = _gen_docs(spark, seed, 20)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    full = D.minhash_lsh_pairs(
        docs, n_hashes=16, bands=4, jaccard_threshold=0.0
    ).select("id_a", "id_b").collect()
    batch_ids = {r.doc_id for r in batch.collect()}
    full_touching = {
        (r.id_a, r.id_b)
        for r in full
        if r.id_a in batch_ids or r.id_b in batch_ids
    }

    incr = D.minhash_lsh_pairs_incremental(
        batch,
        D.minhash_signatures(corpus, n_hashes=16),
        n_hashes=16,
        bands=4,
        est_threshold=0.0,
    ).select("id_a", "id_b").collect()
    incr_pairs = {(r.id_a, r.id_b) for r in incr}
    assert incr_pairs == full_touching


@pytest.mark.parametrize("seed", [3, 11])
def test_exact_incremental_statuses_are_the_hash_truth(spark, seed):
    """INVARIANT (first-seen-wins, NOT min-id-wins: the corpus precedes
    the batch temporally): a batch doc is corpus_dup iff its hash is in
    the corpus store; else batch_dup iff a lower-id batch doc shares
    its hash; else new."""
    docs = _gen_docs(spark, seed, 15)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    out = D.dedup_exact_incremental(batch, D.dedup_exact(corpus)).collect()
    corpus_hashes = {
        r.content_hash
        for r in D.dedup_exact(corpus).select("content_hash").collect()
    }
    min_batch_id_per_hash: dict[str, int] = {}
    for r in out:
        min_batch_id_per_hash[r.content_hash] = min(
            min_batch_id_per_hash.get(r.content_hash, r.doc_id), r.doc_id
        )
    for r in out:
        if r.content_hash in corpus_hashes:
            expect = "corpus_dup"
        elif r.doc_id > min_batch_id_per_hash[r.content_hash]:
            expect = "batch_dup"
        else:
            expect = "new"
        assert r.status == expect, (r.doc_id, r.status, expect)


def test_minhash_signature_array_form_matches_store(spark):
    """The array-form minhash_signature must (a) stay inside int64 —
    the old 61-bit family overflowed the a*h product and emitted
    negative minima — and (b) produce the SAME signature as the
    exploded-rows minhash_signatures store for the same shingle
    hashes."""
    import pyspark.sql.functions as F

    from infinidb_spark.operators.dedup import (
        minhash_signature,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over"), (2, "pack my box with five dozen")],
        ["doc_id", "text"],
    )
    store = {
        r._id: list(r._sig)
        for r in minhash_signatures(docs, n_hashes=8).collect()
    }
    # rebuild the shingle-hash arrays the exploded pipeline hashes
    from infinidb_spark.operators.dedup import _shingle_hash_expr, normalize_text

    t = normalize_text(F.col("text"))
    n_pos = F.greatest(F.length(t) - 4, F.lit(1))
    arr = docs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.xxhash64(normalize_text(F.col("text")).substr(i, F.lit(5))),
        ).alias("_hs"),
    )
    got = {
        r.doc_id: list(r.sig)
        for r in arr.select(
            "doc_id", minhash_signature(F.col("_hs"), 8).alias("sig")
        ).collect()
    }
    assert got == store
    for sig in got.values():
        assert all(0 <= m < (1 << 31) for m in sig), sig


def test_keep_best_incremental_verdicts(spark):
    """The three verdicts on a hand-built scenario: a batch doc that
    beats a stored keeper displaces it; one that doesn't joins; one
    with no near-dup opens its own cluster; a doc bridging TWO stored
    clusters must beat the BETTER keeper.  Texts are built so minhash
    at est 0.5 links exactly the intended pairs."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.dedup import (
        keep_best_incremental,
        minhash_signatures,
    )

    base_a = "alpha beta gamma delta epsilon zeta eta theta " * 8
    base_b = "one two three four five six seven eight nine ten " * 8
    uniq = "completely different content with no overlap at all " * 8
    corpus = spark.createDataFrame(
        [(10, base_a), (20, base_b)], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [
            (101, base_a + " tail"),   # near-dup of 10
            (102, uniq),               # no near-dup anywhere
        ],
        "doc_id bigint, text string",
    )
    sigs = minhash_signatures(corpus, n_hashes=16, shingle_k=5, portable_hash=True)
    # stored state: 10 is keeper with LOW quality, 20 keeper high
    state = spark.createDataFrame(
        [(10, 10, 0.2, True), (20, 20, 0.9, True)],
        "id bigint, cluster_id bigint, quality double, is_keeper boolean",
    )
    # batch qualities injected as a column expression keyed by id
    q = (
        F.when(F.col("doc_id") == 101, 0.8)   # beats keeper 10 (0.2)
        .otherwise(F.lit(0.5))
    )
    out = {
        r.id: r
        for r in keep_best_incremental(
            batch, sigs, state, q,
            n_hashes=16, bands=4, est_threshold=0.5, portable_hash=True,
        ).collect()
    }
    assert out[101].status == "displaces", out[101]
    assert out[101].cluster_id == 10
    assert out[101].stored_keeper == 10  # the keeper to retire
    assert out[102].status == "new_cluster" and out[102].cluster_id == 102
    assert out[102].stored_keeper is None


def test_keep_best_incremental_joins_bridge_and_small_ids(spark):
    """'joins' when the batch doc does NOT beat the stored keeper; a
    batch doc BRIDGING two stored clusters must beat the BETTER keeper
    and report IT as stored_keeper; and a batch id SMALLER than the
    stored labels (so the component label is the batch id) still
    resolves the stored keeper to retire."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.dedup import (
        keep_best_incremental,
        minhash_signatures,
    )

    base_a = "alpha beta gamma delta epsilon zeta eta theta " * 8
    base_b = base_a + " coda one two three"   # near-dup of base_a
    corpus = spark.createDataFrame(
        [(10, base_a), (20, base_b)], "doc_id bigint, text string"
    )
    # stored state: TWO clusters (10 low-quality keeper, 20 high)
    state = spark.createDataFrame(
        [(10, 10, 0.2, True), (20, 20, 0.9, True)],
        "id bigint, cluster_id bigint, quality double, is_keeper boolean",
    )
    sigs = minhash_signatures(corpus, n_hashes=16, shingle_k=5, portable_hash=True)
    # batch doc 3: id SMALLER than both labels, near-dups BOTH clusters
    batch = spark.createDataFrame(
        [(3, base_a + " tail")], "doc_id bigint, text string"
    )
    for q, want_status in ((0.5, "joins"), (0.95, "displaces")):
        out = keep_best_incremental(
            batch, sigs, state, F.lit(q),
            n_hashes=16, bands=4, est_threshold=0.5, portable_hash=True,
        ).collect()
        assert len(out) == 1
        r = out[0]
        # bridged both stored clusters: label is the min node = batch id
        assert r.cluster_id == 3, r
        # the bar (and the keeper identity) is the BETTER keeper: 20
        assert r.stored_keeper == 20, r
        assert r.status == want_status, (q, r)
