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
