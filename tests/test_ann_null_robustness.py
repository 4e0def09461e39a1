"""Regression pins for the ANN/clustering NULL-robustness review
findings: corrupt vectors (NULL element, NULL vector, ragged dims)
must degrade to NULL assignments or be skipped — never crash the
driver-side model build or silently pollute code 0 / bucket 0."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from infinidb_spark.operators import similarity as S


def _corpus(spark, with_nulls=True):
    rows = []
    for i in range(120):
        rows.append((i, [((i * 37 + j) % 13 - 6) / 6.0 for j in range(8)]))
    if with_nulls:
        rows[50] = (50, None)                      # stride seed is NULL
        v = rows[3][1][:]
        v[2] = None
        rows[3] = (3, v)                           # NULL element
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_train_ivf_centroids_skips_null_seeds(spark):
    df = _corpus(spark)
    model = S.train_ivf_centroids(df, stride=50, k_max=32)
    # vec_id 50 (NULL vector) is skipped, the other stride samples seed
    assert model and all(cid != 50 for cid, _ in model)
    assert all(all(x is not None for x in cv) for _, cv in model)


def test_kmeans_fit_predict_survives_corrupt_vectors(spark):
    df = _corpus(spark)
    out = S.kmeans_fit_predict(df, stride=40, iters=2)
    got = {r.vec_id: r.cluster_id for r in out.collect()}
    assert len(got) == 120
    # the corrupt vectors land in cluster NULL, everyone else is real
    assert got[3] is None and got[50] is None
    assert sum(1 for c in got.values() if c is not None) == 118


def test_pq_encode_null_element_yields_null_code(spark):
    from infinidb_spark.operators.embeddings import pq_fit_encode

    df = _corpus(spark)
    enc = pq_fit_encode(df, m=2, k=4, iters=2, stride=20)
    by = {(r.vec_id, r.subspace): r.code for r in enc.collect()}
    # vec 3's NULL element is in subspace 0 (dim 2 of 8, d0=4):
    # code NULL, not a silent code-0 assignment
    assert by[(3, 0)] is None
    # its other subspace is clean and encodes normally
    assert by[(3, 1)] is not None


def test_ann_batch_skips_null_queries(spark):
    corpus = _corpus(spark, with_nulls=False)
    queries = spark.createDataFrame(
        [(0, [0.1] * 8), (1, None)], "query_id long, embedding array<double>"
    )
    out = S.ann_ivf_topk_batch(corpus, queries, k=3, n_probe=2, stride=40)
    qids = {r.query_id for r in out.collect()}
    assert qids == {0}  # the NULL query is skipped, not a driver crash


def test_embedding_dedup_dim_inferred_from_nonnull_row(spark):
    rows = [(0, None)] + [
        (i, [((i * 37 + j) % 13 - 6) / 6.0 for j in range(8)])
        for i in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.embedding_dedup(df, threshold=0.99)
    # runs, and the bucketing is real (a dim=1 fallback would put every
    # vector in bucket 0 — the all-pairs degeneration)
    assert out.count() >= 39
