"""Embedding operators: normalization, int8 quantization, error bounds."""

import math

import pyspark.sql.functions as F
import pytest

from infinidb_spark.operators import embeddings as E


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 2.0, -3.0, 0.5]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # degenerate: all-zero
        (3, [-0.001, 0.002, 0.003, -0.004]),  # tiny magnitudes
        (4, [100.0, -127.0, 50.0, 0.0]),  # larger range
    ]
    return spark.createDataFrame(rows, "id long, v array<double>")


def test_l2_normalize_unit_norm(vecs):
    out = vecs.select("id", E.l2_norm(E.l2_normalize(F.col("v"))).alias("n")).collect()
    by_id = {r["id"]: r["n"] for r in out}
    for i in (1, 3, 4):
        assert abs(by_id[i] - 1.0) < 1e-12
    assert by_id[2] == 0.0  # zero vector stays zero, no NaN


def test_quantize_codes_in_range_and_error_bound(vecs):
    rows = (
        vecs.withColumn("scale", E.quant_scale(F.col("v")))
        .withColumn("q", E.quantize_int8(F.col("v"), F.col("scale")))
        .withColumn("deq", E.dequantize(F.col("q"), F.col("scale")))
        .withColumn("err", E.quant_abs_errors(F.col("v"), F.col("scale")))
        .collect()
    )
    for r in rows:
        assert all(-127 <= c <= 127 for c in r["q"])
        # reconstruction error of symmetric round-to-nearest is <= s/2
        assert max(r["err"]) <= r["scale"] / 2 + 1e-15
        # err expression must equal |v - dequant| computed explicitly
        for v, d, e in zip(r["v"], r["deq"], r["err"]):
            assert abs(abs(v - d) - e) < 1e-15


def test_quantization_is_exact_for_representable_values(spark):
    # multiples of max/127 quantize losslessly
    m = 127.0
    df = spark.createDataFrame([(1, [0.0, 1.0, -1.0, m, -m])], "id long, v array<double>")
    r = (
        df.withColumn("s", E.quant_scale(F.col("v")))
        .select(E.quant_abs_errors(F.col("v"), F.col("s")).alias("err"))
        .collect()[0]
    )
    assert max(r["err"]) < 1e-12


def test_quant_scale_matches_python(vecs):
    rows = vecs.withColumn("s", E.quant_scale(F.col("v"))).collect()
    for r in rows:
        expect = max(max(abs(x) for x in r["v"]), 1e-12) / 127.0
        assert math.isclose(r["s"], expect, rel_tol=1e-12)


def test_pq_fit_encode_contract(spark, sf_dir):
    """PQ: every vector gets exactly m codes, codes stay in [0, k),
    err2 is nonnegative, and re-running reproduces the identical
    encoding (the determinism contract the oracle relies on)."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.embeddings import pq_fit_encode
    from infinidb_spark.session import load_tables

    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    sub = emb.filter(F.col("vec_id") < 400)
    enc = pq_fit_encode(sub)
    rows = enc.collect()
    n_vecs = sub.count()
    assert len(rows) == n_vecs * 8
    assert all(0 <= r.code < 8 and r.err2 >= 0 for r in rows)
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r.vec_id, set()).add(r.subspace)
    assert all(s == set(range(8)) for s in per_vec.values())
    # determinism: identical second run
    again = sorted(map(tuple, pq_fit_encode(sub).collect()))
    assert again == sorted(map(tuple, rows))


def test_pq_rejects_bad_shapes(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from infinidb_spark.operators.embeddings import pq_fit_encode
    from infinidb_spark.session import load_tables

    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit_encode(emb.filter(F.col("vec_id") < 400), m=7)
    with pytest.raises(ValueError, match="seed vectors"):
        pq_fit_encode(emb.filter(F.col("vec_id") < 100))  # only 2 stride samples


def test_ann_ivfpq_topk_serving_contract(spark, sf_dir):
    """IVF+PQ ADC serving: k results, ascending approx distance,
    deterministic across runs, and the ADC ranking finds a meaningful
    share of the exact IVF-Flat top-k (recall sanity — PQ is lossy but
    not random)."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.embeddings import ann_ivfpq_topk
    from infinidb_spark.operators.similarity import ann_ivf_topk
    from infinidb_spark.plans.pipeline import _QUERY_VEC
    from infinidb_spark.session import load_tables

    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    got = ann_ivfpq_topk(emb, _QUERY_VEC, k=10, n_probe=2, stride=50).collect()
    assert len(got) == 10
    d = [r.approx_d2 for r in got]
    assert d == sorted(d) and all(x >= 0 for x in d)
    again = ann_ivfpq_topk(emb, _QUERY_VEC, k=10, n_probe=2, stride=50).collect()
    assert list(map(tuple, again)) == list(map(tuple, got))
    exact = {
        r.vec_id
        for r in ann_ivf_topk(emb, _QUERY_VEC, k=10, n_probe=2, stride=50).collect()
    }
    overlap = len(exact & {r.vec_id for r in got})
    assert overlap >= 3, f"ADC recall collapsed: {overlap}/10 vs IVF-Flat"


def test_semantic_dedup_contract(spark, sf_dir):
    """SemDeDup invariants: one row per input vector, representatives
    have lower ids than their duplicates, reps and dups agree, every
    dup shares a cluster with its representative, and a re-run is
    bit-identical (deterministic k-means contract)."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.similarity import semantic_dedup
    from infinidb_spark.session import load_tables

    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    sub = emb.filter(F.col("vec_id") < 200)
    out = semantic_dedup(sub, threshold=0.3).collect()
    assert len(out) == sub.count()
    by_id = {r.vec_id: r for r in out}
    n_dups = 0
    for r in out:
        if r.is_dup:
            n_dups += 1
            assert r.rep_id < r.vec_id
            assert by_id[r.rep_id].cluster_id == r.cluster_id
        else:
            assert r.rep_id == r.vec_id
    assert n_dups > 0, "threshold produced no duplicates — not exercised"
    again = semantic_dedup(sub, threshold=0.3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_semantic_dedup_incremental_contract(spark, sf_dir):
    """Incremental SemDeDup: one row per batch vector only (stored docs
    are never re-emitted), reps precede their dups and share a cluster,
    a batch-vs-empty-corpus run degrades to new-vs-new, and re-runs are
    bit-identical."""
    from pyspark.sql import functions as F

    from infinidb_spark.operators.similarity import (
        ivf_assign_expr,
        semantic_dedup_incremental,
        train_ivf_centroids,
    )
    from infinidb_spark.session import load_tables

    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    corpus = emb.filter(F.col("vec_id") < 150)
    batch = emb.filter((F.col("vec_id") >= 150) & (F.col("vec_id") < 200))
    cents = train_ivf_centroids(corpus, stride=50)
    vec = F.col("embedding").cast("array<double>")
    index = corpus.select(
        "vec_id",
        vec.alias("embedding"),
        ivf_assign_expr("CAST(`embedding` AS ARRAY<DOUBLE>)", cents).alias("cid"),
    )
    out = semantic_dedup_incremental(batch, index, cents, threshold=0.3).collect()
    assert len(out) == batch.count()
    assert all(150 <= r.vec_id < 200 for r in out)
    for r in out:
        if r.is_dup:
            assert r.rep_id < r.vec_id
        else:
            assert r.rep_id == r.vec_id
    assert any(r.is_dup and r.rep_id < 150 for r in out), "no corpus-rep dup found"
    again = semantic_dedup_incremental(batch, index, cents, threshold=0.3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))

    empty_index = index.limit(0)
    solo = semantic_dedup_incremental(batch, empty_index, cents, threshold=0.3).collect()
    assert len(solo) == batch.count()
    for r in solo:
        if r.is_dup:
            assert 150 <= r.rep_id < r.vec_id  # new-vs-new only


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL sanity: the 64→8 sign projection preserves pairwise squared
    distances within a loose distortion band on real vectors (the
    guarantee that makes project-then-rerank a valid ANN candidate
    generator), and the matrix is seed-deterministic."""
    import math

    from pyspark.sql import functions as F

    from infinidb_spark.operators.embeddings import (
        projection_signs,
        random_projection,
    )

    assert projection_signs(4, 8) == projection_signs(4, 8)
    assert projection_signs(4, 8) != projection_signs(4, 8, seed=7)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 40
    )
    rows = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        random_projection(F.col("embedding"), out_dim=8, in_dim=64).alias("p"),
    ).collect()
    by_id = {r.vec_id: r for r in rows}
    ids = sorted(by_id)
    ratios = []
    for a, b in zip(ids[:-1], ids[1:]):
        d_full = sum((x - y) ** 2 for x, y in zip(by_id[a].v, by_id[b].v))
        d_proj = sum((x - y) ** 2 for x, y in zip(by_id[a].p, by_id[b].p))
        if d_full > 1e-9:
            ratios.append(d_proj / d_full)
    # individual pairs vary (k=8 is small); the MEAN ratio must sit
    # near 1 (unbiasedness of the sign projection estimator)
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.4, mean
    assert all(r > 0.05 for r in ratios), min(ratios)
