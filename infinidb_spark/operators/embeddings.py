"""Embedding-vector operators for training/serving pipelines:
L2 normalization, symmetric int8 quantization, quantization-error
auditing, and product quantization (PQ) with IVF+PQ ADC serving.

Storage-side vector ops the reference never had (its DECIMAL columns
stop at scalars — ``dbcon/execplan/simplecolumn_decimal.h``) but a
100 TB embedding corpus needs: int8 quantization cuts a float32 vector
store 4× (the difference between an ANN index fitting in executor
memory or spilling), and the error audit is the gate that decides
whether the quantized store is servable.

Scale design: every operator here is a per-row Column expression —
map-only, zero shuffle, pipelined into whatever scan/join carries the
vectors.  Arithmetic is kept IEEE-deterministic (``floor(x/s + 0.5)``
instead of engine-specific ``round``) so results are bit-identical
across engines — the DuckDB oracle reproduces the full pipeline.

On expression choice: these use higher-order array lambdas
(``transform``/``aggregate``), which Spark evaluates interpreted
(outside whole-stage codegen).  For O(dim)-per-row elementwise math
that constant factor is acceptable and keeps the operator pure-SQL
(oracle-checkable); compute-heavy array work (MinHash) instead uses the
exploded-rows formulation — see operators/dedup.py for that pattern and
the measured 10× rationale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from infinidb_spark.functions.prng import lcg_next
from infinidb_spark.operators.dedup import fan_out

#: guard against all-zero vectors — scale never reaches 0 so x/scale
#: stays finite; 1e-12 is far below any real float32 embedding range.
_EPS = 1e-12


def _d(vec: Column) -> Column:
    return vec.cast("array<double>")


def _null_if_ragged(v: Column, out: Column) -> Column:
    """NULL result when the vector is NULL or has a NULL element.

    The folds below are built from least/greatest/aggregate, all of
    which silently SKIP nulls — a single corrupt element would
    otherwise come out as max-magnitude garbage (e.g. the int8 clamp
    turned floor(NULL)+clamp into code 127, and l2_normalize turned a
    NULL norm into a 1e12-scale 'unit' vector).  Corrupt input yields
    NULL, which downstream joins/filters drop visibly."""
    return F.when(
        v.isNull() | F.exists(v, lambda x: x.isNull()), F.lit(None)
    ).otherwise(out)


def l2_norm(vec: Column) -> Column:
    """Euclidean norm of a float vector (double precision)."""
    v = _d(vec)
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize a vector; all-zero vectors pass through unchanged
    (norm clamped to eps keeps 0/eps = 0); NULL-element vectors → NULL."""
    v = _d(vec)
    n = F.greatest(l2_norm(v), F.lit(_EPS))
    return _null_if_ragged(v, F.transform(v, lambda x: x / n))


def quant_scale(vec: Column) -> Column:
    """Symmetric per-vector int8 scale: max|x| / 127, clamped to eps;
    NULL-element vectors → NULL."""
    v = _d(vec)
    amax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    return _null_if_ragged(v, F.greatest(amax, F.lit(_EPS)) / F.lit(127.0))


def quantize_int8(vec: Column, scale: Column) -> Column:
    """Symmetric int8 code array: floor(x/scale + 0.5) in [-127, 127].

    ``floor(x + 0.5)`` (round-half-up) instead of ``round`` because
    engines disagree on round-half semantics for doubles; floor is IEEE
    and reproduces bit-identically everywhere.  max|x|/127 scaling means
    the un-clamped code already lies in [-127, 127]; the clamp guards
    the x == -max edge where floor(-127 + 0.5) = -127 exactly.
    NULL-element vectors → NULL (the clamp would otherwise silently
    turn a NULL element into code 127)."""
    v = _d(vec)
    code = F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)))
    return _null_if_ragged(
        v,
        F.transform(
            code,
            lambda c: F.greatest(F.least(c, F.lit(127)), F.lit(-127)).cast("int"),
        ),
    )


def dequantize(codes: Column, scale: Column) -> Column:
    """Reconstruct doubles from int8 codes: code * scale."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def quant_abs_errors(vec: Column, scale: Column) -> Column:
    """Per-element |x - dequant(quant(x))| without materializing codes:
    err_i = |x_i - floor(x_i/s + 0.5) * s| — one fused expression both
    engines compute identically (max possible value: s/2)."""
    v = _d(vec)
    return F.transform(v, lambda x: F.abs(x - F.floor(x / scale + F.lit(0.5)) * scale))


def projection_signs(
    out_dim: int, in_dim: int, seed: int = 0x9E3779B9
) -> list[list[float]]:
    """Deterministic ±1 sign matrix for JL random projection (Achlioptas
    sign construction) — same LCG discipline as dedup._hash_params, so
    executor, driver, and DuckDB oracle share one matrix by SEED, never
    by shipping state."""
    rows: list[list[float]] = []
    state = seed
    for _ in range(out_dim):
        row: list[float] = []
        for _ in range(in_dim):
            state = lcg_next(state)
            row.append(1.0 if (state >> 32) & 1 else -1.0)
        rows.append(row)
    return rows


def random_projection(
    vec: Column, out_dim: int, in_dim: int, seed: int = 0x9E3779B9
) -> Column:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims —
    the train-free dimensionality cut: JL bounds pairwise-distance
    distortion, so the sketch serves distance-based PREFILTERS (near-
    dup candidate generation, coarse clustering, dedup bucketing).
    Candidate-recall for top-k SERVING is corpus-dependent — on
    corpora with thin neighbor margins (tiny cosine gaps between rank
    5 and rank 50, like the synthetic test embeddings) a k=8..24
    sketch cannot separate the head, and the trained IVF path
    (similarity.py / ann_ivfpq) is the candidate generator of choice;
    measured here: recall@5 ≈ 0.5 at n_cand 10% — use accordingly.

    Map-only per-row expression like everything in this module: the
    sign matrix is ONE parsed literal (no per-cell py4j traffic — see
    the MinHash F.expr lesson, operators/dedup.py), the projection a
    transform/zip_with fold, scaled 1/sqrt(out_dim).  Left-fold order
    and sign-by-multiplication are IEEE-identical to the oracle's
    ``± e[i]`` term chain, so results are bit-reproducible."""
    import math

    v = _d(vec)
    rows = projection_signs(out_dim, in_dim, seed)
    m = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{x:.1f}D" for x in row) + ")" for row in rows
        )
        + ")"
    )
    inv = 1.0 / math.sqrt(out_dim)
    return F.transform(
        m,
        lambda r: F.aggregate(
            F.zip_with(r, v, lambda s, x: s * x), F.lit(0.0), lambda a, b: a + b
        )
        * F.lit(inv),
    )


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 8,
    iters: int = 2,
    stride: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[tuple[int, list[float]]]]:
    """Train product-quantization codebooks: per-subspace Euclidean
    Lloyd clustering, ``codebooks[s] = [(code, [D/m floats])]``.

    Deterministic by construction (the kmeans_fit_predict contract, so
    any engine replays it exactly): seeds are the stride-sampled
    vectors' subvectors (``id % stride == 0``, first ``k`` by id);
    squared distances are summed dim-by-dim left-to-right and rounded
    to 9 dp before the argmin with ties to the lowest code; centroid
    dim-means are rounded to 9 dp; ``iters`` is fixed.

    Scale shape: each Lloyd update explodes vector dims into rows and
    runs ONE codegen'd groupBy(subspace, code, dim) average whose
    m×k×(D/m) = k×D result is the bounded model collect — identical
    contract to train_ivf_centroids.

    Shared caveat with kmeans_fit_predict: the dim-mean is a float
    average whose summation order varies across shuffle runs, so a mean
    landing within 1 ulp of a 9-dp rounding boundary could round
    differently between engines/reruns.  The 9-dp pin makes this
    astronomically unlikely (and it has held across every gate run);
    a boundary hit would shift one centroid, not corrupt the plan."""
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    seed_rows = (
        base.filter(
            ((F.col(id_col) % stride) == 0)
            # a NULL vector/element cannot seed a sub-centroid —
            # float(None) would kill the training collect driver-side
            # (same guard as train_ivf_centroids)
            & F.col("_v").isNotNull()
            & ~F.exists("_v", lambda x: x.isNull())
        )
        .orderBy(id_col)
        .limit(k)
        .collect()  # bounded: k vectors — the training sample
    )
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} stride-sampled seed vectors, got {len(seed_rows)}")
    dim = len(seed_rows[0]["_v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d0 = dim // m
    codebooks = [
        [(c, [float(x) for x in r["_v"][s * d0 : (s + 1) * d0]])
         for c, r in enumerate(seed_rows)]
        for s in range(m)
    ]

    # the Lloyd assignment evaluates m interpreted argmin trees (k×d0
    # literal distances each) per row — compute-dense, so a small corpus
    # must not ride its 1–2 scan partitions (fan_out no-ops at scale)
    wide = fan_out(base)
    for _ in range(max(iters - 1, 0)):
        assigned = wide.select(
            F.col(id_col),
            "_v",
            *[pq_best_expr(codebooks, s, d0)["c"].alias(f"_c{s}") for s in range(m)],
        )
        longd = assigned.select(
            F.posexplode("_v").alias("_p", "_x"),
            *[F.col(f"_c{s}") for s in range(m)],
        ).select(
            (F.col("_p") / d0).cast("int").alias("_s"),
            (F.col("_p") % d0).alias("_dd"),
            F.element_at(
                F.array(*[F.col(f"_c{s}") for s in range(m)]),
                (F.col("_p") / d0).cast("int") + 1,
            ).alias("_code"),
            "_x",
        )
        means = (
            # code NULL = unscorable subvector (the pq_best_expr NULL
            # guard) — drop it before the driver rebuild int()s the
            # group key; an all-NULL dim mean is dropped the same way
            longd.filter(F.col("_code").isNotNull())
            .groupBy("_s", "_code", "_dd")
            .agg(F.avg("_x").alias("_m"))
            .filter(F.col("_m").isNotNull())
            .collect()  # bounded: m × k × d0 = k × dim — the model update
        )
        new_books: list[dict[int, dict[int, float]]] = [dict() for _ in range(m)]
        for r in means:
            new_books[int(r["_s"])].setdefault(int(r["_code"]), {})[int(r["_dd"])] = (
                round(float(r["_m"]), 9)
            )
        codebooks = [
            [(code, [dims[i] for i in range(d0)])
             for code, dims in sorted(new_books[s].items())
             if len(dims) == d0]  # drop degenerate codes (all-NULL dim)
            for s in range(m)
        ]
    return codebooks


def pq_best_expr(
    codebooks: list[list[tuple[int, list[float]]]], s: int, d0: int
) -> Column:
    """struct(d, c): rounded squared distance + code of the nearest
    sub-centroid in subspace ``s`` for the ``_v`` vector column —
    dim-by-dim left-to-right sum, so the arithmetic order is
    reproducible in any engine.  Pure projection over literal
    codebooks: no join, no shuffle.

    Built as ONE SQL string through ``F.expr`` instead of thousands of
    Column-API calls: each Column operation is a py4j round-trip, and
    the m×k×d0 literal tree cost ~4 s of pure driver-side Python per
    pass when composed node-by-node.  ``{w!r}D`` double literals parse
    to the exact same IEEE values as ``F.lit(w)`` (verified); ``x0 +
    x1 + …`` is left-associative, matching the previous ``lit(0.0) +
    …`` fold exactly (0.0 + t == t in IEEE)."""
    entries = []
    for code, cv in codebooks[s]:
        terms = " + ".join(
            f"(element_at(_v, {s * d0 + i + 1}) - {w!r}D)"
            f" * (element_at(_v, {s * d0 + i + 1}) - {w!r}D)"
            for i, w in enumerate(cv)
        )
        entries.append(f"named_struct('d', round({terms}, 9), 'c', {code})")
    # the same NULL guard as ivf_best_expr: a NULL distance (NULL
    # element / short vector) must yield code NULL — the struct argmin
    # would otherwise tie on d=NULL and silently assign every corrupt
    # vector to code 0, polluting that code's Lloyd mean in training
    # and misrepresenting the vector as a valid member when encoding.
    # The argmin binds ONCE via the transform-array idiom (dialect.
    # _bind1): the old str.replace spliced the full m×k×d0 literal
    # tree into BOTH CASE branches, doubling generated-code size per
    # subspace against janino's 64 KB method cap.
    return F.expr(
        f"transform(array(array_min(array({', '.join(entries)}))),"
        f" best_ -> (CASE WHEN best_.d IS NULL THEN"
        f" named_struct('d', CAST(NULL AS DOUBLE), 'c', CAST(NULL AS INT))"
        f" ELSE best_ END))[0]"
    )


def pq_fit_encode(
    df: DataFrame,
    m: int = 8,
    k: int = 8,
    iters: int = 2,
    stride: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization (PQ) — train per-subspace codebooks and
    encode every vector, the compression layer of a canonical
    billion-scale ANN index (IVF for routing + PQ for storage: a D-dim
    float32 vector becomes ``m`` byte codes, a 32×+ shrink).

    Training: ``pq_train`` (deterministic Lloyd — see its docstring).
    Encoding the corpus is map-only (``pq_best_expr`` projections).

    Returns the LONG encoding relation (id, subspace, code, err2) —
    err2 is the rounded squared distance to the assigned sub-centroid
    (the per-subspace reconstruction error the serving gate audits).
    """
    codebooks = pq_train(df, m, k, iters, stride, vec_col, id_col)
    d0 = len(codebooks[0][0][1])
    base = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    entries = []
    for s in range(m):
        b = pq_best_expr(codebooks, s, d0)  # built once, fields shared
        entries.append(
            F.struct(
                F.lit(s).alias("subspace"),
                b["c"].alias("code"),
                b["d"].alias("err2"),
            )
        )
    enc = base.select(
        F.col(id_col),
        F.explode(F.array(*entries)).alias("_e"),
    )
    return enc.select(
        id_col,
        F.col("_e.subspace").alias("subspace"),
        F.col("_e.code").alias("code"),
        F.col("_e.err2").alias("err2"),
    )


def ann_ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    stride: int = 50,
    m: int = 8,
    k_codes: int = 8,
    pq_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[tuple[int, list[float]]] | None = None,
    codebooks: list[list[tuple[int, list[float]]]] | None = None,
    k_max: int | None = None,
) -> DataFrame:
    """IVF+PQ ANN serving with asymmetric distance computation (ADC) —
    the canonical billion-scale index: IVF routes the query to
    ``n_probe`` cells, and candidates are scored from their PQ codes
    alone via a per-query lookup table (LUT), never touching the raw
    vectors.

    ``LUT[s][code]`` = squared distance between the query's subvector
    ``s`` and sub-centroid ``code`` — m×k floats computed driver-side
    in the same left-to-right IEEE order as the codebook training, so
    any engine reproduces every score.  A candidate's approximate
    distance is ``Σ_s LUT[s][code_s]``, summed s = 0..m-1 in literal
    order (no engine-dependent aggregation order).

    Serving plan shape: scan → fan_out widening (no-op on a many-file
    corpus) → nearest-centroid routing projection → broadcast-SEMI
    probe filter (``probe_semi`` — a null-safe semi join on the
    n_probe-row probes relation, never an ``isin`` predicate that
    Catalyst would push below the widening exchange) → per-subspace
    code projections → literal LUT lookups → TakeOrderedAndProject.
    No keyed shuffle, no big-side join build.  At 100 TB the codes are
    materialized once (m bytes per vector, partitioned by cid) and
    serving reads ONLY the code columns of the probed cells — the scan
    is ~m/(4·D) of the raw-vector scan that IVF-Flat pays.

    Returns (id, approx_d2) — the ``k`` best candidates by ADC
    distance, ascending, ties to the lowest id.
    """
    from infinidb_spark.operators.similarity import (
        ivf_assign_expr,
        ivf_probe_ids,
        probe_semi,
        train_ivf_centroids,
    )

    # inject a pre-trained model (the serving contract — callers who
    # encoded offline with pq_fit_encode pass the SAME codebooks so
    # stored codes and the LUT can never drift); default retrains from
    # the corpus like ann_ivf_topk does
    if centroids is None:
        # k_max bounds the routing model independent of corpus size —
        # see train_ivf_centroids (uncapped K makes serving O(N·K))
        centroids = train_ivf_centroids(df, stride, vec_col, id_col, k_max=k_max)
    if codebooks is None:
        codebooks = pq_train(df, m, k_codes, pq_iters, stride, vec_col, id_col)
    else:
        # injected model wins: m comes FROM the codebooks, never the
        # default — an m mismatch would silently score a subvector
        m = len(codebooks)
    d0 = len(codebooks[0][0][1])
    if len(query_vec) != m * d0:
        raise ValueError(
            f"query dim {len(query_vec)} != m*d0 = {m}*{d0} of the codebooks"
        )
    q = [float(x) for x in query_vec]
    probes = ivf_probe_ids(q, centroids, n_probe)

    # per-query LUT, left-to-right accumulation matching pq_best_expr
    # LUT positions are indexed BY CODE VALUE (element_at(lut, code+1)),
    # so gaps from Lloyd-dropped empty clusters hold NULL placeholders —
    # a dropped code has no centroid, so pq_best_expr can never emit it
    # and the NULL slot is unreachable.  Building positionally from the
    # codebook list would silently shift distances when codes are
    # non-contiguous.
    lut: list[list[float | None]] = []
    for s in range(m):
        by_code: dict[int, float] = {}
        for code, cv in codebooks[s]:
            d2 = 0.0
            for i, w in enumerate(cv):
                x = q[s * d0 + i] - w
                d2 = d2 + x * x
            by_code[code] = round(d2, 9)
        lut.append([by_code.get(c) for c in range(max(by_code) + 1)])

    vec = F.col(vec_col).cast("array<double>")
    # routing (K cosines) + m PQ argmins per row are interpreted
    # higher-order expressions — fan the scan out so a few-file local
    # corpus doesn't serialize them on 1–2 tasks (no-op at scale, where
    # the scan already yields ≥ cluster-width partitions)
    scored = probe_semi(
        fan_out(df.select(
            F.col(id_col),
            vec.alias("_v"),
        )).withColumn("_cid", ivf_assign_expr("`_v`", centroids)),
        probes,
    )
    # one F.expr per subspace (py4j economy, same rationale as
    # pq_best_expr); summed s = 0..m-1 left-to-right
    terms = []
    for s in range(m):
        lut_lit = ", ".join(
            "CAST(NULL AS DOUBLE)" if v is None else f"{v!r}D" for v in lut[s]
        )
        code_s = pq_best_expr(codebooks, s, d0)["c"]
        terms.append(
            F.element_at(F.expr(f"array({lut_lit})"), (code_s + 1).cast("int"))
        )
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    return (
        scored.select(F.col(id_col), F.round(score, 6).alias("approx_d2"))
        .orderBy(F.col("approx_d2").asc(), F.col(id_col))
        .limit(k)
    )
