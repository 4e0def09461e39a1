"""Training-data pipeline corpus: dedup, similarity search, text
analysis, multimodal plumbing — the engine's capability extension beyond
the reference surface (BASELINE.json north-star; graded alongside
SURVEY §2).

Oracle strategy: everything SQL-expressible gets a full DuckDB oracle.
The xxhash64-based production paths (MinHash/SimHash/text fingerprint)
are pinned by PORTABLE-HASH twins — the same pipeline run with
md5-derived integers both engines can compute, so the algorithm is
hash-verified end-to-end while xxhash64 stays the fast default; the
xxhash64 variants keep rows-only checks plus determinism tests.  Only
pseudo-columns and the system catalog (engine introspection, no SQL
equivalent) remain rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from infinidb_spark.operators import dedup as D
from infinidb_spark.operators import multimodal as M
from infinidb_spark.operators import similarity as S
from infinidb_spark.operators import text as T
from infinidb_spark.plans.registry import query


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    from infinidb_spark.plans.registry import load_registered

    return load_registered(spark, sf_dir, *names)


# A fixed query vector for similarity search (64-dim, deterministic).
# %.17g round-trips each double bit-exactly, so DuckDB oracles compute
# cosines from the SAME doubles as Spark's F.lit values — a %.10f
# literal drifts ~3e-11 per component, enough to flip the 9-dp-rounded
# routing argmax on ~0.5% of vectors (the LSH planes and PQ literals
# already render %.17g / repr for exactly this reason).
_QUERY_VEC = [((i * 37) % 13 - 6) / 6.0 for i in range(64)]
_QV_SQL = "[" + ", ".join(f"{x:.17g}" for x in _QUERY_VEC) + "]"


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
           min(doc_id) AS doc_id,
           count(*)    AS dup_count
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy (md5 here so DuckDB can mirror it;
    the library default is sha2-256)."""
    (docs,) = _t(spark, sf_dir, "documents")
    h = F.md5(D.normalize_text(F.col("text"))).alias("content_hash")
    return (
        docs.select(F.col("doc_id"), h)
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


@query("dedup_minhash_lsh")  # rows-only: xxhash64 not reproducible in DuckDB
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (shingle→minhash→band→bucket-join→
    exact-Jaccard verify).  See operators.dedup.minhash_lsh_pairs."""
    (docs,) = _t(spark, sf_dir, "documents")
    # 16 hashes / 4 bands keeps rows-per-band at 4 (banding threshold
    # (1/b)^(r) ≈ 0.7, selective enough that candidates stay tiny) while
    # halving signature-aggregate cost vs 32/8 — measured 5.2 s → 2.9 s
    # at sf0.1 with an identical verified pair set.  16/8 (r=2) is a
    # trap: threshold 0.35 explodes candidates to 1.4 M pairs.
    return D.minhash_lsh_pairs(docs, n_hashes=16, bands=4, jaccard_threshold=0.5)


def _minhash_oracle_sql(
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    threshold: float = 0.3,
    cap: int = 1000,
    doc_filter: str = "doc_id < 150",
) -> str:
    """DuckDB oracle reproducing minhash_lsh_pairs(portable_hash=True)
    END TO END: md5-derived shingle hashes, the same (a*h+b) mod 2^31-1
    signature family (a/b embedded as literals), string band keys,
    capped buckets, exact-Jaccard verify."""
    p31 = (1 << 31) - 1
    params = [((a % (p31 - 1)) + 1, b % p31) for a, b in D._hash_params(n_hashes)]
    r = n_hashes // bands
    mins = ", ".join(
        f"min(({a} * h + {b}) % {p31}) AS m{j}" for j, (a, b) in enumerate(params)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band_id, "
        f"concat_ws('_', {', '.join(f'm{i * r + kk}' for kk in range(r))}) AS bkey "
        "FROM sig"
        for i in range(bands)
    )
    return f"""
    WITH d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents WHERE {doc_filter}
    ),
    sh AS (
      SELECT doc_id, ('0x' || substr(md5(g), 1, 7))::BIGINT AS h
      FROM (
        SELECT doc_id,
               unnest([substr(t, i, {shingle_k})
                       for i in range(1, greatest(length(t) - {shingle_k - 1}, 1) + 1)]) AS g
        FROM d
      )
    ),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    banded AS ({band_rows}),
    buckets AS (
      SELECT band_id, bkey, list(doc_id) AS ids
      FROM banded GROUP BY band_id, bkey
      HAVING len(list(doc_id)) BETWEEN 2 AND {cap}
    ),
    pairs AS (
      SELECT DISTINCT a.did AS id_a, b.did AS id_b
      FROM (SELECT unnest(ids) AS did, band_id, bkey FROM buckets) a
      JOIN (SELECT unnest(ids) AS did, band_id, bkey FROM buckets) b
        ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.did < b.did
    ),
    sets AS (SELECT doc_id, list(DISTINCT h) AS s FROM sh GROUP BY doc_id)
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
    FROM pairs
    JOIN sets sa ON sa.doc_id = id_a
    JOIN sets sb ON sb.doc_id = id_b
    WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.s, sb.s))) >= {threshold}
    """


@query("dedup_minhash_portable", oracle=_minhash_oracle_sql())
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME MinHash+LSH pipeline as dedup_minhash_lsh, run in
    portable-hash mode (md5-derived shingle ints, string band keys) so
    DuckDB can replay every stage — upgrading the MinHash family from a
    rows-only check to a full hash-verified one.  xxhash64 remains the
    production default; this query pins the algorithm."""
    (docs,) = _t(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(
        docs.filter(F.col("doc_id") < 150),
        n_hashes=16,
        bands=4,
        jaccard_threshold=0.3,
        portable_hash=True,
    )


@query("dedup_simhash")  # rows-only: xxhash64-based fingerprint
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-bucket dedup — 64-bit sign fingerprints, JVM-side."""
    (docs,) = _t(spark, sf_dir, "documents")
    return D.dedup_simhash(docs)


def _simhash_oracle_sql(n_bits: int = 56, doc_filter: str = "doc_id < 300") -> str:
    """DuckDB oracle replaying dedup_simhash(portable_hash=True): token
    md5-ints vote per bit, fingerprint folds the vote signs."""
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(n_bits)
    )
    fold = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(n_bits)
    )
    return f"""
    WITH d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents WHERE {doc_filter}
    ),
    tok AS (
      SELECT doc_id, ('0x' || substr(md5(w), 1, 14))::BIGINT AS h
      FROM (SELECT doc_id, unnest(string_split_regex(t, '\\s+')) AS w FROM d)
    ),
    votes AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id),
    fp AS (SELECT doc_id, CAST({fold} AS BIGINT) AS simhash FROM votes)
    SELECT simhash, min(doc_id) AS doc_id, count(*) AS bucket_size
    FROM fp GROUP BY simhash
    """


@query("dedup_simhash_portable", oracle=_simhash_oracle_sql())
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_simhash in portable-hash mode (56-bit md5-derived votes) —
    the hash-verified pin of the SimHash algorithm; xxhash64 remains the
    production default."""
    (docs,) = _t(spark, sf_dir, "documents")
    return D.dedup_simhash(docs.filter(F.col("doc_id") < 300), portable_hash=True)


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH g AS (
      SELECT doc_id, source,
             list_distinct([
               array_to_string(words[i:i+2], ' ')
               for i in range(1, greatest(len(words) - 2, 1) + 1)
             ]) AS grams
      FROM (
        SELECT doc_id, source,
               string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS words
        FROM documents
      )
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
    FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
          len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard pairs within a prefilter bucket (source).

    Runs over the full documents table (no doc_id prefilter): the
    synthetic data carries planted near-dup pairs spread across the id
    space, so a narrow range attests vacuously (0 = 0 rows).  At sf0.01
    the result is non-empty (pinned in tests/test_oracle_audit.py).
    Threshold 0.8 is the production near-dup tier; with the PPJoin
    prefix filter the candidate stream scales with shared-rare-gram
    pairs instead of the quadratic within-bucket count (the all-pairs
    form measured 72x per decade at sf1 in the r08 sweep).
    """
    (docs,) = _t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, n=3, threshold=0.8, prefilter_col="source")


@query(
    "ann_cosine_topk",
    oracle=f"""
    SELECT vec_id,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), {_QV_SQL}), 6) AS cosine
    FROM embeddings
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact baseline every ANN variant is
    measured against)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, _QUERY_VEC, k=10)


def _lsh_planes(n_planes: int = 4, dim: int = 64) -> list[list[float]]:
    """The deterministic hyperplanes operators.similarity uses — the
    SAME generator, imported, so the oracle replay can never drift from
    the engine's planes."""
    return S._lsh_planes(n_planes, dim)


def _bucket_expr_sql(vec_sql: str, planes: list[list[float]]) -> str:
    """DuckDB expression computing the hyperplane bucket of ``vec_sql``
    with the planes embedded as SQL literals (exact mirror of
    operators.similarity.hyperplane_bucket)."""
    plane_sql = [
        "[" + ", ".join(f"{c:.17g}" for c in coeffs) + "]" for coeffs in planes
    ]
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec_sql}, {ps}) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, ps in enumerate(plane_sql)
    )


def _lsh_oracle_sql() -> str:
    """DuckDB oracle replicating the hyperplane bucketing exactly: the
    planes are deterministic constants, embedded as SQL literals; the
    query's bucket is computed driver-side the same way Spark does."""
    planes = _lsh_planes()
    qb = 0
    for p, coeffs in enumerate(planes):
        if sum(q * c for q, c in zip(_QUERY_VEC, coeffs)) >= 0:
            qb |= 1 << p
    bucket_expr = _bucket_expr_sql("CAST(embedding AS DOUBLE[])", planes)
    return f"""
    SELECT vec_id,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), {_QV_SQL}), 6) AS cosine
    FROM embeddings
    WHERE ({bucket_expr}) = {qb}
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """


@query("ann_lsh_topk", oracle=_lsh_oracle_sql())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN — single-probe hyperplane bucket + exact rerank.
    Hash-checked: the oracle reproduces the deterministic hyperplane
    bucketing with the planes embedded as SQL literals."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(emb, _QUERY_VEC, k=10, n_planes=4)


def _ivf_oracle_sql(
    k: int = 10, n_probe: int = 2, stride: int = 50,
    k_max: int | None = None,
) -> str:
    """DuckDB oracle replaying the WHOLE IVF pipeline from the raw table:
    the same stride-sampled centroids (capped at the first ``k_max`` by
    vec_id when set — see train_ivf_centroids on why an uncapped model
    is O(N·K) at serving time), the same 9-dp-rounded nearest-centroid
    argmax (ties → lowest cid), the same top-``n_probe`` probe
    selection, the same exact-cosine rerank."""
    cap = f" ORDER BY vec_id LIMIT {k_max}" if k_max is not None else ""
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
    c AS (SELECT vec_id AS cid, ev AS cv FROM v WHERE vec_id % {stride} = 0{cap}),
    asg AS (
      SELECT v.vec_id, v.ev, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_cosine_similarity(v.ev, c.cv), 9) DESC, c.cid
             ) AS rn
      FROM v, c
    ),
    a1 AS (SELECT vec_id, ev, cid FROM asg WHERE rn = 1),
    probes AS (
      SELECT cid FROM c
      ORDER BY round(list_cosine_similarity(cv, {_QV_SQL}), 9) DESC, cid
      LIMIT {n_probe}
    )
    SELECT vec_id, round(list_cosine_similarity(ev, {_QV_SQL}), 6) AS cosine
    FROM a1 JOIN probes USING (cid)
    ORDER BY cosine DESC, vec_id
    LIMIT {k}
    """


@query("ann_ivf_topk", oracle=_ivf_oracle_sql(k_max=32))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN — the third member of the similarity family
    (brute-force exact / LSH single-probe / IVF multi-probe).  Centroids
    are stride-sampled (the deterministic stand-in for offline k-means)
    and CAPPED at 32 (k_max — an uncapped K = N/stride model makes the
    routing projection O(N·K); see train_ivf_centroids); serving is
    scan → assign-projection → probe filter → bounded-heap top-k with
    zero joins and zero shuffles.  Hash-checked: the oracle re-derives
    centroids, assignment, probes, and rerank from the raw table in
    SQL."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return S.ann_ivf_topk(emb, _QUERY_VEC, k=10, n_probe=2, stride=50, k_max=32)


def _embedding_dedup_oracle_sql(vec_filter: str = "1=1") -> str:
    """DuckDB oracle for the full embedding-cosine dedup pipeline:
    hyperplane bucketing (plane literals), same-bucket cosine edges at
    the same threshold, min-lower-neighbor representative."""
    bucket_expr = _bucket_expr_sql("v", _lsh_planes())
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE {vec_filter}),
    b AS (SELECT vec_id, v, ({bucket_expr}) AS bkt FROM e),
    p AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b
      FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id < c.vec_id
      WHERE list_cosine_similarity(a.v, c.v) >= 0.3
    ),
    r AS (SELECT id_b AS vec_id, min(id_a) AS rep FROM p GROUP BY id_b)
    SELECT e.vec_id,
           coalesce(r.rep, e.vec_id) AS rep_id,
           CAST(CASE WHEN r.rep IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup
    FROM e LEFT JOIN r USING (vec_id)
    """


@query("dedup_embedding_cosine", oracle=_embedding_dedup_oracle_sql())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: LSH-bucketed candidate pairs,
    exact cosine >= 0.3, min-id representative per vector — the
    vector-space member of the dedup family (exact / MinHash / SimHash /
    n-gram Jaccard / embedding-cosine).  Hash-checked: the oracle
    reproduces the hyperplane bucketing and rep assignment exactly."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return S.embedding_dedup(emb, threshold=0.3, n_planes=4)


def _hybrid_oracle_sql() -> str:
    """Hybrid dedup oracle: the textual (portable MinHash) and semantic
    (embedding-cosine) oracles composed as nested-WITH CTEs, combined
    per document — a doc is a duplicate when EITHER modality flags it,
    and its representative is the least of the two modal reps."""
    return f"""
    WITH tp AS ({_minhash_oracle_sql(doc_filter="doc_id < 150")}),
    tr AS (SELECT id_b AS doc_id, min(id_a) AS trep FROM tp GROUP BY id_b),
    sem AS ({_embedding_dedup_oracle_sql(vec_filter="vec_id < 150")})
    SELECT sem.vec_id AS doc_id,
           least(coalesce(tr.trep, sem.vec_id), sem.rep_id) AS rep_id,
           CAST(CASE WHEN tr.trep IS NOT NULL THEN 1 ELSE 0 END AS INT) AS text_dup,
           sem.is_dup AS semantic_dup,
           CAST(CASE WHEN least(coalesce(tr.trep, sem.vec_id), sem.rep_id)
                          < sem.vec_id THEN 1 ELSE 0 END AS INT) AS is_dup
    FROM sem LEFT JOIN tr ON tr.doc_id = sem.vec_id
    """


@query("dedup_hybrid", oracle=_hybrid_oracle_sql())
def dedup_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-modal near-dup dedup: a document is a duplicate when
    EITHER its text (MinHash+LSH, portable mode) OR its embedding
    (hyperplane-bucketed cosine) is near-identical to an earlier doc —
    the union rule production curation uses (surface edits evade
    textual hashes; translations/paraphrases evade them too but not
    embeddings, and vice versa).  doc_id and vec_id share the id space
    (TESTDATA contract).  Composition of two hash-verified pipelines;
    the oracle composes their replays the same way."""
    docs, emb = _t(spark, sf_dir, "documents", "embeddings")
    tpairs = D.minhash_lsh_pairs(
        docs.filter(F.col("doc_id") < 150),
        n_hashes=16,
        bands=4,
        jaccard_threshold=0.3,
        portable_hash=True,
    )
    trep = tpairs.groupBy("id_b").agg(F.min("id_a").alias("_trep"))
    sem = S.embedding_dedup(
        emb.filter(F.col("vec_id") < 150), threshold=0.3, n_planes=4
    )
    rep = F.least(
        F.coalesce(F.col("_trep"), sem["vec_id"]), F.col("rep_id")
    )
    return (
        sem.join(trep, sem["vec_id"] == trep["id_b"], "left")
        .select(
            sem["vec_id"].alias("doc_id"),
            rep.alias("rep_id"),
            F.col("_trep").isNotNull().cast("int").alias("text_dup"),
            F.col("is_dup").alias("semantic_dup"),
            (rep < sem["vec_id"]).cast("int").alias("is_dup"),
        )
    )



@query(
    "similarity_pairs_bucketed",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE a.vec_id < 60 AND b.vec_id < 60
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) > 0.2
    """,
)
def similarity_pairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs within label buckets (IVF-probe shape)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    sub = emb.filter(F.col("vec_id") < 60)
    a = sub.select(F.col("label").alias("_b"), F.col("vec_id").alias("id_a"),
                   F.col("embedding").cast("array<double>").alias("v_a"))
    b = sub.select(F.col("label").alias("_b2"), F.col("vec_id").alias("id_b"),
                   F.col("embedding").cast("array<double>").alias("v_b"))
    sim = S.cosine_similarity(F.col("v_a"), F.col("v_b"))
    # filter on the RAW cosine (like every other threshold query here
    # and the oracle's WHERE clause); round only for display — a pair
    # at raw 0.2000003 must survive on both sides
    return (
        a.join(b, (a._b == b._b2) & (a.id_a < b.id_b))
        .filter(sim > 0.2)
        .select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
    )


@query(
    "text_quality",
    oracle="""
    SELECT doc_id,
           -- empty-token rule mirrored from operators.text: split('')
           -- yields [''], which T.token_count counts as 0 tokens
           CAST(len(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'), w -> w <> '')) AS BIGINT) AS n_tokens,
           length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS n_chars,
           round(CAST(length(regexp_replace(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
                 / greatest(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1), 6) AS punct_ratio
    FROM documents WHERE doc_id < 200
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap text metrics (token count, char count, punctuation ratio) —
    the SQL-checkable slice of operators.text.analyze."""
    (docs,) = _t(spark, sf_dir, "documents")
    t = D.normalize_text(F.col("text"))
    return docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(
            F.length(F.regexp_replace(t, r"[^\.,;:!\?]", "")) / F.greatest(F.length(t), F.lit(1)),
            6,
        ).alias("punct_ratio"),
    )


def _classifier_oracle_sql() -> str:
    """DuckDB oracle replaying classify_quality(portable_hash=True):
    md5-bucketed hashed bag-of-words, INTEGER weight table (w*1024
    exact) embedded from operators.text.classifier_weights so the two
    can never drift — and the same exact half-rounding formula
    score6 = floor((2*s*10^6 + d) / (2*d)), d = 1024*n_tokens, the
    engine uses (a double round() here diverged on a genuine .5
    six-decimal tie at sf1)."""
    from infinidb_spark.operators.text import classifier_weights

    w = classifier_weights()
    w_lit = "[" + ", ".join(str(int(round(x * 1024))) for x in w) + "]"
    return f"""
    WITH d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(string_split_regex(t, '\\s+')) AS w
      FROM d
    ),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(w), 1, 7))::BIGINT % {len(w)} AS INT) AS j
      FROM tok WHERE w <> ''
    ),
    s AS (
      SELECT doc_id, count(*) AS n_tokens,
             sum(({w_lit})[j + 1]) AS sw
      FROM b GROUP BY doc_id
    ),
    sc AS (
      SELECT doc_id, n_tokens,
             CAST(floor((2 * sw * 1000000 + 1024 * n_tokens)
                        / (2.0 * 1024 * n_tokens)) AS DOUBLE)
               / 1000000.0 AS score
      FROM s
    )
    -- one row per input doc (the operator's spine contract): an
    -- all-whitespace doc gets n_tokens=0, neutral score 0.0
    SELECT d.doc_id,
           CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
           coalesce(sc.score, 0.0)                  AS score,
           coalesce(sc.score, 0.0) >= 0             AS keep
    FROM d LEFT JOIN sc USING (doc_id)
    """


@query("text_classifier_quality", oracle=_classifier_oracle_sql())
def text_classifier_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: hashed bag-of-words linear classifier
    (fastText/CCNet-style) mean-pooled per document — the stage an LLM
    pipeline runs after heuristic rules (operators/text.py
    classify_quality).  Portable-hash mode so every weight lookup and
    the keep/drop decision hash-verify against the DuckDB replay; the
    xxhash64 production mode shares the identical plan."""
    (docs,) = _t(spark, sf_dir, "documents")
    return T.classify_quality(docs, portable_hash=True)


def _lang_oracle_sql(floor: float = 0.05) -> str:
    """DuckDB oracle replaying classify_lang(portable_hash=True): the
    per-language weight tables are embedded as literals from
    operators.text.lang_classifier_weights (construction is itself
    md5-portable), scores mean-pool per doc, argmax ties break to the
    lexicographically first language, best < floor -> 'und'."""
    from infinidb_spark.operators.text import lang_classifier_weights

    w = lang_classifier_weights()
    langs = sorted(w)
    n_b = len(w[langs[0]])
    # INTEGER weights (w*1024 exact) + the same exact half-up formula
    # classify_lang uses — score6 = floor((2*s*10^6 + d) / (2*d)),
    # d = 1024*n_tokens — so decimal ties round identically here
    lits = {
        lang: "[" + ", ".join(str(int(round(x * 1024))) for x in w[lang]) + "]"
        for lang in langs
    }
    sums = ",\n             ".join(
        f"sum(({lits[lang]})[j + 1]) AS s_{lang}" for lang in langs
    )
    scores = ",\n           ".join(
        f"floor((2.0 * s_{lang} * 1000000 + 1024.0 * n_tokens)"
        f" / (2048.0 * n_tokens)) / 1000000.0 AS sc_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"sc_{lang}" for lang in langs) + ")"
    pick = " ".join(
        f"WHEN sc_{lang} = {best} THEN '{lang}'" for lang in langs[:-1]
    )
    return f"""
    WITH d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(string_split_regex(t, '\\s+')) AS w
      FROM d
    ),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(w), 1, 7))::BIGINT % {n_b} AS INT) AS j
      FROM tok WHERE w <> ''
    ),
    s AS (
      SELECT doc_id, count(*) AS n_tokens,
             {sums}
      FROM b GROUP BY doc_id
    ),
    sc AS (
      SELECT doc_id, n_tokens,
           {scores}
      FROM s
    ),
    verdict AS (
      SELECT doc_id, n_tokens,
             CASE WHEN {best} >= {floor}
                  THEN CASE {pick} ELSE '{langs[-1]}' END
                  ELSE 'und' END AS lang,
             {best} AS score
      FROM sc
    )
    SELECT d.doc_id,
           coalesce(v.lang, 'und')              AS lang,
           coalesce(v.score, 0.0)               AS score,
           CAST(coalesce(v.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM d LEFT JOIN verdict v USING (doc_id)
    """


@query("text_lang_id", oracle=_lang_oracle_sql())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-grade language ID (VERDICT-r05 #6): hashed-BoW linear
    classifier with per-language weight buckets and argmax over
    languages (operators/text.py classify_lang) — the promotion of the
    stopword-hit heuristic to the same model machinery
    classify_quality already has.  Portable-hash mode so bucketing,
    per-language scores, argmax tie-breaks, and the 'und' floor all
    hash-verify against the DuckDB replay; the xxhash64 production
    mode shares the identical plan."""
    (docs,) = _t(spark, sf_dir, "documents")
    return T.classify_lang(docs, portable_hash=True)


@query("text_analyze")  # rows-only BY DESIGN — pinned by its portable twin
def text_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full text-analysis projection: tokens, subwords, stopword ratio,
    language guess, composite quality, rolling-hash fingerprint.

    PINNED-BY-TWIN: this production surface fingerprints with xxhash64
    (JVM codegen, not reproducible in DuckDB), so no portable oracle can
    exist for THIS registration and the driver records a rows-only
    check.  Its hash pin is ``text_analyze_portable``: the IDENTICAL
    ``T.analyze`` pipeline over the SAME full table in portable-hash
    mode (md5-derived rolling hash), hash-verified against a DuckDB
    replay of every column.  The only code difference between the two
    registrations is the hash primitive, so a green portable row
    certifies this one's logic end-to-end."""
    (docs,) = _t(spark, sf_dir, "documents")
    return T.analyze(docs)


# -- shared DuckDB fragments for the quality_score / lang_id semantics
# (operators/text.py) — ONE source of truth for every oracle that
# replays them (text_analyze, dedup_keep_best, streaming_quality_gate),
# so a ladder tweak can never leave one oracle silently stale.


def _sw_list_sql(lang: str) -> str:
    """Stopword inventory embedded from operators.text (never drifts)."""
    return "[" + ", ".join(f"'{w}'" for w in T._STOPWORDS[lang]) + "]"


def _lang_ratios_sql() -> str:
    """Per-language stopword-hit ratios over a ``toks`` list column."""
    return ", ".join(
        f"CAST(len(list_filter(toks, w -> list_contains({_sw_list_sql(lang)}, w))) AS DOUBLE)"
        f" / greatest(len(toks), 1) AS sr_{lang}"
        for lang in T._STOPWORDS
    )


def _lang_best_sql() -> str:
    """The struct-max lang pick (score then lang tie-break)."""
    return ", ".join(
        f"{{'score': sr_{lang}, 'lang': '{lang}'}}" for lang in T._STOPWORDS
    )


def _quality_base_cte(doc_filter: str) -> str:
    """The shared ``d``/``base``/``m`` CTE block: normalized text,
    token list, char/punct counts, per-language stopword ratios —
    everything the quality ladder and lang pick read.  ONE copy for
    every oracle replaying operators/text.py scoring (keep_best,
    keep_best_incremental, streaming_quality_gate); text_analyze keeps
    its extended variant (extra subword/fingerprint inputs)."""
    return f"""d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents WHERE {doc_filter}
    ),
    base AS (
      SELECT doc_id, string_split_regex(t, '\\s+') AS toks,
             length(t) AS n_chars,
             length(regexp_replace(t, '[^\\.,;:!\\?]', '', 'g')) AS n_punct
      FROM d
    ),
    m AS (
      SELECT doc_id, n_chars,
             len(list_filter(toks, w -> w <> '')) AS n_tokens,
             CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
             {_lang_ratios_sql()}
      FROM base
    )"""


#: the FROM-clause wrapper exposing mean_wlen to the ladder
_LADDER_INPUT_SQL = "(SELECT *, n_chars / greatest(n_tokens, 1) AS mean_wlen FROM m)"

#: the composite quality CASE ladder over (n_chars, punct_ratio, sr_en,
#: mean_wlen) — operators/text.py quality_score verbatim
_QUALITY_LADDER_SQL = """round((
             (CASE WHEN n_chars BETWEEN 100 AND 20000 THEN 1.0
                   WHEN n_chars BETWEEN 20 AND 100 THEN 0.5 ELSE 0.1 END) +
             (CASE WHEN punct_ratio BETWEEN 0.0 AND 0.1 THEN 1.0 ELSE 0.3 END) +
             (CASE WHEN sr_en >= 0.05 THEN 1.0 WHEN sr_en > 0.0 THEN 0.5 ELSE 0.1 END) +
             (CASE WHEN mean_wlen BETWEEN 2.5 AND 9.0 THEN 1.0 ELSE 0.3 END)
           ) / 4.0, 6)"""


def _text_analyze_oracle_sql(doc_filter: str = "doc_id < 250") -> str:
    """DuckDB oracle replaying the ENTIRE analyze() projection —
    tokenization, subword estimate, stopword ratios, the struct-max
    lang-id tie-break, the composite quality CASE ladder, and the
    portable (md5-int) rolling-hash fingerprint.  Stopword inventories
    are embedded from operators.text so the two can never drift."""
    return f"""
    WITH d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents WHERE {doc_filter}
    ),
    base AS (
      SELECT doc_id, t, string_split_regex(t, '\\s+') AS toks,
             length(t) AS n_chars,
             length(regexp_replace(t, '[^\\.,;:!\\?]', '', 'g')) AS n_punct_q,
             length(regexp_replace(t, '[^\\.,;:!\\?\\(\\)\\[\\]]', '', 'g')) AS n_punct_sub
      FROM d
    ),
    m AS (
      -- empty-token rule mirrored from operators.text: split('')
      -- yields [''], which counts 0 tokens / 0 subwords
      SELECT doc_id, t, n_chars, n_punct_q,
             len(list_filter(toks, w -> w <> '')) AS n_tokens,
             CAST(coalesce(list_sum([greatest(ceil(length(w) / 4.0), 1)
                                     for w in list_filter(toks, w -> w <> '')]), 0)
                  + n_punct_sub AS BIGINT) AS n_subwords,
             {_lang_ratios_sql()}
      FROM base
    ),
    scored AS (
      SELECT *,
             list_sort([{_lang_best_sql()}])[-1] AS best,
             n_chars / greatest(n_tokens, 1) AS mean_wlen,
             CAST(n_punct_q AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio
      FROM m
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           n_subwords,
           round(sr_en, 6) AS stopword_ratio,
           CASE WHEN best.score >= 0.05 THEN best.lang ELSE 'und' END AS lang_guess,
           {_QUALITY_LADDER_SQL} AS quality,
           list_min([('0x' || substr(md5(substr(t, i, 8)), 1, 14))::BIGINT
                     for i in range(1, greatest(length(t) - 7, 1) + 1)]) AS fingerprint
    FROM scored
    """


@query("text_analyze_portable", oracle=_text_analyze_oracle_sql("doc_id >= 0"))
def text_analyze_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analyze() in portable-hash mode over the FULL documents table:
    every metric INCLUDING the rolling-hash fingerprint is hash-verified
    against DuckDB replaying the same pipeline in SQL.  This is the hash
    pin for the rows-only ``text_analyze`` production registration."""
    (docs,) = _t(spark, sf_dir, "documents")
    return T.analyze(docs, portable_hash=True)


@query(
    "multimodal_features",
    # The decode stub is a deterministic polynomial hash over payload
    # bytes (docs are ASCII, so bytes == ascii(char)); DuckDB replays
    # slot 0 with a list_reduce over every-8th character code.  This
    # hash-checks the full mapInPandas path end-to-end.
    oracle="""
    WITH m AS (
      SELECT (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS modality,
             length(text) AS n_bytes,
             CAST(list_reduce(
               [ascii(substr(text, CAST(j AS INT), 1)) % 100003
                for j in range(1, least(length(text), 4096) + 1, 8)],
               (a, b) -> (a * 31 + b) % 100003
             ) AS DOUBLE) / 100003 AS f0
      FROM documents
    )
    SELECT modality,
           count(*) AS n,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(avg(f0), 6) AS avg_f0
    FROM m GROUP BY modality ORDER BY modality
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: synthesize a binary media table
    from documents, byte-aware repartition, Arrow-batched feature
    extraction (decode stubbed — see operators.multimodal), then a
    metadata aggregation that never touches payload bytes."""
    (docs,) = _t(spark, sf_dir, "documents")
    media = M.synthesize_media(docs)
    feats = M.extract_features(media)
    return (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
        )
        .orderBy("modality")
    )


@query(
    "multimodal_frame_plan",
    oracle="""
    SELECT doc_id AS media_id,
           unnest([1000 * (i - 1)
                   for i in range(1, greatest(CAST(floor((length(text) * 10 - 1) / 1000.0) AS INT) + 1, 1) + 1)]) AS frame_ts
    FROM documents WHERE doc_id < 100 AND doc_id % 3 = 2
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: explode rows into frame timestamps."""
    (docs,) = _t(spark, sf_dir, "documents")
    media = M.synthesize_media(docs.filter(F.col("doc_id") < 100))
    return M.frame_sample_plan(media, every_ms=1000)


@query(
    "data_validation",
    oracle="""
    WITH counts AS (
      SELECT count(*) AS total,
             sum(CASE WHEN l_quantity IS NULL OR NOT (l_quantity > 0 AND l_quantity <= 60)
                      THEN 1 ELSE 0 END) AS qty_in_range,
             sum(CASE WHEN l_discount IS NULL OR NOT (l_discount >= 0 AND l_discount <= 0.2)
                      THEN 1 ELSE 0 END) AS discount_band,
             sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS key_not_null,
             sum(CASE WHEN l_shipdate IS NULL OR NOT (l_shipdate >= DATE '1992-01-01')
                      THEN 1 ELSE 0 END) AS shipdate_floor
      FROM lineitem
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           round(CAST(n_violations AS DOUBLE) / greatest(total, 1), 6) AS violation_rate
    FROM (
      SELECT total, 'qty_in_range' AS rule, qty_in_range AS n_violations FROM counts
      UNION ALL SELECT total, 'discount_band', discount_band FROM counts
      UNION ALL SELECT total, 'key_not_null', key_not_null FROM counts
      UNION ALL SELECT total, 'shipdate_floor', shipdate_floor FROM counts
    )
    """,
)
def data_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint check over lineitem (operators/validate.py)
    — all rules fused into one scan+aggregate; counts hash-checked."""
    from infinidb_spark.operators.validate import check

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return check(
        lineitem,
        {
            "qty_in_range": (F.col("l_quantity") > 0) & (F.col("l_quantity") <= 60),
            "discount_band": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.2),
            "key_not_null": F.col("l_orderkey").isNotNull(),
            "shipdate_floor": F.col("l_shipdate") >= F.lit("1992-01-01").cast("timestamp"),
        },
    )


@query(
    "dataset_split",
    oracle="""
    WITH b AS (
      SELECT lang, n_chars,
             ('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':split')), 1, 14))::BIGINT
               % 10000 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END          AS split,
           lang,
           count(*)                      AS n_docs,
           CAST(sum(n_chars) AS BIGINT)  AS chars_total
    FROM b
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split (operators/datasets.
    hash_split, portable-hash mode): map-only salted-key bucketing, so
    membership is recomputation-stable across corpus versions; the
    oracle reproduces the md5 bucket math literally."""
    from infinidb_spark.operators.datasets import hash_split

    (docs,) = _t(spark, sf_dir, "documents")
    split = hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, portable=True
    )
    return (
        split.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("split", "lang")
    )


@query(
    "dataset_stratified_split",
    oracle="""
    WITH b AS (
      -- concat_ws matches the Spark side's NULL-SKIPPING join exactly
      -- (|| would propagate NULL and silently diverge on NULL strata)
      SELECT doc_id, concat_ws('/', lang, source) AS stratum, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 14))::BIGINT
               % 10000 AS bucket
      FROM documents
    ),
    r AS (
      SELECT stratum, n_chars,
             row_number() OVER (PARTITION BY stratum ORDER BY bucket, doc_id) - 1 AS rk,
             count(*) OVER (PARTITION BY stratum) AS n
      FROM b
    ),
    s AS (
      SELECT stratum, n_chars,
             CASE WHEN rk / n < 0.8 THEN 'train'
                  WHEN rk / n < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM r
    )
    SELECT split, stratum,
           count(*)                     AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM s
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def dataset_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum 80/10/10 split over (lang, source) strata
    (operators/datasets.exact_stratified_split, portable-hash mode):
    rows rank within each stratum by salted hash and cut at cumulative
    weight boundaries, so every stratum hits its proportions exactly —
    the stratified complement of dataset_split's global hash split.
    One shuffle on strata; rank order is recomputation-stable."""
    from infinidb_spark.operators.datasets import exact_stratified_split

    (docs,) = _t(spark, sf_dir, "documents")
    strat = docs.withColumn(
        "stratum", F.concat_ws("/", F.col("lang"), F.col("source"))
    )
    split = exact_stratified_split(
        strat, "doc_id", "stratum",
        {"train": 0.8, "val": 0.1, "test": 0.1}, portable=True,
    )
    return (
        split.groupBy("split", "stratum")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("split", "stratum")
    )


@query(
    "sequence_packing",
    oracle="""
    WITH d AS (
      -- empty-token rule mirrored from operators.text: split('')
      -- yields [''], which T.token_count counts as 0 tokens
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'), w -> w <> '')) AS BIGINT) AS n_tokens,
             ('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':shard')), 1, 14))::BIGINT
               % 8 AS shard
      FROM documents
    ),
    c AS (
      SELECT shard, doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM d
    )
    SELECT shard,
           CAST(floor(cum_before / 2048) AS BIGINT) AS bin_id,
           count(*)                                 AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)            AS tokens_total,
           round(sum(n_tokens) / 2048.0, 6)         AS fill
    FROM c
    GROUP BY shard, bin_id
    ORDER BY shard, bin_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing of documents into 2048-token training
    bins within 8 hash shards (operators/datasets.pack_sequences,
    portable-hash mode) — per-shard windows keep packing embarrassingly
    parallel at corpus scale; per-bin stats hash-checked."""
    from infinidb_spark.operators.datasets import pack_sequences, pack_stats

    (docs,) = _t(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(
        with_tokens, "doc_id", "n_tokens", budget=2048, n_shards=8, portable=True
    )
    return pack_stats(packed, "n_tokens", 2048).orderBy("shard", "bin_id")


@query(
    "token_heavy_hitters_cms",
    oracle="""
    WITH tok0 AS (
      SELECT unnest(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+')) AS tok
      FROM documents
    ),
    tok AS (SELECT tok FROM tok0 WHERE tok <> ''),
    j AS (SELECT unnest(range(4)) AS j),
    sketch AS (
      SELECT j.j,
             ('0x' || substr(md5(concat(tok, ':cms:', CAST(j.j AS VARCHAR))), 1, 14))::BIGINT % 512 AS bucket,
             count(*) AS counter
      FROM tok, j
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT tok, count(*) AS exact_n FROM tok GROUP BY tok
      ORDER BY exact_n DESC, tok LIMIT 12
    ),
    probes AS (
      SELECT e.tok, e.exact_n, j.j,
             ('0x' || substr(md5(concat(e.tok, ':cms:', CAST(j.j AS VARCHAR))), 1, 14))::BIGINT % 512 AS bucket
      FROM exact e, j
    )
    SELECT p.tok                                       AS tok,
           CAST(p.exact_n AS BIGINT)                   AS exact_n,
           CAST(min(coalesce(s.counter, 0)) AS BIGINT) AS est_n
    FROM probes p LEFT JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
    GROUP BY p.tok, p.exact_n
    ORDER BY exact_n DESC, tok
    """,
)
def token_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (operators/sketch.py, portable-
    hash mode): the d×w counter matrix AND the min-probe estimates are
    rebuilt literally by the DuckDB oracle — a hash match verifies every
    counter of the sketch, not just the final ranking.  Sketch size is
    fixed (≤ 4×512 rows) whatever the corpus size — the 100 TB shape."""
    from infinidb_spark.operators.sketch import cms_estimate, count_min_sketch

    (docs,) = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # Aggregate the token stream to (tok, exact_n) ONCE and build the
    # sketch from those counts (weight_col: sum(n) per bucket ==
    # count(*) over the raw stream by integer-sum re-association).  The
    # sketch build, the top-12 probe side and the final join all contain
    # the same groupBy("tok") exchange, so the corpus is scanned and
    # tokenized once (ReusedExchange) — the raw-stream form scanned it
    # three times, and exploded every token instance ×depth.
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    sketch = count_min_sketch(
        counts, "tok", depth=4, width=512, portable=True, weight_col="exact_n"
    )
    exact = counts.orderBy(F.desc("exact_n"), "tok").limit(12)
    est = cms_estimate(sketch, exact, "tok", depth=4, width=512, portable=True)
    return (
        exact.join(est, "tok")
        .select("tok", "exact_n", "est_n")
        .orderBy(F.desc("exact_n"), "tok")
    )


def _pq_oracle_sql(m: int = 8, k: int = 8, d0: int = 8, stride: int = 50) -> str:
    """DuckDB replay of pq_fit_encode's two Lloyd passes per subspace,
    with the identical determinism pins: stride seeds (first k by id),
    squared distances summed dim-by-dim left-to-right and rounded to
    9 dp before the argmin (ties → lowest code), centroid dim-means
    rounded to 9 dp."""

    def dist(a: str, b: str) -> str:
        return " + ".join(
            f"({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}])" for i in range(1, d0 + 1)
        )

    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 400
    ),
    ss AS (SELECT unnest(range(0, {m})) AS s),
    sub AS (
      SELECT vec_id, s, e[s*{d0}+1 : s*{d0}+{d0}] AS sv
      FROM v CROSS JOIN ss
    ),
    c0 AS (
      SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code,
             sv AS cv
      FROM sub WHERE vec_id % {stride} = 0
      QUALIFY row_number() OVER (PARTITION BY s ORDER BY vec_id) <= {k}
    ),
    s1 AS (
      SELECT sub.vec_id, sub.s, c0.code, sub.sv,
             round({dist('sub.sv', 'c0.cv')}, 9) AS d
      FROM sub JOIN c0 ON sub.s = c0.s
    ),
    a1 AS (
      SELECT vec_id, s, code, sv FROM s1
      QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code ASC) = 1
    ),
    dims AS (SELECT unnest(range(1, {d0 + 1})) AS i),
    d1 AS (SELECT s, code, i, sv[i] AS x FROM a1 CROSS JOIN dims),
    m1 AS (SELECT s, code, i, round(avg(x), 9) AS mval FROM d1 GROUP BY s, code, i),
    c1 AS (SELECT s, code, list(mval ORDER BY i) AS cv FROM m1 GROUP BY s, code),
    s2 AS (
      SELECT sub.vec_id, sub.s, c1.code,
             round({dist('sub.sv', 'c1.cv')}, 9) AS d
      FROM sub JOIN c1 ON sub.s = c1.s
    ),
    a2 AS (
      SELECT vec_id, s, code, d FROM s2
      QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code ASC) = 1
    )
    SELECT s AS subspace,
           CAST(count(DISTINCT code) AS BIGINT) AS codes_used,
           CAST(count(*) AS BIGINT)             AS n_vectors,
           round(avg(d), 6)                     AS avg_err2
    FROM a2 GROUP BY s ORDER BY subspace
    """


def _ivfpq_oracle_sql(
    k: int = 10,
    n_probe: int = 2,
    stride: int = 50,
    m: int = 8,
    kc: int = 8,
    d0: int = 8,
    k_max: int | None = None,
) -> str:
    """DuckDB replay of the ENTIRE ann_ivfpq_topk chain: IVF routing
    (stride centroids capped at the first ``k_max`` by vec_id, 9-dp
    cosine, ties → lowest cid), PQ codebook training (the
    _pq_oracle_sql Lloyd replay over the same corpus), the per-query
    LUT (literal query subvectors, left-to-right 8-term sums), and ADC
    scoring summed subspace 0..m-1 in literal order — no
    engine-dependent aggregation order anywhere."""

    def dist(a: str, b: str) -> str:
        return " + ".join(
            f"({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}])" for i in range(1, d0 + 1)
        )

    qsub_rows = ", ".join(
        "(%d, [%s])"
        % (s, ", ".join(repr(float(x)) for x in _QUERY_VEC[s * d0 : (s + 1) * d0]))
        for s in range(m)
    )
    adc_sum = " + ".join(f"max(CASE WHEN s = {s} THEN lv END)" for s in range(m))
    cap = f" ORDER BY vec_id LIMIT {k_max}" if k_max is not None else ""
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (SELECT vec_id AS cid, e AS cv FROM v WHERE vec_id % {stride} = 0{cap}),
    route AS (
      SELECT v.vec_id, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_cosine_similarity(v.e, c.cv), 9) DESC, c.cid
             ) AS rn
      FROM v, c
    ),
    cell AS (SELECT vec_id, cid FROM route WHERE rn = 1),
    probes AS (
      SELECT cid FROM c
      ORDER BY round(list_cosine_similarity(cv, {_QV_SQL}), 9) DESC, cid
      LIMIT {n_probe}
    ),
    ss AS (SELECT unnest(range(0, {m})) AS s),
    sub AS (
      SELECT vec_id, s, e[s*{d0}+1 : s*{d0}+{d0}] AS sv
      FROM v CROSS JOIN ss
    ),
    pq0 AS (
      SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code,
             sv AS cv
      FROM sub WHERE vec_id % {stride} = 0
      QUALIFY row_number() OVER (PARTITION BY s ORDER BY vec_id) <= {kc}
    ),
    pqs1 AS (
      SELECT sub.vec_id, sub.s, pq0.code, sub.sv,
             round({dist('sub.sv', 'pq0.cv')}, 9) AS d
      FROM sub JOIN pq0 ON sub.s = pq0.s
    ),
    pqa1 AS (
      SELECT vec_id, s, code, sv FROM pqs1
      QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code ASC) = 1
    ),
    dims AS (SELECT unnest(range(1, {d0 + 1})) AS i),
    pqd AS (SELECT s, code, i, sv[i] AS x FROM pqa1 CROSS JOIN dims),
    pqm AS (SELECT s, code, i, round(avg(x), 9) AS mval FROM pqd GROUP BY s, code, i),
    book AS (SELECT s, code, list(mval ORDER BY i) AS cv FROM pqm GROUP BY s, code),
    enc0 AS (
      SELECT sub.vec_id, sub.s, book.code,
             round({dist('sub.sv', 'book.cv')}, 9) AS d
      FROM sub JOIN book ON sub.s = book.s
    ),
    enc AS (
      SELECT vec_id, s, code FROM enc0
      QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code ASC) = 1
    ),
    qsub(s, qv) AS (VALUES {qsub_rows}),
    lut AS (
      SELECT book.s, book.code,
             round({dist('qsub.qv', 'book.cv')}, 9) AS lv
      FROM book JOIN qsub ON book.s = qsub.s
    ),
    cand AS (
      SELECT enc.vec_id, enc.s, lut.lv
      FROM enc
      JOIN cell ON enc.vec_id = cell.vec_id
      JOIN probes ON cell.cid = probes.cid
      JOIN lut ON enc.s = lut.s AND enc.code = lut.code
    )
    SELECT vec_id, round({adc_sum}, 6) AS approx_d2
    FROM cand GROUP BY vec_id
    ORDER BY approx_d2 ASC, vec_id
    LIMIT {k}
    """


@query("ann_ivfpq_topk", oracle=_ivfpq_oracle_sql(k_max=32))
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ ANN with asymmetric distance computation — the canonical
    billion-scale serving path (operators/embeddings.py ann_ivfpq_topk):
    IVF routes to n_probe cells, candidates score from PQ codes via a
    per-query LUT without touching raw vectors.  Completes the
    similarity family: brute-force / LSH / IVF-Flat / batched / IVF+PQ.
    Hash-checked: the oracle re-derives routing, codebooks, LUT, and
    ADC scores from the raw table in SQL.  ``k_max=32`` caps the IVF
    model at the first 32 stride samples — WITHOUT it K = N/stride
    grows with the corpus and routing becomes O(N·K) (the round-9
    sweep measured the uncapped form at 21.9×/decade, 130 s at sf1;
    capped it's ~3×); a fixed-size model is the only 100 TB shape."""
    from infinidb_spark.operators import embeddings as E

    (emb,) = _t(spark, sf_dir, "embeddings")
    return E.ann_ivfpq_topk(emb, _QUERY_VEC, k=10, n_probe=2, stride=50, k_max=32)


def _ivfpq_model() -> tuple[
    list[tuple[int, list[float]]], list[list[tuple[int, list[float]]]]
]:
    """The checked-in offline IVF+PQ model (scripts/train_ivfpq_model.py
    trains it once on the fixed sf0.001 reference corpus and writes
    plans/ivfpq_model.json).  Loading literals is the 100 TB serving
    contract: the model is k×dim + m×k×(dim/m) floats shipped to
    executors; no Lloyd pass ever runs at query time."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ivfpq_model.json"
    )
    with open(path) as fh:
        model = json.load(fh)
    centroids = [
        (int(c), [float(x) for x in v]) for c, v in model["centroids"]
    ]
    codebooks = [
        [(int(c), [float(x) for x in v]) for c, v in book]
        for book in model["codebooks"]
    ]
    return centroids, codebooks


def _ivfpq_pretrained_oracle_sql(k: int = 10, n_probe: int = 2) -> str:
    """DuckDB replay of the PRETRAINED serving path: the centroid /
    codebook / LUT literals come from the same checked-in JSON the
    Spark query loads, so the oracle verifies routing + ADC scoring
    without re-deriving the model (the inline-training twin
    ann_ivfpq_topk already pins the Lloyd replay)."""
    from infinidb_spark.operators.similarity import ivf_probe_ids

    centroids, codebooks = _ivfpq_model()
    m = len(codebooks)
    d0 = len(codebooks[0][0][1])
    probes = ivf_probe_ids(_QUERY_VEC, centroids, n_probe)
    q = [float(x) for x in _QUERY_VEC]
    # literal LUT — identical arithmetic (left-to-right, Python
    # round(·, 9)) to embeddings.ann_ivfpq_topk's LUT build, so both
    # engines consume byte-identical distance values
    lut_rows = []
    for s in range(m):
        for code, cv in codebooks[s]:
            d2 = 0.0
            for i, w in enumerate(cv):
                x = q[s * d0 + i] - w
                d2 = d2 + x * x
            lut_rows.append((s, code, round(d2, 9)))
    cent_vals = ", ".join(
        f"({cid}, [{', '.join(repr(x) for x in cv)}])" for cid, cv in centroids
    )
    book_vals = ", ".join(
        f"({s}, {code}, [{', '.join(repr(x) for x in cv)}])"
        for s in range(m)
        for code, cv in codebooks[s]
    )
    # CAST to DOUBLE: DuckDB reads bare decimal literals as DECIMAL,
    # which would carry decimal types through the ADC sum and round
    lut_vals = ", ".join(
        f"({s}, {code}, CAST({v!r} AS DOUBLE))" for s, code, v in lut_rows
    )
    probes_sql = ", ".join(str(p) for p in probes)
    dist = " + ".join(
        f"(sub.sv[{i}]-book.cv[{i}])*(sub.sv[{i}]-book.cv[{i}])"
        for i in range(1, d0 + 1)
    )
    adc_sum = " + ".join(f"max(CASE WHEN s = {s} THEN lv END)" for s in range(m))
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cent(cid, cv) AS (VALUES {cent_vals}),
    route AS (
      SELECT v.vec_id, v.e, cent.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_cosine_similarity(v.e, cent.cv), 9) DESC,
                        cent.cid
             ) AS rn
      FROM v, cent
    ),
    cand0 AS (SELECT vec_id, e FROM route WHERE rn = 1 AND cid IN ({probes_sql})),
    ss AS (SELECT unnest(range(0, {m})) AS s),
    sub AS (
      SELECT vec_id, s, e[s*{d0}+1 : s*{d0}+{d0}] AS sv
      FROM cand0 CROSS JOIN ss
    ),
    book(s, code, cv) AS (VALUES {book_vals}),
    enc AS (
      SELECT sub.vec_id, sub.s, book.code, round({dist}, 9) AS d
      FROM sub JOIN book ON sub.s = book.s
      QUALIFY row_number() OVER (
        PARTITION BY sub.vec_id, sub.s ORDER BY d ASC, book.code ASC
      ) = 1
    ),
    lut(s, code, lv) AS (VALUES {lut_vals}),
    cand AS (
      SELECT enc.vec_id, enc.s, lut.lv
      FROM enc JOIN lut ON enc.s = lut.s AND enc.code = lut.code
    )
    SELECT vec_id, round({adc_sum}, 6) AS approx_d2
    FROM cand GROUP BY vec_id
    ORDER BY approx_d2 ASC, vec_id
    LIMIT {k}
    """


@query("ann_ivfpq_topk_pretrained", oracle=_ivfpq_pretrained_oracle_sql())
def ann_ivfpq_topk_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ serving with a PRE-TRAINED model — the shape a user sizes
    a 100 TB cluster with: centroids + codebooks load from the
    checked-in JSON (scripts/train_ivfpq_model.py, trained once on the
    sf0.001 reference corpus), and the query is scan → literal-centroid
    routing projection → probe filter → literal-LUT ADC →
    TakeOrderedAndProject.  Zero joins, zero shuffles, ZERO inline
    Lloyd passes — unlike the ann_ivfpq_topk twin, whose documented
    linear sweep step is all training.  At scale the encoded corpus is
    m bytes/vector partitioned by cid; this query attests the serving
    arithmetic on the raw table (reference analog: a query against a
    prebuilt index, not an index build)."""
    from infinidb_spark.operators import embeddings as E

    centroids, codebooks = _ivfpq_model()
    (emb,) = _t(spark, sf_dir, "embeddings")
    return E.ann_ivfpq_topk(
        emb, _QUERY_VEC, k=10, n_probe=2,
        centroids=centroids, codebooks=codebooks,
    )


def _recall_oracle_sql(
    k: int = 10, n_probe: int = 2, stride: int = 50,
    k_max: int | None = None,
) -> str:
    """DuckDB replay of BOTH sides of the recall@k attestation: the
    exact brute-force top-k AND the IVF (batch) / IVF+PQ (canonical
    query) approximate top-k, joined into per-query hit counts.  Every
    ranking uses the engines' shared pins (6/9-dp rounding, vec_id
    tie-break), so the recall NUMBER itself is deterministic and
    hash-verifiable.  ``k_max`` caps the centroid model like
    train_ivf_centroids — recall is attested for the index actually
    SERVED (ann_ivf_topk uses k_max=32), not an uncapped one."""
    ivfpq = _ivfpq_oracle_sql(k=k, n_probe=n_probe, stride=stride, k_max=k_max)
    cap = f" ORDER BY vec_id LIMIT {k_max}" if k_max is not None else ""
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
    q AS (SELECT vec_id AS qid, ev AS qv FROM v
          WHERE vec_id % 97 = 3 AND vec_id < 2000),
    c AS (SELECT vec_id AS cid, ev AS cv FROM v WHERE vec_id % {stride} = 0{cap}),
    truth AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, v.vec_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(v.ev, q.qv), 6) DESC,
                          v.vec_id
               ) AS rn
        FROM v, q) WHERE rn <= {k}
    ),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_cosine_similarity(v.ev, c.cv), 9) DESC,
                          c.cid
               ) AS rn
        FROM v, c) WHERE rn = 1
    ),
    pranks AS (
      SELECT q.qid, c.cid,
             row_number() OVER (
               PARTITION BY q.qid
               ORDER BY round(list_cosine_similarity(c.cv, q.qv), 9) DESC,
                        c.cid
             ) AS rn
      FROM q, c
    ),
    ivf AS (
      SELECT np, qid, vec_id FROM (
        SELECT np.np, p.qid, v2.vec_id,
               row_number() OVER (
                 PARTITION BY np.np, p.qid
                 ORDER BY round(list_cosine_similarity(v2.ev, q.qv), 6) DESC,
                          v2.vec_id
               ) AS rn
        FROM (SELECT unnest([{n_probe}, {n_probe * 2}]) AS np) np
        JOIN pranks p ON p.rn <= np.np
        JOIN asg ON asg.cid = p.cid
        JOIN v v2 ON v2.vec_id = asg.vec_id
        JOIN q ON p.qid = q.qid) WHERE rn <= {k}
    )
    SELECT 'ivf_p' || CAST(np.np AS VARCHAR) AS variant,
           CAST(t.qid AS BIGINT)            AS query_id,
           CAST(count(i.vec_id) AS BIGINT)  AS hits,
           round(count(i.vec_id) / {float(k)}, 4) AS recall
    FROM (SELECT unnest([{n_probe}, {n_probe * 2}]) AS np) np
    CROSS JOIN truth t
    LEFT JOIN ivf i ON i.np = np.np AND t.qid = i.qid AND t.vec_id = i.vec_id
    GROUP BY np.np, t.qid
    UNION ALL
    SELECT 'ivfpq' AS variant,
           CAST(-1 AS BIGINT)               AS query_id,
           CAST(count(*) AS BIGINT)         AS hits,
           round(count(*) / {float(k)}, 4)  AS recall
    FROM ({ivfpq}) pq
    JOIN (
      SELECT vec_id FROM (
        SELECT vec_id,
               row_number() OVER (
                 ORDER BY round(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]), {_QV_SQL}), 6) DESC, vec_id
               ) AS rn
        FROM embeddings) WHERE rn <= {k}
    ) ex ON pq.vec_id = ex.vec_id
    ORDER BY variant, query_id
    """


@query("ann_recall_attest", oracle=_recall_oracle_sql(k_max=32))
def ann_recall_attest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index QUALITY attestation (VERDICT-r05 #5): recall@10 of the
    IVF index over a deterministic query batch at n_probe = 2 and 4
    (the recall/probe tradeoff curve), plus recall@10 of the IVF+PQ
    chain for the canonical query, each against the exact brute-force
    top-k on the same vectors.  Determinism was already proven; this
    makes index QUALITY itself a hash-verified number.  The pinned
    floors (mean recall, monotonicity in n_probe) are asserted in
    tests/test_bucketed.py::test_ann_recall_floor."""
    from infinidb_spark.operators import embeddings as E

    (emb,) = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 97 == 3) & (F.col("vec_id") < 2000)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    # ONE centroid training and ONE brute-force truth plan shared by
    # both n_probe points (identical truth subplans collapse to a
    # ReusedExchange) — the O(corpus×queries) pass is paid once, which
    # matters because this query also runs at the sweep's sf1 tier
    # k_max=32: attest the index users actually SERVE (ann_ivf_topk /
    # ann_ivfpq_topk cap the model at 32); an uncapped K=N/stride model
    # would also make routing O(N·K) at sweep tiers
    cents = S.train_ivf_centroids(emb, 50, k_max=32)
    truth = S.cosine_topk_batch(emb, queries, 10)
    parts = [
        S.ann_recall_at_k(
            emb, queries, k=10, n_probe=np, centroids=cents, truth=truth
        ).select(
            F.lit(f"ivf_p{np}").alias("variant"),
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("hits"),
            F.col("recall"),
        )
        for np in (2, 4)
    ]
    ivf = parts[0].unionByName(parts[1])
    exact = S.cosine_topk(emb, _QUERY_VEC, k=10).select("vec_id")
    # centroids=cents: ann_ivfpq_topk would otherwise RETRAIN the
    # identical routing model (same df/stride/k_max; train_ivf_centroids
    # is deterministic by contract) — one full seed-collect + Lloyd
    # pass paid twice per gate run (measured ~2 s of this query's
    # ~10.7 s sf0.01 wall, guide §1.2: don't compute what you throw
    # away).  The PQ codebooks have no earlier twin, so they still
    # train here.
    pq = E.ann_ivfpq_topk(
        emb, _QUERY_VEC, k=10, n_probe=2, stride=50, k_max=32,
        centroids=cents,
    ).select("vec_id")
    pqdf = (
        pq.join(exact, "vec_id")
        .agg(F.count(F.lit(1)).alias("hits"))
        .select(
            F.lit("ivfpq").alias("variant"),
            F.lit(-1).cast("bigint").alias("query_id"),
            F.col("hits"),
            F.round(F.col("hits") / 10.0, 4).alias("recall"),
        )
    )
    return ivf.unionByName(pqdf).orderBy("variant", "query_id")


@query("embedding_pq", oracle=_pq_oracle_sql())
def embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization train+encode (operators/embeddings.py
    pq_fit_encode): per-subspace Euclidean Lloyd codebooks from stride
    seeds, map-only encoding, bounded k×dim model collects — the PQ
    compression half of the canonical IVF+PQ billion-scale ANN index
    (ann_ivf_topk is the routing half).  Output: per-subspace codebook
    utilization + mean squared reconstruction error."""
    from infinidb_spark.operators import embeddings as E

    (emb,) = _t(spark, sf_dir, "embeddings")
    enc = E.pq_fit_encode(emb.filter(F.col("vec_id") < 400))
    return (
        enc.groupBy("subspace")
        .agg(
            F.count_distinct("code").alias("codes_used"),
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("err2"), 6).alias("avg_err2"),
        )
        .orderBy("subspace")
    )


def _rp_oracle_sql(out_dim: int = 8, in_dim: int = 64) -> str:
    """DuckDB oracle for embedding_random_projection: the SAME seeded
    sign matrix (operators/embeddings.py projection_signs) rendered as
    ``± v[i]`` term chains — left-fold order and sign-by-subtraction
    are IEEE-identical to the Spark fold, so values match bit-for-bit
    before the shared 6-dp round."""
    import math

    from infinidb_spark.operators.embeddings import projection_signs

    inv = repr(1.0 / math.sqrt(out_dim))
    dims = []
    for j, row in enumerate(projection_signs(out_dim, in_dim)):
        # the chain starts at 0.0 because Spark's aggregate folds from
        # a 0.0 seed — ((0.0 ± v1) ± v2) ... keeps the IEEE order
        # identical on both engines
        chain = "0.0 " + " ".join(
            f"{'+' if s > 0 else '-'} v[{i + 1}]" for i, s in enumerate(row)
        )
        dims.append(
            f"SELECT vec_id, {j} AS dim, round(({chain}) * {inv}, 6) AS value FROM v"
        )
    union = " UNION ALL ".join(dims)
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT vec_id, dim, value FROM ({union})
    ORDER BY vec_id, dim
    """


@query("embedding_random_projection", oracle=_rp_oracle_sql())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection (operators/embeddings.py
    random_projection): the train-free 64→8 dimensionality cut for ANN
    candidate generation, exposed per (vec_id, dim) so the hash compare
    sees scalars.  Seeded sign matrix shared with the oracle; the fold
    is IEEE-deterministic, 6-dp round on both sides."""
    from infinidb_spark.operators import embeddings as E

    (emb,) = _t(spark, sf_dir, "embeddings")
    proj = E.random_projection(F.col("embedding"), out_dim=8, in_dim=64)
    return (
        emb.select("vec_id", F.posexplode(proj).alias("dim", "value"))
        .select("vec_id", "dim", F.round("value", 6).alias("value"))
        .orderBy("vec_id", "dim")
    )


@query(
    "embedding_quantize",
    oracle="""
    WITH v AS (
      SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    s AS (
      SELECT label, v,
             greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS scale
      FROM v
    ),
    e AS (
      SELECT label, scale,
             list_transform(v, x -> abs(x - floor(x / scale + 0.5) * scale)) AS err
      FROM s
    )
    SELECT label,
           count(*)                                              AS n_vecs,
           round(avg(scale), 9)                                  AS avg_scale,
           round(max(list_max(err)), 9)                          AS max_abs_err,
           round(avg(list_sum(err) / len(err)), 9)               AS mean_abs_err
    FROM e
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit (operators/embeddings.py):
    per-label reconstruction-error stats of the 4x-compressed vector
    store.  Arithmetic is floor-based (IEEE-deterministic), so the
    DuckDB oracle reproduces every error term bit-for-bit; the round(9)
    on the aggregates only absorbs cross-row summation order."""
    from infinidb_spark.operators import embeddings as E

    (emb,) = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    with_err = emb.withColumn("scale", E.quant_scale(v)).withColumn(
        "err", E.quant_abs_errors(v, F.col("scale"))
    )
    dim = F.size("err")
    return (
        with_err.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("scale"), 9).alias("avg_scale"),
            F.round(F.max(F.array_max("err")), 9).alias("max_abs_err"),
            F.round(
                F.avg(F.aggregate("err", F.lit(0.0), lambda a, x: a + x) / dim), 9
            ).alias("mean_abs_err"),
        )
        .orderBy("label")
    )


@query(
    "corpus_mixture",
    oracle="""
    WITH w AS (
      SELECT *,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                         WHEN 'src2' THEN 0.0 ELSE 0.25 END AS wt,
             ('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':mixture')), 1, 14))::BIGINT
               % 10000 AS bucket
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, n_chars,
             -- integerized fractional cutoff, mirroring the operator
             CAST(floor(wt) AS BIGINT)
               + CAST(bucket < CAST(round((wt - floor(wt)) * 10000, 0) AS BIGINT)
                      AS BIGINT) AS reps
      FROM w
    ),
    sampled AS (
      SELECT source, doc_id, n_chars, unnest(range(reps)) AS epoch
      FROM r WHERE reps > 0
    )
    SELECT source,
           count(*)                            AS n_rows,
           count(DISTINCT doc_id)              AS n_docs,
           CAST(max(epoch) AS BIGINT)          AS max_epoch,
           CAST(sum(n_chars) AS BIGINT)        AS chars_total
    FROM sampled
    GROUP BY source
    ORDER BY source
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted corpus mixture (operators/datasets.py
    mixture_sample, portable-hash mode): src0 upsampled 2.5x (epoch
    copies), src1 kept, src2 dropped, the rest downsampled to 25% —
    the source-weighting step of an LLM data pipeline.  Map-only +
    explode, zero shuffle; the oracle replays the md5 bucket math and
    epoch expansion literally."""
    from infinidb_spark.operators.datasets import mixture_sample

    (docs,) = _t(spark, sf_dir, "documents")
    mixed = mixture_sample(
        docs,
        "source",
        {"src0": 2.5, "src1": 1.0, "src2": 0.0},
        key_col="doc_id",
        default_weight=0.25,
        portable=True,
    )
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("epoch").alias("max_epoch"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("source")
    )


@query(
    "eval_decontamination",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
             ('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':split')), 1, 14))::BIGINT
               % 10000 AS bucket
      FROM documents
    ),
    labeled AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t,
             CASE WHEN bucket < 8000 THEN 'train'
                  WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split
      FROM s
    ),
    grams AS (
      SELECT doc_id, split,
             ('0x' || substr(md5(g), 1, 14))::BIGINT AS h
      FROM (
        SELECT doc_id, split,
               unnest([substr(t, i, 8)
                       for i in range(1, greatest(length(t) - 7, 1) + 1)]) AS g
        FROM labeled
      )
    ),
    test_grams AS (SELECT DISTINCT h FROM grams WHERE split = 'test'),
    train_grams AS (SELECT DISTINCT doc_id, h FROM grams WHERE split = 'train'),
    totals AS (SELECT doc_id, count(*) AS n_grams FROM train_grams GROUP BY doc_id),
    shared AS (
      SELECT tg.doc_id, count(*) AS n_shared
      FROM train_grams tg JOIN test_grams USING (h)
      GROUP BY tg.doc_id
    )
    SELECT s.doc_id, s.n_shared, t.n_grams,
           round(s.n_shared / CAST(t.n_grams AS DOUBLE), 6) AS overlap
    FROM shared s JOIN totals t USING (doc_id)
    WHERE s.n_shared >= 20
    ORDER BY overlap DESC, doc_id
    """,
)
def eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination — the data-hygiene step of an LLM
    pipeline: flag TRAIN documents sharing character 8-grams with the
    held-out TEST split (hash_split, portable mode), ranked by overlap
    ratio.  Plan: explode the train split's 8-gram hashes in one pass,
    LEFT-join against the broadcast DISTINCT test gram set, and compute
    both per-doc totals (all grams / shared grams) in a single
    aggregation — at 100 TB the test gram set is small (eval sets are),
    so the join broadcasts and the train corpus is scanned once.  The
    oracle replays the split buckets, the md5 gram hashes, and the
    thresholds literally."""
    from infinidb_spark.operators.datasets import hash_split

    (docs,) = _t(spark, sf_dir, "documents")
    labeled = hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, portable=True
    ).select("doc_id", "split", D.normalize_text(F.col("text")).alias("_t"))
    # one O(len) regex pass per doc (operators.dedup.shingle_array) — the
    # per-position substr form was O(len²) per document (r11 optimization;
    # same equivalence contract incl. the short-doc partial gram)
    grams = labeled.select(
        "doc_id",
        "split",
        F.explode(D.shingle_array(F.col("_t"), 8)).alias("_g"),
    ).select(
        "doc_id",
        "split",
        D.md5_hash56(F.col("_g")).alias("h"),
    )
    test_grams = grams.filter(F.col("split") == "test").select("h").distinct()
    train_grams = grams.filter(F.col("split") == "train").select("doc_id", "h").distinct()
    # n_grams and n_shared come out of ONE aggregation over the distinct
    # train grams: a LEFT join against the broadcast test set (distinct on
    # h, so it can never duplicate a train row) marks shared grams, then
    # count(*) vs count(_hit) split the two totals.  The previous
    # shared-join-totals form consumed train_grams twice, and Spark
    # recomputes unreferenced subtrees: the train corpus was scanned,
    # exploded and md5-hashed twice (plus the inner join's inferred
    # isnotnull(h) re-evaluated the md5 in the scan-stage Filter).
    marked = train_grams.join(
        F.broadcast(test_grams.withColumn("_hit", F.lit(1))), "h", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.col("_hit")).alias("n_shared"),
        )
        .filter(F.col("n_shared") >= 20)
        .select(
            "doc_id",
            "n_shared",
            "n_grams",
            F.round(F.col("n_shared") / F.col("n_grams"), 6).alias("overlap"),
        )
        .orderBy(F.desc("overlap"), "doc_id")
    )


@query(
    "multimodal_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             ['image', 'audio', 'video'][(doc_id % 3) + 1] AS modality,
             octet_length(encode(text)) AS in_bytes,
             (doc_id % 640 + 32) * (doc_id % 480 + 32) AS in_area
      FROM documents
    ),
    r AS (
      SELECT media_id, modality, in_bytes,
             greatest(
               CAST(floor(in_bytes * least(224.0 * 224.0 / in_area, 1.0)) AS BIGINT),
               1) AS out_bytes
      FROM m
    )
    SELECT modality,
           count(*)                      AS n,
           CAST(sum(in_bytes) AS BIGINT)  AS in_total,
           CAST(sum(out_bytes) AS BIGINT) AS out_total
    FROM r GROUP BY modality ORDER BY modality
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/resample pass over the media table (operators/multimodal.
    resize_media — Arrow mapInPandas, interpolation stubbed): per-
    modality byte totals before/after normalizing to 224x224.  The
    oracle reproduces the synthetic metadata and the area-ratio output
    sizing exactly; payload content is pinned by unit tests."""
    (docs,) = _t(spark, sf_dir, "documents")
    media = M.synthesize_media(docs)
    resized = M.resize_media(media, 224, 224)
    return (
        resized.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("in_bytes").alias("in_total"),
            F.sum("out_bytes").alias("out_total"),
        )
        .orderBy("modality")
    )


@query(
    "corpus_curation_pipeline",
    # composed from the shared quality fragments (ONE source of truth
    # with dedup_keep_best / streaming_quality_gate / text_analyze —
    # a ladder or stopword tweak can never leave this oracle stale);
    # `d` is joined back in for the md5(t) dedup key
    oracle=f"""
    WITH {_quality_base_cte("TRUE")},
    scored AS (
      SELECT li.doc_id, d.t, li.n_chars,
             {_QUALITY_LADDER_SQL} AS qual
      FROM {_LADDER_INPUT_SQL} li JOIN d ON d.doc_id = li.doc_id
    ),
    kept AS (SELECT * FROM scored WHERE qual >= 0.5),
    survivors AS (
      SELECT doc_id, n_chars, qual FROM kept
      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(t))
    ),
    split AS (
      SELECT *,
             CASE WHEN ('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':split')), 1, 14))::BIGINT
                       % 10000 < 8000 THEN 'train'
                  WHEN ('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':split')), 1, 14))::BIGINT
                       % 10000 < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM survivors
    )
    SELECT split,
           count(*)                      AS n_docs,
           round(avg(qual), 6)           AS avg_quality,
           CAST(sum(n_chars) AS BIGINT)  AS chars_total
    FROM split GROUP BY split ORDER BY split
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation flow every stage of this engine exists
    for, composed: quality-score filter (operators/text.py) → exact
    near-identity dedup keeping the lowest id per normalized-content
    hash → recomputation-stable train/val/test split
    (operators/datasets.py, portable mode) → per-split corpus stats.
    One scan + one dedup shuffle + one map-only split — the whole
    pipeline is two exchanges at any scale.  The DuckDB oracle replays
    every stage (score thresholds, md5 dedup, split buckets) literally."""
    from pyspark.sql import Window

    from infinidb_spark.operators.datasets import hash_split

    (docs,) = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        D.normalize_text(F.col("text")).alias("_t"),
        F.length(D.normalize_text(F.col("text"))).alias("n_chars"),
        T.quality_score(F.col("text")).alias("qual"),
    )
    kept = scored.filter(F.col("qual") >= 0.5)
    w = Window.partitionBy(F.md5("_t"))
    survivors = kept.withColumn("_min_id", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("_min_id")
    )
    split = hash_split(
        survivors, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, portable=True
    )
    return (
        split.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("qual"), 6).alias("avg_quality"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("split")
    )


@query(
    "data_profile_histogram",
    oracle="""
    WITH stats AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    ),
    b AS (
      SELECT CAST(floor((o_totalprice - lo) / ((hi + 1e-9 - lo) / 20)) AS BIGINT) + 1
               AS bucket,
             o_totalprice
      FROM orders, stats
    )
    SELECT CAST(bucket AS BIGINT)        AS bucket,
           count(*)                      AS n,
           round(min(o_totalprice), 4)   AS lo,
           round(max(o_totalprice), 4)   AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def data_profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution profiling: 20-bucket equi-width histogram of
    order totals (explicit floor-bucket arithmetic against the observed
    min/max, identical IEEE on both engines), per-bucket counts and
    actual bounds — the data-profiling companion to operators/
    validate.py.  The bounds come in as SCALAR SUBQUERIES (planned as
    one-row subquery jobs, results inlined into the scan — no join
    node), so both passes are plain single scans at any scale."""
    _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH b AS (
          SELECT CAST(floor((o_totalprice - (SELECT min(o_totalprice) FROM orders))
                   / (((SELECT max(o_totalprice) FROM orders) + 1e-9
                       - (SELECT min(o_totalprice) FROM orders)) / 20)) AS BIGINT) + 1
                   AS bucket,
                 o_totalprice
          FROM orders
        )
        SELECT bucket,
               count(*)                    AS n,
               round(min(o_totalprice), 4) AS lo,
               round(max(o_totalprice), 4) AS hi
        FROM b GROUP BY bucket ORDER BY bucket
        """
    )


def _cc_oracle_sql() -> str:
    """DuckDB oracle for dedup_clusters: the portable MinHash pair
    pipeline (same CTE text as dedup_minhash_portable's oracle) feeding
    a recursive-CTE min-label propagation — every node's cluster_id is
    the minimum doc_id reachable through the pair graph, the same
    fixpoint the distributed loop converges to."""
    return f"""
    WITH RECURSIVE pv AS ({_minhash_oracle_sql(threshold=0.25, doc_filter="doc_id < 500")}),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pv
      UNION
      SELECT id_b, id_a FROM pv
    ),
    reach(id, lab) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lab FROM edges e JOIN reach r ON r.id = e.d
    ),
    cc AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id)
    SELECT id AS doc_id, cluster_id, (cluster_id = id) AS is_keeper
    FROM cc ORDER BY doc_id
    """


@query("dedup_clusters", oracle=_cc_oracle_sql())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: portable MinHash pairs → distributed
    connected components (min-label propagation, operators/dedup.py
    connected_components) → one keeper per cluster (the minimum id).
    The step that turns pairwise dedup output into a drop decision —
    without it, transitive duplicate chains (A~B, B~C) keep A and C.
    Oracle replays the whole thing in DuckDB: the portable-hash pair
    pipeline + a recursive CTE computing min reachable id."""
    (docs,) = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs.filter(F.col("doc_id") < 500),
        n_hashes=16,
        bands=4,
        jaccard_threshold=0.25,
        portable_hash=True,
    )
    labels = D.connected_components(pairs)
    return labels.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        (F.col("cluster_id") == F.col("id")).alias("is_keeper"),
    ).orderBy("doc_id")


def _keep_best_oracle_sql() -> str:
    """DuckDB oracle for dedup_keep_best: the portable MinHash pair CTE
    + recursive-CTE connected components (same text as dedup_clusters'
    oracle) + the quality CASE ladder (same text as text_analyze's
    oracle, en stopword inventory embedded from operators.text), with
    the keeper chosen by row_number over (quality DESC, doc_id)."""
    return f"""
    WITH RECURSIVE pv AS ({_minhash_oracle_sql(threshold=0.25, doc_filter="doc_id < 500")}),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pv
      UNION
      SELECT id_b, id_a FROM pv
    ),
    reach(id, lab) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lab FROM edges e JOIN reach r ON r.id = e.d
    ),
    cc AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id),
    {_quality_base_cte("doc_id < 500")},
    q AS (
      SELECT doc_id, {_QUALITY_LADDER_SQL} AS quality
      FROM {_LADDER_INPUT_SQL}
    ),
    lab AS (
      SELECT q.doc_id, coalesce(cc.cluster_id, q.doc_id) AS cluster_id, q.quality
      FROM q LEFT JOIN cc ON cc.id = q.doc_id
    )
    SELECT doc_id, cluster_id, quality,
           (row_number() OVER (PARTITION BY cluster_id
                               ORDER BY quality DESC, doc_id) = 1) AS is_keeper
    FROM lab ORDER BY doc_id
    """


@query("dedup_keep_best", oracle=_keep_best_oracle_sql())
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection BY QUALITY — the decision step
    after near-dup mining: portable MinHash pairs → connected
    components → keep the highest-quality doc per cluster (min-id
    tie-break), singletons keep themselves
    (operators/dedup.py keep_best_in_clusters).  Where dedup_clusters
    keeps the MIN-ID doc, a production pipeline keeps the BEST doc;
    the oracle replays pairs, the recursive-CTE components, the
    quality CASE ladder, and the keeper window in DuckDB."""
    (docs,) = _t(spark, sf_dir, "documents")
    sub = docs.filter(F.col("doc_id") < 500)
    pairs = D.minhash_lsh_pairs(
        sub, n_hashes=16, bands=4, jaccard_threshold=0.25, portable_hash=True
    )
    out = D.keep_best_in_clusters(sub, pairs, T.quality_score(F.col("text")))
    return out.select(
        F.col("id").alias("doc_id"), "cluster_id", "quality", "is_keeper"
    ).orderBy("doc_id")


#: deterministic fake-PII injection, derived from doc_id — the synthetic
#: corpus contains no PII, so the scrub demo embeds its own (same
#: arithmetic in the oracle); the OPERATOR (operators/text.py PII_RULES)
#: is the real artifact.
def _pii_injected() -> F.Column:
    did = F.col("doc_id")
    return F.concat_ws(
        " ",
        F.col("text"),
        F.lit("contact"),
        F.concat(F.lit("user"), did.cast("string"), F.lit("@example.com")),
        F.lit("tel"),
        F.concat(
            F.lit("555-"),
            F.lpad(((did * 7) % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(((did * 13) % 10000).cast("string"), 4, "0"),
        ),
        F.lit("ssn"),
        F.concat(F.lit("123-45-"), F.lpad((did % 10000).cast("string"), 4, "0")),
        F.lit("from"),
        F.concat(F.lit("10.0."), (did % 256).cast("string"), F.lit(".7")),
    )


def _pii_oracle_sql() -> str:
    from infinidb_spark.operators.text import PII_RULES

    counts = ", ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_RULES
    )
    scrub = "t"
    for _, pat, token in PII_RULES:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
    WITH d AS (
      SELECT doc_id, concat_ws(' ', text,
        'contact', 'user' || CAST(doc_id AS VARCHAR) || '@example.com',
        'tel', '555-' || lpad(CAST((doc_id*7) % 1000 AS VARCHAR), 3, '0')
               || '-' || lpad(CAST((doc_id*13) % 10000 AS VARCHAR), 4, '0'),
        'ssn', '123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        'from', '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7') AS t
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, {counts}, {scrub} AS scrubbed
    FROM d ORDER BY doc_id
    """


@query("text_pii_scrub", oracle=_pii_oracle_sql())
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/text.py scrub_pii / pii_counts): typed
    placeholder tokens for emails, SSNs, phones, and IPv4s, plus the
    per-category audit counts — pure regexp Column expressions, a
    single map-only scan at any scale.  RE2-compatible rule set so the
    identical patterns run in Spark and the DuckDB oracle; the scrubbed
    text itself is hash-verified."""
    from infinidb_spark.operators.text import PII_RULES, pii_counts, scrub_pii

    (docs,) = _t(spark, sf_dir, "documents")
    t = _pii_injected()
    names = [f"n_{name}" for name, _, _ in PII_RULES]
    counts = [
        c.cast("bigint").alias(a) for c, a in zip(pii_counts(t), names)
    ]
    return (
        docs.filter(F.col("doc_id") < 200)
        .select("doc_id", *counts, scrub_pii(t).alias("scrubbed"))
        .orderBy("doc_id")
    )


@query(
    "text_repetition",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                                '\\s+') AS w
      FROM documents WHERE doc_id < 400
    ),
    g AS (
      -- docs with < 2 tokens have no bigrams and emit no row (mirrors
      -- repetition_signals' short-doc rule: no partial grams)
      SELECT doc_id,
             unnest([concat_ws(' ', w[i], w[i+1])
                     for i in range(1, greatest(len(w) - 1, 0) + 1)]) AS gram
      FROM d
    ),
    pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT)               AS n_ngrams,
           round(max(c) / sum(c), 6)            AS top_ngram_share,
           round(count(*) / sum(c), 6)          AS distinct_ngram_frac
    FROM pg GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (operators/text.py
    repetition_signals): top-bigram share and distinct-bigram fraction
    per document — the Gopher/MassiveText-style boilerplate filters.
    Two codegen'd aggregations over exploded n-gram rows; scales as a
    word-count job.  Oracle replays the identical arithmetic in
    DuckDB."""
    (docs,) = _t(spark, sf_dir, "documents")
    return T.repetition_signals(docs.filter(F.col("doc_id") < 400)).orderBy(
        "doc_id"
    )


#: DuckDB replay of the two Lloyd iterations with the identical
#: determinism pins: stride seeds, cosine rounded to 9 dp before the
#: argmax (ties -> lowest cid), centroid dim-means rounded to 9 dp.
#: Ends with the final assignment relation a2(vec_id, cid, sim).
_KMEANS_CTE = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 200
    ),
    c0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % 50 = 0),
    s1 AS (
      SELECT v.vec_id, v.e, c0.cid,
             round(list_dot_product(v.e, c0.ce)
                   / (sqrt(list_dot_product(v.e, v.e))
                      * sqrt(list_dot_product(c0.ce, c0.ce))), 9) AS sim
      FROM v CROSS JOIN c0
    ),
    a1 AS (
      SELECT vec_id, e, cid FROM s1
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) = 1
    ),
    d1 AS (SELECT cid, unnest(range(1, 65)) AS dd, unnest(e) AS x FROM a1),
    m1 AS (SELECT cid, dd, round(avg(x), 9) AS m FROM d1 GROUP BY cid, dd),
    c1 AS (SELECT cid, list(m ORDER BY dd) AS ce FROM m1 GROUP BY cid),
    s2 AS (
      SELECT v.vec_id, c1.cid,
             round(list_dot_product(v.e, c1.ce)
                   / (sqrt(list_dot_product(v.e, v.e))
                      * sqrt(list_dot_product(c1.ce, c1.ce))), 9) AS sim
      FROM v CROSS JOIN c1
    ),
    a2 AS (
      SELECT vec_id, cid, sim FROM s2
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) = 1
    )"""


@query(
    "embedding_kmeans",
    oracle=_KMEANS_CTE + """
    SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(sim), 6) AS cohesion
    FROM a2 GROUP BY cid ORDER BY cluster_id
    """,
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means over embeddings (operators/similarity.py
    kmeans_fit_predict): 2 Lloyd iterations from stride seeds, cosine
    assignment as a pure projection, centroid update as one exploded-
    dims aggregation with a bounded k×dim model collect — the
    cluster-balanced-sampling / semantic-bucketing primitive.  Output:
    per-cluster size + mean assignment cosine (cohesion)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    labels = S.kmeans_fit_predict(emb.filter(F.col("vec_id") < 200))
    return (
        labels.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("sim"), 6).alias("cohesion"),
        )
        .orderBy("cluster_id")
    )


@query(
    "cluster_balanced_sample",
    oracle=_KMEANS_CTE + """
    , ranked AS (
      SELECT vec_id, cid,
             row_number() OVER (
               PARTITION BY cid
               ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 7))::BIGINT,
                        vec_id
             ) AS rk
      FROM a2
    )
    SELECT cid AS cluster_id, vec_id
    FROM ranked WHERE rk <= 10
    ORDER BY cluster_id, vec_id
    """,
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling: k-means labels → take the same number
    of vectors from EVERY cluster (here 10), ordered by a deterministic
    per-id hash — the anti-mode-collapse sampling step a training
    pipeline runs after semantic bucketing (over-represented clusters
    are capped, rare ones fully kept).  Composition of
    kmeans_fit_predict + one ranking window per cluster; the hash order
    makes the sample recomputation-stable, never data-order-dependent."""
    from pyspark.sql import Window

    (emb,) = _t(spark, sf_dir, "embeddings")
    labels = S.kmeans_fit_predict(emb.filter(F.col("vec_id") < 200))
    h = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 7), 16, 10
    ).cast("long")
    w = Window.partitionBy("cluster_id").orderBy(h, F.col("vec_id"))
    return (
        labels.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("cluster_id", "vec_id")
        .orderBy("cluster_id", "vec_id")
    )


@query(
    "dedup_semantic",
    oracle=_KMEANS_CTE + """
    , vv AS (SELECT a2.vec_id, a2.cid, v.e FROM a2 JOIN v USING (vec_id)),
    ok AS (SELECT cid FROM vv GROUP BY cid HAVING count(*) <= 1000),
    vc AS (SELECT vv.* FROM vv JOIN ok USING (cid)),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM vc a JOIN vc b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.e, b.e) >= 0.3
    ),
    r AS (SELECT id_b AS vec_id, min(id_a) AS rep FROM p GROUP BY id_b)
    SELECT a2.vec_id, a2.cid AS cluster_id,
           coalesce(r.rep, a2.vec_id) AS rep_id,
           CAST(CASE WHEN r.rep IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup
    FROM a2 LEFT JOIN r USING (vec_id)
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/similarity.py
    semantic_dedup): deterministic spherical k-means bounds the
    candidate space, exact cosine >= 0.3 within clusters only, min-id
    representative — the cluster-then-prune member of the dedup family
    (vs LSH-bucketed dedup_embedding_cosine).  Hash-checked: the oracle
    replays the full Lloyd iterations AND the in-cluster pruning."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb.filter(F.col("vec_id") < 200), threshold=0.3)


@query(
    "dedup_semantic_incremental",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < 200
    ),
    c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 150 AND vec_id % 50 = 0),
    asg AS (
      SELECT v.vec_id, v.e, c.cid,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY round(list_cosine_similarity(v.e, c.ce), 9) DESC, c.cid
             ) AS rn
      FROM v CROSS JOIN c
    ),
    a1 AS (SELECT vec_id, e, cid FROM asg WHERE rn = 1),
    batch AS (SELECT * FROM a1 WHERE vec_id >= 150),
    touched AS (SELECT DISTINCT cid FROM batch),
    members AS (SELECT a1.* FROM a1 JOIN touched USING (cid)),
    ok AS (SELECT cid FROM members GROUP BY cid HAVING count(*) <= 1000),
    vc AS (SELECT members.* FROM members JOIN ok USING (cid)),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM vc a JOIN vc b
        ON a.cid = b.cid AND a.vec_id < b.vec_id AND b.vec_id >= 150
      WHERE list_cosine_similarity(a.e, b.e) >= 0.3
    ),
    r AS (SELECT id_b AS vec_id, min(id_a) AS rep FROM p GROUP BY id_b)
    SELECT batch.vec_id, batch.cid AS cluster_id,
           coalesce(r.rep, batch.vec_id) AS rep_id,
           CAST(CASE WHEN r.rep IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_dup
    FROM batch LEFT JOIN r USING (vec_id)
    """,
)
def dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup (operators/similarity.py
    semantic_dedup_incremental): a new batch (vec_id 150-199) vs the
    STORED cluster index of the corpus (vec_id < 150, fixed stride
    centroids) — only clusters with a new member are read, old-vs-old
    pairs excluded, per-batch work independent of corpus size.
    Hash-checked: the oracle replays assignment, cluster pruning, and
    pairing from the raw table."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") < 150)
    batch = emb.filter((F.col("vec_id") >= 150) & (F.col("vec_id") < 200))
    centroids = S.train_ivf_centroids(corpus, stride=50)
    vec = F.col("embedding").cast("array<double>")
    corpus_index = corpus.select(
        "vec_id",
        vec.alias("embedding"),
        S.ivf_assign_expr(
            "CAST(`embedding` AS ARRAY<DOUBLE>)", centroids
        ).alias("cid"),
    )
    return S.semantic_dedup_incremental(
        batch, corpus_index, centroids, threshold=0.3
    )


# --- incremental dedup: new batch vs stored corpus artifacts -----------
# The 100 TB operating mode: the corpus is NEVER re-processed per batch.
# Exact dedup keeps a content-hash relation; near-dup keeps the MinHash
# signature store (n longs/doc).  Each nightly batch shingles only
# itself and joins the stored artifacts.  Batch split for the corpus
# queries: doc_id % 5 == 0 is "tonight's batch", the rest is the
# standing corpus.


@query(
    "dedup_exact_incremental",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
      FROM documents
    ),
    corpus AS (SELECT DISTINCT content_hash FROM h WHERE doc_id % 5 != 0),
    batch  AS (SELECT * FROM h WHERE doc_id % 5 = 0)
    SELECT b.doc_id, b.content_hash,
           CASE WHEN c.content_hash IS NOT NULL THEN 'corpus_dup'
                WHEN b.doc_id > min(b.doc_id) OVER (PARTITION BY b.content_hash)
                     THEN 'batch_dup'
                ELSE 'new' END AS status
    FROM batch b LEFT JOIN corpus c ON b.content_hash = c.content_hash
    """,
)
def dedup_exact_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental dedup: tonight's batch against the stored
    content-hash relation — corpus ships hashes only, one shuffle on the
    hash (operators/dedup.py dedup_exact_incremental)."""
    (docs,) = _t(spark, sf_dir, "documents")
    corpus_hashes = D.dedup_exact(docs.filter(F.col("doc_id") % 5 != 0))
    return D.dedup_exact_incremental(
        docs.filter(F.col("doc_id") % 5 == 0), corpus_hashes
    )


def _minhash_incr_oracle_sql(
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    est_threshold: float = 0.5,
    cap: int = 1000,
) -> str:
    """DuckDB oracle for minhash_lsh_pairs_incremental(portable_hash=
    True): same md5 shingle hashes / signature family / string band keys
    as _minhash_oracle_sql, pair filter keeps only pairs touching the
    new batch, verify = matching-minima fraction (Broder's estimator)."""
    p31 = (1 << 31) - 1
    params = [((a % (p31 - 1)) + 1, b % p31) for a, b in D._hash_params(n_hashes)]
    r = n_hashes // bands
    mins = ", ".join(
        f"min(({a} * h + {b}) % {p31}) AS m{j}" for j, (a, b) in enumerate(params)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS band_id, "
        f"concat_ws('_', {', '.join(f'm{i * r + kk}' for kk in range(r))}) AS bkey "
        "FROM sig"
        for i in range(bands)
    )
    match_sum = " + ".join(
        f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END" for j in range(n_hashes)
    )
    return f"""
    WITH d AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, ('0x' || substr(md5(g), 1, 7))::BIGINT AS h
      FROM (
        SELECT doc_id,
               unnest([substr(t, i, {shingle_k})
                       for i in range(1, greatest(length(t) - {shingle_k - 1}, 1) + 1)]) AS g
        FROM d
      )
    ),
    sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    banded AS ({band_rows}),
    buckets AS (
      SELECT band_id, bkey, list(doc_id) AS ids
      FROM banded GROUP BY band_id, bkey
      HAVING len(list(doc_id)) BETWEEN 2 AND {cap}
    ),
    pairs AS (
      SELECT DISTINCT a.did AS id_a, b.did AS id_b
      FROM (SELECT unnest(ids) AS did, band_id, bkey FROM buckets) a
      JOIN (SELECT unnest(ids) AS did, band_id, bkey FROM buckets) b
        ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.did < b.did
      WHERE a.did % 5 = 0 OR b.did % 5 = 0
    )
    SELECT id_a, id_b,
           round(({match_sum}) / {float(n_hashes)}, 6) AS jaccard_est
    FROM pairs
    JOIN sig sa ON sa.doc_id = id_a
    JOIN sig sb ON sb.doc_id = id_b
    WHERE ({match_sum}) / {float(n_hashes)} >= {est_threshold}
    """


@query("dedup_minhash_incremental", oracle=_minhash_incr_oracle_sql())
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup mining: tonight's batch shingled, the
    standing corpus contributes only its PERSISTED signature store
    (operators/dedup.py minhash_signatures → minhash_lsh_pairs_
    incremental, portable-hash mode so the whole path hash-verifies in
    DuckDB).  Old-vs-old pairs never re-mined; verify is the signature
    estimate, zero corpus text reads."""
    (docs,) = _t(spark, sf_dir, "documents")
    corpus_sigs = D.minhash_signatures(
        docs.filter(F.col("doc_id") % 5 != 0),
        n_hashes=16, shingle_k=5, portable_hash=True,
    )
    return D.minhash_lsh_pairs_incremental(
        docs.filter(F.col("doc_id") % 5 == 0),
        corpus_sigs,
        n_hashes=16, bands=4, est_threshold=0.5, portable_hash=True,
    )


def _keep_best_incr_oracle_sql() -> str:
    """DuckDB oracle for dedup_keep_best_incremental: the incremental
    pair CTE (_minhash_incr_oracle_sql verbatim — batch %5==0 vs the
    corpus, est-verified), a recursive-CTE connected components over
    those pairs (stored endpoints are their OWN labels under the
    singleton prior the driver query stages), the shared quality
    ladder for every doc, and the new_cluster/displaces/joins verdict
    window."""
    return f"""
    WITH RECURSIVE pv AS ({_minhash_incr_oracle_sql()}),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pv
      UNION
      SELECT id_b, id_a FROM pv
    ),
    reach(id, lab) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e.s, r.lab FROM edges e JOIN reach r ON r.id = e.d
    ),
    cc AS (SELECT id, min(lab) AS comp FROM reach GROUP BY id),
    {_quality_base_cte("TRUE")},
    q AS (
      SELECT doc_id, {_QUALITY_LADDER_SQL} AS quality
      FROM {_LADDER_INPUT_SQL}
    ),
    lab AS (
      SELECT b.doc_id, coalesce(cc.comp, b.doc_id) AS cluster_id, b.quality
      FROM (SELECT * FROM q WHERE doc_id % 5 = 0) b
      LEFT JOIN cc ON cc.id = b.doc_id
    ),
    sbest AS (
      SELECT cluster_id, _sbest, stored_keeper FROM (
        SELECT cc.comp AS cluster_id, q.quality AS _sbest,
               cc.id AS stored_keeper,
               row_number() OVER (PARTITION BY cc.comp
                                  ORDER BY q.quality DESC, cc.id) AS kr
        FROM cc JOIN q ON q.doc_id = cc.id
        WHERE cc.id % 5 != 0
      ) WHERE kr = 1
    ),
    r AS (
      SELECT lab.doc_id, lab.cluster_id, lab.quality,
             sbest._sbest, sbest.stored_keeper,
             row_number() OVER (PARTITION BY lab.cluster_id
                                ORDER BY lab.quality DESC, lab.doc_id) AS rk
      FROM lab LEFT JOIN sbest USING (cluster_id)
    )
    SELECT doc_id, cluster_id, quality,
           CASE WHEN _sbest IS NULL THEN
                  (CASE WHEN rk = 1 THEN 'new_cluster' ELSE 'joins' END)
                WHEN rk = 1 AND quality > _sbest THEN 'displaces'
                ELSE 'joins' END AS status,
           stored_keeper
    FROM r ORDER BY doc_id
    """


@query("dedup_keep_best_incremental", oracle=_keep_best_incr_oracle_sql())
def dedup_keep_best_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental keeper maintenance — keep_best's O(batch) twin
    (operators/dedup.py keep_best_incremental): tonight's batch
    (doc_id %5==0) is classified against the standing corpus through
    the PERSISTED signature store (no corpus text reads) and the
    accumulated cluster state (here the singleton prior: every corpus
    doc its own keeper — the state after ingesting a near-dup-free
    corpus; the operator takes arbitrary prior state).  Each batch doc
    gets new_cluster / displaces (beats the touched keepers: ship it
    and retire them) / joins (drop candidate).  DuckDB replays the
    whole thing: incremental pairs, components, ladder, verdict."""
    (docs,) = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    corpus_sigs = D.minhash_signatures(
        corpus, n_hashes=16, shingle_k=5, portable_hash=True
    )
    state = corpus.select(
        F.col("doc_id").alias("id"),
        F.col("doc_id").alias("cluster_id"),
        T.quality_score(F.col("text")).alias("quality"),
        F.lit(True).alias("is_keeper"),
    )
    out = D.keep_best_incremental(
        docs.filter(F.col("doc_id") % 5 == 0),
        corpus_sigs,
        state,
        T.quality_score(F.col("text")),
        n_hashes=16, bands=4, est_threshold=0.5, portable_hash=True,
    )
    return out.select(
        F.col("id").alias("doc_id"), "cluster_id", "quality", "status",
        "stored_keeper",
    ).orderBy("doc_id")


@query(
    "ann_batch_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id % 97 = 0
    ),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT query_id, vec_id, cosine, rn FROM (
      SELECT query_id, vec_id,
             round(list_cosine_similarity(v, qv), 6) AS cosine,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
             ) AS rn
      FROM c CROSS JOIN q
    ) WHERE rn <= 5
    """,
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN serving: top-5 neighbors for EVERY query in a batch
    (vec_id % 97 — the batch) from one corpus scan; queries broadcast,
    vectors dropped before the top-k shuffle (operators/similarity.py
    cosine_topk_batch)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return S.cosine_topk_batch(
        emb,
        emb.filter(F.col("vec_id") % 97 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=5,
    )


def stage_epoch_inputs(df, key_col: str, work: str, n_epochs: int = 2) -> str:
    """Write ``df`` as ``n_epochs`` mtime-pinned single-file epochs (key
    parity split) under ``<work>/in`` — the file-source epoch harness
    every streaming gate query shares: the file source orders epochs by
    modification time, one file per trigger."""
    import os
    import shutil

    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    for b in range(n_epochs):
        batch_dir = os.path.join(work, f"b{b}")
        df.filter(F.col(key_col) % n_epochs == b).coalesce(1).write.parquet(
            batch_dir
        )
        part = next(
            f for f in os.listdir(batch_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        dst = os.path.join(in_dir, f"batch{b}.parquet")
        shutil.move(os.path.join(batch_dir, part), dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
    return in_dir


@query(
    "streaming_dedup_ingest",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch,
             doc_id % 2 AS b
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, ch,
             row_number() OVER (PARTITION BY ch ORDER BY b, doc_id) AS rn
      FROM h
    )
    SELECT doc_id FROM ranked WHERE rn = 1
    """,
)
def streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming dedup-ingest pipeline END TO END with a hash
    oracle (rare for streaming): documents split into two epoch files
    (doc_id parity; epoch order pinned via file mtimes), streamed with
    maxFilesPerTrigger=1 through stream_dedup_ingest, landed doc_ids
    returned.  Deterministic because the survivor per content hash is
    the earliest-epoch-then-lowest-id doc — exactly the oracle's
    row_number over (batch, doc_id)."""
    import os
    import shutil
    import tempfile

    from infinidb_spark.streaming.dedup_ingest import stream_dedup_ingest

    (docs,) = _t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="infinidb_sdi_")
    try:
        in_dir = stage_epoch_inputs(docs.select("doc_id", "text"), "doc_id", work)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out_dir, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
        q = stream_dedup_ingest(stream, out_dir, ckpt)
        if not q.awaitTermination(300):
            # timed out: stop before reading/deleting anything a
            # still-running stream could be writing — a partial
            # result must surface as an error, not a red hash
            q.stop()
            raise RuntimeError("streaming query did not finish within 300 s")
        rows = spark.read.parquet(out_dir).select("doc_id").collect()
        return spark.createDataFrame(rows, "doc_id long")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _quality_gate_oracle_sql(
    doc_filter: str = "doc_id < 300",
    min_quality: float = 0.8,
    langs: tuple[str, ...] = ("en",),
) -> str:
    """DuckDB oracle for streaming_quality_gate: the routing is
    STATELESS per row (no cross-epoch state), so the oracle is the
    quality CASE ladder + struct-max lang pick (same fragments as
    text_analyze's oracle, inventories embedded from operators.text)
    with the gate's first-failing-rule verdict."""
    in_langs = ", ".join(f"'{lg}'" for lg in langs)
    return f"""
    WITH {_quality_base_cte(doc_filter)},
    scored AS (
      SELECT doc_id,
             list_sort([{_lang_best_sql()}])[-1] AS best,
             {_QUALITY_LADDER_SQL} AS quality
      FROM {_LADDER_INPUT_SQL}
    ),
    v AS (
      SELECT doc_id, quality,
             CASE WHEN best.score >= 0.05 THEN best.lang ELSE 'und' END AS lang_guess
      FROM scored
    )
    SELECT doc_id,
           CASE WHEN quality < {min_quality} THEN 'low_quality'
                WHEN lang_guess NOT IN ({in_langs}) THEN 'lang'
                ELSE 'accepted' END AS status,
           quality, lang_guess
    FROM v ORDER BY doc_id
    """


@query("streaming_quality_gate", oracle=_quality_gate_oracle_sql())
def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quality gate END TO END with a hash oracle: documents
    split into two mtime-pinned epoch files, streamed one file per
    trigger through stream_quality_gate (score → route; accepted docs
    + a reject ledger with the failing rule land through the
    idempotent-epoch sink under one sink id), then the audit view
    (doc_id, status, quality, lang_guess) is returned.  Routing is
    stateless per row, so the DuckDB oracle replays the quality ladder
    + lang pick + first-failing-rule verdict exactly — streaming
    introduces zero drift (ref: cpimport's .bad/.err reject
    accounting, writeengine/bulk, lifted to content-quality rules)."""
    import os
    import shutil
    import tempfile

    from infinidb_spark.streaming.quality_gate import (
        read_gate_results,
        stream_quality_gate,
    )

    (docs,) = _t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="infinidb_sqg_")
    try:
        in_dir = stage_epoch_inputs(
            docs.filter(F.col("doc_id") < 300).select("doc_id", "text"),
            "doc_id", work,
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out_dir, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
        # 0.8 exercises all three verdicts on this corpus
        q = stream_quality_gate(stream, out_dir, ckpt, min_quality=0.8)
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("streaming query did not finish within 300 s")
        rows = (
            read_gate_results(spark, out_dir)
            .select("doc_id", "status", "quality", "lang_guess")
            .orderBy("doc_id")
            .collect()
        )
        return spark.createDataFrame(
            rows, "doc_id long, status string, quality double, lang_guess string"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query("streaming_ann_ingest", oracle=_ivf_oracle_sql(k_max=32))
def streaming_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF index maintenance END TO END with a hash oracle
    (streaming/ann_ingest.py): embeddings split into two epoch files
    (vec_id parity, mtime-pinned order), streamed one file per trigger
    into a cid-partitioned index via the idempotent epoch sink, then a
    top-k query served from ONLY the probed partitions.  The oracle is
    the BATCH IVF oracle verbatim — the streamed index must reproduce
    ann_ivf_topk row for row (same fixed model, same probes, same
    rerank): continuous ingestion introduces zero drift."""
    import os
    import shutil
    import tempfile

    from infinidb_spark.streaming.ann_ingest import (
        ann_index_serve,
        stream_ann_ingest,
    )

    (emb,) = _t(spark, sf_dir, "embeddings")
    # same fixed model as ann_ivf_topk (stride=50, k_max=32) so the
    # documented row-for-row equivalence actually holds — and so the
    # routing projection stays O(N·32), not O(N·K) with K = N/stride
    centroids = S.train_ivf_centroids(emb, stride=50, k_max=32)
    work = tempfile.mkdtemp(prefix="infinidb_sai_")
    try:
        in_dir = stage_epoch_inputs(
            emb.select("vec_id", "embedding"), "vec_id", work
        )
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        index_dir = os.path.join(work, "index")
        q = stream_ann_ingest(
            stream, index_dir, os.path.join(work, "ckpt"), centroids
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("streaming query did not finish within 300 s")
        out = ann_index_serve(
            spark, index_dir, _QUERY_VEC, centroids, k=10, n_probe=2
        )
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "streaming_running_totals",
    oracle="""
    SELECT user_id,
           count(*)                 AS n_events,
           round(sum(value), 4)     AS total_value
    FROM events WHERE user_id < 100
    GROUP BY user_id
    """,
)
def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState end-to-end with a hash oracle: per-user
    running totals (streaming/stateful.py stream_running_totals) over
    TWO mtime-pinned epoch files streamed one per trigger — the final
    emitted row per user must carry totals across BOTH triggers, which
    proves the keyed state genuinely survives micro-batches (a batch
    recomputation would reset it).  The custom-stateful-operator
    extension point, driver-verifiable."""
    import os
    import shutil
    import tempfile

    from infinidb_spark.streaming.stateful import stream_running_totals

    (events,) = _t(spark, sf_dir, "events")
    sub = events.filter(F.col("user_id") < 100).select(
        "event_id", "user_id", "value"
    )
    work = tempfile.mkdtemp(prefix="infinidb_srt_")
    try:
        in_dir = stage_epoch_inputs(sub, "event_id", work)
        stream = (
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out_dir, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")

        # parquet sinks reject update mode — land each micro-batch's
        # update rows via foreachBatch (the dedup_ingest recipe)
        def _land(batch_df: DataFrame, epoch_id: int) -> None:
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            stream_running_totals(stream)
            .writeStream.foreachBatch(_land)
            .option("checkpointLocation", ckpt)
            .outputMode("update")  # the operator's declared output mode
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # timed out: stop before reading/deleting anything a
            # still-running stream could be writing — a partial
            # result must surface as an error, not a red hash
            q.stop()
            raise RuntimeError("streaming query did not finish within 300 s")
        land = spark.read.schema(
            "user_id long, n_events bigint, total_value double"
        ).parquet(out_dir)
        # update mode emits one row per (user, touching trigger): the
        # FINAL row per user is the one with the largest n_events
        # round engine-side (F.round, HALF_UP, matching the oracle) —
        # the state UDF emits the raw accumulator
        final = land.groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max_by("total_value", "n_events"), 4).alias("total_value"),
        )
        rows = final.collect()
        return spark.createDataFrame(
            rows, "user_id long, n_events bigint, total_value double"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "streaming_click_view_join",
    oracle="""
    WITH e AS (
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
      FROM events WHERE user_id < 200
    ),
    c AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'click'),
    v AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'view')
    SELECT c.user_id,
           c.event_id AS click_id,
           v.event_id AS view_id
    FROM c JOIN v
      ON c.user_id = v.user_id
     AND v.ts >= c.ts - INTERVAL 1 HOUR
     AND v.ts <= c.ts
    """,
)
def streaming_click_view_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join end-to-end with a hash
    oracle (streaming/stateful.py stream_stream_join): clicks and views
    land as separate file streams, both sides buffer watermark-bounded
    state, and each click joins the same user's views within the
    preceding hour — the unbounded-x-unbounded join class the reference
    cannot express at all.  Single-trigger input (one file per side) so
    the watermark bounds STATE without dropping data; the result is
    therefore exactly the relational interval join the oracle computes.
    """
    import os
    import shutil
    import tempfile

    from infinidb_spark.streaming.stateful import stream_stream_join

    (events,) = _t(spark, sf_dir, "events")
    sub = events.filter(F.col("user_id") < 200).select(
        "event_id", "ts", "user_id", "event_type"
    )
    work = tempfile.mkdtemp(prefix="infinidb_ssj_")
    try:
        dirs = {}
        for side, etype in (("clicks", "click"), ("views", "view")):
            d = os.path.join(work, side)
            sub.filter(F.col("event_type") == etype).select(
                "event_id", "ts", "user_id"
            ).coalesce(1).write.parquet(d)
            dirs[side] = d
        schema = "event_id long, ts timestamp, user_id long"
        clicks = spark.readStream.schema(schema).parquet(dirs["clicks"])
        views = spark.readStream.schema(schema).parquet(dirs["views"])
        joined = stream_stream_join(clicks, views, max_delay="1 hour")
        out_dir, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
        q = (
            joined.select("user_id", "click_id", "view_id")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # timed out: stop before reading/deleting anything a
            # still-running stream could be writing — a partial
            # result must surface as an error, not a red hash
            q.stop()
            raise RuntimeError("streaming query did not finish within 300 s")
        # explicit schema: a zero-pair input leaves no part files and a
        # schema-less read would fail instead of returning empty
        rows = spark.read.schema(
            "user_id long, click_id long, view_id long"
        ).parquet(out_dir).collect()
        return spark.createDataFrame(rows, "user_id long, click_id long, view_id long")
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "text_window_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ),
    base AS (
      SELECT doc_id, i, w, greatest(len(w) - 7, 0) AS n
      FROM (SELECT doc_id, w, unnest(range(1, greatest(greatest(len(w) - 7, 0), 1) + 1)) AS i FROM d)
      WHERE greatest(len(w) - 7, 0) > 0
    ),
    hashed AS (
      SELECT doc_id,
             ('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 14))::BIGINT AS h
      FROM base
    ),
    dup_w AS (
      SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT doc_id) > 1
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS dup_windows
      FROM hashed WHERE h IN (SELECT h FROM dup_w) GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, count(*) AS n_windows FROM hashed GROUP BY doc_id)
    SELECT d0.doc_id,
           coalesce(t.n_windows, 0) AS n_windows,
           coalesce(p.dup_windows, 0) AS dup_windows,
           round(coalesce(p.dup_windows, 0)
                 / CAST(greatest(coalesce(t.n_windows, 0), 1) AS DOUBLE), 6) AS dup_fraction
    FROM (SELECT doc_id FROM documents) d0
    LEFT JOIN totals t ON d0.doc_id = t.doc_id
    LEFT JOIN per_doc p ON d0.doc_id = p.doc_id
    """,
)
def text_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate signal: fraction of each doc's 8-token
    windows appearing in another doc (operators/text.py
    window_dup_fraction, portable-hash mode for the DuckDB oracle) —
    the substring-level cleaning tier between exact dedup and MinHash."""
    (docs,) = _t(spark, sf_dir, "documents")
    return T.window_dup_fraction(docs, window=8, portable_hash=True)
