"""Dataset-assembly operators for LLM training pipelines: deterministic
train/val/test splitting and sequence packing.

These are the last mile of a 100 TB corpus pipeline (after dedup /
quality filtering, operators/{dedup,text}.py): carve the corpus into
stable splits and pack documents into fixed-token-budget training rows.

Scale design:

* ``hash_split`` is MAP-ONLY (zero shuffle): a document's split comes
  from a salted hash of its own key, so membership is **recomputation-
  stable** — adding or removing other documents never moves a doc
  between train and test (the property that prevents eval contamination
  across corpus versions).  Weights are approximate per stratum
  (law of large numbers at corpus scale).
* ``exact_stratified_split`` trades one shuffle (per-stratum window)
  for EXACT proportions within every stratum — for small/skewed strata
  where hash proportions drift.
* ``pack_sequences`` packs within hash shards, not globally: a global
  ordered window is a single-reducer bottleneck at 100 TB, while
  per-shard packing is embarrassingly parallel and loses at most one
  partially-filled bin per shard.

All pure Column/window expressions (codegen, no UDFs); ``portable=True``
switches the hash family to md5-derived integers that DuckDB reproduces
literally (same idiom as operators/dedup.py portable modes), keeping
every operator hash-verifiable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from infinidb_spark.operators.dedup import md5_hash56
from pyspark.sql.window import Window

#: bucket space for split assignment — 10k buckets ≙ 0.01% weight grain.
N_BUCKETS = 10_000


def split_bucket(
    key: Column, salt: str = "split", n_buckets: int = N_BUCKETS, portable: bool = False
) -> Column:
    """Deterministic bucket in [0, n_buckets) from a salted key hash.

    ``portable``: md5-derived 56-bit integer (DuckDB-reproducible);
    default xxhash64 (faster, production path).

    A NULL key coalesces to a sentinel BEFORE hashing: concat(NULL)
    would otherwise yield bucket NULL on the portable path (md5(NULL))
    but a real bucket on the default path (xxhash64 seed-hashes the
    null away) — portable would stop replaying production, and
    mixture_sample's ``_reps > 0`` filter would silently DROP
    NULL-key rows in portable mode only.
    """
    s = F.concat(
        F.coalesce(key.cast("string"), F.lit("\x00null")),
        F.lit(":" + salt),
    )
    if portable:
        h = md5_hash56(s)
    else:
        h = F.xxhash64(s)
    return F.pmod(h, F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
    portable: bool = False,
) -> DataFrame:
    """Assign a ``split`` label by salted key hash — map-only, stable.

    ``weights`` maps label → fraction in iteration order (e.g.
    ``{"train": .8, "val": .1, "test": .1}``); fractions must sum to 1.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_bucket(F.col(key_col), salt, N_BUCKETS, portable)
    expr: Column | None = None
    cum = 0.0
    for label, w in weights.items():
        cum += w
        hi = int(round(cum * N_BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split", expr)


def exact_stratified_split(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    salt: str = "split",
    portable: bool = False,
) -> DataFrame:
    """Exact per-stratum proportions: rank rows within each stratum by
    their salted hash (stable pseudo-random order, key tie-break) and
    cut at the cumulative weight boundaries.  One shuffle on strata.

    The cut is ALL-INTEGER: ``rank * N_BUCKETS < round(cum * N_BUCKETS)
    * stratum_size`` — the float form (``rank/n < cum``) flips boundary
    rows whenever the accumulated cum differs from an oracle's decimal
    literal by 1 ulp (0.1 + 0.2 != 0.3 in doubles; the 0.8/0.1/0.1
    default was green only because 0.8 + 0.1 happens to be exact).

    Determinism: rows sharing (bucket, key) — duplicate or NULL keys —
    tie in the rank order, so a boundary tie could flip a DISTINCT row
    between splits across recomputations (task retry, re-run): exactly
    the train/test instability the module exists to prevent.  The
    production path adds a full-row hash as the final tie-break;
    portable mode keeps the 2-key order the hand-written SQL oracle
    reproduces — callers there must pass a UNIQUE key_col (the
    document id, the documented shape)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_bucket(F.col(key_col), salt, N_BUCKETS, portable)
    order = [bucket, F.col(key_col)]
    if not portable:
        order.append(F.xxhash64(*[F.col(c) for c in df.columns]))
    w = Window.partitionBy(strata_col).orderBy(*order)
    n = Window.partitionBy(strata_col)
    # bigint BEFORE the multiply: row_number is 32-bit and
    # (rn-1)*10000 silently wraps past rank ~214,748 with ANSI off —
    # every row in a 300k-row stratum landed in the FIRST label
    rank0 = (F.row_number().over(w) - F.lit(1)).cast("bigint") * F.lit(N_BUCKETS)
    size = F.count(F.lit(1)).over(n)
    expr: Column | None = None
    cum = 0.0
    for label, wt in weights.items():
        cum += wt
        hi = int(round(cum * N_BUCKETS))
        cond = rank0 < F.lit(hi) * size
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split", expr)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Greedy sequential packing into fixed-token-budget bins, per shard.

    Documents are sharded by key hash, ordered by id within the shard,
    and assigned ``bin_id = floor(cumulative_tokens_before / budget)`` —
    the streaming-packing approximation: every bin's total stays below
    ``budget + max(doc tokens in shard)``.  A doc longer than the
    budget spans multiple bin ids, but its FIRST bin can still be
    shared with earlier docs when partially filled (consumers needing
    solo-doc bins for oversized docs must re-bin those).  Adds
    ``shard`` and ``bin_id``.
    """
    if budget <= 0:
        raise ValueError(f"pack_sequences: budget must be positive, got {budget}")
    shard = split_bucket(F.col(id_col), "shard", n_shards, portable)
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return out.withColumn("bin_id", F.floor(cum_before / F.lit(budget)))


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    salt: str = "mixture",
    portable: bool = False,
) -> DataFrame:
    """Weighted corpus mixture: re-sample each source to its target
    weight, deterministically.

    ``weights`` maps source value → sampling weight ``w``:

    * ``w < 1``  — downsample: keep a doc iff its salted hash bucket
      falls under ``w`` (stable subset, same property as hash_split);
    * ``w >= 1`` — upsample: every doc appears ``floor(w)`` times, plus
      one more for the hash-selected ``w - floor(w)`` fraction.  Copies
      get an ``epoch`` column (0-based) so downstream shuffling can
      spread repeats across training batches.

    Map-only + explode — zero shuffle, recomputation-stable (a doc's
    fate depends only on its own key), the mixture-weighting step of an
    LLM data pipeline (sources are weighted by quality/diversity, not
    size).  At 100 TB upsampling by explode costs no extra input I/O;
    the duplicate rows materialize only in the shuffle of whatever
    consumer follows.
    """
    import math

    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be non-negative")
    bucket = split_bucket(F.col(key_col), salt, N_BUCKETS, portable)

    # integerize the fractional cutoff DRIVER-SIDE (hash_split's rule):
    # the float form (bucket < frac * N_BUCKETS) diverges from exact
    # decimal arithmetic for non-dyadic weights (w=1.1 -> cutoff
    # 1000.0000000000009 includes bucket 1000; round(...) excludes it)
    def _cut(wt: float) -> int:
        return int(round((wt - math.floor(wt)) * N_BUCKETS))

    whole_expr: Column = F.lit(int(math.floor(default_weight)))
    cut_expr: Column = F.lit(_cut(default_weight))
    for src, w in weights.items():
        whole_expr = F.when(F.col(source_col) == src, int(math.floor(w))).otherwise(
            whole_expr
        )
        cut_expr = F.when(F.col(source_col) == src, _cut(w)).otherwise(cut_expr)
    reps = whole_expr.cast("bigint") + (bucket < cut_expr).cast("bigint")
    return (
        df.withColumn("_reps", reps)
        .filter(F.col("_reps") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_reps") - 1)))
        .drop("_reps")
    )


def pack_stats(packed: DataFrame, token_col: str, budget: int) -> DataFrame:
    """Per-bin packing stats: docs, token total, fill ratio."""
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("tokens_total"),
        )
        .withColumn("fill", F.round(F.col("tokens_total") / F.lit(budget), 6))
    )
