"""Skew mitigation — salted joins and salted two-stage aggregation.

Context: AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`,
enabled in session.py) handles most skew automatically at runtime by
splitting oversized shuffle partitions.  These explicit operators cover
the cases AQE can't:

* a hot key so dominant that even a split partition's single key-group
  exceeds one task's memory in a shuffled hash join;
* skewed `groupBy` on high-cardinality aggregation states (collect_*,
  exact distinct) where partial aggregation doesn't shrink the hot key.

Reference analog: InfiniDB had neither — its UM hash join simply spills
(`DiskJoinStep`), serializing the hot key through one thread; salting is
the distributed answer.

Mechanics: the skewed (probe) side gets a random-ish per-row salt in
[0, n); the build side is replicated n× (one copy per salt value); the
join key becomes (key, salt), spreading each hot key over n tasks.
Replication multiplies the build side — size n so build×n stays well
under executor memory; at 100 TB pick n ≈ hot-key rows / healthy
partition rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"


def _hashable(dt) -> bool:
    """xxhash64 rejects MapType anywhere in the column's type tree."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable(f.dataType) for f in dt.fields)
    return True


def _row_salt(df: DataFrame, n_salt: int):
    """Deterministic per-row salt from ROW CONTENT, never from
    monotonically_increasing_id: a partial stage retry after a shuffle-
    fetch failure recomputes rows in a different order, and an
    id-derived salt would route the recomputed rows to different
    (key, salt) reducer partitions than the original run — rows
    silently vanish or duplicate (the SPARK-23207 correctness class).
    Content-hash salts are recomputation-stable; identical duplicate
    rows share a salt, which only costs balance, never correctness.
    Map-typed columns are excluded (xxhash64 rejects them) — the salt
    stays deterministic over the remaining columns."""
    cols = [
        F.col(f.name) for f in df.schema.fields if _hashable(f.dataType)
    ]
    if not cols:  # every column is map-typed: degenerate single salt
        return F.lit(0)
    return F.pmod(F.xxhash64(*cols), F.lit(n_salt))


def _reject_salt_collision(*dfs: DataFrame) -> None:
    for df in dfs:
        if _SALT in df.columns:
            raise ValueError(
                f"input already has a {_SALT!r} column — rename it; the "
                "salted operators would silently overwrite and drop it"
            )


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `skewed`'s key distribution has hot keys and
    `build` is modest (but not broadcastable).  Result is identical to
    `skewed.join(build, on, how)`; only the shuffle layout changes.

    `how` is restricted to skewed-side-preserving types: a right/full
    outer would emit one null-extended row PER REPLICA for unmatched
    build rows — semantically wrong under replication.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, not {how!r}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    _reject_salt_collision(skewed, build)
    salted = skewed.withColumn(_SALT, _row_salt(skewed, n_salt))
    replicated = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted.join(replicated, on + [_SALT], how).drop(_SALT)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage COUNT/SUM aggregation for hot grouping keys: stage 1
    aggregates on (keys, salt) — the hot key spreads over n tasks —
    stage 2 merges the n partials per key.  Algebraic aggregates only
    (count/sum here; min/max/avg extend the same way)."""
    sum_cols = sum_cols or {}
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    _reject_salt_collision(df)
    salted = df.withColumn(_SALT, _row_salt(df, n_salt))
    stage1 = salted.groupBy(*keys, _SALT).agg(
        F.count(F.lit(1)).alias("_pc"),
        *[F.sum(src).alias(f"_ps_{alias}") for src, alias in sum_cols.items()],
    )
    # merged sums cast back to the SINGLE-stage result type: stacked
    # F.sum widens DECIMAL twice (p+20,s vs the plain aggregate's
    # p+10,s), so the salted relation's schema would diverge from the
    # un-salted equivalent it promises to match (schema analysis only —
    # no job runs)
    single = {
        alias: df.select(F.sum(src).alias(alias)).schema[0].dataType
        for src, alias in sum_cols.items()
    }
    return stage1.groupBy(*keys).agg(
        # coalesce: a GLOBAL aggregate (keys=[]) over empty input yields
        # one row with a NULL sum — the un-salted count() returns 0
        F.coalesce(F.sum("_pc"), F.lit(0).cast("bigint")).alias(count_col),
        *[
            F.sum(f"_ps_{alias}").cast(single[alias]).alias(alias)
            for alias in sum_cols.values()
        ],
    )
