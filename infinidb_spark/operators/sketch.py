"""Count-min sketch — sublinear frequency estimation (heavy hitters).

The classic streaming sketch (Cormode & Muthukrishnan 2005): a d×w
counter matrix; each key increments one counter per row (bucket =
hash_j(key) mod w), and the frequency estimate is the MIN over the d
counters — always an over-estimate, within εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Spark-first shape: the sketch IS a (depth × width)-row relation built
by one codegen'd explode + groupBy — fixed output size regardless of
input (the whole point: a 100 TB key stream reduces to d·w counters,
and the partial/final aggregation Spark already does makes the build
map-side-combining).  Estimation joins candidate keys back against the
tiny sketch relation (broadcast).

``portable=True`` derives bucket hashes from md5 (the established
portable idiom, operators/dedup.py) so the ENTIRE sketch — every
counter — is reproducible as plain SQL; the DuckDB oracle rebuilds it
literally.  xxhash64 is the fast production default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from infinidb_spark.operators.dedup import md5_hash56


def _bucket(key: Column, j: Column, width: int, portable: bool) -> Column:
    # NULL keys hash through a sentinel: bare concat null-propagates,
    # so NULL-key counts landed in a bucket=NULL row at build time but
    # probed to no match (non-null-safe join) at estimate time —
    # est_n = 0 for a real frequency, inverting the never-under-
    # estimate guarantee.  '\\x00N' cannot collide with a key's own
    # string render (raw NUL never survives a cast to string source
    # data in the corpus formats).
    key = F.coalesce(key.cast("string"), F.lit("\x00N"))
    s = F.concat(key, F.lit(":cms:"), j.cast("string"))
    if portable:
        h = md5_hash56(s)
    else:
        h = F.xxhash64(s)
    return F.pmod(h, F.lit(width))


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    portable: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch relation: one row per non-empty (j, bucket) with
    its counter, plus the build parameters as constant metadata columns
    (depth, width, portable).  One explode (×depth) + one groupBy —
    fixed ≤ d·w output rows whatever the input size.

    ``weight_col`` counts each input row as that many occurrences
    (``sum(weight)`` per bucket instead of ``count(*)``) — the
    pre-aggregated form: reduce the key stream to (key, n) FIRST and
    build the sketch from that small relation; every counter is
    identical by integer-sum re-association, but the ×depth explode
    runs over distinct keys instead of the raw stream, and a plan
    consuming the same (key, n) aggregate elsewhere shares one scan
    via exchange reuse.  Weights must be non-negative occurrence
    counts; a NULL weight counts as 0 (coalesced below — ``sum``
    SKIPS nulls, so a bucket whose weights were all NULL would
    otherwise yield a NULL counter where the unweighted build always
    produces a number, and ``cms_estimate``'s min over it would
    misbehave)."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    if weight_col is None:
        keyed = df.select(F.col(key_col).alias("_k"), F.lit(1).alias("_w"))
    else:
        keyed = df.select(
            F.col(key_col).alias("_k"),
            F.coalesce(F.col(weight_col), F.lit(0)).alias("_w"),
        )
    return (
        keyed.select("_k", "_w", j)
        .select(
            "j",
            _bucket(F.col("_k"), F.col("j"), width, portable).alias("bucket"),
            "_w",
        )
        .groupBy("j", "bucket")
        .agg(F.sum("_w").cast("long").alias("counter"))
        .withColumn("depth", F.lit(depth))
        .withColumn("width", F.lit(width))
        .withColumn("portable", F.lit(portable))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int | None = None,
    width: int | None = None,
    portable: bool | None = None,
) -> DataFrame:
    """Estimate each key's frequency: min over its d counters.  The
    sketch is tiny (≤ d·w rows) — broadcast it; a missing (j, bucket)
    row means a zero counter, so such keys estimate to 0.

    Parameters default to the metadata the sketch relation carries; a
    parameter passed explicitly must MATCH it.  Probing with different
    depth/width/portable than the build computes different buckets and
    silently estimates ~0 for every key — inverting CMS's
    always-over-estimate guarantee — so a mismatch raises instead.

    When all three parameters are passed, the metadata read is skipped
    entirely: the ``first()`` action would EXECUTE the whole sketch
    aggregation once just to read three constants, and the join below
    then recomputes it — the build cost paid twice on an uncached
    sketch (the mismatch guard trades away for that; callers passing
    params explicitly own their consistency)."""
    if (
        (depth is None or width is None or portable is None)
        and {"depth", "width", "portable"} <= set(sketch.columns)
    ):
        meta = sketch.select("depth", "width", "portable").first()
        if meta is not None:
            for name, given, built in (
                ("depth", depth, meta.depth),
                ("width", width, meta.width),
                ("portable", portable, meta.portable),
            ):
                if given is not None and given != built:
                    raise ValueError(
                        f"cms_estimate: {name}={given} does not match the "
                        f"sketch's build parameter {name}={built}"
                    )
            depth, width, portable = meta.depth, meta.width, meta.portable
        else:
            # zero-row sketch (the build input was empty): every
            # counter is zero, so every key estimates to 0 whatever
            # probe parameters are used — default any missing ones
            # instead of raising "carries no build metadata"
            depth = 1 if depth is None else depth
            width = 1 if width is None else width
            portable = True if portable is None else portable
    if depth is None or width is None or portable is None:
        raise ValueError(
            "cms_estimate: sketch carries no build metadata — pass "
            "depth/width/portable matching the build call"
        )
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    probes = (
        keys.select(F.col(key_col))
        .select(key_col, j)
        .select(
            key_col,
            "j",
            _bucket(F.col(key_col), F.col("j"), width, portable).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("est_n"))
    )
