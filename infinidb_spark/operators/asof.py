"""As-of joins and range joins — the temporal operators Spark lacks.

Reference: InfiniDB has neither (hash-equi joins only, SURVEY §2.3);
both are named extension targets for this engine.

**As-of join** (backward): for each left row, the latest right row with
the same key and `right.ts <= left.ts` (within an optional tolerance).
Implemented WITHOUT a join: the two sides are unioned into one tagged
stream, sorted per key by (ts, side-order), and the right payload is
carried forward with `last(ignorenulls=True)` over an unbounded-
preceding window — one shuffle + one sort, no row explosion.  This is
the only formulation that survives 100 TB: a naive `t1 <= t2` theta
join is a per-key cross product; the merged-stream window is O(n log n)
per key and partitions by key hash.

**Range join**: equi-key + value-in-[lo, hi] predicate, binned: both
sides bucket by `value // bin_width` and join on (key, bin) with the
exact predicate as a post-filter — each row lands in the bins its range
overlaps, so the join never degenerates to nested loops; bin width
trades replication (interval_width / bin_width copies) against bucket
selectivity, exactly the reference's extent-elimination granularity
trade-off.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join; right columns arrive suffixed.  Left rows with no
    matching right row (or outside tolerance) keep NULLs.

    ``direction`` (the pandas ``merge_asof`` contract):

    * ``backward`` (default) — latest right row with ``ts <= left.ts``;
    * ``forward`` — earliest right row with ``ts >= left.ts`` (the
      mirrored window: ``first`` over unbounded FOLLOWING);
    * ``nearest`` — whichever of the two is closer in time (ties →
      the backward row, like pandas).  Runs both windows over the ONE
      merged sort — still a single shuffle, no extra pass.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest":
        b = asof_join(left, right, on, left_ts, right_ts, tolerance_seconds,
                      right_cols, "_bwd")
        f = asof_join(b, right, on, left_ts, right_ts, tolerance_seconds,
                      right_cols, "_fwd", direction="forward")
        rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
        lts = F.unix_timestamp(F.col(left_ts))
        db = lts - F.unix_timestamp(F.col(f"{right_ts}_bwd"))
        df_ = F.unix_timestamp(F.col(f"{right_ts}_fwd")) - lts
        pick_b = F.col(f"{right_ts}_fwd").isNull() | (
            F.col(f"{right_ts}_bwd").isNotNull() & (db <= df_)
        )
        sel = [
            F.when(pick_b, F.col(f"{c}_bwd")).otherwise(F.col(f"{c}_fwd")).alias(
                f"{c}{suffix}"
            )
            for c in [*rcols, right_ts]
        ]
        return f.select(*[F.col(c) for c in left.columns], *sel)
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    lt = left.withColumn("_ats", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ats"),
            *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        )
        .withColumn("_side", F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "forward":
        # left rows sort before right rows at equal ts (>= semantics);
        # the match is the FIRST right row at-or-after
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ats").asc(), F.col("_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
    else:
        # right rows sort before left rows at equal ts (<= semantics)
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ats").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    # Carry the whole right row as ONE struct, built only on right-side
    # rows: all payload columns then come from the same (latest) right
    # row, and a right row whose payload is legitimately NULL still
    # produces a non-null struct — so it is NOT skipped in favor of an
    # older row (per-column last(ignorenulls) would do both wrong).
    payload = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ats").alias("_mts"),
            *[F.col(f"{c}{suffix}").alias(c) for c in rcols],
        ),
    )
    carried = (
        F.first(payload, ignorenulls=True).over(w)
        if direction == "forward"
        else F.last(payload, ignorenulls=True).over(w)
    )

    out = merged.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        carried.alias("_m"),
    ).filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        gap = (
            F.unix_timestamp("_m._mts") - F.unix_timestamp(left_ts)
            if direction == "forward"
            else F.unix_timestamp(left_ts) - F.unix_timestamp("_m._mts")
        )
        in_tol = F.col("_m").isNotNull() & (gap <= F.lit(tolerance_seconds))
        out = out.withColumn("_m", F.when(in_tol, F.col("_m")))
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col("_m").getField(c).alias(f"{c}{suffix}") for c in rcols],
        F.col("_m").getField("_mts").alias(f"{right_ts}{suffix}"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None,
    left_value: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals containing their value
    (`right_lo <= left_value <= right_hi`), equi-binned.

    `on=None` joins on bins alone (global ranges).  At scale pick
    `bin_width` ≈ typical interval width so each interval replicates
    into O(1) bins.
    """
    lbin = F.floor(F.col(left_value) / bin_width).cast("long")
    lo_bin = F.floor(F.col(right_lo) / bin_width).cast("long")
    hi_bin = F.floor(F.col(right_hi) / bin_width).cast("long")

    l2 = left.withColumn("_bin", lbin)
    r2 = right.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))

    keys = ["_bin"] if on is None else [on, "_bin"]
    cond = (F.col(right_lo) <= F.col(left_value)) & (F.col(left_value) <= F.col(right_hi))
    return l2.join(r2, keys, how).filter(cond).drop("_bin")
