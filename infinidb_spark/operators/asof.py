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
    tolerance_seconds: float | None = None,
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
      the backward row, like pandas).  Both candidates come from TWO
      value-range frames over the ONE merged sort (same partitioning
      and ordering, so Spark evaluates them in a single Window exec —
      one shuffle, one sort, no second pass over the union).

    A right row with NULL timestamp is dropped before the merge: NULL
    satisfies neither ``<=`` nor ``>=`` (pandas merge_asof never
    matches NaT either), but under NULLS FIRST it would sort to the
    partition head and be carried to every left row with no genuine
    predecessor.  A left row with NULL timestamp gets NULLs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    # `is None`, not falsy: an explicit right_cols=[] means "just the
    # matched timestamp", not "expand to every right column"
    rcols = (
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (on, right_ts)]
    )
    reserved = {"_ats", "_side", "_m", "_mb", "_mf", "_tsl"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        # a user column named like a working column would be silently
        # overwritten (or crash with AMBIGUOUS_REFERENCE downstream)
        raise ValueError(f"asof_join: column names collide with internals: {sorted(clash)}")

    lt = left.withColumn("_ats", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            F.col(on),
            F.col(right_ts).alias("_ats"),
            *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        )
        .withColumn("_side", F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "nearest":
        # value-range frames are ordering-tie independent, so ONE
        # (ts) ordering serves both directions: the backward frame is
        # rows at-or-before the current ts, the forward frame rows
        # at-or-after — equal-ts right rows fall in BOTH (the <= / >=
        # semantics), wherever the tie-break placed them
        merged = merged.withColumn(
            "_tsl", F.unix_micros(F.col("_ats").cast("timestamp"))
        )
        payload = F.when(
            F.col("_side") == 0,
            F.struct(
                F.col("_ats").alias("_mts"),
                *[F.col(f"{c}{suffix}").alias(c) for c in rcols],
            ),
        )
        base = Window.partitionBy(on).orderBy(F.col("_tsl").asc())
        wb = base.rangeBetween(Window.unboundedPreceding, 0)
        wf = base.rangeBetween(0, Window.unboundedFollowing)
        out = merged.select(
            *[F.col(c) for c in left.columns],
            F.col("_side"),
            F.col("_tsl"),
            F.last(payload, ignorenulls=True).over(wb).alias("_mb"),
            F.first(payload, ignorenulls=True).over(wf).alias("_mf"),
        ).filter(F.col("_side") == 1)
        for cand in ("_mb", "_mf"):
            out = out.withColumn(
                cand, F.when(F.col(left_ts).isNotNull(), F.col(cand))
            )
        db = F.col("_tsl") - F.unix_micros(F.col("_mb._mts").cast("timestamp"))
        df_ = F.unix_micros(F.col("_mf._mts").cast("timestamp")) - F.col("_tsl")
        if tolerance_seconds is not None:
            # round at the microsecond, not int(seconds): a 0.5 s
            # tolerance truncated to 0 here while the backward/forward
            # paths compared the float directly — inconsistent matching
            # across directions for sub-second tolerances
            tol_us = F.lit(int(round(tolerance_seconds * 1_000_000)))
            out = out.withColumn("_mb", F.when(db <= tol_us, F.col("_mb")))
            out = out.withColumn("_mf", F.when(df_ <= tol_us, F.col("_mf")))
        pick_b = F.col("_mf").isNull() | (
            F.col("_mb").isNotNull() & (db <= df_)
        )
        m = F.when(pick_b, F.col("_mb")).otherwise(F.col("_mf"))
        return out.select(
            *[F.col(c) for c in left.columns],
            *[m.getField(c).alias(f"{c}{suffix}") for c in rcols],
            m.getField("_mts").alias(f"{right_ts}{suffix}"),
        )

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
    # a left row with NULL ts can never satisfy <=/>= — without this
    # mask the forward window (which spans the whole partition from a
    # NULLS-FIRST position) would hand it the EARLIEST right row
    out = out.withColumn("_m", F.when(F.col(left_ts).isNotNull(), F.col("_m")))
    if tolerance_seconds is not None:
        # microsecond gap, like the nearest path: unix_timestamp's
        # whole-second truncation kept matches whose true gap exceeded
        # the tolerance (09:59:59.000 → 10:00:00.900 is 1.9 s but
        # truncated to 1) and degenerated sub-second tolerances to
        # "same truncated second"
        lm = F.unix_micros(F.col(left_ts).cast("timestamp"))
        rm = F.unix_micros(F.col("_m._mts").cast("timestamp"))
        gap = rm - lm if direction == "forward" else lm - rm
        tol_us = F.lit(int(round(tolerance_seconds * 1_000_000)))
        in_tol = F.col("_m").isNotNull() & (gap <= tol_us)
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

    The exact predicate lives IN the join condition (Catalyst still
    extracts the bin/key equi-keys; the range check becomes the join
    residual): a post-join ``.filter(cond)`` would silently turn
    ``how='left'`` into an inner join — NULL-extended rows evaluate
    the predicate to NULL and get dropped.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    if not bin_width > 0:
        # with ANSI off, /0 yields NULL bins and a silently EMPTY join
        raise ValueError(f"range_join: bin_width must be > 0, got {bin_width}")
    reserved = {"_bin", "_rbin"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(
            f"range_join: column names collide with internals: {sorted(clash)}"
        )
    lbin = F.floor(F.col(left_value) / bin_width).cast("long")
    lo_bin = F.floor(F.col(right_lo) / bin_width).cast("long")
    hi_bin = F.floor(F.col(right_hi) / bin_width).cast("long")

    l2 = left.withColumn("_bin", lbin).alias("_l")
    r2 = right.withColumn("_rbin", F.explode(F.sequence(lo_bin, hi_bin))).alias("_r")
    cond = (
        (F.col("_l._bin") == F.col("_r._rbin"))
        & (F.col(f"_r.{right_lo}") <= F.col(f"_l.{left_value}"))
        & (F.col(f"_l.{left_value}") <= F.col(f"_r.{right_hi}"))
    )
    if on is not None:
        cond = (F.col(f"_l.{on}") == F.col(f"_r.{on}")) & cond
    out = l2.join(r2, cond, how).drop(F.col("_l._bin")).drop(F.col("_r._rbin"))
    if on is not None:
        out = out.drop(F.col(f"_r.{on}"))  # keep the left key, like a keys-join
    return out
