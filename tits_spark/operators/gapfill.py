"""Gap-fill: bucket spine generation + LOCF + linear interpolation.

The reference's null model is absence — missing ticks are simply rows
that never reached the book (ref:guess_lag.c:205-224, SURVEY.md §1.3).
Gap-fill materializes those absent buckets on a regular spine and fills
values, entirely with built-in column expressions (window last/first
with ignorenulls) — no Python in the hot path, whole-stage codegen
applies.

Scale notes:
 - the spine is generated per key from that key's own [min, max] bucket
   range via sequence()+explode — output size is bounded by
   n_keys * time_range / bucket, independent of raw row count;
 - the fill windows partition by key and sort by bucket_ts: one shuffle,
   reused by both LOCF and interpolation (same partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.rollup import TIERS


def bucket_spine(tier_df: DataFrame, tier: str) -> DataFrame:
    """Dense (key, bucket_ts) spine spanning each key's observed range.

    Fine tiers explode in TWO levels — days first, then buckets within
    each day — so no intermediate array exceeds ~36.5k (a century of
    days) or 1440 (minutes per day) elements. A single
    ``sequence(lo, hi)`` would materialize one array row per key sized
    by its whole span: a 10-year key at the 1m tier is a 5M-element
    ~40MB row, an executor-OOM hazard exactly on the long-lived keys a
    10^12-turn table is guaranteed to contain. Day boundaries lie on
    every sub-day tier grid, so the two-level expansion produces
    row-identical output to the single sequence — PROVIDED the tier
    width divides a day and the session timezone has no DST (both hold
    for the UTC-pinned 60/3600/86400 tiers; the assert below turns a
    violation, e.g. a future '7m' tier, into an error instead of a
    silently misaligned spine)."""
    _, secs = TIERS[tier]
    if secs < 86400 and 86400 % secs != 0:
        raise ValueError(
            f"bucket_spine: sub-day tier width {secs}s must divide 86400 "
            "for the day/bucket two-level expansion to stay on the grid"
        )
    per_key = tier_df.groupBy("key").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    if secs >= 86400:
        return per_key.select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {secs} SECONDS"))
            ).alias("bucket_ts"),
        )
    days = per_key.select(
        "key",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.date_trunc("day", "lo"),
                F.date_trunc("day", "hi"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    start = F.greatest(F.col("lo"), F.col("day"))
    end = F.least(
        F.col("hi"), F.col("day") + F.expr(f"INTERVAL {86400 - secs} SECONDS")
    )
    return days.select(
        "key",
        F.explode(F.sequence(start, end, F.expr(f"INTERVAL {secs} SECONDS"))).alias(
            "bucket_ts"
        ),
    )


def gapfill_locf(tier_df: DataFrame, tier: str, value_col: str = "v_last") -> DataFrame:
    """Last-observation-carried-forward over the dense spine.

    Returns (key, bucket_ts, <value_col>, filled) where `filled` marks
    spine buckets that had no observations. Leading buckets before the
    first observation stay NULL (nothing to carry).
    """
    spine = bucket_spine(tier_df, tier)
    joined = spine.join(
        tier_df.select("key", "bucket_ts", value_col), ["key", "bucket_ts"], "left"
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "key",
        "bucket_ts",
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().alias("filled"),
    )


def gapfill_interp(tier_df: DataFrame, tier: str, value_col: str = "v_last") -> DataFrame:
    """Linear interpolation over the dense spine.

    interp = prev + (next - prev) * (t - t_prev) / (t_next - t_prev),
    computed from last/first-ignorenulls windows — pure column math
    (SURVEY.md §7.4). Edges (before first / after last obs) fall back to
    the nearest observed value (LOCF / NOCB).
    """
    spine = bucket_spine(tier_df, tier)
    joined = spine.join(
        tier_df.select("key", "bucket_ts", value_col), ["key", "bucket_ts"], "left"
    )
    wb = Window.partitionBy("key").orderBy("bucket_ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("key").orderBy("bucket_ts").rowsBetween(
        0, Window.unboundedFollowing
    )
    from tits_spark.functions.exprs import ts_seconds

    t = ts_seconds("bucket_ts")
    obs_t = F.when(F.col(value_col).isNotNull(), t)
    prev_v = F.last(value_col, ignorenulls=True).over(wb)
    next_v = F.first(value_col, ignorenulls=True).over(wf)
    prev_t = F.last(obs_t, ignorenulls=True).over(wb)
    next_t = F.first(obs_t, ignorenulls=True).over(wf)

    interp = F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
        F.when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t))
    )
    return joined.select(
        "key",
        "bucket_ts",
        interp.alias(value_col),
        F.col(value_col).isNull().alias("filled"),
    )
