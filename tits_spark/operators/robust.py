"""Winsorized per-key statistics: outlier-insensitive summary stats by
clipping the tails at quantile bounds before aggregating — the standard
pre-normalization step for reward/score columns in training pipelines
(a single corrupt 1e12 print otherwise owns the mean).

The clip bounds are TYPE-1 (order-statistic) quantiles, not
interpolated ones, on purpose: an interpolated bound is an arithmetic
blend whose expression tree differs between engines (Spark percentile
computes lower + frac*(upper-lower); DuckDB quantile_cont blends the
other way — observed 1 ulp apart at sf0.1), and a data point sitting
exactly ON the bound then clips on one engine and not the other. An
order statistic is a COPIED data value: rank arithmetic is exact
integers, the bound is bit-identical everywhere, and the clip
comparisons follow suit. The winsorized SUM is emitted as an exact
scaled integer (rint of a near-integer double) rather than a rounded
mean — a lattice mean can land exactly on round()'s half-way points.

Plan: one window chain (count + rank + two picked order statistics)
plus one hash agg, all clustered on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winsorized_stats(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    lo_k: int = 1,
    hi_k: int = 19,
    den: int = 20,
    sum_scale: int = 100,
) -> DataFrame:
    """(key, n, n_clip_lo, n_clip_hi, lo, hi, wsum_s) per key.

    Bounds are the type-1 quantiles at ``lo_k/den`` and ``hi_k/den``
    (defaults: p05/p95): the order statistics at ranks
    ceil(n*k/den), computed with exact integer arithmetic — never
    float p*n, whose dust flips ceil at exact multiples. ``wsum_s`` is
    the winsorized sum in 1/``sum_scale`` integer units (divide by
    sum_scale*n for the mean); bounds are data values, so sum_scale
    only needs to cover the INPUT lattice (100 for 2-decimal values).
    """
    if not (0 < lo_k <= hi_k < den):
        raise ValueError(f"need 0 < lo_k <= hi_k < den, got {lo_k},{hi_k},{den}")
    from tits_spark.functions.exprs import floordiv

    w = Window.partitionBy(key)
    wo = Window.partitionBy(key).orderBy(value)
    n = F.count(value).over(w)
    rk = F.row_number().over(wo)
    # ceil(n*k/den) in exact integer arithmetic (float p*n dust flips
    # ceil exactly at the multiples, where it matters most)
    lo_rank = F.greatest(F.lit(1), floordiv(n * lo_k + den - 1, den))
    hi_rank = F.greatest(F.lit(1), floordiv(n * hi_k + den - 1, den))
    ranked = (
        df.withColumn("_rk", rk)
        .withColumn("_lo", F.max(F.when(rk == lo_rank, F.col(value))).over(w))
        .withColumn("_hi", F.max(F.when(rk == hi_rank, F.col(value))).over(w))
    )
    v = F.col(value)
    clipped = F.when(v < F.col("_lo"), F.col("_lo")).when(
        v > F.col("_hi"), F.col("_hi")
    ).otherwise(v)
    return (
        ranked.withColumn("_c", clipped)
        .groupBy(key)
        .agg(
            F.count(v).alias("n"),
            F.sum((v < F.col("_lo")).cast("long")).alias("n_clip_lo"),
            F.sum((v > F.col("_hi")).cast("long")).alias("n_clip_hi"),
            F.min("_lo").alias("lo"),
            F.min("_hi").alias("hi"),
            F.round(F.sum("_c") * sum_scale, 0).cast("long").alias("wsum_s"),
        )
    )
