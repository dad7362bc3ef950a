"""Moran's test of exponential inter-arrivals per key — "is this
arrival process Poisson, or does it carry structure?" (Moran 1951,
public formula; the likelihood-ratio-style companion of
dispersion_index, which tests counts per window, and of acd, which
MODELS the durations this test screens.)

For gaps g_1..g_n between consecutive events,

    M = 2n * ( ln(gbar) - (1/n) * sum ln g_i )

is ~chi2(n-1) under exponentiality after the Stirling correction
C = 1 + (n+1)/(6n); M/C is emitted alongside raw M. M is scale-free
(a unit change shifts both terms identically), so the gaps stay in
EXACT integer microseconds end to end.

Exactness: gbar's numerator/denominator are exact int64 (sum of
gaps = observed span, n a count); each ln g_i is evaluated from the
identical int64 on both engines and quantized to the floor-1e9
lattice BEFORE the per-key sum (the mutual_info discipline — the sum
is pure BIGINT, |term| <= ~41e9 per gap, so ~2e8 gaps/key fit int64).
Zero gaps (same-microsecond events) have no logarithm: they are
COUNTED (n_zero — itself a Poissonness violation signal: true
exponential arrivals almost never collide) and excluded from the
statistic, exactly the same on both engines.

Plan shape: one scan, one per-key sort window (lag) riding one
exchange, one hash aggregate. No join, no UDF, no grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def moran_exponentiality(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_gaps: int = 8,
) -> DataFrame:
    """Per-key Moran exponentiality statistic over inter-arrival
    microsecond gaps.

    Returns (key, n_gaps, n_zero, sum_gap_us, m_stat, m_corr): the
    positive-gap count, the same-microsecond collision count, the
    exact span sum, and Moran's M plus its Stirling-corrected form
    (round 6). Keys with fewer than ``min_gaps`` positive gaps drop."""
    wo = Window.partitionBy("key").orderBy("us")
    gaps = (
        df.select(F.col(key).alias("key"), epoch_us(ts).alias("us"))
        .withColumn("g", F.col("us") - F.lag("us").over(wo))
        .filter(F.col("g").isNotNull())
    )
    lnq = F.floor(F.log(F.col("g").cast("double")) * 1e9).cast("long")
    agg = (
        gaps.groupBy("key")
        .agg(
            F.sum((F.col("g") > 0).cast("long")).alias("n_gaps"),
            F.sum((F.col("g") == 0).cast("long")).alias("n_zero"),
            F.sum(F.when(F.col("g") > 0, F.col("g"))).alias("sum_gap_us"),
            F.sum(F.when(F.col("g") > 0, lnq)).alias("_slnq"),
        )
        .filter(F.col("n_gaps") >= int(min_gaps))
    )
    n = F.col("n_gaps").cast("double")
    m = (
        F.lit(2.0)
        * n
        * (
            F.log(F.col("sum_gap_us").cast("double") / n)
            - F.col("_slnq").cast("double") / (n * 1e9)
        )
    )
    corr = F.lit(1.0) + (n + 1.0) / (F.lit(6.0) * n)
    return agg.select(
        "key",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.col("n_zero").cast("long").alias("n_zero"),
        F.col("sum_gap_us").cast("long").alias("sum_gap_us"),
        (F.round(m, 6) + F.lit(0.0)).alias("m_stat"),
        (F.round(m / corr, 6) + F.lit(0.0)).alias("m_corr"),
    )


def zero_inflation_daily(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_days: int = 14,
) -> DataFrame:
    """van den Broek (Biometrics 1995) score test for zero inflation
    of the per-key DAILY event counts — are there more silent days
    than the key's own Poisson rate explains?  The per-day companion
    of this module's gap-based M statistic (which tests the
    inter-arrival law; this tests the day-count law's zero mass —
    bursty bots and on/off users light this up while the Fano factor
    alone cannot say the excess is specifically AT ZERO).

    With n = span days, n0 = silent days, ybar = total/n and
    p0 = exp(-ybar):

        S = (n0 - n p0)^2 / (n p0 (1 - p0) - n ybar p0^2)  ~ chi2(1)

    n, n0 and the total are exact integers — n0 is span minus
    observed days, so NO zero-fill explode is needed; S is one fixed
    double tree, round 6, signed zero normalized, NULL when the
    denominator is <= 0 (ybar so large that p0 underflows the
    information).

    Plan: one (key, day) hash agg -> one per-key hash agg.  No
    window, no join, no Python.

    Returns (key, n_days, n_zero_days, total, ybar, zi_score)."""
    daily = (
        df.select(
            F.col(key).alias("key"),
            (epoch_us(ts) / F.lit(86_400_000_000)).cast("long").alias("d"),
        )
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = (
        daily.groupBy("key")
        .agg(
            (F.max("d") - F.min("d") + 1).cast("long").alias("n_days"),
            F.count(F.lit(1)).alias("_obs"),
            F.sum("c").cast("long").alias("total"),
        )
        .filter(F.col("n_days") >= int(min_days))
    )
    n = F.col("n_days").cast("double")
    n0 = (F.col("n_days") - F.col("_obs")).cast("double")
    yb = F.col("total").cast("double") / n
    p0 = F.exp(-yb)
    num = (n0 - n * p0) * (n0 - n * p0)
    den = n * p0 * (F.lit(1.0) - p0) - n * yb * (p0 * p0)
    s = F.when(den > 0, F.round(num / den, 6) + F.lit(0.0))
    return agg.select(
        "key",
        "n_days",
        (F.col("n_days") - F.col("_obs")).cast("long").alias("n_zero_days"),
        "total",
        (F.round(yb, 6) + F.lit(0.0)).alias("ybar"),
        s.alias("zi_score"),
    )
