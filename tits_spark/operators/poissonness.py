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
