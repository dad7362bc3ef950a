"""Theil–Sen robust slope per key over daily aggregates, exact-ratio.

The Theil–Sen estimator (Theil 1950, Sen 1968) — median of all pairwise
slopes — has a 29.3% breakdown point where OLS (`linreg.ols_trend`) has
0%: a handful of outlier days cannot move it.  The catch is the O(n²)
pairs, which this operator makes affordable by regressing on per-key
DAILY aggregates: the pair count is bounded by the square of the
CALENDAR span (365 days → at most ~66k pairs per key), independent of
event volume — the same "aggregate first, then the expensive step"
shape as the rollup tiers.

Exactness discipline: each day's mean is carried as the exact integer
ratio (cents sum, count) rather than a float, so a pairwise slope is

    slope = (c2*n1 − c1*n2) / (n1*n2*(d2−d1))

with an exact BIGINT numerator and denominator; the single float
division produces identical doubles on both engines, and the median of
identical double multisets (exact percentile, interpolating) matches
bit-for-bit.  A float daily mean would instead differ in the last ulp
with partial-sum order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def theil_sen(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    decimals: int = 6,
) -> DataFrame:
    """Per-key Theil–Sen slope (centi-units per day) of daily mean
    value vs day index; returns (key, n_days, n_pairs, ts_slope)."""
    daily = (
        df.select(F.col(key).alias("key"), epoch_us(ts).alias("_u"), F.col(value))
        .where(F.col(value).isNotNull())
        .groupBy("key", F.expr("_u div 86400000000").alias("d"))
        .agg(
            F.sum(F.round(F.col(value) * 100).cast("long")).alias("c"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    a = daily.select("key", F.col("d").alias("d1"), F.col("c").alias("c1"), F.col("n").alias("n1"))
    b = daily.select("key", F.col("d").alias("d2"), F.col("c").alias("c2"), F.col("n").alias("n2"))
    pairs = (
        a.join(b, "key")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "key",
            (
                (F.col("c2") * F.col("n1") - F.col("c1") * F.col("n2"))
                / (F.col("n1") * F.col("n2") * (F.col("d2") - F.col("d1")))
            ).alias("slope"),
        )
    )
    return (
        pairs.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), decimals).alias("ts_slope"),
        )
        .join(
            daily.groupBy("key").agg(F.count(F.lit(1)).cast("long").alias("n_days")),
            "key",
        )
        .select("key", "n_days", "n_pairs", "ts_slope")
    )
