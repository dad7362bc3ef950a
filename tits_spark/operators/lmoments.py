"""L-moments per key: robust distribution shape from order statistics.

Hosking (JRSS-B 1990, public formulas): with the ascending order
statistics x_(1..n) and probability-weighted moments

    b0 = sum x_i / n
    b1 = sum (i-1) x_i / (n(n-1))
    b2 = sum (i-1)(i-2) x_i / (n(n-1)(n-2))

the L-scale l2 = 2 b1 - b0 and L-skewness t3 = l3 / l2 with
l3 = 6 b2 - 6 b1 + b0. Unlike variance/skewness they are LINEAR in
the order statistics — finite-variance-free, outlier-resistant, the
standard shape screen in hydrology/extremes (and the natural partner
of hill_tail: t3 says HOW asymmetric, Hill says how heavy).

Exactness device: with cents c_i and rank i, the numerators
B0, B1 = sum (i-1) c_i, B2 = sum (i-1)(i-2) c_i are exact decimal
sums (rank weights are invariant under permutations of tied cents, so
any tie order gives the same sums), and the denominators clear:

    l2 * n(n-1)        = 2 B1 - (n-1) B0                     (exact)
    l3 * n(n-1)(n-2)   = 6 B2 - 6(n-2) B1 + (n-1)(n-2) B0    (exact)
    t3                 = L3N / (L2N * (n-2))   — ONE double division.

Plan: one rank window per key + one hash agg (the stratified-top-k
shuffle shape); no second pass, no float aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lmoments_by_key(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Per-key l1 (L-location), l2 (L-scale) and t3 (L-skewness).

    Returns (key, n, l1_u6, l2_u6, t3_u6) in value units on the
    floor-1e6 lattice; keys with n < 3 drop out (b2 needs three
    points). t3 is NULL when l2 == 0 (constant series)."""
    cents = F.round(F.col(value) * 100).cast("long")
    base = df.select(
        F.col(key).alias("key"), F.col(ts).alias("ts"), cents.alias("c")
    )
    w = Window.partitionBy("key").orderBy("c", "ts")
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    ranked = base.withColumn("i", F.row_number().over(w))
    agg = (
        ranked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("c"))).alias("b0"),
            # cast (i-1) to decimal BEFORE the product (b2's pattern):
            # an int64 (i-1)*c can silently wrap on very long,
            # high-magnitude series while the HUGEINT oracle stays exact
            F.sum(dec((F.col("i") - 1).cast("decimal(19,0)") * F.col("c"))).alias("b1"),
            F.sum(
                dec((F.col("i") - 1).cast("decimal(19,0)") * (F.col("i") - 2) * F.col("c"))
            ).alias("b2"),
        )
        .filter(F.col("n") >= 3)
    )
    n = F.col("n").cast("decimal(38,0)")
    l2n = F.lit(2) * F.col("b1") - (n - 1) * F.col("b0")
    l3n = (
        F.lit(6) * F.col("b2")
        - F.lit(6) * (n - 2) * F.col("b1")
        + (n - 1) * (n - 2) * F.col("b0")
    )
    # cents -> value units: one division per statistic
    l1 = F.col("b0").cast("double") / (F.col("n") * 100.0)
    l2 = l2n.cast("double") / (
        (F.col("n") * (F.col("n") - 1)).cast("double") * 100.0
    )
    t3 = l3n.cast("double") / (
        l2n.cast("double") * (F.col("n") - 2).cast("double")
    )
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n"),
        F.floor(l1 * 1e6).cast("long").alias("l1_u6"),
        F.floor(l2 * 1e6).cast("long").alias("l2_u6"),
        F.when(l2n != 0, F.floor(t3 * 1e6).cast("long")).alias("t3_u6"),
    )
