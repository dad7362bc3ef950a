"""Mood's median test per key (Mood, "Introduction to the Theory of
Statistics" 1950; Brown & Mood 1951 — public formula), weekend vs
weekday: the bluntest, most outlier-proof two-sample location screen
— dichotomize every observation at the POOLED median and chi-square
the resulting 2x2 table. Where mann_whitney uses full rank
information (efficient but movable by a heavy tail), the median test
uses ONE bit per row; when the two disagree, the data has tail
structure worth looking at (and bws will say where).

The pooled median is the copied order statistic at rank (N+1)//2 in
the (cents, us) order (the house device — exact, never a float
quantile). With the 2x2 counts (n11 = a above, n12 = a at-or-below,
n21/n22 same for b) and margins r1 = n_a, r2 = n_b, c1 = above,
c2 = N - c1:

    chi2 = N * (n11*n22 - n12*n21)^2 / (r1 * r2 * c1 * c2)

— exact BIGINT counts, decimal(38,0) cross products (the
determinant squares past int64 at corpus scale), ONE double tree,
round 6. Keys where every row ties the median (c1 = 0) drop.

Plan shape (100 TB): one scan -> one (key)-window rank (the copied
order statistic rides the same sort) -> one hash agg on the same
hash(key) exchange. No joins, no Python, no global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv

DEC = "decimal(38,0)"


def mood_median_test(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 8,
) -> DataFrame:
    """Per-key Mood's median test between rows flagged ``is_a`` and
    the rest. Returns (key, n_a, n_b, n11, n21, med_cents, chi2);
    keys with either sample below ``min_each`` or a degenerate split
    (no row above the pooled median) drop."""
    me = max(int(min_each), 2)
    base = df.select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("us"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
        F.col(is_a).cast("int").alias("a"),
    )
    wr = Window.partitionBy("key").orderBy("c", "us")
    wk = Window.partitionBy("key")
    ranked = base.select(
        "key",
        "a",
        "c",
        F.row_number().over(wr).alias("_rk"),
        F.count(F.lit(1)).over(wk).alias("_n"),
    )
    med = F.max(
        F.when(
            F.col("_rk")
            == F.greatest(floordiv(F.col("_n") + 1, 2), F.lit(1)),
            F.col("c"),
        )
    ).over(wk)
    split = ranked.select(
        "key",
        "a",
        med.alias("_med"),
        F.when(F.col("c") > med, 1).otherwise(0).alias("_hi"),
    )
    agg = (
        split.groupBy("key")
        .agg(
            F.sum("a").cast("long").alias("n_a"),
            F.sum(F.lit(1) - F.col("a")).cast("long").alias("n_b"),
            F.sum(F.col("a") * F.col("_hi")).cast("long").alias("n11"),
            F.sum((F.lit(1) - F.col("a")) * F.col("_hi"))
            .cast("long")
            .alias("n21"),
            F.max("_med").alias("med_cents"),
        )
        .filter((F.col("n_a") >= me) & (F.col("n_b") >= me))
    )
    n = F.col("n_a").cast(DEC)
    m = F.col("n_b").cast(DEC)
    nn = n + m
    n11 = F.col("n11").cast(DEC)
    n21 = F.col("n21").cast(DEC)
    n12 = n - n11
    n22 = m - n21
    c1 = n11 + n21
    c2 = nn - c1
    det = (n11 * n22 - n12 * n21).cast(DEC)
    chi2 = F.when(
        (c1 > 0) & (c2 > 0),
        F.round(
            (nn * det * det).cast("double")
            / (n * m * c1 * c2).cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return agg.select(
        "key",
        "n_a",
        "n_b",
        "n11",
        "n21",
        "med_cents",
        chi2.alias("chi2"),
    ).filter(F.col("chi2").isNotNull())
