"""Cucconi two-sample location-scale test per key (Cucconi, Giornale
dell'Istituto Italiano degli Attuari 1968; public rank formulas, see
Marozzi 2009 for the modern exposition) — the older, one-shot
alternative to Lepage: instead of summing a location z² and a scale
z², it scores the SQUARED ranks and the squared CONTRARY ranks of
one sample and combines them through their known null correlation.

With combined-sample ranks S_j of the b-sample (size m; a-sample
size n, N = n + m) in the deterministic (cents, us, label) total
order (full ties are between interchangeable rows — rank sums of
squares are assignment-dependent ONLY across label boundaries, which
the label tiebreak pins identically on both engines):

    U = (6*sum S_j^2   - m(N+1)(2N+1)) / sqrt(mn(N+1)(2N+1)(8N+11)/5)
    V = (6*sum (N+1-S_j)^2 - m(N+1)(2N+1)) / (same denominator)
    rho = 2(N^2-4) / ((2N+3)(8N+11)) - 1
    C = (U^2 + V^2 - 2*rho*U*V) / (2*(1 - rho^2))

C is asymptotically exponential(-ish, mean 1) under H0; large C
rejects. U catches location (through the rank asymmetry of squares),
V mirrors it from the top, and together they see scale.

Exactness: sum S^2 and sum (N+1-S)^2 accumulate in decimal(38,0)
(S^2 <= N^2 per row; the sums are <= N^3) and are emitted as BIGINT
under the same ~2.1M-rows-per-key documented ceiling as cvm; U, V,
rho, C are one fixed double tree over exact integers, round 6,
signed zero normalized.

Plan shape (100 TB): one scan -> ONE (key)-window rank -> one hash
agg on the same hash(key) exchange. No joins, no Python, no global
windows — strictly cheaper than cvm (one window, not two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

DEC = "decimal(38,0)"


def cucconi_test(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    is_a: str = "is_a",
    min_each: int = 8,
) -> DataFrame:
    """Per-key Cucconi C between rows flagged ``is_a`` (the reference
    sample) and the rest (the scored sample). Returns (key, n_a,
    n_b, sq_rank, sq_contra, cucconi_c); keys with either sample
    below ``min_each`` drop."""
    me = max(int(min_each), 2)
    base = df.select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("us"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
        F.col(is_a).cast("int").alias("a"),
    )
    w = Window.partitionBy("key").orderBy("c", "us", "a")
    wk = Window.partitionBy("key")
    ranked = base.select(
        "key",
        "a",
        F.row_number().over(w).alias("s"),
        F.count(F.lit(1)).over(wk).alias("nn"),
    )
    s = F.col("s").cast(DEC)
    contra = (F.col("nn") + 1 - F.col("s")).cast(DEC)
    agg = (
        ranked.groupBy("key")
        .agg(
            F.sum("a").cast("long").alias("n_a"),
            F.sum(F.lit(1) - F.col("a")).cast("long").alias("n_b"),
            F.sum(F.when(F.col("a") == 0, (s * s).cast(DEC))).alias("_sq"),
            F.sum(
                F.when(F.col("a") == 0, (contra * contra).cast(DEC))
            ).alias("_sc"),
        )
        .filter((F.col("n_a") >= me) & (F.col("n_b") >= me))
    )
    n = F.col("n_a").cast("double")
    m = F.col("n_b").cast("double")
    nn = n + m
    den = F.sqrt(
        m * n * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / F.lit(5.0)
    )
    u = (
        F.lit(6.0) * F.col("_sq").cast("double")
        - m * (nn + 1) * (2 * nn + 1)
    ) / den
    v = (
        F.lit(6.0) * F.col("_sc").cast("double")
        - m * (nn + 1) * (2 * nn + 1)
    ) / den
    rho = F.lit(2.0) * (nn * nn - 4) / (
        (2 * nn + 3) * (8 * nn + 11)
    ) - F.lit(1.0)
    cstat = F.round(
        (u * u + v * v - F.lit(2.0) * rho * u * v)
        / (F.lit(2.0) * (F.lit(1.0) - rho * rho)),
        6,
    ) + F.lit(0.0)
    return agg.select(
        "key",
        "n_a",
        "n_b",
        F.col("_sq").cast("long").alias("sq_rank"),
        F.col("_sc").cast("long").alias("sq_contra"),
        cstat.alias("cucconi_c"),
    )
