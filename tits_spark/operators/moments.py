"""Higher-moment distribution diagnostics per key: skewness, excess
kurtosis, and the Jarque-Bera normality statistic.

The reference's diagnostics family (SURVEY.md §2: znorm / variance /
entropy / Ljung-Box) stops at second moments; a 10^12-turn telemetry
pipeline also screens for asymmetry and tail weight before fitting
anything Gaussian. Spark-first formulation: ONE partial+final hash
aggregate per key over integer-cent power sums —

    c   = round(value * 100)                (exact cents, BIGINT-safe)
    S_p = sum(c^p), p = 1..4                (decimal(38,0), exact)

— then the central moments / skew / kurtosis / JB come from one fixed
double expression over (n, S1..S4). Because every input to that
expression is an EXACT integer and every floating-point step is a
single correctly-rounded IEEE op written identically in the DuckDB
oracle (HUGEINT sums there), the outputs are bit-identical across
engines with no quantization — the corr_matrix integer-moment device
(operators/corr_matrix.py) extended to 4th order. Skewness, kurtosis
and JB are scale-invariant, so the 100x cent scaling cancels exactly.

Exactness bound: |c| <= ~3e4 keeps c^4 under 6e18 and the per-key sums
inside decimal(38,0) for any realistic key size (< 1e18 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_stats(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    min_points: int = 8,
) -> DataFrame:
    """(key, n, mean, std, skewness, kurtosis, jb) per key.

    ``mean``/``std`` are in original units (cent moments / 100 — one
    IEEE division, identical either side); ``kurtosis`` is EXCESS
    kurtosis (normal = 0); ``jb = n/6 * (skew^2 + kurt^2/4)``. Keys
    with fewer than ``min_points`` non-null values or zero variance
    are dropped (no finite skew/kurt there).
    """
    c = F.round(F.col(value) * 100, 0).cast("decimal(10,0)")
    c2 = (c * c).cast("decimal(21,0)")
    agg = (
        df.where(F.col(value).isNotNull())
        .select(F.col(key).alias("key"), c.alias("_c"), c2.alias("_c2"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_c").cast("decimal(38,0)")).alias("s1"),
            F.sum(F.col("_c2").cast("decimal(38,0)")).alias("s2"),
            F.sum((F.col("_c2") * F.col("_c")).cast("decimal(38,0)")).alias("s3"),
            F.sum((F.col("_c2") * F.col("_c2")).cast("decimal(38,0)")).alias("s4"),
        )
    )
    nn = F.col("n").cast("double")
    r1 = F.col("s1").cast("double") / nn
    r2 = F.col("s2").cast("double") / nn
    r3 = F.col("s3").cast("double") / nn
    r4 = F.col("s4").cast("double") / nn
    m2 = r2 - r1 * r1
    m3 = r3 - F.lit(3.0) * r1 * r2 + F.lit(2.0) * r1 * r1 * r1
    m4 = (
        r4
        - F.lit(4.0) * r1 * r3
        + F.lit(6.0) * r1 * r1 * r2
        - F.lit(3.0) * r1 * r1 * r1 * r1
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    jb = nn / F.lit(6.0) * (skew * skew + kurt * kurt / F.lit(4.0))
    return (
        agg.where((F.col("n") >= min_points))
        .select(
            "key",
            "n",
            (r1 / F.lit(100.0)).alias("mean"),
            (F.sqrt(m2) / F.lit(100.0)).alias("std"),
            m2.alias("_m2"),
            skew.alias("skewness"),
            kurt.alias("kurtosis"),
            jb.alias("jb"),
        )
        .where(F.col("_m2") > 0)
        .drop("_m2")
    )
