"""Engle ARCH-LM test per key — does volatility cluster at all?

The DECISION GATE in front of the GARCH filter (operators/garch.py):
Engle's Lagrange-multiplier test (Engle, Econometrica 1982, public
formula) regresses the squared return on its lag and reports
LM = n * R^2, chi-square(1) under the null of no ARCH effects
(5% critical value 3.841). Running it first tells a 10^12-turn
pipeline WHICH keys are worth a conditional-variance model and which
are plain white noise — the same triage role kpss/lo_rs play for the
level. Lag order is fixed at p=1 (the dominant term; an n-dependent
p would put a data-dependent regressor count in the cross-engine
contract).

Exactness: cents-quantized values with the house dup-timestamp rule
(max cents per (key, us)); returns r_t = c_t - c_{t-1} and squares
z_t = r_t^2 are exact int64. Over the (z_t, z_{t-1}) pairs the five
sufficient statistics

    m,  Sx = sum z_{t-1},  Sy = sum z_t,
    Sxx = sum z_{t-1}^2,   Syy = sum z_t^2,   Sxy = sum z_t z_{t-1}

accumulate in decimal(38,0) (z <= r_max^2, so Sxx <= n * r_max^4 —
inside decimal(38,0) for ~10^9 ticks/key at 3-figure-cent moves; ANSI
mode fails LOUD past the bound, never wraps). Both engines then
convert the SAME exact decimals to double and evaluate ONE identical
expression tree for the cleared-denominator R^2

    R^2 = (m*Sxy - Sx*Sy)^2 / ((m*Sxx - Sx^2) * (m*Syy - Sy^2))

— the kpss device: the conversions may wobble an ulp past 2^53, a
relative 1e-16 on an O(1) R^2 and an O(n) LM, far inside the 6dp
rounding quantum. Constant-variance keys (either cleared variance 0)
return NULL for r2/lm rather than 0/0.

Plan shape (the 100 TB argument): ONE scan; the dedup aggregate, the
two window lags and the final groupBy all ride ONE
hashpartitioning(key) exchange — no join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

D19 = "decimal(19,0)"


def arch_lm(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_pairs: int = 30,
) -> DataFrame:
    """Per-key ARCH-LM(1) test over consecutive-tick squared returns.

    Returns (key, n_pairs, r2, lm): the (z_t, z_{t-1}) pair count, the
    lag-1 regression R^2 and the LM = n*R^2 statistic (both rounded to
    6dp; NULL when either side of the regression is constant). Keys
    with fewer than ``min_pairs`` pairs are dropped.
    """
    mo = int(min_pairs)
    ticks = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )
    wo = Window.partitionBy("key").orderBy("us")
    r = ticks.select(
        "key", "us", (F.col("c") - F.lag("c").over(wo)).alias("r")
    )
    z = r.select(
        "key",
        "us",
        (F.col("r") * F.col("r")).alias("zt"),
        (F.lag("r").over(wo) * F.lag("r").over(wo)).alias("zl"),
    ).filter(F.col("zl").isNotNull() & F.col("zt").isNotNull())
    agg = (
        z.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("zl").cast(D19)).alias("sx"),
            F.sum(F.col("zt").cast(D19)).alias("sy"),
            F.sum(F.col("zl").cast(D19) * F.col("zl")).alias("sxx"),
            F.sum(F.col("zt").cast(D19) * F.col("zt")).alias("syy"),
            F.sum(F.col("zl").cast(D19) * F.col("zt")).alias("sxy"),
        )
        .filter(F.col("m") >= mo)
    )
    m = F.col("m").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    vx = m * F.col("sxx").cast("double") - sx * sx
    vy = m * F.col("syy").cast("double") - sy * sy
    cov = m * F.col("sxy").cast("double") - sx * sy
    r2 = F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy))
    return agg.select(
        "key",
        F.col("m").cast("long").alias("n_pairs"),
        F.round(r2, 6).alias("r2"),
        F.round(m * r2, 6).alias("lm"),
    )
