"""Mean-reversion half-life per key: the AR(1) level regression and
the Ornstein-Uhlenbeck half-life read off its slope.

The standard mean-reversion gauge (the discrete OU estimator, public
formula; see e.g. Chan, "Algorithmic Trading", and every pairs-trading
text): regress the level on its own lag,

    c_t = a + phi * c_{t-1} + e_t,
    half_life = -ln 2 / ln phi          (0 < phi < 1)

phi ~ 1 is a random walk (no reversion, half-life -> infinity);
phi < 1 reverts with the given half-life in TICKS; phi <= 0 or
phi >= 1 gets a NULL half-life. The level counterpart of arch_lm
(same five-sufficient-statistic skeleton on squared returns) and the
single-series counterpart of coint_eg's residual AR step.

Exactness: cents with the house dup-timestamp rule; over the
(c_t, c_{t-1}) pairs the five sufficient statistics m, Sx, Sy, Sxx,
Syy, Sxy accumulate in decimal(38,0) (|c| <= ~1e6 cents keeps c^2
per-term inside int64; ANSI mode fails LOUD past the decimal bound).
phi and the intercept are ONE cleared-denominator double tree

    phi = (m*Sxy - Sx*Sy) / (m*Sxx - Sx^2)

over the exact decimals; r2 multiplies by the symmetric y-side
factor. Constant keys (either cleared variance 0) return NULLs.

Plan shape (the 100 TB argument): dedup aggregate, one window lag,
one groupBy — ONE hashpartitioning(key) exchange; no join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

D19 = "decimal(19,0)"


def ar1_half_life(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 30,
) -> DataFrame:
    """Per-key AR(1) level fit and OU half-life.

    Returns (key, n_pairs, phi, r2, half_life): the lag-1 slope, the
    regression r-squared and -ln2/ln(phi) in ticks, all rounded to
    6dp; half_life is NULL unless 0 < phi < 1. Keys with fewer than
    ``min_obs`` (lag, level) pairs drop out.
    """
    mo = max(int(min_obs), 3)
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
    pairs = ticks.select(
        "key",
        F.col("c").alias("y"),
        F.lag("c").over(wo).alias("x"),
    ).filter(F.col("x").isNotNull())
    agg = (
        pairs.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(F.col("x").cast(D19)).alias("sx"),
            F.sum(F.col("y").cast(D19)).alias("sy"),
            F.sum(F.col("x").cast(D19) * F.col("x")).alias("sxx"),
            F.sum(F.col("y").cast(D19) * F.col("y")).alias("syy"),
            F.sum(F.col("x").cast(D19) * F.col("y")).alias("sxy"),
        )
        .filter(F.col("m") >= mo)
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    vx_dec = dec("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy_dec = dec("m") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = (dec("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = vx_dec.cast("double")
    vy = vy_dec.cast("double")
    phi = F.when((vx_dec > 0), cov / vx)
    r2 = F.when((vx_dec > 0) & (vy_dec > 0), cov * cov / (vx * vy))
    hl = F.when(
        (phi > 0.0) & (phi < 1.0), -F.log(F.lit(2.0)) / F.log(phi)
    )
    return agg.select(
        "key",
        F.col("m").cast("long").alias("n_pairs"),
        F.round(phi, 6).alias("phi"),
        F.round(r2, 6).alias("r2"),
        F.round(hl, 6).alias("half_life"),
    )
