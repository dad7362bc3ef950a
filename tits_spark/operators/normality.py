"""Normality and single-outlier screens per key: the Jarque-Bera
test on returns and the Grubbs extreme studentized deviate.

* ``jarque_bera`` (Jarque & Bera 1980, public formula): with S the
  skewness and K the EXCESS kurtosis of the cents returns,
  JB = n * (S^2/6 + K^2/24), chi-square(2) under normality (5%
  critical value 5.991465). The formal yes/no in front of everything
  that assumes Gaussian innovations (the Kalman filter's likelihood,
  Gaussian VaR, OLS t-tests) — cornish_fisher quantifies HOW the tail
  deviates; JB decides WHETHER it does.
* ``grubbs`` (Grubbs 1950, public formula): G = max |x - xbar| / s
  with the SAMPLE standard deviation. Because the maximum deviation
  is always attained at the min or max order statistic, G needs only
  (n, sum, sum^2, min, max) — one aggregate, no second pass. The
  offending side is reported via the exact integer comparison
  n*(cmax + cmin) >= 2*S1 (high side wins ties).

Exactness: cents with the house dup-timestamp rule. JB's four power
sums accumulate in decimal(38,0) (cornish_fisher's device: |r| <=
~3e4 keeps r^4 inside int64 per term); Grubbs' sums and the side
comparison are exact int64/decimal. Each statistic is ONE fixed
double expression over the exact integers, rounded at 6dp — the
conversions wobble at most an ulp, far inside the rounding quantum.
Constant keys (zero variance) return NULL statistics.

Plan shape (the 100 TB argument): jarque_bera is the cornish_fisher
plan (dedup aggregate, one lag, one groupBy on ONE
hashpartitioning(key) exchange); grubbs has no window at all — dedup
aggregate then groupBy, same single exchange. No join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

D19 = "decimal(19,0)"


def _ticks(df: DataFrame, key: str, ts: str, value: str) -> DataFrame:
    return (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )


def jarque_bera(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_returns: int = 30,
) -> DataFrame:
    """Per-key Jarque-Bera normality test on cents returns.

    Returns (key, n_ret, skew, kurt_x, jb): skewness, excess
    kurtosis and the JB statistic rounded to 6dp (NULL for constant
    keys). Keys with fewer than ``min_returns`` returns drop out.
    """
    mo = max(int(min_returns), 8)
    wo = Window.partitionBy("key").orderBy("us")
    r = (
        _ticks(df, key, ts, value)
        .select("key", (F.col("c") - F.lag("c").over(wo)).alias("r"))
        .filter(F.col("r").isNotNull())
    )
    agg = (
        r.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("r").cast(D19)).alias("s1"),
            F.sum(F.col("r").cast(D19) * F.col("r")).alias("s2"),
            F.sum((F.col("r") * F.col("r")).cast(D19) * F.col("r")).alias("s3"),
            F.sum(
                (F.col("r") * F.col("r")).cast(D19) * (F.col("r") * F.col("r"))
            ).alias("s4"),
        )
        .filter(F.col("n") >= mo)
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3.0 * mu * s2 / n + 2.0 * mu * mu * mu
    m4 = (
        s4 / n
        - 4.0 * mu * s3 / n
        + 6.0 * mu * mu * s2 / n
        - 3.0 * mu * mu * mu * mu
    )
    sig = F.sqrt(m2)
    skew = m3 / (sig * sig * sig)
    kurt = m4 / (m2 * m2) - 3.0
    jb = n * (skew * skew / 6.0 + kurt * kurt / 24.0)
    ok = F.col("s2") * F.col("n") > F.col("s1") * F.col("s1")
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_ret"),
        F.round(F.when(ok, skew), 6).alias("skew"),
        F.round(F.when(ok, kurt), 6).alias("kurt_x"),
        F.round(F.when(ok, jb), 6).alias("jb"),
    )


def grubbs(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 30,
) -> DataFrame:
    """Per-key Grubbs extreme studentized deviate on cents levels.

    Returns (key, n_obs, g, side): the G statistic rounded to 6dp
    (NULL for constant keys) and which extreme attains it ('high' /
    'low', high on exact ties). Keys shorter than ``min_obs`` drop.
    """
    mo = max(int(min_obs), 3)
    agg = (
        _ticks(df, key, ts, value)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c").cast(D19)).alias("s1"),
            F.sum(F.col("c").cast(D19) * F.col("c")).alias("s2"),
            F.min("c").alias("cmin"),
            F.max("c").alias("cmax"),
        )
        .filter(F.col("n") >= mo)
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    mu = s1 / n
    # sample variance via the cleared form n*S2 - S1^2 (exact decimal)
    v_dec = F.col("n").cast("decimal(38,0)") * F.col("s2") - F.col(
        "s1"
    ) * F.col("s1")
    s = F.sqrt(v_dec.cast("double") / (n * (n - 1.0)))
    dev_hi = F.col("cmax").cast("double") - mu
    dev_lo = mu - F.col("cmin").cast("double")
    high = (
        F.col("n").cast(D19) * (F.col("cmax") + F.col("cmin"))
        >= F.lit(2).cast(D19) * F.col("s1")
    )
    g = F.when(v_dec > 0, F.when(high, dev_hi).otherwise(dev_lo) / s)
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_obs"),
        F.round(g, 6).alias("g"),
        F.when(high, F.lit("high")).otherwise(F.lit("low")).alias("side"),
    )
