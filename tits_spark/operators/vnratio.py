"""Successive-difference serial-dependence ratios per key: the
Durbin-Watson / von Neumann ratio on returns and the Bartels rank
von Neumann test.

Two classical screens built on the SAME quantity — the sum of squared
successive differences — at two robustness levels (von Neumann 1941;
Durbin & Watson 1950; Bartels, JASA 1982; all public formulas):

* ``durbin_watson``: DW = sum (r_t - r_{t-1})^2 / sum r_t^2 over the
  cents returns. DW ~ 2 means white noise, << 2 positive serial
  correlation, >> 2 negative. The von Neumann ratio is the same
  statistic with the small-sample factor, VN = DW * n/(n-1).
* ``bartels_rank``: the RANK version — replace each tick by its rank,
  compute RVN = sum (R_t - R_{t+1})^2 / (n(n^2-1)/12) and the normal
  z-score with Bartels' exact variance
  4(n-2)(5n^2-2n-9) / (5n(n+1)(n-1)^2). Distribution-free: heavy
  tails or level shifts cannot masquerade as dependence.

Exactness: cents with the house dup-timestamp rule (max cents per
(key, us)). Returns and their squares are exact int64; rank ties are
broken deterministically by timestamp (row_number over (c, us) — the
documented total order, so ranks are a permutation of 1..n and the
denominator n(n^2-1)/12 is EXACT, no tie-correction term). All sums
accumulate in decimal(38,0); each output is ONE double expression
over those exact integers, rounded at 6dp.

Plan shape (the 100 TB argument): both tests are the bns_jumps plan —
dedup aggregate, one window pass, one groupBy, all riding ONE
hashpartitioning(key) exchange; no join, no UDF, state per row O(1).
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


def durbin_watson(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_returns: int = 30,
) -> DataFrame:
    """Per-key Durbin-Watson and von Neumann ratios on cents returns.

    Returns (key, n_ret, dw, vn) rounded to 6dp; keys with fewer than
    ``min_returns`` returns, or with all-zero returns (DW undefined),
    are dropped / NULL respectively.
    """
    mo = max(int(min_returns), 3)
    wo = Window.partitionBy("key").orderBy("us")
    r = (
        _ticks(df, key, ts, value)
        .select("key", (F.col("c") - F.lag("c").over(wo)).alias("r"), "us")
        .filter(F.col("r").isNotNull())
    )
    d = r.select(
        "key",
        "r",
        (F.col("r") - F.lag("r").over(wo)).alias("d"),
    )
    agg = (
        d.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("r").cast(D19) * F.col("r")).alias("srr"),
            F.sum(F.col("d").cast(D19) * F.col("d")).alias("sdd"),
        )
        .filter(F.col("n") >= mo)
    )
    n = F.col("n").cast("double")
    dw = F.when(
        F.col("srr") > 0,
        F.col("sdd").cast("double") / F.col("srr").cast("double"),
    )
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_ret"),
        F.round(dw, 6).alias("dw"),
        F.round(dw * n / (n - 1.0), 6).alias("vn"),
    )


def bartels_rank(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_obs: int = 30,
) -> DataFrame:
    """Per-key Bartels rank von Neumann randomness test.

    Returns (key, n_obs, rvn, z): tick count, the rank von Neumann
    ratio and its normal z-score under Bartels' exact variance,
    rounded to 6dp. Rank ties break deterministically on timestamp
    (row_number over (c, us)), making ranks a permutation of 1..n.
    """
    mo = max(int(min_obs), 10)
    ticks = _ticks(df, key, ts, value)
    wr = Window.partitionBy("key").orderBy("c", "us")
    wo = Window.partitionBy("key").orderBy("us")
    ranked = ticks.withColumn("rk", F.row_number().over(wr))
    d = ranked.select(
        "key",
        (F.col("rk") - F.lead("rk").over(wo)).alias("d"),
    )
    agg = (
        d.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("d").isNotNull(),
                    F.col("d").cast(D19) * F.col("d"),
                )
            ).alias("nm"),
        )
        .filter(F.col("n") >= mo)
    )
    n = F.col("n").cast("double")
    denom = n * (n * n - 1.0) / 12.0
    rvn = F.col("nm").cast("double") / denom
    var = (
        4.0
        * (n - 2.0)
        * (5.0 * n * n - 2.0 * n - 9.0)
        / (5.0 * n * (n + 1.0) * (n - 1.0) * (n - 1.0))
    )
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n_obs"),
        F.round(rvn, 6).alias("rvn"),
        F.round((rvn - 2.0) / F.sqrt(var), 6).alias("z"),
    )
