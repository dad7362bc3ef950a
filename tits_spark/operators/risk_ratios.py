"""Downside-aware performance ratios per key — Sortino (1994), Omega
(Keating & Shadwick 2002) and a Calmar-style return-to-max-drawdown
ratio over daily closes: the risk-adjusted summary layer on top of
drawdown/underwater (which report the drawdown path itself) and
naive_backtest (which scores forecasts, not performance).

Protocol: per-key daily closes are the last observation of each
OBSERVED day (arg-max by microsecond within the (key, day) group, the
rollup cascade's close rule); daily changes r_d are differences of
consecutive observed-day closes (gap-skipping — an unobserved day is
no change, matching LOCF semantics without materializing a spine).
All in exact cents:

    sum_r  = sum r_d            ( = last close - first close )
    down2  = sum min(r_d, 0)^2          gain = sum max(r_d, 0)
    loss   = sum max(-r_d, 0)           maxdd = max(running_peak - close)

    sortino = sum_r / sqrt(n * down2)     (mean/downside-RMS, the
                                           n-scalings cancel)
    omega   = gain / loss                 (threshold 0)
    calmar  = sum_r / maxdd               (net change per unit of
                                           worst drawdown; the
                                           annualization constant is
                                           presentation, not data)

Exactness: every numerator/denominator is an exact int64 (down2 needs
daily moves^2 * days < 2^63: ~1e6-cent moves for 3e3 days — any
practical series; decimal would be the escape hatch); each ratio is
one double tree over exact integers, round 6, signed-zero normalized,
NULL at its zero-denominator pole.

Plan shape (100 TB): one hash agg collapses raw rows to observed-day
closes, then the lag/running-max windows and the final agg all ride
hashpartitioning(key) — ONE scan, ZERO joins, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def risk_ratios(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_days: int = 10,
) -> DataFrame:
    """Per-key Sortino / Omega / Calmar over observed-day closes.

    Returns (key, n_days, sum_r, down2, gain, loss, maxdd, sortino,
    omega, calmar); keys with fewer than ``min_days`` observed days
    drop."""
    md = max(int(min_days), 3)
    daily = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        # (key, us) max-cents dedup first (the var_backtest rule), so
        # max_by's tie-break on duplicate timestamps is deterministic
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
        .withColumn("d", floordiv(F.col("us"), 86_400_000_000))
        .groupBy("key", "d")
        .agg(F.max_by("c", "us").alias("close"))
    )
    wo = Window.partitionBy("key").orderBy("d")
    wpk = (
        Window.partitionBy("key")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = F.col("close") - F.lag("close").over(wo)
    rows = daily.select(
        "key",
        "close",
        r.alias("r"),
        (F.max("close").over(wpk) - F.col("close")).alias("dd"),
    )
    agg = rows.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("r").alias("sum_r"),
        F.sum(
            F.when(F.col("r") < 0, F.col("r") * F.col("r")).otherwise(F.lit(0))
        ).alias("down2"),
        F.sum(F.greatest(F.col("r"), F.lit(0))).alias("gain"),
        F.sum(F.greatest(-F.col("r"), F.lit(0))).alias("loss"),
        F.max("dd").alias("maxdd"),
    ).filter(F.col("n_days") >= md)
    n_ret = F.col("n_days") - 1  # r is NULL on the first day
    sortino = F.when(
        F.col("down2") > 0,
        F.round(
            F.col("sum_r").cast("double")
            / F.sqrt(n_ret.cast("double") * F.col("down2").cast("double")),
            6,
        )
        + F.lit(0.0),
    )
    omega = F.when(
        F.col("loss") > 0,
        F.round(F.col("gain").cast("double") / F.col("loss").cast("double"), 6)
        + F.lit(0.0),
    )
    calmar = F.when(
        F.col("maxdd") > 0,
        F.round(
            F.col("sum_r").cast("double") / F.col("maxdd").cast("double"), 6
        )
        + F.lit(0.0),
    )
    return agg.select(
        "key",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("sum_r").cast("long").alias("sum_r"),
        F.col("down2").cast("long").alias("down2"),
        F.col("gain").cast("long").alias("gain"),
        F.col("loss").cast("long").alias("loss"),
        F.col("maxdd").cast("long").alias("maxdd"),
        sortino.alias("sortino"),
        omega.alias("omega"),
        calmar.alias("calmar"),
    )
