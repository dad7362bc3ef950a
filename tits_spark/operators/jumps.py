"""Barndorff-Nielsen & Shephard jump detection per key — how much of
a series' realized variance comes from JUMPS rather than continuous
diffusion?

Public formulas (Barndorff-Nielsen & Shephard 2004): with returns
r_i = c_i - c_{i-1} over consecutive ticks,

    RV = sum r_i^2                      (realized variance)
    BV = (pi/2) * sum |r_i| |r_{i-1}|   (bipower variation)

BV is robust to jumps (a single jump enters BV linearly but RV
quadratically), so the relative jump share RJ = (RV - BV) / RV
isolates the discontinuous component: RJ near 0 means diffusion-like,
RJ near 1 means jump-dominated. The decision partner of realized_vol
(WHAT the variance is) and hill_tail/extremal_index (HOW heavy /
clustered the tail is): this says whether variance arrives smoothly
or in discrete breaks — the difference between re-hedging
continuously and alerting on regime breaks.

Exactness: cents-quantized values with the house dup-timestamp rule
(max cents per (key, us) — the documented two-step determinism rule),
so returns, |r| products and both sums are exact int64 (bound:
n * |c|max^2 < 2^63, ~10^9 ticks/key at 6-figure cents). RJ is one
fixed double tree over the two exact integers with pi/2 embedded as
the identical repr literal on both engines.

Plan shape (the 100 TB argument): one scan; the dedup aggregate, both
window lags and the final groupBy all hash-partition by key — ONE
exchange total, no join, no UDF. Grouping by (key, session/day) at
larger scales is the same plan with a wider key.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def bns_jumps(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_returns: int = 20,
) -> DataFrame:
    """Per-key realized-variance / bipower-variation jump decomposition.

    Returns (key, n_ret, rv, bv_raw, rj): the return count, the exact
    integer realized variance and raw bipower sum (cents^2), and the
    relative jump share RJ = (RV - (pi/2)*BV_raw)/RV rounded to 6dp
    (NULL when RV = 0; negative values are finite-sample noise and are
    kept — truncating at 0 would bias the average, callers clamp).
    Keys with fewer than ``min_returns`` returns are dropped.
    """
    mo = int(min_returns)
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
    d = r.select(
        "key",
        "r",
        (F.abs(F.col("r")) * F.lag(F.abs(F.col("r"))).over(wo)).alias("p"),
    )
    agg = (
        d.groupBy("key")
        .agg(
            F.count("r").alias("n_ret"),
            F.sum(F.col("r") * F.col("r")).alias("rv"),
            F.sum("p").alias("bv_raw"),
        )
        .filter(F.col("n_ret") >= mo)
    )
    rv_d = F.col("rv").cast("double")
    rj = F.when(
        F.col("rv") > 0,
        F.round(
            (rv_d - F.lit(math.pi / 2) * F.col("bv_raw").cast("double"))
            / rv_d,
            6,
        ),
    )
    return agg.select(
        "key",
        F.col("n_ret").cast("long").alias("n_ret"),
        "rv",
        "bv_raw",
        rj.alias("rj"),
    )
