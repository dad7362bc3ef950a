"""Seasonal Mann-Kendall trend test (Hirsch & Slack 1984) per key,
weekly seasons — "is this series trending, once its weekly cycle is
factored out?"

The non-seasonal test lives in operators/trend.py (Mann 1945 S +
tie-corrected variance + Theil-Sen slope); conversation/ops traffic
has a strong day-of-week cycle that inflates its variance and masks
real drift. The seasonal variant compares each day ONLY against the
same weekday: per (key, season) compute S_k and the tie-corrected
variance term, then sum across seasons (seasonal statistics are
independent under H0, Hirsch-Slack eq. 6-8, public formula).

Construction, tits-style: daily last-in-bucket (the reference's
rollup tiers keep last-in-bucket, ref:/root/reference/src/tits.c)
over ONE hash aggregate; season = epoch-day mod 7 (pure integer
arithmetic, no calendar, identical on both engines). Per (key,
season) the day indices are DISTINCT, so

    S_k = tot_k - tie_k - 2*dis_k        (all exact int64)

where dis_k is the strict-inversion count of the value sequence in
day order — computed by the same Knight O(n log n) merge-sort used by
operators/kendall.py, NOT the O(n^2) pair sweep the oracle runs. The
variance term stays integer too: var18_k = n(n-1)(2n+5) -
sum_groups t(t-1)(2t+5) (Gilbert 1987 eq. 16.5 scaled by 18). The
final Z is one fixed double tree over the exact per-key sums with the
standard continuity correction.

Scale shape: one raw scan -> one (key, day) hash agg -> the grouped
Arrow UDF keyed on (key, season) -> one (key) hash agg. Per-season
work is n log n; seasons multiply parallelism (7x more, 7x smaller
groups than the non-seasonal test).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv
from tits_spark.operators.kendall import _tie_pairs, merge_count_inversions

DAY_US = 86_400_000_000


def seasonal_mann_kendall(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    n_seasons: int = 7,
    min_points: int = 10,
) -> DataFrame:
    """Per-key seasonal MK test over daily last-in-bucket values.

    Returns (key, n_obs, s_stat, var18, z): total daily points, the
    summed seasonal S (exact int64), 18x the tie-corrected variance
    (exact int64), and the continuity-corrected normal score (round 6,
    NULL when the variance degenerates). Keys appear when >=
    ``min_points`` daily points exist across all seasons.
    """
    ticks = df.select(
        F.col(key).alias("key"),
        epoch_us(ts).alias("us"),
        F.round(F.col(value) * 100).cast("long").alias("c"),
    )
    daily = (
        ticks.withColumn("d", floordiv(F.col("us"), DAY_US))
        .groupBy("key", "d")
        .agg(F.max(F.struct("us", "c"))["c"].alias("c"))
        .withColumn("season", F.col("d") % n_seasons)
    )
    key_t = dict(daily.dtypes)["key"]
    out_schema = (
        f"key {key_t}, season long, n_s long, s_s long, var18_s long"
    )

    def per_season(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf["d"].to_numpy(np.int64), kind="stable")
        v = pdf["c"].to_numpy(np.int64)[order]
        n = v.size
        tot = n * (n - 1) // 2
        tie = _tie_pairs(v)
        dis = merge_count_inversions(v)
        _, counts = np.unique(v, return_counts=True)
        t = counts.astype(np.int64)
        var18 = n * (n - 1) * (2 * n + 5) - int(
            (t * (t - 1) * (2 * t + 5)).sum()
        )
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "season": [int(pdf["season"].iloc[0])],
                "n_s": [n],
                "s_s": [tot - tie - 2 * dis],
                "var18_s": [var18],
            }
        )

    # numbered repartition: CPU-bound grouped stage over byte-small
    # rows, exempt from AQE coalescing (guide §2; the acd guard).
    nparts = df.sparkSession.sparkContext.defaultParallelism
    per = (
        daily.repartition(nparts, "key", "season")
        .groupBy("key", "season")
        .applyInPandas(per_season, schema=out_schema)
    )
    agg = (
        per.groupBy("key")
        .agg(
            F.sum("n_s").alias("n_obs"),
            F.sum("s_s").alias("s_stat"),
            F.sum("var18_s").alias("var18"),
        )
        .filter(F.col("n_obs") >= min_points)
    )
    sd = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    # continuity-corrected Z; guarded division stays INSIDE the CASE
    z = F.when(
        F.col("var18") > 0,
        F.round(
            F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
            .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
            .otherwise(F.lit(0.0)),
            6,
        )
        + F.lit(0.0),
    )
    return agg.select("key", "n_obs", "s_stat", "var18", z.alias("z"))
