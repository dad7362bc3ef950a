"""Wilcoxon signed-rank test between the two sides of the LOCF grid —
the PAIRED member of the rank-test family (mann_whitney: unpaired
location shift; kruskal_wallis: k groups; kendall/spearman:
association; this: "is x systematically above y at the same
moments?", robust to any symmetric noise distribution).

Pairing is the tits-style alignment every dependence operator here
shares (ref:/root/reference/src/tits.c rollup tiers keep
last-in-bucket): both sides resolve on the same bucket grid, so each
grid row IS a pair; d_b = x_b - y_b in exact cents (int64), zero
differences drop (Wilcoxon 1945, public formula).

Fully declarative — ZERO Python in the plan. Midranks of |d| come
from two windows (rank() for the tie-group's first position, a
(key, |d|) count for its size): midrank = r_min + (t-1)/2, kept
exact by carrying 2*midrank = 2*r_min + t - 1 as int64. The whole
comparison surface is integer:

    w2_pos   = sum over d>0 of 2*midrank        (2x the W+ statistic)
    tie_sum  = sum over rows of t^2 - 1          (= sum_groups t^3 - t)
    var48    = 2n(n+1)(2n+1) - tie_sum           (48x the variance)

and z is ONE fixed double tree over them:

    z = (w2_pos - n(n+1)/2) / sqrt(var48 / 12)

(2x-scaled numerator over 2x-scaled sd; normal approximation with the
standard tie correction, no continuity correction — documented, and
identical on both engines because the inputs are exact integers).

Scale shape: grid (one scan, two exchanges) -> per-key window pass
(the rank + tie-count windows share the same (key) partitioning) ->
one partial+final hash aggregate. No UDF, no join, windows are
per-key only — never SinglePartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.granger import locf_bucket_grid


def wilcoxon_signed_rank(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    series: str = "series",
    x_side: str = "x",
    y_side: str = "y",
    bucket_secs: int = 3600,
    min_points: int = 10,
    grid: DataFrame | None = None,
) -> DataFrame:
    """Per-key Wilcoxon signed-rank of x vs y on the LOCF grid.

    Returns (key, n_obs, w2_pos, tie_sum, var48, z): the nonzero-pair
    count, 2x the positive-rank sum, the tie term, 48x the variance
    (all exact int64), and the tie-corrected normal score (round 6,
    NULL when every |d| ties). Keys appear when >= ``min_points``
    nonzero differences exist.
    """
    if grid is None:
        grid = locf_bucket_grid(
            df, key, ts, value, series, x_side, y_side, bucket_secs
        )
    d = (
        grid.filter(F.col("xc").isNotNull() & F.col("yc").isNotNull())
        .select("key", (F.col("xc") - F.col("yc")).alias("d"))
        .filter(F.col("d") != 0)
        .withColumn("adiff", F.abs(F.col("d")))
    )
    wr = Window.partitionBy("key").orderBy("adiff")
    wt = Window.partitionBy("key", "adiff")
    ranked = d.select(
        "key",
        "d",
        # 2*midrank = 2*rank_min + tie_count - 1, exact int64
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("mr2"),
        (F.count(F.lit(1)).over(wt) * F.count(F.lit(1)).over(wt) - 1).alias(
            "t2m1"
        ),
    )
    agg = (
        ranked.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.coalesce(
                F.sum(F.when(F.col("d") > 0, F.col("mr2"))), F.lit(0)
            ).alias("w2_pos"),
            F.sum("t2m1").alias("tie_sum"),
        )
        .filter(F.col("n_obs") >= min_points)
    )
    n = F.col("n_obs")
    var48 = (2 * n * (n + 1) * (2 * n + 1) - F.col("tie_sum")).alias("var48")
    m2 = F.expr("n_obs * (n_obs + 1) DIV 2")
    out = agg.select("key", "n_obs", "w2_pos", "tie_sum", var48)
    # guarded division stays INSIDE the CASE (ANSI eager-division trap)
    z = F.when(
        F.col("var48") > 0,
        F.round(
            (F.col("w2_pos") - m2).cast("double")
            / F.sqrt(F.col("var48").cast("double") / F.lit(12.0)),
            6,
        )
        + F.lit(0.0),
    )
    return out.select("key", "n_obs", "w2_pos", "tie_sum", "var48",
                      z.alias("z"))
