"""Changepoint detection per series: CUSUM (parametric) and Pettitt
(rank-based, outlier-robust).

The classic offline CUSUM statistic: with S_i the running sum of
deviations from the series mean, the most likely single changepoint is
argmax |S_i|, and |S_i| / (sd * sqrt(n)) is its normalized magnitude
(values ≳ 1.36 reject "no shift" at ~5% for Brownian-bridge limits).
Everything is one hash-partition by key plus window algebra — no UDFs,
no collect — so a million series scan as one co-partitioned pass; the
per-key state Catalyst carries is O(1).

The before/after mean-shift estimate falls out of the same running sum
in closed form: mean_before = mean + S_cp/i, mean_after =
mean - S_cp/(n-i), so delta = -S_cp * n / (i * (n - i)) — no second
scan over the split halves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoint(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_points: int = 8,
) -> DataFrame:
    """Most likely mean-shift changepoint per key.

    Returns (key, cp_ts, cp_idx, n_obs, stat, delta): the timestamp and
    1-based index of argmax |S_i| (ties broken by earliest (ts, value)
    — the cumulative order is pinned to (ts, value) so duplicate
    timestamps stay deterministic), the normalized CUSUM statistic, and
    the closed-form before/after mean difference. The last row is
    excluded as a candidate (S_n == 0 identically; a "changepoint"
    after the final observation is meaningless). Keys shorter than
    ``min_points`` or with zero variance are dropped.
    """
    w_k = Window.partitionBy(key)
    w_ord = Window.partitionBy(key).orderBy(ts, value)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prepped = (
        df.withColumn("_n", F.count(F.lit(1)).over(w_k))
        .withColumn("_mean", F.avg(value).over(w_k))
        .withColumn("_sd", F.stddev_samp(value).over(w_k))
        .withColumn("_s", F.sum(F.col(value) - F.col("_mean")).over(w_cum))
        .withColumn("_i", F.row_number().over(w_ord))
        .filter(
            (F.col("_n") >= min_points)
            & (F.col("_sd") > 0)
            & (F.col("_i") < F.col("_n"))
        )
    )
    pick = F.row_number().over(
        Window.partitionBy(key).orderBy(
            F.abs(F.col("_s")).desc(), F.col(ts).asc(), F.col(value).asc()
        )
    )
    return (
        prepped.withColumn("_pick", pick)
        .filter(F.col("_pick") == 1)
        .select(
            F.col(key).alias("key"),
            F.col(ts).alias("cp_ts"),
            F.col("_i").alias("cp_idx"),
            F.col("_n").alias("n_obs"),
            (F.abs("_s") / (F.col("_sd") * F.sqrt("_n"))).alias("stat"),
            (
                -F.col("_s") * F.col("_n")
                / (F.col("_i") * (F.col("_n") - F.col("_i")))
            ).alias("delta"),
        )
    )


def pettitt_changepoint(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_points: int = 8,
) -> DataFrame:
    """Pettitt (1979) non-parametric single-changepoint test per key.

    The statistic U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j) is the
    Mann-Whitney displacement between the prefix and the suffix; the
    changepoint is argmax_t |U_t| over t in [1, n-1]. The O(n^2)
    double sum collapses to window algebra through the midrank
    identity sum_{j != i} sgn(x_i - x_j) = 2*r_i - (n+1) (r_i the
    tie-averaged rank), giving U_t = 2*R_t - t*(n+1) with R_t the
    time-ordered running sum of midranks. 2*r_i = 2*min_rank +
    ties - 1 is an integer, so every intermediate is exact integer
    arithmetic — no float divergence anywhere.

    Plan: one hash-partition by key, three windows (value-order rank,
    per-(key,value) tie count, time-order cumsum) — no UDFs, no
    collect; scales to millions of series as one co-partitioned pass.

    Returns (key, cp_ts, cp_idx, n_obs, k_stat, p_approx): timestamp
    and 1-based index of the split (ties broken by earliest (ts,
    value)), the max statistic K, and the standard significance
    approximation p = 2*exp(-6K^2/(n^3+n^2)).
    """
    w_k = Window.partitionBy(key)
    w_val = Window.partitionBy(key).orderBy(value)
    w_tie = Window.partitionBy(key, value)
    w_ord = Window.partitionBy(key).orderBy(ts, value)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prepped = (
        df.withColumn("_n", F.count(F.lit(1)).over(w_k))
        # 2*midrank as an exact long: 2*min_rank + (#ties - 1)
        .withColumn(
            "_mr2",
            2 * F.rank().over(w_val) + F.count(F.lit(1)).over(w_tie) - F.lit(1),
        )
        .withColumn("_i", F.row_number().over(w_ord))
        .withColumn(
            "_u",
            F.sum("_mr2").over(w_cum) - F.col("_i") * (F.col("_n") + F.lit(1)),
        )
        .filter((F.col("_n") >= min_points) & (F.col("_i") < F.col("_n")))
    )
    pick = F.row_number().over(
        Window.partitionBy(key).orderBy(
            F.abs(F.col("_u")).desc(), F.col(ts).asc(), F.col(value).asc()
        )
    )
    n, k = F.col("_n"), F.abs(F.col("_u"))
    return (
        prepped.withColumn("_pick", pick)
        .filter(F.col("_pick") == 1)
        .select(
            F.col(key).alias("key"),
            F.col(ts).alias("cp_ts"),
            F.col("_i").alias("cp_idx"),
            F.col("_n").alias("n_obs"),
            k.cast("long").alias("k_stat"),
            (2 * F.exp(-6 * k * k / (n * n * n + n * n))).alias("p_approx"),
        )
    )
