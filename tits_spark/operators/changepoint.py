"""CUSUM mean-shift changepoint detection per series.

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
