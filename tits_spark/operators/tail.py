"""Heavy-tail diagnostics: the Hill tail-index estimator per key.

Hill (Annals of Statistics 1975, public formula): with the k largest
positive observations x_(1) >= ... >= x_(k) and the threshold
x_(k+1),

    H_k   = (1/k) * sum_i ln(x_(i)) - ln(x_(k+1))
    alpha = 1 / H_k

alpha estimates the Pareto tail exponent — the standard check that a
value distribution (latencies, token counts, transfer sizes) is
heavy-tailed and HOW heavy, which decides whether mean-based capacity
math is even valid. alpha <= 2 means infinite variance; alpha <= 1,
infinite mean.

Plan shape: one window shuffle per key (rank by value desc — the same
per-group top-k shape as stratified sampling), the k+1 frame filter
prunes everything else BEFORE the aggregate, so the agg input is
(k+1) x n_keys rows regardless of input size. Ties at the k+1
boundary are broken by (ts, value) row order — any choice among equal
values yields the same ln, so the statistic is tie-stable by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hill_tail(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    k: int = 50,
) -> DataFrame:
    """Per-key Hill estimator over the k largest positive values.
    Returns (key, n_pos, hill, alpha) rounded to 6dp; keys with fewer
    than k+1 positive observations drop out (the threshold order
    statistic doesn't exist). Degenerate tails (all top values equal,
    H = 0) return NULL alpha rather than +inf."""
    kk = int(k)
    pos = df.filter(F.col(value) > 0)
    w = Window.partitionBy(key).orderBy(F.desc(value), F.asc(ts))
    ranked = pos.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= kk + 1
    )
    counts = pos.groupBy(key).agg(F.count(F.lit(1)).alias("n_pos"))
    agg = (
        ranked.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("_m"),
            F.sum(F.when(F.col("_r") <= kk, F.log(value))).alias("_s"),
            F.max(F.when(F.col("_r") == kk + 1, F.col(value))).alias("_xk1"),
        )
        .filter(F.col("_m") == kk + 1)
    )
    h = F.col("_s") / kk - F.log("_xk1")
    return (
        agg.join(counts, key)
        .select(
            F.col(key).alias("key"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.round(h, 6).alias("hill"),
            F.round(
                F.when(h > 0, F.lit(1.0) / h), 6
            ).alias("alpha"),
        )
    )
