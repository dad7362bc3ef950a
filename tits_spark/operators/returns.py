"""Log returns and realized volatility as a mergeable continuous aggregate.

The reference's tools operate on irregular tick/price series (ref:
/root/reference/README.md tool list); the canonical derived series in
that domain is the log return r_t = ln(v_t / v_{t-1}) and its
per-bucket second moment, realized variance RV = sum(r_t^2) — the
standard high-frequency volatility estimator (Andersen & Bollerslev,
1998). RV is a SUM, so it cascades through the retention tiers
(1m -> 1h -> 1d) exactly like rollup.py's v_sum/v_sumsq: build once at
the finest tier, merge upward by addition, never re-read raw.

Plan shape: log_returns is one window (lag over (key, order)) — a
single shuffle on key; realized_vol is one groupBy on (key, bucket) —
partial+final hash agg. A return is attributed to the bucket of its
OWN timestamp (the right endpoint of the price change), the standard
convention, so bucket boundaries never split a return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.operators.rollup import bucket_col


def log_returns(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key log returns of a positive-valued irregular series.

    Emits (key, ts, value, prev_value, log_ret) for every observation
    with a predecessor; observations with non-positive value (log
    undefined) are dropped from the series BEFORE lagging, so a bad
    print doesn't silently produce two NULL returns around it.

    ``order_cols``: total-order tie-break columns appended after ts
    (pass a unique id when timestamps can collide — lag() under a
    non-total order is nondeterministic).
    """
    # rename BEFORE the window, not after: an alias between the window
    # and a downstream groupBy defeats Spark's partitioning-reuse check
    # (measured: the (key, bucket) aggregate re-shuffled all rows the
    # window had already clustered — one whole extra exchange of the
    # returns; guide §2.4)
    extra = [c for c in (order_cols or [])]
    pos = df.filter(F.col(value) > 0).select(
        F.col(key).alias("key"),
        F.col(ts).alias("ts"),
        F.col(value).alias("value"),
        *[F.col(c) for c in extra],
    )
    w = Window.partitionBy("key").orderBy(
        F.col("ts"), *[F.col(c) for c in extra]
    )
    return (
        pos.select(
            "key", "ts", "value", F.lag("value").over(w).alias("prev_value")
        )
        .filter(F.col("prev_value").isNotNull())
        .withColumn("log_ret", F.log(F.col("value") / F.col("prev_value")))
    )


def realized_vol(
    returns: DataFrame,
    tier: str = "1h",
    ts: str = "ts",
    ret: str = "log_ret",
) -> DataFrame:
    """Finest-tier realized-variance aggregate off a log_returns frame.

    Columns (all mergeable): n_ret, rv (sum of squared returns),
    r_sum (signed drift), r_min/r_max (extremes survive the cascade).
    """
    r = F.col(ret)
    return (
        returns.groupBy("key", bucket_col(ts, tier).alias("bucket_ts"))
        .agg(
            F.count(r).alias("n_ret"),
            F.sum(r * r).alias("rv"),
            F.sum(r).alias("r_sum"),
            F.min(r).alias("r_min"),
            F.max(r).alias("r_max"),
        )
    )


def realized_vol_cascade(tier_df: DataFrame, to_tier: str) -> DataFrame:
    """Merge a finer realized-vol tier into a coarser one — exact,
    because every column is a sum/min/max and tier boundaries nest."""
    return (
        tier_df.groupBy("key", bucket_col("bucket_ts", to_tier).alias("bucket_ts"))
        .agg(
            F.sum("n_ret").alias("n_ret"),
            F.sum("rv").alias("rv"),
            F.sum("r_sum").alias("r_sum"),
            F.min("r_min").alias("r_min"),
            F.max("r_max").alias("r_max"),
        )
    )


def with_vol(tier_df: DataFrame) -> DataFrame:
    """Attach the derived (non-mergeable) annualization-free vol
    estimate sqrt(RV) — compute at read time, never stored in tiers."""
    return tier_df.withColumn("rvol", F.sqrt(F.col("rv")))
