"""Burst detection: contiguous runs of anomalously hot time buckets.

The set-cover version of burst finding (the integer-exact cousin of
Kleinberg's two-state automaton, KDD'02 — states replaced by a rate
threshold so the whole operator stays declarative): an hourly bucket
is HOT when its event count exceeds ``mult`` times the key's mean
bucket rate (and an absolute floor); maximal runs of CONSECUTIVE hot
buckets merge into one burst interval with its total and peak.

All decisions are integer comparisons — the hot test
``n * n_bins > mult * total`` multiplies through by the denominator
instead of comparing rates in floats, so there is no rounding boundary
anywhere and the oracle matches exactly.

Plan: one shuffle for the hourly counts, one window for the per-key
totals, one more ordered window for the gaps-and-islands grouping
(run id = b - dense position), then a hash agg per island — the
classic sessionize shape, everything co-partitioned on key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def burst_intervals(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    bucket_s: int = 3600,
    mult: int = 3,
    min_count: int = 3,
) -> DataFrame:
    """Per-key burst intervals over ``bucket_s`` buckets. A bucket is
    hot when count >= min_count AND count * n_bins > mult * total
    (rate > mult x the key's mean over its OBSERVED buckets — empty
    buckets don't dilute the baseline). Returns (key, burst_start,
    burst_end, n_buckets, n_events, peak) with start/end the first and
    last hot bucket timestamps (inclusive)."""
    tau_us = int(bucket_s) * 1_000_000
    bins = (
        df.select(F.col(key).alias("key"), floordiv(epoch_us(ts), tau_us).alias("b"))
        .groupBy("key", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wk = Window.partitionBy("key")
    hot = (
        bins.withColumn("total", F.sum("n").over(wk))
        .withColumn("n_bins", F.count(F.lit(1)).over(wk))
        .filter(
            (F.col("n") >= int(min_count))
            & (F.col("n") * F.col("n_bins") > int(mult) * F.col("total"))
        )
    )
    wo = Window.partitionBy("key").orderBy("b")
    runs = hot.withColumn("grp", F.col("b") - F.row_number().over(wo))
    return (
        runs.groupBy("key", "grp")
        .agg(
            F.min("b").alias("b0"),
            F.max("b").alias("b1"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("n_events"),
            F.max("n").cast("long").alias("peak"),
        )
        .select(
            "key",
            F.timestamp_micros(F.col("b0") * tau_us).alias("burst_start"),
            F.timestamp_micros(F.col("b1") * tau_us).alias("burst_end"),
            "n_buckets", "n_events", "peak",
        )
    )
