"""Superposed-epoch (event-study) analysis: the average value
trajectory around occurrences of a trigger event.

The composite / superposed-epoch method (Chree 1913; the "event
study" of empirical finance — both public formulations): align every
occurrence of a trigger at relative time 0, stack the surrounding
windows, and average per offset. Systematic pre/post structure
(run-up, shock, recovery) survives the stacking; everything else
averages out.

Spark-first shape: anchors EXPLODE their ±K offset lattice
(2K+1 rows per anchor — bounded fan-out, the same explode-then-
equi-join device as the IACT lag pairing, never a range join) and
equi-join the hourly observation bins on (key, bucket). One bin
shuffle + one hash join + one offset agg; counts and cent-sums stay
exact integers, the per-offset mean is one double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def event_study(
    df: DataFrame,
    trigger: str,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    event_col: str = "event_type",
    bucket_s: int = 3600,
    k: int = 6,
) -> DataFrame:
    """Average value per relative offset -k..+k (in ``bucket_s`` buckets)
    around every bucket in which ``trigger`` fired for the key.

    Returns (rel, n_anchors, n_obs, v_sum_cents, mean_u6): the
    number of distinct anchor buckets feeding the offset, observation
    count, exact cent sum and the floor-1e6 mean (in value units).
    Offsets (rel) with no observations anywhere are absent.
    """
    tau_us = int(bucket_s) * 1_000_000
    kk = int(k)
    cents = F.round(F.col(value) * 100).cast("long")
    obs = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), tau_us).alias("b"),
            cents.alias("c"),
        )
        .groupBy("key", "b")
        .agg(F.sum("c").alias("c"), F.count(F.lit(1)).alias("n"))
    )
    anchors = (
        df.filter(F.col(event_col) == trigger)
        .select(F.col(key).alias("key"), floordiv(epoch_us(ts), tau_us).alias("ba"))
        .distinct()
    )
    probes = anchors.select(
        "key",
        "ba",
        F.explode(F.sequence(F.lit(-kk), F.lit(kk))).alias("rel"),
    ).select("key", (F.col("ba") + F.col("rel")).alias("b"), "rel")
    joined = probes.join(obs, ["key", "b"])
    return (
        joined.groupBy("rel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            F.sum("n").cast("long").alias("n_obs"),
            F.sum("c").cast("long").alias("v_sum_cents"),
        )
        .select(
            F.col("rel").cast("int").alias("rel"),
            "n_anchors",
            "n_obs",
            "v_sum_cents",
            F.floor(
                F.col("v_sum_cents") / (F.col("n_obs") * 100.0) * 1e6
            ).cast("long").alias("mean_u6"),
        )
    )
