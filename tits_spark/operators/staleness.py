"""Freshness/staleness SLA accounting per key.

For a LOCF consumer, the served value's AGE at time t is t minus the
last observation time; it exceeds the SLA threshold T exactly when an
inter-observation gap runs longer than T, and the excess time is
gap - T for every such gap. One pass over the lag-gaps therefore
yields the exact time-in-violation — the operational complement of
the gap listing (operators/gapfill.py: ref gap semantics of
/root/reference's alignment tools): not "where are the holes" but
"how much of the timeline was served stale".

Everything upstream is exact int64 microseconds: per-gap excesses sum
exactly, so partitioning cannot move the inputs. The final ppm share
is ONE double division over those exact int64 sums, then floor —
double (not BIGINT) deliberately, because excess_us * 1_000_000 would
overflow int64 at decade spans; identical on both engines while the
operands stay below 2^53.

Plan: one window shuffle per key (lag), one hash agg. At 100 TB this
is the same single-exchange shape as first_diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us


def staleness_report(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    sla_s: int = 43200,
) -> DataFrame:
    """Per-key staleness vs an SLA of ``sla_s`` seconds.

    Returns (key, n_obs, span_us, n_violations, stale_us, stale_ppm):
    gaps longer than the SLA count as violations contributing
    gap - sla of stale time; stale_ppm = stale_us * 1e6 div span_us
    (exact integer floor). Keys with fewer than 2 observations drop
    out (no gaps, no span)."""
    sla_us = int(sla_s) * 1_000_000
    w = Window.partitionBy("key").orderBy("u")
    gaps = (
        df.select(F.col(key).alias("key"), epoch_us(ts).alias("u"))
        .withColumn("g", F.col("u") - F.lag("u").over(w))
        .filter(F.col("g").isNotNull())
    )
    excess = F.when(F.col("g") > sla_us, F.col("g") - sla_us).otherwise(F.lit(0))
    return (
        gaps.groupBy("key")
        .agg(
            (F.count(F.lit(1)) + 1).cast("long").alias("n_obs"),
            F.sum("g").cast("long").alias("span_us"),
            F.sum((F.col("g") > sla_us).cast("long")).cast("long").alias("n_violations"),
            F.sum(excess).cast("long").alias("stale_us"),
        )
        .withColumn(
            # exact-int inputs (< 2^53) -> identical double on both
            # engines; floor-1e6 ppm (the BIGINT product stale_us*1e6
            # would overflow at decade spans, the double cannot)
            "stale_ppm",
            F.floor(
                F.col("stale_us").cast("double") / F.col("span_us") * 1e6
            ).cast("long"),
        )
    )
