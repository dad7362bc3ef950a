"""Time-weighted aggregation of irregular series onto fixed buckets.

Two operators the fixed-interval rollup family (operators/rollup.py)
cannot express, both standard in production time-series stores:

 - :func:`time_weighted_avg` — the TimescaleDB ``time_weight('LOCF')``
   analog: the integral of the last-observation-carried-forward step
   function over each bucket, divided by the covered time.  A plain
   ``avg`` over-weights bursts of closely-spaced observations; the
   time-weighted mean is invariant to sampling cadence, which is the
   whole point of gap-aware rollup of irregular streams
   (ref:sacf.c:82-95 models the same irregular-spacing concern for
   correlation; SURVEY.md §1.3's null-model-is-absence).
 - :func:`counter_rate` — the PromQL ``rate()``/``increase()`` analog:
   per-bucket sum of positive deltas of a monotone counter, treating a
   value drop as a counter reset (the post-reset value is the increase
   since the reset).

Both are pure column algebra: one window shuffle per key to form
segments/deltas, then a hash aggregation onto buckets — no Python in
the hot path, whole-stage codegen applies.

Scale notes (100 TB):
 - segments that cross bucket boundaries are split by exploding a
   per-segment ``sequence`` of the buckets the segment spans; the
   explosion factor is segment span / bucket width, so a key that goes
   silent for a year over 1-minute buckets would fan one row into
   ~525k.  ``max_gap_sec`` clips every segment to a staleness horizon
   (observations older than it stop carrying), bounding the fan-out to
   ``max_gap_sec / bucket_secs`` rows per observation — set it to the
   same order as the bucket width for O(1) amplification.
 - all time arithmetic is integer epoch-microseconds (exact); floats
   appear only in the final weighted division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us as _epoch_us
from tits_spark.functions.exprs import floordiv

_US = 1_000_000


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_secs: int = 3600,
    max_gap_sec: float | None = None,
) -> DataFrame:
    """Per-(key, bucket) time-weighted mean of the LOCF step function.

    Each observation holds its value from its own timestamp until the
    next observation of the same key (exclusive); the last observation
    carries nothing (the series is unknown past its end).  With
    ``max_gap_sec``, a segment is additionally clipped to that horizon:
    a key that goes silent contributes nothing after the horizon — and
    the bucket fan-out per row is bounded by ``max_gap_sec /
    bucket_secs`` (see module scale notes).

    Returns ``(key, bucket_ts, twa, covered_sec)`` where ``twa`` =
    integral(value dt) / covered time within the bucket and
    ``covered_sec`` is the covered time in seconds.  Buckets a key's
    step function never touches simply don't appear (null model is
    absence).  Ties on (ts) are ordered by value for determinism;
    a zero-length segment contributes nothing.
    """
    bucket_us = int(bucket_secs) * _US
    w = Window.partitionBy("key").orderBy(F.col("s_us").asc(), F.col("v").asc())
    seg = (
        df.select(
            F.col(key_col).alias("key"),
            _epoch_us(ts_col).alias("s_us"),
            F.col(value_col).cast("double").alias("v"),
        )
        .withColumn("e_us", F.lead("s_us").over(w))
        # the last observation carries nothing — drop it BEFORE the
        # clip (least() skips NULLs, so clipping first would give the
        # open segment a max_gap-length tail)
        .filter(F.col("e_us").isNotNull())
    )
    # clip BEFORE the zero-length filter so max_gap_sec=0 drops every
    # segment instead of leaking unclipped ones — mirrors the streaming
    # twin's order of operations
    if max_gap_sec is not None:
        seg = seg.withColumn(
            "e_us", F.least("e_us", F.col("s_us") + F.lit(int(max_gap_sec * _US)))
        )
    seg = seg.filter(F.col("e_us") > F.col("s_us"))
    # buckets spanned: floor(s/bu) .. floor((e-1)/bu) (end exclusive).
    # floordiv, not Spark DIV (truncates toward zero — wrong bucket for
    # pre-1970 timestamps) and not floor(x / y) (double division could
    # round a long epoch-µs across a bucket boundary).
    b0 = floordiv(F.col("s_us"), bucket_us)
    b1 = floordiv(F.col("e_us") - 1, bucket_us)
    burst = seg.select(
        "key", "s_us", "e_us", "v", F.explode(F.sequence(b0, b1)).alias("b")
    )
    lo = F.greatest(F.col("s_us"), F.col("b") * bucket_us)
    hi = F.least(F.col("e_us"), (F.col("b") + 1) * bucket_us)
    overlap = (hi - lo).alias("overlap_us")
    out = (
        burst.select("key", "b", "v", overlap)
        .groupBy("key", "b")
        .agg(
            (F.sum(F.col("v") * F.col("overlap_us")) / F.sum("overlap_us")).alias("twa"),
            (F.sum("overlap_us") / F.lit(float(_US))).alias("covered_sec"),
        )
        .select(
            F.col("key").alias(key_col),
            F.timestamp_seconds(F.col("b") * bucket_secs).alias("bucket_ts"),
            "twa",
            "covered_sec",
        )
    )
    return out


def counter_rate(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Per-(key, bucket) increase and rate of a resettable counter.

    PromQL ``increase()`` semantics on irregular samples: per key in
    time order, each sample contributes ``value - prev_value`` when the
    counter advanced, or ``value`` when it dropped (a reset — the
    counter restarted from zero and climbed to ``value``).  The first
    sample of a key contributes nothing (no baseline).  Contributions
    land in the bucket of the *current* sample's timestamp.

    Returns ``(key, bucket_ts, increase, rate_per_sec, n_samples,
    n_resets)``; ``rate_per_sec = increase / bucket_secs``.  Ties on
    ts are ordered by value for determinism.
    """
    bucket_us = int(bucket_secs) * _US
    w = Window.partitionBy("key").orderBy(F.col("s_us").asc(), F.col("v").asc())
    base = df.select(
        F.col(key_col).alias("key"),
        _epoch_us(ts_col).alias("s_us"),
        F.col(value_col).cast("double").alias("v"),
    ).withColumn("prev", F.lag("v").over(w))
    delta = F.col("v") - F.col("prev")
    adj = F.when(F.col("prev").isNull(), None).when(delta < 0, F.col("v")).otherwise(delta)
    return (
        base.select(
            "key",
            floordiv(F.col("s_us"), bucket_us).alias("b"),
            adj.alias("adj"),
            F.when(delta < 0, 1).otherwise(0).alias("is_reset"),
        )
        .groupBy("key", "b")
        .agg(
            F.coalesce(F.sum("adj"), F.lit(0.0)).alias("increase"),
            (F.coalesce(F.sum("adj"), F.lit(0.0)) / F.lit(float(bucket_secs))).alias(
                "rate_per_sec"
            ),
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("is_reset").cast("long").alias("n_resets"),
        )
        .select(
            F.col("key").alias(key_col),
            F.timestamp_seconds(F.col("b") * bucket_secs).alias("bucket_ts"),
            "increase",
            "rate_per_sec",
            "n_samples",
            "n_resets",
        )
    )
