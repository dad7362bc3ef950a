"""M4 width-based downsampling (Jugel et al., VLDB 2014).

The pixel-exact companion to LTTB (operators/lttb.py): split each
series into fixed time-width buckets and keep the four extreme points
per bucket — first, last, min-value, max-value — which is exactly the
set a line rasterizer needs to draw the bucket's pixel column with no
visible error. Unlike LTTB the selection has no sequential dependency,
so it is ONE partial-aggregable groupBy (map-side combine, single
shuffle keyed by (series, bucket)) and scales to any series length.

Ties are resolved lexicographically so the result is deterministic
under any partitioning: first/last by struct(ts, value) min/max,
min/max-value by struct(value, ts) min/max. A DuckDB oracle reproduces
the same choices with conditional re-aggregation against the bucket
extremes.

Output is the aggregate form — one row per (key, bucket) carrying all
four points — which downstream plotting can explode; keeping it one
row preserves the single-aggregation plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def m4_downsample(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    width_sec: int = 3600,
) -> DataFrame:
    """Per (key, width_sec bucket): the M4 point set as one row.

    Columns: key, bucket_ts, n_obs, ts_first, v_first, ts_last, v_last,
    v_min, ts_vmin, v_max, ts_vmax.
    """
    if width_sec <= 0:
        raise ValueError("m4: width_sec must be positive")
    width_us = width_sec * 1_000_000
    bkt = floordiv(epoch_us(ts), width_us)
    g = (
        df.where(F.col(value).isNotNull() & F.col(ts).isNotNull())
        .groupBy(F.col(key).alias("key"), bkt.alias("bkt"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.min(F.struct(F.col(ts).alias("t"), F.col(value).alias("v"))).alias("s1"),
            F.max(F.struct(F.col(ts).alias("t"), F.col(value).alias("v"))).alias("s2"),
            F.min(F.struct(F.col(value).alias("v"), F.col(ts).alias("t"))).alias("s3"),
            F.max(F.struct(F.col(value).alias("v"), F.col(ts).alias("t"))).alias("s4"),
        )
    )
    return g.select(
        "key",
        F.timestamp_micros(F.col("bkt") * width_us).alias("bucket_ts"),
        "n_obs",
        F.col("s1.t").alias("ts_first"),
        F.col("s1.v").alias("v_first"),
        F.col("s2.t").alias("ts_last"),
        F.col("s2.v").alias("v_last"),
        F.col("s3.v").alias("v_min"),
        F.col("s3.t").alias("ts_vmin"),
        F.col("s4.v").alias("v_max"),
        F.col("s4.t").alias("ts_vmax"),
    )
