"""Mergeable log₂-binned quantile histogram (the HDR/DDSketch idea,
integer-exact).

DDSketch (Masson et al., VLDB'19) and HdrHistogram answer quantiles
with relative-error-bounded, MERGEABLE state: a histogram over
logarithmic buckets.  A 100 TB rollup pipeline wants exactly that shape
— per-partition histograms combine associatively, so quantile state
rides the same partial/final aggregation lattice as the mean/variance
tiers (`operators/rollup.py`), unlike exact per-key sorts.

This implementation uses base-2 buckets on integer CENTI-units so every
step is exact integer arithmetic on both engines: bucket(v) =
``length(bin(v))`` (i.e. floor(log2 v) + 1 — Spark ``bin`` and DuckDB
``bin`` both print minimal binary digits), counts are plain longs, and
the quantile answer is the smallest bucket whose cumulative count
reaches the nearest rank ``ceil(q * n)``.  No floats anywhere — the
oracle matches bit-for-bit, while a float ``log2`` would flip buckets
at exact powers of two.

The per-key cumulative window runs over the per-key BUCKET frame (at
most ~40 rows per key for any int64 range), never over raw events —
that is the whole point of the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def loghist_quantiles(
    df: DataFrame,
    key: str = "user_id",
    value: str = "value",
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Per-key quantile estimates from a log₂ histogram over
    ``round(value * 100)`` centi-units (positive values only).

    Returns one row per key: ``n_obs``, ``n_buckets``, and for each
    requested quantile q the bucket index ``pXX_bucket`` plus its lower
    bound ``pXX_lo`` (= 2^(bucket-1) centi-units, a guaranteed
    ≤2× relative-error envelope around the true quantile).
    """
    v = F.round(F.col(value) * 100).cast("long")
    h = (
        df.select(F.col(key).alias("key"), v.alias("_v"))
        .where(F.col("_v") >= 1)
        .withColumn("_b", F.length(F.bin(F.col("_v"))).cast("int"))
        .groupBy("key", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    wk = Window.partitionBy("key")
    wcum = wk.orderBy("_b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cur = h.select(
        "key",
        "_b",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wk).alias("n_obs"),
        F.count(F.lit(1)).over(wk).alias("n_buckets"),
    )
    aggs = [
        F.max("n_obs").alias("n_obs"),
        F.max("n_buckets").cast("long").alias("n_buckets"),
    ]
    cols = ["key", "n_obs", "n_buckets"]
    for q in quantiles:
        tag = f"p{int(round(q * 100))}"
        # nearest rank ceil(q*n) in exact integer arithmetic: for q with
        # d decimal digits, ceil(q*n) = (num*n + den-1) div den
        sq = f"{q:.6f}".rstrip("0")
        den = 10 ** (len(sq) - 2)
        num = int(round(q * den))
        rank = F.expr(f"(({num} * n_obs) + {den - 1}) div {den}")
        bkt = F.min(F.when(F.col("_cum") >= rank, F.col("_b")))
        aggs.append(bkt.cast("int").alias(f"{tag}_bucket"))
        cols += [f"{tag}_bucket", f"shiftleft(1L, {tag}_bucket - 1) AS {tag}_lo"]
    return cur.groupBy("key").agg(*aggs).selectExpr(*cols)
