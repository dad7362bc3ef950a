"""Hurst exponent by rescaled-range (R/S) analysis — long-range
dependence per series (Hurst 1951; Mandelbrot & Wallis 1969).

H ~ 0.5 for memoryless series, > 0.5 persistent (trends persist),
< 0.5 anti-persistent (mean-reverting) — the classic
self-similarity summary for irregular event-value streams.

Fully declarative: for each window size s, complete segments of s
ordered points get a running cumulative deviation (one ordered window
frame — prefix sums evaluate left-to-right identically in any
engine), R = max - min of it, S = population std; R/S averages over
segments, and H is the closed-form least-squares slope of
ln(R/S) vs ln(s). One shuffle per size on the series key, partial
aggregation everywhere — no Python, no iteration. The whole estimate
is a few aggregates over each key's points, so it runs equally well
on raw events or on a rollup tier at 10^12-turn scale.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hurst_rs(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    sizes: Sequence[int] = (8, 16, 32, 64),
    decimals: int = 6,
) -> DataFrame:
    """(key, n_sizes, hurst): R/S Hurst estimate per key.

    Sizes with no complete non-constant segment contribute no point;
    keys with fewer than two usable sizes are dropped (a slope needs
    two points). R/S per size is the mean over complete segments.
    """
    if len(sizes) < 2 or sorted(set(sizes)) != sorted(sizes):
        raise ValueError("hurst_rs: need >= 2 distinct ascending sizes")
    wk = Window.partitionBy(key)
    base = (
        df.where(F.col(value).isNotNull())
        .withColumn(
            "_i", F.row_number().over(wk.orderBy(ts, value)) - 1
        )
        .withColumn("_n", F.count(F.lit(1)).over(wk))
    )
    per_size = []
    for s in sizes:
        d = (
            base.where(F.col("_i") < F.col("_n") - F.col("_n") % s)
            .withColumn("_seg", F.floor(F.col("_i") / s))
        )
        wseg = Window.partitionBy(key, "_seg")
        word = wseg.orderBy("_i").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        d = d.withColumn("_mu", F.avg(value).over(wseg)).withColumn(
            "_z", F.sum(F.col(value) - F.col("_mu")).over(word)
        )
        seg = (
            d.groupBy(key, "_seg")
            .agg(
                (F.max("_z") - F.min("_z")).alias("_r"),
                F.stddev_pop(value).alias("_s0"),
            )
            .where(F.col("_s0") > 0)
        )
        per_size.append(
            seg.groupBy(key).agg(
                F.avg(F.col("_r") / F.col("_s0")).alias("rs")
            ).select(key, F.lit(float(math.log(s))).alias("x"),
                     F.log("rs").alias("y"))
        )
    pts = per_size[0]
    for p in per_size[1:]:
        pts = pts.unionByName(p)
    agg = pts.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_sizes"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    k = F.col("n_sizes")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / k) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / k
    )
    return agg.where(k >= 2).select(
        key, "n_sizes", F.round(slope, decimals).alias("hurst")
    )


def hurst_sql(table: str, sizes: Sequence[int] = (8, 16, 32, 64)) -> str:
    """DuckDB twin generated from the same size list (ln(s) embedded
    via repr so both engines use the identical literal)."""
    unions = []
    for s in sizes:
        x = repr(float(math.log(s)))
        unions.append(f"""
  SELECT key, {x} AS x, ln(rs) AS y FROM (
    SELECT key, avg(r / s0) AS rs FROM (
      SELECT key, seg, max(z) - min(z) AS r, stddev_pop(v) AS s0 FROM (
        SELECT key, i // {s} AS seg, v,
               sum(v - mu) OVER (PARTITION BY key, i // {s} ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z
        FROM (
          SELECT key, i, v,
                 avg(v) OVER (PARTITION BY key, i // {s}) AS mu
          FROM pts WHERE i < n - n % {s}
        )
      ) GROUP BY 1, 2
    ) WHERE s0 > 0 GROUP BY 1
  )""")
    u = "\n  UNION ALL".join(unions)
    return f"""
WITH pts AS (
  SELECT user_id AS key, value AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, value) - 1 AS i,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM {table} WHERE value IS NOT NULL
),
xy AS ({u}
),
agg AS (
  SELECT key, count(*) AS n_sizes, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy GROUP BY 1
)
SELECT key, CAST(n_sizes AS BIGINT) AS n_sizes,
       round((sxy - sx * sy / n_sizes) / (sxx - sx * sx / n_sizes), 6)
         AS hurst
FROM agg WHERE n_sizes >= 2
"""
