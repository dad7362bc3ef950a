"""Croston's method for intermittent demand per key — forecasting a
series that is ZERO most buckets (the sparse-series complement of
holt/holt_winters, which assume a dense level).

Public formulas (Croston 1972; Syntetos-Boylan SBA correction 2005):
bucket the series hourly, keep only buckets with positive demand
z_1..z_m at bucket indices b_1..b_m, and run two coupled SES
recursions — one over demand SIZES, one over inter-demand INTERVALS
p_j = b_j - b_{j-1}:

    Z_j = Z_{j-1} + alpha * (z_j - Z_{j-1})      (init Z_1 = z_1)
    P_j = P_{j-1} + alpha * (p_j - P_{j-1})      (init P_2 = p_2)

Forecast demand per bucket = Z/P; the SBA estimator
(1 - alpha/2) * Z/P removes Croston's inversion bias. alpha = 1/8.

This is a genuinely sequential recursion (the holt precedent,
operators/smoothing.py): one grouped Arrow UDF keyed by series, O(n)
per key with O(1) state, numbered repartition so AQE cannot serialize
the CPU-bound stage. Determinism contract for the DuckDB
recursive-CTE oracle: demand buckets are ordered by bucket index
(unique by construction), inits and update trees are EXACTLY
`s + 0.125 * (x - s)` on float64, so both engines round identically
at every step and the outputs agree bit-for-bit before the 6dp round.
Demand sums per bucket are exact int64 cents BEFORE entering the
recursion (no float bucket aggregation).

Plan shape (the 100 TB argument): one scan -> (key, bucket) hash
aggregate collapses the raw stream to <= m demand rows per key (the
sparse skeleton — at 10^12 turns the aggregate's map-side partials do
the heavy reduction) -> one key exchange for the UDF. No join, no
window over the raw stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv

_ALPHA = 0.125
_SCHEMA = (
    "key string, n_dem long, z_hat double, p_hat double, sba double"
)


def croston_sba(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    bucket_secs: int = 3600,
    min_demands: int = 3,
) -> DataFrame:
    """Per-key Croston/SBA state after the last demand bucket.

    Returns (key, n_dem, z_hat, p_hat, sba): the demand-bucket count,
    the smoothed demand size (cents) and inter-demand interval
    (buckets), and the SBA per-bucket demand forecast
    0.9375 * Z/P (all round 6). Demand = sum of positive cents in the
    bucket; keys with fewer than ``min_demands`` demand buckets drop.
    """
    bus = int(bucket_secs) * 1_000_000
    mo = max(int(min_demands), 2)

    dem = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), bus).alias("b"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .filter(F.col("c") > 0)
        .groupBy("key", "b")
        .agg(F.sum("c").alias("d"))
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < mo:
            return pd.DataFrame(
                columns=["key", "n_dem", "z_hat", "p_hat", "sba"]
            )
        pdf = pdf.sort_values("b", kind="stable")
        b = pdf["b"].to_numpy(dtype=np.int64)
        z = pdf["d"].to_numpy(dtype=np.float64)
        zz = z[0]
        pp = 0.0
        for j in range(1, z.size):
            zz = zz + _ALPHA * (z[j] - zz)
            pj = float(b[j] - b[j - 1])
            pp = pj if j == 1 else pp + _ALPHA * (pj - pp)
        sba = 0.9375 * (zz / pp)
        # rounding happens OUTSIDE the UDF with F.round (HALF_UP, the
        # same tie rule as DuckDB's round) — Python round() is
        # half-even and would diverge exactly on representable halves
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "n_dem": [int(z.size)],
                "z_hat": [zz],
                "p_hat": [pp],
                "sba": [sba],
            }
        )

    nparts = df.sparkSession.sparkContext.defaultParallelism
    out = (
        dem.repartition(nparts, "key")
        .groupBy("key")
        .applyInPandas(fn, schema=_SCHEMA)
    )
    return out.select(
        "key",
        "n_dem",
        F.round("z_hat", 6).alias("z_hat"),
        F.round("p_hat", 6).alias("p_hat"),
        F.round("sba", 6).alias("sba"),
    )
