"""GARCH(1,1) variance filter per key — conditional volatility with
volatility clustering, the FILTERING companion of arch_test (which
only detects the clustering) and bns_jumps (which splits variance into
diffusion vs jumps).

Public recursion (Bollerslev 1986) with FIXED exact-binary parameters
alpha = 1/16, beta = 7/8 (persistence 15/16) on tick returns r_i:

    sigma2_1 = var0                     (unconditional sample variance)
    sigma2_i = omega + alpha * r_{i-1}^2 + beta * sigma2_{i-1}
    omega    = var0 * (1 - alpha - beta) = var0 / 16

so the filter's stationary mean is exactly var0. A fixed-parameter
filter is the production shape (parameters come from a separate,
infrequent calibration; the per-key filtering pass is the thing that
must scale), the same contract as kalman's fixed q/r.

Determinism contract (the holt/kalman/croston precedent): returns are
exact int64 cents diffs of the dedup'd tick stream; var0 is one fixed
double tree over the exact return moments (n*srr - sr^2 etc.); the
recursion `om + 0.0625 * rr + 0.875 * s` is evaluated in the same
order by the grouped Arrow UDF and the DuckDB recursive CTE, so the
final state agrees bit-for-bit before the 6dp round. The standardized
residual accumulator z2 += rr_i / s_i rides the same recursion (its
mean ~ 1 iff the filter is calibrated).

Plan shape: one scan -> (key, us) dedup aggregate -> ONE numbered key
repartition into the Arrow UDF; O(1) state per key, no join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

_ALPHA = 0.0625
_BETA = 0.875
_SCHEMA = (
    "key string, n_ret long, var0 double, s_last double, z2_mean double"
)


def garch_filter(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_returns: int = 20,
    init_var: float | None = None,
) -> DataFrame:
    """Per-key GARCH(1,1) filter state after the last return.

    ``init_var`` replaces the full-sample var0 estimate with an
    explicit calibration (cents^2) — the CAUSAL form a streaming
    deployment uses (the full-sample estimate looks ahead), and the
    form the streaming twin compares against bit-for-bit.

    Returns (key, n_ret, var0, s_last, z2_mean): the return count, the
    unconditional variance init (cents^2), the final conditional
    variance, and the mean squared standardized residual (~1 under
    calibration; >> 1 means the fixed parameters under-react). The
    cents^2 columns round 2dp, the O(1) ratio 6dp. Keys with fewer
    than ``min_returns`` returns or zero return variance drop.
    """
    mo = max(int(min_returns), 3)
    ticks = (
        df.select(
            F.col(key).alias("key"),
            epoch_us(ts).alias("us"),
            F.round(F.col(value) * 100).cast("long").alias("c"),
        )
        .groupBy("key", "us")
        .agg(F.max("c").alias("c"))
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["key", "n_ret", "var0", "s_last", "z2_mean"]
        if len(pdf) < mo + 1:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values("us", kind="stable")
        c = pdf["c"].to_numpy(dtype=np.int64)
        r = np.diff(c)
        n = r.size
        if init_var is not None:
            var0 = float(init_var)
        else:
            # exact int64 within the bns_jumps bound n * |c|max^2 < 2^63
            sr = int(r.sum())
            srr = int((r * r).sum())
            # var0 = (n*srr - sr*sr) / (n*(n-1)) — exact ints, one tree
            num = n * srr - sr * sr
            if num <= 0:
                return pd.DataFrame(columns=cols)
            var0 = float(num) / float(n * (n - 1))
        om = var0 * _ALPHA  # (1 - alpha - beta) == alpha == 1/16
        s = var0
        z2 = 0.0
        for i in range(n):
            rr = float(int(r[i]) * int(r[i]))
            z2 = z2 + rr / s
            if i < n - 1:
                s = om + _ALPHA * rr + _BETA * s
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "n_ret": [n],
                "var0": [var0],
                "s_last": [s],
                "z2_mean": [z2 / n],
            }
        )

    nparts = df.sparkSession.sparkContext.defaultParallelism
    out = (
        ticks.repartition(nparts, "key")
        .groupBy("key")
        .applyInPandas(fn, schema=_SCHEMA)
    )
    # var0/s_last are O(cents^2) ~ 1e8 where a 6dp quantum exceeds
    # double precision and the engines' round() implementations can
    # disagree on the same value (the kpss gamma0 lesson) — 2dp there,
    # 6dp for the O(1) calibration ratio
    return out.select(
        "key",
        "n_ret",
        F.round("var0", 2).alias("var0"),
        F.round("s_last", 2).alias("s_last"),
        F.round("z2_mean", 6).alias("z2_mean"),
    )
