"""ACD(1,1) conditional-duration filter per key — does the event
ARRIVAL RATE itself cluster?

Engle & Russell (Econometrica 1998, public formula): the point-process
analog of GARCH — GARCH models clustering of return MAGNITUDES, ACD
models clustering of inter-event DURATIONS x_i (whole seconds here):

    psi_1 = xbar                        (mean duration init)
    psi_{i+1} = omega + alpha * x_i + beta * psi_{i-1..}
    omega = xbar * (1 - alpha - beta) = xbar / 16

with the same exact-binary parameters as the GARCH filter (alpha=1/16,
beta=7/8) so the stationary mean is exactly xbar. The diagnostic
surface eps_mean = mean(x_i / psi_i) is ~1 under calibration; the
companion of burstiness (a static index) and extremal_index (tail
clustering): ACD gives the RUNNING intensity state a scheduler or
rate-limiter would actually consume.

Determinism contract (the garch/holt precedent): durations are exact
int64 whole seconds of the dedup'd tick stream (floor-divided gaps —
identical cross-engine); xbar = sx / n is one division of exact ints;
the recursion `om + 0.0625 * x + 0.875 * psi` is evaluated in the
same order by the Arrow UDF and the DuckDB recursive CTE, so state is
bit-identical before the rounds (durations are O(1..1e5) seconds, so
6dp is within double precision everywhere — no 2dp downgrade needed).

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
    "key string, n_gaps long, xbar double, psi_last double, "
    "eps_mean double"
)


def acd_filter(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_gaps: int = 20,
) -> DataFrame:
    """Per-key ACD(1,1) filter state after the last duration.

    Returns (key, n_gaps, xbar, psi_last, eps_mean): the duration
    count, the mean duration (seconds), the final conditional expected
    duration, and the mean standardized duration (~1 when calibrated).
    All round 6. Keys with fewer than ``min_gaps`` gaps or all-zero
    gaps drop.
    """
    mo = max(int(min_gaps), 3)
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
        cols = ["key", "n_gaps", "xbar", "psi_last", "eps_mean"]
        if len(pdf) < mo + 1:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values("us", kind="stable")
        us = pdf["us"].to_numpy(dtype=np.int64)
        x = np.diff(us) // 1_000_000  # whole seconds, exact
        n = x.size
        sx = int(x.sum())
        if sx <= 0:
            return pd.DataFrame(columns=cols)
        xbar = float(sx) / float(n)
        om = xbar * _ALPHA
        psi = xbar
        eps = 0.0
        for i in range(n):
            xi = float(int(x[i]))
            eps = eps + xi / psi
            if i < n - 1:
                psi = om + _ALPHA * xi + _BETA * psi
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "n_gaps": [n],
                "xbar": [xbar],
                "psi_last": [psi],
                "eps_mean": [eps / n],
            }
        )

    nparts = df.sparkSession.sparkContext.defaultParallelism
    out = (
        ticks.repartition(nparts, "key")
        .groupBy("key")
        .applyInPandas(fn, schema=_SCHEMA)
    )
    return out.select(
        "key",
        "n_gaps",
        F.round("xbar", 6).alias("xbar"),
        F.round("psi_last", 6).alias("psi_last"),
        F.round("eps_mean", 6).alias("eps_mean"),
    )
