"""Robust per-key trend statistics: Mann-Kendall test + Theil-Sen slope.

The monotone-trend questions a rollup pipeline answers ("is this
conversation's turn gap drifting up?", "is daily volume trending?")
need rank/median statistics, not least squares — one outlier turn
shouldn't flip the answer. Standard references: Mann (1945), Kendall
(1975); Sen (1968); tie-corrected variance per Gilbert (1987) eq. 16.5.

Scale shape: both statistics are quadratic in SERIES LENGTH, so the
intended input is a rollup tier (operators/rollup.py) — e.g. the 1d
tier's v_sum per key — where n is a few thousand at most; the pair
work runs vectorized inside a grouped Arrow UDF in O(n^2 / block)
passes, parallel across keys (the sacf/matrix-profile story). The
DuckDB oracle materializes the i<j pair set relationally — affordable
at gate scale, and bit-exact because every per-pair term is a single
subtraction/division and the aggregates are exact-integer (S, tie
counts) or interpolation-pinned (median via lower + 0.5*(upper-lower),
the quantile_cont formula).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _median_pinned(a: np.ndarray) -> float:
    """Median via sort + ``lower + frac*(upper-lower)`` — the exact
    expression quantile_cont evaluates, so engines agree bit-for-bit
    (numpy's (a+b)/2 differs by an ulp on some inputs)."""
    a = np.sort(a)
    n = a.size
    if n % 2:
        return float(a[n // 2])
    lo, hi = a[n // 2 - 1], a[n // 2]
    return float(lo + 0.5 * (hi - lo))


def mk_numpy(t: np.ndarray, v: np.ndarray) -> tuple[int, float, float, float]:
    """(S, var_s, z, sen_slope) for one series sorted by t.

    S counts concordant minus discordant value pairs in time order;
    var_s applies the tie correction over equal-VALUE groups; z is the
    continuity-corrected normal score; sen_slope the pinned median of
    pairwise slopes (pairs with distinct timestamps).
    """
    n = v.size
    s = 0
    slopes = []
    for i in range(n - 1):
        dv = v[i + 1 :] - v[i]
        s += int((dv > 0).sum()) - int((dv < 0).sum())
        dt = t[i + 1 :] - t[i]
        nz = dt != 0
        if nz.any():
            slopes.append(dv[nz] / dt[nz])
    _, counts = np.unique(v, return_counts=True)
    ties = counts[counts > 1].astype(np.int64)
    var_s = (
        n * (n - 1) * (2 * n + 5) - int((ties * (ties - 1) * (2 * ties + 5)).sum())
    ) / 18.0
    if s > 0:
        z = (s - 1) / np.sqrt(var_s) if var_s > 0 else 0.0
    elif s < 0:
        z = (s + 1) / np.sqrt(var_s) if var_s > 0 else 0.0
    else:
        z = 0.0
    slope = (
        _median_pinned(np.concatenate(slopes)) if slopes else float("nan")
    )
    return s, var_s, float(z), slope


def trend_stats(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    min_points: int = 4,
    decimals: int = 6,
) -> DataFrame:
    """(key, n, s_stat, var_s, z, trend, sen_slope) per key.

    ``trend`` labels z at the 5% two-sided level ('inc'/'dec'/'none');
    ``sen_slope`` is per second of the ts column. Series shorter than
    ``min_points`` are dropped.
    """
    from tits_spark.functions.exprs import ts_seconds

    kt = df.schema[key].dataType.simpleString()
    prep = df.where(F.col(value).isNotNull()).select(
        F.col(key).alias("key"), ts_seconds(ts).alias("_t"),
        F.col(value).alias("_v"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_t", "_v"], kind="stable")
        n = len(pdf)
        if n < min_points:
            return pd.DataFrame(
                columns=["key", "n", "s_stat", "var_s", "z", "trend", "sen_slope"]
            )
        t = pdf["_t"].to_numpy(np.float64)
        v = pdf["_v"].to_numpy(np.float64)
        s, var_s, z, slope = mk_numpy(t, v)
        zq = round(z, decimals)
        label = "inc" if zq > 1.96 else ("dec" if zq < -1.96 else "none")
        return pd.DataFrame({
            "key": [pdf["key"].iloc[0]],
            "n": [n],
            "s_stat": [s],
            "var_s": [round(var_s, 6)],
            "z": [zq],
            "trend": [label],
            "sen_slope": [round(slope, decimals)],
        })

    out_schema = (
        f"key {kt}, n long, s_stat long, var_s double, z double, "
        "trend string, sen_slope double"
    )
    # numbered repartition: CPU-bound grouped stage, exempt from AQE
    # byte-based coalescing (see operators/matrix_profile.py)
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        prep.repartition(nparts, "key")
        .groupBy("key")
        .applyInPandas(fn, schema=out_schema)
    )
