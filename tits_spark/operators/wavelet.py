"""Haar wavelet energy decomposition per key.

Multiresolution screening for a telemetry pipeline: which time scale
carries a series' variance? The Haar transform answers with L detail
energies (scale 2^1 .. 2^L samples) plus the residual approximation —
the classic cheap preprocessing step before similarity search (Chan &
Fu, ICDE 1999 use exactly this transform for time-series indexing).

Spark-first formulation: one numbered-repartition grouped Arrow UDF
(the AQE coalescing guard, BENCH/PLANS.md) computes the full pyramid
vectorized per key — the transform is O(window) work on a fixed
2^L-sample window, so per-task cost is bounded and uniform.

Exactness device (hash-exact DuckDB oracle with ZERO quantization):
inputs become integer cents, and every Haar coefficient is then a
DYADIC rational (integer / 2^level) whose square and per-level sum
stay far inside double's 53-bit mantissa for |cents| <= ~3e4 and
L <= 6 — every add/halve/square is EXACT in IEEE double, so any
summation order gives the same bits and the oracle (an unrolled
pairing cascade in SQL) matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def haar_energy(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    levels: int = 5,
) -> DataFrame:
    """(key, level, n_coef, energy) — Haar detail energies per key.

    Each key's first ``2**levels`` samples in (ts, value) order feed
    the pyramid; keys with fewer samples are dropped (fixed window =
    fixed task cost; crop upstream differently if you need ragged
    windows). ``level`` 1..levels are detail energies (sum of squared
    detail coefficients, cent^2 units), level 0 is the squared final
    approximation coefficient.
    """
    win = 1 << levels
    prep = df.where(F.col(value).isNotNull()).select(
        F.col(key).alias("key"), F.col(ts).alias("_ts"), F.col(value).alias("_v")
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < win:
            return pd.DataFrame(
                {"key": pd.Series(dtype=pdf["key"].dtype),
                 "level": pd.Series(dtype=np.int32),
                 "n_coef": pd.Series(dtype=np.int64),
                 "energy": pd.Series(dtype=np.float64)}
            )
        pdf = pdf.sort_values(["_ts", "_v"], kind="stable").iloc[:win]
        # integer cents: value*100 sits within an ulp of an integer for
        # 2dp inputs, so rint == both engines' round-half-* here
        a = np.rint(pdf["_v"].to_numpy(np.float64) * 100.0)
        lv, nc, en = [], [], []
        for level in range(1, levels + 1):
            d = (a[0::2] - a[1::2]) / 2.0
            a = (a[0::2] + a[1::2]) / 2.0
            lv.append(level)
            nc.append(d.size)
            en.append(float(np.dot(d, d)))
        lv.append(0)
        nc.append(1)
        en.append(float(a[0] * a[0]))
        return pd.DataFrame({
            "key": pdf["key"].iloc[0],
            "level": np.asarray(lv, np.int32),
            "n_coef": np.asarray(nc, np.int64),
            "energy": np.asarray(en, np.float64),
        })

    kt = df.schema[key].dataType.simpleString()
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        prep.repartition(nparts, "key")
        .groupBy("key")
        .applyInPandas(fn, schema=f"key {kt}, level int, n_coef long, energy double")
    )
