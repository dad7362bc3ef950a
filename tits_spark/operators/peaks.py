"""Peak detection with topographic prominence per key — WHICH spikes
matter, not just where local maxima sit.

Prominence (the scipy.signal.find_peaks definition, public): for a
strict interior local maximum, walk left and right to the nearest
STRICTLY higher sample (or the series end); the base on each side is
the minimum sample strictly between; prominence = peak - max(left
base, right base). A 10-unit wiggle on a plateau and a 10-unit spike
from a deep valley have the same local-max test but wildly different
prominence — prominence is what an alerting threshold should use.
The structural partner of bursts (hot intervals) and record_highs
(running maxima): this ranks isolated spikes by how far they stand
out of their surroundings.

Exactness: cents-quantized values with the house dup-timestamp rule
(max cents per (key, us)); peaks, bases and prominences are ALL exact
int64 (data values and differences only — no float anywhere), and the
top-k rank orders by (prominence DESC, us ASC), an integer sort that
cannot flip cross-engine.

Plan shape (the 100 TB argument): one scan -> (key, us) dedup hash
aggregate -> ONE key exchange into a grouped Arrow UDF (numbered
repartition, AQE-guard precedent) that runs the O(n) monotonic-stack
sweep per key with O(peak-count) extra memory, emitting <= k rows per
key. The O(n^2) nearest-higher/base joins exist only in the DuckDB
oracle (pair_robust precedent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us

_SCHEMA = "key string, us long, c long, prom long, rk long"


def _prev_greater(c: np.ndarray) -> np.ndarray:
    """Index of the nearest strictly-greater element to the left
    (-1 when none) — one monotonic-stack pass."""
    n = c.size
    out = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    for i in range(n):
        ci = c[i]
        while stack and c[stack[-1]] <= ci:
            stack.pop()
        if stack:
            out[i] = stack[-1]
        stack.append(i)
    return out


def peak_prominence(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    top_k: int = 10,
) -> DataFrame:
    """Top-k most prominent strict interior peaks per key.

    Returns (key, us, c, prom, rk): the peak's microsecond timestamp,
    its cents value, its exact integer prominence, and its per-key
    rank by (prominence DESC, us ASC). Plateaus are not peaks (the
    strict test); series shorter than 3 samples emit nothing.
    """
    kk = int(top_k)
    if kk < 1:
        raise ValueError("peak_prominence needs top_k >= 1")
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
        cols = ["key", "us", "c", "prom", "rk"]
        if len(pdf) < 3:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values("us", kind="stable")
        us = pdf["us"].to_numpy(dtype=np.int64)
        c = pdf["c"].to_numpy(dtype=np.int64)
        n = c.size
        is_pk = np.zeros(n, dtype=bool)
        is_pk[1:-1] = (c[1:-1] > c[:-2]) & (c[1:-1] > c[2:])
        if not is_pk.any():
            return pd.DataFrame(columns=cols)
        lg = _prev_greater(c)
        rg = _prev_greater(c[::-1])  # in reversed coords
        recs = []
        for i in np.flatnonzero(is_pk):
            lo = lg[i]  # -1 -> series start
            left_min = int(c[lo + 1: i].min())
            rj = rg[n - 1 - i]  # nearest strictly-greater to the RIGHT
            hi = n - 1 - rj if rj >= 0 else n  # exclusive-right bound
            right_min = int(c[i + 1: hi].min())
            prom = int(c[i]) - max(left_min, right_min)
            recs.append((int(us[i]), int(c[i]), prom))
        recs.sort(key=lambda r: (-r[2], r[0]))
        top = recs[:kk]
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]] * len(top),
                "us": [r[0] for r in top],
                "c": [r[1] for r in top],
                "prom": [r[2] for r in top],
                "rk": list(range(1, len(top) + 1)),
            }
        )

    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        ticks.repartition(nparts, "key")
        .groupBy("key")
        .applyInPandas(fn, schema=_SCHEMA)
    )
