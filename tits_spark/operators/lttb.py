"""Largest-Triangle-Three-Buckets (LTTB) downsampling per series.

Steinarsson's LTTB (2013, the standard visualization downsampler —
TimescaleDB toolkit's `lttb`) reduces each series to ``n_out`` points
while preserving visual shape: endpoints are kept, the interior is
split into ``n_out - 2`` equal-count buckets, and each bucket keeps the
point forming the largest triangle with the previously selected point
and the NEXT bucket's centroid.

The selection is sequential per series (bucket i depends on the choice
in bucket i-1), so this runs per key inside ``applyInPandas`` — one
shuffle on the series key, numpy-vectorized within each bucket, O(n)
per series. That per-key sequential structure is exactly what grouped
Arrow UDFs are for; there is no relational formulation that avoids it
(the driver query unrolls a FIXED n_out in SQL for the oracle instead).

``area_decimals`` quantizes the triangle areas before the argmax
(ties broken by earliest timestamp). With it set, the selection is
invariant to sub-quantum floating-point noise — used by the driver
query so the DuckDB oracle's independently-summed centroids select
identical points; leave it None for pure LTTB.

Timestamps are rebased per series (seconds since the series start)
before any geometry, so area magnitudes stay O(span*value) and don't
swamp double precision with epoch offsets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def lttb_numpy(
    t: np.ndarray, v: np.ndarray, n_out: int, area_decimals: int | None = None
) -> np.ndarray:
    """Indices of the selected points (sorted ascending). Pure-numpy
    reference used by both the Spark operator and tests."""
    n = t.size
    if n_out < 3:
        raise ValueError("lttb: n_out must be >= 3")
    if n_out >= n:
        return np.arange(n)
    t0 = t[0]
    ts = (t - t0).astype(np.float64)
    sel = [0]
    nb = n_out - 2
    # bucket b covers interior indices [lo_b, hi_b): equal-count split
    edges = 1 + np.floor((n - 2) * np.arange(nb + 1) / nb).astype(np.int64)
    for b in range(nb):
        lo, hi = int(edges[b]), int(edges[b + 1])
        # centroid of the NEXT bucket (the last point for the final one)
        nlo, nhi = (int(edges[b + 1]), int(edges[b + 2])) if b + 1 < nb else (n - 1, n)
        cx = float(ts[nlo:nhi].mean())
        cy = float(v[nlo:nhi].mean())
        a = int(sel[-1])
        ax, ay = float(ts[a]), float(v[a])
        px, py = ts[lo:hi], v[lo:hi]
        area = np.abs((ax - cx) * (py - ay) - (ax - px) * (cy - ay))
        if area_decimals is not None:
            area = np.round(area, area_decimals)
        sel.append(lo + int(np.argmax(area)))  # argmax takes the FIRST max
    sel.append(n - 1)
    return np.asarray(sel, dtype=np.int64)


def lttb(
    df: DataFrame,
    n_out: int,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    area_decimals: int | None = None,
) -> DataFrame:
    """Downsample every series to at most ``n_out`` points.

    Returns ``(key, ts, value, pt_idx)`` where ``pt_idx`` is the
    0-based output position (0 = series start). Series with <= n_out
    points pass through unchanged.
    """
    if n_out < 3:
        # fail fast on the driver, not inside executor Arrow tasks
        raise ValueError("lttb: n_out must be >= 3")
    out_schema = (
        f"{key_col} {df.schema[key_col].dataType.simpleString()}, "
        f"{ts_col} {df.schema[ts_col].dataType.simpleString()}, "
        f"{value_col} {df.schema[value_col].dataType.simpleString()}, "
        "pt_idx int"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="stable")
        t = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64) / 1e6
        v = pdf[value_col].to_numpy(np.float64)
        idx = lttb_numpy(t, v, n_out, area_decimals)
        out = pdf.iloc[idx][[key_col, ts_col, value_col]].copy()
        out["pt_idx"] = np.arange(idx.size, dtype=np.int32)
        return out

    # numbered repartition: the triangle scan is CPU-bound per key, so
    # AQE's byte-based coalescing would serialize it (the grouped-UDF
    # trap, BENCH/PLANS.md); exempt + satisfies the clustered
    # distribution, so no second shuffle.
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(nparts, key_col)
        .groupBy(key_col)
        .applyInPandas(fn, schema=out_schema)
    )
