"""Gap-aware local-level Kalman filter per key.

The local-level (random-walk-plus-noise) state-space model

    x_t = x_{t-1} + w_t,   w_t ~ N(0, q * dt_t)     (state drift)
    y_t = x_t + v_t,       v_t ~ N(0, r)            (observation)

filtered by the standard Kalman recursion

    Pp_i = P_{i-1} + q * dt_i          (predict through the gap)
    K_i  = Pp_i / (Pp_i + r)           (gain)
    a_i  = a_{i-1} + K_i * (y_i - a_{i-1})
    P_i  = (1 - K_i) * Pp_i

is the probabilistic counterpart of the reference's LOCF/interp
alignment (ref: /root/reference/src/tits.c gap handling): instead of
carrying the last observation verbatim, it carries a level whose
uncertainty GROWS with the time gap, so a reading after a long silence
moves the level almost all the way (K -> 1) while a rapid burst of
ticks averages them (K -> r-dominated). Scaling process noise by the
actual dt makes the filter gap-aware — the natural formulation for
tits-style irregular series, where fixed-alpha EWMAs misweight uneven
spacing.

Like the Holt recursion (operators/smoothing.py) the scan is
genuinely sequential — the gain depends on the running variance, which
has no prefix-sum factoring — so this is the documented applyInPandas
case: one shuffle keyed by series, an O(n) numpy loop with O(1) state
per series, millions of independent series in parallel.

Determinism contract (the DuckDB recursive-CTE oracle replays the
identical operation tree): rows sorted by (ts, value) within key;
dt_i = (epoch_us_i - epoch_us_{i-1}) / 1e6 computed as an exact int64
difference then one double division; init a_1 = y_1, P_1 = r, K_1 = 1;
``1 - K`` kept as a subtraction. Both engines then agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_SCHEMA = "key string, ts timestamp, level double, gain double, p_var double"


def kalman_local_level(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    q: float = 1.0,
    r: float = 100.0,
) -> DataFrame:
    """Per-row filtered level, gain and posterior variance for every
    key. ``q`` is process variance per SECOND of gap, ``r`` the
    observation variance. Returns (key, ts, level, gain, p_var)."""
    qf, rf = float(q), float(r)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, value], kind="stable")
        y = pdf[value].to_numpy(dtype=np.float64)
        # exact int64 microsecond lattice -> one double division, the
        # same two ops the oracle performs
        us = pdf[ts].to_numpy(dtype="datetime64[us]").astype(np.int64)
        n = y.size
        lev = np.empty(n)
        kg = np.empty(n)
        pv = np.empty(n)
        lev[0], kg[0], pv[0] = y[0], 1.0, rf
        for i in range(1, n):
            dt = (us[i] - us[i - 1]) / 1e6
            pp = pv[i - 1] + qf * dt
            k = pp / (pp + rf)
            lev[i] = lev[i - 1] + k * (y[i] - lev[i - 1])
            kg[i] = k
            pv[i] = (1 - k) * pp
        return pd.DataFrame({
            "key": pdf[key].to_numpy(),
            "ts": pdf[ts].to_numpy(),
            "level": lev,
            "gain": kg,
            "p_var": pv,
        })

    # numbered repartition: exempt from AQE byte-based coalescing and
    # satisfies the grouped UDF's ClusteredDistribution (no 2nd exchange)
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(nparts, key).groupBy(key).applyInPandas(fn, schema=_SCHEMA)
