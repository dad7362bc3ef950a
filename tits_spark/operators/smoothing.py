"""Holt double-exponential smoothing (level + linear trend) per key.

The Holt recursion

    l_i = alpha * x_i + (1 - alpha) * (l_{i-1} + b_{i-1})
    b_i = beta * (l_i - l_{i-1}) + (1 - beta) * b_{i-1}

is a genuinely sequential scan (unlike the plain EWMA, whose single
geometric decay factors into a ratio of prefix sums —
operators/sessionize.py — the coupled level/trend pair has no
closed-form column-algebra factoring short of 2x2 matrix prefix
products Spark lacks a primitive for). So this is the documented
applyInPandas case: one shuffle keyed by series, an O(n) numpy loop
per series with O(1) state, millions of independent series in
parallel — the same shape as the sacf/AR kernels.

Determinism contract (what the DuckDB recursive-CTE oracle relies
on): rows are ordered by (ts, value) within a key, the init is the
textbook l_1 = x_1, b_1 = x_2 - x_1, and every arithmetic step keeps
the exact operation tree above — in particular ``1 - alpha`` is
computed, not pre-folded, so both engines round identically and the
outputs agree bit-for-bit, not just to tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = "key string, ts timestamp, level double, trend double"


def holt_by_key(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Per-row Holt level and trend for every key with >= 2
    observations (shorter series are dropped — the trend init needs a
    second point). Returns (key, ts, level, trend)."""
    a, b_ = float(alpha), float(beta)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["key", "ts", "level", "trend"])
        pdf = pdf.sort_values([ts, value], kind="stable")
        x = pdf[value].to_numpy(dtype=np.float64)
        n = x.size
        lev = np.empty(n)
        trd = np.empty(n)
        lev[0] = x[0]
        trd[0] = x[1] - x[0]
        for i in range(1, n):
            l_new = a * x[i] + (1 - a) * (lev[i - 1] + trd[i - 1])
            trd[i] = b_ * (l_new - lev[i - 1]) + (1 - b_) * trd[i - 1]
            lev[i] = l_new
        return pd.DataFrame({
            "key": pdf[key].to_numpy(),
            "ts": pdf[ts].to_numpy(),
            "level": lev,
            "trend": trd,
        })

    # numbered repartition: exempt from AQE's byte-based coalescing
    # (which serializes this CPU-bound grouped UDF onto ONE task —
    # measured 6.1s -> 1.2s at bench scale) and satisfies the grouped
    # UDF's ClusteredDistribution, so no second exchange appears
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(nparts, key).groupBy(key).applyInPandas(fn, schema=_SCHEMA)


def holt_forecast(
    smoothed: DataFrame, horizon: int = 1
) -> DataFrame:
    """h-step-ahead forecast from the LAST smoothed state per key:
    yhat = level + h * trend. Tiny frame in, tiny frame out."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("key").orderBy(F.desc("ts"))
    last = smoothed.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
    return last.select(
        "key",
        F.col("ts").alias("asof_ts"),
        (F.col("level") + horizon * F.col("trend")).alias("forecast"),
    )


def holt_backtest(
    smoothed: DataFrame,
    observed: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    skip_first: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """One-step-ahead forecast evaluation of the Holt fit: for each
    observation i, the prediction made at i-1 is level + trend; the
    backtest summarizes the errors per key (n_eval, mae, bias, rmse).

    ``skip_first`` drops the first rows of each key from evaluation:
    the Holt init consumes x[1] (trend seed), so the "prediction" of
    row 2 is x[1] itself — zero error by construction, not skill.

    The smoothed states are bit-identical to any faithful re-execution
    of the recursion (same operation tree), so the per-row errors are
    too; only the averaged summary stats are quantized.
    """
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(key).orderBy(ts)
    pred = smoothed.withColumn(
        "_yhat", F.lag(F.col("level") + F.col("trend")).over(w)
    ).withColumn("_rn", F.row_number().over(w))
    joined = pred.join(observed.select(key, ts, value), [key, ts])
    err = F.col(value) - F.col("_yhat")
    return (
        joined.filter(F.col("_rn") > skip_first)
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.avg(F.abs(err)), decimals).alias("mae"),
            F.round(F.avg(err), decimals).alias("bias"),
            F.round(F.sqrt(F.avg(err * err)), decimals).alias("rmse"),
        )
    )


def macd_irregular(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    tau_fast: float = 12 * 3600.0,
    tau_slow: float = 26 * 3600.0,
    tau_signal: float = 9 * 3600.0,
) -> DataFrame:
    """Time-decayed MACD for IRREGULAR series: fast/slow/signal lines
    are the normalized time-decay EWMAs of operators/sessionize
    (weights e^{-Δt/τ}), not bar-count EMAs — the natural translation
    of the 12/26/9 convention to an engine whose series have no fixed
    bar width (defaults are the classic periods read as hours). On a
    regular grid with τ = -Δ/ln(1-α) this coincides with the
    adjust=True EMA of the same α.

    Three chained window passes sharing one hash-partition on the key
    (the segmented prefix-sum EWMA is overflow-safe at any span/τ);
    emits (key, ts, value, macd, signal, hist).
    """
    from pyspark.sql import functions as F

    from tits_spark.operators.sessionize import ewma_irregular

    fast = ewma_irregular(df, key, ts, value, tau_fast, out="_ema_fast")
    slow = ewma_irregular(fast, key, ts, value, tau_slow, out="_ema_slow")
    withm = slow.withColumn("macd", F.col("_ema_fast") - F.col("_ema_slow"))
    sig = ewma_irregular(withm, key, ts, "macd", tau_signal, out="signal")
    return sig.select(
        key, ts, value, "macd", "signal",
        (F.col("macd") - F.col("signal")).alias("hist"),
    )


def holt_winters(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.4,
    period: int = 4,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing) per key.

    Classic textbook initialization (Hyndman & Athanasopoulos, OTexts
    §7.3 additive form): at t = period,
        l = mean(x_1..x_p)                (left-chained sum)
        b = (mean(x_{p+1}..x_{2p}) - l) / p
        s_j = x_j - l                     (j = 1..p)
    then for t = p+1..n (index order = (ts, value)):
        fitted_t = (l + b) + s_{t-p}
        l'       = alpha*(x_t - s_{t-p}) + (1-alpha)*(l + b)
        b'       = beta*(l' - l) + (1-beta)*b
        s_t      = gamma*(x_t - l') + (1-gamma)*s_{t-p}
    Keys with fewer than ``2*period`` samples are dropped (the trend
    init needs the second period).

    Returns (key, idx, value, fitted, level, trend, seasonal) for
    t > period. Every arithmetic step is written as the IDENTICAL
    operation tree the DuckDB recursive-CTE oracle evaluates (the
    holt/_HOLT_REC_CTE device extended with a seasonal LIST state), so
    the outputs are bit-identical across engines. Runs as a grouped
    Arrow kernel behind the numbered-repartition AQE guard
    (BENCH/PLANS.md).
    """
    a, b_, g, p = float(alpha), float(beta), float(gamma), int(period)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["key", "idx", "value", "fitted", "level", "trend", "seasonal"]
        if len(pdf) < 2 * p:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values([ts, value], kind="stable")
        x = pdf[value].to_numpy(np.float64)
        acc1 = 0.0
        for j in range(p):
            acc1 = acc1 + x[j]
        l = acc1 / p
        acc2 = 0.0
        for j in range(p, 2 * p):
            acc2 = acc2 + x[j]
        b = (acc2 / p - l) / p
        s = [x[j] - l for j in range(p)]
        rows = []
        for t in range(p, x.size):
            sh = s[0]
            fitted = (l + b) + sh
            l_new = a * (x[t] - sh) + (1 - a) * (l + b)
            b_new = b_ * (l_new - l) + (1 - b_) * b
            s_new = g * (x[t] - l_new) + (1 - g) * sh
            rows.append((t + 1, x[t], fitted, l_new, b_new, s_new))
            l, b = l_new, b_new
            s = s[1:] + [s_new]
        out = pd.DataFrame(rows, columns=cols[1:])
        out.insert(0, "key", pdf[key].iloc[0])
        return out

    kt = df.schema[key].dataType.simpleString()
    prep = df.where(F.col(value).isNotNull()).select(
        F.col(key).alias("key"), F.col(ts).alias(ts), F.col(value).alias(value)
    )
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        prep.repartition(nparts, "key")
        .groupBy("key")
        .applyInPandas(
            fn,
            schema=(
                f"key {kt}, idx long, value double, fitted double, "
                "level double, trend double, seasonal double"
            ),
        )
    )


def holt_winters_forecast(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.4,
    period: int = 4,
    horizon: int | None = None,
) -> DataFrame:
    """h-step-ahead additive Holt-Winters forecasts from each key's
    final state: f_{n+h} = (l_n + h*b_n) + s_{n+h-p}, h = 1..horizon
    (default one full period; horizon <= period keeps the seasonal
    index inside the retained state window). Same recursion and
    operation trees as :func:`holt_winters`."""
    a, b_, g, p = float(alpha), float(beta), float(gamma), int(period)
    h_max = p if horizon is None else int(horizon)
    if not 1 <= h_max <= p:
        raise ValueError("holt_winters_forecast: horizon must be in [1, period]")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["key", "h", "forecast"]
        if len(pdf) < 2 * p:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values([ts, value], kind="stable")
        x = pdf[value].to_numpy(np.float64)
        acc1 = 0.0
        for j in range(p):
            acc1 = acc1 + x[j]
        l = acc1 / p
        acc2 = 0.0
        for j in range(p, 2 * p):
            acc2 = acc2 + x[j]
        b = (acc2 / p - l) / p
        s = [x[j] - l for j in range(p)]
        for t in range(p, x.size):
            sh = s[0]
            l_new = a * (x[t] - sh) + (1 - a) * (l + b)
            b_new = b_ * (l_new - l) + (1 - b_) * b
            s_new = g * (x[t] - l_new) + (1 - g) * sh
            l, b = l_new, b_new
            s = s[1:] + [s_new]
        rows = [
            (h, (l + (float(h) * b)) + s[h - 1]) for h in range(1, h_max + 1)
        ]
        out = pd.DataFrame(rows, columns=cols[1:])
        out.insert(0, "key", pdf[key].iloc[0])
        return out

    kt = df.schema[key].dataType.simpleString()
    prep = df.where(F.col(value).isNotNull()).select(
        F.col(key).alias("key"), F.col(ts).alias(ts), F.col(value).alias(value)
    )
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        prep.repartition(nparts, "key")
        .groupBy("key")
        .applyInPandas(fn, schema=f"key {kt}, h int, forecast double")
    )


def theta_daily(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    min_days: int = 14,
) -> DataFrame:
    """Theta-method one-step forecast of the daily event count per
    key (Assimakopoulos & Nikolopoulos, IJF 2000 — the M3-competition
    winner; the classic theta = (0, 2) decomposition): the zero-filled
    daily series over the key's span splits into the theta=0 line
    (the OLS linear trend, all curvature removed) and the theta=2
    line z_t = 2 y_t - (a + b t) (curvature doubled), SES(alpha=0.5)
    smooths the theta=2 line, and the forecast is the average of the
    extrapolated trend and the flat SES level:

        yhat(n+1) = 0.5 * ((a + b (n+1)) + s_n)

    Exactness: the spine and counts are exact integers; the OLS
    normal equations accumulate in int64 (b and a are single float
    divisions over exact sums); the SES recursion runs the IDENTICAL
    elementwise tree as the DuckDB recursive-CTE oracle (the holt
    precedent), s_1 = z_1, s_t = 0.5 z_t + 0.5 s_{t-1}.  Outputs are
    RAW doubles — every value is the end of an identical float tree
    on both engines, so they match bit-for-bit with no rounding step
    (and no round-half boundary to diverge on).

    Plan shape (100 TB): one (key, day) count hash agg, then ONE
    grouped Arrow batch per key (series length = the key's span in
    days — the bounded-horizon contract shared by holt/kalman); the
    zero-fill happens inside the batch with no explode.

    Returns (key, n_days, slope, intercept, ses_last, theta_next).
    """
    md = int(min_days)

    from tits_spark.functions.exprs import epoch_us

    daily = (
        df.select(
            F.col(key).alias("key"),
            (epoch_us(ts) / F.lit(86_400_000_000)).cast("long").alias("d"),
        )
        .groupBy("key", "d")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d", kind="stable")
        dd = pdf["d"].to_numpy(np.int64)
        cc = pdf["c"].to_numpy(np.int64)
        lo, hi = int(dd[0]), int(dd[-1])
        n = hi - lo + 1
        if n < md:
            return pd.DataFrame(
                columns=[
                    "key", "n_days", "slope", "intercept", "ses_last",
                    "theta_next",
                ]
            )
        y = np.zeros(n, dtype=np.int64)
        y[dd - lo] = cc
        t = np.arange(1, n + 1, dtype=np.int64)
        st = int(t.sum())
        st2 = int((t * t).sum())
        sy = int(y.sum())
        sty = int((t * y).sum())
        den = n * st2 - st * st
        b = float(n * sty - st * sy) / float(den)
        a = (float(sy) - b * float(st)) / float(n)
        s = None
        for i in range(n):
            z = 2.0 * float(y[i]) - (a + b * float(i + 1))
            s = z if s is None else 0.5 * z + 0.5 * s
        fc = 0.5 * ((a + b * float(n + 1)) + s)
        # raw doubles, no rounding: every emitted value is the result
        # of an identical elementwise float tree on both engines
        # (the recursive-CTE oracle mirrors each op), so stream-level
        # bit equality holds without a rounding step to get wrong
        return pd.DataFrame(
            [
                {
                    "key": pdf["key"].iloc[0],
                    "n_days": n,
                    "slope": b,
                    "intercept": a,
                    "ses_last": s,
                    "theta_next": fc,
                }
            ]
        )

    # numbered repartition: the (key, day) counts are tiny in bytes, so
    # AQE's advisory coalescing serializes the 1500 per-key SES
    # recursions onto one task (measured 3.2s -> 0.6s at sf0.1; the
    # holt device above)
    nparts = daily.sparkSession.sparkContext.defaultParallelism
    return daily.repartition(nparts, "key").groupBy("key").applyInPandas(
        fn,
        schema=(
            "key long, n_days long, slope double, intercept double, "
            "ses_last double, theta_next double"
        ),
    )
