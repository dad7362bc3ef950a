"""Seasonal profile extraction and deseasonalized anomaly detection.

Classic hypertable diagnostics over irregular event series: a per-key
periodic profile (hour-of-day by default) and outliers measured against
it. Everything is window/groupBy algebra — no UDFs, fully
whole-stage-codegen, and every shuffle is keyed on (or a superset of)
the series key, so at 100 TB the work stays co-partitioned with the
raw table's natural layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PERIODS = {
    "hour": F.hour,           # hour of day 0..23
    "dow": F.dayofweek,       # 1..7
    "minute": F.minute,       # minute of hour 0..59
}


def _phase(ts: str, period: str) -> Column:
    try:
        return _PERIODS[period](F.col(ts))
    except KeyError:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}, got {period!r}")


def seasonal_profile(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    period: str = "hour",
    fixed_point_scale: int | None = None,
) -> DataFrame:
    """Per-(key, phase) seasonal offset: mean(value | key, phase) minus
    the key's overall mean, with the phase observation count.

    One shuffle (groupBy key x phase); the key-level mean is recovered
    from the phase aggregates themselves (sum/count re-aggregated over
    a window on the tiny profile frame), so the raw table is scanned
    exactly once.

    Default output column ``seasonal`` (double). With
    ``fixed_point_scale`` set (e.g. 100 for 2-decimal prices), the
    input is treated as a fixed-point lattice and the offset is
    computed entirely in integer arithmetic, emitting exact
    ``seasonal_u6`` integer micro-units instead — the mean difference
    of lattice values is a small rational, and exact integer floor
    division sidesteps the half-ulp rounding ties that make the float
    path engine-dependent at the 6th decimal.
    """
    ph = _phase(ts, period)
    wk = Window.partitionBy("key")
    if fixed_point_scale is None:
        prof = df.groupBy(F.col(key).alias("key"), ph.alias("phase")).agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(value).alias("_sum"),
        )
        key_mean = F.sum("_sum").over(wk) / F.sum("n_obs").over(wk)
        return prof.select(
            "key",
            "phase",
            "n_obs",
            (F.col("_sum") / F.col("n_obs") - key_mean).alias("seasonal"),
        )

    from tits_spark.functions.exprs import floordiv

    scaled = F.round(F.col(value) * fixed_point_scale).cast("long")
    prof = df.groupBy(F.col(key).alias("key"), ph.alias("phase")).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(scaled).alias("_s"),
    )
    n_key = F.sum("n_obs").over(wk)
    s_key = F.sum("_s").over(wk)
    # seasonal = _s/(scale*n) - s_key/(scale*n_key)
    #          = (_s*n_key - s_key*n) / (scale*n*n_key)  -- exact rational
    num = (F.col("_s") * n_key - s_key * F.col("n_obs")) * F.lit(1_000_000)
    den = F.lit(int(fixed_point_scale)) * F.col("n_obs") * n_key
    return prof.select(
        "key", "phase", "n_obs", floordiv(num, den).alias("seasonal_u6")
    )


def seasonal_anomalies(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    period: str = "hour",
    z_thresh: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates from their key's seasonal expectation
    by more than ``z_thresh`` residual standard deviations.

    The residual is ``value - mean(value | key, phase)`` (identically
    key_mean + seasonal offset), and the scale is the sample stddev of
    those residuals per key — both as window aggregates over the
    (key)- and (key, phase)-partitioned frames, so the only exchanges
    are hash-partitions by key. Keys whose residual stddev is zero (or
    a single-row key) produce no anomalies by definition.

    Returns (key, ts, value, z).
    """
    ph = _phase(ts, period)
    w_kp = Window.partitionBy(key, "_phase")
    w_k = Window.partitionBy(key)
    resid = F.col(value) - F.avg(value).over(w_kp)
    with_resid = df.withColumn("_phase", ph).withColumn("_resid", resid)
    sd = F.stddev_samp("_resid").over(w_k)
    z = F.col("_resid") / F.nullif(sd, F.lit(0.0))
    return (
        with_resid.withColumn("z", z)
        .filter(F.abs(F.col("z")) > z_thresh)
        .select(key, ts, value, "z")
    )


def classical_decompose(
    df: DataFrame,
    key: str = "key",
    ts: str = "bucket_ts",
    value: str = "value",
    period: int = 24,
    phase_period: str = "hour",
    decimals: int = 6,
) -> DataFrame:
    """Classical additive decomposition value = trend + seasonal +
    residual (the moving-average method, Hyndman & Athanasopoulos
    FPP3 ch. 3.4) per key over a REGULAR series — gap-fill first
    (operators/gapfill) or the centered window spans more wall time
    than it claims.

    trend: centered moving average of ``period`` points — for even
    period the standard 2xMA (half-weight endpoints), for odd a plain
    centered mean; NULL within period/2 of either series end (no
    partial windows: a shrinking window would bend the trend toward
    the ends). seasonal: per-phase mean of the detrended series,
    centered by subtracting the key's OVERALL detrended mean (equal to
    the textbook mean-of-phase-means when phases are balanced, and the
    variant that keeps the arithmetic integer-exact — see below);
    residual: what remains.

    Exactness discipline: trend is quantized to ``decimals`` (its
    window sum is association-order dependent in the last ulp), which
    puts the detrended series on the 10^-decimals lattice — where
    round() is engine-divergent at exact midpoints. The seasonal step
    therefore never rounds: detrended values become exact integer
    µ-units (round-to-nearest of a near-integer double), phase and
    overall means are ratios of exact integer sums, and the seasonal
    index is two identical IEEE divisions and a subtraction — exact
    equality in any engine with no quantization.

    Plan: one hash-partition by key (window + the two phase aggs all
    cluster on it), no UDFs.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    w = Window.partitionBy(key).orderBy(ts)
    half = period // 2
    if period % 2 == 0:
        frame = w.rowsBetween(-half, half)
        full_n = period + 1
        ma = (
            F.sum(value).over(frame)
            - 0.5 * F.lag(value, half).over(w)
            - 0.5 * F.lead(value, half).over(w)
        ) / period
    else:
        frame = w.rowsBetween(-half, half)
        full_n = period
        ma = F.sum(value).over(frame) / period
    trend = F.when(
        F.count(value).over(frame) == full_n, F.round(ma, decimals)
    )
    t = (
        df.select(
            F.col(key).alias("key"),
            F.col(ts).alias("bucket_ts"),
            F.col(value).alias("value"),
            _phase(ts, phase_period).alias("_ph"),
        )
        .withColumn("trend", trend)
        .withColumn("_d", F.col("value") - F.col("trend"))
    )
    unit = 10 ** decimals
    t = t.withColumn("_du", F.round(F.col("_d") * unit, 0).cast("long"))
    # r06: the phase means ride WINDOWS on the key partitioning the
    # trend window already established (hash(key) satisfies both the
    # (key, _ph) and (key) clustered distributions — no new exchange)
    # instead of two groupBy aggregates joined back, which re-executed
    # the whole gapfill + trend window upstream three times (guide
    # §2.4; one scan instead of three at any scale). sum/count skip
    # NULL _du exactly as the old filtered aggregates did, and the
    # missing-(key,_ph) left-join NULL becomes the s_den == 0 CASE.
    wp = Window.partitionBy("key", "_ph")
    wk = Window.partitionBy("key")
    s_num = F.sum("_du").over(wp)
    s_den = F.count("_du").over(wp)
    g_num = F.sum("_du").over(wk)
    g_den = F.count("_du").over(wk)
    seasonal = F.when(
        s_den > 0, (s_num / s_den - g_num / g_den) / unit
    )
    out = t.withColumn("seasonal", seasonal)
    return out.select(
        "key",
        "bucket_ts",
        "value",
        "trend",
        "seasonal",
        (F.col("_d") - F.col("seasonal")).alias("resid"),
    )


def deseasonalized_outliers(
    decomposed: DataFrame,
    key: str = "key",
    z_thresh: float = 3.5,
    decimals: int = 6,
) -> DataFrame:
    """Robust anomalies on the decomposition residual: per-key
    median/MAD z-score (z = (resid - med) / (1.4826 * mad)), emitting
    rows with |z| > ``z_thresh``. Consumes classical_decompose output —
    seasonality and trend are already removed, so a spike here is a
    spike the daily rhythm can't explain.

    Median/MAD via exact-interpolation percentile (== DuckDB
    quantile_cont on identical inputs), so the z-scores and the
    inclusion test are deterministic cross-engine; keys whose residual
    MAD is 0 (half the residuals identical) emit nothing.
    """
    w = Window.partitionBy(key)
    base = decomposed.filter(F.col("resid").isNotNull())
    with_med = base.withColumn(
        "_med", F.expr("percentile(resid, 0.5)").over(w)
    )
    with_mad = with_med.withColumn(
        "_mad", F.expr("percentile(abs(resid - _med), 0.5)").over(w)
    )
    # 1/qnorm(0.75): the consistency constant making MAD estimate sigma
    c = 1.482602218505602
    z = (F.col("resid") - F.col("_med")) / (c * F.col("_mad"))
    return (
        with_mad.filter(F.col("_mad") > 0)
        .withColumn("rz", F.round(z, decimals))
        .filter(F.abs(z) > z_thresh)
        .select(key, "bucket_ts", "value", "resid", "rz")
    )
