"""OHLC-bar indicators over the rollup tiers: true range, ATR, RSI.

The tier cascade (operators/rollup.py) already carries open/high/low/
close per (key, bucket) as v_first/v_max/v_min/v_last — the classic
bar indicators are therefore pure window algebra over a tier table,
never touching raw: at 10^12 turns an ATR scan reads the ~3600x
smaller 1h tier.

Both smoothers are the SMA (simple moving average) variants — Cutler's
RSI and SMA-ATR — not Wilder's recursive EWMA forms: the SMA variants
are windowed aggregates (relational, exact, rank-checkable against any
SQL engine), while Wilder smoothing is a per-key recursion that would
need the sessionize.ewma prefix-sum machinery for no analytical gain
at tier granularity.

Plan: one hash-partition by key, lag + two trailing-window frames —
no UDFs, no collect, O(1) state per key in the window operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bars_from_tier(tier_df: DataFrame) -> DataFrame:
    """Rename a rollup tier's aggregate columns to bar vocabulary."""
    return tier_df.select(
        "key",
        "bucket_ts",
        F.col("v_first").alias("open"),
        F.col("v_max").alias("high"),
        F.col("v_min").alias("low"),
        F.col("v_last").alias("close"),
        "n_obs",
    )


def true_range(bars: DataFrame, key: str = "key", ord_col: str = "bucket_ts") -> DataFrame:
    """Per-bar true range: max(high-low, |high-prev_close|,
    |low-prev_close|); the first bar of a key falls back to high-low
    (no previous close exists)."""
    w = Window.partitionBy(key).orderBy(ord_col)
    pc = F.lag("close").over(w)
    tr = F.when(
        pc.isNull(), F.col("high") - F.col("low")
    ).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - pc),
            F.abs(F.col("low") - pc),
        )
    )
    return bars.withColumn("prev_close", pc).withColumn("tr", tr)


def atr_rsi(
    bars: DataFrame,
    n: int = 14,
    key: str = "key",
    ord_col: str = "bucket_ts",
    quantize: int = 6,
) -> DataFrame:
    """ATR and Cutler RSI over a trailing ``n``-bar frame.

    The windowed averages are quantized to ``quantize`` decimals
    BEFORE entering the RSI ratio (windowed sums are association-order
    dependent in the last ulp; deriving a ratio from unquantized sums
    would leak that noise into every downstream comparison). RSI is
    computed as 100*ag/(ag+al) — algebraically 100 - 100/(1+RS) with
    one division instead of two. A bar with no predecessor in the
    frame has NULL gain/loss everywhere, hence NULL RSI; a flat frame
    (ag = al = 0) is pinned to 50.
    """
    w = Window.partitionBy(key).orderBy(ord_col)
    frame = w.rowsBetween(-(n - 1), 0)
    tr_df = true_range(bars, key, ord_col)
    d = F.col("close") - F.col("prev_close")
    gain = F.when(d > 0, d).otherwise(F.when(d.isNotNull(), F.lit(0.0)))
    loss = F.when(d < 0, -d).otherwise(F.when(d.isNotNull(), F.lit(0.0)))
    enriched = (
        tr_df.withColumn("_gain", gain)
        .withColumn("_loss", loss)
        .withColumn("atr", F.round(F.avg("tr").over(frame), quantize))
        .withColumn("_ag", F.round(F.avg("_gain").over(frame), quantize))
        .withColumn("_al", F.round(F.avg("_loss").over(frame), quantize))
        .withColumn("n_win", F.count("tr").over(frame))
    )
    rsi = (
        F.when(F.col("_ag").isNull(), F.lit(None).cast("double"))
        .when(
            F.col("_ag") + F.col("_al") > 0,
            F.round(100 * F.col("_ag") / (F.col("_ag") + F.col("_al")), quantize),
        )
        .otherwise(F.lit(50.0))
    )
    return enriched.withColumn("rsi", rsi).drop("_gain", "_loss", "_ag", "_al")


def stochastic(
    bars: DataFrame,
    n: int = 14,
    d: int = 3,
    key: str = "key",
    ord_col: str = "bucket_ts",
    quantize: int = 6,
) -> DataFrame:
    """Stochastic oscillator %K/%D, Williams %R, and OBV per bar.

    %K = 100*(close - LL_n)/(HH_n - LL_n) over the trailing n-bar
    frame; %D = the d-bar average of the RAW %K, rounded once at
    emission (windowed extrema are exact copies, so raw %K is one
    deterministic division and the short ordered sum is engine-
    identical; averaging quantized values would land on exact decimal
    midpoints where cross-engine rounding modes disagree); %R =
    -100*(HH_n - close)/(HH_n - LL_n). A flat frame (HH == LL) yields
    NULL %K/%D/%R on both engines (explicit guard — double
    division-by-zero semantics differ across engines). OBV accumulates
    n_obs as the volume proxy signed by the close-to-close direction —
    exact integers end to end.
    """
    w = Window.partitionBy(key).orderBy(ord_col)
    frame = w.rowsBetween(-(n - 1), 0)
    dframe = w.rowsBetween(-(d - 1), 0)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    hh = F.max("high").over(frame)
    ll = F.min("low").over(frame)
    pc = F.lag("close").over(w)
    delta = F.col("close") - pc
    signed_vol = (
        F.when(delta > 0, F.col("n_obs"))
        .when(delta < 0, -F.col("n_obs"))
        .otherwise(F.lit(0))
        .cast("long")
    )
    rng = hh - ll
    k_raw = F.when(
        rng > 0, F.lit(100.0) * (F.col("close") - ll) / rng
    ).otherwise(F.lit(None).cast("double"))
    r = F.when(
        rng > 0,
        F.round(F.lit(-100.0) * (hh - F.col("close")) / rng, quantize),
    ).otherwise(F.lit(None).cast("double"))
    enriched = (
        bars.withColumn("_k_raw", k_raw)
        .withColumn("pct_r", r)
        .withColumn("obv", F.sum(signed_vol).over(cum))
        .withColumn("n_win", F.count("close").over(frame))
    )
    # %D averages the RAW %K (a <=d-element ordered sum of full-
    # precision doubles, identical either engine) and rounds ONCE at
    # emission: averaging already-quantized values would put the mean
    # on an exact decimal midpoint lattice where Spark HALF_UP and
    # DuckDB rint disagree (the time_to_conv lesson)
    return (
        enriched.withColumn(
            "pct_d", F.round(F.avg("_k_raw").over(dframe), quantize)
        )
        .withColumn("pct_k", F.round("_k_raw", quantize))
        .drop("_k_raw")
    )
