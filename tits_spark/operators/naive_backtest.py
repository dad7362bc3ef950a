"""Naive-forecast backtesting: persistence vs seasonal-naive MAE per
key, and their ratio (the MASE denominator contest).

The two zero-parameter forecasters every real model must beat
(Hyndman & Koehler 2006 — MASE scales model error by the naive MAE):

    persistence      yhat_t = y_{t-1}        (last hour's mean)
    seasonal naive   yhat_t = y_{t-24}       (same hour yesterday)

run over the hourly bin means of the irregular stream. Their error
ratio answers "does this key have exploitable daily seasonality?"
before any model is fit: ratio < 1 means the same-hour-yesterday
forecast already beats persistence.

Exactness device: bin means are exact-cents-sum / count (one double
division); each absolute error is quantized to floor(|d| * 1e4)
(1e-6 value units) so the per-key error SUMS are exact BIGINTs —
partial-agg order cannot perturb them — and the final MAEs/ratio are
single double expressions over exact integers.

Gap-awareness: a forecast exists only where the lagged bin exists
(b-1 / b-24 present for the key) — silence contributes no error rows,
the same only-real-pairs rule as the Allan cascade.

Plan: ONE shuffle builds the hourly bins; persistence and seasonal
errors are two self-equi-joins of that (small) bins frame on
(key, b-lag), each followed by a hash agg — linear, no windows over
raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tits_spark.functions.exprs import epoch_us, floordiv


def _err_agg(bins: DataFrame, lag: int, label: str) -> DataFrame:
    cur = bins.select("key", "b", (F.col("c") / F.col("n")).alias("m"))
    prev = bins.select(
        "key", (F.col("b") + lag).alias("b"), (F.col("c") / F.col("n")).alias("mp")
    )
    e = F.floor(F.abs(F.col("m") - F.col("mp")) * 10000.0).cast("long")
    return (
        cur.join(prev, ["key", "b"])
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{label}"),
            F.sum(e).alias(f"sae_{label}"),
        )
    )


def naive_backtest(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
    bucket_s: int = 3600,
    season: int = 24,
) -> DataFrame:
    """Per-key persistence and seasonal-naive MAE over bucket means.

    Returns (key, n_pers, sae_pers, n_seas, sae_seas, mase_u6):
    error sums on the exact 1e-6-value lattice and the
    seasonal/persistence MAE ratio on the floor-1e6 lattice (NULL when
    either side has no forecastable bins or persistence MAE is 0).
    Keys appear when BOTH forecasters have at least one evaluation.
    """
    tau_us = int(bucket_s) * 1_000_000
    cents = F.round(F.col(value) * 100).cast("long")
    bins = (
        df.select(
            F.col(key).alias("key"),
            floordiv(epoch_us(ts), tau_us).alias("b"),
            cents.alias("c"),
        )
        .groupBy("key", "b")
        .agg(F.sum("c").alias("c"), F.count(F.lit(1)).alias("n"))
    )
    # r06: both forecasters share ONE self-equi-join — each bin row
    # emits its two tagged forecast probes (b+1 persistence, b+season
    # seasonal) and a single join attaches the realized bin; the old
    # two _err_agg joins referenced `bins` four times, re-running the
    # raw scan + bin aggregate four times in one plan (guide §2.4).
    # Error terms, counts and the inner-join "both forecasters
    # evaluated" rule are unchanged (conditional sums + the n>0
    # filters).
    cur = bins.select("key", "b", (F.col("c") / F.col("n")).alias("m"))
    probes = bins.select(
        "key",
        (F.col("c") / F.col("n")).alias("mp"),
        F.explode(
            F.array(
                F.struct(
                    (F.col("b") + 1).alias("b"), F.lit("pers").alias("tag")
                ),
                F.struct(
                    (F.col("b") + int(season)).alias("b"),
                    F.lit("seas").alias("tag"),
                ),
            )
        ).alias("p"),
    ).select("key", F.col("p.b").alias("b"), "mp", F.col("p.tag").alias("tag"))
    e = F.floor(F.abs(F.col("m") - F.col("mp")) * 10000.0).cast("long")
    is_p = F.col("tag") == "pers"
    joined = (
        cur.join(probes, ["key", "b"])
        .groupBy("key")
        .agg(
            F.sum(is_p.cast("long")).cast("long").alias("n_pers"),
            F.sum(F.when(is_p, e)).alias("sae_pers"),
            F.sum((~is_p).cast("long")).cast("long").alias("n_seas"),
            F.sum(F.when(~is_p, e)).alias("sae_seas"),
        )
        .filter((F.col("n_pers") > 0) & (F.col("n_seas") > 0))
    )
    mae_p = F.col("sae_pers").cast("double") / F.col("n_pers")
    mae_s = F.col("sae_seas").cast("double") / F.col("n_seas")
    return joined.select(
        "key", "n_pers", "sae_pers", "n_seas", "sae_seas",
        F.when(
            F.col("sae_pers") > 0, F.floor(mae_s / mae_p * 1e6).cast("long")
        ).alias("mase_u6"),
    )
