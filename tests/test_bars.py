"""Bar indicators (true range / ATR / Cutler RSI) vs a pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tits_spark.operators.bars import atr_rsi, bars_from_tier, true_range
from tits_spark.operators.rollup import rollup_from_raw


def _bars(spark, events):
    ev = events.select(F.col("user_id").alias("key"), "ts", "value")
    return bars_from_tier(rollup_from_raw(ev, "key", "ts", "value", "1h"))


def _pandas_ref(bars: pd.DataFrame, n: int = 14) -> pd.DataFrame:
    out = []
    for _, g in bars.sort_values(["key", "bucket_ts"]).groupby("key"):
        g = g.reset_index(drop=True)
        pc = g["close"].shift(1)
        tr = np.where(
            pc.isna(),
            g["high"] - g["low"],
            np.maximum.reduce(
                [g["high"] - g["low"], (g["high"] - pc).abs(), (g["low"] - pc).abs()]
            ),
        )
        d = g["close"] - pc
        gain = d.where(d > 0, 0.0).where(d.notna())
        loss = (-d).where(d < 0, 0.0).where(d.notna())
        g["tr"] = tr
        g["atr"] = pd.Series(tr).rolling(n, min_periods=1).mean().round(6)
        ag = gain.rolling(n, min_periods=1).mean().round(6)
        al = loss.rolling(n, min_periods=1).mean().round(6)
        rsi = np.where(
            ag.isna(), np.nan, np.where(ag + al > 0, (100 * ag / (ag + al)).round(6), 50.0)
        )
        g["rsi"] = rsi
        out.append(g)
    return pd.concat(out, ignore_index=True)


def test_atr_rsi_matches_pandas(spark, events):
    bars = _bars(spark, events)
    got = (
        atr_rsi(bars, n=14)
        .toPandas()
        .sort_values(["key", "bucket_ts"])
        .reset_index(drop=True)
    )
    want = _pandas_ref(bars.toPandas(), n=14)
    np.testing.assert_allclose(got["tr"], want["tr"], rtol=0, atol=0)
    np.testing.assert_allclose(got["atr"], want["atr"], rtol=0, atol=2e-6)
    np.testing.assert_allclose(got["rsi"], want["rsi"], rtol=0, atol=2e-6)


def test_true_range_first_bar_is_high_minus_low(spark, events):
    bars = _bars(spark, events)
    tr = true_range(bars).toPandas().sort_values(["key", "bucket_ts"])
    # note: groupby().first() would skip the NaN prev_close — use the
    # literal first row per key instead
    first = tr.drop_duplicates("key", keep="first")
    np.testing.assert_array_equal(first["tr"], first["high"] - first["low"])
    assert first["prev_close"].isna().all()


def test_rsi_flat_series_pins_50(spark):
    rows = [(1, f"2026-01-01 {h:02d}:00:00", 5.0) for h in range(6)]
    df = spark.createDataFrame(rows, "key long, ts string, value double").select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    bars = bars_from_tier(rollup_from_raw(df, "key", "ts", "value", "1h"))
    out = atr_rsi(bars, n=14).toPandas().sort_values("bucket_ts")
    assert np.isnan(out["rsi"].iloc[0])  # no predecessor
    assert (out["rsi"].iloc[1:] == 50.0).all()
    assert (out["tr"] == 0.0).all()
