"""Rolling Bollinger / robust bands vs pandas rolling reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tits_spark.operators.rolling import bollinger, robust_band


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(17)
    pdf = pd.DataFrame({
        "key": ["a"] * 120,
        "ts": pd.date_range("2026-04-01", periods=120, freq="min"),
        "value": np.round(rng.normal(100, 5, 120), 2),
    })
    pdf.loc[90, "value"] = 400.0  # planted spike
    return spark.createDataFrame(pdf, "key string, ts timestamp, value double"), pdf


def test_bollinger_matches_pandas(series):
    df, pdf = series
    got = bollinger(df, n=20, k=2.0).toPandas().sort_values("ts").reset_index(drop=True)
    r = pdf["value"].rolling(20, min_periods=1)
    assert np.allclose(got["roll_mean"], r.mean(), atol=1e-9)
    assert np.allclose(
        got["roll_std"].to_numpy()[1:], r.std().to_numpy()[1:], atol=1e-9
    )
    assert pd.isna(got["roll_std"].iloc[0])
    assert bool(got.loc[90, "breach"])
    # flags equal the definition applied to the pandas reference values
    m, sd = r.mean().to_numpy(), r.std().to_numpy()
    want = (pdf["value"].to_numpy() > m + 2 * sd) | (pdf["value"].to_numpy() < m - 2 * sd)
    assert np.array_equal(got["breach"].to_numpy()[1:].astype(bool), want[1:])


def test_robust_band_matches_pandas_and_shrugs_off_spike(series):
    df, pdf = series
    got = robust_band(df, n=20, k=1.5).toPandas().sort_values("ts").reset_index(drop=True)
    r = pdf["value"].rolling(20, min_periods=1)
    assert np.allclose(got["roll_med"], r.median(), atol=1e-9)
    iqr = r.quantile(0.75, interpolation="linear") - r.quantile(0.25, interpolation="linear")
    assert np.allclose(got["roll_iqr"], iqr, atol=1e-9)
    assert bool(got.loc[90, "outlier"])
    want = np.abs(pdf["value"].to_numpy() - r.median().to_numpy()) > 1.5 * iqr.to_numpy()
    assert np.array_equal(got["outlier"].to_numpy().astype(bool), want)


# ------------------------------------------------------------ drawdown

def test_drawdown_matches_pandas(series):
    from tits_spark.operators.rolling import drawdown

    df, pdf = series
    got = drawdown(df).toPandas().sort_values("ts").reset_index(drop=True)
    peak = pdf["value"].cummax()
    dd = peak - pdf["value"]
    assert np.allclose(got["peak"], peak)
    assert np.allclose(got["dd"], dd)
    assert np.allclose(got["max_dd"], dd.cummax())
    assert np.allclose(got["dd_pct"], dd / peak)


def test_drawdown_zero_peak_is_null(spark):
    import pandas as pd

    pdf = pd.DataFrame({
        "key": ["z", "z"],
        "ts": pd.date_range("2026-01-01", periods=2, freq="h"),
        "value": [0.0, -1.0],
    })
    df = spark.createDataFrame(pdf, "key string, ts timestamp, value double")
    from tits_spark.operators.rolling import drawdown

    rows = drawdown(df).orderBy("ts").collect()
    assert rows[0]["dd_pct"] is None  # peak == 0 guard, not NaN
    assert rows[1]["dd"] == 1.0


# -------------------------------------------------------- rolling_corr

def test_rolling_corr_matches_pandas(spark):
    from tits_spark.operators.rolling import rolling_corr

    rng = np.random.default_rng(5)
    n = 200
    pdf = pd.DataFrame({
        "key": ["p"] * n,
        "ts": pd.date_range("2026-02-01", periods=n, freq="min"),
        "x": rng.normal(0, 1, n).round(3),
    })
    pdf["y"] = (0.6 * pdf["x"] + 0.4 * rng.normal(0, 1, n)).round(3)
    df = spark.createDataFrame(
        pdf, "key string, ts timestamp, x double, y double"
    )
    got = (
        rolling_corr(df, key="key", ord_col="ts", x="x", y="y", n=30)
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    want = pdf["x"].rolling(30, min_periods=1).corr(pdf["y"])
    # first row has a frame of 1 -> engine NULL, pandas NaN
    assert got["roll_corr"].isna()[0] and np.isnan(want.iloc[0])
    assert np.allclose(got["roll_corr"][1:], want[1:], atol=1e-7)


def test_rolling_corr_constant_frame_is_null(spark):
    from tits_spark.operators.rolling import rolling_corr

    pdf = pd.DataFrame({
        "key": ["c"] * 10,
        "ts": pd.date_range("2026-02-01", periods=10, freq="min"),
        "x": [1.0] * 10,
        "y": list(range(10)),
    })
    df = spark.createDataFrame(
        pdf, "key string, ts timestamp, x double, y double"
    )
    rows = rolling_corr(df, n=5).collect()
    assert all(r["roll_corr"] is None for r in rows)  # zero x-variance
