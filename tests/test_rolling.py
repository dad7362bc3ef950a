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
