"""Seasonal profile / deseasonalized anomalies / CUSUM changepoint."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tits_spark.operators.changepoint import cusum_changepoint
from tits_spark.operators.seasonal import seasonal_anomalies, seasonal_profile


def _hourly_df(spark, spike_at=None):
    # 12 days x hours {1, 13}; hour 13 runs +8.0 hotter; 2-dp lattice
    rows = []
    rng = np.random.default_rng(5)
    for day in range(12):
        for hour, base in ((1, 5.0), (13, 13.0)):
            v = round(base + float(rng.integers(-100, 100)) / 100.0, 2)
            ts = pd.Timestamp(2026, 1, 1 + day, hour, 30)
            rows.append(("a", ts, v))
    if spike_at is not None:
        rows.append(("a", spike_at, 500.0))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    return spark.createDataFrame(pdf, "key string, ts timestamp, value double")


def test_seasonal_profile_recovers_planted_offset(spark):
    out = seasonal_profile(_hourly_df(spark)).toPandas().set_index("phase")
    # hour-13 offset minus hour-1 offset == the planted +8, to noise
    assert out.loc[13, "seasonal"] - out.loc[1, "seasonal"] == pytest.approx(8.0, abs=1.2)
    # offsets are deviations from the key mean: weighted sum is 0
    assert float((out["seasonal"] * out["n_obs"]).sum()) == pytest.approx(0.0, abs=1e-9)


def test_seasonal_profile_fixed_point_matches_float_path(spark):
    df = _hourly_df(spark)
    f = seasonal_profile(df).toPandas().set_index("phase")["seasonal"]
    u = seasonal_profile(df, fixed_point_scale=100).toPandas().set_index("phase")["seasonal_u6"]
    for ph in f.index:
        assert u.loc[ph] == int(np.floor(round(f.loc[ph] * 1e6, 3)))


def test_seasonal_profile_bad_period_raises(spark):
    with pytest.raises(ValueError, match="period"):
        seasonal_profile(_hourly_df(spark), period="fortnight")


def test_seasonal_anomalies_flags_planted_spike(spark):
    spike_ts = pd.Timestamp(2026, 1, 5, 13, 45)
    df = _hourly_df(spark, spike_at=spike_ts)
    out = seasonal_anomalies(df, z_thresh=3.0).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["ts"] == spike_ts
    assert out.iloc[0]["z"] > 3.0


def test_seasonal_anomalies_zero_variance_key_silent(spark):
    pdf = pd.DataFrame({
        "key": ["c"] * 10,
        "ts": pd.date_range("2026-01-01", periods=10, freq="h"),
        "value": [7.0] * 10,
    })
    df = spark.createDataFrame(pdf, "key string, ts timestamp, value double")
    assert seasonal_anomalies(df).count() == 0


def _step_df(spark, extra=()):
    rng = np.random.default_rng(9)
    n = 80
    v = np.where(np.arange(n) < 50, 10.0, 16.0) + 0.01 * rng.standard_normal(n)
    rows = [("s", pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i), float(v[i]))
            for i in range(n)]
    rows += list(extra)
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    return spark.createDataFrame(pdf, "key string, ts timestamp, value double")


def test_cusum_finds_planted_step(spark):
    out = cusum_changepoint(_step_df(spark)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    # argmax |S_i| sits at the last pre-shift observation (index 50)
    assert r["cp_idx"] == 50
    assert r["delta"] == pytest.approx(6.0, abs=0.05)
    assert r["stat"] > 1.36  # far beyond the 5% Brownian-bridge band


def test_cusum_drops_short_and_constant_keys(spark):
    extra = [("short", pd.Timestamp("2026-01-01"), 1.0)] + [
        ("flat", pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i), 3.0)
        for i in range(20)
    ]
    out = cusum_changepoint(_step_df(spark, extra=extra)).toPandas()
    assert set(out["key"]) == {"s"}


def test_cusum_delta_closed_form_matches_split_means(spark):
    df = _step_df(spark)
    out = cusum_changepoint(df).toPandas().iloc[0]
    pdf = df.toPandas().sort_values(["ts", "value"]).reset_index(drop=True)
    i = int(out["cp_idx"])
    before, after = pdf["value"][:i], pdf["value"][i:]
    assert out["delta"] == pytest.approx(after.mean() - before.mean(), rel=1e-9)
