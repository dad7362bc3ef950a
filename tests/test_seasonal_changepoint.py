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


def test_classical_decompose_recovers_planted_structure(spark):
    """Linear trend + daily sinusoid + nothing else: the MA trend must
    track the line (away from the ends), seasonal must match the
    sinusoid per phase, and value == trend + seasonal + resid exactly
    wherever trend is defined."""
    import numpy as np
    import pandas as pd

    from tits_spark.operators.seasonal import classical_decompose

    hours = 24 * 14
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(hours), unit="h")
    phase = np.arange(hours) % 24
    seasonal = 5.0 * np.sin(2 * np.pi * phase / 24)
    value = 100.0 + 0.1 * np.arange(hours) + seasonal
    pdf = pd.DataFrame({"key": 1, "bucket_ts": ts, "value": value})
    df = spark.createDataFrame(pdf, "key long, bucket_ts timestamp, value double")

    out = (
        classical_decompose(df, "key", "bucket_ts", "value", period=24)
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    # ends have no full window
    assert out["trend"].iloc[:12].isna().all()
    assert out["trend"].iloc[-12:].isna().all()
    mid = out.iloc[12:-12]
    # a centered 2x24 MA of (line + sinusoid) is the line exactly
    want_line = 100.0 + 0.1 * np.arange(hours)[12:-12]
    np.testing.assert_allclose(mid["trend"], want_line, atol=1e-5)
    # seasonal index per phase matches the planted sinusoid
    got_seas = mid.assign(ph=np.arange(12, hours - 12) % 24).groupby("ph")[
        "seasonal"
    ].first()
    want_seas = 5.0 * np.sin(2 * np.pi * np.arange(24) / 24)
    want_seas = want_seas - want_seas.mean()
    np.testing.assert_allclose(
        got_seas.sort_index(), want_seas, atol=1e-3
    )
    # additive identity holds exactly where trend is defined
    np.testing.assert_allclose(
        mid["trend"] + mid["seasonal"] + mid["resid"], mid["value"], atol=1e-9
    )


def test_classical_decompose_rejects_bad_period(spark, events):
    import pytest as _pytest

    from pyspark.sql import functions as F

    from tits_spark.operators.seasonal import classical_decompose

    df = events.select(F.col("user_id").alias("key"), F.col("ts").alias("bucket_ts"),
                       "value")
    with _pytest.raises(ValueError, match="period"):
        classical_decompose(df, period=1)


def test_deseasonalized_outliers_flag_planted_spike(spark):
    """A clean daily pattern with two injected spikes: the outliers
    must be exactly the spiked timestamps, and the seasonal swing
    itself must NOT trip the detector."""
    import numpy as np
    import pandas as pd

    from tits_spark.operators.seasonal import (
        classical_decompose,
        deseasonalized_outliers,
    )

    hours = 24 * 10
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(hours), unit="h")
    rng = np.random.default_rng(12)
    v = (
        100.0
        + 10.0 * np.sin(2 * np.pi * (np.arange(hours) % 24) / 24)
        + rng.normal(0, 2.0, hours)
    )
    # the spike leaks spike/period into neighbouring trends and
    # spike/n_days into its own phase's seasonal index; keep both
    # leaks well under the 3.5-sigma threshold (noise sd 2) while the
    # spike itself stays unmissable
    spikes = [60, 170]
    v[spikes] += 30.0
    df = spark.createDataFrame(
        pd.DataFrame({"key": 1, "bucket_ts": ts, "value": v}),
        "key long, bucket_ts timestamp, value double",
    )
    dec = classical_decompose(df, "key", "bucket_ts", "value", period=24)
    out = deseasonalized_outliers(dec, "key", z_thresh=3.5).toPandas()
    got_idx = sorted(
        (pd.to_datetime(out["bucket_ts"]) - ts[0]).dt.total_seconds() // 3600
    )
    assert got_idx == spikes


def test_seasonal_strength_high_for_sinusoid_low_for_noise(spark):
    import numpy as np
    import pandas as pd
    import tempfile
    from pyspark.sql import functions as F

    import __spark_entry__ as E

    rng = np.random.default_rng(51)
    hours = 24 * 14
    ts0 = pd.Timestamp("2026-01-01")
    rows = []
    for uid, series in (
        (1, 100 + 20 * np.sin(2 * np.pi * (np.arange(hours) % 24) / 24)
            + rng.normal(0, 0.5, hours)),       # strongly daily
        (2, 100 + rng.normal(0, 5.0, hours)),   # pure noise
    ):
        for i, v in enumerate(series):
            rows.append((uid, i, ts0 + pd.Timedelta(hours=i), round(float(v), 2)))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    pdf["event_type"] = "x"
    pdf["props"] = ""
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["key"]: r["f_seasonal"] for r in E.q_seasonal_strength(spark, d).collect()}
    assert out[1] > 0.95
    assert out[2] < 0.3


def test_seasonal_peak_finds_planted_phase(spark):
    import numpy as np
    import pandas as pd
    import tempfile

    import __spark_entry__ as E

    rng = np.random.default_rng(81)
    hours = 24 * 14
    ts0 = pd.Timestamp("2026-01-01")
    # peak at hour 15, trough at hour 3 (sin peaks at phase/24 = 0.25)
    phase = (np.arange(hours) - 9) % 24
    v = 100 + 20 * np.sin(2 * np.pi * phase / 24) + rng.normal(0, 0.2, hours)
    pdf = pd.DataFrame({
        "user_id": 1,
        "event_id": np.arange(hours),
        "ts": ts0 + pd.to_timedelta(np.arange(hours), unit="h"),
        "event_type": "x",
        "value": np.round(v, 2),
        "props": "",
    })
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/events.parquet")
    row = E.q_seasonal_peak(spark, d).collect()[0]
    assert row["peak_hour"] == 15
    assert row["trough_hour"] == 3
    assert 30 < row["amplitude"] < 45  # ~2*20 minus estimation noise
    assert row["n_phases"] == 24
