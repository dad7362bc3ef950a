"""Holt level/trend smoothing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tits_spark.operators.smoothing import holt_by_key, holt_forecast


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    return spark.createDataFrame(pdf, "key string, ts timestamp, value double")


def _naive(x, a=0.5, b_=0.3):
    lev, trd = [x[0]], [x[1] - x[0]]
    for i in range(1, len(x)):
        ln = a * x[i] + (1 - a) * (lev[-1] + trd[-1])
        trd.append(b_ * (ln - lev[-1]) + (1 - b_) * trd[-1])
        lev.append(ln)
    return np.array(lev), np.array(trd)


def test_holt_matches_naive_bitexact(spark):
    rng = np.random.default_rng(2)
    rows = []
    base = pd.Timestamp("2026-03-01")
    series = {}
    for k in ("a", "b"):
        x = np.round(rng.normal(50, 10, 40), 2)
        series[k] = x
        rows += [(k, base + pd.Timedelta(minutes=i), float(v)) for i, v in enumerate(x)]
    out = holt_by_key(_df(spark, rows)).toPandas().sort_values(["key", "ts"])
    for k, x in series.items():
        lev, trd = _naive(x)
        sub = out[out["key"] == k]
        assert np.array_equal(sub["level"].to_numpy(), lev)  # bit-exact
        assert np.array_equal(sub["trend"].to_numpy(), trd)


def test_holt_drops_single_point_keys(spark):
    base = pd.Timestamp("2026-03-01")
    rows = [("solo", base, 1.0)] + [
        ("pair", base + pd.Timedelta(minutes=i), float(i)) for i in range(2)
    ]
    out = holt_by_key(_df(spark, rows)).toPandas()
    assert set(out["key"]) == {"pair"}


def test_holt_forecast_extrapolates_linear_series(spark):
    base = pd.Timestamp("2026-03-01")
    rows = [("lin", base + pd.Timedelta(hours=i), 3.0 + 2.0 * i) for i in range(30)]
    sm = holt_by_key(_df(spark, rows))
    fc = holt_forecast(sm, horizon=3).toPandas()
    # on exactly linear data Holt locks to the line: y_29 = 61, +3 steps = 67
    assert fc.iloc[0]["forecast"] == pytest.approx(67.0, abs=1e-6)


def test_macd_matches_pandas_ewm_on_regular_grid(spark):
    """On a regular grid, time-decay MACD with tau = -delta/ln(1-alpha)
    equals pandas ewm(alpha, adjust=True) MACD."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from tits_spark.operators.smoothing import macd_irregular

    rng = np.random.default_rng(9)
    n = 300
    delta = 3600.0
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(n) * 3600, unit="s")
    v = np.cumsum(rng.normal(0, 1, n)) + 50
    pdf = pd.DataFrame({"key": "a", "ts": ts, "value": v})
    df = spark.createDataFrame(pdf, "key string, ts timestamp, value double")

    a_fast, a_slow, a_sig = 2 / 13, 2 / 27, 2 / 10
    tau = lambda a: -delta / np.log(1 - a)  # noqa: E731
    got = (
        macd_irregular(df, tau_fast=tau(a_fast), tau_slow=tau(a_slow),
                       tau_signal=tau(a_sig))
        .orderBy("ts")
        .toPandas()
    )
    s = pd.Series(v)
    macd = (s.ewm(alpha=a_fast, adjust=True).mean()
            - s.ewm(alpha=a_slow, adjust=True).mean())
    signal = macd.ewm(alpha=a_sig, adjust=True).mean()
    np.testing.assert_allclose(got["macd"], macd, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(got["signal"], signal, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(got["hist"], macd - signal, rtol=1e-9, atol=1e-9)


def test_holt_winters_recovers_planted_seasonality(spark):
    """HW on a clean level+trend+period-4 seasonal signal: one-step
    fitted values converge to the truth; the seasonal state locks on."""
    import numpy as np
    import pandas as pd

    from tits_spark.operators.smoothing import holt_winters

    n, p = 80, 4
    t = np.arange(n)
    season = np.array([3.0, -1.0, -2.5, 0.5])
    x = 50.0 + 0.8 * t + season[t % p]
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(t, unit="h")
    df = spark.createDataFrame(
        pd.DataFrame({"key": "k", "ts": ts, "value": x}),
        "key string, ts timestamp, value double",
    )
    out = (
        holt_winters(df, alpha=0.5, beta=0.3, gamma=0.4, period=p)
        .orderBy("idx")
        .toPandas()
    )
    assert len(out) == n - p
    tail = out.tail(20)
    np.testing.assert_allclose(
        tail["fitted"].to_numpy(), tail["value"].to_numpy(), atol=0.05
    )
    np.testing.assert_allclose(tail["trend"].to_numpy(), 0.8, atol=0.02)


def test_holt_winters_short_keys_dropped(spark, events):
    from pyspark.sql import functions as F

    from tits_spark.operators.smoothing import holt_winters

    df = events.select(F.col("user_id").alias("key"), "ts", "value")
    out = holt_winters(df, period=4)
    counts = df.where(F.col("value").isNotNull()).groupBy("key").count().toPandas()
    short = set(counts[counts["count"] < 8]["key"])
    got_keys = {r["key"] for r in out.select("key").distinct().collect()}
    assert not (got_keys & short)
