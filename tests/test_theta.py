"""Theta method: brute-force replay parity (bit-level), trend
recovery on a planted linear series (theta == trend line when the
theta=2 line is trendless), SES anchoring, span gate."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.smoothing import theta_daily

BASE = dt.datetime(2024, 3, 1)


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _rows(key, day_counts, lo=0):
    rows = []
    for i, c in enumerate(day_counts):
        for j in range(int(c)):
            rows.append(
                (key, BASE + dt.timedelta(days=lo + i, minutes=j))
            )
    return rows


def _brute(day_counts):
    y = np.asarray(day_counts, dtype=np.int64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.int64)
    st, st2 = int(t.sum()), int((t * t).sum())
    sy, sty = int(y.sum()), int((t * y).sum())
    b = float(n * sty - st * sy) / float(n * st2 - st * st)
    a = (float(sy) - b * float(st)) / float(n)
    s = None
    for i in range(n):
        z = 2.0 * float(y[i]) - (a + b * float(i + 1))
        s = z if s is None else 0.5 * z + 0.5 * s
    fc = 0.5 * ((a + b * float(n + 1)) + s)
    return n, b, a, s, fc


def test_theta_brute_bit_parity(spark):
    rng = np.random.default_rng(2703)
    rows, keys = [], {}
    for k in range(3):
        counts = rng.integers(0, 9, 30 + 5 * k).tolist()
        keys[k] = counts
        rows += _rows(k, counts)
    got = {r["key"]: r for r in theta_daily(_df(spark, rows), key="user_id").collect()}
    for k, counts in keys.items():
        n, b, a, s, fc = _brute(counts)
        r = got[k]
        assert r["n_days"] == n
        # raw doubles: bit-for-bit, not approximately
        assert r["slope"] == b and r["intercept"] == a
        assert r["ses_last"] == s and r["theta_next"] == fc


def test_theta_recovers_pure_trend(spark):
    """y_t = 2t exactly: the theta=2 line z_t = 2t trends too, and
    SES(alpha) lags a pure trend by b(1-alpha)/alpha = b = 2 in
    steady state, so the classic-theta combination forecasts
    0.5*(2(n+1) + (2n - 2)) = 2n: one step of trend is averaged away
    — the documented conservative bias of classic theta."""
    counts = [2 * (i + 1) for i in range(20)]
    r = theta_daily(_df(spark, _rows(7, counts)), key="user_id").collect()[0]
    assert abs(r["slope"] - 2.0) < 1e-9
    assert abs(r["theta_next"] - 2.0 * 20) < 0.5


def test_theta_span_includes_empty_days_and_gate(spark):
    # 10 observed days spread over a 20-day span: zero-fill counts
    rows = _rows(3, [5] * 5) + _rows(3, [5] * 5, lo=15)
    r = theta_daily(_df(spark, rows), key="user_id").collect()[0]
    assert r["n_days"] == 20
    # short span: gated
    assert theta_daily(_df(spark, _rows(4, [3] * 5)), key="user_id").collect() == []
