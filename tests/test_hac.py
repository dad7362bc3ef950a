"""Newey-West trend inference: numpy brute-force parity on the exact
quantized-residual definition, the planted-autocorrelation case where
NW widens the naive OLS band, and degenerate NULLs."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.hac import newey_west_trend

BASE = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )


def _brute_nw(cents, n_lags=8):
    """cents: int64 array, one value per hourly bucket (regular grid,
    so the LOCF grid equals the input). Mirrors the operator's exact
    integer + cent-quantized-residual definition."""
    c = np.asarray(cents, dtype=object)
    n = len(c)
    t = np.arange(1, n + 1, dtype=object)
    tt = n * (n + 1) // 2
    st2 = sum(int(x) * int(x) for x in t)
    tc = sum(int(x) for x in c)
    stc = sum(int(a) * int(b) for a, b in zip(t, c))
    sxx = n * st2 - tt * tt
    sxy = n * stc - tt * tc
    eq = np.array(
        [
            math.floor(
                float(sxx * (n * int(ci) - tc) - sxy * (n * int(ti) - tt))
                / float(n * sxx)
            )
            for ti, ci in zip(t, c)
        ],
        dtype=object,
    )
    h = np.array(
        [(n * int(ti) - tt) * int(e) for ti, e in zip(t, eq)], dtype=object
    )
    lp1 = n_lags + 1
    g0 = sum(int(x) * int(x) for x in h)
    gw = 0
    for i in range(n):
        wl = 0
        for j in range(1, n_lags + 1):
            if i - j >= 0:
                wl += 2 * (lp1 - j) * int(h[i - j])
        gw += int(h[i]) * wl
    slrv = lp1 * g0 + gw
    slope = sxy / sxx / 100.0
    if slrv <= 0:
        return n, round(slope, 6), None, None
    se = math.sqrt(slrv / lp1) / sxx / 100.0
    tstat = sxy * math.sqrt(lp1 / slrv)
    return n, round(slope, 6) + 0.0, round(se, 6) + 0.0, \
        round(tstat, 6) + 0.0


def _rows(key, cents):
    return [
        (key, BASE + dt.timedelta(hours=i), c / 100.0)
        for i, c in enumerate(cents)
    ]


def test_nw_brute_force_parity(spark):
    rng = np.random.default_rng(31)
    rows, per_key = [], {}
    for k in range(3):
        # trend + AR-ish wobble, all integer cents
        base = rng.integers(500, 2000)
        cents = []
        acc = 0
        for i in range(60):
            acc = int(0.7 * acc) + int(rng.integers(-40, 41))
            cents.append(int(base + 3 * i + acc))
        per_key[f"k{k}"] = cents
        rows += _rows(f"k{k}", cents)
    got = {r["key"]: r for r in newey_west_trend(_mk(spark, rows)).collect()}
    for k, cents in per_key.items():
        n, slope, se, tstat = _brute_nw(cents)
        assert got[k]["n_grid"] == n
        assert got[k]["slope"] == slope
        assert got[k]["se_nw"] == se
        assert got[k]["t_nw"] == tstat


def test_nw_widens_band_under_positive_autocorrelation(spark):
    """A slow sine rides the trend: residuals are strongly positively
    autocorrelated, so the NW standard error must exceed the naive
    iid OLS standard error computed from the same quantized lattice."""
    n = 120
    cents = [
        int(1000 + 12 * i + 300 * math.sin(2 * math.pi * i / 40))
        for i in range(n)
    ]
    got = newey_west_trend(_mk(spark, _rows("ar", cents))).collect()[0]
    # naive iid se on the same cent-quantized residuals
    nn, _, _, _ = _brute_nw(cents)
    c = np.array(cents, dtype=np.int64)
    t = np.arange(1, n + 1)
    tt, tc = n * (n + 1) // 2, int(c.sum())
    sxx = n * int((t * t).sum()) - tt * tt
    sxy = n * int((t * c).sum()) - tt * tc
    eq = np.floor(
        (sxx * (n * c - tc) - sxy * (n * t - tt)).astype(float)
        / float(n * sxx)
    )
    s2 = float((eq * eq).sum()) / (n - 2)
    se_iid = math.sqrt(s2 * n / sxx) / 100.0
    assert got["se_nw"] > 2.0 * se_iid
    # the trend is still real: t stays significant
    assert got["t_nw"] > 2.0


def test_nw_flat_series_is_null(spark):
    cents = [700] * 50
    got = newey_west_trend(_mk(spark, _rows("flat", cents))).collect()[0]
    assert got["slope"] == 0.0
    assert got["se_nw"] is None and got["t_nw"] is None


def test_nw_min_obs_drops_short_keys(spark):
    rows = _rows("short", [100 + i for i in range(20)])
    assert newey_west_trend(_mk(spark, rows)).count() == 0
