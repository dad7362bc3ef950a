from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.cointegration import engle_granger

BASE = dt.datetime(2024, 1, 1)
HOUR = 3600.0


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, series string"
    )


def _t(sec):
    return BASE + dt.timedelta(seconds=float(sec))


def _brute_eg(gx, gy):
    """Independent path: explicit float residuals from the exact-int
    OLS, then the no-intercept DF regression — the algebra the
    operator performs via moment expansion."""
    res = [(x, y) for x, y in zip(gx, gy) if x is not None and y is not None]
    n = len(res)
    sx = sum(x for x, _ in res)
    sy = sum(y for _, y in res)
    sxx = sum(x * x for x, _ in res)
    sxy = sum(x * y for x, y in res)
    mxx = float(n * sxx - sx * sx)
    if mxx <= 0:
        return None
    b = float(n * sxy - sx * sy) / mxx
    a = (float(sy) - b * float(sx)) / float(n)
    e = {
        i: y - a - b * x
        for i, (x, y) in enumerate(zip(gx, gy))
        if x is not None and y is not None
    }
    pairs = [(e[i - 1], e[i]) for i in e if (i - 1) in e]
    n_p = len(pairs)
    if n_p < 8:
        return None
    s11 = sum(e1 * e1 for e1, _ in pairs)
    s01 = sum(e1 * e0 for e1, e0 in pairs)
    s00 = sum(e0 * e0 for _, e0 in pairs)
    if s11 <= 0:
        return None
    gm = (s01 - s11) / s11
    sse = (s00 - 2 * s01 + s11) - gm * gm * s11
    t = gm / math.sqrt((sse / (n_p - 1)) / s11) if sse > 0 else None
    return n, n_p, b, a, gm, t


def _grid(xt, xv, yt, yv):
    bx, by = {}, {}
    for t, v in zip(xt, xv):
        bx[int(t // HOUR)] = int(round(v * 100))
    for t, v in zip(yt, yv):
        by[int(t // HOUR)] = int(round(v * 100))
    lo, hi = min(min(bx), min(by)), max(max(bx), max(by))
    gx, gy, cx, cy = [], [], None, None
    for b in range(lo, hi + 1):
        cx = bx.get(b, cx)
        cy = by.get(b, cy)
        gx.append(cx)
        gy.append(cy)
    return gx, gy


def test_eg_planted_cointegration(spark):
    """y = 2x + stationary noise is cointegrated (df_t strongly
    negative, beta ~ 2); two independent random walks are not (df_t
    near zero)."""
    rng = np.random.default_rng(3)
    n = 300
    rows = []
    x = np.cumsum(rng.normal(0, 1, n)) + 100
    y = 2.0 * x + rng.normal(0, 0.5, n) - 40
    for i in range(n):
        rows.append(("coint", _t(i * HOUR + 60), float(round(x[i], 2)), "x"))
        rows.append(("coint", _t(i * HOUR + 120), float(round(y[i], 2)), "y"))
    xi = np.cumsum(rng.normal(0, 1, n)) + 100
    yi = np.cumsum(rng.normal(0, 1, n)) + 50
    for i in range(n):
        rows.append(("walks", _t(i * HOUR + 60), float(round(xi[i], 2)), "x"))
        rows.append(("walks", _t(i * HOUR + 120), float(round(yi[i], 2)), "y"))

    out = {r["key"]: r for r in engle_granger(_mk(spark, rows)).collect()}
    assert abs(out["coint"]["beta"] - 2.0) < 0.05
    assert out["coint"]["df_t"] < -8.0  # residuals revert hard
    assert out["walks"]["df_t"] > -3.0  # no rejection for the placebo


def test_eg_matches_bruteforce(spark):
    """Random irregular two-sided series: operator == the explicit
    float-residual path to 6dp (the moment expansion is algebraically
    identical; tiny float differences vanish at round 6)."""
    rng = np.random.default_rng(41)
    rows = []
    expect = {}
    for k in range(5):
        nx, ny = rng.integers(20, 80, 2)
        xt = np.sort(rng.uniform(0, 90 * HOUR, nx))
        yt = np.sort(rng.uniform(0, 90 * HOUR, ny))
        xv = rng.normal(100, 15, nx).round(2)
        yv = rng.normal(50, 8, ny).round(2)
        key = f"k{k}"
        rows += [(key, _t(t), float(v), "x") for t, v in zip(xt, xv)]
        rows += [(key, _t(t), float(v), "y") for t, v in zip(yt, yv)]
        got = _brute_eg(*_grid(xt, xv, yt, yv))
        if got is not None:
            expect[key] = got

    got = {r["key"]: r for r in engle_granger(_mk(spark, rows)).collect()}
    assert set(got) == set(expect)
    for k, (n, n_p, b, a, gm, t) in expect.items():
        assert got[k]["n_obs"] == n, k
        assert got[k]["n_pairs"] == n_p, k
        assert abs(got[k]["beta"] - round(b, 6)) <= 2e-6, k
        assert abs(got[k]["alpha"] - round(a, 6)) <= 2e-6, k
        assert abs(got[k]["gamma"] - round(gm, 6)) <= 2e-6, k
        if t is not None:
            assert abs(got[k]["df_t"] - round(t, 6)) <= 2e-5, k


def test_eg_degenerate_constant_x_null(spark):
    rows = []
    for i in range(20):
        rows.append(("cx", _t(i * HOUR), 5.0, "x"))
        rows.append(("cx", _t(i * HOUR), float(i), "y"))
    out = {r["key"]: r for r in engle_granger(_mk(spark, rows)).collect()}
    assert out["cx"]["beta"] is None
    assert out["cx"]["df_t"] is None
