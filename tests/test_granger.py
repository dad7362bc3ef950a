from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.granger import granger_1lag

BASE = dt.datetime(2024, 1, 1)
HOUR = 3600.0


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, series string"
    )


def _t(sec):
    return BASE + dt.timedelta(seconds=float(sec))


def _brute_granger(y, a, x):
    """Reference: the same restricted-vs-unrestricted OLS F-test via
    exact integer centered moments (the formula the operator builds)."""
    n = len(y)
    y = [int(round(v * 100)) for v in y]
    a = [int(round(v * 100)) for v in a]
    x = [int(round(v * 100)) for v in x]
    s = lambda u: sum(u)  # noqa: E731
    sp = lambda u, v: sum(ui * vi for ui, vi in zip(u, v))  # noqa: E731
    maa = n * sp(a, a) - s(a) * s(a)
    mxx = n * sp(x, x) - s(x) * s(x)
    mab = n * sp(a, x) - s(a) * s(x)
    may = n * sp(a, y) - s(a) * s(y)
    mxy = n * sp(x, y) - s(x) * s(y)
    myy = n * sp(y, y) - s(y) * s(y)
    det = float(maa) * mxx - float(mab) * mab
    b_ar = c_x = f_stat = None
    if maa > 0:
        b_ar = round(float(may) / maa, 6) + 0.0
    if det > 0:
        c_x = round((float(maa) * mxy - float(mab) * may) / det, 6) + 0.0
        rss_r = float(myy) - float(may) * may / maa
        rss_u = float(myy) - (
            float(mxx) * may * may
            - 2.0 * float(mab) * may * mxy
            + float(maa) * mxy * mxy
        ) / det
        if maa > 0 and rss_u > 0:
            f_stat = round((rss_r - rss_u) * (n - 3.0) / rss_u, 6) + 0.0
    return n, b_ar, c_x, f_stat


def test_granger_planted_causality(spark):
    """x drives y with one bucket of delay: y_t = 0.9 * x_{t-1} + noise.
    The x->y F statistic must dwarf the placebo key where x is an
    independent walk."""
    rng = np.random.default_rng(7)
    n = 120
    rows = []
    # causal key: one tick per hour on both sides, y lags x
    x = rng.normal(100, 10, n).round(2)
    y = np.empty(n)
    y[0] = 50.0
    for i in range(1, n):
        y[i] = round(0.9 * x[i - 1] - 40 + rng.normal(0, 0.5), 2)
    for i in range(n):
        rows.append(("causal", _t(i * HOUR + 60), float(x[i]), "x"))
        rows.append(("causal", _t(i * HOUR + 120), float(y[i]), "y"))
    # placebo key: independent walks
    xp = rng.normal(100, 10, n).round(2)
    yp = np.cumsum(rng.normal(0, 1, n)).round(2) + 50
    for i in range(n):
        rows.append(("placebo", _t(i * HOUR + 60), float(xp[i]), "x"))
        rows.append(("placebo", _t(i * HOUR + 120), float(yp[i]), "y"))

    out = {
        r["key"]: r
        for r in granger_1lag(_mk(spark, rows)).collect()
    }
    assert out["causal"]["f_stat"] > 1000.0
    assert out["placebo"]["f_stat"] < 10.0
    # planted cross coefficient recovered (grid alignment is exact:
    # x at :01 and y at :02 land in the same hourly bucket)
    assert abs(out["causal"]["c_x"] - 0.9) < 0.05


def test_granger_matches_bruteforce_exactly(spark):
    """Random irregular two-sided series: the operator's (b, c, F)
    must equal the brute-force exact-moment OLS bit for bit after the
    same LOCF-grid construction."""
    rng = np.random.default_rng(23)
    rows = []
    expect = {}
    for k in range(5):
        nx, ny = rng.integers(6, 60, 2)
        xt = np.sort(rng.uniform(0, 80 * HOUR, nx))
        yt = np.sort(rng.uniform(0, 80 * HOUR, ny))
        xv = rng.normal(100, 15, nx).round(2)
        yv = rng.normal(50, 8, ny).round(2)
        key = f"k{k}"
        rows += [(key, _t(t), float(v), "x") for t, v in zip(xt, xv)]
        rows += [(key, _t(t), float(v), "y") for t, v in zip(yt, yv)]
        # rebuild the LOCF bucket grid exactly as the operator defines
        # it: last tick per (side, bucket), joint span, LOCF both sides
        bx, by = {}, {}
        for t, v in zip(xt, xv):
            bx[int(t // HOUR)] = v  # sorted -> last write wins
        for t, v in zip(yt, yv):
            by[int(t // HOUR)] = v
        lo = min(min(bx), min(by))
        hi = max(max(bx), max(by))
        grid = []
        cx = cy = None
        for b in range(lo, hi + 1):
            cx = bx.get(b, cx)
            cy = by.get(b, cy)
            grid.append((cx, cy))
        trip = [
            (grid[i][1], grid[i - 1][1], grid[i - 1][0])
            for i in range(1, len(grid))
            if grid[i][1] is not None
            and grid[i - 1][1] is not None
            and grid[i - 1][0] is not None
        ]
        if len(trip) >= 4:
            expect[key] = _brute_granger(*zip(*trip))

    got = {r["key"]: r for r in granger_1lag(_mk(spark, rows)).collect()}
    assert set(got) == set(expect)
    for k, (n, b_ar, c_x, f_stat) in expect.items():
        assert got[k]["n_obs"] == n
        assert got[k]["b_ar"] == b_ar, k
        assert got[k]["c_x"] == c_x, k
        assert got[k]["f_stat"] == f_stat, k


def test_granger_degenerate_constant_returns_null(spark):
    """Constant y (maa == 0) and collinear x (det == 0) must yield
    NULL stats, not NaN/Inf."""
    rows = []
    for i in range(10):
        rows.append(("const_y", _t(i * HOUR), 5.0, "y"))
        rows.append(("const_y", _t(i * HOUR), float(i), "x"))
        # x identical to lagged y -> det == 0
        rows.append(("collin", _t(i * HOUR), float(i * 2), "y"))
        rows.append(("collin", _t(i * HOUR), float(i * 2), "x"))
    got = {r["key"]: r for r in granger_1lag(_mk(spark, rows)).collect()}
    assert got["const_y"]["b_ar"] is None
    assert got["const_y"]["f_stat"] is None
    assert got["collin"]["c_x"] is None
    assert got["collin"]["f_stat"] is None
