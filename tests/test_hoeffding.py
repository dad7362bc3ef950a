"""Hoeffding D: brute-force parity, the non-monotone-dependence
separation kendall cannot see, independence ~ 0, monotone -> ~ 1."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.hoeffding import hoeffding_d

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _mk(key, closes):
    return [
        (key, BASE + dt.timedelta(days=i, hours=12), float(v))
        for i, v in enumerate(closes)
    ]


def _brute(closes):
    cents = [round(v * 100) for v in closes]
    xs = cents[:-1]
    ys = cents[1:]
    n = len(xs)
    order_x = sorted(range(n), key=lambda i: (xs[i], i))
    order_y = sorted(range(n), key=lambda i: (ys[i], i))
    rx = [0] * n
    ry = [0] * n
    for r, i in enumerate(order_x, 1):
        rx[i] = r
    for r, i in enumerate(order_y, 1):
        ry[i] = r
    c = [
        sum(1 for j in range(n) if rx[j] < rx[i] and ry[j] < ry[i])
        for i in range(n)
    ]
    d1 = sum(ci * (ci - 1) for ci in c)
    d2 = sum(
        (rx[i] - 1) * (rx[i] - 2) * (ry[i] - 1) * (ry[i] - 2)
        for i in range(n)
    )
    d3 = sum((rx[i] - 2) * (ry[i] - 2) * c[i] for i in range(n))
    num = (n - 2) * (n - 3) * d1 + d2 - 2.0 * (n - 2) * d3
    den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return n, d1, d2, d3, round(30.0 * num / den, 6) + 0.0


def test_hoeffding_brute_force_parity(spark):
    rng = np.random.default_rng(163)
    rows, per_key = [], {}
    for k in range(3):
        closes = [float(v) for v in np.round(rng.normal(60, 8, 30), 2)]
        per_key[f"k{k}"] = closes
        rows += _mk(f"k{k}", closes)
    got = {r["key"]: r for r in hoeffding_d(_ev(spark, rows)).collect()}
    for k, closes in per_key.items():
        n, d1, d2, d3, d = _brute(closes)
        r = got[k]
        assert (r["n_pairs"], r["d1"], r["d2"], r["d3"]) == (n, d1, d2, d3)
        assert r["hoeffding_d"] == d


def test_hoeffding_sees_nonmonotone_dependence(spark):
    """A triangle wave makes (x_t, x_{t+1}) a deterministic V-shaped
    map: Hoeffding stays large while the lag-1 relationship is
    non-monotone; iid noise scores ~ 0; a trend scores near 1."""
    rng = np.random.default_rng(167)
    tri = [50.0 + 10.0 * abs((i % 8) - 4) for i in range(64)]
    iid = [float(v) for v in np.round(rng.normal(50, 5, 64), 2)]
    mono = [50.0 + 1.0 * i for i in range(64)]
    rows = _mk("tri", tri) + _mk("iid", iid) + _mk("mono", mono)
    got = {r["key"]: r for r in hoeffding_d(_ev(spark, rows)).collect()}
    assert got["mono"]["hoeffding_d"] > 0.9
    assert got["tri"]["hoeffding_d"] > 0.1
    assert abs(got["iid"]["hoeffding_d"]) < 0.02
