"""Chow test: brute-force OLS parity, planted regime break vs stable
trend, flat-series pole."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.chow import chow_test

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _sse(t, c):
    t = np.asarray(t, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    n = len(t)
    sxx = n * (t * t).sum() - t.sum() ** 2
    syy = n * (c * c).sum() - c.sum() ** 2
    sxy = n * (t * c).sum() - t.sum() * c.sum()
    return (sxx * syy - sxy * sxy) / (n * sxx)


def _brute(cents):
    n = len(cents)
    t = np.arange(1, n + 1)
    n1 = n // 2
    sse_p = _sse(t, cents)
    sse_1 = _sse(t[:n1], cents[:n1])
    sse_2 = _sse(t[n1:], cents[n1:])
    num = (sse_p - sse_1 - sse_2) / 2.0
    den = (sse_1 + sse_2) / (n - 4)
    f = round(num / den, 6) + 0.0 if den > 0 else None
    return sse_p, sse_1, sse_2, f


def test_chow_brute_force_parity(spark):
    rng = np.random.default_rng(131)
    rows, per_key = [], {}
    for k in range(2):
        vals = [float(v) for v in np.round(rng.normal(70, 5, 100), 2)]
        per_key[f"k{k}"] = [round(v * 100) for v in vals]
        rows += [
            (f"k{k}", BASE + dt.timedelta(hours=i), v)
            for i, v in enumerate(vals)
        ]
    got = {r["key"]: r for r in chow_test(_ev(spark, rows)).collect()}
    for k, cents in per_key.items():
        sse_p, sse_1, sse_2, f = _brute(cents)
        r = got[k]
        assert (r["n_grid"], r["n1"], r["n2"]) == (100, 50, 50)
        # numpy float sums vs the exact-decimal path: compare to the
        # emitted 2dp lattice within one quantum
        assert abs(r["sse_p"] - sse_p) < 0.02 + 1e-6 * sse_p
        assert abs(r["sse1"] - sse_1) < 0.02 + 1e-6 * sse_1
        assert r["f_chow"] is not None
        assert abs(r["f_chow"] - f) < 1e-3


def test_chow_detects_regime_break(spark):
    """First half flat at 50, second half steep trend: F explodes;
    one stable trend throughout: F stays small."""
    rng = np.random.default_rng(137)
    noise = np.round(rng.normal(0, 0.3, 120), 2)
    broken = [50.0 + float(noise[i]) for i in range(60)] + [
        50.0 + 2.0 * i + float(noise[60 + i]) for i in range(60)
    ]
    stable = [30.0 + 1.0 * i + float(noise[i]) for i in range(120)]
    rows = []
    for key, vals in (("brk", broken), ("stb", stable)):
        rows += [
            (key, BASE + dt.timedelta(hours=i), v)
            for i, v in enumerate(vals)
        ]
    got = {r["key"]: r for r in chow_test(_ev(spark, rows)).collect()}
    assert got["brk"]["f_chow"] > 100.0
    assert got["stb"]["f_chow"] < 10.0


def test_chow_flat_series_pole(spark):
    rows = [
        ("flat", BASE + dt.timedelta(hours=i), 42.0) for i in range(60)
    ]
    r = chow_test(_ev(spark, rows)).collect()[0]
    assert (r["sse1"], r["sse2"], r["sse_p"]) == (0.0, 0.0, 0.0)
    assert r["f_chow"] is None
