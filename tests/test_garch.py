"""GARCH(1,1) filter: brute-force recursion parity, planted
volatility-burst response, zero-variance drop, min_returns drop."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.garch import garch_filter

BASE = dt.datetime(2024, 1, 1)
A, B = 0.0625, 0.875


def _rows(key, cents):
    return [
        (key, BASE + dt.timedelta(minutes=i), float(c) / 100.0)
        for i, c in enumerate(cents)
    ]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(cents):
    c = np.asarray(cents, dtype=np.int64)
    r = np.diff(c)
    n = r.size
    sr, srr = int(r.sum()), int((r * r).sum())
    var0 = float(n * srr - sr * sr) / float(n * (n - 1))
    om = var0 * A
    s = var0
    z2 = 0.0
    for i in range(n):
        rr = float(int(r[i]) * int(r[i]))
        z2 = z2 + rr / s
        if i < n - 1:
            s = om + A * rr + B * s
    return var0, s, z2 / n


def test_brute_force_parity(spark):
    rng = np.random.default_rng(71)
    cents = 50000 + np.cumsum(rng.integers(-400, 401, size=60))
    out = garch_filter(_mk(spark, _rows("a", cents))).collect()
    assert len(out) == 1
    var0, s, z2m = _brute(cents)
    r = out[0]
    assert r["n_ret"] == 59
    assert abs(r["var0"] - var0) < 0.01
    assert abs(r["s_last"] - s) < 0.01
    assert abs(r["z2_mean"] - z2m) < 1e-6


def test_volatility_burst_raises_s_last(spark):
    rng = np.random.default_rng(73)
    calm = rng.integers(-50, 51, size=80)
    burst = np.concatenate([calm[:60], rng.integers(-2000, 2001, size=20)])
    quiet = 50000 + np.cumsum(calm)
    stormy = 50000 + np.cumsum(burst)
    out = {
        r["key"]: r
        for r in garch_filter(
            _mk(spark, _rows("q", quiet) + _rows("s", stormy))
        ).collect()
    }
    # the filter tracks the late burst: conditional variance far above
    # the quiet key's AND above the stormy key's own unconditional var0
    # (the filter reacts to WHERE the variance is, not just how much)
    assert out["s"]["s_last"] > 20 * out["q"]["s_last"]
    assert out["s"]["s_last"] > 2 * out["s"]["var0"]
    assert abs(out["q"]["z2_mean"] - 1.0) < 0.1  # calibrated on iid


def test_constant_and_short_drop(spark):
    rows = _rows("const", [500] * 40)  # zero return variance
    rows += _rows("short", range(100, 110))
    assert garch_filter(_mk(spark, rows)).count() == 0
