"""KPSS: numpy brute-force parity on the LOCF grid, planted
random-walk vs white-noise separation, constant-series NULL, and the
min_obs drop rule."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.kpss import kpss_level

BASE = dt.datetime(2024, 1, 1)
HOUR = 3600


def _rows(key, cents_by_hour):
    return [
        (key, BASE + dt.timedelta(hours=int(h)), float(c) / 100.0)
        for h, c in cents_by_hour
    ]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(cents, L=8):
    """KPSS eta over an already-gridded integer cents series."""
    x = np.asarray(cents, dtype=np.float64)
    n = x.size
    e = x - x.mean()
    s = np.cumsum(e)
    gamma = [float((e[j:] * e[:n - j]).sum()) / n if j else float((e * e).sum()) / n
             for j in range(L + 1)]
    s2 = gamma[0] + 2.0 * sum(
        (1.0 - j / (L + 1)) * gamma[j] for j in range(1, L + 1)
    )
    if s2 <= 0:
        return None
    return float((s * s).sum()) / (n * n * s2)


def test_brute_force_parity(spark):
    rng = np.random.default_rng(7)
    cents = rng.integers(100, 5000, size=60)
    rows = _rows("a", list(enumerate(cents)))
    out = kpss_level(_mk(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_grid"] == 60
    want = _brute(cents)
    assert abs(r["eta"] - want) < 1e-6
    assert abs(r["gamma0"] - np.var(np.asarray(cents, dtype=np.float64))) < 0.01


def test_locf_grid_fills_gaps(spark):
    # ticks at hours 0,1,2,10 -> grid LOCF-fills 3..9 with the hour-2
    # value; brute force over the filled series must match
    cents = {0: 1000, 1: 3000, 2: 2000, 10: 4000}
    rows = _rows("a", list(cents.items()))
    # pad to satisfy min_obs=30: hours 11..36 alternating
    for h in range(11, 37):
        cents[h] = 1500 + 700 * (h % 3)
        rows += _rows("a", [(h, cents[h])])
    filled = []
    last = None
    for h in range(0, 37):
        if h in cents:
            last = cents[h]
        filled.append(last)
    out = kpss_level(_mk(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n_grid"] == 37
    assert abs(out[0]["eta"] - _brute(filled)) < 1e-6


def test_random_walk_vs_stationary(spark):
    rng = np.random.default_rng(3)
    steps = rng.integers(-300, 301, size=200)
    walk = 100000 + np.cumsum(steps)
    noise = 5000 + rng.integers(-300, 301, size=200)
    rows = _rows("walk", list(enumerate(walk))) + _rows(
        "flat", list(enumerate(noise))
    )
    out = {r["key"]: r for r in kpss_level(_mk(spark, rows)).collect()}
    # the walk's partial sums blow up; white noise stays far below the
    # 5% critical value region
    assert out["walk"]["eta"] > 3 * out["flat"]["eta"]
    assert out["flat"]["eta"] < 0.463


def test_constant_series_null_and_min_obs(spark):
    rows = _rows("const", [(h, 500) for h in range(40)])
    rows += _rows("short", [(h, 100 * (h + 1)) for h in range(10)])
    out = {r["key"]: r for r in kpss_level(_mk(spark, rows)).collect()}
    assert set(out) == {"const"}  # short key dropped by min_obs
    assert out["const"]["eta"] is None
    assert out["const"]["s2_lrv"] is None
    assert out["const"]["gamma0"] == 0.0


def _brute_lors(cents, L=8):
    x = np.asarray(cents, dtype=np.float64)
    n = x.size
    e = x - x.mean()
    s = np.cumsum(e)
    g = [float((e[j:] * e[:n - j]).sum()) / n if j else float((e * e).sum()) / n
         for j in range(L + 1)]
    s2 = g[0] + 2.0 * sum((1.0 - j / (L + 1)) * g[j] for j in range(1, L + 1))
    if s2 <= 0:
        return None, None
    r = float(s.max() - s.min())
    return r, r / (np.sqrt(n) * np.sqrt(s2))


def test_lo_rs_brute_force_parity(spark):
    from tits_spark.operators.kpss import lo_modified_rs

    rng = np.random.default_rng(41)
    cents = rng.integers(100, 5000, size=80)
    out = lo_modified_rs(_mk(spark, _rows("a", list(enumerate(cents))))).collect()
    assert len(out) == 1
    r, v = _brute_lors(cents)
    got = out[0]
    assert got["n_grid"] == 80
    # r_range is the n-scaled exact integer: n * R
    assert got["r_range"] == round(80 * r)
    assert abs(got["v_stat"] - v) < 1e-6


def test_lo_rs_walk_vs_noise(spark):
    from tits_spark.operators.kpss import lo_modified_rs

    rng = np.random.default_rng(3)
    steps = rng.integers(-300, 301, size=200)
    walk = 100000 + np.cumsum(steps)
    noise = 5000 + rng.integers(-300, 301, size=200)
    rows = _rows("walk", list(enumerate(walk))) + _rows(
        "flat", list(enumerate(noise))
    )
    out = {r["key"]: r for r in lo_modified_rs(_mk(spark, rows)).collect()}
    # long-memory-like wandering blows the range past the null band;
    # white noise stays inside [0.809, 1.862]
    assert out["walk"]["v_stat"] > 1.862
    assert 0.809 < out["flat"]["v_stat"] < 1.862


def test_lo_rs_constant_null_and_fixed_l(spark):
    import pytest

    from tits_spark.operators.kpss import lo_modified_rs

    rows = _rows("const", [(h, 500) for h in range(40)])
    out = lo_modified_rs(_mk(spark, rows)).collect()
    assert out[0]["v_stat"] is None and out[0]["r_range"] == 0
    with pytest.raises(ValueError):
        lo_modified_rs(_mk(spark, rows), n_lags=4)
