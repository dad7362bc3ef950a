"""ACD(1,1): brute-force recursion parity, planted arrival-burst
response, degenerate drops."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.acd import acd_filter

BASE = dt.datetime(2024, 1, 1)
A, B = 0.0625, 0.875


def _rows(key, gaps_sec):
    t, rows = 0, []
    for i, g in enumerate([0, *gaps_sec]):
        t += int(g)
        rows.append((key, BASE + dt.timedelta(seconds=t), 5.0))
    return rows


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(gaps):
    x = np.asarray(gaps, dtype=np.int64)
    n = x.size
    xbar = float(int(x.sum())) / float(n)
    om = xbar * A
    psi = xbar
    eps = 0.0
    for i in range(n):
        xi = float(int(x[i]))
        eps = eps + xi / psi
        if i < n - 1:
            psi = om + A * xi + B * psi
    return xbar, psi, eps / n


def test_brute_force_parity(spark):
    rng = np.random.default_rng(81)
    gaps = rng.integers(1, 900, size=50)
    out = acd_filter(_mk(spark, _rows("a", gaps))).collect()
    assert len(out) == 1
    xbar, psi, em = _brute(gaps)
    r = out[0]
    assert r["n_gaps"] == 50
    assert abs(r["xbar"] - xbar) < 1e-6
    assert abs(r["psi_last"] - psi) < 1e-6
    assert abs(r["eps_mean"] - em) < 1e-6


def test_arrival_burst_drops_psi(spark):
    # steady 600s cadence, then a burst of 5s arrivals: psi collapses
    # toward the burst pace while xbar stays pulled up by history
    gaps = [600] * 40 + [5] * 20
    out = acd_filter(_mk(spark, _rows("a", gaps))).collect()[0]
    # omega = xbar/16 floors psi at ~xbar/2 under a sustained burst
    # (om/(1-beta) + alpha-share); the filter reached that floor zone
    assert out["psi_last"] < 0.6 * out["xbar"]
    steady = acd_filter(_mk(spark, _rows("s", [600] * 60))).collect()[0]
    assert abs(steady["psi_last"] - 600.0) < 1e-6  # fixed point at xbar
    assert abs(steady["eps_mean"] - 1.0) < 1e-9


def test_degenerate_drops(spark):
    rows = _rows("short", [60] * 10)
    # all ticks in the same second -> all-zero gaps
    rows += [("zero", BASE + dt.timedelta(microseconds=i), 5.0)
             for i in range(30)]
    assert acd_filter(_mk(spark, rows)).count() == 0
