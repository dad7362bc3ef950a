"""Diebold-Mariano: brute-force parity on dense hourly series,
planted daily-seasonal signal (seasonal naive must win), flat-series
NULL pole."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.dm_test import diebold_mariano

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(vals, season=24, L=8):
    c = [round(v * 100) for v in vals]
    n = len(c)
    la = [None] + [(c[t] - c[t - 1]) ** 2 for t in range(1, n)]
    lbv = [None] * season + [(c[t] - c[t - season]) ** 2 for t in range(season, n)]
    d = [
        la[t] - lbv[t] if la[t] is not None and lbv[t] is not None else None
        for t in range(n)
    ]
    valid = [x for x in d if x is not None]
    n_eff, D = len(valid), sum(valid)
    e = [n_eff * x - D if x is not None else None for x in d]
    g0 = sum(x * x for x in e if x is not None)
    gw = 0
    for t in range(n):
        if e[t] is None:
            continue
        wl = 0
        for j in range(1, L + 1):
            prev = e[t - j] if t - j >= 0 else None
            wl += 2 * (L + 1 - j) * (prev or 0)
        gw += e[t] * wl
    s = (L + 1) * g0 + gw
    dm = (
        round(float(D) * float(n_eff) * math.sqrt((L + 1) / float(s)), 6) + 0.0
        if s > 0
        else None
    )
    sum_la = sum(la[t] for t in range(n) if d[t] is not None)
    sum_lb = sum(lbv[t] for t in range(n) if d[t] is not None)
    return n_eff, sum_la, sum_lb, D, dm


def test_dm_brute_force_parity(spark):
    rng = np.random.default_rng(101)
    rows, per_key = [], {}
    for k in range(2):
        vals = [float(v) for v in np.round(rng.normal(50, 4, 120), 2)]
        per_key[f"k{k}"] = vals
        rows += [
            (f"k{k}", BASE + dt.timedelta(hours=i), v)
            for i, v in enumerate(vals)
        ]
    got = {r["key"]: r for r in diebold_mariano(_ev(spark, rows)).collect()}
    for k, vals in per_key.items():
        n_eff, sum_la, sum_lb, D, dm = _brute(vals)
        r = got[k]
        assert (r["n_eff"], r["sum_la"], r["sum_lb"], r["sum_d"]) == (
            n_eff, sum_la, sum_lb, D,
        ), k
        assert r["dm"] == dm
        assert r["sum_la"] - r["sum_lb"] == r["sum_d"]


def test_dm_seasonal_signal_wins(spark):
    """A clean 24h-periodic series + small noise: the seasonal naive
    nails it (lB ~ noise) while the hourly naive eats the full swing
    -> d >> 0 -> DM strongly positive."""
    rng = np.random.default_rng(103)
    vals = [
        100.0 + 20.0 * math.sin(2 * math.pi * (i % 24) / 24)
        + float(np.round(rng.normal(0, 0.05), 2))
        for i in range(24 * 10)
    ]
    rows = [
        ("season", BASE + dt.timedelta(hours=i), round(v, 2))
        for i, v in enumerate(vals)
    ]
    r = diebold_mariano(_ev(spark, rows)).collect()[0]
    assert r["sum_la"] > 10 * r["sum_lb"]
    assert r["dm"] is not None and r["dm"] > 2.0


def test_dm_flat_series_null(spark):
    """A constant series: every loss is zero, S = 0 -> DM NULL."""
    rows = [
        ("flat", BASE + dt.timedelta(hours=i), 42.0) for i in range(100)
    ]
    r = diebold_mariano(_ev(spark, rows)).collect()[0]
    assert (r["sum_la"], r["sum_lb"], r["sum_d"]) == (0, 0, 0)
    assert r["dm"] is None
