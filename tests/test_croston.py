"""Croston/SBA: brute-force recursion parity, interval smoothing on
planted cadences, zero-demand filtering, min_demands drop."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.croston import croston_sba

BASE = dt.datetime(2024, 1, 1)
A = 0.125


def _rows(key, cents_by_hour):
    return [
        (key, BASE + dt.timedelta(hours=int(h)), float(c) / 100.0)
        for h, c in cents_by_hour
    ]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(demands):  # [(bucket, cents_sum)]
    demands = sorted(demands)
    z = float(demands[0][1])
    p = 0.0
    for j in range(1, len(demands)):
        z = z + A * (demands[j][1] - z)
        pj = float(demands[j][0] - demands[j - 1][0])
        p = pj if j == 1 else p + A * (pj - p)
    return z, p, 0.9375 * (z / p)


def test_brute_force_parity(spark):
    rng = np.random.default_rng(21)
    hours = np.sort(rng.choice(500, size=25, replace=False))
    sizes = rng.integers(100, 9000, size=25)
    rows = _rows("a", list(zip(hours, sizes)))
    out = croston_sba(_mk(spark, rows)).collect()
    assert len(out) == 1
    z, p, sba = _brute(list(zip(hours.tolist(), sizes.tolist())))
    r = out[0]
    assert r["n_dem"] == 25
    assert abs(r["z_hat"] - z) < 1e-6
    assert abs(r["p_hat"] - p) < 1e-6
    assert abs(r["sba"] - sba) < 1e-6


def test_bucket_sums_and_zero_filter(spark):
    # two ticks in the same hour sum; zero/negative values are not
    # demand and create no bucket
    rows = _rows("a", [(0, 100), (5, 300)])
    rows += [("a", BASE + dt.timedelta(hours=5, minutes=30), 2.0)]
    rows += _rows("a", [(3, 0), (9, 700)])  # hour-3 zero -> no demand
    out = croston_sba(_mk(spark, rows)).collect()[0]
    # demands: (0,100), (5,500), (9,700)
    z, p, sba = _brute([(0, 100), (5, 500), (9, 700)])
    assert out["n_dem"] == 3
    assert abs(out["z_hat"] - z) < 1e-6
    assert abs(out["p_hat"] - p) < 1e-6


def test_cadence_separates_p_hat(spark):
    dense = _rows("dense", [(h, 500) for h in range(0, 60, 2)])
    sparse = _rows("sparse", [(h, 500) for h in range(0, 300, 10)])
    out = {
        r["key"]: r
        for r in croston_sba(_mk(spark, dense + sparse)).collect()
    }
    assert abs(out["dense"]["p_hat"] - 2.0) < 1e-9
    assert abs(out["sparse"]["p_hat"] - 10.0) < 1e-9
    # constant sizes + constant cadence: SBA = 0.9375 * 500 / gap
    assert abs(out["dense"]["sba"] - 0.9375 * 500 / 2) < 1e-6


def test_min_demands_drop(spark):
    rows = _rows("two", [(0, 100), (8, 100)])
    assert croston_sba(_mk(spark, rows)).count() == 0
