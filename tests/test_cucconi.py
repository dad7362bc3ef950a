"""Cucconi location-scale test: brute-force rank parity, null ~ O(1)
behavior, sensitivity to location AND pure scale shifts (the one-shot
Lepage alternative)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.cucconi import cucconi_test

BASE = dt.datetime(2024, 3, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, is_a boolean"
    )


def _rows(key, vals_a, vals_b):
    out = []
    for i, v in enumerate(vals_a):
        out.append((key, BASE + dt.timedelta(minutes=i), float(v), True))
    for i, v in enumerate(vals_b):
        out.append(
            (key, BASE + dt.timedelta(minutes=10000 + i), float(v), False)
        )
    return out


def _brute(vals_a, vals_b):
    a = [(round(v * 100), i, 1) for i, v in enumerate(vals_a)]
    b = [(round(v * 100), 10000 + i, 0) for i, v in enumerate(vals_b)]
    merged = sorted(a + b, key=lambda x: (x[0], x[1], x[2]))
    n, m = len(a), len(b)
    nn = n + m
    sq = sc = 0
    for r, (_, _, lab) in enumerate(merged, 1):
        if lab == 0:
            sq += r * r
            sc += (nn + 1 - r) ** 2
    den = math.sqrt(m * n * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0)
    u = (6.0 * sq - m * (nn + 1) * (2 * nn + 1)) / den
    v = (6.0 * sc - m * (nn + 1) * (2 * nn + 1)) / den
    rho = 2.0 * (nn * nn - 4) / ((2 * nn + 3) * (8 * nn + 11)) - 1.0
    c = round((u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho)), 6)
    return n, m, sq, sc, c + 0.0


def test_cucconi_brute_force_parity(spark):
    rng = np.random.default_rng(709)
    rows, keys = [], {}
    for k in range(3):
        va = [float(v) for v in np.round(rng.normal(50, 5, 35), 2)]
        vb = [float(v) for v in np.round(rng.normal(50 + k, 5 + k, 50), 2)]
        keys[f"k{k}"] = (va, vb)
        rows += _rows(f"k{k}", va, vb)
    got = {r["key"]: r for r in cucconi_test(_df(spark, rows)).collect()}
    for k, (va, vb) in keys.items():
        n, m, sq, sc, c = _brute(va, vb)
        r = got[k]
        assert (r["n_a"], r["n_b"], r["sq_rank"], r["sq_contra"]) == (
            n, m, sq, sc,
        )
        assert r["cucconi_c"] == c


def test_cucconi_null_location_scale(spark):
    rng = np.random.default_rng(719)
    same_a = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    same_b = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    shift_b = [float(v) for v in np.round(rng.normal(54, 5, 300), 2)]
    scale_b = [float(v) for v in np.round(rng.normal(50, 15, 300), 2)]
    rows = (
        _rows("null", same_a, same_b)
        + _rows("shift", same_a, shift_b)
        + _rows("scale", same_a, scale_b)
    )
    got = {r["key"]: r for r in cucconi_test(_df(spark, rows)).collect()}
    # C ~ mean 1 under H0; both alternatives blow it up
    assert got["null"]["cucconi_c"] < 3.0
    assert got["shift"]["cucconi_c"] > 10.0
    assert got["scale"]["cucconi_c"] > 10.0
