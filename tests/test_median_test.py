"""Mood's median test: brute-force parity, location detection,
outlier insensitivity (vs moments), degenerate-split gate."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.median_test import mood_median_test

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
    ca = [round(v * 100) for v in vals_a]
    cb = [round(v * 100) for v in vals_b]
    pooled = sorted(ca + cb)
    nn = len(pooled)
    med = pooled[(nn + 1) // 2 - 1]
    n11 = sum(1 for c in ca if c > med)
    n21 = sum(1 for c in cb if c > med)
    n, m = len(ca), len(cb)
    n12, n22 = n - n11, m - n21
    c1, c2 = n11 + n21, nn - (n11 + n21)
    det = n11 * n22 - n12 * n21
    chi2 = round(nn * det * det / float(n * m * c1 * c2), 6) + 0.0
    return n, m, n11, n21, med, chi2


def test_mood_median_brute_force_parity(spark):
    rng = np.random.default_rng(1109)
    rows, keys = [], {}
    for k in range(3):
        va = [float(v) for v in np.round(rng.normal(50 + k, 5, 40), 2)]
        vb = [float(v) for v in np.round(rng.normal(50, 5, 55), 2)]
        keys[f"k{k}"] = (va, vb)
        rows += _rows(f"k{k}", va, vb)
    got = {
        r["key"]: r for r in mood_median_test(_df(spark, rows)).collect()
    }
    for k, (va, vb) in keys.items():
        n, m, n11, n21, med, chi2 = _brute(va, vb)
        r = got[k]
        assert (
            r["n_a"], r["n_b"], r["n11"], r["n21"], r["med_cents"],
        ) == (n, m, n11, n21, med)
        assert r["chi2"] == chi2


def test_mood_median_location_and_outlier_robustness(spark):
    rng = np.random.default_rng(1117)
    a = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    null_b = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    shift_b = [float(v) for v in np.round(rng.normal(54, 5, 300), 2)]
    # same median, 5% absurd outliers: the median test must NOT fire
    outlier_b = null_b[:285] + [1e6] * 8 + [-1e6] * 7
    rows = (
        _rows("null", a, null_b)
        + _rows("shift", a, shift_b)
        + _rows("outlier", a, outlier_b)
    )
    got = {
        r["key"]: r for r in mood_median_test(_df(spark, rows)).collect()
    }
    assert got["null"]["chi2"] < 4.0
    assert got["shift"]["chi2"] > 20.0
    assert got["outlier"]["chi2"] < 4.0


def test_mood_median_degenerate_split_drops(spark):
    rows = _rows("flat", [2.0] * 20, [2.0] * 20)
    assert mood_median_test(_df(spark, rows)).count() == 0
