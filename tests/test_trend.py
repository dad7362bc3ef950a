"""Mann-Kendall + Theil-Sen: kernel vs naive definition, Spark path."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from tits_spark.operators.trend import _median_pinned, mk_numpy, trend_stats


def naive_mk(t, v):
    n = len(v)
    s = sum(
        int(v[j] > v[i]) - int(v[j] < v[i])
        for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter

    ties = [c for c in Counter(v).values() if c > 1]
    var_s = (
        n * (n - 1) * (2 * n + 5)
        - sum(c * (c - 1) * (2 * c + 5) for c in ties)
    ) / 18.0
    slopes = sorted(
        (v[j] - v[i]) / (t[j] - t[i])
        for i in range(n) for j in range(i + 1, n) if t[j] != t[i]
    )
    return s, var_s, slopes


def test_kernel_matches_naive():
    rng = np.random.default_rng(4)
    t = np.cumsum(rng.integers(1, 100, 60)).astype(np.float64)
    v = np.round(rng.normal(0, 5, 60), 1)  # 1dp -> guaranteed ties
    s, var_s, z, slope = mk_numpy(t, v)
    ns, nvar, nslopes = naive_mk(list(t), list(v))
    assert s == ns
    assert var_s == nvar
    assert slope == _median_pinned(np.array(nslopes))
    expected_z = (s - 1) / math.sqrt(var_s) if s > 0 else (
        (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
    )
    assert z == expected_z


def test_known_trends():
    t = np.arange(30, dtype=np.float64)
    up = t * 2.0 + 5.0
    s, _, z, slope = mk_numpy(t, up)
    assert s == 30 * 29 // 2 and z > 1.96
    assert slope == 2.0            # every pairwise slope identical
    s0, _, z0, _ = mk_numpy(t, np.full(30, 7.0))
    assert s0 == 0 and z0 == 0.0


def test_spark_path(spark):
    t0 = dt.datetime(2024, 1, 1)
    rng = np.random.default_rng(11)
    rows = []
    for k, drift in [("up", 0.5), ("down", -0.5), ("flat", 0.0)]:
        v = np.cumsum(rng.normal(drift, 0.1, 50)) if drift else rng.normal(0, 1, 50)
        rows += [
            (k, t0 + dt.timedelta(seconds=60 * i + int(i % 7)), float(x))
            for i, x in enumerate(v)
        ]
    rows += [("tiny", t0, 1.0)]  # below min_points -> dropped
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = {r["key"]: r for r in trend_stats(df).collect()}
    assert set(out) == {"up", "down", "flat"}
    assert out["up"]["trend"] == "inc" and out["up"]["sen_slope"] > 0
    assert out["down"]["trend"] == "dec" and out["down"]["sen_slope"] < 0
    assert out["flat"]["trend"] == "none"
    assert out["up"]["n"] == 50
