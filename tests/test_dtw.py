"""DTW over PAA vectors: kernel vs naive DP, bucketing semantics."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from tits_spark.operators.dtw import dtw_numpy, dtw_similar


def naive_dtw(x, y):
    s = len(x)
    c = np.full((s, s), np.inf)
    for i in range(s):
        for j in range(s):
            d = abs(x[i] - y[j])
            if i == 0 and j == 0:
                c[i, j] = d
            elif i == 0:
                c[i, j] = d + c[i, j - 1]
            elif j == 0:
                c[i, j] = d + c[i - 1, j]
            else:
                c[i, j] = d + min(c[i - 1, j], c[i - 1, j - 1], c[i, j - 1])
    return c[-1, -1]


def test_kernel_matches_naive():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (20, 8))
    y = rng.normal(0, 1, (20, 8))
    got = dtw_numpy(x, y)
    for p in range(20):
        assert got[p] == naive_dtw(x[p], y[p])  # bit-exact, same recurrence


def test_kernel_known_values():
    # identical series: cost 0; constant shift: s * shift along diagonal
    x = np.array([1.0, 2.0, 3.0, 4.0])
    assert dtw_numpy(x, x)[0] == 0.0
    assert dtw_numpy(x, x + 2.0)[0] == naive_dtw(x, x + 2.0)
    # warping beats lockstep: shifted sawtooth aligns with cost < L1
    a = np.array([0.0, 10.0, 0.0, 10.0, 0.0, 10.0, 0.0, 10.0])
    b = np.roll(a, 1)
    assert dtw_numpy(a, b)[0] < np.abs(a - b).sum()


def _mk(spark, series):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(seconds=60 * i), float(x))
        for k, v in series.items()
        for i, x in enumerate(v)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_dtw_similar(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, 64)
    series = {
        "a": base,
        "a2": base + 100.0,            # z-norm invariant: same shape
        "b": -base,                    # mirrored shape
        "c": rng.normal(0, 1, 64),
    }
    out = dtw_similar(_mk(spark, series), prefix=0).collect()
    d = {(r["key1"], r["key2"]): r["dtw"] for r in out}
    assert len(d) == 6                 # all pairs at prefix=0
    assert d[("a", "a2")] == 0.0       # identical after z-norm+PAA
    # bucketed run is a subset of the all-pairs run with equal values
    sub = {(r["key1"], r["key2"]): r["dtw"]
           for r in dtw_similar(_mk(spark, series), prefix=2).collect()}
    assert set(sub) <= set(d)
    assert ("a", "a2") in sub          # identical words share any prefix
    for k, v in sub.items():
        assert v == d[k]


def test_prefix_guard(spark):
    df = _mk(spark, {"a": np.arange(16.0)})
    with pytest.raises(ValueError):
        dtw_similar(df, prefix=9, segments=8)
