"""Hurst R/S: known regimes + exact R/S definition check."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from tits_spark.operators.hurst import hurst_rs


def _mk(spark, series):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (k, t0 + dt.timedelta(seconds=60 * i), float(x))
        for k, v in series.items()
        for i, x in enumerate(v)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def naive_rs(v, s):
    """Mean R/S over complete segments of size s (population std)."""
    n = (len(v) // s) * s
    out = []
    for a in range(0, n, s):
        seg = np.asarray(v[a : a + s], dtype=np.float64)
        z = np.cumsum(seg - seg.mean())
        sd = seg.std()
        if sd > 0:
            out.append((z.max() - z.min()) / sd)
    return np.mean(out) if out else None


def test_known_regimes(spark):
    rng = np.random.default_rng(23)
    wn = rng.normal(0, 1, 512)                     # H ~ 0.5
    rw = np.cumsum(rng.normal(0, 1, 512))          # H ~ 1 (persistent)
    mr = np.zeros(512)                             # strongly mean-reverting
    for i in range(1, 512):
        mr[i] = -0.7 * mr[i - 1] + rng.normal(0, 1)
    df = _mk(spark, {"wn": wn, "rw": rw, "mr": mr})
    out = {r["key"]: r["hurst"] for r in hurst_rs(df).collect()}
    assert 0.4 < out["wn"] < 0.72        # R/S has small-sample bias up
    assert out["rw"] > 0.85
    assert out["mr"] < out["wn"] < out["rw"]


def test_matches_naive_definition(spark):
    rng = np.random.default_rng(3)
    v = rng.normal(5, 2, 200)
    df = _mk(spark, {"a": v})
    sizes = (8, 16, 32, 64)
    got = hurst_rs(df, sizes=sizes).collect()[0]
    xs = np.log(sizes)
    ys = np.log([naive_rs(v, s) for s in sizes])
    k = len(sizes)
    slope = (np.sum(xs * ys) - xs.sum() * ys.sum() / k) / (
        np.sum(xs * xs) - xs.sum() ** 2 / k
    )
    assert got["n_sizes"] == 4
    assert got["hurst"] == pytest.approx(round(float(slope), 6), abs=1e-6)


def test_guards(spark):
    df = _mk(spark, {"a": np.arange(10.0)})
    with pytest.raises(ValueError):
        hurst_rs(df, sizes=(8,))
    # too short for two sizes -> dropped
    assert hurst_rs(df, sizes=(16, 32)).count() == 0
