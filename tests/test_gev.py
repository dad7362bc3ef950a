"""GEV block-maxima shape: brute-force PWM parity, sign behavior on
planted Gumbel / bounded / heavy-tailed weekly maxima, min_blocks
gate."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.gev import LOG2_OVER_LOG3, gev_shape

EPOCH = dt.datetime(1970, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _mk(key, weekly_max, per_week=3):
    """One row at the weekly max plus two strictly smaller fillers."""
    rows = []
    for w, v in enumerate(weekly_max):
        t0 = EPOCH + dt.timedelta(weeks=w, days=1)
        rows.append((key, t0, float(v)))
        for j in range(1, per_week):
            rows.append(
                (key, t0 + dt.timedelta(hours=j), float(round(v - j, 2)))
            )
    return rows


def _brute(weekly_max):
    m = sorted(round(v * 100) for v in weekly_max)
    n = len(m)
    b0 = sum(m)
    b1 = sum((j - 1) * x for j, x in enumerate(m, 1))
    b2 = sum((j - 1) * (j - 2) * x for j, x in enumerate(m, 1))
    a = 2 * (n - 2) * b1 - (n - 1) * (n - 2) * b0
    b = 3 * b2 - (n - 1) * (n - 2) * b0
    c = a / b - LOG2_OVER_LOG3
    return n, b0, b1, b2, round(7.8590 * c + 2.9554 * c * c, 6) + 0.0


def test_gev_brute_force_parity(spark):
    rng = np.random.default_rng(613)
    rows, keys = [], {}
    for k in range(3):
        wm = [float(v) for v in np.round(rng.gumbel(80, 10, 40), 2)]
        keys[f"k{k}"] = wm
        rows += _mk(f"k{k}", wm)
    got = {r["key"]: r for r in gev_shape(_df(spark, rows)).collect()}
    for k, wm in keys.items():
        n, b0, b1, b2, kap = _brute(wm)
        r = got[k]
        assert (r["n_blocks"], r["b0"], r["b1"], r["b2"]) == (n, b0, b1, b2)
        assert r["gev_shape"] == kap


def test_gev_shape_signs(spark):
    rng = np.random.default_rng(617)
    gum = [float(v) for v in np.round(rng.gumbel(100, 5, 400), 2)]
    # uniform maxima: bounded upper tail -> Weibull domain, kappa > 0
    uni = [float(v) for v in np.round(rng.uniform(90, 110, 400), 2)]
    # Pareto(alpha=1.5) maxima: heavy tail -> Frechet, kappa < 0
    par = [
        float(v)
        for v in np.round(50 * rng.pareto(1.5, 400) + 50, 2)
    ]
    rows = _mk("gum", gum) + _mk("uni", uni) + _mk("par", par)
    got = {r["key"]: r for r in gev_shape(_df(spark, rows)).collect()}
    assert abs(got["gum"]["gev_shape"]) < 0.15
    assert got["uni"]["gev_shape"] > 0.2
    assert got["par"]["gev_shape"] < -0.2


def test_gev_min_blocks_gate(spark):
    rows = _mk("few", [10.0 + i for i in range(10)])
    assert gev_shape(_df(spark, rows), min_blocks=20).count() == 0
    assert gev_shape(_df(spark, rows), min_blocks=10).count() == 1
