"""HHI bucket concentration and GPD-PWM tail fit: brute-force parity
against the textbook definitions, planted heavy/light tails,
degeneracy, tie invariance."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.concentration import hhi_per_bucket
from tits_spark.operators.tail import gpd_pot

BASE = dt.datetime(2024, 1, 1)


def _t(sec):
    return BASE + dt.timedelta(seconds=float(sec))


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )


def test_hhi_known_shares(spark):
    rows = []
    # hour 0: two equal contributors -> hhi .5, top1 .5, eff 2
    rows += [("a", _t(10), 10.0), ("b", _t(20), 10.0)]
    # hour 1: 80/10/10 -> hhi .66
    h = 3600
    rows += [("a", _t(h + 1), 80.0), ("b", _t(h + 2), 10.0),
             ("c", _t(h + 3), 10.0)]
    # hour 2: single key -> dropped by min_keys
    rows += [("a", _t(2 * h + 1), 5.0)]
    out = sorted(hhi_per_bucket(_mk(spark, rows)).collect(),
                 key=lambda r: r["bucket"])
    assert len(out) == 2
    b0, b1 = out
    assert b0["hhi"] == 0.5
    assert b0["top1_share"] == 0.5
    assert b0["eff_keys"] == 2.0
    assert b1["hhi"] == round(0.8**2 + 0.1**2 + 0.1**2, 6)
    assert b1["top1_share"] == 0.8
    assert b1["total_c"] == 10000 and b1["sumsq"] == 66_000_000


def test_hhi_brute_force_and_sign_filter(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(200):
        k = f"k{rng.integers(0, 7)}"
        rows.append((k, _t(i * 30), round(float(rng.uniform(-5, 60)), 2)))
    out = hhi_per_bucket(_mk(spark, rows)).collect()
    # brute: per (hour, key) positive-cent totals
    acc: dict = {}
    for k, t, v in rows:
        c = int(np.rint(v * 100))
        if c <= 0:
            continue
        b = int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1e6) // (
            3600 * 10**6
        )
        acc.setdefault(b, {}).setdefault(k, 0)
        acc[b][k] += c
    for r in out:
        s = acc[r["bucket"]]
        tot = sum(s.values())
        ssq = sum(x * x for x in s.values())
        assert r["n_keys"] == len(s)
        assert r["total_c"] == tot and r["sumsq"] == ssq
        assert r["hhi"] == round(ssq / tot**2, 6)
        assert r["top1_c"] == max(s.values())


def _brute_gpd(values, k):
    """PWM fit over the k largest of values (cents), textbook form."""
    c = np.sort(np.rint(np.asarray(values) * 100).astype(np.int64))[::-1]
    u = int(c[k])
    y = np.sort(c[:k] - u)  # ascending exceedances
    j = np.arange(1, k + 1)
    a0 = y.mean()
    a1 = ((k - j) * y).sum() / (k * (k - 1))
    d = a0 - 2 * a1
    if d <= 0:
        return None, None
    return (round(2 - a0 / d, 6) + 0.0,
            round(2 * a0 * a1 / d, 6) + 0.0)


def test_gpd_brute_force(spark):
    rng = np.random.default_rng(11)
    vals = rng.lognormal(1.0, 1.2, 200).round(2)
    rows = [("k", _t(i * 30), float(v)) for i, v in enumerate(vals)]
    out = gpd_pot(_mk(spark, rows), k=20).collect()
    assert len(out) == 1
    r = out[0]
    xi_b, sg_b = _brute_gpd(vals, 20)
    assert r["xi"] == xi_b
    assert r["sigma_c"] == sg_b
    assert r["n_exc"] == 20
    c = np.sort(np.rint(vals * 100).astype(np.int64))[::-1]
    assert r["u_cents"] == int(c[20])
    assert r["m0"] == int((c[:20] - c[20]).sum())


def test_gpd_heavy_vs_light(spark):
    # deterministic quantile lattices: a Pareto(alpha=1.5) tail must fit
    # a clearly larger xi than an exponential tail (xi ~ 0)
    k = 100
    q = (np.arange(1, 402, dtype=np.float64) - 0.5) / 401
    pareto = (1 - q) ** (-1 / 1.5)  # xi = 2/3
    expo = -np.log(1 - q)  # xi = 0
    rows = [("pareto", _t(i * 10), float(v * 100)) for i, v in
            enumerate(pareto)]
    rows += [("expo", _t(i * 10), float(v * 100)) for i, v in
             enumerate(expo)]
    out = {r["key"]: r for r in gpd_pot(_mk(spark, rows), k=k).collect()}
    assert out["pareto"]["xi"] > out["expo"]["xi"] + 0.3
    assert abs(out["expo"]["xi"]) < 0.15
    assert abs(out["pareto"]["xi"] - 2 / 3) < 0.25
    assert out["expo"]["sigma_c"] > 0


def test_gpd_degenerate_and_small(spark):
    # all top values equal -> D = 0 -> NULL fit (never a divide)
    rows = [("flat", _t(i), 50.0) for i in range(30)]
    out = gpd_pot(_mk(spark, rows), k=10).collect()
    assert len(out) == 1
    assert out[0]["xi"] is None and out[0]["sigma_c"] is None
    assert out[0]["u_cents"] == 5000 and out[0]["m0"] == 0
    # fewer than k+1 rows -> key drops out
    rows2 = [("tiny", _t(i), float(i)) for i in range(5)]
    assert gpd_pot(_mk(spark, rows2), k=10).count() == 0
