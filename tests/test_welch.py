"""Welch t / Cohen d / Hedges g: brute parity on exact cents moments,
heteroscedastic validity (Welch df shrinks toward the small noisy
arm), effect-size magnitudes, gates."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.effect_size import welch_t


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, value double, is_a boolean")


def _brute(va, vb):
    ca = [round(v * 100) for v in va]
    cb = [round(v * 100) for v in vb]
    n1, n2 = len(ca), len(cb)
    s1a, s1b = sum(ca), sum(cb)
    s2a = sum(c * c for c in ca)
    s2b = sum(c * c for c in cb)
    m1, m2 = s1a / n1, s1b / n2
    v1 = (n1 * float(s2a) - float(s1a) * float(s1a)) / (n1 * (n1 - 1.0))
    v2 = (n2 * float(s2b) - float(s1b) * float(s1b)) / (n2 * (n2 - 1.0))
    se2 = v1 / n1 + v2 / n2
    t = _r6((m1 - m2) / math.sqrt(se2)) if se2 > 0 else None
    dfree = (
        _r6(
            se2 * se2
            / ((v1 / n1) ** 2 / (n1 - 1.0) + (v2 / n2) ** 2 / (n2 - 1.0))
        )
        if se2 > 0
        else None
    )
    sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2.0)
    d = (m1 - m2) / math.sqrt(sp2) if sp2 > 0 else None
    g = (
        _r6(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)))
        if d is not None
        else None
    )
    return (
        n1, n2, _r6(m1 / 100.0), _r6(m2 / 100.0), t, dfree,
        _r6(d) if d is not None else None, g,
    )


def test_welch_brute_parity(spark):
    rng = np.random.default_rng(3001)
    rows, keys = [], {}
    for k in range(4):
        va = [float(v) for v in np.round(rng.normal(50, 2 + k, 30), 2)]
        vb = [float(v) for v in np.round(rng.normal(48, 5, 80), 2)]
        keys[f"k{k}"] = (va, vb)
        rows += [(f"k{k}", v, True) for v in va]
        rows += [(f"k{k}", v, False) for v in vb]
    got = {r["key"]: r for r in welch_t(_df(spark, rows)).collect()}
    for k, (va, vb) in keys.items():
        n1, n2, m1, m2, t, dfree, d, g = _brute(va, vb)
        r = got[k]
        assert (r["n_a"], r["n_b"]) == (n1, n2)
        assert (r["mean_a"], r["mean_b"]) == (m1, m2)
        assert r["welch_t"] == t and r["welch_df"] == dfree
        assert r["cohens_d"] == d and r["hedges_g"] == g


def test_welch_df_tracks_the_noisy_arm(spark):
    """Tiny noisy arm vs huge quiet arm: Satterthwaite df collapses
    toward (n_noisy - 1), far below the pooled n-2."""
    rng = np.random.default_rng(3007)
    quiet = [float(v) for v in np.round(rng.normal(50, 0.5, 500), 2)]
    noisy = [float(v) for v in np.round(rng.normal(50, 20, 8), 2)]
    rows = [("k", v, True) for v in noisy] + [
        ("k", v, False) for v in quiet
    ]
    r = welch_t(_df(spark, rows)).collect()[0]
    assert r["welch_df"] < 9  # ~ n_noisy - 1, nowhere near 506


def test_welch_effect_direction_and_gate(spark):
    rng = np.random.default_rng(3011)
    big = [float(v) for v in np.round(rng.normal(55, 2, 100), 2)]
    small = [float(v) for v in np.round(rng.normal(50, 2, 100), 2)]
    rows = [("k", v, True) for v in big] + [("k", v, False) for v in small]
    r = welch_t(_df(spark, rows)).collect()[0]
    assert r["welch_t"] > 10 and r["cohens_d"] > 2
    assert abs(r["hedges_g"]) < abs(r["cohens_d"])
    tiny = [("t", 1.0, True)] * 3 + [("t", 2.0, False)] * 30
    assert welch_t(_df(spark, tiny)).collect() == []
