"""Fligner-Killeen: brute-force replay parity (same Acklam tree,
same ppb floors), scale-separation plant vs location-shift
insensitivity (the median centering), gates."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from tits_spark.operators.anova import fligner_killeen_types

GROUPS = ("click", "error", "purchase", "signup", "view")

A = (-3.969683028665376e+01, 2.209460984245205e+02,
     -2.759285104469687e+02, 1.383577518672690e+02,
     -3.066479806614716e+01, 2.506628277459239e+00)
B = (-5.447609879822406e+01, 1.615858368580409e+02,
     -1.556989798598866e+02, 6.680131188771972e+01,
     -1.328068155288572e+01)
C = (-7.784894002430293e-03, -3.223964580411365e-01,
     -2.400758277161838e+00, -2.549732539343734e+00,
     4.374664141464968e+00, 2.938163982698783e+00)
D = (7.784695709041462e-03, 3.224671290700398e-01,
     2.445134137142996e+00, 3.754408661907416e+00)


def _probit(p):
    if p < 0.02425:
        q = math.sqrt(-2.0 * math.log(p))
        return ((((((C[0] * q + C[1]) * q + C[2]) * q + C[3]) * q + C[4])
                 * q + C[5])
                / (((((D[0] * q + D[1]) * q + D[2]) * q + D[3]) * q + 1.0)))
    if p > 1.0 - 0.02425:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        return -((((((C[0] * q + C[1]) * q + C[2]) * q + C[3]) * q + C[4])
                  * q + C[5])
                 / (((((D[0] * q + D[1]) * q + D[2]) * q + D[3]) * q + 1.0)))
    q = p - 0.5
    r = q * q
    return (((((((A[0] * r + A[1]) * r + A[2]) * r + A[3]) * r + A[4])
              * r + A[5]) * q)
            / ((((((B[0] * r + B[1]) * r + B[2]) * r + B[3]) * r + B[4])
                * r + 1.0)))


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, value double, grp string")


def _brute(groups):
    devs = {}
    for g, vs in groups.items():
        cs = sorted(round(v * 100) for v in vs)
        n = len(cs)
        m2 = cs[(n + 1) // 2 - 1] + cs[n // 2]
        devs[g] = Counter(abs(2 * c - m2) for c in cs)
    pooled = Counter()
    for dd in devs.values():
        pooled.update(dd)
    nn = sum(pooled.values())
    rr = {}
    below = 0
    for d in sorted(pooled):
        rr[d] = 2 * below + pooled[d] + 1
        below += pooled[d]
    aj = {}
    qk = 0
    for g, dd in devs.items():
        s = 0
        for d, t in dd.items():
            p = 0.5 + rr[d] / (4.0 * (nn + 1.0))
            av = _probit(p)
            s += math.floor(1e9 * (float(t) * av))
            qk += math.floor(1e9 * (float(t) * (av * av)))
        aj[g] = s
    ntot = nn
    atot = 0
    for g in GROUPS:
        atot = atot + aj[g]
    abar = (atot / 1e9) / ntot
    num = 0.0
    for g in GROUPS:
        nj = sum(devs[g].values())
        ab = (aj[g] / 1e9) / nj
        num = num + nj * ((ab - abar) * (ab - abar))
    vv = (qk / 1e9 - ntot * (abar * abar)) / (ntot - 1.0)
    return ntot, (_r6(num / vv) if vv > 0 else None)


def test_fk_brute_parity(spark):
    rng = np.random.default_rng(3303)
    rows, keys = [], {}
    for ki in range(3):
        groups = {
            g: [
                float(v)
                for v in np.round(rng.normal(50, 1 + 2 * i, 25 + 3 * i), 1)
            ]
            for i, g in enumerate(GROUPS)
        }
        keys[f"k{ki}"] = groups
        rows += [(f"k{ki}", v, g) for g, vs in groups.items() for v in vs]
    got = {
        r["key"]: r for r in fligner_killeen_types(_df(spark, rows)).collect()
    }
    for k, groups in keys.items():
        ntot, fk = _brute(groups)
        r = got[k]
        assert r["n_total"] == ntot and r["fk_df"] == 4
        assert r["fk_stat"] == fk


def test_fk_scale_sensitive_location_blind(spark):
    rng = np.random.default_rng(3307)
    # spread differs wildly: FK large
    spread = {
        g: [float(v) for v in np.round(rng.normal(50, 0.5 + 3 * i, 60), 2)]
        for i, g in enumerate(GROUPS)
    }
    # only LOCATION differs (same sd): FK small (median centering)
    loc = {
        g: [float(v) for v in np.round(rng.normal(30 + 15 * i, 2, 60), 2)]
        for i, g in enumerate(GROUPS)
    }
    rows = [("sp", v, g) for g, vs in spread.items() for v in vs]
    rows += [("lc", v, g) for g, vs in loc.items() for v in vs]
    got = {
        r["key"]: r for r in fligner_killeen_types(_df(spark, rows)).collect()
    }
    assert got["sp"]["fk_stat"] > 50
    assert got["lc"]["fk_stat"] < 15


def test_fk_gates(spark):
    rng = np.random.default_rng(3311)
    rows = [
        ("k", float(v), g)
        for g in GROUPS[:3]
        for v in np.round(rng.normal(50, 2, 20), 2)
    ]
    assert fligner_killeen_types(_df(spark, rows)).collect() == []
