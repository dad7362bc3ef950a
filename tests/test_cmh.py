"""CMH: brute-force parity on random stratified tables, confounder
demonstration (marginal lift that vanishes under stratification),
planted genuine effect, degenerate gates."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.cmh import cmh_strata

BASE = dt.datetime(2024, 3, 1)


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, stratum int, exposed boolean, outcome boolean"
    )


def _rows(key, tables):
    """tables: {stratum: (a, b, c, d)}."""
    out = []
    for s, (a, b, c, d) in tables.items():
        out += [(key, s, True, True)] * a
        out += [(key, s, True, False)] * b
        out += [(key, s, False, True)] * c
        out += [(key, s, False, False)] * d
    return out


def _brute(tables):
    o1 = e_ppb = v_ppm = r_ppm = s_ppm = 0
    n_strata = 0
    for a, b, c, d in tables.values():
        n = a + b + c + d
        if n < 2:
            continue
        n_strata += 1
        o1 += a
        r1, r0, c1, c0 = a + b, c + d, a + c, b + d
        e_ppb += math.floor(1e9 * (float(r1) * c1) / n)
        v_ppm += math.floor(
            1e6 * (float(r1) * r0 * c1 * c0) / (float(n) * n * (n - 1.0))
        )
        r_ppm += math.floor(1e6 * (float(a) * d) / n)
        s_ppm += math.floor(1e6 * (float(b) * c) / n)
    cmh = None
    if v_ppm > 0:
        o, e, v = float(o1), e_ppb / 1e9, v_ppm / 1e6
        cmh = _r6((o - e) * (o - e) / v)
    orr = _r6(r_ppm / s_ppm) if s_ppm > 0 else None
    return n_strata, o1, e_ppb, v_ppm, r_ppm, s_ppm, cmh, orr


def test_cmh_brute_parity(spark):
    rng = np.random.default_rng(1703)
    rows, keys = [], {}
    for k in range(4):
        tables = {
            s: tuple(int(x) for x in rng.integers(0, 12, 4))
            for s in range(8)
        }
        keys[f"k{k}"] = tables
        rows += _rows(f"k{k}", tables)
    got = {r["key"]: r for r in cmh_strata(_df(spark, rows)).collect()}
    for k, tables in keys.items():
        ns, o1, e, v, rq, sq, cmh, orr = _brute(tables)
        r = got[k]
        assert (
            r["n_strata"], r["o1"], r["e_ppb"], r["v_ppm"],
            r["r_ppm"], r["s_ppm"],
        ) == (ns, o1, e, v, rq, sq)
        assert r["cmh_chi2"] == cmh
        assert r["or_mh"] == orr


def test_cmh_confounder_vanishes(spark):
    """Simpson's-pattern plant: within every stratum exposure is
    independent of outcome (OR=1), but strata differ in both exposure
    and outcome rates, so the POOLED 2x2 shows a strong association.
    CMH must stay small and MH-OR ~ 1, while the naive pooled chi2
    (computed here by collapsing strata) is large."""
    # stratum 0: high exposure, high outcome; stratum 1: low, low
    tables = {0: (80, 80, 20, 20), 1: (5, 45, 10, 90)}
    rows = _rows("conf", tables)
    r = cmh_strata(_df(spark, rows)).collect()[0]
    assert r["cmh_chi2"] < 1.0
    assert abs(r["or_mh"] - 1.0) < 0.05
    # collapsed table association is strong (hand chi2 >> 10)
    a = sum(t[0] for t in tables.values())
    b = sum(t[1] for t in tables.values())
    c = sum(t[2] for t in tables.values())
    d = sum(t[3] for t in tables.values())
    n = a + b + c + d
    chi2 = (
        n * (a * d - b * c) ** 2
        / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    assert chi2 > 10


def test_cmh_planted_effect(spark):
    """A uniform within-stratum OR of ~4 must drive CMH large and
    MH-OR near 4."""
    tables = {s: (40, 30, 10, 30) for s in range(6)}
    r = cmh_strata(_df(spark, _rows("eff", tables))).collect()[0]
    assert r["cmh_chi2"] > 30
    assert 3.0 < r["or_mh"] < 5.0


def test_cmh_degenerate_gates(spark):
    # all outcomes positive -> c0 margins zero -> V = 0 -> NULL chi2
    tables = {0: (30, 0, 30, 0)}
    r = cmh_strata(_df(spark, _rows("dg", tables))).collect()[0]
    assert r["cmh_chi2"] is None and r["or_mh"] is None
    # under min_total: dropped
    assert (
        cmh_strata(_df(spark, _rows("tiny", {0: (3, 3, 3, 3)}))).collect()
        == []
    )
