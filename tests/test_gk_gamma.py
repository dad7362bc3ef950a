"""GK gamma / Somers' d / tau-b: brute-force all-pairs parity over
the identical quartile protocol, planted monotone hour-value
association, degenerate one-hour key."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.gk_gamma import gk_ordinal_assoc

BASE = dt.datetime(2024, 3, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(hs, vals):
    c = [round(v * 100) for v in vals]
    n = len(c)
    order = sorted(range(n), key=lambda i: (c[i], i))
    thr = {}
    for k in (1, 2, 3):
        r = (k * n) // 4
        thr[k] = c[order[r - 1]]
    b = [sum(x > thr[k] for k in (1, 2, 3)) for x in c]
    C = D = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            if hs[i] == hs[j]:
                tx += 1
                continue
            lo, hi = (i, j) if hs[i] < hs[j] else (j, i)
            if b[lo] < b[hi]:
                C += 1
            elif b[lo] > b[hi]:
                D += 1
    for i in range(n):
        for j in range(i + 1, n):
            if b[i] == b[j]:
                ty += 1
    t_all = n * (n - 1) // 2
    gamma = round((C - D) / (C + D), 6) + 0.0 if C + D else None
    som = round((C - D) / (t_all - tx), 6) + 0.0 if t_all > tx else None
    tau = (
        round((C - D) / math.sqrt(float(t_all - tx) * float(t_all - ty)), 6)
        + 0.0
        if t_all > tx and t_all > ty
        else None
    )
    return C, D, tx, ty, gamma, som, tau


def test_gk_gamma_brute_force_parity(spark):
    rng = np.random.default_rng(97)
    rows, per_key = [], {}
    for k in range(3):
        n = 60
        hs = [int(h) for h in rng.integers(0, 24, n)]
        vals = [float(v) for v in np.round(rng.normal(50, 10, n), 2)]
        per_key[f"k{k}"] = (hs, vals)
        rows += [
            (
                f"k{k}",
                BASE + dt.timedelta(hours=int(h), seconds=i),
                v,
            )
            for i, (h, v) in enumerate(zip(hs, vals))
        ]
    got = {r["key"]: r for r in gk_ordinal_assoc(_ev(spark, rows)).collect()}
    for k, (hs, vals) in per_key.items():
        # brute mirrors the operator's (c, us) rank order: rows were
        # appended in ts order per key, and ties in c break by index
        C, D, tx, ty, gamma, som, tau = _brute_ordered(k, hs, vals, rows)
        r = got[k]
        assert (r["c_pairs"], r["d_pairs"], r["t_x"], r["t_y"]) == (
            C, D, tx, ty,
        ), k
        assert r["gamma"] == gamma
        assert r["somers_dyx"] == som
        assert r["tau_b"] == tau


def _brute_ordered(key, hs, vals, rows):
    """Order rows by timestamp (the us tiebreak) before ranking."""
    mine_sorted = sorted(
        [(t, v) for kk, t, v in rows if kk == key], key=lambda x: x[0]
    )
    vs = [v for _, v in mine_sorted]
    hh = [t.hour for t, _ in mine_sorted]
    return _brute(hh, vs)


def test_gk_gamma_planted_monotone(spark):
    """Value strictly rising with hour: every cross-hour pair is
    concordant -> gamma = somers = 1 (tau_b <= 1 via tie correction)."""
    rows = []
    i = 0
    for h in range(20):
        for j in range(3):
            rows.append(
                ("mono", BASE + dt.timedelta(hours=h, seconds=j), 10.0 * h + j)
            )
            i += 1
    r = gk_ordinal_assoc(_ev(spark, rows)).collect()[0]
    assert r["d_pairs"] == 0
    assert r["gamma"] == 1.0
    assert r["somers_dyx"] < 1.0  # hour ties without bucket ties exist
    assert 0.0 < r["tau_b"] < 1.0


def test_gk_gamma_single_hour_key(spark):
    """All rows in one hour-of-day: zero cross-hour pairs -> C = D =
    0, gamma NULL, somers 0 (denominator is bucket-tie-free pairs? no:
    t_all == t_x so somers NULL too)."""
    rows = [
        ("one", BASE + dt.timedelta(days=d, seconds=s), float(d * 7 + s))
        for d in range(4)
        for s in range(5)
    ]
    r = gk_ordinal_assoc(_ev(spark, rows)).collect()[0]
    assert (r["c_pairs"], r["d_pairs"]) == (0, 0)
    assert r["gamma"] is None
    assert r["somers_dyx"] is None
    assert r["tau_b"] is None
