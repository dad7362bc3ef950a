"""Brunner–Munzel: brute-force parity on the doubled placement
lattice, agreement with the lawstat algebra on tied data,
heteroscedastic validity (null with unequal variances stays null),
p_hat semantics, degenerate gate."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.brunner_munzel import brunner_munzel

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


def _mid2(vals, pool):
    """Doubled midranks of vals within pool (sorted list)."""
    out = []
    for v in vals:
        below = sum(1 for x in pool if x < v)
        ties = sum(1 for x in pool if x == v)
        out.append(2 * below + ties + 1)
    return out


def _brute(vals_a, vals_b):
    ca = [round(v * 100) for v in vals_a]
    cb = [round(v * 100) for v in vals_b]
    pool = sorted(ca + cb)
    n1, n2 = len(ca), len(cb)
    nn = n1 + n2
    rr1 = _mid2(ca, pool)
    rr2 = _mid2(cb, pool)
    h1 = _mid2(ca, sorted(ca))
    h2 = _mid2(cb, sorted(cb))
    d1 = [r - h for r, h in zip(rr1, h1)]
    d2 = [r - h for r, h in zip(rr2, h2)]
    a1 = n1 * sum(x * x for x in d1) - sum(d1) ** 2
    a2 = n2 * sum(x * x for x in d2) - sum(d2) ** 2
    num = n1 * sum(rr2) - n2 * sum(rr1)
    nv1 = a1 / (4.0 * (n1 - 1))
    nv2 = a2 / (4.0 * (n2 - 1))
    vsum = nv1 + nv2
    if a1 + a2 == 0:
        bm = dfree = None
    else:
        bm = round(num / (2.0 * nn * math.sqrt(vsum)), 6) + 0.0
        dfree = round(
            vsum * vsum / (nv1 * nv1 / (n1 - 1) + nv2 * nv2 / (n2 - 1)), 6
        ) + 0.0
    phat = round((sum(rr2) - n2 * (n2 + 1)) / (2.0 * n1 * n2), 6) + 0.0
    return n1, n2, a1, a2, phat, bm, dfree


def test_bm_brute_force_parity_with_ties(spark):
    rng = np.random.default_rng(1303)
    rows, keys = [], {}
    for k in range(3):
        # coarse lattice (1 decimal) -> plenty of ties
        va = [float(v) for v in np.round(rng.normal(50, 2, 35), 1)]
        vb = [float(v) for v in np.round(rng.normal(50 + k, 4, 50), 1)]
        keys[f"k{k}"] = (va, vb)
        rows += _rows(f"k{k}", va, vb)
    got = {r["key"]: r for r in brunner_munzel(_df(spark, rows)).collect()}
    for k, (va, vb) in keys.items():
        n1, n2, a1, a2, phat, bm, dfree = _brute(va, vb)
        r = got[k]
        assert (r["n_a"], r["n_b"], r["a1"], r["a2"]) == (n1, n2, a1, a2)
        assert r["p_hat"] == phat
        assert r["bm_w"] == bm
        assert r["bm_df"] == dfree


def test_bm_heteroscedastic_null_and_shift(spark):
    rng = np.random.default_rng(1307)
    # same center, very different spreads: BM must stay null-ish
    a = [float(v) for v in np.round(rng.normal(50, 2, 200), 2)]
    het_b = [float(v) for v in np.round(rng.normal(50, 20, 400), 2)]
    shift_b = [float(v) for v in np.round(rng.normal(52, 2, 400), 2)]
    rows = _rows("het", a, het_b) + _rows("shift", a, shift_b)
    got = {r["key"]: r for r in brunner_munzel(_df(spark, rows)).collect()}
    assert abs(got["het"]["bm_w"]) < 2.5
    assert abs(got["het"]["p_hat"] - 0.5) < 0.06
    assert abs(got["shift"]["bm_w"]) > 5.0
    assert got["shift"]["p_hat"] > 0.6


def test_bm_degenerate_separation(spark):
    # complete separation: placements constant in both samples
    rows = _rows("sep", [1.0 + 0.01 * i for i in range(12)],
                 [50.0 + 0.01 * i for i in range(12)])
    out = brunner_munzel(_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bm_w"] is None and r["bm_df"] is None
    assert r["p_hat"] == 1.0
