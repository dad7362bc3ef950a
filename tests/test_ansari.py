"""Ansari-Bradley: brute-force parity (explicit per-row folded-rank
midscores vs the closed-form prefix masses + ppm lattice), scale
separation on planted spreads, tie handling, degenerate gate."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.ansari import ansari_bradley

BASE = dt.datetime(2024, 3, 1)


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


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
            (key, BASE + dt.timedelta(minutes=9000 + i), float(v), False)
        )
    return out


def _brute(vals_a, vals_b):
    ca = [round(v * 100) for v in vals_a]
    cb = [round(v * 100) for v in vals_b]
    n1, n2 = len(ca), len(cb)
    nn = n1 + n2
    cells = {}
    for v in ca:
        cells.setdefault(v, [0, 0])[0] += 1
    for v in cb:
        cells.setdefault(v, [0, 0])[1] += 1
    s_tot = sum(min(p, nn + 1 - p) for p in range(1, nn + 1))
    b = 0
    w_ppm = 0
    ssq_ppm = 0
    for c in sorted(cells):
        na, nb = cells[c]
        t = na + nb
        cs = sum(
            min(p, nn + 1 - p) for p in range(b + 1, b + t + 1)
        )
        w_ppm += math.floor(1e6 * (float(na) * float(cs)) / float(t))
        ssq_ppm += math.floor(
            1e6 * (float(cs) * float(cs)) / float(t)
        )
        b += t
    w = w_ppm / 1e6
    ssq = ssq_ppm / 1e6
    ew = n1 * float(s_tot) / nn
    var = (
        n1
        * n2
        * (nn * ssq - float(s_tot) * float(s_tot))
        / (nn * nn * (nn - 1.0))
    )
    z = _r6((w - ew) / math.sqrt(var)) if var > 0 else None
    return n1, n2, s_tot, w_ppm, ssq_ppm, z


def test_ab_brute_force_parity_with_ties(spark):
    rng = np.random.default_rng(1601)
    rows, keys = [], {}
    for k in range(4):
        va = [float(v) for v in np.round(rng.normal(50, 2 + k, 30), 1)]
        vb = [float(v) for v in np.round(rng.normal(50, 4, 45), 1)]
        keys[f"k{k}"] = (va, vb)
        rows += _rows(f"k{k}", va, vb)
    got = {r["key"]: r for r in ansari_bradley(_df(spark, rows)).collect()}
    for k, (va, vb) in keys.items():
        n1, n2, s_tot, w_ppm, ssq_ppm, z = _brute(va, vb)
        r = got[k]
        assert (
            r["n_a"], r["n_b"], r["s_tot"], r["w_ppm"], r["ssq_ppm"],
        ) == (n1, n2, s_tot, w_ppm, ssq_ppm)
        assert r["ab_z"] == z


def test_ab_scale_separation(spark):
    rng = np.random.default_rng(1607)
    # sample A much TIGHTER than B: A sits mid-ranks -> high scores
    # -> z strongly positive; same-scale control stays near 0
    a = [float(v) for v in np.round(rng.normal(50, 1, 150), 2)]
    wide_b = [float(v) for v in np.round(rng.normal(50, 8, 200), 2)]
    same_b = [float(v) for v in np.round(rng.normal(50, 1, 200), 2)]
    rows = _rows("wide", a, wide_b) + _rows("same", a, same_b)
    got = {r["key"]: r for r in ansari_bradley(_df(spark, rows)).collect()}
    assert got["wide"]["ab_z"] > 4.0
    assert abs(got["same"]["ab_z"]) < 2.5


def test_ab_all_tied_degenerate(spark):
    rows = _rows("t", [5.0] * 12, [5.0] * 15)
    r = ansari_bradley(_df(spark, rows)).collect()[0]
    assert r["ab_z"] is None


def test_ab_min_each_gate(spark):
    rows = _rows("g", [1.0, 2.0], [3.0] * 30)
    assert ansari_bradley(_df(spark, rows)).collect() == []
