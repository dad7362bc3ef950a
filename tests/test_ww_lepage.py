"""WW runs + Lepage: brute-force parity, planted separation (shift,
scale, interleave), pole cases."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.ww_runs import lepage_test, ww_runs_test

BASE = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, value double, is_a boolean"
    )


def _mk(key, a_vals, b_vals):
    rows = [
        (key, BASE + dt.timedelta(seconds=i), float(v), True)
        for i, v in enumerate(a_vals)
    ]
    rows += [
        (key, BASE + dt.timedelta(seconds=10_000 + i), float(v), False)
        for i, v in enumerate(b_vals)
    ]
    return rows


def _brute_runs(rows):
    """Merged (cents, us) order; count label runs."""
    seq = sorted(
        ((round(v * 100), ts, a) for _, ts, v, a in rows),
        key=lambda x: (x[0], x[1]),
    )
    labels = [a for _, _, a in seq]
    r = 1 + sum(1 for x, y in zip(labels, labels[1:]) if x != y)
    n1 = sum(labels)
    n2 = len(labels) - n1
    nn = n1 + n2
    mu = 2.0 * n1 * n2 / nn + 1.0
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
    return n1, n2, r, round((r - mu) / math.sqrt(var), 6) + 0.0


def _brute_lepage(a_vals, b_vals):
    allv = sorted(set(a_vals) | set(b_vals))
    n1, n2 = len(a_vals), len(b_vals)
    n = n1 + n2
    # doubled midranks per distinct value
    r2a = ab2 = 0
    prev = 0
    for v in allv:
        ca = a_vals.count(v)
        cb = b_vals.count(v)
        t = ca + cb
        rr = 2 * prev + t + 1
        s2 = min(rr, 2 * (n + 1) - rr)
        r2a += ca * rr
        ab2 += ca * s2
        prev += t
    u2 = r2a - n1 * (n1 + 1)
    var_u2 = n1 * n2 * (n + 1) / 3.0
    z_w = (u2 - n1 * n2) / math.sqrt(var_u2)
    if n % 2 == 0:
        e_ab2 = n1 * (n + 2) / 2.0
        var_ab2 = n1 * n2 * (n + 2) * (n - 2) / (12.0 * (n - 1))
    else:
        e_ab2 = n1 * (n + 1) * (n + 1) / (2.0 * n)
        var_ab2 = n1 * n2 * (n + 1) * (3.0 + n * n) / (12.0 * n * n)
    z_ab = (ab2 - e_ab2) / math.sqrt(var_ab2)
    return (
        u2, ab2,
        round(z_w, 6) + 0.0,
        round(z_ab, 6) + 0.0,
        round(z_w * z_w + z_ab * z_ab, 6) + 0.0,
    )


def test_ww_brute_force_parity(spark):
    rng = np.random.default_rng(139)
    a = list(np.round(rng.normal(10, 2, 25), 1))
    b = list(np.round(rng.normal(10, 2, 30), 1))
    rows = _mk("k", a, b)
    r = ww_runs_test(_df(spark, rows)).collect()[0]
    n1, n2, runs, z = _brute_runs(rows)
    assert (r["n_a"], r["n_b"], r["runs"]) == (n1, n2, runs)
    assert r["z"] == z


def test_lepage_brute_force_parity(spark):
    rng = np.random.default_rng(149)
    a = [float(v) for v in np.round(rng.normal(5, 1, 20), 1)]
    b = [float(v) for v in np.round(rng.normal(5, 1, 24), 1)]
    r = lepage_test(_df(spark, _mk("k", a, b))).collect()[0]
    u2, ab2, z_w, z_ab, lp = _brute_lepage(a, b)
    assert (r["u2"], r["ab2"]) == (u2, ab2)
    assert (r["z_w"], r["z_ab"], r["lepage"]) == (z_w, z_ab, lp)


def test_ww_separation(spark):
    """Disjoint supports: exactly 2 runs, strongly negative z;
    perfectly interleaved values: near-maximal runs, positive z."""
    sep = _mk("sep", [float(i) for i in range(20)],
              [float(100 + i) for i in range(20)])
    inter = _mk("int", [float(2 * i) for i in range(20)],
                [float(2 * i + 1) for i in range(20)])
    got = {r["key"]: r for r in ww_runs_test(_df(spark, sep + inter)).collect()}
    assert got["sep"]["runs"] == 2 and got["sep"]["z"] < -5
    assert got["int"]["runs"] == 40 and got["int"]["z"] > 5


def test_lepage_sees_scale_shift(spark):
    """Same median, very different spread: Wilcoxon near 0, AB large
    -> Lepage driven by the scale component."""
    rng = np.random.default_rng(151)
    tight = [round(50.0 + float(v), 1) for v in rng.normal(0, 0.5, 30)]
    wide = [round(50.0 + float(v), 1) for v in rng.normal(0, 8.0, 30)]
    r = lepage_test(_df(spark, _mk("k", tight, wide))).collect()[0]
    assert abs(r["z_w"]) < 2.0
    assert abs(r["z_ab"]) > 3.0
    assert r["lepage"] > 9.0
