"""Two-sample Cramér–von Mises: brute-force rank parity, near-1/6
null behavior, sensitivity to location AND pure scale shifts, the
full-tie assignment invariance."""

from __future__ import annotations

import datetime as dt

import numpy as np

from tits_spark.operators.cvm import cvm_two_sample

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


def _brute(vals_a, vals_b):
    # deterministic (cents, us, label) total order; us encodes insert
    # order per construction above (a-sample first)
    a = [(round(v * 100), i, 1) for i, v in enumerate(vals_a)]
    b = [(round(v * 100), 10000 + i, 0) for i, v in enumerate(vals_b)]
    merged = sorted(a + b, key=lambda x: (x[0], x[1], x[2]))
    n, m = len(a), len(b)
    nn = n + m
    ia = ib = 0
    sqa = sqb = 0
    for r, (_, _, lab) in enumerate(merged, 1):
        if lab == 1:
            ia += 1
            sqa += (r - ia) ** 2
        else:
            ib += 1
            sqb += (r - ib) ** 2
    u = n * sqa + m * sqb
    t = round(u / (n * m * nn) - (4 * n * m - 1) / (6 * nn), 6) + 0.0
    return n, m, sqa, sqb, t


def test_cvm_brute_force_parity(spark):
    rng = np.random.default_rng(307)
    rows, keys = [], {}
    for k in range(3):
        va = [float(v) for v in np.round(rng.normal(50, 5, 40), 2)]
        vb = [float(v) for v in np.round(rng.normal(50 + k, 5, 55), 2)]
        keys[f"k{k}"] = (va, vb)
        rows += _rows(f"k{k}", va, vb)
    got = {r["key"]: r for r in cvm_two_sample(_df(spark, rows)).collect()}
    for k, (va, vb) in keys.items():
        n, m, sqa, sqb, t = _brute(va, vb)
        r = got[k]
        assert (r["n_a"], r["n_b"], r["sq_a"], r["sq_b"]) == (n, m, sqa, sqb)
        assert r["cvm_t"] == t


def test_cvm_null_location_and_scale(spark):
    rng = np.random.default_rng(311)
    same_a = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    same_b = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    shift_b = [float(v) for v in np.round(rng.normal(54, 5, 300), 2)]
    # pure scale: same mean, tripled spread — invisible to a rank-mean
    scale_b = [float(v) for v in np.round(rng.normal(50, 15, 300), 2)]
    rows = (
        _rows("null", same_a, same_b)
        + _rows("shift", same_a, shift_b)
        + _rows("scale", same_a, scale_b)
    )
    got = {r["key"]: r for r in cvm_two_sample(_df(spark, rows)).collect()}
    assert got["null"]["cvm_t"] < 0.4  # E[T] ~ 1/6 under H0
    assert got["shift"]["cvm_t"] > 10 * got["null"]["cvm_t"]
    assert got["scale"]["cvm_t"] > 3 * got["null"]["cvm_t"]


def test_cvm_full_tie_invariance(spark):
    # rows fully tied in (cents, us, label) are interchangeable: the
    # statistic must not depend on their internal assignment
    ts0 = BASE
    rows = [
        ("t", ts0, 1.00, True),
        ("t", ts0, 1.00, True),
        ("t", ts0, 1.00, False),
        ("t", ts0, 1.00, False),
    ] * 5 + _rows("t", [2.0] * 10, [3.0] * 10)
    out = cvm_two_sample(_df(spark, rows), min_each=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] == 20 and r["n_b"] == 20
    # rerun: deterministic
    r2 = cvm_two_sample(_df(spark, rows), min_each=5).collect()[0]
    assert r.asDict() == r2.asDict()
