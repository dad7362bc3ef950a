"""BWS tail-weighted EDF test: brute-force parity on the quantized
lattice, null ~ E[B] = 1 behavior, location/scale/tail sensitivity."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.bws import bws_test

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
    a = [(round(v * 100), i, 1) for i, v in enumerate(vals_a)]
    b = [(round(v * 100), 10000 + i, 0) for i, v in enumerate(vals_b)]
    merged = sorted(a + b, key=lambda x: (x[0], x[1], x[2]))
    nn = len(merged)
    qs = {1: 0, 0: 0}
    idx = {1: 0, 0: 0}
    sizes = {1: len(a), 0: len(b)}
    for r, (_, _, lab) in enumerate(merged, 1):
        idx[lab] += 1
        i = idx[lab]
        n = sizes[lab]
        m = nn - n
        num = (n * r - nn * i) ** 2 * (n + 1) ** 2
        den = n * n * i * (n + 1 - i) * m * nn
        qs[lab] += math.floor(1_000_000.0 * float(num) / float(den))
    # B lives on the micro lattice to the end: floor the odd half
    micro = (qs[1] + qs[0]) // 2
    return sizes[1], sizes[0], qs[1], qs[0], micro / 1e6


def test_bws_brute_force_parity(spark):
    rng = np.random.default_rng(907)
    rows, keys = [], {}
    for k in range(3):
        va = [float(v) for v in np.round(rng.normal(50, 5, 40), 2)]
        vb = [float(v) for v in np.round(rng.normal(50 + k, 6, 55), 2)]
        keys[f"k{k}"] = (va, vb)
        rows += _rows(f"k{k}", va, vb)
    got = {r["key"]: r for r in bws_test(_df(spark, rows)).collect()}
    for k, (va, vb) in keys.items():
        n, m, qa, qb, bws = _brute(va, vb)
        r = got[k]
        assert (r["n_a"], r["n_b"], r["bq_a"], r["bq_b"]) == (n, m, qa, qb)
        assert r["bws_b"] == bws


def test_bws_null_and_alternatives(spark):
    rng = np.random.default_rng(911)
    same_a = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    same_b = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    shift_b = [float(v) for v in np.round(rng.normal(53, 5, 300), 2)]
    # pure tail difference: same core and mean, 15% far outliers
    tail_b = same_b[:255] + [
        float(v) for v in np.round(rng.normal(50, 60, 45), 2)
    ]
    rows = (
        _rows("null", same_a, same_b)
        + _rows("shift", same_a, shift_b)
        + _rows("tail", same_a, tail_b)
    )
    got = {r["key"]: r for r in bws_test(_df(spark, rows)).collect()}
    assert got["null"]["bws_b"] < 2.5  # 5% critical value
    assert got["shift"]["bws_b"] > 4 * got["null"]["bws_b"]
    assert got["tail"]["bws_b"] > 2.5
