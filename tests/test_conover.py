"""Conover squared-ranks scale test: brute-force parity (median
centers, doubled midranks, cleared moments), scale detection with
location invariance, degenerate-grid gate."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import numpy as np

from tits_spark.operators.conover import squared_ranks_test

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
    ca = sorted(round(v * 100) for v in vals_a)
    cb = sorted(round(v * 100) for v in vals_b)
    med_a = ca[(len(ca) + 1) // 2 - 1]
    med_b = cb[(len(cb) + 1) // 2 - 1]
    da = [abs(c - med_a) for c in ca]
    db = [abs(c - med_b) for c in cb]
    n, m = len(da), len(db)
    nn = n + m
    cnt = Counter()
    for d in da:
        cnt[(d, 1)] += 1
    for d in db:
        cnt[(d, 0)] += 1
    # doubled midranks over the merged deviation grid
    grid = sorted({d for d, _ in cnt})
    below = 0
    tsq = s1 = s2 = 0
    for d in grid:
        tca = cnt[(d, 1)]
        tcb = cnt[(d, 0)]
        t = tca + tcb
        rr = 2 * below + t + 1
        s = rr * rr
        tsq += tca * s
        s1 += t * s
        s2 += t * s * s
        below += t
    a = nn * tsq - n * s1
    b = n * m * (nn * s2 - s1 * s1)
    z = round(a / math.sqrt(b / (nn - 1)), 6) + 0.0
    return n, m, tsq, s1, z


def test_conover_brute_force_parity(spark):
    rng = np.random.default_rng(1009)
    rows, keys = [], {}
    for k in range(3):
        va = [float(v) for v in np.round(rng.normal(50, 5, 35), 2)]
        vb = [float(v) for v in np.round(rng.normal(60, 5 + 2 * k, 50), 2)]
        keys[f"k{k}"] = (va, vb)
        rows += _rows(f"k{k}", va, vb)
    got = {
        r["key"]: r for r in squared_ranks_test(_df(spark, rows)).collect()
    }
    for k, (va, vb) in keys.items():
        n, m, tsq, s1, z = _brute(va, vb)
        r = got[k]
        assert (r["n_a"], r["n_b"], r["t_sq"], r["s1"]) == (n, m, tsq, s1)
        assert r["z_sr"] == z


def test_conover_scale_sensitive_location_invariant(spark):
    rng = np.random.default_rng(1013)
    a = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    null_b = [float(v) for v in np.round(rng.normal(50, 5, 300), 2)]
    # pure location shift: medians absorb it -> z stays null-ish
    shift_b = [float(v + 20.0) for v in null_b]
    spread_b = [float(v) for v in np.round(rng.normal(50, 15, 300), 2)]
    rows = (
        _rows("null", a, null_b)
        + _rows("shift", a, shift_b)
        + _rows("spread", a, spread_b)
    )
    got = {
        r["key"]: r for r in squared_ranks_test(_df(spark, rows)).collect()
    }
    assert abs(got["null"]["z_sr"]) < 2.5
    assert abs(got["shift"]["z_sr"]) < 2.5
    # b-sample has MORE spread -> a-sample's squared-rank sum is small
    assert got["spread"]["z_sr"] < -5.0


def test_conover_degenerate_grid_drops(spark):
    rows = _rows("flat", [1.0] * 20, [1.0] * 20)
    assert squared_ranks_test(_df(spark, rows)).count() == 0
