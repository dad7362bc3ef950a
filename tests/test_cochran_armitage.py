"""Cochran-Armitage: brute parity on the cleared lattice, planted
monotone trend vs flat-rate null vs non-monotone (U-shape) weakness,
degenerate gates."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from tits_spark.operators.cmh import cochran_armitage_hourly


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    import datetime as dt

    BASE = dt.datetime(2024, 3, 1)
    out = []
    for i, (k, h, is_err) in enumerate(rows):
        out.append(
            (
                k,
                BASE + dt.timedelta(hours=int(h), days=i % 7, minutes=i % 59),
                "error" if is_err else "click",
            )
        )
    return spark.createDataFrame(
        out, "user_id string, ts timestamp, event_type string"
    )


def _brute(rows):
    cell = defaultdict(lambda: [0, 0])
    for h, is_err in rows:
        cell[h][0] += 1
        cell[h][1] += int(is_err)
    n = sum(v[0] for v in cell.values())
    x = sum(v[1] for v in cell.values())
    sx = sum(h * v[1] for h, v in cell.items())
    sn = sum(h * v[0] for h, v in cell.items())
    sn2 = sum(h * h * v[0] for h, v in cell.items())
    num = n * sx - x * sn
    rad = (x * (n - x)) * (n * sn2 - sn * sn)
    z = (
        _r6(float(num) * math.sqrt(float(n)) / math.sqrt(float(rad)))
        if rad > 0
        else None
    )
    return n, x, num, z


def test_ca_brute_parity(spark):
    rng = np.random.default_rng(3403)
    rows, keys = [], {}
    for k in range(3):
        kr = []
        for h in range(24):
            for _ in range(rng.integers(3, 9)):
                kr.append((h, bool(rng.random() < 0.1 + 0.02 * h)))
        keys[f"k{k}"] = kr
        rows += [(f"k{k}", h, e) for h, e in kr]
    got = {
        r["key"]: r
        for r in cochran_armitage_hourly(_df(spark, rows)).collect()
    }
    for k, kr in keys.items():
        n, x, num, z = _brute(kr)
        r = got[k]
        assert (r["n"], r["x"], r["trend_num"]) == (n, x, num)
        assert r["ca_z"] == z


def test_ca_trend_vs_flat_vs_ushape(spark):
    rng = np.random.default_rng(3407)
    mk = lambda f: [
        (h, bool(rng.random() < f(h))) for h in range(24) for _ in range(40)
    ]
    rows = [("up", h, e) for h, e in mk(lambda h: 0.05 + 0.02 * h)]
    rows += [("flat", h, e) for h, e in mk(lambda h: 0.25)]
    # U-shape: strong dependence, ~no monotone component
    rows += [("u", h, e) for h, e in mk(lambda h: 0.05 + 0.03 * abs(h - 11.5))]
    got = {
        r["key"]: r
        for r in cochran_armitage_hourly(_df(spark, rows)).collect()
    }
    assert got["up"]["ca_z"] > 6
    assert abs(got["flat"]["ca_z"]) < 2.5
    assert abs(got["u"]["ca_z"]) < abs(got["up"]["ca_z"]) / 2


def test_ca_degenerate(spark):
    rows = [("allerr", h, True) for h in range(24) for _ in range(5)]
    r = cochran_armitage_hourly(_df(spark, rows)).collect()[0]
    assert r["ca_z"] is None
