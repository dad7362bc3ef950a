"""Jonckheere–Terpstra: brute-force pair-enumeration parity
(statistic AND tie-corrected moments), monotone-drift detection vs
null, direction sign, gates."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import numpy as np

from tits_spark.operators.jonckheere import jonckheere_daypart

BASE = dt.datetime(2024, 4, 1)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _mk(key, per_part):
    """per_part: dict daypart(0..5) -> list of values."""
    rows = []
    for g, vals in per_part.items():
        for i, v in enumerate(vals):
            rows.append(
                (
                    key,
                    BASE + dt.timedelta(hours=4 * g, seconds=i),
                    float(v),
                )
            )
    return rows


def _brute(per_part):
    groups = [
        [round(v * 100) for v in per_part.get(g, [])] for g in range(6)
    ]
    jt2 = 0
    for i in range(6):
        for j in range(i + 1, 6):
            for x in groups[i]:
                for y in groups[j]:
                    jt2 += 2 * (x < y) + (x == y)
    ns = [len(g) for g in groups]
    n = sum(ns)
    e4 = n * n - sum(x * x for x in ns)
    ties = Counter(x for g in groups for x in g)
    t1 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    t2 = sum(t * (t - 1) * (t - 2) for t in ties.values())
    t3 = sum(t * (t - 1) for t in ties.values())
    g1 = sum(x * (x - 1) * (2 * x + 5) for x in ns)
    g2 = sum(x * (x - 1) * (x - 2) for x in ns)
    g3 = sum(x * (x - 1) for x in ns)
    a = n * (n - 1) * (2 * n + 5) - g1 - t1
    var = (
        a / 72.0
        + (g2 * t2) / (36.0 * (n * (n - 1) * (n - 2)))
        + (g3 * t3) / (8.0 * (n * (n - 1)))
    )
    z = round((2.0 * jt2 - e4) / (4.0 * math.sqrt(var)), 6) + 0.0
    return n, jt2, e4, z


def test_jt_brute_force_parity(spark):
    rng = np.random.default_rng(811)
    rows, keys = [], {}
    for k in range(3):
        per_part = {
            g: [
                float(v)
                for v in np.round(rng.normal(50 + k * g, 4, 12), 1)
            ]
            for g in range(6)
        }
        keys[f"k{k}"] = per_part
        rows += _mk(f"k{k}", per_part)
    got = {
        r["key"]: r for r in jonckheere_daypart(_df(spark, rows)).collect()
    }
    for k, per_part in keys.items():
        n, jt2, e4, z = _brute(per_part)
        r = got[k]
        assert (r["n"], r["jt2"], r["e4"]) == (n, jt2, e4)
        assert r["z_jt"] == z


def test_jt_detects_monotone_drift(spark):
    rng = np.random.default_rng(821)
    up = {
        g: [float(v) for v in np.round(rng.normal(50 + 3 * g, 5, 40), 2)]
        for g in range(6)
    }
    down = {
        g: [float(v) for v in np.round(rng.normal(65 - 3 * g, 5, 40), 2)]
        for g in range(6)
    }
    flat = {
        g: [float(v) for v in np.round(rng.normal(55, 5, 40), 2)]
        for g in range(6)
    }
    rows = _mk("up", up) + _mk("down", down) + _mk("flat", flat)
    got = {
        r["key"]: r for r in jonckheere_daypart(_df(spark, rows)).collect()
    }
    assert got["up"]["z_jt"] > 5.0
    assert got["down"]["z_jt"] < -5.0
    assert abs(got["flat"]["z_jt"]) < 2.5


def test_jt_gates(spark):
    # single nonempty daypart -> dropped; tiny n -> dropped
    rows = _mk("one", {2: [1.0 + i for i in range(40)]})
    rows += _mk("small", {0: [1.0], 5: [2.0]})
    assert jonckheere_daypart(_df(spark, rows)).count() == 0
