"""Watson U^2: exact-lattice parity vs a Fraction-based textbook
replay, rotation invariance (the property that distinguishes U^2
from plain CvM), bimodal-vs-rayleigh power, min-n gate."""

from __future__ import annotations

import datetime as dt
from fractions import Fraction

import numpy as np

from tits_spark.operators.circular import watson_u2

BASE = dt.datetime(2024, 3, 1)
DAY_US = 86_400_000_000


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp")


def _rows(key, us_list):
    return [
        (key, BASE + dt.timedelta(days=i % 3, microseconds=int(u)))
        for i, u in enumerate(us_list)
    ]


def _brute(us_list):
    """Textbook U^2 with exact Fractions on u = U/D."""
    us = sorted(int(u) % DAY_US for u in us_list)
    n = len(us)
    u = [Fraction(x, DAY_US) for x in us]
    w2 = (
        sum(
            (ui - Fraction(2 * i + 1, 2 * n)) ** 2
            for i, ui in enumerate(u)
        )
        + Fraction(1, 12 * n)
    )
    ubar = sum(u) / n
    u2 = w2 - n * (ubar - Fraction(1, 2)) ** 2
    # the operator's one float division + round
    num = None  # value-level compare through the float
    t = float(u2)
    star = (t - 0.1 / n + 0.1 / n**2) * (1 + 0.8 / n)
    return sum(us), _r6(t), star


def test_watson_exact_fraction_parity(spark):
    rng = np.random.default_rng(2303)
    rows, keys = [], {}
    for k in range(3):
        us = rng.integers(0, DAY_US, 80).tolist()
        us += us[:7]  # force exact-us ties across the lattice
        keys[f"k{k}"] = us
        rows += _rows(f"k{k}", us)
    got = {r["key"]: r for r in watson_u2(_df(spark, rows)).collect()}
    for k, us in keys.items():
        is_sum, u2, star = _brute(us)
        r = got[k]
        assert r["n"] == len(us)
        assert r["is_sum"] == is_sum
        # operator: exact integer num -> one double division; brute:
        # exact Fraction -> float. Agreement to a double ulp.
        assert abs(r["u2"] - u2) <= 2e-6
        assert abs(r["u2_star"] - star) <= 5e-6


def test_watson_rotation_invariance(spark):
    """Rotating every angle by the same offset must not change U^2
    (Watson's defining property; plain CvM fails this)."""
    rng = np.random.default_rng(2311)
    us = rng.integers(0, DAY_US // 4, 120).tolist()  # concentrated
    rot = [(u + 7 * 3600 * 1_000_000) % DAY_US for u in us]
    rows = _rows("orig", us) + _rows("rot", rot)
    got = {r["key"]: r for r in watson_u2(_df(spark, rows)).collect()}
    assert abs(got["orig"]["u2"] - got["rot"]["u2"]) < 2e-6


def test_watson_catches_bimodal_where_rayleigh_fails(spark):
    """Two opposite tight phases: resultant cancels (Rayleigh ~ 0)
    but U^2 is far beyond the 0.267 1% point; uniform stays below."""
    from tits_spark.operators.circular import rayleigh_uniformity

    rng = np.random.default_rng(2333)
    half = DAY_US // 2
    spread = DAY_US // 100
    bim = [
        int((i % 2) * half + rng.integers(0, spread)) for i in range(200)
    ]
    uni = rng.integers(0, DAY_US, 200).tolist()
    rows = _rows("bim", bim) + _rows("uni", uni)
    df = _df(spark, rows)
    got = {r["key"]: r for r in watson_u2(df).collect()}
    assert got["bim"]["u2_star"] > 0.267
    assert got["uni"]["u2_star"] < 0.187
    ray = {
        r["key"]: r
        for r in rayleigh_uniformity(df, key="key").collect()
    }
    assert ray["bim"]["z"] < 3.0  # blind to the bimodal


def test_watson_min_n_gate(spark):
    rows = _rows("tiny", list(range(0, 40 * 1000, 1000)))
    assert watson_u2(_df(spark, rows)).collect() == []
