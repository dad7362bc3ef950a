"""Lilliefors: brute-force replay parity (same A&S tree), polynomial
accuracy vs math.erf, power on skewed data vs calibrated size on
normal data, zero-variance gate."""

from __future__ import annotations

import math

import numpy as np

from tits_spark.operators.normality import lilliefors


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _phi(z):
    x = abs(z) / 1.4142135623730951
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (
        (
            ((1.061405429 * t + -1.453152027) * t + 1.421413741) * t
            + -0.284496736
        ) * t
        + 0.254829592
    ) * t
    erf = 1.0 - poly * math.exp(-(x * x))
    sgn = -1.0 if z < 0 else 1.0
    return 0.5 * (1.0 + sgn * erf)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, value double")


def _brute(vals):
    cents = sorted(
        (round(v * 100), 1) for v in vals
    )
    from collections import Counter

    cell = Counter(c for c, _ in cents)
    n = sum(cell.values())
    s1 = sum(c * t for c, t in cell.items())
    s2 = sum(c * c * t for c, t in cell.items())
    mean = s1 / n
    var = (n * float(s2) - float(s1) * float(s1)) / (n * (n - 1.0))
    if not var > 0:
        return n, None, None, None, None
    s = math.sqrt(var)
    b = 0
    dp = dm = -math.inf
    for c in sorted(cell):
        t = cell[c]
        a = b
        b += t
        ph = _phi((c - mean) / s)
        dp = max(dp, b / n - ph)
        dm = max(dm, ph - a / n)
    d = max(dp, dm)
    rn = math.sqrt(n)
    return n, _r6(dp), _r6(dm), _r6(d), _r6(d * (rn - 0.01 + 0.85 / rn))


def test_phi_polynomial_accuracy():
    for z in np.linspace(-5, 5, 401):
        assert abs(_phi(z) - 0.5 * (1 + math.erf(z / math.sqrt(2)))) < 2e-7


def test_lilliefors_brute_parity(spark):
    rng = np.random.default_rng(2803)
    rows, keys = [], {}
    for k, gen in enumerate(
        [
            lambda: rng.normal(50, 3, 120),
            lambda: rng.exponential(10, 150) + 30,
            lambda: rng.uniform(0, 100, 90),
        ]
    ):
        vals = [float(v) for v in np.round(gen(), 2)]
        keys[f"k{k}"] = vals
        rows += [(f"k{k}", v) for v in vals]
    got = {r["key"]: r for r in lilliefors(_df(spark, rows)).collect()}
    for k, vals in keys.items():
        n, dp, dm, d, dmod = _brute(vals)
        r = got[k]
        assert r["n"] == n
        assert (r["d_plus"], r["d_minus"], r["d_stat"], r["d_mod"]) == (
            dp, dm, d, dmod,
        )


def test_lilliefors_power_and_size(spark):
    rng = np.random.default_rng(2811)
    rows = [
        ("norm", float(v)) for v in np.round(rng.normal(50, 5, 400), 2)
    ]
    rows += [
        ("expo", float(v))
        for v in np.round(rng.exponential(5, 400), 2)
    ]
    got = {r["key"]: r for r in lilliefors(_df(spark, rows)).collect()}
    assert got["norm"]["d_mod"] < 0.895  # below the 5% point
    assert got["expo"]["d_mod"] > 1.035  # beyond the 1% point


def test_lilliefors_zero_variance(spark):
    rows = [("flat", 5.0)] * 30
    r = lilliefors(_df(spark, rows)).collect()[0]
    assert r["d_stat"] is None and r["d_mod"] is None
