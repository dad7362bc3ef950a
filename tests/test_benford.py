"""Benford audit: brute-force parity on random data, a conforming
log-uniform sample scores low chi2, a uniform-cents sample scores
high, digit extraction and min_n gating."""

from __future__ import annotations

import numpy as np

from tits_spark.operators.benford import BENFORD_PPM, benford_audit


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, value double")


def _brute(values):
    cents = [round(v * 100) for v in values]
    cents = [c for c in cents if c > 0]
    n = len(cents)
    nd = [0] * 10
    for c in cents:
        nd[int(str(c)[0])] += 1
    chi2 = 0.0
    for d in range(1, 10):
        e = BENFORD_PPM[d - 1]
        num = 10**6 * nd[d] - n * e
        chi2 += (num * num) / float(10**6 * n * e)
    mad = (
        sum(
            abs(nd[d] * 10**6 // n - BENFORD_PPM[d - 1])
            for d in range(1, 10)
        )
        // 9
    )
    return n, nd[1:], round(chi2, 6) + 0.0, mad


def test_benford_brute_force_parity(spark):
    rng = np.random.default_rng(211)
    per_key, rows = {}, []
    for k in range(3):
        # log-uniform across 3 decades: close to Benford but not exact
        vals = [
            float(np.round(10 ** rng.uniform(-1, 2), 2))
            for _ in range(200)
        ]
        per_key[f"k{k}"] = vals
        rows += [(f"k{k}", v) for v in vals]
    got = {r["key"]: r for r in benford_audit(_df(spark, rows)).collect()}
    for k, vals in per_key.items():
        n, nd, chi2, mad = _brute(vals)
        r = got[k]
        assert r["n"] == n
        assert [r[f"n{d}"] for d in range(1, 10)] == nd
        assert r["chi2"] == chi2
        assert r["mad_ppm"] == mad


def test_benford_separates_conforming_from_uniform(spark):
    rng = np.random.default_rng(223)
    conform = [
        ("log", float(np.round(10 ** rng.uniform(0, 3), 2)))
        for _ in range(3000)
    ]
    # uniform cents on [1000, 9999]: every first digit equally likely
    uniform = [
        ("uni", float(rng.integers(1000, 10000)) / 100.0)
        for _ in range(3000)
    ]
    got = {
        r["key"]: r
        for r in benford_audit(_df(spark, conform + uniform)).collect()
    }
    assert got["log"]["chi2"] < got["uni"]["chi2"] / 10
    assert got["log"]["mad_ppm"] < got["uni"]["mad_ppm"]


def test_benford_digit_extraction_and_gates(spark):
    # 0.05 -> 5 cents -> digit 5; 123.45 -> 12345 -> digit 1;
    # zero/negative values are excluded
    rows = (
        [("a", 0.05)] * 30
        + [("a", 123.45)] * 30
        + [("a", -7.0), ("a", 0.0)]
        + [("b", 1.0)] * 10  # below min_n -> dropped
    )
    out = benford_audit(_df(spark, rows), min_n=50).collect()
    assert len(out) == 1
    r = out[0]
    assert r["key"] == "a" and r["n"] == 60
    assert r["n5"] == 30 and r["n1"] == 30
    assert sum(r[f"n{d}"] for d in range(1, 10)) == 60
