"""Christoffersen independence test: brute-force parity against a
Python reference over the identical split/threshold protocol, planted
clustered-vs-scattered violation separation, boundary cells."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from tits_spark.operators.christoffersen import christoffersen

BASE = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _brute(values):
    """Mirror the operator: dedup is a no-op for distinct ts, split in
    half, threshold at est rank (99*n1)//100, transitions on the test
    half."""
    c = [round(v * 100) for v in values]
    n = len(c)
    n1 = n // 2
    est = sorted(c[:n1])
    u = est[max((99 * n1) // 100, 1) - 1]
    i = [1 if x > u else 0 for x in c[n1:]]
    n_test, x = len(i), sum(i)
    n00 = n01 = n10 = n11 = 0
    for a, b in zip(i, i[1:]):
        n00 += a == 0 and b == 0
        n01 += a == 0 and b == 1
        n10 += a == 1 and b == 0
        n11 += a == 1 and b == 1
    # Kupiec
    p = 0.01

    def xlnx(cnt, q):
        return cnt * math.log(q) if cnt > 0 else 0.0

    t1 = (n_test - x) * (math.log(1 - p) - math.log(1 - x / n_test)) \
        if x < n_test else 0.0
    t2 = x * (math.log(p) - math.log(x / n_test)) if x > 0 else 0.0
    lr_pof = round(-2.0 * (t1 + t2), 6) + 0.0
    mall = float(n00 + n01 + n10 + n11)
    pi = (n01 + n11) / mall
    lr_ind = None
    if (n00 + n01 > 0) and (n10 + n11 > 0):
        pi0 = n01 / (n00 + n01)
        pi1 = n11 / (n10 + n11)
        ll_null = xlnx(n00 + n10, 1 - pi) + xlnx(n01 + n11, pi)
        ll_alt = (
            xlnx(n00, 1 - pi0) + xlnx(n01, pi0)
            + xlnx(n10, 1 - pi1) + xlnx(n11, pi1)
        )
        lr_ind = round(2.0 * (ll_alt - ll_null), 6) + 0.0
    return n_test, x, n00, n01, n10, n11, lr_pof, lr_ind


def test_christoffersen_brute_force_parity(spark):
    rng = np.random.default_rng(73)
    rows, per_key = [], {}
    for k in range(3):
        vals = list(np.round(rng.normal(100, 5, size=120), 2))
        per_key[f"k{k}"] = vals
        rows += [
            (f"k{k}", BASE + dt.timedelta(seconds=i), float(v))
            for i, v in enumerate(vals)
        ]
    got = {r["key"]: r for r in christoffersen(_ev(spark, rows)).collect()}
    for k, vals in per_key.items():
        n_test, x, n00, n01, n10, n11, lr_pof, lr_ind = _brute(vals)
        r = got[k]
        assert (
            r["n_test"], r["x_viol"], r["n00"], r["n01"], r["n10"], r["n11"]
        ) == (n_test, x, n00, n01, n10, n11), k
        assert r["lr_pof"] == lr_pof
        if lr_ind is None:
            assert r["lr_ind"] is None and r["lr_cc"] is None
        else:
            assert r["lr_ind"] == lr_ind
            assert r["lr_cc"] == lr_pof + lr_ind + 0.0


def test_christoffersen_clustering_detected(spark):
    """Same violation COUNT, different arrangement: back-to-back
    violations (n11 > 0) blow up LR_ind; scattered ones keep it
    small. Values are engineered so the estimation half fixes u and
    the test half plants the pattern."""
    est = [100.0 + 0.01 * i for i in range(100)]  # u ~ 100.99
    spike = 200.0
    calm = 50.0
    clustered = est + [calm] * 90 + [spike] * 10
    gap = [calm] * 9 + [spike]
    scattered = est + gap * 10
    rows = []
    for key, vals in (("clus", clustered), ("scat", scattered)):
        rows += [
            (key, BASE + dt.timedelta(seconds=i), v)
            for i, v in enumerate(vals)
        ]
    got = {r["key"]: r for r in christoffersen(_ev(spark, rows)).collect()}
    assert got["clus"]["x_viol"] == got["scat"]["x_viol"] == 10
    assert got["clus"]["n11"] == 9
    assert got["scat"]["n11"] == 0
    assert got["clus"]["lr_ind"] > 20.0
    assert got["scat"]["lr_ind"] < 3.0
    # POF is arrangement-blind: identical on both keys
    assert got["clus"]["lr_pof"] == got["scat"]["lr_pof"]


def test_christoffersen_no_violation_boundary(spark):
    """A test half entirely below u: x = 0, n01 = n10 = n11 = 0 ->
    LR_ind undefined (NULL), LR_pof finite."""
    vals = [100.0 + 0.01 * i for i in range(80)] + [50.0] * 80
    rows = [
        ("flat", BASE + dt.timedelta(seconds=i), v)
        for i, v in enumerate(vals)
    ]
    r = christoffersen(_ev(spark, rows)).collect()[0]
    assert r["x_viol"] == 0
    assert r["n11"] == 0 and r["n01"] == 0 and r["n10"] == 0
    assert r["lr_ind"] is None and r["lr_cc"] is None
    assert r["lr_pof"] is not None
