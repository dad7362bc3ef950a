"""Cliff's delta / Vargha-Delaney A: brute-force all-pairs parity,
cross-check against mann_whitney's doubled-U identity, planted
dominance extremes and tie saturation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tits_spark.operators.effect_size import cliffs_delta
from tits_spark.operators.rank_tests import mann_whitney


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, value double, is_a boolean"
    )


def _brute(a_vals, b_vals):
    gt = sum(1 for a in a_vals for b in b_vals if a > b)
    lt = sum(1 for a in a_vals for b in b_vals if a < b)
    eq = sum(1 for a in a_vals for b in b_vals if a == b)
    n = len(a_vals) * len(b_vals)
    return gt, lt, eq, round((gt - lt) / n, 6) + 0.0, round(
        (2 * gt + eq) / (2.0 * float(n)), 6
    ) + 0.0


def test_cliffs_delta_brute_force_parity(spark):
    rng = np.random.default_rng(83)
    rows, per_key = [], {}
    for k in range(3):
        a = list(np.round(rng.normal(10, 3, 40), 1))
        b = list(np.round(rng.normal(9, 3, 55), 1))
        per_key[f"k{k}"] = (a, b)
        rows += [(f"k{k}", float(v), True) for v in a]
        rows += [(f"k{k}", float(v), False) for v in b]
    got = {r["key"]: r for r in cliffs_delta(_df(spark, rows)).collect()}
    for k, (a, b) in per_key.items():
        gt, lt, eq, delta, vda = _brute(a, b)
        r = got[k]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        assert (r["n_gt"], r["n_lt"], r["n_eq"]) == (gt, lt, eq), k
        assert r["cliffs_delta"] == delta
        assert r["vd_a"] == vda


def test_cliffs_delta_mann_whitney_identity(spark):
    """delta == 2*U_A/(n_a*n_b) - 1 with U_A = u2/2 from the
    mann_whitney family — both ride the same tie grid."""
    rng = np.random.default_rng(89)
    rows = [
        ("k", float(v), bool(i % 3 == 0))
        for i, v in enumerate(np.round(rng.normal(0, 1, 90), 1))
    ]
    df = _df(spark, rows)
    d = cliffs_delta(df).collect()[0]
    u = mann_whitney(df).collect()[0]
    na, nb = d["n_a"], d["n_b"]
    assert round(u["u2"] / (2.0 * na * nb) * 2 - 1, 6) == round(
        (d["n_gt"] - d["n_lt"]) / (na * nb), 6
    )


def test_cliffs_delta_extremes(spark):
    rows = [("dom", float(10 + i), True) for i in range(5)]
    rows += [("dom", float(i), False) for i in range(5)]
    rows += [("tie", 7.0, True)] * 4 + [("tie", 7.0, False)] * 6
    got = {r["key"]: r for r in cliffs_delta(_df(spark, rows)).collect()}
    assert got["dom"]["cliffs_delta"] == 1.0
    assert got["dom"]["vd_a"] == 1.0
    assert got["tie"]["cliffs_delta"] == 0.0
    assert got["tie"]["vd_a"] == 0.5
    assert got["tie"]["n_eq"] == 24


def test_cliffs_delta_one_sided_drop(spark):
    rows = [("only_a", 1.0, True), ("both", 1.0, True), ("both", 2.0, False)]
    out = cliffs_delta(_df(spark, rows))
    keys = [r["key"] for r in out.collect()]
    assert keys == ["both"]
