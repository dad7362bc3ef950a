"""Welch ANOVA: brute parity on the fixed-order pivot trees,
heteroscedastic validity vs the classical F assumption, gates."""

from __future__ import annotations

import math

import numpy as np

from tits_spark.operators.anova import welch_anova_types

GROUPS = ("click", "error", "purchase", "signup", "view")


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, value double, grp string")


def _brute(groups):
    """groups: {name: [values]} over the full alphabet."""
    k = len(GROUPS)
    stats = {}
    for g in GROUPS:
        cs = [round(v * 100) for v in groups[g]]
        n = len(cs)
        s1 = sum(cs)
        s2 = sum(c * c for c in cs)
        m = s1 / n
        var = (n * float(s2) - float(s1) * float(s1)) / (n * (n - 1.0))
        if not var > 0:
            return None
        stats[g] = (n, m, var, n / var)
    sw = 0.0
    for g in GROUPS:
        sw = sw + stats[g][3]
    swm = 0.0
    for g in GROUPS:
        swm = swm + stats[g][3] * stats[g][1]
    mw = swm / sw
    a = 0.0
    for g in GROUPS:
        a = a + stats[g][3] * ((stats[g][1] - mw) * (stats[g][1] - mw))
    hh = 0.0
    for g in GROUPS:
        t = 1.0 - stats[g][3] / sw
        hh = hh + (t * t) / (stats[g][0] - 1.0)
    fstar = (a / float(k - 1)) / (1.0 + (2.0 * (k - 2) / (k * k - 1.0)) * hh)
    df2 = float(k * k - 1) / (3.0 * hh)
    ntot = sum(stats[g][0] for g in GROUPS)
    return ntot, _r6(fstar), _r6(df2)


def test_welch_anova_brute_parity(spark):
    rng = np.random.default_rng(3103)
    rows, keys = [], {}
    for ki in range(3):
        groups = {
            g: [
                float(v)
                for v in np.round(rng.normal(50 + 2 * i, 2 + i, 20 + 5 * i), 2)
            ]
            for i, g in enumerate(GROUPS)
        }
        keys[f"k{ki}"] = groups
        rows += [(f"k{ki}", v, g) for g, vs in groups.items() for v in vs]
    got = {r["key"]: r for r in welch_anova_types(_df(spark, rows)).collect()}
    for k, groups in keys.items():
        ntot, fstar, df2 = _brute(groups)
        r = got[k]
        assert r["n_total"] == ntot
        assert r["welch_f"] == fstar
        assert r["welch_df2"] == df2


def test_welch_anova_null_under_heteroscedastic_null(spark):
    """Equal means, wildly unequal variances/sizes: F* stays modest
    (the design case where the classical F's size is broken)."""
    rng = np.random.default_rng(3109)
    sizes = [8, 200, 30, 100, 15]
    sds = [20, 0.5, 5, 1, 10]
    rows = []
    for g, n, sd in zip(GROUPS, sizes, sds):
        rows += [
            ("k", float(v), g)
            for v in np.round(rng.normal(50, sd, n), 2)
        ]
    r = welch_anova_types(_df(spark, rows)).collect()[0]
    assert r["welch_f"] < 4.0
    # and a genuinely shifted group is caught
    rows2 = [
        (x[0], x[1] + (30.0 if x[2] == "error" else 0.0), x[2])
        for x in rows
    ]
    r2 = welch_anova_types(_df(spark, rows2)).collect()[0]
    assert r2["welch_f"] > 20


def test_welch_anova_gates(spark):
    rng = np.random.default_rng(3113)
    # a missing group: dropped
    rows = [
        ("k", float(v), g)
        for g in GROUPS[:4]
        for v in np.round(rng.normal(50, 2, 20), 2)
    ]
    assert welch_anova_types(_df(spark, rows)).collect() == []
    # zero-variance group: dropped
    rows2 = [
        ("k", float(v), g)
        for g in GROUPS[:4]
        for v in np.round(rng.normal(50, 2, 20), 2)
    ] + [("k", 5.0, "view")] * 20
    assert welch_anova_types(_df(spark, rows2)).collect() == []
