"""Dunn post-hoc: brute-force parity with tie correction, planted
which-pair separation, degenerate/gate behavior."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from tits_spark.operators.rank_tests import dunn_posthoc


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, value double, grp string")


def _brute(groups):
    """groups: {name: [values]}. Returns {(a, b): row} like the op."""
    allv = [(v, g) for g, vs in groups.items() for v in vs]
    tie = Counter(v for v, _ in allv)
    n = len(allv)
    t3 = sum(t**3 - t for t in tie.values())
    # doubled midranks per distinct value
    rr = {}
    below = 0
    for v in sorted(tie):
        rr[v] = 2 * below + tie[v] + 1
        below += tie[v]
    r2 = {g: sum(rr[v] for v in vs) for g, vs in groups.items()}
    nj = {g: len(vs) for g, vs in groups.items()}
    varp = n * (n + 1) / 12.0 - t3 / (12.0 * (n - 1.0))
    out = {}
    for ga in groups:
        for gb in groups:
            if not ga < gb or min(nj[ga], nj[gb]) < 5:
                continue
            dmean = (r2[ga] / nj[ga] - r2[gb] / nj[gb]) / 2.0
            se = math.sqrt(varp * (1.0 / nj[ga] + 1.0 / nj[gb]))
            z = _r6(dmean / se) if varp > 0 else None
            out[(ga, gb)] = (nj[ga], nj[gb], r2[ga], r2[gb], z)
    return out


def test_dunn_brute_parity(spark):
    rng = np.random.default_rng(2603)
    rows, keys = [], {}
    for k in range(3):
        groups = {
            g: [float(v) for v in np.round(rng.normal(50 + i, 3, 25), 1)]
            for i, g in enumerate(["a", "b", "c", "d"])
        }
        keys[f"k{k}"] = groups
        rows += [(f"k{k}", v, g) for g, vs in groups.items() for v in vs]
    got = {}
    for r in dunn_posthoc(_df(spark, rows)).collect():
        got[(r["key"], r["grp_a"], r["grp_b"])] = r
    for k, groups in keys.items():
        want = _brute(groups)
        for (ga, gb), (na, nb, r2a, r2b, z) in want.items():
            r = got[(k, ga, gb)]
            assert (r["n_a"], r["n_b"], r["r2_a"], r["r2_b"]) == (
                na, nb, r2a, r2b,
            )
            assert r["dunn_z"] == z


def test_dunn_isolates_the_shifted_group(spark):
    rng = np.random.default_rng(2609)
    rows = []
    for g in ["a", "b", "c"]:
        mu = 80 if g == "c" else 50
        rows += [
            ("k", float(v), g)
            for v in np.round(rng.normal(mu, 2, 60), 1)
        ]
    got = {
        (r["grp_a"], r["grp_b"]): r["dunn_z"]
        for r in dunn_posthoc(_df(spark, rows)).collect()
    }
    assert abs(got[("a", "b")]) < 2.5
    assert got[("a", "c")] < -5 and got[("b", "c")] < -5


def test_dunn_all_tied_and_gate(spark):
    rows = [("k", 5.0, g) for g in "ab" for _ in range(10)]
    r = dunn_posthoc(_df(spark, rows)).collect()
    assert len(r) == 1 and r[0]["dunn_z"] is None
    tiny = [("k", float(i), "a") for i in range(10)] + [
        ("k", 3.0, "b"), ("k", 4.0, "b"),
    ]
    assert dunn_posthoc(_df(spark, tiny)).collect() == []
