"""PSI: brute-force parity on the smoothed-bin lattice, identical-key
~0, planted-shift banding, min-rows gate."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from tits_spark.operators.drift import psi_vs_global


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, value double")


def _brute(rows, bin_cents=100, min_rows=50):
    binned = [
        (k, math.floor(round(v * 100) / bin_cents)) for k, v in rows
    ]
    g = Counter(b for _, b in binned)
    ng = len(binned)
    nb = len(g)
    out = {}
    per_key = Counter((k, b) for k, b in binned)
    nkey = Counter(k for k, _ in binned)
    for k, na in nkey.items():
        if na < min_rows:
            continue
        s = 0
        for b, cg in g.items():
            ca = per_key.get((k, b), 0)
            pa = float(ca + 1) / float(na + nb)
            qa = float(cg + 1) / float(ng + nb)
            s += math.floor(1e9 * ((pa - qa) * math.log(pa / qa)))
        out[k] = (na, nb, s, s / 1e9)
    return out


def test_psi_brute_parity(spark):
    rng = np.random.default_rng(2203)
    rows = []
    for k, (mu, sd) in enumerate([(50, 5), (50, 5), (80, 10), (50, 25)]):
        for v in rng.normal(mu, sd, 120):
            rows.append((f"k{k}", float(round(v, 2))))
    want = _brute(rows)
    got = {r["key"]: r for r in psi_vs_global(_df(spark, rows)).collect()}
    assert set(got) == set(want)
    for k, (na, nb, ppb, psi) in want.items():
        r = got[k]
        assert (r["n"], r["n_bins"], r["psi_ppb"]) == (na, nb, ppb)
        assert r["psi"] == psi


def test_psi_banding_orders_drift(spark):
    """A key matching the corpus scores near 0; a fully shifted key
    scores far above every matching key (the corpus includes the
    shifted key's own rows — 1/7 of the pool — so its PSI is damped
    below the two-sample textbook value; ordering is the claim)."""
    rng = np.random.default_rng(2207)
    rows = []
    for k in range(6):
        for v in rng.normal(50, 5, 200):
            rows.append((f"base{k}", float(round(v, 2))))
    for v in rng.normal(95, 5, 200):
        rows.append(("shifted", float(round(v, 2))))
    got = {r["key"]: r for r in psi_vs_global(_df(spark, rows)).collect()}
    # base keys carry the contamination cost of the shifted key's
    # 1/7 corpus mass (~0.13-0.22); the shifted key itself is an
    # order of magnitude beyond the 0.25 band
    assert got["base0"]["psi"] < 0.3
    assert got["shifted"]["psi"] > 1.0
    assert all(
        got[f"base{k}"]["psi"] < got["shifted"]["psi"] for k in range(6)
    )


def test_psi_min_rows_gate(spark):
    rng = np.random.default_rng(2213)
    rows = [("big", float(round(v, 2))) for v in rng.normal(50, 5, 80)]
    rows += [("tiny", 50.0)] * 10
    got = {r["key"] for r in psi_vs_global(_df(spark, rows)).collect()}
    assert got == {"big"}
