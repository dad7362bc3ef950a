"""Brier decomposition: brute-force parity, Murphy identity to
lattice grain, perfect-forecast and no-skill plants, min-total gate."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from tits_spark.operators.brier import climatology_brier


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "key string, stratum int, outcome boolean"
    )


def _brute(rows):
    """rows: (key, stratum, outcome). Returns per-key dict of the
    operator's exact lattice columns + rounded readouts."""
    cell = defaultdict(lambda: [0, 0])  # (key, h) -> [n, s]
    glob = defaultdict(lambda: [0, 0])
    for k, h, o in rows:
        cell[(k, h)][0] += 1
        cell[(k, h)][1] += int(o)
        glob[h][0] += 1
        glob[h][1] += int(o)
    tot = defaultdict(lambda: [0, 0])
    for (k, _h), (n, s) in cell.items():
        tot[k][0] += n
        tot[k][1] += s
    out = {}
    for k, (n, s) in tot.items():
        rel = res = bs = 0
        for (kk, h), (nc, sc) in cell.items():
            if kk != k:
                continue
            gn, gs = glob[h]
            f = gs / gn
            o = sc / nc
            ob = s / n
            rel += math.floor(1e6 * (nc * ((f - o) * (f - o))))
            res += math.floor(1e6 * (nc * ((o - ob) * (o - ob))))
            bs += math.floor(1e6 * (nc * (f * f) - 2.0 * (f * sc) + sc))
        ob = s / n
        out[k] = dict(
            n=n, s=s, rel_ppm=rel, res_ppm=res, brier_ppm=bs,
            reliability=math.floor(rel / n) / 1e6,
            resolution=math.floor(res / n) / 1e6,
            uncertainty=math.floor(1e6 * (ob * (1.0 - ob))) / 1e6,
            brier=math.floor(bs / n) / 1e6,
        )
    return out


def test_brier_brute_parity(spark):
    rng = np.random.default_rng(1801)
    rows = []
    for k in range(3):
        for h in range(12):
            p = (h + 1) / 20 + 0.1 * k
            for _ in range(rng.integers(5, 15)):
                rows.append(
                    (f"k{k}", h, bool(rng.random() < p))
                )
    want = _brute(rows)
    got = {
        r["key"]: r
        for r in climatology_brier(_df(spark, rows), min_total=50).collect()
    }
    for k, w in want.items():
        if w["n"] < 50:
            assert k not in got
            continue
        r = got[k]
        for col in (
            "n", "s", "rel_ppm", "res_ppm", "brier_ppm",
            "reliability", "resolution", "uncertainty", "brier",
        ):
            assert r[col] == w[col], (k, col, r[col], w[col])


def test_brier_murphy_identity_to_grain(spark):
    rng = np.random.default_rng(1811)
    rows = []
    for h in range(24):
        for _ in range(30):
            rows.append(("k", h, bool(rng.random() < h / 24)))
    r = climatology_brier(_df(spark, rows)).collect()[0]
    # BS = REL - RES + UNC to quantization grain (3 lattices + round)
    lhs = r["brier"]
    rhs = r["reliability"] - r["resolution"] + r["uncertainty"]
    assert abs(lhs - rhs) < 5e-5


def test_brier_single_key_forecast_is_own_rate(spark):
    """With ONE key, the global stratum rate IS the key's rate:
    REL = 0 exactly (to grain) and RES = the hour-rate spread."""
    rng = np.random.default_rng(1823)
    rows = []
    for h in range(6):
        n = 40
        s = 5 * h  # deterministic outcome counts: rate h*5/40
        for i in range(n):
            rows.append(("k", h, i < s))
    r = climatology_brier(_df(spark, rows)).collect()[0]
    assert r["rel_ppm"] == 0
    assert r["resolution"] > 0.04


def test_brier_no_skill_strata(spark):
    """Outcome independent of stratum: RES ~ 0, BS ~ UNC."""
    rng = np.random.default_rng(1831)
    rows = []
    for h in range(8):
        for _ in range(100):
            rows.append(("k", h, bool(rng.random() < 0.3)))
    r = climatology_brier(_df(spark, rows)).collect()[0]
    assert r["resolution"] < 0.01
    assert abs(r["brier"] - r["uncertainty"]) < 0.02
